package graft.props

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.types._

import graft.cdc.WalDecoder
import graft.refresh.DiffRefresher
import graft.sink.StrictSchema

/** Property-based checks of the engine's core semantics. Pure-function
  * properties run at full case counts; Spark-backed ones are scaled
  * down (each case runs real jobs). */
object EngineProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = graft.SparkSpec.spark

  private val ident: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.const('-'), 1 -> Gen.const('_')))
  } yield cs.mkString

  // ---------------------------------------------------------------
  // WAL decode inverts the test_decoding line format (A3)
  property("walDecodeRoundtrip") = forAll(ident, ident, ident) {
    (schema, table, id) =>
      val line = s"""table $schema."$table": UPDATE: id[text]:'$id'"""
      WalDecoder.decode(7L, "0/1", line) match {
        case Some(ev) =>
          ev.schema == schema && ev.table == table &&
            ev.op == "UPDATE" && ev.id == id && ev.doc.isEmpty
        case None => false
      }
  }

  property("walDecodeInsertCarriesQuoteStrippedDoc") = forAll(ident, ident) {
    (table, id) =>
      val line =
        s"""table sinker.$table: INSERT: id[text]:'$id' doc[json]:'{"k": "v"}'"""
      WalDecoder.decode(1L, "0/2", line)
        .exists(_.doc.contains("""{"k": "v"}"""))
  }

  property("walNoiseNeverDecodes") = forAll(Gen.chooseNum(0L, 99999L)) { x =>
    WalDecoder.decode(x, "0/1", s"BEGIN $x").isEmpty &&
      WalDecoder.decode(x, "0/1", s"COMMIT $x").isEmpty &&
      WalDecoder.decode(x, "0/1", "table sinker.m: DELETE: (no-tuple-data)").isEmpty
  }

  // ---------------------------------------------------------------
  // Strict schema: conforming docs pass, any unknown field is caught
  private val flatSchema = StructType(Seq(
    StructField("name", StringType), StructField("n", DoubleType)))

  property("strictSchemaAcceptsConforming") = forAll(ident, Gen.chooseNum(-1e6, 1e6)) {
    (name, n) =>
      StrictSchema.violations(s"""{"name": "$name", "n": $n}""", flatSchema).isEmpty
  }

  property("strictSchemaRejectsUnknownField") = forAll(ident) { k =>
    val key = if (k == "name" || k == "n") k + "x" else k
    StrictSchema.violations(s"""{"$key": 1}""", flatSchema).nonEmpty
  }

  // ---------------------------------------------------------------
  // Diff semantics (A9): applying diff(old, new) to old yields new,
  // and diffing identical snapshots is empty
  private val kvMap: Gen[Map[String, String]] = for {
    n <- Gen.chooseNum(0, 12)
    ks <- Gen.listOfN(n, Gen.chooseNum(0, 20))
    vs <- Gen.listOfN(n, Gen.chooseNum(0, 5))
  } yield ks.zip(vs).map { case (k, v) => s"k$k" -> s"""{"v": $v}""" }.toMap

  private def toDf(m: Map[String, String]) = {
    val s = spark
    import s.implicits._
    // toSeq of empty map still needs a schema: union with a dummy then filter
    (m.toSeq :+ ("__dummy__", "{}")).toDF("id", "doc").filter($"id" =!= "__dummy__")
  }

  property("diffAppliedToOldYieldsNew") = Prop.forAllNoShrink(kvMap, kvMap) {
    (oldM, newM) =>
      val actions = DiffRefresher.diff(toDf(oldM), toDf(newM)).collect()
      val applied = actions.foldLeft(oldM) { (acc, r) =>
        r.getString(0) match {
          case "index" => acc + (r.getString(1) -> r.getString(2))
          case "delete" => acc - r.getString(1)
        }
      }
      applied == newM
  }

  property("diffOfIdenticalSnapshotsIsEmpty") = Prop.forAllNoShrink(kvMap) { m =>
    DiffRefresher.diff(toDf(m), toDf(m)).isEmpty
  }


  // ---------------------------------------------------------------
  // Dedup operator invariants
  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(3, 20)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  property("identicalTextsShareMinhashAndSimhash") = Prop.forAllNoShrink(textGen) { t =>
    val s = spark
    import s.implicits._
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val sigs = graft.ops.Dedup
      .bandKeys(df, "text", "doc_id", bands = 2, rowsPerBand = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getString(2))).toSet }
    val sims = df.select(org.apache.spark.sql.functions.col("doc_id"),
      graft.ops.Dedup.simhash16(org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs(1L) == sigs(2L) && sims(1L) == sims(2L)
  }

  property("fingerprintInvariantUnderOrderAndRepetition") = Prop.forAllNoShrink(textGen) { t =>
    val s = spark
    import s.implicits._
    val shuffled = (t.split(" ").toSeq ++ t.split(" ").toSeq).reverse.mkString(" ")
    val df = Seq((1L, t), (2L, shuffled)).toDF("doc_id", "text")
    val fps = df.select(org.apache.spark.sql.functions.col("doc_id"),
      graft.ops.Dedup.fingerprint(org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fps(1L) == fps(2L)
  }

  // decontaminate == brute-force distinct-trigram overlap count
  property("decontaminateMatchesBruteForce") = Prop.forAllNoShrink(
    Gen.listOfN(6, textGen), Gen.listOfN(2, textGen)) { (trainT, benchT) =>
      val s = spark
      import s.implicits._
      def grams(t: String): Set[String] =
        t.split(" ").toSeq.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      val benchGrams = benchT.flatMap(grams).toSet
      val expected = trainT.zipWithIndex
        .map { case (t, i) => i.toLong -> (grams(t) & benchGrams).size.toLong }
        .filter(_._2 > 0).toMap
      val train = trainT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bench = benchT.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.Dedup.decontaminate(train, bench, "text", "doc_id", 3)
        .as[(Long, Long)].collect().toMap
      got == expected
  }

  // passage dedup == brute-force first-occurrence bookkeeping, and the
  // kept count across docs conserves the distinct-passage total
  property("passageDedupMatchesBruteForce") = Prop.forAllNoShrink(
    Gen.listOfN(6, textGen), Gen.chooseNum(2, 5)) { (texts, w) =>
      val s = spark
      import s.implicits._
      val all = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").toSeq.grouped(w).zipWithIndex
          .map { case (p, c) => (i.toLong, c.toLong, p.mkString(" ")) }
      }
      val firstOf = all.groupBy(_._3)
        .map { case (p, occ) => p -> occ.minBy(o => (o._1, o._2)) }
      val expected = texts.indices.map { i =>
        val mine = all.filter(_._1 == i.toLong)
        i.toLong -> ((mine.size.toLong,
          mine.count(o => firstOf(o._3) == o).toLong))
      }.toMap
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ops.Dedup.passageDedupStats(df, "text", "doc_id", w)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      got == expected &&
        got.values.map(_._2).sum == all.map(_._3).distinct.size
  }

  // salted join == plain join on random (skewed) key distributions
  property("saltedJoinMatchesPlainJoin") = Prop.forAllNoShrink(
    Gen.listOfN(30, Gen.chooseNum(0, 3)), Gen.chooseNum(1, 7)) { (keys, salts) =>
      val s = spark
      import s.implicits._
      val fact = keys.zipWithIndex.map { case (k, i) => (i.toLong, s"k$k") }
        .toDF("row_id", "key")
      val dim = (0 to 3).map(k => (s"k$k", k * 10)).toDF("key", "weight")
      val plain = fact.join(dim, "key")
        .select("row_id", "weight").as[(Long, Int)].collect().sorted.toSeq
      val salted = graft.ops.Skew
        .saltedJoin(fact, dim, "key", salts, Seq("row_id"))
        .select("row_id", "weight").as[(Long, Int)].collect().sorted.toSeq
      salted == plain
  }

  // chunking never loses a token and never emits overlap-only tails
  property("chunkCoversEveryTokenExactlyOnceBeyondOverlap") =
    Prop.forAllNoShrink(
      Gen.chooseNum(1, 60), Gen.chooseNum(2, 12), Gen.chooseNum(0, 6)) {
      (nToks, chunkToks, rawOverlap) =>
        val overlap = math.min(rawOverlap, chunkToks - 1)
        val s = spark
        import s.implicits._
        val text = (1 to nToks).map(i => s"w$i").mkString(" ")
        val chunks = graft.ops.TextAnalysis
          .chunk(Seq((1L, text)).toDF("doc_id", "text"),
            "text", "doc_id", chunkToks, overlap)
          .select("start_tok", "n_toks").as[(Long, Long)]
          .collect().sortBy(_._1).toSeq
        val stride = chunkToks - overlap
        val covered = chunks.flatMap { case (st, n) => st until (st + n) }.toSet
        val strided = chunks.map(_._1) == chunks.indices.map(_.toLong * stride)
        val noTail = chunks.dropRight(1).forall(_._2 == chunkToks.toLong)
        covered == (0L until nToks.toLong).toSet && strided && noTail
    }

  // applying the same actions twice converges (idempotent upsert, §2C)
  property("actionReplayIsIdempotent") = Prop.forAllNoShrink(kvMap, kvMap) {
    (oldM, newM) =>
      val actions = DiffRefresher.diff(toDf(oldM), toDf(newM)).collect()
      def apply1(m: Map[String, String]) = actions.foldLeft(m) { (acc, r) =>
        r.getString(0) match {
          case "index" => acc + (r.getString(1) -> r.getString(2))
          case "delete" => acc - r.getString(1)
        }
      }
      apply1(apply1(oldM)) == apply1(oldM)
  }

  // bloom prefilter is semantically invisible: equality with the plain
  // anti-join under arbitrary batch/state overlap and any fpp
  property("bloomPrefilteredAntiJoinMatchesPlainAntiJoin") = Prop.forAllNoShrink(
    Gen.listOfN(25, Gen.chooseNum(0, 15)),
    Gen.listOfN(25, Gen.chooseNum(0, 15)),
    Gen.oneOf(0.01, 0.1, 0.5)) { (batchKs, stateKs, fpp) =>
      val s = spark
      import s.implicits._
      val batch = batchKs.zipWithIndex
        .map { case (k, i) => (i.toLong, s"k$k") }.toDF("row_id", "key")
      val state = stateKs.distinct.map(k => Tuple1(s"k$k")).toDF("key")
      val plain = batch.join(state, Seq("key"), "left_anti")
        .select("row_id").as[Long].collect().sorted.toSeq
      val bloomed = graft.ops.Dedup
        .bloomPrefilteredAntiJoin(batch, state, "key", 100L, fpp)
        .select("row_id").as[Long].collect().sorted.toSeq
      bloomed == plain
  }

  // two-pass globalNtile is row-identical to the window ntile for any
  // (n, tiles) shape, ragged or degenerate
  property("globalNtileMatchesWindowNtile") = Prop.forAllNoShrink(
    Gen.chooseNum(1, 60), Gen.chooseNum(1, 12)) { (n, tiles) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, ntile}
      val df = (0 until n).map(i => ((i * 31) % n, i.toLong)).toDF("v", "id")
      val fast = graft.ops.Layout
        .globalNtile(df, tiles, col("v").asc, col("id").asc)
        .select("id", "tile").as[(Long, Int)].collect().sorted.toSeq
      val window = df.select(col("id"),
          ntile(tiles).over(Window.orderBy(col("v").asc, col("id").asc)).as("t"))
        .as[(Long, Int)].collect().sorted.toSeq
      fast == window
  }

  // ---------------------------------------------------------------
  // The persisted Misra–Gries store's write and absorb reproduce a
  // driver-side reference of the mergeable-summaries semantics (sum
  // counts; past k entries subtract the (k+1)-th largest and drop the
  // non-positive) EXACTLY, and the survivors honor the bound: at most
  // k counters, each a lower bound undercounting by ≤ N/(k+1).
  private def mgRef(counts: Map[String, Long], k: Int): Map[String, Long] =
    if (counts.size <= k) counts
    else {
      val cut = counts.values.toSeq.sorted(Ordering[Long].reverse)(k)
      counts.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }

  private val mgItems: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 120)
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      4 -> Gen.oneOf((0 until 30).map(i => s"c$i"))))
  } yield xs

  property("mgStoreMatchesReferenceAndHonorsBound") = Prop.forAllNoShrink(
    mgItems, mgItems, Gen.chooseNum(2, 8)) { (base, delta, k) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions.col
      import graft.ops.AggState
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-mg")
        .toString + "/mg"
      val bkt = AggState.hashBucketsOf("grp", 2)
      AggState.writeMg(base.map(("g", _)).toDF("grp", "w"),
        Seq("grp"), "w", k, bkt, dir)
      def summary: Map[String, Long] =
        AggState.mgSummary(s, dir, Seq("grp")).collect()
          .map(r => r.getString(1) -> r.getLong(2)).toMap
      def exact(xs: List[String]): Map[String, Long] =
        xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val refW = mgRef(exact(base), k)
      val okWrite = summary == refW
      AggState.absorbMg(s, dir, delta.map(("g", _)).toDF("grp", "w"),
        Seq("grp"), "w", k, bkt)
      val merged = (refW.keySet ++ exact(delta).keySet).map { w =>
        w -> (refW.getOrElse(w, 0L) + exact(delta).getOrElse(w, 0L))
      }.toMap
      val got = summary
      val okAbsorb = got == mgRef(merged, k)
      val full = exact(base ++ delta)
      val bound = (base.size + delta.size).toLong / (k + 1)
      val okBound = got.size <= k &&
        got.forall { case (w, c) => c <= full(w) } &&
        full.forall { case (w, c) => got.getOrElse(w, 0L) >= c - bound }
      val ok = okWrite && okAbsorb && okBound
      if (!ok) println(s"MG-PROP-FAIL k=$k okWrite=$okWrite okAbsorb=$okAbsorb okBound=$okBound\n  base=${exact(base)}\n  delta=${exact(delta)}\n  refW=$refW\n  got=$got\n  refA=${mgRef(merged, k)}")
      ok
  }

  // ---------------------------------------------------------------
  // The layered (stream-parity) mg path holds the same reference
  // semantics end to end: between compacts the summary is the base's
  // compressed counters PLUS the layers' exact counts (a redelivered
  // epoch collapses — append e0 twice, count it once), and compact
  // folds everything through one reference compression. The bound
  // holds at every stage.
  property("mgLayeredPathMatchesReferenceAndCollapsesReplay") =
    Prop.forAllNoShrink(mgItems, mgItems, mgItems,
      Gen.chooseNum(2, 8)) { (base, e0, e1, k) =>
      val s = spark
      import s.implicits._
      import graft.ops.AggState
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-mgl")
        .toString + "/mg"
      val bkt = AggState.hashBucketsOf("grp", 2)
      def df(xs: List[String]) = xs.map(("g", _)).toDF("grp", "w")
      def exact(xs: List[String]): Map[String, Long] =
        xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def summary: Map[String, Long] =
        AggState.mgSummary(s, dir, Seq("grp")).collect()
          .map(r => r.getString(1) -> r.getLong(2)).toMap
      AggState.writeMg(df(base), Seq("grp"), "w", k, bkt, dir)
      AggState.appendMgDelta(dir, df(e0), 0L, Seq("grp"), "w", k, bkt)
      // the at-least-once replay: same batch, same epoch id
      AggState.appendMgDelta(dir, df(e0), 0L, Seq("grp"), "w", k, bkt)
      AggState.appendMgDelta(dir, df(e1), 1L, Seq("grp"), "w", k, bkt)
      val refW = mgRef(exact(base), k)
      val layered = (refW.keySet ++ exact(e0).keySet ++ exact(e1).keySet)
        .map { w => w -> (refW.getOrElse(w, 0L) +
          exact(e0).getOrElse(w, 0L) + exact(e1).getOrElse(w, 0L)) }
        .toMap.filter(_._2 > 0)
      val okLayered = summary == layered
      AggState.compactMgState(s, dir, Seq("grp"), k)
      val got = summary
      val okCompact = got == mgRef(layered, k)
      val full = exact(base ++ e0 ++ e1)
      val bound = (base.size + e0.size + e1.size).toLong / (k + 1)
      val okBound = got.size <= k &&
        got.forall { case (w, c) => c <= full(w) } &&
        full.forall { case (w, c) => got.getOrElse(w, 0L) >= c - bound }
      val ok = okLayered && okCompact && okBound
      if (!ok) println(s"MG-LAYER-FAIL k=$k okLayered=$okLayered " +
        s"okCompact=$okCompact okBound=$okBound\n  base=${exact(base)}\n" +
        s"  e0=${exact(e0)}\n  e1=${exact(e1)}\n  refW=$refW\n" +
        s"  layered=$layered\n  got=$got")
      ok
  }

  // ---------------------------------------------------------------
  // The quarter-banded perceptual-dedup search is COMPLETE at Hamming
  // ≤ 3 (pigeonhole: 4 flipped bits at most, 4 disjoint 16-bit
  // quarters — some quarter is untouched) and exact (the bit_count
  // verify admits nothing farther): on random corpora with planted
  // near-dups at every distance 0–4, the banded result equals the
  // brute-force all-pairs truth — including the planted distance-4
  // pairs being ABSENT.
  property("dhashBandingMatchesBruteForceAtHamming3") = Prop.forAllNoShrink(
    Gen.listOfN(10, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
    Gen.pick(4, 0 until 64)) { (seeds, flipPos) =>
      val s = spark
      import s.implicits._
      // each seed id 3i; a planted variant at distance (i mod 5) id
      // 3i+1 — distances 0..4 all appear across the corpus
      val rows = seeds.zipWithIndex.flatMap { case (h, i) =>
        val d = i % 5
        val mask = flipPos.take(d).map(1L << _).foldLeft(0L)(_ | _)
        Seq((3L * i, h), (3L * i + 1, h ^ mask))
      }
      val got = graft.ops.Multimodal
        // the property IS completeness vs brute force — uncap
        // explicitly (the finite default caps recall by contract)
        .dHashNearDupPairs(rows.toDF("id", "dhash"), maxDist = 3,
          maxBucket = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (a, i) <- rows.zipWithIndex; (b, j) <- rows.zipWithIndex
        if i < j && java.lang.Long.bitCount(a._2 ^ b._2) <= 3
      } yield (math.min(a._1, b._1), math.max(a._1, b._1))).toSet
      got == brute
  }
}
