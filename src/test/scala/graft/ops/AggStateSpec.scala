package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted partial-aggregate state (IVM layout): refresh must equal
  * a full recompute for the delta's groups while touching only the
  * delta's partition buckets; absorb must fold a delta in by
  * rewriting ONLY touched partitions. */
class AggStateSpec extends SparkSpec {

  private val ev = graft.core.Tables
    .events(spark, "/root/testdata/sf0.001")
  private val groupCols = Seq("user_id", "event_type")
  private def bucketOf = floor(col("user_id") / 4).cast("long")
  private def fs = new HPath("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def base = ev.filter(col("event_id") % 10 =!= 0)
  private def delta = ev.filter(col("event_id") % 10 === 0)

  /** Ground truth: aggregate base ∪ delta from scratch, restricted to
    * the delta's groups. */
  private def expectedRefreshed = {
    val dg = delta.select(col("user_id"), col("event_type")).distinct()
    AggState.partials(ev.join(dg, groupCols), groupCols, "value", 10000)
  }

  test("refresh equals a full recompute for exactly the delta's groups") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    AggState.write(base, groupCols, "value", 10000, bucketOf, s"$dir/state")
    val got = AggState.refresh(spark, s"$dir/state", delta, groupCols,
      "value", 10000, bucketOf).collect().toSet
    got shouldBe expectedRefreshed.collect().toSet
    got.size should be > 0
  }

  test("mergedFor is merged restricted to the keys, reading only their buckets") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    AggState.write(base, groupCols, "value", 10000, bucketOf, s"$dir/state")
    // layered epochs + a retraction must be collapsed identically to
    // the full merged view
    AggState.appendDelta(s"$dir/state", delta, 0L, groupCols, "value",
      10000, bucketOf)
    AggState.retract(spark, s"$dir/state",
      base.filter(col("event_id") % 3 === 0), groupCols, "value",
      10000, bucketOf)
    val keys = ev.filter(col("user_id") < 4)
      .select(col("user_id"), col("event_type")).distinct()
    val got = AggState.mergedFor(spark, s"$dir/state", keys, groupCols,
      bucketOf).collect().toSet
    val want = AggState.merged(spark, s"$dir/state", groupCols)
      .join(keys, groupCols, "left_semi").collect().toSet
    got shouldBe want
    got.size should be > 0
    // pruning is real: every other bucket dir deleted, answer unchanged
    fs.listStatus(new HPath(s"$dir/state"))
      .filter(s => s.getPath.getName.startsWith("pbucket=") &&
        s.getPath.getName != "pbucket=0")
      .foreach(s => fs.delete(s.getPath, true))
    AggState.mergedFor(spark, s"$dir/state", keys, groupCols, bucketOf)
      .collect().toSet shouldBe want
    // keys with no resident bucket: empty, never an error
    AggState.mergedFor(spark, s"$dir/state",
      keys.filter(col("user_id") > 1000000), groupCols, bucketOf)
      .count() shouldBe 0L
  }

  test("untouched buckets are never read: refresh survives their deletion") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    AggState.write(base, groupCols, "value", 10000, bucketOf, s"$dir/state")
    // delta restricted to ONE bucket's user range; physically remove
    // every other bucket dir — if refresh listed or scanned them it
    // would now throw, and the answer must be unchanged
    val d1 = delta.filter(col("user_id") < 4)
    val dg = d1.select(col("user_id"), col("event_type")).distinct()
    val expected = AggState
      .partials(ev.join(dg, groupCols), groupCols, "value", 10000)
      .collect().toSet
    fs.listStatus(new HPath(s"$dir/state"))
      .filter(s => s.getPath.getName.startsWith("pbucket=") &&
        s.getPath.getName != "pbucket=0")
      .foreach(s => fs.delete(s.getPath, true))
    AggState.refresh(spark, s"$dir/state", d1, groupCols, "value", 10000,
      bucketOf).collect().toSet shouldBe expected
  }

  test("absorb rewrites only touched partitions; untouched stay byte-identical") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    val d1 = delta.filter(col("user_id") < 4) // bucket 0 only
    def bucketBytes(b: String): Seq[(String, Long, Long)] =
      fs.listStatus(new HPath(path, b)).toSeq
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
    val untouched = fs.listStatus(new HPath(path))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("pbucket=") && n != "pbucket=0").toSeq
    untouched.size should be > 0
    val before = untouched.map(b => b -> bucketBytes(b)).toMap
    AggState.absorb(spark, path, d1, groupCols, "value", 10000, bucketOf)
    untouched.foreach { b =>
      withClue(s"$b: ") { bucketBytes(b) shouldBe before(b) }
    }
    // the whole store now equals a from-scratch aggregation of base ∪ d1
    val expected = AggState
      .partials(base.unionByName(d1), groupCols, "value", 10000)
      .collect().toSet
    spark.read.parquet(path)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"),
        col("mn"), col("mx"))
      .collect().toSet shouldBe expected
  }

  test("layered epochs: appendDelta + merged equals full recompute; replay is invisible") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    val (d0, d1) = (delta.filter(col("event_id") % 2 === 0),
      delta.filter(col("event_id") % 2 =!= 0))
    AggState.appendDelta(path, d0, 0L, groupCols, "value", 10000, bucketOf)
    AggState.appendDelta(path, d1, 1L, groupCols, "value", 10000, bucketOf)
    val expected = AggState.partials(ev, groupCols, "value", 10000)
      .collect().toSet
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    // at-least-once redelivery: epoch 1 lands AGAIN (crash between
    // parquet append and checkpoint commit) — rows duplicate on disk,
    // every read collapses them
    AggState.appendDelta(path, d1, 1L, groupCols, "value", 10000, bucketOf)
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    // refresh over the layered store agrees too
    val d2 = delta.filter(col("user_id") < 4)
    val dg = d2.select(col("user_id"), col("event_type")).distinct()
    val expRefresh = AggState
      .partials(ev.join(dg, groupCols), groupCols, "value", 10000)
      .join(AggState.partials(d2, groupCols, "value", 10000)
        .select(col("user_id"), col("event_type"), col("n").as("an"),
          col("sv").as("as_"), col("mn").as("amn"),
          col("mx").as("amx")), groupCols)
      .select(col("user_id"), col("event_type"),
        (col("n") + col("an")).as("n"), (col("sv") + col("as_")).as("sv"),
        least(col("mn"), col("amn")).as("mn"),
        greatest(col("mx"), col("amx")).as("mx"))
      .collect().toSet
    AggState.refresh(spark, path, d2, groupCols, "value", 10000, bucketOf)
      .collect().toSet shouldBe expRefresh
    // compact folds the layers: one row per group, answers unchanged
    AggState.compactState(spark, path, groupCols)
    spark.read.parquet(path)
      .groupBy(groupCols.map(col): _*).count()
      .filter(col("count") > 1).count() shouldBe 0L
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
  }

  test("absorbStream converges exactly-once: a drained stream equals full recompute") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    val rows = delta.select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    implicit val enc: Encoder[(Long, String, Double)] =
      Encoders.product[(Long, String, Double)]
    val stream = MemoryStream[(Long, String, Double)](enc, spark)
    val query = AggState.absorbStream(
      stream.toDF().toDF("user_id", "event_type", "value"),
      path, s"$dir/ckpt", groupCols, "value", 10000, bucketOf)
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      stream.addData(h1.toSeq)
      query.processAllAvailable()
      stream.addData(h2.toSeq)
      query.processAllAvailable()
    } finally query.stop()
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe
      AggState.partials(ev, groupCols, "value", 10000).collect().toSet
  }

  test("null group keys: refresh and absorb merge them as one group, not split rows") {
    // NULL ∘ any comparison is NULL, so a plain-equality merge join
    // drops null-keyed resident partials (refresh reports delta-only
    // counts) or keeps resident and delta as two rows (absorb) — the
    // <=> null-safe joins and the __HIVE_DEFAULT_PARTITION__ dir
    // addressing in touchedDirs are what this pins
    val nulled = ev.withColumn("user_id",
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("user_id")))
    val nbase = nulled.filter(col("event_id") % 10 =!= 0)
    val ndelta = nulled.filter(col("event_id") % 10 === 0)
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(nbase, groupCols, "value", 10000, bucketOf, path)
    // refresh: null-keyed delta groups must see the resident partials
    val full = AggState.partials(nulled, groupCols, "value", 10000)
    val gotNull = AggState
      .refresh(spark, path, ndelta, groupCols, "value", 10000, bucketOf)
      .filter(col("user_id").isNull).collect().toSet
    gotNull should not be empty
    gotNull shouldBe full.filter(col("user_id").isNull)
      .join(AggState.partials(ndelta, groupCols, "value", 10000)
          .filter(col("user_id").isNull)
          .select(col("event_type").as("det")),
        col("event_type") === col("det"), "left_semi")
      .collect().toSet
    // absorb: the store afterwards equals a from-scratch aggregation —
    // exactly one row per (null, event_type) group
    AggState.absorb(spark, path, ndelta, groupCols, "value", 10000,
      bucketOf)
    spark.read.parquet(path)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"),
        col("mn"), col("mx"))
      .collect().toSet shouldBe full.collect().toSet
  }

  test("retract: negated merge equals recompute for count/sum; extrema stay bounds; emptied groups tombstone invisibly") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path)
    AggState.retract(spark, path, delta, groupCols, "value", 10000,
      bucketOf)
    val expected = AggState.partials(base, groupCols, "value", 10000)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet
    // surviving groups equal a from-scratch recompute; n=0 tombstones
    // (groups the retraction emptied) are excluded the same way every
    // read path excludes them
    spark.read.parquet(path).filter(col("n") > 0)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet shouldBe expected
    AggState.merged(spark, path, groupCols)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet shouldBe expected
    // extrema after retraction: conservative bounds, never violated
    val trueExt = AggState.partials(base, groupCols, "value", 10000)
      .select(col("user_id"), col("event_type"), col("mn").as("tmn"),
        col("mx").as("tmx"))
    spark.read.parquet(path).filter(col("n") > 0)
      .join(trueExt, groupCols)
      .filter(col("mn") > col("tmn") || col("mx") < col("tmx"))
      .count() shouldBe 0L
    // a retraction that empties a whole bucket leaves an n=0 tombstone
    // row IN the rewritten partition — the overwrite itself carries the
    // emptiness, so there is no post-write directory delete and hence
    // no crash window in which stale pre-retract files could survive.
    // The dir stays, its rows are invisible to every read path, and
    // its extrema are nulled so a later re-absorb starts fresh.
    val only0 = ev.filter(col("user_id") < 4)
    val path2 = s"$dir/state2"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path2)
    AggState.retract(spark, path2, only0, groupCols, "value", 10000,
      bucketOf)
    val tomb = spark.read.parquet(path2)
      .filter(col("user_id") < 4)
    tomb.count() should be > 0L
    tomb.filter(col("n") =!= 0 || col("sv") =!= 0 ||
      col("mn").isNotNull || col("mx").isNotNull).count() shouldBe 0L
    AggState.merged(spark, path2, groupCols)
      .filter(col("user_id") < 4).count() shouldBe 0L
    // re-absorbing an emptied group resurrects it with FRESH extrema
    // (the tombstone's nulls lose least/greatest), equal to recompute
    val back = ev.filter(col("user_id") < 4)
    AggState.absorb(spark, path2, back, groupCols, "value", 10000,
      bucketOf)
    spark.read.parquet(path2).filter(col("user_id") < 4)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"),
        col("mn"), col("mx"))
      .collect().toSet shouldBe
      AggState.partials(back, groupCols, "value", 10000)
        .collect().toSet
    // retracting rows never absorbed is a no-op
    val before = spark.read.parquet(path2).collect().toSet
    AggState.retract(spark, path2,
      delta.withColumn("user_id", col("user_id") + 5000000L),
      groupCols, "value", 10000, bucketOf)
    spark.read.parquet(path2).collect().toSet shouldBe before
  }

  test("legacy (n, sv)-only store: every path reads it with null extrema; maintenance upgrades it lazily") {
    // a store written before extrema existed carries only (n, sv) —
    // refresh/absorb/merged must not fail on the missing columns
    // (mergeSchema + null fallback), and rewrites emit the full layout
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000, 0).cast("long")).as("sv"))
      .withColumn("epoch", lit(-1L))
      .withColumn("pbucket", bucketOf)
      .repartition(col("pbucket"))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)
    // refresh: counts/sums exact; resident extrema unknown → the
    // delta's own extrema survive the least/greatest merge
    val got = AggState.refresh(spark, path, delta, groupCols,
      "value", 10000, bucketOf)
    got.select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet shouldBe
      expectedRefreshed
        .select(col("user_id"), col("event_type"), col("n"), col("sv"))
        .collect().toSet
    val deltaExt = AggState.partials(delta, groupCols, "value", 10000)
      .select(col("user_id"), col("event_type"), col("mn").as("dmn"),
        col("mx").as("dmx"))
    got.join(deltaExt, groupCols)
      .filter(!(col("mn") <=> col("dmn")) || !(col("mx") <=> col("dmx")))
      .count() shouldBe 0L
    // merged reads the legacy layout directly
    AggState.merged(spark, path, groupCols)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet shouldBe
      AggState.partials(base, groupCols, "value", 10000)
        .select(col("user_id"), col("event_type"), col("n"), col("sv"))
        .collect().toSet
    // absorb folds the delta in and writes the FULL layout for the
    // touched partitions; the mixed-layout store keeps answering
    AggState.absorb(spark, path, delta, groupCols, "value", 10000,
      bucketOf)
    AggState.merged(spark, path, groupCols)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"))
      .collect().toSet shouldBe
      AggState.partials(ev, groupCols, "value", 10000)
        .select(col("user_id"), col("event_type"), col("n"), col("sv"))
        .collect().toSet
  }

  test("distinct sketches: maintained KMV is bit-identical to from-scratch; replay is a no-op") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/dstate"
    val grp = Seq("event_type")
    val dbucket = pmod(hash(col("event_type")), lit(8)).cast("long")
    AggState.writeDistinct(base, grp, "user_id", 64, dbucket, path)
    AggState.absorbDistinct(spark, path, delta, grp, "user_id", 64,
      dbucket)
    def storeKs = spark.read.parquet(path)
      .select(col("event_type"), col("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // merge(sketch(base), sketch(delta)) == sketch(base ∪ delta),
    // element for element — k-min is a deterministic mergeable sketch
    val scratch = AggState.distinctPartials(ev, grp, "user_id", 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    storeKs shouldBe scratch
    // replay: k-min merge is idempotent, the store is unchanged
    AggState.absorbDistinct(spark, path, delta, grp, "user_id", 64,
      dbucket)
    storeKs shouldBe scratch
    // refresh from a base-only store answers as a store built from
    // everything — the read-side merge is the same algebra
    val path2 = s"$dir/dstate2"
    AggState.writeDistinct(base, grp, "user_id", 64, dbucket, path2)
    val viaRefresh = AggState.refreshDistinct(spark, path2, delta,
        grp, "user_id", 64, dbucket)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pathAll = s"$dir/dstateAll"
    AggState.writeDistinct(ev, grp, "user_id", 64, dbucket, pathAll)
    AggState.distinctEstimates(spark, pathAll, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      .filter { case (g, _) => viaRefresh.contains(g) } shouldBe viaRefresh
  }

  test("meta stamp: drifted quantScale, k, bucket spec, and crossed kinds all fail loudly") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    // wrong quantScale: sums would land in a different fixed-point
    // domain — silent corruption without the stamp
    val e1 = intercept[IllegalArgumentException] {
      AggState.refresh(spark, path, delta, groupCols, "value", 100,
        bucketOf)
    }
    e1.getMessage should include("quantScale")
    // wrong bucket expression: partials would land in buckets no
    // probe reads
    val e2 = intercept[IllegalArgumentException] {
      AggState.absorb(spark, path, delta, groupCols, "value", 10000,
        floor(col("user_id") / 8).cast("long"))
    }
    e2.getMessage should include("bucketSpec")
    intercept[IllegalArgumentException] {
      AggState.retract(spark, path, delta, groupCols, "value", 9999,
        bucketOf)
    }
    intercept[IllegalArgumentException] {
      AggState.appendDelta(path, delta, 0L, groupCols, "value", 10000,
        floor(col("user_id") / 2).cast("long"))
    }
    // matching params still flow (the stamp is not a lock)
    AggState.absorb(spark, path, delta, groupCols, "value", 10000,
      bucketOf)
    // distinct store: drifted k fails; crossing the APIs fails on kind
    val dpath = s"$dir/dstate"
    val grp = Seq("event_type")
    val dbucket = pmod(hash(col("event_type")), lit(8)).cast("long")
    AggState.writeDistinct(base, grp, "user_id", 64, dbucket, dpath)
    val e3 = intercept[IllegalArgumentException] {
      AggState.absorbDistinct(spark, dpath, delta, grp, "user_id", 32,
        dbucket)
    }
    e3.getMessage should include("k=64")
    val e4 = intercept[IllegalArgumentException] {
      AggState.merged(spark, dpath, grp)
    }
    e4.getMessage should include("'sum' API")
    intercept[IllegalArgumentException] {
      AggState.refreshDistinct(spark, path, delta, groupCols.take(1),
        "user_id", 64, bucketOf)
    }
    // a meta-less legacy store has nothing to check, and its first
    // maintenance write stamps it — from then on drift is loud
    val lpath = s"$dir/legacy"
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000, 0).cast("long")).as("sv"))
      .withColumn("epoch", lit(-1L))
      .withColumn("pbucket", bucketOf)
      .repartition(col("pbucket"))
      .write.mode("overwrite").partitionBy("pbucket").parquet(lpath)
    AggState.absorb(spark, lpath, delta, groupCols, "value", 10000,
      bucketOf)
    fs.exists(new HPath(lpath, "_graft_agg_meta")) shouldBe true
    intercept[IllegalArgumentException] {
      AggState.absorb(spark, lpath, delta, groupCols, "value", 100,
        bucketOf)
    }
  }

  test("rebuildGroups: retract-then-rebuild equals a from-scratch store, exact extrema included") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path)
    AggState.retract(spark, path, delta, groupCols, "value", 10000,
      bucketOf)
    // counts/sums are already exact; extrema are bounds — rebuild the
    // touched groups from the surviving source and ALL columns equal a
    // from-scratch write
    val touched = delta.select(col("user_id"), col("event_type"))
    AggState.rebuildGroups(spark, path, touched, base, groupCols,
      "value", 10000, bucketOf)
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe
      AggState.partials(base, groupCols, "value", 10000).collect().toSet
    // a group whose rows were ALL deleted: rebuild purges it in the
    // same overwrite (tombstone, read-invisible) — right-to-be-
    // forgotten as an operator, not a footnote
    val path2 = s"$dir/state2"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path2)
    val goneGroups = ev.filter(col("user_id") < 4)
      .select(col("user_id"), col("event_type"))
    val survivors = ev.filter(col("user_id") >= 4)
    AggState.rebuildGroups(spark, path2, goneGroups, survivors,
      groupCols, "value", 10000, bucketOf)
    AggState.merged(spark, path2, groupCols)
      .filter(col("user_id") < 4).count() shouldBe 0L
    AggState.merged(spark, path2, groupCols).collect().toSet shouldBe
      AggState.partials(survivors, groupCols, "value", 10000)
        .collect().toSet
    // untouched groups' buckets were never read or rewritten
    val path3 = s"$dir/state3"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path3)
    def bucketBytes(b: String): Seq[(String, Long, Long)] =
      fs.listStatus(new HPath(path3, b)).toSeq
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
    val untouched = fs.listStatus(new HPath(path3))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("pbucket=") && n != "pbucket=0").toSeq
    val before = untouched.map(b => b -> bucketBytes(b)).toMap
    AggState.rebuildGroups(spark, path3,
      ev.filter(col("user_id") < 4).select(col("user_id"), col("event_type")),
      ev.filter(col("user_id") < 4), groupCols, "value", 10000, bucketOf)
    untouched.foreach { b =>
      withClue(s"$b: ") { bucketBytes(b) shouldBe before(b) }
    }
  }

  test("rebuildDistinctGroups: post-delete sketches equal from-scratch; forgotten groups invisible") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/dstate"
    val grp = Seq("event_type")
    val dbucket = pmod(hash(col("event_type")), lit(8)).cast("long")
    AggState.writeDistinct(ev, grp, "user_id", 64, dbucket, path)
    // delete the delta rows: sketches can't retract, so rebuild the
    // touched groups from the surviving source — the store then equals
    // a from-scratch writeDistinct over the survivors, sketch for
    // sketch
    AggState.rebuildDistinctGroups(spark, path,
      delta.select(col("event_type")), base, grp, "user_id", 64, dbucket)
    val scratch = s"$dir/scratch"
    AggState.writeDistinct(base, grp, "user_id", 64, dbucket, scratch)
    AggState.distinctEstimates(spark, path, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe
      AggState.distinctEstimates(spark, scratch, grp, 64)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a group deleted to NOTHING: rebuilt as an empty-sketch tombstone,
    // invisible to every read until new rows arrive
    val g0 = ev.select(col("event_type")).distinct().limit(1)
    val g0val = g0.collect().head.getString(0)
    AggState.rebuildDistinctGroups(spark, path, g0,
      base.filter(col("event_type") =!= g0val), grp, "user_id", 64,
      dbucket)
    AggState.distinctEstimates(spark, path, grp, 64)
      .filter(col("event_type") === g0val).count() shouldBe 0L
    // new rows for the forgotten group start a FRESH sketch
    AggState.absorbDistinct(spark, path,
      ev.filter(col("event_type") === g0val && col("event_id") % 3 === 0),
      grp, "user_id", 64, dbucket)
    val fresh = s"$dir/fresh"
    AggState.writeDistinct(
      ev.filter(col("event_type") === g0val && col("event_id") % 3 === 0),
      grp, "user_id", 64, dbucket, fresh)
    AggState.distinctEstimates(spark, path, grp, 64)
      .filter(col("event_type") === g0val)
      .collect().map(_.getDouble(1)).toSeq shouldBe
      AggState.distinctEstimates(spark, fresh, grp, 64)
        .collect().map(_.getDouble(1)).toSeq
  }

  test("absorbDistinctStream converges exactly-once: drained stream equals from-scratch sketches") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/dstate"
    val grp = Seq("event_type")
    val dbucket = pmod(hash(col("event_type")), lit(8)).cast("long")
    AggState.writeDistinct(base, grp, "user_id", 64, dbucket, path)
    val rows = delta.select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    implicit val enc: Encoder[(String, Long)] =
      Encoders.product[(String, Long)]
    val stream = MemoryStream[(String, Long)](enc, spark)
    val query = AggState.absorbDistinctStream(
      stream.toDF().toDF("event_type", "user_id"),
      path, s"$dir/ckpt", grp, "user_id", 64, dbucket)
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      stream.addData(h1.toSeq)
      query.processAllAvailable()
      stream.addData(h2.toSeq)
      query.processAllAvailable()
    } finally query.stop()
    // redelivery: re-absorbing a batch directly (the crash-replay
    // shape) changes nothing — k-min is idempotent
    AggState.absorbDistinct(spark, path,
      delta.filter(col("event_id") % 2 === 0), grp, "user_id", 64,
      dbucket)
    spark.read.parquet(path).select(col("event_type"), col("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap shouldBe
      AggState.distinctPartials(ev, grp, "user_id", 64)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("layer telemetry: layerCount surfaces appendDelta epochs; maybeCompactState folds past threshold") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    AggState.layerCount(spark, path) shouldBe 1L // the -1 generation
    val thirds = (0 until 3).map(i => delta.filter(col("event_id") % 3 === i))
    thirds.zipWithIndex.foreach { case (d, i) =>
      AggState.appendDelta(path, d, i.toLong, groupCols, "value", 10000,
        bucketOf)
    }
    AggState.layerCount(spark, path) shouldBe 4L
    val expected = AggState.partials(ev, groupCols, "value", 10000)
      .collect().toSet
    // under threshold: no compact, layers stay
    AggState.maybeCompactState(spark, path, groupCols,
      maxLayers = 4) shouldBe false
    AggState.layerCount(spark, path) shouldBe 4L
    // past threshold: folded to one generation, answers unchanged
    AggState.maybeCompactState(spark, path, groupCols,
      maxLayers = 3) shouldBe true
    AggState.layerCount(spark, path) shouldBe 1L
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
  }

  test("rebucket: answers preserved under the new geometry; the old bucket spec fails loudly") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    AggState.appendDelta(path, delta, 0L, groupCols, "value", 10000,
      bucketOf)
    val expected = AggState.partials(ev, groupCols, "value", 10000)
      .collect().toSet
    val newBucket = floor(col("user_id") / 16).cast("long")
    AggState.rebucket(spark, path, groupCols, "value", 10000, newBucket)
    // layers consolidated on the way; answers unchanged
    AggState.layerCount(spark, path) shouldBe 1L
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    // maintenance under the new spec flows; the OLD spec is now a loud
    // mismatch (the restamped meta owns the geometry)
    val d2 = delta.filter(col("user_id") < 4)
    AggState.absorb(spark, path, d2, groupCols, "value", 10000, newBucket)
    intercept[IllegalArgumentException] {
      AggState.refresh(spark, path, d2, groupCols, "value", 10000,
        bucketOf)
    }
    // distinct store: same lifecycle
    val dpath = s"$dir/dstate"
    val grp = Seq("event_type")
    val b1 = pmod(hash(col("event_type")), lit(8)).cast("long")
    val b2 = pmod(hash(col("event_type")), lit(32)).cast("long")
    AggState.writeDistinct(ev, grp, "user_id", 64, b1, dpath)
    val before = AggState.distinctEstimates(spark, dpath, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    AggState.rebucketDistinct(spark, dpath, grp, "user_id", 64, b2)
    AggState.distinctEstimates(spark, dpath, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap shouldBe before
    intercept[IllegalArgumentException] {
      AggState.absorbDistinct(spark, dpath, delta, grp, "user_id", 64, b1)
    }
  }

  test("rebucket crash states heal: swap-window roll-forward, incomplete-stage rollback, stray cleanup") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path)
    val expected = AggState.partials(ev, groupCols, "value", 10000)
      .collect().toSet
    val newBucket = floor(col("user_id") / 16).cast("long")
    // crash INSIDE the swap window: stage complete (meta written last),
    // live renamed away — the next read rolls FORWARD to the new
    // geometry and answers unchanged
    AggState.write(ev, groupCols, "value", 10000, newBucket,
      s"${path}_rebucketing")
    fs.rename(new HPath(path), new HPath(s"${path}_old")) shouldBe true
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    fs.exists(new HPath(s"${path}_old")) shouldBe false
    fs.exists(new HPath(s"${path}_rebucketing")) shouldBe false
    // maintenance continues under the rolled-forward spec
    AggState.absorb(spark, path, delta.filter(col("user_id") < 4),
      groupCols, "value", 10000, newBucket)
    // crash BEFORE the stage completed (no meta in the stage): live
    // missing + old present rolls BACK to the previous generation
    val path2 = s"$dir/state2"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path2)
    fs.mkdirs(new HPath(s"${path2}_rebucketing"))
    fs.rename(new HPath(path2), new HPath(s"${path2}_old")) shouldBe true
    AggState.merged(spark, path2, groupCols).collect().toSet shouldBe expected
    // crash BEFORE the swap started (live intact, stage around): a
    // writer entry point drops the strays; a reader leaves them alone
    val path3 = s"$dir/state3"
    AggState.write(ev, groupCols, "value", 10000, bucketOf, path3)
    fs.mkdirs(new HPath(s"${path3}_rebucketing"))
    AggState.merged(spark, path3, groupCols).collect().toSet shouldBe expected
    fs.exists(new HPath(s"${path3}_rebucketing")) shouldBe true // reader: untouched
    AggState.absorb(spark, path3, delta.filter(col("user_id") < 4),
      groupCols, "value", 10000, bucketOf)
    fs.exists(new HPath(s"${path3}_rebucketing")) shouldBe false // writer: cleaned
  }

  test("shrinkDistinctK: truncation is exact, growing is refused, the old k fails loudly afterwards") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/dstate"
    val grp = Seq("event_type")
    val bkt = pmod(hash(col("event_type")), lit(4)).cast("long")
    AggState.writeDistinct(base, grp, "user_id", 16, bkt, path)
    AggState.absorbDistinct(spark, path, delta, grp, "user_id", 16, bkt)
    AggState.shrinkDistinctK(spark, path, 8)
    // exactness: the shrunk store's sketches ARE a from-scratch k=8
    // build (the k-min truncation identity), estimates included
    val fresh = s"$dir/fresh"
    AggState.writeDistinct(ev, grp, "user_id", 8, bkt, fresh)
    AggState.distinctEstimates(spark, path, grp, 8)
      .collect().toSet shouldBe
      AggState.distinctEstimates(spark, fresh, grp, 8).collect().toSet
    spark.read.parquet(path).select(col("event_type"), col("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap shouldBe
      spark.read.parquet(fresh).select(col("event_type"), col("ks"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // the meta restamped: the OLD k now fails loudly, the new k works
    val stale = intercept[IllegalArgumentException] {
      AggState.absorbDistinct(spark, path, delta, grp, "user_id", 16, bkt)
    }
    stale.getMessage should include("k=8")
    AggState.absorbDistinct(spark, path, delta, grp, "user_id", 8, bkt)
    // growing k is not migratable from the store — loud refusal
    val grow = intercept[RuntimeException] {
      AggState.shrinkDistinctK(spark, path, 64)
    }
    grow.getMessage should include("SHRINK")
  }

  test("maybeRebucket policy: no-op within band, migrates at drift, answers survive, old spec fails") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    val b4 = AggState.hashBucketsOf("user_id", 4)
    AggState.write(ev, groupCols, "value", 10000, b4, path)
    val groups = AggState.merged(spark, path, groupCols).count()
    val expected = AggState.partials(ev, groupCols, "value", 10000)
      .collect().toSet
    // within the doubling band (want ≈ have): no migration, and the
    // original spec still owns maintenance
    AggState.maybeRebucket(spark, path, groupCols, "value", 10000,
      "user_id", 4, math.max(1L, groups / 4)) shouldBe None
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    // a target small enough that want ≥ 2×have: migrates, returns the
    // new count, answers unchanged under the new geometry
    val grown = AggState.maybeRebucket(spark, path, groupCols, "value",
      10000, "user_id", 4, math.max(1L, groups / 8))
    grown should not be None
    val n2 = grown.get
    n2 should be >= 8
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe expected
    // maintenance threads the returned geometry; the old spec is loud
    val d2 = delta.filter(col("user_id") < 4)
    AggState.absorb(spark, path, d2, groupCols, "value", 10000,
      AggState.hashBucketsOf("user_id", n2))
    AggState.merged(spark, path, groupCols).collect().toSet shouldBe
      AggState.partials(ev.unionByName(d2), groupCols, "value", 10000)
        .collect().toSet
    intercept[IllegalArgumentException] {
      AggState.absorb(spark, path, d2, groupCols, "value", 10000, b4)
    }
    // a huge target (want = 1, ≤ ½ of have): shrinks
    AggState.maybeRebucket(spark, path, groupCols, "value", 10000,
      "user_id", n2, Long.MaxValue) shouldBe Some(1)
    // distinct store: same policy over the sketch layout
    val dpath = s"$dir/dstate"
    val grp = Seq("event_type")
    AggState.writeDistinct(ev, grp, "user_id", 64,
      AggState.hashBucketsOf("event_type", 8), dpath)
    val before = AggState.distinctEstimates(spark, dpath, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dGroups = before.size.toLong
    AggState.maybeRebucketDistinct(spark, dpath, grp, "user_id", 64,
      "event_type", 8, math.max(1L, dGroups / 8)) shouldBe None
    AggState.maybeRebucketDistinct(spark, dpath, grp, "user_id", 64,
      "event_type", 8, Long.MaxValue) shouldBe Some(1)
    AggState.distinctEstimates(spark, dpath, grp, 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap shouldBe before
  }

  test("mg store: state bounded at k, guaranteed candidates survive, two-pass recount exact, lifecycle guards loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 4)
    // g1: a skewed corpus whose vocabulary (202 items) far exceeds
    // k=8 — compression must fire; g2: under k — must stay exact
    val base = ((Seq.fill(120)("hot1") ++ Seq.fill(60)("hot2") ++
        (0 until 200).map(i => s"cold$i")).map(("g1", _)) ++
      (Seq.fill(5)("x") ++ Seq.fill(3)("y")).map(("g2", _)))
      .toDF("grp", "w")
    AggState.writeMg(base, grp, "w", 8, bkt, path)
    // state bound: at most k counters per group, ever
    val stored = spark.read.parquet(path)
      .groupBy(col("grp")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stored("g1") should be <= 8L
    // undercount bound: N_g1 = 380, k = 8 ⇒ error ≤ 380/9 = 42.2; both
    // true-heavy items (120, 60 > 42.2) are GUARANTEED present, with
    // stored counts in [true − bound, true]
    val s1 = AggState.mgSummary(spark, path, grp)
      .filter(col("grp") === "g1").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    s1("hot1") should (be >= 78L and be <= 120L)
    s1("hot2") should (be >= 18L and be <= 60L)
    // a group under k is exact
    AggState.mgSummary(spark, path, grp).filter(col("grp") === "g2")
      .collect().map(r => r.getString(1) -> r.getLong(2))
      .toMap shouldBe Map("x" -> 5L, "y" -> 3L)
    // the exact two-pass read: candidates from the store, ONE
    // candidate-restricted recount of the source, threshold above the
    // bound — output must equal the full exact computation
    def twoPass(src: org.apache.spark.sql.DataFrame, thr: Long) = {
      val cands = AggState.mgSummary(spark, path, grp)
        .select(col("grp"), col("item").as("w"))
      src.join(broadcast(cands), Seq("grp", "w"))
        .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thr)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    twoPass(base, 50L) shouldBe Map(("g1", "hot1") -> 120L,
      ("g1", "hot2") -> 60L)
    // absorb a delta that promotes a new heavy item; the guarantee
    // tracks the grown N_g1 = 560 (bound 62.2)
    val delta = ((Seq.fill(80)("hot2") ++
      (200 until 300).map(i => s"cold$i")).map(("g1", _))).toDF("grp", "w")
    AggState.absorbMg(spark, path, delta, grp, "w", 8, bkt)
    spark.read.parquet(path).filter(col("grp") === "g1")
      .count() should be <= 8L
    twoPass(base.unionByName(delta), 100L) shouldBe
      Map(("g1", "hot1") -> 120L, ("g1", "hot2") -> 140L)
    // drifted k and crossed kinds fail loudly
    intercept[IllegalArgumentException] {
      AggState.absorbMg(spark, path, delta, grp, "w", 16, bkt)
    }.getMessage should include("k=8")
    intercept[IllegalArgumentException] {
      AggState.merged(spark, path, grp)
    }.getMessage should include("'mg'")
    // geometry migration: summary preserved, old spec loud after
    val before = AggState.mgSummary(spark, path, grp).collect().toSet
    AggState.rebucketMg(spark, path, grp, 8,
      AggState.hashBucketsOf("grp", 16))
    AggState.mgSummary(spark, path, grp).collect().toSet shouldBe before
    intercept[IllegalArgumentException] {
      AggState.absorbMg(spark, path, delta, grp, "w", 8, bkt)
    }.getMessage should include("bucketSpec")
  }

  test("mg rtbf: rebuildMgGroups equals from-scratch over survivors; emptied groups vanish; policy knob fires") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 4)
    val base = ((Seq.fill(120)("hot1") ++ Seq.fill(60)("hot2") ++
        (0 until 200).map(i => s"cold$i")).map(("g1", _)) ++
      (Seq.fill(5)("x") ++ Seq.fill(3)("y")).map(("g2", _)) ++
      Seq.fill(7)(("g3", "z"))).toDF("grp", "w")
    AggState.writeMg(base, grp, "w", 8, bkt, path)
    // forget every g1 "hot1" row and ALL of g3: rebuild g1/g3 from the
    // surviving source — g1's summary must be bit-identical to a
    // from-scratch build over the survivors (exact counts → the same
    // deterministic compression); g3 must become invisible; g2 (not
    // rebuilt) untouched
    val surviving = base.filter(!(col("grp") === "g1" && col("w") === "hot1") &&
      col("grp") =!= "g3")
    AggState.rebuildMgGroups(spark, path, Seq("g1", "g3").toDF("grp"),
      surviving, grp, "w", 8, bkt)
    val fresh = s"$dir/fresh"
    AggState.writeMg(surviving, grp, "w", 8, bkt, fresh)
    AggState.mgSummary(spark, path, grp).filter(col("grp") === "g1")
      .collect().toSet shouldBe
      AggState.mgSummary(spark, fresh, grp).filter(col("grp") === "g1")
        .collect().toSet
    AggState.mgSummary(spark, path, grp).filter(col("grp") === "g3")
      .count() shouldBe 0L
    AggState.mgSummary(spark, path, grp).filter(col("grp") === "g2")
      .collect().map(r => r.getString(1) -> r.getLong(2))
      .toMap shouldBe Map("x" -> 5L, "y" -> 3L)
    // the deleted group's counters are physically gone from the store
    spark.read.parquet(path).filter(col("grp") === "g3" && col("c") > 0)
      .count() shouldBe 0L
    // geometry policy for the mg kind: 2 surviving groups at a
    // 1-row-per-bucket target with 1 current bucket fires the
    // doubling discipline (want = 2 ≥ 2×1)
    AggState.maybeRebucketMg(spark, path, grp, 8, "grp", 1,
      1L) shouldBe Some(2)
    AggState.mgSummary(spark, path, grp).filter(col("grp") === "g2")
      .collect().map(r => r.getString(1) -> r.getLong(2))
      .toMap shouldBe Map("x" -> 5L, "y" -> 3L)
  }

  test("mg store rides the staged-swap crash contract") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 2)
    val base = (Seq.fill(9)("a") ++ Seq.fill(4)("b")).map(("g", _))
      .toDF("grp", "w")
    AggState.writeMg(base, grp, "w", 4, bkt, path)
    val expected = AggState.mgSummary(spark, path, grp).collect().toSet
    // crash INSIDE the swap window: a complete staged generation (its
    // meta written last) beside a renamed-away live dir — the next
    // read rolls FORWARD and answers unchanged
    AggState.writeMg(base, grp, "w", 4, bkt, s"${path}_rebucketing")
    fs.rename(new HPath(path), new HPath(s"${path}_old")) shouldBe true
    AggState.mgSummary(spark, path, grp).collect().toSet shouldBe expected
    fs.exists(new HPath(s"${path}_old")) shouldBe false
    fs.exists(new HPath(s"${path}_rebucketing")) shouldBe false
    // maintenance continues on the healed store
    AggState.absorbMg(spark, path, Seq(("g", "a")).toDF("grp", "w"),
      grp, "w", 4, bkt)
    AggState.mgSummary(spark, path, grp)
      .filter(col("item") === "a").collect().head.getLong(2) shouldBe 10L
  }

  test("mg layered epochs: replay invisible, compact restores the k bound, two-pass stays exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 4)
    val base = ((Seq.fill(120)("hot1") ++ Seq.fill(60)("hot2") ++
        (0 until 200).map(i => s"cold$i")).map(("g1", _)) ++
      (Seq.fill(5)("x") ++ Seq.fill(3)("y")).map(("g2", _)))
      .toDF("grp", "w")
    val e0 = ((Seq.fill(80)("hot2") ++
      (200 until 250).map(i => s"cold$i")).map(("g1", _))).toDF("grp", "w")
    val e1 = (Seq.fill(30)("hot3").map(("g1", _)) ++
      Seq.fill(4)(("g2", "x"))).toDF("grp", "w")
    AggState.writeMg(base, grp, "w", 8, bkt, path)
    AggState.appendMgDelta(path, e0, 0L, grp, "w", 8, bkt)
    // crash replay: the SAME batch under the SAME epoch id —
    // byte-identical rows the (group, item, epoch) dedupe collapses
    AggState.appendMgDelta(path, e0, 0L, grp, "w", 8, bkt)
    AggState.appendMgDelta(path, e1, 1L, grp, "w", 8, bkt)
    def twoPass(src: org.apache.spark.sql.DataFrame, thr: Long) = {
      val cands = AggState.mgSummary(spark, path, grp)
        .select(col("grp"), col("item").as("w"))
      src.join(broadcast(cands), Seq("grp", "w"))
        .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thr)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    // the summary is replay-sensitive and deterministic here: base
    // g1's compression cut is exactly 1 (rank-9 item is a cold with
    // count 1), so stored hot2 = 59, and the layered read gives
    // 59 + 80 = 139 — a double-counted replay would read 219, a lost
    // layer 59
    val s1 = AggState.mgSummary(spark, path, grp)
      .filter(col("grp") === "g1").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    s1("hot2") shouldBe 139L
    s1("hot1") shouldBe 119L
    // layers are EXACT, so e1's hot3 (seen only in a layer) reads at
    // its true count
    s1("hot3") shouldBe 30L
    // two-pass read: N_g1 = 540 with only base mass (380) through a
    // compression ⇒ undercount ≤ 42.2; thr 100 is safely above it
    val expected = Map(("g1", "hot1") -> 120L, ("g1", "hot2") -> 140L)
    val full = base.unionByName(e0).unionByName(e1)
    twoPass(full, 100L) shouldBe expected
    // three layers resident (-1, 0, 1); the policy folds them
    AggState.layerCount(spark, path) shouldBe 3L
    AggState.maybeCompactMgState(spark, path, grp, 8,
      maxLayers = 2L) shouldBe true
    AggState.layerCount(spark, path) shouldBe 1L
    // the k bound is restored and the read is unchanged
    spark.read.parquet(path).filter(col("c") > 0)
      .groupBy(col("grp")).count().collect()
      .foreach(r => r.getLong(1) should be <= 8L)
    twoPass(full, 100L) shouldBe expected
    // a below-budget layer count is a no-op
    AggState.maybeCompactMgState(spark, path, grp, 8) shouldBe false
  }

  test("absorbMgStream converges: a drained stream equals the layered path") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 4)
    implicit val enc: Encoder[(String, String)] =
      Encoders.product[(String, String)]
    val base = ((Seq.fill(50)("hot1") ++ (0 until 100).map(i => s"c$i"))
      .map(("g1", _))).toDF("grp", "w")
    AggState.writeMg(base, grp, "w", 8, bkt, path)
    val stream = MemoryStream[(String, String)](enc, spark)
    val query = AggState.absorbMgStream(
      stream.toDF().toDF("grp", "w"), path, s"$dir/ckpt", grp, "w", 8, bkt)
    val b0 = Seq.fill(40)(("g1", "hot2"))
    val b1 = Seq.fill(25)(("g1", "hot3")) ++ Seq.fill(6)(("g2", "x"))
    try {
      stream.addData(b0)
      query.processAllAvailable()
      stream.addData(b1)
      query.processAllAvailable()
    } finally query.stop()
    val s1 = AggState.mgSummary(spark, path, grp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // stream layers are exact counts riding the append path
    s1(("g1", "hot2")) shouldBe 40L
    s1(("g1", "hot3")) shouldBe 25L
    s1(("g2", "x")) shouldBe 6L
    AggState.layerCount(spark, path) shouldBe 3L
  }

  test("mg compression is null-safe on group keys: a NULL group cannot escape the k bound") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/mg"
    val grp = Seq("grp")
    val bkt = AggState.hashBucketsOf("grp", 2)
    // a NULL-keyed group whose vocabulary (41 items) far exceeds k=8:
    // a name-based (null-unsafe) cut join would never match it and its
    // counters would survive compression unbounded
    val base = (Seq.fill(40)("hot") ++ (0 until 40).map(i => s"w$i"))
      .map(w => (Option.empty[String], w)).toDF("grp", "w")
      .unionByName(Seq.fill(9)(("g1", "a")).toDF("grp", "w"))
    AggState.writeMg(base, grp, "w", 8, bkt, path)
    spark.read.parquet(path).filter(col("grp").isNull && col("c") > 0)
      .count() should be <= 8L
    // the guaranteed-heavy item survives with its bounded count
    val hot = AggState.mgSummary(spark, path, grp)
      .filter(col("grp").isNull && col("item") === "hot")
      .collect().head.getLong(2)
    hot should (be >= 31L and be <= 40L)
    // and an absorb keeps the bound (the re-compression is the same
    // code path)
    val delta = (0 until 30).map(i => s"v$i")
      .map(w => (Option.empty[String], w)).toDF("grp", "w")
    AggState.absorbMg(spark, path, delta, grp, "w", 8, bkt)
    spark.read.parquet(path).filter(col("grp").isNull && col("c") > 0)
      .count() should be <= 8L
  }

  test("absorb creates partitions for buckets the store has never seen") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val path = s"$dir/state"
    AggState.write(base, groupCols, "value", 10000, bucketOf, path)
    val movedUp = delta.withColumn("user_id", col("user_id") + 1000000L)
    AggState.absorb(spark, path, movedUp, groupCols, "value", 10000,
      bucketOf)
    val expected = AggState
      .partials(base.unionByName(movedUp), groupCols, "value", 10000)
      .collect().toSet
    spark.read.parquet(path)
      .select(col("user_id"), col("event_type"), col("n"), col("sv"),
        col("mn"), col("mx"))
      .collect().toSet shouldBe expected
  }
}
