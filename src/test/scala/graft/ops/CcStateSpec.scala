package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted CC state: an absorbed delta of edges must leave labels
  * identical to a from-scratch CC over the union — for every merge
  * topology a delta can create — at delta cost (partition-pruned
  * lookups, append-only writes between compacts). */
class CcStateSpec extends SparkSpec {

  import spark.implicits._

  private def fs = new HPath("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("id_a", "id_b")

  private def ccScratch(pairs: (Long, Long)*) =
    Dedup.connectedComponents(edgesDf(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def stateLabels(path: String) =
    CcState.labels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("absorb covers every merge topology: join, chain, new cluster, smaller-id relabel") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    // day 0: three clusters {10,11}, {20,21}, {30,31}
    val day0 = Seq((10L, 11L), (20L, 21L), (30L, 31L))
    CcState.write(edgesDf(day0: _*), path, buckets = 8)
    stateLabels(path) shouldBe ccScratch(day0: _*)
    // day 1, every topology at once:
    //  - resident-resident merge (10-cluster absorbs 20-cluster)
    //  - new node joining a resident cluster (32 → 30-cluster)
    //  - an all-new cluster {40, 41}
    //  - a NEW node with a SMALLER id than a resident cluster's min
    //    (5 → 30-cluster: the resident rows must relabel to 5)
    val day1 = Seq((11L, 20L), (32L, 30L), (40L, 41L), (5L, 31L))
    CcState.absorb(spark, edgesDf(day1: _*), path)
    stateLabels(path) shouldBe ccScratch(day0 ++ day1: _*)
    // day 2: chain-merge across the day-1 result (40-cluster joins the
    // 5-cluster) — exercises merge-log chains A→B then B→C
    val day2 = Seq((41L, 32L))
    CcState.absorb(spark, edgesDf(day2: _*), path)
    val expected = ccScratch(day0 ++ day1 ++ day2: _*)
    stateLabels(path) shouldBe expected
    // compact folds the log in, clears it, and changes no label
    CcState.compact(spark, path)
    stateLabels(path) shouldBe expected
    fs.exists(new HPath(s"${path}_merges")) shouldBe false
    // absorb after compact keeps working (meta survived the swap)
    CcState.absorb(spark, edgesDf((40L, 10L)), path)
    stateLabels(path) shouldBe
      ccScratch((day0 ++ day1 ++ day2 :+ ((40L, 10L))): _*)
  }

  test("absorb is idempotent: replaying a delta changes nothing") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L), (3L, 4L)), path, buckets = 4)
    val delta = edgesDf((2L, 3L), (7L, 8L))
    CcState.absorb(spark, delta, path)
    val once = stateLabels(path)
    val logOnce =
      spark.read.parquet(s"${path}_merges").count()
    CcState.absorb(spark, delta, path) // at-least-once replay
    stateLabels(path) shouldBe once
    // the replay appended nothing: every endpoint was resident, every
    // contracted edge a self-loop
    spark.read.parquet(s"${path}_merges").count() shouldBe logOnce
    once shouldBe ccScratch((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L))
  }

  test("absorb reads only the delta's buckets; resident files are never rewritten") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val bands = Dedup.bandKeys(docs, "text", "doc_id", 4, 4, 3)
    val pairs = Dedup.candidatePairs(bands)
    CcState.write(pairs, path, buckets = 8)
    // fingerprint every data file, then absorb a small delta
    def files() = fs.listStatus(new HPath(path))
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .map(s => s.getPath.toString ->
        (s.getLen, s.getModificationTime)).toMap
    val before = files()
    val delta = edgesDf((1L, 2L), (9000001L, 9000002L))
    // pruning, pinned the hard way: physically REMOVE a bucket the
    // delta's nodes do not hash to — if absorb listed or read it, the
    // job would fail on the missing input
    val touched = delta.select(col("id_a").as("node"))
      .union(delta.select(col("id_b").as("node")))
      .select(pmod(hash(col("node")), lit(8))).distinct()
      .collect().map(_.getInt(0)).toSet
    val untouchedDir = fs.listStatus(new HPath(path))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .find(d => d.startsWith("pbucket=") &&
        !touched.contains(d.stripPrefix("pbucket=").toInt))
    untouchedDir should not be empty
    fs.delete(new HPath(path, untouchedDir.get), true) shouldBe true
    CcState.absorb(spark, delta, path)
    val after = files()
    // resident files byte-stable: appends add files, never rewrite
    before.filterNot(_._1.contains(untouchedDir.get)).foreach {
      case (f, sig) => after.get(f) shouldBe Some(sig)
    }
    (after.keySet -- before.keySet) should not be empty
  }

  test("absorbStream converges to from-scratch CC; a replayed epoch changes nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    val day0 = Seq((10L, 11L), (20L, 21L))
    CcState.write(edgesDf(day0: _*), path, buckets = 4)
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long)] =
      org.apache.spark.sql.Encoders.product[(Long, Long)]
    val stream = MemoryStream[(Long, Long)](enc, spark)
    val q = CcState.absorbStream(
      stream.toDF().toDF("id_a", "id_b"), path, s"$dir/ckpt")
    val e0 = Seq((11L, 20L), (40L, 41L))
    val e1 = Seq((5L, 21L))
    try {
      stream.addData(e0)
      q.processAllAvailable()
      stream.addData(e1)
      q.processAllAvailable()
    } finally q.stop()
    val expected = ccScratch(day0 ++ e0 ++ e1: _*)
    stateLabels(path) shouldBe expected
    // crash redelivery: the storage-layer effect of a replayed epoch
    CcState.absorb(spark, edgesDf(e0: _*), path)
    stateLabels(path) shouldBe expected
    CcState.compact(spark, path)
    stateLabels(path) shouldBe expected
  }

  test("absorb rejects a delta whose id type differs from the store's node type") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L), (3L, 4L)), path, buckets = 4)
    // hash(Int) != hash(Long) for equal values — an Int-typed delta
    // would silently mis-prune buckets and append duplicate nodes
    val intDelta = Seq((2, 3), (7, 8)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      CcState.absorb(spark, intDelta, path)
    }
    e.getMessage should include("node type")
    // the cast the message prescribes flows
    CcState.absorb(spark,
      intDelta.select(col("id_a").cast("long"), col("id_b").cast("long")),
      path)
    stateLabels(path) shouldBe
      ccScratch((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L))
  }

  test("merge-log telemetry: size surfaced; maybeCompact folds past threshold, labels unchanged") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)), path,
      buckets = 4)
    CcState.mergeLogSize(spark, path) shouldBe 0L
    // a merge-heavy sequence: each absorb chains another resident
    // cluster onto the first, appending merge records every time
    CcState.absorb(spark, edgesDf((2L, 3L)), path)
    CcState.absorb(spark, edgesDf((4L, 5L)), path)
    CcState.absorb(spark, edgesDf((6L, 7L)), path)
    val grown = CcState.mergeLogSize(spark, path)
    grown should be > 0L
    // under threshold: no compact, log untouched
    CcState.maybeCompact(spark, path, threshold = grown + 1) shouldBe false
    CcState.mergeLogSize(spark, path) shouldBe grown
    val expected = stateLabels(path)
    // past threshold: compact folds the log and clears it
    CcState.maybeCompact(spark, path, threshold = grown) shouldBe true
    CcState.mergeLogSize(spark, path) shouldBe 0L
    stateLabels(path) shouldBe expected
    expected shouldBe ccScratch((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L),
      (2L, 3L), (4L, 5L), (6L, 7L))
  }

  test("labels is read-safe: it never deletes a live compact's staging dir") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L)), path, buckets = 4)
    // simulate an in-flight compact: a _compacting stage exists while
    // the live dir is still present — a reader must not clean it up
    // (recover()'s stray-dir delete would abort the writer's compact)
    fs.mkdirs(new HPath(s"${path}_compacting"))
    stateLabels(path) shouldBe ccScratch((1L, 2L))
    fs.exists(new HPath(s"${path}_compacting")) shouldBe true
    // writer-side entry points still clean strays (single-writer: if
    // absorb runs, no compact is in flight)
    CcState.absorb(spark, edgesDf((2L, 3L)), path)
    fs.exists(new HPath(s"${path}_compacting")) shouldBe false
  }

  test("rebucket: new geometry preserves labels, folds the log, and later absorbs keep working") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L), (3L, 4L), (10L, 11L)), path,
      buckets = 2)
    CcState.absorb(spark, edgesDf((2L, 3L)), path) // creates merge log
    val expected = ccScratch((1L, 2L), (3L, 4L), (10L, 11L), (2L, 3L))
    CcState.rebucket(spark, path, 8)
    // labels unchanged, log folded, meta carries the NEW count
    stateLabels(path) shouldBe expected
    fs.exists(new HPath(s"${path}_merges")) shouldBe false
    val in = fs.open(new HPath(path, "_graft_cc_meta"))
    val meta = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    meta should include("buckets=8")
    // maintenance under the new geometry: absorb prunes with the new
    // hash and converges to from-scratch CC
    CcState.absorb(spark, edgesDf((4L, 10L), (20L, 21L)), path)
    stateLabels(path) shouldBe ccScratch((1L, 2L), (3L, 4L), (10L, 11L),
      (2L, 3L), (4L, 10L), (20L, 21L))
  }

  test("compact crash between renames rolls forward; labels survive") {
    val dir = Files.createTempDirectory("graft-ccstate").toString
    val path = s"$dir/cc"
    CcState.write(edgesDf((1L, 2L), (3L, 4L)), path, buckets = 4)
    CcState.absorb(spark, edgesDf((2L, 3L)), path)
    val expected = stateLabels(path)
    // stage exactly what compact stages (meta last), crash after the
    // first rename: live gone, stage complete
    CcState.labels(spark, path)
      .withColumn("pbucket", pmod(hash(col("node")), lit(4)))
      .repartition(col("pbucket"))
      .write.mode("overwrite").partitionBy("pbucket")
      .parquet(s"${path}_compacting")
    val out = fs.create(new HPath(s"${path}_compacting/_graft_cc_meta"), true)
    out.write("buckets=4\n".getBytes("UTF-8")); out.close()
    fs.rename(new HPath(path), new HPath(s"${path}_old")) shouldBe true
    // next read heals forward and answers unchanged
    stateLabels(path) shouldBe expected
    fs.exists(new HPath(s"${path}_old")) shouldBe false
    fs.exists(new HPath(s"${path}_compacting")) shouldBe false
  }
}
