package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-retention right-to-be-forgotten ([[CcState.writeEdges]] /
  * [[CcState.absorbEdges]] / [[CcState.deleteNodes]]): deleting a node
  * must re-solve EXACTLY its component from the surviving persisted
  * edges — splits included, edge-less survivors as singletons — purge
  * the node from both stores physically, leave every other component's
  * buckets untouched, and keep the merge log free of records that
  * could relabel a survivor. */
class CcStateRtbfSpec extends SparkSpec {

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

  /** Build label + edge stores in lockstep. */
  private def build(dir: String, base: Seq[(Long, Long)],
      deltas: Seq[(Long, Long)]*): (String, String) = {
    val (cc, ed) = (s"$dir/cc", s"$dir/edges")
    CcState.write(edgesDf(base: _*), cc, buckets = 8)
    CcState.writeEdges(edgesDf(base: _*), ed, buckets = 8)
    deltas.foreach { d =>
      CcState.absorb(spark, edgesDf(d: _*), cc)
      CcState.absorbEdges(spark, edgesDf(d: _*), ed)
    }
    (cc, ed)
  }

  test("deleting a cut vertex SPLITS its component; survivors relabel, other components untouched") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    // component A: 1-5-9 chain through cut vertex 5; component B: 20-21
    val base = Seq((1L, 5L), (5L, 9L), (20L, 21L))
    val (cc, ed) = build(dir, base)
    CcState.deleteNodes(spark, Seq(5L).toDF("node"), cc, ed)
    // 1 and 9 lost their only edges → singletons; B untouched
    stateLabels(cc) shouldBe Map(1L -> 1L, 9L -> 9L, 20L -> 20L, 21L -> 20L)
    // the node is physically gone from BOTH stores
    spark.read.parquet(cc).filter(col("node") === 5L).count() shouldBe 0L
    spark.read.parquet(ed)
      .filter(col("node") === 5L || col("peer") === 5L)
      .count() shouldBe 0L
  }

  test("deleting the MIN-id label holder relabels the survivors and purges the stale merge log") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    // base: {10,11} labeled 10 and {20,21} labeled 20; the delta's new
    // node 1 bridges them — the merged cluster relabels to 1 through
    // the merge log (records 10→1 and 20→1)
    val base = Seq((10L, 11L), (20L, 21L))
    val delta = Seq((1L, 10L), (1L, 20L))
    val (cc, ed) = build(dir, base, delta)
    stateLabels(cc) shouldBe ccScratch(base ++ delta: _*)
    CcState.mergeLogSize(spark, cc) should be > 0L
    // forget node 1: the bridge vanishes, the component splits back,
    // and 10/20 become cluster labels AGAIN — the stale log records
    // 10→1 / 20→1 would relabel them to a deleted node if kept
    CcState.deleteNodes(spark, Seq(1L).toDF("node"), cc, ed)
    stateLabels(cc) shouldBe
      Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    CcState.mergeLogSize(spark, cc) shouldBe 0L
  }

  test("a deletion batch, absorbs continue afterwards, labels track from-scratch CC") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
    val day1 = Seq((3L, 10L), (12L, 20L))
    val (cc, ed) = build(dir, base, day1)
    // forget nodes 2 and 11 in one batch (they sit in the SAME merged
    // component — the batch path must handle shared components)
    CcState.deleteNodes(spark, Seq(2L, 11L).toDF("node"), cc, ed)
    val surviving = (base ++ day1)
      .filter(e => e._1 != 2L && e._2 != 2L && e._1 != 11L && e._2 != 11L)
    val expect = ccScratch(surviving: _*) ++
      // edge-less survivors are their own clusters
      Map(1L -> 1L)
    stateLabels(cc) shouldBe expect
    // the pair of stores keeps maintaining: a later absorb re-bridges
    val day2 = Seq((1L, 21L))
    CcState.absorb(spark, edgesDf(day2: _*), cc)
    CcState.absorbEdges(spark, edgesDf(day2: _*), ed)
    stateLabels(cc) shouldBe ccScratch(surviving ++ day2: _*)
  }

  test("deleteNodes is at-least-once: re-running a completed batch is a no-op; unknown ids are a no-op") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = Seq((1L, 5L), (5L, 9L), (20L, 21L))
    val (cc, ed) = build(dir, base)
    CcState.deleteNodes(spark, Seq(5L).toDF("node"), cc, ed)
    val after = stateLabels(cc)
    CcState.deleteNodes(spark, Seq(5L).toDF("node"), cc, ed) // replay
    stateLabels(cc) shouldBe after
    CcState.deleteNodes(spark, Seq(999L).toDF("node"), cc, ed) // unknown
    stateLabels(cc) shouldBe after
  }

  test("crash in the staged label swap: the manifest redo heals to the post-delete answers") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = Seq((1L, 5L), (5L, 9L), (20L, 21L))
    val (cc, ed) = build(dir, base)
    // control: the same delete run cleanly
    val (cc2, ed2) = build(s"$dir/ctl", base)
    CcState.deleteNodes(spark, Seq(5L).toDF("node"), cc2, ed2)
    val expect = stateLabels(cc2)
    // fabricate the post-stage crash: run the real delete to produce
    // the stage, then re-create the crash state — stage intact (data +
    // manifest), live buckets NOT yet swapped. Build the stage by hand
    // exactly as stageLabelDelete does: the affected component here is
    // {1,5,9}, new labels {1→1, 9→9}, log empty.
    val buckets = 8
    val comp = Seq(1L, 5L, 9L)
    val tmp = s"${cc}_deleting"
    val compBuckets = comp.toDF("node")
      .select(pmod(hash(col("node")), lit(buckets)).as("b"))
      .distinct().collect().map(r => s"pbucket=${r.getInt(0)}").toSeq
      .filter(d => fs.exists(new HPath(cc, d)))
    // the stage carries the affected buckets' PASS-THROUGH rows (other
    // components sharing a bucket) plus the rebuilt labels, exactly as
    // stageLabelDelete writes it
    val keep = spark.read.option("basePath", cc)
      .parquet(compBuckets.map(d => s"$cc/$d"): _*)
      .select(col("node"), col("cluster"))
      .filter(!col("node").isin(comp: _*))
    keep.unionByName(Seq((1L, 1L), (9L, 9L)).toDF("node", "cluster"))
      .withColumn("pbucket", pmod(hash(col("node")), lit(buckets)))
      .repartition(col("pbucket"))
      .write.mode("overwrite").partitionBy("pbucket").parquet(tmp)
    val manifest = (compBuckets.map { d =>
      s"$d,${if (fs.exists(new HPath(tmp, d))) "kept" else "emptied"}"
    } :+ "log,emptied").mkString("\n")
    val out = fs.create(new HPath(tmp, "_graft_affected"), true)
    out.write(manifest.getBytes(StandardCharsets.UTF_8)); out.close()
    // worst crash point: one kept bucket's live dir already deleted
    compBuckets.find(d => fs.exists(new HPath(tmp, d))).foreach { d =>
      fs.delete(new HPath(cc, d), true)
    }
    // reads are heal-only-if-missing (the labels read-safety rule), so
    // recovery runs at the next ENTRY POINT — invoke it directly, as
    // the next absorb/compact/deleteNodes would
    CcState.recover(spark, cc)
    stateLabels(cc) shouldBe expect
    fs.exists(new HPath(tmp)) shouldBe false
  }

  test("stage WITHOUT a manifest is discarded: the delete 'didn't happen'") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = Seq((1L, 5L), (5L, 9L))
    val (cc, ed) = build(dir, base)
    val before = stateLabels(cc)
    Files.createDirectories(java.nio.file.Paths.get(s"${cc}_deleting"))
    Files.write(java.nio.file.Paths.get(s"${cc}_deleting/part-half"),
      Array[Byte](1, 2, 3))
    CcState.absorb(spark, edgesDf((30L, 31L)), cc)
    CcState.absorbEdges(spark, edgesDf((30L, 31L)), ed)
    stateLabels(cc) shouldBe before ++ Map(30L -> 30L, 31L -> 30L)
    fs.exists(new HPath(s"${cc}_deleting")) shouldBe false
  }

  test("compactEdges purges redelivery duplicates physically; deletes still resolve the right component") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = Seq((1L, 5L), (5L, 9L), (20L, 21L))
    val (cc, ed) = build(dir, base)
    // redelivered batch: duplicate (node, peer) rows land in the store
    CcState.absorbEdges(spark, edgesDf((1L, 5L)), ed)
    CcState.edgeDuplicateCount(spark, ed) shouldBe 2L // both directions
    // policy: under threshold no-op, at threshold compacts
    CcState.maybeCompactEdges(spark, ed, threshold = 3L) shouldBe false
    CcState.maybeCompactEdges(spark, ed, threshold = 2L) shouldBe true
    CcState.edgeDuplicateCount(spark, ed) shouldBe 0L
    spark.read.parquet(ed).count() shouldBe base.size * 2L
    // the purged store still drives the component-priced delete
    CcState.deleteNodes(spark, Seq(5L).toDF("node"), cc, ed)
    stateLabels(cc) shouldBe Map(1L -> 1L, 9L -> 9L, 20L -> 20L, 21L -> 20L)
  }

  test("maybeRebucket: doubling discipline on the label store — no-op under drift, migrates at 2x") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val base = (1L to 16L).map(i => (i * 2, i * 2 + 1))
    CcState.write(edgesDf(base: _*), s"$dir/cc", buckets = 8)
    val rows = spark.read.parquet(s"$dir/cc").count()
    CcState.maybeRebucket(spark, s"$dir/cc",
      math.max(1L, rows / 8)) shouldBe false
    CcState.maybeRebucket(spark, s"$dir/cc",
      math.max(1L, rows / 16)) shouldBe true
    // labels unchanged by the migration
    stateLabels(s"$dir/cc") shouldBe ccScratch(base: _*)
  }

  test("absorbEdges rejects a type-drifted delta; deleteNodes rejects type-drifted ids") {
    val dir = Files.createTempDirectory("graft-ccrtbf").toString
    val (cc, ed) = build(dir, Seq((1L, 2L)))
    val intEdges = Seq((3, 4)).toDF("id_a", "id_b")
    val e1 = intercept[IllegalArgumentException] {
      CcState.absorbEdges(spark, intEdges, ed)
    }
    e1.getMessage should include("node type")
    val e2 = intercept[IllegalArgumentException] {
      CcState.deleteNodes(spark, Seq(1).toDF("node"), cc, ed)
    }
    e2.getMessage should include("nodes")
  }
}
