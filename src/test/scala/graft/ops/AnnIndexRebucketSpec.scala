package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Geometry migration for the persisted ANN index ([[AnnIndex.rebucket]]
  * / rebucketBanded / rebucketIvf): a migrated store must answer exactly
  * as one WRITTEN FRESH at the new geometry — for every layout, with
  * maintenance continuing after the migration, and across every crash
  * state of the staged swap. */
class AnnIndexRebucketSpec extends SparkSpec {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
  private def fs = new HPath("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("flat rebucket answers exactly as a fresh index at the new planes, raw and centered") {
    for (centered <- Seq(false, true)) {
      val dir = Files.createTempDirectory("graft-annrbk").toString
      AnnIndex.write(emb, planes = 3, path = s"$dir/idx",
        centered = centered)
      AnnIndex.rebucket(spark, s"$dir/idx", newPlanes = 5)
      AnnIndex.readMeta(s"$dir/idx").planes shouldBe 5
      val migrated = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
        .collect().toSet
      val fromScratch = Similarity
        .topKNeighborsLshMultiProbe(emb, qs, k = 5, planes = 5,
          centered = centered)
        .collect().toSet
      withClue(s"centered=$centered: ") { migrated shouldBe fromScratch }
    }
  }

  test("append AFTER rebucket encodes with the migrated geometry") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.write(half, planes = 3, path = s"$dir/idx")
    AnnIndex.rebucket(spark, s"$dir/idx", newPlanes = 5)
    AnnIndex.append(rest, s"$dir/idx")
    AnnIndex.write(emb, planes = 5, path = s"$dir/fresh")
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$dir/fresh", qs, k = 5).collect().toSet
  }

  test("quantized rebucket: the migrated geometry is the RECONSTRUCTION's geometry, exactly") {
    // the store keeps int8 codes, not floats, so rebucket re-hashes the
    // reconstruction — which must equal a fresh quantized index built
    // over the reconstructed corpus (both sides re-quantize it the same
    // way). The reconstruction formula mirrors AnnIndex.quantCols.
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.write(emb, planes = 3, path = s"$dir/idx", quantized = true)
    AnnIndex.rebucket(spark, s"$dir/idx", newPlanes = 5)
    val vd = Similarity.toDouble(col("embedding"))
    val scale = greatest(array_max(transform(vd, x => abs(x))), lit(1e-12))
    val recon = emb.select(col("vec_id"),
      transform(vd, x =>
        floor(x / scale * 127 + lit(0.5)).cast("byte").cast("double") *
          scale / 127).as("embedding"))
    AnnIndex.write(recon, planes = 5, path = s"$dir/fresh",
      quantized = true)
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$dir/fresh", qs, k = 5).collect().toSet
  }

  test("banded rebucket answers exactly as a fresh banded index at the new geometry") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.writeBanded(emb, bands = 2, planesPerBand = 2,
      path = s"$dir/idx")
    AnnIndex.rebucketBanded(spark, s"$dir/idx", newBands = 3,
      newPlanesPerBand = 3)
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.bands shouldBe 3
    meta.planesPerBand shouldBe 3
    AnnIndex.writeBanded(emb, bands = 3, planesPerBand = 3,
      path = s"$dir/fresh")
    AnnIndex.topKBanded(spark, s"$dir/idx", qs, k = 5)
      .collect().toSet shouldBe
      AnnIndex.topKBanded(spark, s"$dir/fresh", qs, k = 5)
        .collect().toSet
  }

  test("IVF rebucket RE-TRAINS: answers exactly as a fresh IVF index at the new cell count") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.writeIvf(emb, nClusters = 4, path = s"$dir/idx")
    AnnIndex.rebucketIvf(spark, s"$dir/idx", newNClusters = 6)
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.centIds.size shouldBe 6
    AnnIndex.writeIvf(emb, nClusters = 6, path = s"$dir/fresh")
    // the re-trained quantizer must be the fresh one (lowest-id rule)
    meta.centIds shouldBe AnnIndex.readMeta(s"$dir/fresh").centIds
    AnnIndex.topKIvf(spark, s"$dir/idx", qs, k = 5, nProbe = 2)
      .collect().toSet shouldBe
      AnnIndex.topKIvf(spark, s"$dir/fresh", qs, k = 5, nProbe = 2)
        .collect().toSet
  }

  test("rebucket crash in the swap window, stage COMPLETE: rolls FORWARD to the new geometry") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 3, path = idx)
    // a complete rebucket stage is data + meta at the new geometry —
    // fabricate it as a fresh 5-plane index in the stage dir, then
    // "crash" after the first rename (live → _old), before the second
    AnnIndex.write(emb, planes = 5, path = s"${idx}_rebucketing")
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    // next probe heals FORWARD: answers are the migrated geometry's
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe
      Similarity.topKNeighborsLshMultiProbe(emb, qs, k = 5, planes = 5)
        .collect().toSet
    AnnIndex.readMeta(idx).planes shouldBe 5
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_rebucketing")) shouldBe false
  }

  test("rebucket crash mid-stage, stage INCOMPLETE: rolls back; stray stage beside a live store is dropped") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 3, path = idx)
    val before = AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet
    // state A: live renamed away, stage exists but has no meta file
    Files.createDirectories(Paths.get(s"${idx}_rebucketing"))
    Files.write(Paths.get(s"${idx}_rebucketing/part-halfwritten"),
      Array[Byte](1, 2, 3))
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe before
    AnnIndex.readMeta(idx).planes shouldBe 3
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_rebucketing")) shouldBe false
    // state B: crash BEFORE the first rename — stray stage beside the
    // live store; the next MUTATING entry point discards it
    Files.createDirectories(Paths.get(s"${idx}_rebucketing"))
    Files.write(Paths.get(s"${idx}_rebucketing/part-halfwritten"),
      Array[Byte](1, 2, 3))
    AnnIndex.compact(spark, idx)
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe before
    fs.exists(new HPath(s"${idx}_rebucketing")) shouldBe false
  }

  test("delete AFTER rebucket prunes with the migrated geometry") {
    // delete recomputes each victim's bucket from the PERSISTED meta —
    // after a migration that must be the new planes, or the affected-
    // bucket set misses every victim and the delete silently no-ops
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.write(emb, planes = 3, path = s"$dir/idx")
    AnnIndex.rebucket(spark, s"$dir/idx", newPlanes = 5)
    val victims = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))
    AnnIndex.delete(spark, victims, s"$dir/idx")
    AnnIndex.write(emb.filter(col("vec_id") % 7 =!= 3), planes = 5,
      path = s"$dir/fresh")
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$dir/fresh", qs, k = 5).collect().toSet
  }

  test("maybeRebucket: the geometry schedule is code — under-drift no-op, over-drift migrates, all layouts") {
    val nVec = emb.count()
    // flat: target sized so the budget equals the stamped planes → no-op
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.write(emb, planes = 3, path = s"$dir/idx")
    val okTarget = math.max(1L, nVec / 8) // log2(n/(n/8)) = 3
    AnnIndex.recommendedPlanes(nVec, okTarget) shouldBe 3
    AnnIndex.maybeRebucket(spark, s"$dir/idx", okTarget) shouldBe false
    AnnIndex.readMeta(s"$dir/idx").planes shouldBe 3
    // shrink the target bucket → budget grows → migrates
    AnnIndex.maybeRebucket(spark, s"$dir/idx",
      math.max(1L, nVec / 32)) shouldBe true
    AnnIndex.readMeta(s"$dir/idx").planes shouldBe
      AnnIndex.recommendedPlanes(nVec, math.max(1L, nVec / 32))
    // IVF: the doubling discipline — 1.5× drift is a no-op, 2× migrates
    val ivf = s"$dir/ivf"
    AnnIndex.writeIvf(emb, nClusters = 4, path = ivf)
    AnnIndex.maybeRebucket(spark, ivf,
      math.max(1L, nVec / 6)) shouldBe false // want 6 < 2*4
    AnnIndex.maybeRebucket(spark, ivf,
      math.max(1L, nVec / 8)) shouldBe true // want 8 = 2*4
    AnnIndex.readMeta(ivf).centIds.size shouldBe
      (nVec / math.max(1L, nVec / 8)).toInt
    // banded: planesPerBand re-budgeted from the PER-BAND copy count
    val bnd = s"$dir/banded"
    AnnIndex.writeBanded(emb, bands = 2, planesPerBand = 2, path = bnd)
    AnnIndex.maybeRebucket(spark, bnd,
      math.max(1L, nVec / 8)) shouldBe true // log2(n/(n/8)) = 3 != 2
    val m = AnnIndex.readMeta(bnd)
    m.bands shouldBe 2
    m.planesPerBand shouldBe 3
  }

  test("layout guards: the wrong rebucket entry point fails loudly") {
    val dir = Files.createTempDirectory("graft-annrbk").toString
    AnnIndex.writeBanded(emb, bands = 2, planesPerBand = 2,
      path = s"$dir/banded")
    AnnIndex.write(emb, planes = 3, path = s"$dir/flat")
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.rebucket(spark, s"$dir/banded", newPlanes = 5)
    }
    e1.getMessage should include("rebucketBanded")
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.rebucketIvf(spark, s"$dir/flat", newNClusters = 4)
    }
    e2.getMessage should include("rebucket")
  }
}
