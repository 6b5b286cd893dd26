package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-recovery contract of the persisted ANN index: every entry
  * point runs [[AnnIndex.recover]] first, so whatever state an
  * interrupted compact/delete left behind, the NEXT call sees a
  * complete layout with the same answers. Each test fabricates the
  * exact on-disk state a crash at a given point leaves (the operations
  * are deterministic file moves, so the states are enumerable) and
  * asserts a plain topK heals it. */
class AnnIndexRecoverySpec extends SparkSpec {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
  private def fs = new HPath("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("compact crash between renames, stage INCOMPLETE: rolls back to _old") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 4, path = idx)
    val before = AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet
    // crash point: live renamed away; the stage exists but never got
    // its meta file (= incomplete by the module's completeness marker)
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    Files.createDirectories(Paths.get(s"${idx}_compacting"))
    Files.write(Paths.get(s"${idx}_compacting/part-halfwritten"),
      Array[Byte](1, 2, 3))
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe before
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_compacting")) shouldBe false
  }

  test("compact crash between renames, stage COMPLETE: rolls forward") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 4, path = idx)
    AnnIndex.append(emb, idx) // duplicate every row: what compact removes
    val before = AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet
    // stage exactly what compact stages, meta last, then "crash" after
    // the first rename (live → _old) but before the second
    spark.read.parquet(idx).dropDuplicates("vec_id")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"${idx}_compacting")
    Files.copy(Paths.get(idx, "_graft_ann_meta"),
      Paths.get(s"${idx}_compacting", "_graft_ann_meta"))
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    // next read heals forward: same answers, duplicates physically gone
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe before
    spark.read.parquet(idx).groupBy("vec_id").count()
      .filter(col("count") > 1).count() shouldBe 0L
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_compacting")) shouldBe false
  }

  test("delete crash mid-swap: manifest redo handles pending, swapped and emptied buckets") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 4, path = idx)
    val meta = AnnIndex.readMeta(idx)
    val bucketed = emb.select(col("vec_id"),
      concat(lit("b"),
        Similarity.bucketKey(col("embedding"), 4, meta.dims)).as("bucket"))
    val counts = bucketed.groupBy("bucket").count().collect()
    counts.length should be >= 2
    // victims: EVERY row of the smallest bucket (forces the emptied
    // case) plus one row of the largest (the rewritten-in-place case)
    val emptiedBucket = counts.minBy(_.getLong(1)).getString(0)
    val keptBucket = counts.maxBy(_.getLong(1)).getString(0)
    val victimIds = (bucketed.filter(col("bucket") === emptiedBucket) union
      bucketed.filter(col("bucket") === keptBucket).limit(1))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val victims = emb.filter(col("vec_id").isin(victimIds: _*))
    val control = s"$dir/control"
    AnnIndex.write(emb.filter(!col("vec_id").isin(victimIds: _*)),
      planes = 4, path = control)
    // stage the delete exactly as AnnIndex.delete stages it
    val keyed = victims.select(col("vec_id"),
      concat(lit("b"),
        Similarity.bucketKey(col("embedding"), 4, meta.dims)).as("bucket"))
    val affected = Seq(emptiedBucket, keptBucket)
    val tmp = s"${idx}_deleting"
    spark.read.option("basePath", idx)
      .parquet(affected.map(b => s"$idx/bucket=$b"): _*)
      .join(broadcast(keyed.select(col("vec_id"))), Seq("vec_id"),
        "left_anti")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val manifest = affected.map { b =>
      val kept = fs.exists(new HPath(tmp, s"bucket=$b"))
      s"bucket=$b,${if (kept) "kept" else "emptied"}"
    }.mkString("\n")
    Files.write(Paths.get(tmp, "_graft_affected"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // crash at the WORST point of the swap loop: the kept bucket's live
    // dir is already deleted, its staged replacement not yet renamed in
    fs.delete(new HPath(idx, s"bucket=$keptBucket"), true) shouldBe true
    // next read must finish the swap and answer as if the delete ran
    AnnIndex.topK(spark, idx, qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, control, qs, k = 5).collect().toSet
    fs.exists(new HPath(tmp)) shouldBe false
    fs.exists(new HPath(idx, s"bucket=$emptiedBucket")) shouldBe false
    fs.exists(new HPath(idx, s"bucket=$keptBucket")) shouldBe true
  }

  test("banded delete crash mid-swap: nested band=/bucket= manifest redo heals") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.writeBanded(emb, bands = 3, planesPerBand = 3, path = idx)
    // victims: every vector of band 0's smallest bucket — that dir is
    // EMPTIED; the victims' copies in bands 1-2 leave their dirs KEPT
    val stored = spark.read.parquet(idx)
    val d0 = stored.filter(col("band") === 0)
      .groupBy("bucket").agg(countDistinct("vec_id").as("n"))
      .orderBy(col("n").asc, col("bucket").asc).head.getString(0)
    val victimIds = stored
      .filter(col("band") === 0 && col("bucket") === d0)
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSeq
    victimIds should not be empty
    val control = s"$dir/control"
    AnnIndex.writeBanded(emb.filter(!col("vec_id").isin(victimIds: _*)),
      bands = 3, planesPerBand = 3, path = control)
    // affected dirs: every (band, bucket) holding a victim copy
    val affected = stored.filter(col("vec_id").isin(victimIds: _*))
      .select(col("band"), col("bucket")).distinct().collect()
      .map(r => s"band=${r.getInt(0)}/bucket=${r.getString(1)}").toSeq
    affected.size should be >= 3 // one dir per band at least
    // stage exactly as AnnIndex.delete stages, manifest last
    val tmp = s"${idx}_deleting"
    spark.read.option("basePath", idx)
      .parquet(affected.map(d => s"$idx/$d"): _*)
      .filter(!col("vec_id").isin(victimIds: _*))
      .repartition(col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("band", "bucket").parquet(tmp)
    val manifest = affected.map { d =>
      val kept = fs.exists(new HPath(tmp, d))
      s"$d,${if (kept) "kept" else "emptied"}"
    }.mkString("\n")
    Files.write(Paths.get(tmp, "_graft_affected"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // crash at the worst point: one KEPT dir's live copy already gone,
    // its staged replacement not yet renamed in
    val crashed = affected.find(d => fs.exists(new HPath(tmp, d))).get
    fs.delete(new HPath(idx, crashed), true) shouldBe true
    // next banded probe heals the swap and answers as post-delete
    AnnIndex.topKBanded(spark, idx, qs, k = 5).collect().toSet shouldBe
      AnnIndex.topKBanded(spark, control, qs, k = 5).collect().toSet
    fs.exists(new HPath(tmp)) shouldBe false
    fs.exists(new HPath(idx, s"band=0/bucket=$d0")) shouldBe false
  }

  test("banded delete crash with the band's live parent dir GONE (object-store semantics): mkdirs heals") {
    // object stores have no empty directories: once the swap loop has
    // live-deleted every bucket of a band, the band= parent itself
    // vanishes, and the kept bucket's staged rename needs its parent
    // recreated — the mkdirs branch in applyDeleteSwap. Fabricate that
    // state: every band-0 bucket affected (the smallest fully emptied,
    // one victim from each other bucket), all band-0 live dirs deleted,
    // parent removed.
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    val sub = emb.filter(col("vec_id") < 24)
    AnnIndex.writeBanded(sub, bands = 2, planesPerBand = 2, path = idx)
    val stored = spark.read.parquet(idx)
    val band0 = stored.filter(col("band") === 0)
      .select(col("bucket"), col("vec_id")).distinct()
    val counts = band0.groupBy("bucket").count()
      .orderBy(col("count").asc, col("bucket").asc).collect()
    counts.length should be >= 2
    val smallest = counts.head.getString(0)
    // at least one other band-0 bucket must SURVIVE (≥ 2 vectors)
    counts.tail.exists(_.getLong(1) >= 2) shouldBe true
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("vec_id"))
    val onePerBucket = band0
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"))
    val victimIds = onePerBucket
      .union(band0.filter(col("bucket") === smallest).select(col("vec_id")))
      .distinct().collect().map(_.getLong(0)).toSeq
    val control = s"$dir/control"
    AnnIndex.writeBanded(sub.filter(!col("vec_id").isin(victimIds: _*)),
      bands = 2, planesPerBand = 2, path = control)
    // affected dirs: every (band, bucket) holding a victim copy —
    // includes ALL of band 0's buckets by construction
    val affected = stored.filter(col("vec_id").isin(victimIds: _*))
      .select(col("band"), col("bucket")).distinct().collect()
      .map(r => s"band=${r.getInt(0)}/bucket=${r.getString(1)}").toSeq
    val tmp = s"${idx}_deleting"
    spark.read.option("basePath", idx)
      .parquet(affected.map(d => s"$idx/$d"): _*)
      .filter(!col("vec_id").isin(victimIds: _*))
      .repartition(col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("band", "bucket").parquet(tmp)
    val manifest = affected.map { d =>
      val kept = fs.exists(new HPath(tmp, d))
      s"$d,${if (kept) "kept" else "emptied"}"
    }.mkString("\n")
    Files.write(Paths.get(tmp, "_graft_affected"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // the crash state: band 0's live dirs all deleted, parent gone
    fs.delete(new HPath(idx, "band=0"), true) shouldBe true
    fs.exists(new HPath(idx, "band=0")) shouldBe false
    AnnIndex.topKBanded(spark, idx, qs, k = 5).collect().toSet shouldBe
      AnnIndex.topKBanded(spark, control, qs, k = 5).collect().toSet
    fs.exists(new HPath(tmp)) shouldBe false
    // the parent was recreated and the kept band-0 buckets renamed in
    fs.exists(new HPath(idx, "band=0")) shouldBe true
    fs.exists(new HPath(idx, s"band=0/bucket=$smallest")) shouldBe false
    counts.tail.filter(_.getLong(1) >= 2).foreach { r =>
      fs.exists(new HPath(idx,
        s"band=0/bucket=${r.getString(0)}")) shouldBe true
    }
  }

  test("IVF delete crash mid-swap: cell= manifest redo heals to the clean-delete answers") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.writeIvf(emb, nClusters = 8, path = idx)
    val stored = spark.read.parquet(idx)
    val counts = stored.groupBy("cell").count()
      .orderBy(col("count").asc, col("cell").asc).collect()
    counts.length should be >= 2
    val emptiedCell = counts.head.getString(0)
    val keptCell = counts.last.getString(0)
    val victimIds = (stored.filter(col("cell") === emptiedCell)
        .select(col("vec_id")) union
      stored.filter(col("cell") === keptCell)
        .orderBy(col("vec_id")).limit(1).select(col("vec_id")))
      .collect().map(_.getLong(0)).toSeq
    val victims = emb.filter(col("vec_id").isin(victimIds: _*))
      .select(col("vec_id"), col("embedding"))
    // control: the SAME index, delete run cleanly (quantizer persists
    // in meta either way — a filtered rebuild would re-pick centroids)
    val control = s"$dir/control"
    AnnIndex.writeIvf(emb, nClusters = 8, path = control)
    AnnIndex.delete(spark, victims, control)
    // stage exactly as AnnIndex.delete stages, manifest last
    val affected = Seq(s"cell=$emptiedCell", s"cell=$keptCell")
    val tmp = s"${idx}_deleting"
    spark.read.option("basePath", idx)
      .parquet(affected.map(d => s"$idx/$d"): _*)
      .filter(!col("vec_id").isin(victimIds: _*))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val manifest = affected.map { d =>
      val kept = fs.exists(new HPath(tmp, d))
      s"$d,${if (kept) "kept" else "emptied"}"
    }.mkString("\n")
    Files.write(Paths.get(tmp, "_graft_affected"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // crash at the worst point: kept cell's live dir deleted, staged
    // replacement not yet renamed in
    fs.delete(new HPath(idx, s"cell=$keptCell"), true) shouldBe true
    AnnIndex.topKIvf(spark, idx, qs, k = 5, nProbe = 2)
      .collect().toSet shouldBe
      AnnIndex.topKIvf(spark, control, qs, k = 5, nProbe = 2)
        .collect().toSet
    fs.exists(new HPath(tmp)) shouldBe false
    fs.exists(new HPath(idx, s"cell=$emptiedCell")) shouldBe false
    fs.exists(new HPath(idx, s"cell=$keptCell")) shouldBe true
  }

  test("banded compact crash between renames rolls forward, band level intact") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.writeBanded(emb, bands = 3, planesPerBand = 3, path = idx)
    AnnIndex.append(emb, idx) // duplicate every (vec_id, band) copy
    val before = AnnIndex.topKBanded(spark, idx, qs, k = 5)
      .collect().toSet
    // stage exactly what compact stages: dedupe on the banded identity,
    // preserve the two-level partitioning, meta LAST
    spark.read.parquet(idx).dropDuplicates("vec_id", "band")
      .repartition(col("band"), col("bucket"))
      .write.mode("overwrite").partitionBy("band", "bucket")
      .parquet(s"${idx}_compacting")
    Files.copy(Paths.get(idx, "_graft_ann_meta"),
      Paths.get(s"${idx}_compacting", "_graft_ann_meta"))
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    AnnIndex.topKBanded(spark, idx, qs, k = 5).collect().toSet shouldBe
      before
    spark.read.parquet(idx).groupBy("vec_id", "band").count()
      .filter(col("count") > 1).count() shouldBe 0L
    AnnIndex.readMeta(idx).banded shouldBe true
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_compacting")) shouldBe false
  }

  test("IVF compact crash between renames rolls forward, cell level and quantizer intact") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.writeIvf(emb, nClusters = 8, path = idx)
    AnnIndex.append(emb, idx) // duplicate every row
    val before = AnnIndex.topKIvf(spark, idx, qs, k = 5, nProbe = 2)
      .collect().toSet
    spark.read.parquet(idx).dropDuplicates("vec_id")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${idx}_compacting")
    Files.copy(Paths.get(idx, "_graft_ann_meta"),
      Paths.get(s"${idx}_compacting", "_graft_ann_meta"))
    fs.rename(new HPath(idx), new HPath(s"${idx}_old")) shouldBe true
    AnnIndex.topKIvf(spark, idx, qs, k = 5, nProbe = 2)
      .collect().toSet shouldBe before
    spark.read.parquet(idx).groupBy("vec_id").count()
      .filter(col("count") > 1).count() shouldBe 0L
    AnnIndex.readMeta(idx).ivf shouldBe true
    fs.exists(new HPath(s"${idx}_old")) shouldBe false
    fs.exists(new HPath(s"${idx}_compacting")) shouldBe false
  }

  test("empty-probe fallback schema matches the normal path, vec_id type from meta") {
    val dir = Files.createTempDirectory("graft-annrec").toString
    val idx = s"$dir/idx"
    AnnIndex.write(emb, planes = 4, path = idx)
    AnnIndex.readMeta(idx).vecIdType shouldBe "bigint"
    val normal = AnnIndex.topK(spark, idx, qs, k = 5)
    // probe with a vector whose every bucket dir is missing: delete all
    // bucket dirs, keep the meta — the fallback must still produce the
    // normal schema (names AND types), not a hardcoded one
    val fsys = fs
    val st = fsys.listStatus(new HPath(idx))
      .filter(s => s.getPath.getName.startsWith("bucket="))
    st.foreach(s => fsys.delete(s.getPath, true))
    val empty = AnnIndex.topK(spark, idx, qs, k = 5)
    empty.count() shouldBe 0L
    empty.schema.map(f => (f.name, f.dataType)) shouldBe
      normal.schema.map(f => (f.name, f.dataType))
  }
}
