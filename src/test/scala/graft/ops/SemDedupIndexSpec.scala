package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SemDedupIndexSpec extends SparkSpec {

  private val K = 8
  private val Tau = 0.35
  private val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  // later arrivals carry later ids, so the day-0 quantizer IS the
  // full corpus's lowest-id quantizer (the q283 split)
  private val day1 = emb.filter(col("vec_id") % 10 === 7 &&
    col("vec_id") >= K)
  private val day0 = emb.filter(!(col("vec_id") % 10 === 7 &&
    col("vec_id") >= K))

  private def keepMap(df: DataFrame): Map[Long, (Long, Boolean)] =
    df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  private def build(out: String, table: String,
      corpus: DataFrame): Unit =
    SemDedupIndex.write(corpus, K, Tau, s"$out/cent", s"$out/idx",
      table, s"$out/cc", s"$out/edges")

  test("write+absorb keep set equals from-scratch semDedupKeep on the union") {
    val out = Files.createTempDirectory("graft-semdedup").toString
    build(out, "sdidx_eq", day0)
    try {
      SemDedupIndex.absorb(day1, K, Tau, s"$out/cent", s"$out/idx",
        "sdidx_eq", s"$out/cc", s"$out/edges")
      val maintained = keepMap(SemDedupIndex.keep(spark, s"$out/cc"))
      val fromScratch = keepMap(Similarity.semDedupKeep(emb, K, Tau))
      maintained shouldBe fromScratch
      maintained should not be empty // seeded near-dup embeddings
    } finally spark.sql("DROP TABLE IF EXISTS sdidx_eq")
  }

  test("replayed absorb is invisible: CC collapses re-derived pairs") {
    val out = Files.createTempDirectory("graft-semdedup").toString
    build(out, "sdidx_replay", day0)
    try {
      SemDedupIndex.absorb(day1, K, Tau, s"$out/cent", s"$out/idx",
        "sdidx_replay", s"$out/cc", s"$out/edges")
      val before = keepMap(SemDedupIndex.keep(spark, s"$out/cc"))
      SemDedupIndex.absorb(day1, K, Tau, s"$out/cent", s"$out/idx",
        "sdidx_replay", s"$out/cc", s"$out/edges")
      keepMap(SemDedupIndex.keep(spark, s"$out/cc")) shouldBe before
    } finally spark.sql("DROP TABLE IF EXISTS sdidx_replay")
  }

  test("forget re-solves exactly the affected components; orphans stay as kept singletons") {
    val out = Files.createTempDirectory("graft-semdedup").toString
    build(out, "sdidx_rtbf", emb)
    try {
      val victims = emb.filter(col("vec_id") % 10 === 3 &&
        col("vec_id") >= K).select(col("vec_id"))
      SemDedupIndex.forget(spark, victims, "sdidx_rtbf",
        s"$out/cc", s"$out/edges")
      val maintained = keepMap(SemDedupIndex.keep(spark, s"$out/cc"))
      // independent reference: the original pair graph's surviving
      // closure with every originally-clustered survivor seeded
      // (deleteNodes' documented semantics)
      val pairs = Similarity.semDedupPairs(emb, K, Tau)
        .select(col("id_a"), col("id_b"))
      val vic = victims.collect().map(_.getLong(0)).toSet
      val surviving = pairs.filter(
        !col("id_a").isin(vic.toSeq: _*) &&
          !col("id_b").isin(vic.toSeq: _*))
      val seeded = pairs.select(col("id_a").as("node"))
        .unionByName(pairs.select(col("id_b").as("node"))).distinct()
        .filter(!col("node").isin(vic.toSeq: _*))
      val expected = keepMap(
        seeded.join(Dedup.connectedComponents(surviving), Seq("node"),
            "left")
          .select(col("node").as("vec_id"),
            coalesce(col("cluster"), col("node")).as("cluster_rep"),
            (col("node") === coalesce(col("cluster"), col("node")))
              .as("kept")))
      maintained shouldBe expected
      vic.exists(maintained.contains) shouldBe false
    } finally spark.sql("DROP TABLE IF EXISTS sdidx_rtbf")
  }

  test("requantize restamps the geometry: later absorbs must ride the refined codebook's k") {
    val out = Files.createTempDirectory("graft-semdedup").toString
    build(out, "sdidx_rq", day0)
    try {
      val refined = Similarity.kmeans(day0, "embedding", "vec_id", 4, 2)
        .select(col("cluster"), col("pos"),
          (col("sum_scaled").cast("double") / col("cnt") /
            lit(1000000d)).as("cv"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
          .as("a"))
        .select(col("cluster"),
          transform(col("a"), x => x.getField("cv")).as("c"))
      SemDedupIndex.requantize(day0, refined, Tau, s"$out/cent2",
        s"$out/idx2", "sdidx_rq", s"$out/cc", s"$out/edges")
      // the old sample-quantizer k must now fail loudly...
      val e = intercept[IllegalArgumentException] {
        SemDedupIndex.absorb(day1, K, Tau, s"$out/cent2", s"$out/idx2",
          "sdidx_rq", s"$out/cc", s"$out/edges")
      }
      e.getMessage should include("nClusters=4")
      // ...and the refined k absorbs cleanly against the new codebook
      SemDedupIndex.absorb(day1, 4, Tau, s"$out/cent2", s"$out/idx2",
        "sdidx_rq", s"$out/cc", s"$out/edges")
      keepMap(SemDedupIndex.keep(spark, s"$out/cc")) should not be empty
    } finally spark.sql("DROP TABLE IF EXISTS sdidx_rq")
  }

  test("absorb with a drifted tau fails loudly against the stamp") {
    val out = Files.createTempDirectory("graft-semdedup").toString
    build(out, "sdidx_drift", day0)
    try {
      val e = intercept[IllegalArgumentException] {
        SemDedupIndex.absorb(day1, K, Tau + 0.1, s"$out/cent",
          s"$out/idx", "sdidx_drift", s"$out/cc", s"$out/edges")
      }
      e.getMessage should include("tau=0.35")
    } finally spark.sql("DROP TABLE IF EXISTS sdidx_drift")
  }
}
