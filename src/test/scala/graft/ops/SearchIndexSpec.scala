package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintained BM25 pair must answer bit-identically to the
  * from-scratch [[TextAnalysis.bm25]] restricted to docs holding ≥ 1
  * query term — after absorbs, after redelivered absorbs, and after
  * deletions. */
class SearchIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.core.Tables.documents(spark, dir)
  private val terms = Seq("join", "spark", "window")

  /** From-scratch reference: q49's scorer over `corpus`, hit docs
    * only, same (rounded score desc, id) presentation. */
  private def reference(corpus: DataFrame, k: Int): Seq[(Long, Long, Double)] = {
    val hitDocs = corpus.select(col("doc_id"),
        TextAnalysis.words(col("text")).as("__ws"))
      .filter(terms.map(t => array_contains(col("__ws"), t))
        .reduce(_ || _))
      .select(col("doc_id"))
    TextAnalysis.bm25(corpus, "text", "doc_id", terms)
      .join(hitDocs, "doc_id")
      .select(col("doc_id"), col("dl"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  private def topK(table: String, statsPath: String, k: Int) =
    SearchIndex.bm25TopK(spark, table, statsPath, terms, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("maintained bm25 equals from-scratch after write+absorb, survives replay and deletion") {
    val out = Files.createTempDirectory("graft-searchidx").toString
    val table = s"graft_bm25_spec_${System.nanoTime()}"
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    SearchIndex.write(base, "text", "doc_id", s"$out/stats",
      s"$out/idx", table, buckets = 8)
    SearchIndex.absorb(delta, "text", "doc_id", s"$out/stats",
      s"$out/idx", table, buckets = 8)
    val expected = reference(docs, 20)
    expected.size should be > 0
    topK(table, s"$out/stats", 20) shouldBe expected
    // at-least-once redelivery: the same batch absorbed AGAIN changes
    // nothing the reads see (tf collapses via max, df via
    // countDistinct) — except the stats store, which is at-most-once
    // by contract, so the replay arm re-absorbs ONLY the postings
    DedupIndex.absorbKeys(
      SearchIndex.postings(delta, "text", "doc_id"), s"$out/idx",
      table, buckets = 8)
    topK(table, s"$out/stats", 20) shouldBe expected
    // compact purges the duplicates physically; answers unchanged
    DedupIndex.compact(spark, table, buckets = 8)
    topK(table, s"$out/stats", 20) shouldBe expected
    // right-to-be-forgotten: drop every doc_id % 7 == 3; the top-k
    // must equal the from-scratch reference over the SURVIVORS the
    // moment deleteDocs returns (tombstones live, not yet compacted)
    val victims = docs.filter(col("doc_id") % 7 === 3)
    SearchIndex.deleteDocs(victims, "text", "doc_id", s"$out/stats", table)
    val survivors = docs.filter(col("doc_id") % 7 =!= 3)
    topK(table, s"$out/stats", 20) shouldBe reference(survivors, 20)
    // and still after the physical purge
    DedupIndex.compact(spark, table, buckets = 8)
    topK(table, s"$out/stats", 20) shouldBe reference(survivors, 20)
  }

  test("maintainStream: micro-batches + a crash replay converge to the full corpus") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = Files.createTempDirectory("graft-searchidx-stream").toString
    val table = s"graft_bm25_stream_${System.nanoTime()}"
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    SearchIndex.write(base, "text", "doc_id", s"$out/stats",
      s"$out/idx", table, buckets = 8)
    val rows = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    implicit val enc: Encoder[(Long, String)] =
      Encoders.product[(Long, String)]
    val stream = MemoryStream[(Long, String)](enc, spark)
    val q = SearchIndex.maintainStream(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$out/stats", s"$out/idx", table, s"$out/ckpt", buckets = 8)
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      stream.addData(h1.toSeq)
      q.processAllAvailable()
      stream.addData(h2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // stats rode the layered path: epochs collapse on read
    val expected = reference(docs, 20)
    topK(table, s"$out/stats", 20) shouldBe expected
    // full-triple compact: postings rewrite + the stats/df epoch
    // layers forced to fold (two epochs resident over maxLayers = 1);
    // answers invariant, both layered stores consolidated
    SearchIndex.compact(spark, table, s"$out/stats", buckets = 8,
      maxLayers = 1L)
    AggState.layerCount(spark, s"$out/stats") shouldBe 1L
    AggState.layerCount(spark,
      SearchIndex.dfPathOf(s"$out/stats")) shouldBe 1L
    topK(table, s"$out/stats", 20) shouldBe expected
  }

  test("maxDf drops over-cap terms before the posting read; under-cap terms unchanged") {
    val out = Files.createTempDirectory("graft-searchidx-cap").toString
    val table = s"graft_bm25_cap_${System.nanoTime()}"
    SearchIndex.write(docs, "text", "doc_id", s"$out/stats",
      s"$out/idx", table, buckets = 8)
    val dfs = SearchIndex.termDf(spark, s"$out/stats", terms)
    dfs.values.foreach(_ should be > 0L)
    // 1. the finite DEFAULT changes nothing for terms under the cap:
    //    default vs explicitly-uncapped are row-identical
    val uncapped = SearchIndex.bm25TopK(spark, table, s"$out/stats",
        terms, 20, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    topK(table, s"$out/stats", 20) shouldBe uncapped
    // 2. a capped term contributes exactly nothing: querying
    //    {overCap term} ∪ {kept terms} under a cap sized between them
    //    equals querying the kept terms alone — the over-cap term's
    //    posting bucket is never read, so it cannot perturb any score
    val overCap = terms.maxBy(dfs)
    val kept = terms.filterNot(_ == overCap)
    val cap = kept.map(dfs).max // kept terms survive, the top is out
    dfs(overCap) should be > cap // the fixture's top df is unique
    val capped = SearchIndex.bm25TopK(spark, table, s"$out/stats",
        overCap +: kept, 20, maxDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keptOnly = SearchIndex.bm25TopK(spark, table, s"$out/stats",
        kept, 20, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    capped shouldBe keptOnly
    // 3. every term over the cap: an empty top-k, never a full read
    SearchIndex.bm25TopK(spark, table, s"$out/stats", terms, 20,
      maxDf = dfs.values.min - 1).count() shouldBe 0L
    // 4. the df store tracks deletions: forget half the corpus and the
    //    live dfs shrink to the survivors' exact counts
    SearchIndex.deleteDocs(docs.filter(col("doc_id") % 2 === 0),
      "text", "doc_id", s"$out/stats", table)
    val survivorDf = SearchIndex.termDf(spark, s"$out/stats", terms)
    val expected = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach(t => survivorDf(t) shouldBe expected.getOrElse(t, 0L))
  }
}
