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
    topK(table, s"$out/stats", 20) shouldBe reference(docs, 20)
  }
}
