package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The prefix-filter set-similarity join is EXACT — its whole value over
  * MinHash banding is the lossless guarantee, so the spec is equality
  * with the brute-force all-pairs join on real corpus data, plus the
  * BM25 scorer's invariants (both are spec-gated complements to the
  * oracle-gated q48/q49 paths). */
class DedupJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prefixFilterJaccardJoin equals brute-force all-pairs exactly") {
    val docs = Tables.documents(spark, dir)
    val threshold = 0.4

    val fast = Dedup.prefixFilterJaccardJoin(docs, "text", "doc_id", 2, threshold)

    val sets = Dedup.ngramSets(docs, "text", "doc_id", 2)
    val brute = sets.select(col("jid").as("id_a"), col("toks").as("toks_a"))
      .crossJoin(sets.select(col("jid").as("id_b"), col("toks").as("toks_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        org.apache.spark.sql.functions.size(
          array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          org.apache.spark.sql.functions.size(
            array_union(col("toks_a"), col("toks_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

    val missed = brute.exceptAll(fast).count()
    val extra = fast.exceptAll(brute).count()
    withClue(s"prefix filter missed $missed / invented $extra pairs: ") {
      missed shouldBe 0
      extra shouldBe 0
    }
    // and the corpus actually exercises the path
    fast.count() should be > 0L
  }

  test("bm25: missing terms score zero, rarer terms outweigh common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common"),
      (3L, "other words entirely here")
    ).toDF("doc_id", "text")

    val scored = TextAnalysis.bm25(docs, "text", "doc_id", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    scored(3) shouldBe 0.0 // no query term present
    // doc 1 has the rare term; idf should dominate the extra tf of doc 2
    scored(1) should be > scored(2)
    scored(2) should be > 0.0
  }
}
