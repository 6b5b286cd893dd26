package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = the shuffle you pay ONCE at write time instead of on
  * every join. Both sides written `bucketBy(N, key)` + `sortBy(key)`
  * hash-partition identically on disk, so a sort-merge join between
  * them needs NO exchange and NO sort at read time — at 100 TB this is
  * the difference between re-shuffling the corpus per query and a
  * straight merge of co-located files. This spec proves the plan shape,
  * not just the answer: the bucketed join's physical plan must contain
  * zero shuffle exchanges while the plain-parquet control join (same
  * data, same session) contains them.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed+sorted tables sort-merge join with zero exchanges") {
    // external tables at explicit paths — the static warehouse dir is
    // never touched
    val wh = Files.createTempDirectory("graft_bucketed_wh").toString
    // force SMJ: broadcast would sidestep the exchange question entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = (1L to 1000L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
      val scores = (1L to 1000L).map(i => (i, i * 0.5)).toDF("doc_id", "score")
      docs.write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$wh/docs_b").saveAsTable("docs_b")
      scores.write.mode("overwrite")
        .bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", s"$wh/scores_b").saveAsTable("scores_b")

      val bucketed = spark.table("docs_b").join(spark.table("scores_b"), "doc_id")
      bucketed.count() shouldBe 1000L
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      bucketedPlan should not include "Exchange hashpartitioning"

      // control: identical data as plain parquet MUST shuffle both sides
      docs.write.mode("overwrite").parquet(s"$wh/docs_p")
      scores.write.mode("overwrite").parquet(s"$wh/scores_p")
      val plain = spark.read.parquet(s"$wh/docs_p")
        .join(spark.read.parquet(s"$wh/scores_p"), "doc_id")
      plain.count() shouldBe 1000L
      plain.queryExecution.executedPlan.toString should
        include("Exchange hashpartitioning")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS scores_b")
    }
  }
}
