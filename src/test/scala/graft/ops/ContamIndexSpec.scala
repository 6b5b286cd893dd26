package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ContamIndexSpec extends SparkSpec {

  private val N = 3
  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private val bench = docs.filter(col("doc_id") % 50 === 0)
  private val train = docs.filter(col("doc_id") % 50 =!= 0)

  private def fromScratch(b: org.apache.spark.sql.DataFrame) =
    Dedup.decontaminate(train, b, "text", "doc_id", N)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("write+absorb screen equals Dedup.decontaminate on the union") {
    val path = Files.createTempDirectory("graft-contam").toString
    ContamIndex.write(bench.filter(col("doc_id") % 100 === 0),
      "text", "doc_id", N, s"$path/idx", "cidx_eq")
    try {
      ContamIndex.absorb(bench.filter(col("doc_id") % 100 =!= 0),
        "text", "doc_id", N, s"$path/idx", "cidx_eq")
      val screened = ContamIndex
        .screen(spark, "cidx_eq", train, "text", "doc_id", N)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      screened shouldBe fromScratch(bench)
      screened should not be empty // seeded near-dups guarantee overlap
    } finally spark.sql("DROP TABLE IF EXISTS cidx_eq")
  }

  test("forget: a withdrawn suite's unique grams stop flagging; shared grams survive") {
    val path = Files.createTempDirectory("graft-contam").toString
    ContamIndex.write(bench, "text", "doc_id", N, s"$path/idx",
      "cidx_rtbf")
    try {
      ContamIndex.forget(spark, "cidx_rtbf",
        bench.filter(col("doc_id") % 100 === 0).select(col("doc_id")))
      val screened = ContamIndex
        .screen(spark, "cidx_rtbf", train, "text", "doc_id", N)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      screened shouldBe fromScratch(
        bench.filter(col("doc_id") % 100 =!= 0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cidx_rtbf")
      spark.sql("DROP TABLE IF EXISTS cidx_rtbf_del")
    }
  }

  test("redelivered absorb is invisible to the screen") {
    val path = Files.createTempDirectory("graft-contam").toString
    val half = bench.filter(col("doc_id") % 100 =!= 0)
    ContamIndex.write(bench.filter(col("doc_id") % 100 === 0),
      "text", "doc_id", N, s"$path/idx", "cidx_replay")
    try {
      ContamIndex.absorb(half, "text", "doc_id", N, s"$path/idx",
        "cidx_replay")
      ContamIndex.absorb(half, "text", "doc_id", N, s"$path/idx",
        "cidx_replay") // the at-least-once crash replay
      val screened = ContamIndex
        .screen(spark, "cidx_replay", train, "text", "doc_id", N)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      screened shouldBe fromScratch(bench)
    } finally spark.sql("DROP TABLE IF EXISTS cidx_replay")
  }

  test("screen with a drifted n fails loudly against the stamp") {
    val path = Files.createTempDirectory("graft-contam").toString
    ContamIndex.write(bench, "text", "doc_id", N, s"$path/idx",
      "cidx_drift")
    try {
      val e = intercept[IllegalArgumentException] {
        ContamIndex.screen(spark, "cidx_drift", train, "text",
          "doc_id", N + 1)
      }
      e.getMessage should include("n=3")
    } finally spark.sql("DROP TABLE IF EXISTS cidx_drift")
  }

  test("screen plan broadcasts the eval grams — no gram-keyed exchange on the train side") {
    val path = Files.createTempDirectory("graft-contam").toString
    ContamIndex.write(bench, "text", "doc_id", N, s"$path/idx",
      "cidx_plan")
    try {
      val plan = ContamIndex
        .screen(spark, "cidx_plan", train, "text", "doc_id", N)
        .queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
    } finally spark.sql("DROP TABLE IF EXISTS cidx_plan")
  }
}
