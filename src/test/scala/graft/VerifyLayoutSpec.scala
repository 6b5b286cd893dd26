package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verify's on-disk contract with the driver: a good query writes
  * `<out>/<name>/` parquet; a BROKEN query must leave `<name>._error`
  * and an errors.json entry — not just a stderr line. Round 7's events
  * breakage produced 28 silent omissions precisely because the failure
  * path wrote nothing; this spec pins the loud layout. */
class VerifyLayoutSpec extends SparkSpec {

  test("run() writes parquet for good queries, _error + errors.json for broken ones") {
    val out = Files.createTempDirectory("verify_layout").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good_q" -> ((s, _) => s.range(3).select(col("id"))),
      "bad_q" -> ((s, _) =>
        s.range(1).select(expr("assert_true(id > 5, 'boom')").as("x"))))
    val oracle = Map("good_q" -> "SELECT 1 AS id")

    val errs = Verify.run(spark, "/unused", out, queries, oracle)

    errs.keySet shouldBe Set("bad_q")
    // good query: parquet directory present, no error marker
    Files.exists(Paths.get(s"$out/good_q")) shouldBe true
    Files.exists(Paths.get(s"$out/good_q._error")) shouldBe false
    // broken query: marker file carries the exception message
    Files.exists(Paths.get(s"$out/bad_q._error")) shouldBe true
    Files.readString(Paths.get(s"$out/bad_q._error")) should include("boom")
    // summary json names the broken query and parses as a flat object
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    errJson should include("\"bad_q\"")
    errJson should not include "good_q"
    // oracle_sql.json still written alongside
    Files.readString(Paths.get(s"$out/oracle_sql.json")) should
      include("\"good_q\"")
  }

  test("errors.json is an empty object when everything runs") {
    val out = Files.createTempDirectory("verify_clean").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => s.range(1).toDF("id")))
    Verify.run(spark, "/unused", out, queries, Map.empty) shouldBe empty
    Files.readString(Paths.get(s"$out/errors.json")).trim shouldBe "{}"
  }
}
