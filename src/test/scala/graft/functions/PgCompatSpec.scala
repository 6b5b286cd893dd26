package graft.functions

import graft.SparkSpec

/** Postgres-compat SQL functions resolve and behave like the reference
  * dialect. */
class PgCompatSpec extends SparkSpec {
  import spark.implicits._

  test("json_build_object builds nested structs; json_agg keeps nulls, NULL for empty") {
    Seq(("a", Some(1)), ("a", None), ("b", Some(3)))
      .toDF("k", "v").createOrReplaceTempView("pg_t")
    val rows = spark.sql(
      """SELECT k, json_agg(v) AS vs FROM pg_t GROUP BY k ORDER BY k""")
      .collect()
    rows(0).getSeq[Any](1) shouldBe Seq(1, null) // null element preserved
    rows(1).getSeq[Any](1) shouldBe Seq(3)
    // empty group -> NULL, not []
    spark.sql("SELECT json_agg(v) FROM pg_t WHERE k = 'zzz'")
      .first().isNullAt(0) shouldBe true
    // nested struct construction
    val doc = spark.sql(
      """SELECT to_json(json_build_object('a', 1, 'b',
        |  json_build_object('c', 'x'))) AS j""".stripMargin).first().getString(0)
    doc shouldBe """{"a":1,"b":{"c":"x"}}"""
  }

  test("jsonb_each_text explodes a JSON map to (key, value) rows") {
    Seq((1L, """{"x": "1", "y": "2"}"""), (2L, """{"z": "9"}"""))
      .toDF("id", "props").createOrReplaceTempView("pg_j")
    val rows = spark.sql(
      """SELECT id, kv.key, kv.value
        |FROM pg_j LATERAL VIEW jsonb_each_text(props) kv AS key, value
        |ORDER BY id, key""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    rows shouldBe Seq((1L, "x", "1"), (1L, "y", "2"), (2L, "z", "9"))
  }
}
