package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** [[DatasheetIndex]] on a hand-crafted corpus where every duplicate
  * transition is enumerable: the maintained report must equal the
  * hand-computed q147 semantics across write/absorb/replay/forget,
  * including the resident unique→dup flips an arriving copy forces
  * and the dup→unique flip-backs a withdrawal forces. */
class DatasheetIndexSpec extends SparkSpec {

  import spark.implicits._

  //  1,2 s1/en "aa bb"   — write-time dup pair
  //  3   s1/de "cc"      — unique until doc 5 arrives (resident flip)
  //  4   s2/en "dd ee ff"— unique until doc 8 arrives (resident flip)
  //  9   s2/en "hh ii"   — stays unique throughout
  private def day0: DataFrame = Seq(
    (1L, "s1", "en", "aa bb"), (2L, "s1", "en", "aa bb"),
    (3L, "s1", "de", "cc"), (4L, "s2", "en", "dd ee ff"),
    (9L, "s2", "en", "hh ii"))
    .toDF("doc_id", "source", "lang", "text")
  //  5 s2/en "cc"        — arrives as dup AND flips resident 3
  //  6,7 s2/fr "gg"      — within-batch dup pair
  private def e0: DataFrame = Seq(
    (5L, "s2", "en", "cc"), (6L, "s2", "fr", "gg"),
    (7L, "s2", "fr", "gg")).toDF("doc_id", "source", "lang", "text")
  //  8 s1/en "dd ee ff"  — arrives as dup AND flips resident 4
  private def e1: DataFrame = Seq(
    (8L, "s1", "en", "dd ee ff")).toDF("doc_id", "source", "lang", "text")

  private def report(out: String): Map[String, (Long, Long, Double, Long, Long, Double)] =
    DatasheetIndex.datasheet(spark, out).collect().map { r =>
      r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_tokens"),
        r.getAs[Long]("n_langs"), r.getAs[Long]("n_dup_docs"),
        r.getAs[Double]("dup_frac")))
    }.toMap

  // full corpus (docs 1-9): s1 = {1,2,3,8} all dup; s2 = {4,5,6,7,9},
  // 9 unique
  private val fullExpected = Map(
    "s1" -> ((4L, 8L, 2.0, 2L, 4L, 1.0)),
    "s2" -> ((5L, 8L, 1.6, 2L, 4L, 0.8)))

  private def build(tag: String, replayE0: Boolean): String = {
    val out = Files.createTempDirectory(s"graft-dsheet-$tag").toString
    DatasheetIndex.write(day0, "text", "doc_id", out, s"dsidx_$tag")
    DatasheetIndex.absorb(e0, "text", "doc_id", out, s"dsidx_$tag", 0L)
    if (replayE0)
      DatasheetIndex.absorb(e0, "text", "doc_id", out, s"dsidx_$tag", 0L)
    DatasheetIndex.absorb(e1, "text", "doc_id", out, s"dsidx_$tag", 1L)
    out
  }

  test("absorb tracks arrivals, within-batch pairs, and resident flips exactly") {
    try report(build("abs", replayE0 = false)) shouldBe fullExpected
    finally spark.sql("DROP TABLE IF EXISTS dsidx_abs")
  }

  test("a replayed epoch is invisible: same batch, same epoch, same report") {
    try report(build("rpl", replayE0 = true)) shouldBe fullExpected
    finally spark.sql("DROP TABLE IF EXISTS dsidx_rpl")
  }

  test("forget retracts masses and flips lone survivors back to unique") {
    val out = build("rtbf", replayE0 = false)
    try {
      // withdraw 2 (1 flips back), 5 (3 flips back), 6 (7 flips back)
      DatasheetIndex.forget(
        Seq((2L, "s1", "en", "aa bb"), (5L, "s2", "en", "cc"),
          (6L, "s2", "fr", "gg")).toDF("doc_id", "source", "lang", "text"),
        "text", "doc_id", out, "dsidx_rtbf")
      // survivors: s1 {1,3,8} with only 8 dup (pairs with 4);
      // s2 {4,7,9} with only 4 dup
      report(out) shouldBe Map(
        "s1" -> ((3L, 6L, 2.0, 2L, 1L, 0.333333)),
        "s2" -> ((3L, 6L, 2.0, 2L, 1L, 0.333333)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS dsidx_rtbf")
      spark.sql("DROP TABLE IF EXISTS dsidx_rtbf_del")
    }
  }
}
