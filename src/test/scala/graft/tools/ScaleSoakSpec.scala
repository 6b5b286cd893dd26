package graft.tools

import graft.SparkSpec
import graft.core.Tables

/** Guards the scale-soak corpus synthesis (SCALE_evidence.md rests on
  * it): the salted union must (a) actually multiply row counts, (b)
  * keep ids disjoint across copies, (c) make copies textually
  * DISSIMILAR (the whole point — naive copies would fake quadratic
  * near-dup growth), and (d) be deterministic, so re-running the soak
  * measures the same corpus. */
class ScaleSoakSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  test("synthesize: 2x corpus has 2x rows, disjoint ids, salted text") {
    val out = java.nio.file.Files.createTempDirectory("soak-syn").toString
    graft.ScaleSoak.synthesize(spark, base, 2, out)

    val d0 = Tables.documents(spark, base)
    val d2 = Tables.documents(spark, out)
    d2.count() shouldBe 2 * d0.count()
    d2.select("doc_id").distinct().count() shouldBe d2.count()

    val e2 = Tables.events(spark, out)
    e2.count() shouldBe 2 * Tables.events(spark, base).count()
    e2.select("event_id").distinct().count() shouldBe e2.count()

    val m2 = Tables.embeddings(spark, out)
    m2.count() shouldBe 2 * Tables.embeddings(spark, base).count()
    m2.select("vec_id").distinct().count() shouldBe m2.count()

    // salting: the copy's tokens are all prefixed, so copy-0 and
    // copy-1 token vocabularies are DISJOINT — zero shared shingles,
    // hence zero cross-copy near-dup pairs by construction
    import org.apache.spark.sql.functions._
    val tok0 = d2.filter(col("doc_id") < 10000000L)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val tok1 = d2.filter(col("doc_id") >= 10000000L)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    tok0.join(tok1, "w").count() shouldBe 0L

    // n_chars stays consistent with the salted text
    d2.filter(org.apache.spark.sql.functions.length(col("text")) =!=
      col("n_chars")).count() shouldBe 0L
  }

  test("synthesize is deterministic: two runs produce identical corpora") {
    import org.apache.spark.sql.functions._
    val outA = java.nio.file.Files.createTempDirectory("soak-a").toString
    val outB = java.nio.file.Files.createTempDirectory("soak-b").toString
    graft.ScaleSoak.synthesize(spark, base, 2, outA)
    graft.ScaleSoak.synthesize(spark, base, 2, outB)
    def digest(dir: String): String =
      Tables.documents(spark, dir)
        .select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
        .agg(sum(conv(substring(col("h"), 1, 12), 16, 10).cast("long")).as("s"))
        .collect()(0).getLong(0).toString
    digest(outA) shouldBe digest(outB)
  }
}
