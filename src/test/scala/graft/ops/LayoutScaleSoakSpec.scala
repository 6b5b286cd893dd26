package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale soak for the two-pass Layout primitives (globalCumsum /
  * globalRank): 5M rows across 64 partitions — three orders of
  * magnitude past the gate corpus — verified against closed-form
  * expectations so nothing corpus-sized is ever collected. What this
  * pins at soak scale:
  *
  *  - the per-partition offset hand-off is exact across many
  *    partitions (an off-by-one in ONE boundary shifts every later
  *    cumsum/rank and the closed forms catch it);
  *  - driver state stays one long per partition regardless of n;
  *  - the persisted-sort discipline keeps the totals pass and the data
  *    pass on one materialization.
  */
class LayoutScaleSoakSpec extends SparkSpec {
  import spark.implicits._

  test("globalCumsum is exact over 5M skewed rows across 64 partitions") {
    val n = 5000000L
    val df = spark.range(n)
      .select(col("id"), (col("id") % 1000).as("v"))
      .repartition(64)
    val cum = Layout.globalCumsum(df, "v", col("id").asc)
    // Σ_{i=0..k} (i % 1000), closed form: full 0..999 blocks + remainder
    def expect(k: Long): Long = {
      val m = k + 1
      val full = m / 1000
      val rem = m % 1000
      full * (999L * 1000 / 2) + rem * (rem - 1) / 2
    }
    val probes = Seq(0L, 999L, 1000L, 123456L, 2500000L, n - 1)
    val got = cum.filter(col("id").isin(probes: _*))
      .select("id", "cumsum").as[(Long, Long)].collect().toMap
    probes.foreach { k => withClue(s"id=$k: ") { got(k) shouldBe expect(k) } }
    cum.agg(max("cumsum")).as[Long].head() shouldBe expect(n - 1)
  }

  test("globalRank is exact over 5M rows across 64 partitions") {
    val n = 5000000L
    val df = spark.range(n).select(col("id")).repartition(64)
    val ranked = Layout.globalRank(df, col("id").asc)
    val probes = Seq(0L, 63L, 999999L, n - 1)
    val got = ranked.filter(col("id").isin(probes: _*))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    probes.foreach { k => withClue(s"id=$k: ") { got(k) shouldBe k + 1 } }
    ranked.agg(max("rank")).as[Long].head() shouldBe n
  }
}
