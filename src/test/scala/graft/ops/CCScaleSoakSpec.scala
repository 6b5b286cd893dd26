package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.tagobjects.Slow

import graft.SparkSpec

/** Scale soak for the DISTRIBUTED connected-components path (VERDICT r5
  * item 6): the small random-graph specs gate correctness of the
  * large-star/small-star contraction, but never its convergence
  * behavior at realistic edge counts. This spec runs `maxDriverEdges =
  * 0` (contraction only — the driver union-find fast path would
  * swallow anything this size) over a ~5M-edge graph built to stress
  * both failure axes at once:
  *
  *  - a 4096-node CHAIN — the worst-diameter shape; alternating
  *    large-star/small-star must collapse it in O(log diameter)
  *    rounds, enforced here by `maxIter = 14` (log2(4096) = 12 + 2
  *    slack): convergence inside the bound IS the assertion, because
  *    `connectedComponents` throws rather than return silently-wrong
  *    labels when rounds run out;
  *  - 200 HUBS of 25,000 members each (5,000,000 edges) — the hot-key
  *    shape (every edge of a hub lands on one window key), proving the
  *    per-round window-min survives heavy key skew.
  *
  * Labels are verified distributively against the by-construction
  * component minima (exactly what the union-find reference computes —
  * every component's label is its min id) — no 5M-row collect to the
  * driver, the same discipline the operator itself follows.
  */
class CCScaleSoakSpec extends SparkSpec {

  test("distributed CC converges within the log-diameter bound on a " +
      "5M-edge chain+hubs graph and labels every component by its min",
      Slow) {
    val spark0 = spark
    // chain: 0-1-2-…-4095 (component min = 0)
    val chain = spark0.range(0L, 4095L)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // hubs: hub h roots at 1_000_000 + h·30_000 with 25_000 members
    val hubs = spark0.range(0L, 5000000L)
      .select(
        (lit(1000000L) + (col("id") / 25000L).cast("long") * 30000L).as("id_a"),
        (lit(1000000L) + (col("id") / 25000L).cast("long") * 30000L
          + (col("id") % 25000L) + 1L).as("id_b"))
    val edges = chain.unionByName(hubs)

    val labels = Dedup.connectedComponents(edges,
      maxIter = 14, maxDriverEdges = 0L)

    // expected label, by construction: chain nodes -> 0, hub nodes ->
    // their hub root (the component min — the union-find invariant)
    val expected = when(col("node") < 1000000L, lit(0L))
      .otherwise(lit(1000000L)
        + ((col("node") - 1000000L) / 30000L).cast("long") * 30000L)
    val stats = labels
      .select(
        count(lit(1)).as("n"),
        sum(when(col("cluster") =!= expected, 1L).otherwise(0L)).as("wrong"))
      .collect()(0)
    stats.getAs[Long]("n") shouldBe (4096L + 200L * 25001L)
    stats.getAs[Long]("wrong") shouldBe 0L
  }
}
