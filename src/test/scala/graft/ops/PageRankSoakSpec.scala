package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.tagobjects.Slow

import graft.SparkSpec

/** Iteration soak for [[Graphs.pageRank]] (VERDICT r7 item 4): the
  * operator allows up to 50 iterations, but without per-iteration
  * lineage truncation each round deepens the self-referential plan by
  * two joins — the exact plan-depth/statistics blowup
  * [[Dedup.connectedComponents]] already defends against. This spec
  * proves the checkpointed loop (a) completes all 50 allowed
  * iterations on a non-trivial graph without driver blowup and (b) is
  * BIT-IDENTICAL to the uncheckpointed recursion — checkpointing is a
  * physical-plan concern and must never touch the scaled-integer
  * arithmetic that makes the operator deterministic.
  */
class PageRankSoakSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank completes the full 50 allowed iterations with " +
      "checkpointing and stays bit-identical to the plain recursion", Slow) {
    // 2000-node ring + 20 hubs of 100 members: converged mass spread
    // across both a high-diameter and a high-skew shape
    val ring = spark.range(0L, 2000L)
      .select(col("id").as("id_a"), ((col("id") + 1L) % 2000L).as("id_b"))
    val hubs = spark.range(0L, 2000L)
      .select((lit(10000L) + (col("id") / 100L).cast("long") * 200L).as("id_a"),
        (lit(10000L) + (col("id") / 100L).cast("long") * 200L
          + (col("id") % 100L) + 1L).as("id_b"))
    val pairs = ring.unionByName(hubs)

    // 50 iterations, checkpoint every 5 — completes without plan-depth
    // blowup (this call IS the soak: pre-fix it deepens to a 100-join plan)
    val soak = Graphs.pageRank(pairs, iters = 50)
      .as[(Long, Double)].collect().toMap
    soak.size shouldBe 4020 // 2000 ring + 20×(1 root + 100 members)
    // ranks are display-rounded to 1e-6 each, so the mass check allows
    // 4020 × 5e-7 ≈ 0.002 of pure rounding drift on top of exactness
    math.abs(soak.values.sum - 1.0) should be < 3e-3

    // bit-identical: 12 iterations with and without an interior
    // checkpoint (checkpointEvery=100 never fires inside 12 iters)
    val checked = Graphs.pageRank(pairs, iters = 12, checkpointEvery = 5)
      .as[(Long, Double)].collect().toSet
    val plain = Graphs.pageRank(pairs, iters = 12, checkpointEvery = 100)
      .as[(Long, Double)].collect().toSet
    checked shouldBe plain
  }
}
