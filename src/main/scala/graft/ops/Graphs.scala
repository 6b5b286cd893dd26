package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph metrics over edge lists — the analyses a dedup pipeline runs
  * on its own near-dup graph (how cliquish are the candidate clusters?
  * is LSH banding producing transitive families or loose chains?).
  *
  * Edge lists arrive as (id_a, id_b) pair frames — the exact shape
  * [[Dedup.candidatePairs]] / [[Dedup.jaccardVerify]] emit — and are
  * canonicalized (undirected, deduped, self-loops dropped) before any
  * metric.
  */
object Graphs {

  /** Canonical undirected edge set: u < v, distinct, no self-loops. */
  def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs.select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Every triangle of the undirected graph, one row per triangle,
    * oriented `a < b < c` so each is emitted exactly once. Two keyed
    * equi-joins over the ordered edge list: `(a,b) ⋈ (b,c)` builds the
    * open wedges, `(a,c)` membership closes them — never an all-pairs
    * product.
    *
    * Scale shape: wedge count is Σ_v C(deg⁺(v), 2) over ORDERED
    * degrees, the standard bound that keeps node-ordered triangle
    * enumeration tractable (ordering by id caps every node's effective
    * out-degree at its ordered neighbors). The near-dup graphs this
    * engine emits are additionally degree-capped upstream
    * ([[Dedup.candidatePairs]]'s `maxBucket` kills the B² bucket storms
    * before they become high-degree nodes). For adversarial degree
    * distributions the refinement is orienting low-degree → high-degree
    * instead of by id — same plan shape, one extra degree join. */
  def triangles(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    val wedges = e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), Seq("b"))
    wedges.join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node degree of the canonical undirected graph. */
  def degrees(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }
}
