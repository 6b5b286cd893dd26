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

  /** DEGREE-ordered orientation of the canonical edge set: each edge
    * points low-degree → high-degree, ties broken by id — a strict
    * total order, so every edge orients exactly one way. This is the
    * standard skew-proof preparation for triangle enumeration
    * (Chiba–Nishizeki / Schank–Wagner): a hub of degree d has ~zero
    * OUT-degree under this order (all its edges point INTO it unless
    * the neighbor's degree is higher), bounding every node's
    * out-degree by O(√m), so the path-wedge count Σ_v in(v)·out(v)
    * is ≤ O(m^1.5) regardless of the degree distribution —
    * id-ordering instead leaves a low-id hub with out-degree d and
    * ~d² wedges. Two degree joins (keyed on each endpoint) buy that
    * bound. Output: (src, dst). */
  def orientByDegree(pairs: DataFrame): DataFrame = {
    // persist: the canonical edge list feeds BOTH the degree aggregate
    // and the orientation join, and upstream pair generation (LSH
    // verify chains) is far too expensive to recompute per consumer.
    // ContextCleaner reclaims the block once the plan is gone.
    val e = canonicalEdges(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    e.join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Every triangle of the undirected graph, one row per triangle,
    * output id-ordered `a < b < c` so each appears exactly once. Two
    * keyed equi-joins over the DEGREE-oriented edge list
    * ([[orientByDegree]]): `(x→y) ⋈ (y→z)` builds the open wedges,
    * `(x→z)` membership closes them — never an all-pairs product, and
    * never a hub-driven wedge storm (a pure star builds ZERO wedges —
    * its hub has out-degree 0 — where id-ordering could build
    * C(deg,2)). The orientation is internal:
    * the final projection re-sorts each triple into id order, so
    * results are independent of the degree profile. */
  def triangles(pairs: DataFrame): DataFrame = {
    // the oriented list is scanned three times (two wedge sides + the
    // closing membership join) — persist once
    val e = orientByDegree(pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = e.select(col("src").as("x"), col("dst").as("y"))
      .join(e.select(col("src").as("y"), col("dst").as("z")), Seq("y"))
    wedges.join(e.select(col("src").as("x"), col("dst").as("z")), Seq("x", "z"))
      .select(array_sort(array(col("x"), col("y"), col("z"))).as("t"))
      .select(element_at(col("t"), 1).as("a"),
        element_at(col("t"), 2).as("b"),
        element_at(col("t"), 3).as("c"))
  }

  /** Per-node degree of the canonical undirected graph. */
  def degrees(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** DETERMINISTIC PageRank over the undirected pair graph — which
    * documents sit at the center of a near-dup family (keep the hub,
    * or flag it as a template farm), scored by the same random-surfer
    * recursion every graph engine uses, made bit-reproducible: scores
    * live as 10¹²-scaled longs, every per-edge contribution is
    * rounded to a long BEFORE the sum, and long addition is
    * associative — so any partitioning, shuffle order, or engine
    * produces identical bits (a double-summed PageRank is not even
    * run-to-run stable). Floating point appears only inside the fixed
    * per-edge expression `round(s·d/outdeg)`, identical on both
    * engines.
    *
    * Scale shape: textbook bulk-synchronous iteration, `iters` × (one
    * src-keyed join + one dst-keyed aggregation), all keyed shuffles;
    * the edge list and degree table persist once and are re-scanned
    * per iteration. State per node is one long — nothing collects to
    * the driver but the node COUNT. Isolated documents never enter
    * the pair graph; every node here has degree ≥ 1, so there is no
    * dangling-mass term. Every `checkpointEvery` iterations the score
    * frame runs through a [[CheckpointChain]] — eager local checkpoint,
    * stats-resetting rebuild, and unpersist of the PREVIOUS round's
    * blocks, so the loop retains exactly one materialized score copy
    * (the same lineage-truncation discipline as
    * [[Dedup.connectedComponents]]).
    *
    * Output: (node, rank) with Σ rank ≈ 1. */
  def pageRank(pairs: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    val Scale = 1000000000000.0
    val e = canonicalEdges(pairs)
    val edges = e.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    val base = math.round((1.0 - damping) * Scale / n)
    // The per-edge contribution needs only the SOURCE's outdeg, which
    // never changes — so stamp it onto the edge list once instead of
    // re-joining `deg` every iteration (one join × iters removed), and
    // hash-partition the stamped list by `src` so the cached partitioning
    // satisfies each iteration's join distribution (the per-iteration
    // re-shuffle of the edge list disappears; only the score frame moves).
    val edgesD = edges
      .join(deg.withColumnRenamed("node", "src"), Seq("src"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // edgesD supersedes the raw symmetrized list for the whole loop —
    // materialize it, then release `edges` so the edge bytes are cached
    // ONCE for the iteration, not twice (ADVICE r19)
    edgesD.count()
    edges.unpersist()
    var pr = deg.select(col("node"), lit(math.round(Scale / n)).as("s"))
    val chain = new CheckpointChain(pairs.sparkSession)
    for (i <- 1 to iters) {
      val contrib = edgesD
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          round(col("s") * damping / col("outdeg"), 0).cast("long").as("c"))
      // every node has degree ≥ 1 and the symmetrized edge list points at
      // it, so the aggregation's node set equals deg's — same recursion,
      // identical longs, one fewer join per round
      pr = contrib.groupBy(col("node"))
        .agg((sum(col("c")) + lit(base)).as("s"))
      if (i % checkpointEvery == 0 && i < iters)
        pr = chain.truncate(pr)
    }
    pr.select(col("node"), round(col("s") / Scale, 6).as("rank"))
  }
}
