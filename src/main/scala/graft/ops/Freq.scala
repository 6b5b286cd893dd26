package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-item operators: EXACT heavy hitters without a full-corpus
  * shuffle.
  *
  * The classic two-pass design (Misra–Gries 1982; merge bounds from
  * Agarwal, Cormode et al. "Mergeable Summaries", PODS 2012): pass 1
  * builds a k-counter Misra–Gries summary per partition and merges
  * them on the driver via `treeAggregate` — bounded memory (k entries
  * per task, k entries on the driver), ZERO shuffle of the corpus.
  * Any item with true count > N/(k+1) is guaranteed present in the
  * merged summary, so for a threshold above that bound the candidate
  * set is a provable SUPERSET of the answer. Pass 2 recounts ONLY the
  * candidates exactly (broadcast semi-join, then a keyed aggregation
  * whose input is just the candidate occurrences) and applies the
  * threshold.
  *
  * The summary CONTENT depends on partition layout (Misra–Gries is
  * order-sensitive), but the FINAL output does not: completeness comes
  * from the bound, exactness from the recount — spurious candidates
  * fall to the threshold filter. At 100 TB this replaces a
  * full-vocabulary groupBy (shuffle ∝ corpus) with a driver-bounded
  * sketch plus a shuffle ∝ heavy-item occurrences.
  */
object Freq {

  /** One Misra–Gries summary: at most k live counters. */
  private def mgInsert(m: mutable.HashMap[String, Long], w: String,
      k: Int): mutable.HashMap[String, Long] = {
    m.get(w) match {
      case Some(c) => m(w) = c + 1
      case None if m.size < k => m(w) = 1L
      case None =>
        // decrement-all: removes k+1 units of mass, so this branch
        // runs at most N/(k+1) times — amortized O(1) per item
        m.mapValuesInPlace((_, c) => c - 1)
        m.filterInPlace((_, c) => c > 0)
    }
    m
  }

  /** Mergeable-summaries merge: sum counts, then if over k entries
    * subtract the (k+1)-th largest count from all and drop non-positive
    * — preserves the ≤ N/(k+1) undercount bound. */
  private def mgMerge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long], k: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (w, c) => a(w) = a.getOrElse(w, 0L) + c }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.mapValuesInPlace((_, c) => c - cut)
      a.filterInPlace((_, c) => c > 0)
    }
    a
  }

  /** Exact heavy hitters over `itemCol`: every distinct value whose
    * count ≥ `minCount(N)` (N = total non-null rows), with its EXACT
    * count — output `(item, cnt)`.
    *
    * `minCount` sees the total so thresholds can scale with the corpus
    * (e.g. `n => math.max(10, n / 1000)`). Completeness requires
    * `minCount(N) > N/(summaryK+1)` — enforced with a `require`; size
    * `summaryK` accordingly (the driver holds ≤ summaryK counters). */
  def exactHeavyHitters(items: DataFrame, itemCol: String, summaryK: Int)(
      minCount: Long => Long): DataFrame = {
    require(summaryK > 0, s"summaryK must be positive, got $summaryK")
    val spark = items.sparkSession
    import spark.implicits._
    val vals = items.select(col(itemCol).cast("string").as("w"))
      .na.drop(Seq("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = vals.as[String].rdd
    val (summary, n) = rdd.treeAggregate(
        (mutable.HashMap.empty[String, Long], 0L))(
      seqOp = { case ((m, cnt), w) => (mgInsert(m, w, summaryK), cnt + 1) },
      combOp = { case ((m1, c1), (m2, c2)) => (mgMerge(m1, m2, summaryK), c1 + c2) })
    val threshold = minCount(n)
    require(threshold > n / (summaryK + 1),
      s"minCount($n)=$threshold is not above the Misra-Gries bound " +
        s"N/(k+1)=${n / (summaryK + 1)}; raise the threshold or summaryK " +
        "or the candidate set loses its superset guarantee")
    val cands = summary.keys.toSeq.toDF("w")
    val out = vals.join(broadcast(cands), Seq("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("w").as(itemCol), col("cnt"))
    val materialized = out.persist()
    materialized.count() // force before unpersisting the shared input
    vals.unpersist()
    materialized
  }
}
