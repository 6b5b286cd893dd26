package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence (market-basket) pair counting: which items appear
  * together inside the same group — parts ordered together, tags on
  * the same document, tools invoked in the same session. The classic
  * "frequent itemset support at size 2" primitive behind
  * recommendation candidates and co-citation graphs.
  *
  * Shape: one partial-aggregated `groupBy(group)` collects each
  * group's DISTINCT item set, `maxBasket` bounds it (the knob that
  * bounds the whole job — see [[pairCounts]]), a per-row
  * higher-order-function expansion emits
  * the sorted i<j combinations WITHOUT a self-join (the naive
  * `fact JOIN fact ON group` reads and shuffles the fact twice; this
  * reads it once), and a second keyed aggregation counts support per
  * pair. Top-k with a full (support, item, item) tie-break plans as
  * `TakeOrderedAndProject` — per-partition heads, driver merge of k
  * rows, no global sort.
  *
  * 100 TB: both shuffles are keyed and partial-aggregated; pair
  * cardinality is Σ C(|basket|,2), so the basket-size cap is the knob
  * that bounds the blow-up, not data volume. */
object Cooccur {

  /** Sorted i<j item pairs per group with their group support,
    * descending; ties broken by (item_a, item_b) so the top-k cut is
    * fully deterministic. Output: (item_a, item_b, n_groups).
    *
    * `maxBasket` caps the quadratic per-group blow-up: a group's pair
    * output is C(|basket|,2), so one pathological basket (a crawler
    * session touching 100k items) emits 5·10⁹ rows from a single
    * aggregate row. Baskets over the cap keep their `maxBasket`
    * SMALLEST items (a deterministic `slice` of the sorted set — same
    * discipline as [[Dedup.candidatePairs]]'s `maxBucket`), and every
    * truncated basket is logged with its group and size (the log scan
    * runs over the already-aggregated |groups|-row side, never the
    * fact). */
  def pairCounts(df: DataFrame, groupCol: String, itemCol: String,
      topK: Int, maxBasket: Int = Int.MaxValue): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(maxBasket > 1, s"maxBasket must be > 1, got $maxBasket")
    val full = df
      .groupBy(col(groupCol))
      .agg(array_sort(collect_set(col(itemCol))).as("__items"))
    val items =
      if (maxBasket == Int.MaxValue) full
      else {
        val over = full.filter(size(col("__items")) > maxBasket)
          .select(col(groupCol), size(col("__items")).as("n"))
          .agg(count(lit(1)).as("groups"), max(col("n")).as("largest"))
          .collect()(0)
        if (over.getLong(0) > 0)
          System.err.println(s"Cooccur.pairCounts: ${over.getLong(0)} " +
            s"baskets over $maxBasket items (largest ${over.getInt(1)}); " +
            s"truncating to the $maxBasket smallest items each")
        full.withColumn("__items", slice(col("__items"), 1, maxBasket))
      }
    val pairs = items.select(explode(flatten(transform(
      col("__items"),
      (x, i) => transform(
        slice(col("__items"), i + lit(2), size(col("__items"))),
        y => struct(x.as("item_a"), y.as("item_b")))))).as("__p"))
    pairs
      .select(col("__p.item_a").as("item_a"), col("__p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("n_groups").desc, col("item_a").asc, col("item_b").asc)
      .limit(topK)
  }
}
