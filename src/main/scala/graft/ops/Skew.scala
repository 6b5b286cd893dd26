package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins whose key distribution is heavy-tailed
  * — the situation every web-scale corpus join hits (one domain, one
  * language, one near-dup cluster holding 30% of the rows).
  *
  * Layered defense, cheapest first:
  *
  *  1. AQE skew-join ([[graft.core.GraftSession]] enables
  *     `spark.sql.adaptive.enabled`): Spark 3+ detects oversized
  *     sort-merge partitions at runtime and splits them. It only fires
  *     for sort-merge joins and only splits the PARTITION, not the key —
  *     a single key bigger than one executor's memory still dies.
  *  2. Broadcast the small side (`broadcast(dim)`): no shuffle of the
  *     fact side at all, skew irrelevant. Dies when the dim outgrows
  *     driver/executor memory.
  *  3. Salting (this object): when the dim is too big to broadcast AND a
  *     single hot key overwhelms one reducer. The fact side fans each row
  *     to one of `salts` sub-keys; the dim side is replicated `salts`
  *     times. Reducer load for the hot key drops by `salts`× at the cost
  *     of a `salts`× blow-up of the (small but not broadcastable) dim —
  *     the standard trade every production Spark shop makes.
  *
  * The salt must be DETERMINISTIC (here: `xxhash64` of the fact row's
  * join key plus a distinguishing column) — `rand()` breaks retry
  * semantics: a re-executed task would re-salt rows differently than the
  * already-shuffled map output claims, silently dropping or duplicating
  * join matches under speculative execution or stage retry.
  */
object Skew {

  /** Inner-join `fact` (skewed, huge) with `dim` (keyed, too big to
    * broadcast, small enough to replicate `salts`×) on `key`, spreading
    * each fact key across `salts` reducers.
    *
    * `spreadOn` picks the fact column(s) that decide which salt bucket a
    * row lands in — any columns with per-row variety (an id, a
    * timestamp). Result is exactly `fact.join(dim, key)` (spec-gated in
    * SkewSpec against the unsalted plan), with the hot key's rows spread
    * over `salts` reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      spreadOn: Seq[String]): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(spreadOn.nonEmpty, "spreadOn needs at least one fact column")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val saltCol = pmod(
      xxhash64((key +: spreadOn).map(col): _*), lit(salts.toLong))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key row counts above `threshold` — the probe that decides
    * whether salting is worth the dim blow-up, and the input to a
    * targeted (hot-keys-only) variant. One partial-aggregated groupBy;
    * output is bounded by the number of genuinely hot keys. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= threshold)

  /** Split `df` into (rows whose `key` is in `hot`, the rest). `hot` is
    * bounded by construction (≤ n/threshold keys can be hot), so both
    * probes are broadcast joins — no shuffle of `df`. */
  private[ops] def splitByHot(df: DataFrame, key: String, hot: DataFrame)
      : (DataFrame, DataFrame) = {
    val hotKeysOnly = broadcast(hot.select(col(key)))
    (df.join(hotKeysOnly, Seq(key), "left_semi"),
     df.join(hotKeysOnly, Seq(key), "left_anti"))
  }

  /** TARGETED salted join — the 100×-scale version of [[saltedJoin]]:
    * salt ONLY the keys whose fact-side row count reaches
    * `hotThreshold`; everything else takes the plain equi-join. The
    * uniform variant pays the `salts`× dim replication for every key;
    * at production skew (a handful of hot keys over billions of cold
    * ones) that blow-up is almost entirely waste. Here the replicated
    * dim subset is bounded by the hot-key count (≤ fact_rows /
    * hotThreshold keys can be hot), so replication cost is proportional
    * to the skew actually present.
    *
    * Cost shape: one partial-aggregated counting pass over the fact
    * side ([[hotKeys]] — its output is small enough to broadcast by
    * construction), two broadcast semi/anti probes per input (no extra
    * shuffle), then one salted join over the hot slice + one plain join
    * over the cold slice, unioned. Result is exactly
    * `fact.join(dim, key)` — spec-gated in SkewSpec against the plain
    * plan and oracle-gated (q94) against a second engine. */
  def saltedJoinHotOnly(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, spreadOn: Seq[String], hotThreshold: Long): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val hot = hotKeys(fact, key, hotThreshold)
    val (factHot, factCold) = splitByHot(fact, key, hot)
    val (dimHot, dimCold) = splitByHot(dim, key, hot)
    saltedJoin(factHot, dimHot, key, salts, spreadOn)
      .unionByName(factCold.join(dimCold, Seq(key)))
  }
}
