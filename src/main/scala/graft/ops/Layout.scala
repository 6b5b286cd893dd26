package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning at 100 TB.
  *
  * A single-column sort makes parquet row-group min/max stats selective
  * on that column only; filters on any other column read everything.
  * Interleaving the bits of two dimensions onto a Z (Morton) curve and
  * range-partitioning + sorting on the z-value bounds BOTH dims inside
  * every partition and row group, so min/max stats prune scans filtered
  * on either dimension — the standard lakehouse clustering layout for
  * multi-dim workloads (time × tenant, customer × date).
  *
  * Everything here is pure per-row bit arithmetic (codegen'd shifts and
  * masks — no UDF) plus ONE range-partition exchange at write time;
  * the read path needs no library code at all, it just benefits from
  * the layout.
  */
object Layout {

  /** Z (Morton) value of two non-negative dimensions, `bits` low bits
    * each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Values are masked to `bits` first, so out-of-range inputs degrade
    * to their low bits instead of corrupting the curve. Pure codegen'd
    * integer ops — reproducible in any engine with shifts (oracle q86
    * recomputes it in DuckDB). */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Min-max scale a numeric column onto [0, 2^bits): the two
    * interleaved dimensions must occupy COMPARABLE bit widths or the
    * curve degenerates toward a single-column sort (a 14-bit day count
    * interleaved with an 8-bit key is day-dominated at every split).
    * Bounds are caller-supplied — at 100 TB they come from table
    * statistics, not a scan. Out-of-range values clamp. */
  def scaleTo(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val mask = (1L << bits) - 1
    least(lit(mask), greatest(lit(0L),
      ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(mask.toDouble))
        .cast("long")))
  }

  /** Cluster `df` along the z-curve over (a, b): range-partition on the
    * z-value (one exchange; range bounds from a sample, the same
    * machinery as a global sort) and sort within partitions. Written to
    * parquet, every row group's min/max covers a small z-range — a
    * small rectangle in (a, b) space — so predicate pushdown on either
    * dimension skips row groups. `partitions` sizes the output files;
    * at scale pick ~target-file-size × cluster parallelism. */
  /** Token-balanced shard assignment for training-data export: docs
    * sort by (token count DESC, id) and deal round-robin onto `shards`,
    * so every shard's token total lands within one max-doc of the rest
    * (the deterministic alternative to greedy bin packing, which is
    * inherently sequential). Hash sharding balances COUNTS; long-doc
    * skew still unbalances tokens — this balances the tokens
    * themselves, which is what training-step time follows.
    *
    * Scale shape: the global rank the deal needs is NOT a
    * single-partition window (the classic bottleneck) — it's the
    * zipWithIndex discipline: one range exchange orders partitions,
    * per-partition counts collect to the driver (numPartitions longs),
    * and each row's rank = local index + its partition's offset. Two
    * passes over the data, no global sort through one task.
    *
    * Output: one row per doc — (idCol, n_tokens, shard). Aggregate for
    * the balance report; write partitioned by `shard` for the export. */
  def tokenBalancedShards(docs: DataFrame, textCol: String, idCol: String,
      shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    val sorted = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(col("n_tokens").desc, col(idCol).asc)
      .sortWithinPartitions(col("n_tokens").desc, col(idCol).asc)
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    // persist before zipWithIndex: its size-scan job and its data pass
    // must observe ONE materialization, or a nondeterministic upstream
    // (sample, unordered limit) silently misaligns offsets (ADVICE r6).
    // The ContextCleaner unpersists the RDD once it goes out of scope.
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val indexed = srdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i % shards).toInt)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** `ntile(tiles) OVER (ORDER BY orderCols)` without the single-task
    * global window: a range exchange plus per-partition sort gives the
    * total order, `zipWithIndex` the global 0-based rank, and the tile
    * follows from ntile's own arithmetic (the first `n % tiles` tiles
    * carry one extra row). Quality-bucket mixing, decile reports and
    * curriculum ordering all need this at corpus scale — the naive
    * window funnels 100 TB through one task; this is two linear passes
    * (one count, one rank) with no single-task stage. Row-identical to
    * the window form (LayoutSpec proves it, including ragged n%tiles;
    * `orderCols` must be a total order or ties make BOTH forms
    * nondeterministic). */
  def globalNtile(df: DataFrame, tiles: Int, orderCols: Column*): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // persist so n (the count job), zipWithIndex's size scan and its
    // data pass all observe ONE materialization — unpersisted, a
    // nondeterministic upstream (sample, unordered limit) can make n
    // disagree with the ranked pass and silently mis-size every tile
    // (ADVICE r6). ContextCleaner reclaims the RDD when it drops out
    // of scope.
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = srdd.count()
    val size = n / tiles
    val rem = n % tiles
    val cut = rem * (size + 1)
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField("tile",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val indexed = srdd.zipWithIndex().map { case (r, i) =>
      val tile = if (i < cut) i / (size + 1) + 1
        else rem + (i - cut) / size + 1
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ tile.toInt)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** `row_number() OVER (ORDER BY orderCols)` without the single-task
    * global window — the same two-pass shape as [[globalNtile]]: range
    * exchange + per-partition sort for the total order, `zipWithIndex`
    * for the exact 1-based global rank. The building block for
    * sorted-neighborhood blocking, curriculum ordering and any "give
    * every row its global position" pass at corpus scale. `orderCols`
    * must be a total order or the rank is nondeterministic (same
    * caveat as the window form). Appends a `rank` LONG column. */
  def globalRank(df: DataFrame, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // persisted for the same reason as globalNtile: zipWithIndex's
    // size scan and its data pass must observe one materialization
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = srdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }

  /** `SUM(valueCol) OVER (ORDER BY orderCols)` — inclusive global
    * running sum — without the single-task window: range exchange +
    * per-partition sort for the total order, then ONE tiny driver
    * round-trip (one long per partition — the per-partition totals)
    * turns per-partition running sums into global ones via broadcast
    * offsets. The backbone of sequence packing, curriculum budgeting
    * and any "cut the corpus at cumulative-token boundaries" pass.
    * `valueCol` must be LONG (exact; doubles would make the result
    * partitioning-dependent); `orderCols` must be a total order.
    * Appends a `cumsum` LONG column. */
  def globalCumsum(df: DataFrame, valueCol: String,
      orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    require(sorted.schema(valueCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"globalCumsum needs a LONG $valueCol, got " +
        sorted.schema(valueCol).dataType.simpleString)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // persist: the totals pass and the data pass must observe ONE
    // materialization (the globalNtile rule)
    val srdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partTotals = srdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = sorted.schema
      .add(org.apache.spark.sql.types.StructField("cumsum",
        org.apache.spark.sql.types.LongType, nullable = false))
    val out = srdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        run += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Deterministic weighted sample of `k` rows (Efraimidis–Spirakis
    * 2006 priority sampling): each row draws a pseudo-uniform
    * u ∈ (0, 1] from the md5 of its id (seed-free, engine- and
    * partitioning-independent — the q57/q63 hash-sampling discipline)
    * and ranks by `ln(u) / w` descending, which orders identically to
    * the classic u^(1/w) key but avoids cross-engine `pow`. Higher
    * weight → higher selection probability, exactly the
    * weighted-reservoir semantics a training-data mixer needs for
    * token-mass-proportional corpus draws — made reproducible.
    *
    * Scale shape: one scan computes the score per row (hash + one ln,
    * all inside codegen) and the top-k plans as
    * `TakeOrderedAndProject` — per-partition heads, driver merge of k
    * rows, never a global sort. Score ties (p < 10⁻¹⁴ per pair) break
    * by id, so the drawn set is total-order stable.
    *
    * Output: (idCol, weightCol, score), score rounded to 6 so the
    * ORDER BY and any oracle compare the same rounded value. */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        round(log((h + 1) / lit(281474976710656.0)) / col(weightCol), 6)
          .as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Source-mixture drift between two corpus snapshots: per group
    * (source, domain, shard …), the weight share in snapshot `a` vs
    * snapshot `b` and the KL(B‖A) contribution `s_b·ln(s_b/s_a)` — the
    * monitor a training-data pipeline runs between crawls to catch a
    * source silently exploding or vanishing before it skews the
    * mixture (summing `kl_term` gives the total divergence). Only
    * groups present in BOTH snapshots are emitted (KL needs absolute
    * continuity); totals are taken over those common groups so the
    * shares each sum to 1 and the divergence is well-defined.
    *
    * Determinism: weights aggregate as exact longs; shares and the KL
    * term are one fixed double expression over those longs (same libm
    * `ln` both engines — the q49/q72 precedent), rounded at the edge.
    *
    * Scale shape: two group-keyed aggregations (map-side partials),
    * one equi-join on the group key, and a 1-row totals broadcast —
    * state is |groups|, never corpus-sized.
    *
    * Output: (groupCol, toks_a, toks_b, share_a, share_b, kl_term). */
  def sourceDrift(a: DataFrame, b: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val pa = a.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("long").as("toks_a"))
    val pb = b.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("long").as("toks_b"))
    val per = pa.join(pb, Seq(groupCol))
      .filter(col("toks_a") > 0 && col("toks_b") > 0)
    val tot = per.agg(sum(col("toks_a")).as("ta"), sum(col("toks_b")).as("tb"))
    val sa = col("toks_a").cast("double") / col("ta")
    val sb = col("toks_b").cast("double") / col("tb")
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("toks_a"), col("toks_b"),
        round(sa, 6).as("share_a"), round(sb, 6).as("share_b"),
        round(sb * log(sb / sa), 6).as("kl_term"))
  }

  def zorder(df: DataFrame, a: Column, b: Column, bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("__z"), "zorder reserves the __z column name")
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", zValue2(a, b, bits))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
