package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Eager lineage truncation with BOUNDED storage for iterative loops.
  *
  * Iterative self-joining frames (PageRank rounds, the large/small-star
  * contraction) need their lineage cut every few rounds — otherwise the
  * plan deepens by two joins per iteration and the inherited size
  * statistics square into driver-hanging BigIntegers. Plain
  * `Dataset.localCheckpoint(true)` does that, but every call leaves its
  * materialized RDD persisted for the rest of the job and offers no
  * handle to release the previous round's copy — a 50-iteration loop
  * checkpointing every 5 retains ~10 full copies of the state frame in
  * executor storage, which is real memory at 100 TB node counts.
  *
  * Each [[truncate]] call:
  *  1. locally checkpoints the frame's row RDD and materializes it NOW
  *     (the eager count — callers fan the result into multiple branches,
  *     and a lazy checkpoint would race them through the uncached DAG);
  *  2. unpersists the PREVIOUS round's blocks (safe: the new RDD's
  *     lineage was truncated at materialization, so nothing reads the
  *     old blocks again);
  *  3. rebuilds a fresh `LogicalRDD` frame over the new RDD, resetting
  *     the inherited statistics.
  *
  * The chain retains exactly ONE materialized copy of the state at any
  * time; the final copy stays persisted for the caller's downstream
  * plan and is reclaimed by the ContextCleaner once unreachable.
  * Local (executor-storage) checkpointing trades executor-loss
  * recovery for speed — the documented tradeoff of
  * `RDD.localCheckpoint`, identical to the previous
  * `Dataset.localCheckpoint` shape.
  */
final class CheckpointChain(spark: SparkSession) {
  private var prev: Option[RDD[Row]] = None

  def truncate(df: DataFrame): DataFrame = {
    val rdd = df.rdd.localCheckpoint()
    rdd.count() // materialize + truncate the RDD lineage
    prev.foreach(_.unpersist(blocking = false))
    prev = Some(rdd)
    spark.createDataFrame(rdd, df.schema)
  }
}
