package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.pipeline.{FileWatchFeed, PipelineConfig, Runner}
import graft.sink.BucketedParquetIndex

/** Standalone CLI — the reference's `sinker` entry point
  * (src/sinker/__main__.py): continuously sync denormalization views
  * over file-backed source tables into strict-schema document indexes.
  *
  * {{{
  * graft.Main <definitionsDir> <sourcesDir> <workDir> [pollMs] [maxTicks]
  * }}}
  *
  *  - `definitionsDir` — the reference's exact layout:
  *    `views_to_indices.json`, one `<view>.sql` per view, one
  *    `<index>.json` ES-style index definition per index;
  *  - `sourcesDir` — one parquet file/dir per source table, named
  *    `<table>.parquet`; replacing a table's data is the change signal
  *    (mtime watch);
  *  - `workDir` — snapshot stores + document indexes.
  *
  * Lifecycle = the reference's: setup (backfill all views into fresh
  * indexes), then poll: drain dirty tables → refresh affected views →
  * push diffs to their indexes.
  */
object Main {

  /** Build the runner without starting the loop (testable seam). */
  def build(spark: SparkSession, definitionsDir: String, sourcesDir: String,
      workDir: String): (Runner, FileWatchFeed) = {
    val srcRoot = new Path(sourcesDir)
    val fs = srcRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tablePaths = fs.listStatus(srcRoot).toSeq
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => p.getName.stripSuffix(".parquet") -> p.toString)
      .toMap
    val sources = tablePaths.map { case (t, p) =>
      t -> (() => spark.read.parquet(p))
    }
    val pipelines = PipelineConfig.fromDefinitions(
      spark, definitionsDir, s"$workDir/snapshots", sources,
      (index, mapping) => {
        val sink = new BucketedParquetIndex(spark, index, mapping,
          s"$workDir/indexes/$index")
        sink.recreate() // A16: delete + recreate on setup
        sink
      })
    val feed = new FileWatchFeed(spark,
      tablePaths.filter { case (t, _) =>
        pipelines.exists(_.sourceTables.contains(t))
      })
    (new Runner(pipelines, feed), feed)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Main <definitionsDir> <sourcesDir> <workDir> [pollMs] [maxTicks]")
    val Array(defs, srcs, work) = args.take(3)
    val pollMs = args.lift(3).map(_.toLong).getOrElse(10000L) // reference default 10s
    val maxTicks = args.lift(4).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = GraftSession.get()
    val (runner, feed) = build(spark, defs, srcs, work)
    feed.mark() // before backfill: a change landing mid-backfill still
                // fingerprints unequal next tick (extra refresh, never
                // a lost update)
    val loaded = runner.backfillAll()
    println(s"[graft] backfilled: $loaded — we are sinking")
    runner.run(pollMs, maxTicks)
    spark.stop()
  }
}
