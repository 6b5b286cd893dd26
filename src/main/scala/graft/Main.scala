package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.pipeline.{FileWatchFeed, PgSlotFeed, Pipeline, PipelineConfig, Runner}
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

  /** Build the runner without starting the loop (testable seam).
    * File-watch mode: parquet source tables under `sourcesDir`, mtime
    * change detection. */
  def build(spark: SparkSession, definitionsDir: String, sourcesDir: String,
      workDir: String,
      settings: graft.core.GraftSettings = graft.core.GraftSettings.fromEnv)
      : (Runner, FileWatchFeed) = {
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
    val pipelines = buildPipelines(spark, definitionsDir, workDir, sources, settings)
    val feed = new FileWatchFeed(spark,
      tablePaths.filter { case (t, _) =>
        pipelines.exists(_.sourceTables.contains(t))
      })
    (new Runner(pipelines, feed), feed)
  }

  /** "Point it at a Postgres": source tables read over JDBC, changes
    * drained from the logical replication slot (reference deployment
    * shape — src/sinker/runner.py:56-64, settings.py:44-51). Active
    * when PGHOST is set. */
  def buildPg(spark: SparkSession, definitionsDir: String, workDir: String,
      settings: graft.core.GraftSettings): (Runner, PgSlotFeed) = {
    val url = settings.pgJdbcUrl.getOrElse(
      throw new IllegalStateException("PGHOST not set"))
    // source tables = every table referenced by any view's SQL
    val tables = PipelineConfig
      .loadViewsToIndices(s"$definitionsDir/views_to_indices.json").keySet
      .flatMap { view =>
        val sql = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$definitionsDir/$view.sql"))
        graft.analysis.ViewAnalyzer.parseSchemaTables(spark, sql)._2
      }
    val props = settings.pgProps
    val schema = settings.sinkerSchema
    val sources: Map[String, () => org.apache.spark.sql.DataFrame] =
      tables.map { t =>
        // schema-qualified (SINKER_SCHEMA parity), chunked
        // (fetchsize=PGCHUNK_SIZE) and range-partitioned scan — the
        // backfill parallelizes instead of one task per table
        t -> (() => graft.sources.JdbcSource.read(spark, url,
          s""""$schema"."$t"""",
          props, settings.pgChunkSize, settings.pgScanPartitions,
          settings.pgPartitionColumns.get(t)))
      }.toMap
    val pipelines = buildPipelines(spark, definitionsDir, workDir, sources, settings)
    val feed = new PgSlotFeed(
      new graft.cdc.JdbcSlotConnection(url, props), settings.replicationSlot)
    (new Runner(pipelines, feed), feed)
  }

  private def buildPipelines(
      spark: SparkSession, definitionsDir: String, workDir: String,
      sources: Map[String, () => org.apache.spark.sql.DataFrame],
      settings: graft.core.GraftSettings): Seq[Pipeline] =
    PipelineConfig.fromDefinitions(
      spark, definitionsDir, s"$workDir/snapshots", sources,
      (index, mapping) => settings.esUrl match {
        case Some(url) =>
          // real ES-compatible endpoint: bulk chunks/retries/timeout
          // from the reference's env knobs (settings.py:23-41)
          val sink = new graft.sink.EsHttpBulkSink(url, index, mapping,
            settings.esChunkSize, settings.sinkMaxRetries,
            settings.sinkTimeoutMs, settings.esAuthHeader)
          sink.recreate(java.nio.file.Files.readString(
            java.nio.file.Paths.get(s"$definitionsDir/$index.json")))
          sink
        case None =>
          val sink = new BucketedParquetIndex(spark, index, mapping,
            s"$workDir/indexes/$index", settings.snapshotBuckets,
            settings.snapshotMaxDeltas, settings.sinkMaxRetries)
          sink.recreate() // A16: delete + recreate on setup
          sink
      }, settings)

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Main <definitionsDir> <sourcesDir> <workDir> [pollMs] [maxTicks]")
    val Array(defs, srcs, work) = args.take(3)
    val settings = graft.core.GraftSettings.fromEnv
    // precedence: CLI arg > env (SINKER_POLL_INTERVAL) > default 10s
    val pollMs = args.lift(3).map(_.toLong).getOrElse(settings.pollIntervalMs)
    val maxTicks = args.lift(4).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = GraftSession.get()
    val runner = settings.pgJdbcUrl match {
      case Some(_) =>
        // live Postgres: slot lifecycle around setup (runner.py:56-64)
        val (r, feed) = buildPg(spark, defs, work, settings)
        feed.resetSlot()
        r
      case None =>
        val (r, feed) = build(spark, defs, srcs, work, settings)
        feed.mark() // before backfill: a change landing mid-backfill still
                    // fingerprints unequal next tick (extra refresh,
                    // never a lost update)
        r
    }
    val loaded = runner.backfillAll()
    println(s"[graft] backfilled: $loaded — we are sinking")
    runner.run(pollMs, maxTicks)
    spark.stop()
  }
}
