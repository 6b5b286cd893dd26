// Dev probe: per-phase timing breakdown of the bench pipeline lifecycle.
// Run via: sbt -batch "Test/runMain graft.tools.LifecycleProbe"
package graft.tools

import org.apache.spark.sql.functions._

object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    spark.range(1000).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()
    graft.core.Tables.region(spark, sfDir).write.format("noop").mode("overwrite").save()
    // per-phase Spark-job counter: job counts are host-noise-immune
    // evidence of driver-side round trips (guide §1/§5)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def timed[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}"); r
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
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
    timed("recreate")(sink.recreate())
    // manual backfill with per-phase timing
    val store = new graft.refresh.BucketedSnapshotStore(spark, s"$tmp/snap")
    val v = timed("backfill.stage")(store.stage(view()))
    val snap0 = store.readVersion(v)
    timed("backfill.sink")(sink.applyActions(
      snap0.select(lit("index").as("op"), col("id"), col("doc"))))
    timed("backfill.commit")(store.commit(v))
    flip = true
    // manual changed refresh with per-phase timing
    val newSnap = view().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val actions = graft.refresh.DiffRefresher.diff(store.read(), newSnap).cache()
    val n = timed("refresh.diff-count")(actions.count())
    println(s"PROBE n_actions $n")
    timed("refresh.sink")(sink.applyActions(actions))
    timed("refresh.snap-merge")(store.mergeActions(actions))
    actions.unpersist(); newSnap.unpersist()
    val pipe = new graft.pipeline.Pipeline("bench_mv", "customer", Set("customer"),
      () => view(), store, sink)
    timed("refresh-idle")(pipe.refresh())
    timed("refresh-idle2")(pipe.refresh())
    timed("snap-read-count")(store.read().count())
    spark.stop()
  }
}
