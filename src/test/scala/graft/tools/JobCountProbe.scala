// Dev probe: run a gated query warm and print wall time + Spark job
// count per run — job counts are host-noise-immune evidence of
// driver-side round trips (guide §1/§7).
// Run via: sbt -batch "Test/runMain graft.tools.JobCountProbe <query> [sfDir] [runs]"
package graft.tools

object JobCountProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCountProbe <query> [sfDir] [runs]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.get("JOBPROBE_VERBOSE").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(starts.remove(je.jobId)).foreach { t0 =>
          println(f"[jobprobe]   job ${je.jobId} ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    // untimed warmup (index builds, codegen)
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) => println(s"warmup failed: $e") }
    spark.catalog.clearCache()
    (1 to runs).foreach { i =>
      val j0 = jobs.get(); val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[jobprobe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"jobs=${jobs.get() - j0}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
