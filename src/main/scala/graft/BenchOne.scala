package graft

import graft.core.GraftSession

/** Dev tool: run ONE gated query N times against a given sf dir, print
  * per-run wall times and the executed plan — the .explain feedback
  * loop the builder prompt asks for, without paying a full Bench sweep.
  *
  * Usage: runMain graft.BenchOne <queryName> [sfDir] [runs] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val usage = "usage: BenchOne <queryName> [sfDir] [runs>0] [explain]"
    require(args.nonEmpty, usage)
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs =
      if (args.length > 2) args(2).toIntOption.getOrElse(sys.error(s"runs must be an int; $usage"))
      else 3
    require(runs > 0, s"runs must be positive; $usage")
    val explain = args.length > 3 && args(3) == "explain"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    spark.range(1000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
