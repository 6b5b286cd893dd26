package graft.tools
object Q2Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    for (q <- Seq("q52_winnow_overlap", "q52_winnow_overlap")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROBE $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
