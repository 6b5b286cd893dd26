package graft.tools
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q46_asof_join", "q47_range_join", "q48_ngram_jaccard", "q49_bm25")
    for (q <- qs) {
      println(s"========== $q ==========")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // condensed: operator lines only
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Window") || l.contains("Scan") || l.contains("Aggregate") ||
        l.contains("Cartesian") || l.contains("BroadcastNestedLoop") || l.contains("TakeOrdered"))
        .foreach(println)
    }
    spark.stop()
  }
}
