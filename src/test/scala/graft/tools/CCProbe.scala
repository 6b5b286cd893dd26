package graft.tools
import org.apache.spark.sql.functions._
object CCProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.cc.debug", "1")
    val spark = graft.core.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.documents(spark, dir)
    val bands = graft.ops.Dedup.bandKeys(docs, "text", "doc_id", 4, 4, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.jaccardVerify(
      graft.ops.Dedup.candidatePairs(bands), docs, "text", "doc_id", 0.5)
      .select(col("id_a"), col("id_b")).persist()
    println(f"PROBE pairs ${pairs.count()} ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    val cc = graft.ops.Dedup.connectedComponents(pairs)
    println(f"PROBE cc-driver-nodes ${cc.count()} ${(System.nanoTime()-t1)/1e9}%.2f s")
    val t2 = System.nanoTime()
    val ccD = graft.ops.Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
    println(f"PROBE cc-dist-nodes ${ccD.count()} ${(System.nanoTime()-t2)/1e9}%.2f s")
    spark.stop()
  }
}
