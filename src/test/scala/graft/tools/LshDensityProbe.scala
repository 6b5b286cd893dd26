package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.Similarity

/** One-off diagnostic for the q199 planes-scaling evidence: per scale
  * and plane count, the within-bucket pair-work Σ c·(c−1) and the
  * occupied-bucket count — the quantities the log₂(n) deployment
  * contract is ABOUT, measured directly instead of inferred from wall
  * clock (at soak sizes, linear scan/signature passes can mask the
  * pair-work term in timings). Run:
  * `sbt "Test/runMain graft.tools.LshDensityProbe"` after a ScaleSoak
  * has left corpora under target/scale. */
object LshDensityProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dirs = Seq(1 -> "/root/testdata/sf0.1", 10 -> "target/scale/x10",
      30 -> "target/scale/x30")
    for ((n, dir) <- dirs; planes <- Seq(6,
        6 + math.round(math.log(n.toDouble) / math.log(2.0)).toInt).distinct) {
      val emb = Tables.embeddings(spark, dir)
      val row = Similarity.lshBuckets(emb, planes)
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).as("pairs"),
          count(lit(1)).as("buckets"), max(col("c")).as("maxc"))
        .collect()(0)
      println(s"PROBE scale=x$n planes=$planes pairs=${row.getLong(0)} " +
        s"buckets=${row.getLong(1)} maxBucket=${row.getLong(2)}")
    }
    spark.stop()
  }
}
