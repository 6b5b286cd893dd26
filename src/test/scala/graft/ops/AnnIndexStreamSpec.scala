package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The streamed index must CONVERGE to the one-shot index: after the
  * stream drains, a probe answers exactly as if the whole corpus had
  * been indexed in a single write. Micro-batch boundaries are
  * arbitrary, so the spec splits the corpus at one and feeds the rest
  * through two addData calls (two epochs). */
class AnnIndexStreamSpec extends SparkSpec {

  private val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("streamed appends converge to the one-shot index") {
    val dir = Files.createTempDirectory("graft-annidx-stream").toString
    val rows = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (seed, tail) = rows.partition(_._1 % 3 == 0)

    // seed generation: the write that fixes planes/μ for all epochs
    AnnIndex.write(emb.filter(col("vec_id") % 3 === 0), planes = 4,
      path = s"$dir/idx")

    implicit val enc: Encoder[(Long, Seq[Float])] =
      Encoders.product[(Long, Seq[Float])]
    val stream = MemoryStream[(Long, Seq[Float])](enc, spark)
    val query = AnnIndex.appendStream(
      stream.toDF().toDF("vec_id", "embedding"),
      s"$dir/idx", s"$dir/ckpt")
    try {
      val (half1, half2) = tail.splitAt(tail.length / 2)
      stream.addData(half1.toSeq)
      query.processAllAvailable()
      stream.addData(half2.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val oneShot = Files.createTempDirectory("graft-annidx-stream").toString
    AnnIndex.write(emb, planes = 4, path = s"$oneShot/idx")
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$oneShot/idx", qs, k = 5).collect().toSet
    seed.nonEmpty && tail.nonEmpty shouldBe true
  }

  test("at-least-once redelivery: duplicate appends never change answers; compact removes them") {
    val dir = Files.createTempDirectory("graft-annidx-stream").toString
    AnnIndex.write(emb, planes = 4, path = s"$dir/idx")
    val expected = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
      .collect().toSet
    val total = spark.read.parquet(s"$dir/idx").count()
    // a crash between parquet commit and checkpoint commit replays the
    // batch — simulate by appending the same rows again
    val replayed = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
    AnnIndex.append(replayed, s"$dir/idx")
    spark.read.parquet(s"$dir/idx").count() should be > total // dups on disk
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
      .collect().toSet shouldBe expected // reads dedupe by vec_id
    AnnIndex.compact(spark, s"$dir/idx")
    spark.read.parquet(s"$dir/idx").count() shouldBe total // dups gone
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
      .collect().toSet shouldBe expected
  }
}
