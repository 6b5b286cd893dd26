package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Encoder, Encoders}

import graft.SparkSpec

/** Streaming operator surface beyond the reference's processing-time
  * poll loop (SURVEY §2C notes sinker is processing-time-only): event-
  * time windows with watermarks and arbitrary keyed state — the pieces
  * a training-data ingest pipeline needs for late data and
  * sessionization at scale. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling-window aggregation emits closed windows") {
    implicit val enc: Encoder[(Timestamp, String, Double)] =
      Encoders.product[(Timestamp, String, Double)]
    val stream = MemoryStream[(Timestamp, String, Double)](enc, spark)
    val windowed = stream.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
    val query = windowed.writeStream
      .format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData((ts(0), "click", 1.0), (ts(2), "click", 2.0), (ts(4), "view", 5.0))
      query.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed the window ends
      spark.table("win_agg").count() shouldBe 0

      // event at 10:30 pushes the watermark to 10:20 -> both 10:00-10:05
      // windows close and emit
      stream.addData((ts(30), "click", 9.0))
      query.processAllAvailable()
      val rows = spark.table("win_agg")
        .as[(Timestamp, String, Long, Double)].collect().sortBy(_._2)
      rows.map(r => (r._1.toString, r._2, r._3, r._4)).toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 5.0))
    } finally query.stop()
  }

  test("stream-stream interval join attributes clicks to preceding purchases") {
    implicit val enc: Encoder[(Timestamp, Long, Long)] =
      Encoders.product[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)](enc, spark)
    val purchases = MemoryStream[(Timestamp, Long, Long)](enc, spark)
    // the streaming sibling of the q46 as-of join: a purchase matches
    // clicks of the same user up to 15 min LATER; watermarks bound the
    // state both engines must hold (Spark drops purchase state once
    // click-time watermark passes purchase_ts + 15 min)
    val c = clicks.toDF().toDF("c_ts", "c_user", "click_id")
      .withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") <= col("c_ts") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 15 minutes"))
      .select(col("click_id"), col("purchase_id"))
    val query = joined.writeStream
      .format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append())
      .start()
    try {
      purchases.addData((ts(0), 7L, 100L), (ts(1), 8L, 101L))
      clicks.addData((ts(5), 7L, 200L),   // 5 min after purchase 100 → match
        (ts(20), 7L, 201L),               // 20 min after → outside interval
        (ts(3), 9L, 202L))                // no purchase for user 9
      query.processAllAvailable()
      spark.table("ss_join").as[(Long, Long)].collect().toSet shouldBe
        Set((200L, 100L))
    } finally query.stop()
  }

  test("session_window groups events by 30-minute gaps (streaming form of q40)") {
    implicit val enc: Encoder[(Timestamp, Long)] =
      Encoders.product[(Timestamp, Long)]
    val stream = MemoryStream[(Timestamp, Long)](enc, spark)
    val sessions = stream.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // user 1: events at 10:00, 10:10 (one session), then 11:30 (new
      // session after a >30min gap)
      stream.addData((ts(0), 1L), (ts(10), 1L),
        (Timestamp.valueOf("2024-01-01 11:30:00"), 1L))
      query.processAllAvailable()
      // close all sessions by advancing the watermark far ahead
      stream.addData((Timestamp.valueOf("2024-01-01 20:00:00"), 99L))
      query.processAllAvailable()
      val rows = spark.table("sessions")
        .filter(col("user_id") === 1L)
        .as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
      rows.map(r => (r._2.toString, r._3)).toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", 2L),
        ("2024-01-01 11:30:00.0", 1L))
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed events (at-least-once → effective once)") {
    implicit val enc: Encoder[(Timestamp, String)] =
      Encoders.product[(Timestamp, String)]
    val stream = MemoryStream[(Timestamp, String)](enc, spark)
    val deduped = stream.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val query = deduped.writeStream
      .format("memory").queryName("deduped_events")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData((ts(0), "e-1"), (ts(1), "e-2"))
      query.processAllAvailable()
      // an at-least-once source replays e-1 in a later batch
      stream.addData((ts(2), "e-1"), (ts(3), "e-3"))
      query.processAllAvailable()
      spark.table("deduped_events")
        .select("event_id").as[String].collect().sorted.toSeq shouldBe
        Seq("e-1", "e-2", "e-3")
    } finally query.stop()
  }

  test("foreachBatch + incrementalExactDedup: continuous corpus ingest dedups across micro-batches") {
    // the batch-incremental dedup op composed with Structured Streaming:
    // each micro-batch anti-joins the accumulated content-key state, so
    // replays and cross-batch duplicates never reach the corpus sink
    implicit val enc: Encoder[(Long, String)] = Encoders.product[(Long, String)]
    val stream = MemoryStream[(Long, String)](enc, spark)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_dedup_state").toString
    val sinkRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    // seed empty state table on disk (content_key only)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("content_key",
          org.apache.spark.sql.types.StringType))))
      .write.mode("overwrite").parquet(stateDir)
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val seen = spark.read.parquet(stateDir)
        val (fresh, seenNext) = graft.ops.Dedup
          .incrementalExactDedup(batch, seen, "text", "doc_id")
        sinkRows.synchronized {
          sinkRows ++= fresh.select("doc_id", "text")
            .as[(Long, String)](enc).collect()
        }
        // two-step write: seenNext reads stateDir lazily, so materialize
        // to a sibling then swap (same discipline as the CAS snapshot
        // store; a plain overwrite would read-while-truncating)
        val next = stateDir + "_next"
        seenNext.write.mode("overwrite").parquet(next)
        spark.read.parquet(next).write.mode("overwrite").parquet(stateDir)
        ()
      }
      .start()
    try {
      stream.addData((1L, "aaa"), (2L, "aaa"), (3L, "bbb"))
      query.processAllAvailable()
      stream.addData((4L, "bbb"), (5L, "ccc"))  // bbb is a cross-batch dup
      query.processAllAvailable()
      stream.addData((6L, "ccc"))               // replayed content
      query.processAllAvailable()
      sinkRows.map(_._1).sorted.toSeq shouldBe Seq(1L, 3L, 5L)
      spark.read.parquet(stateDir).count() shouldBe 3L
    } finally query.stop()
  }

  test("foreachBatch + incrementalPassageDedup: boilerplate passages dedup across micro-batches") {
    // passage-level variant of the incremental dedup loop: a boilerplate
    // passage arriving in batch 2 inside a NEW document is dropped
    // because batch 1 already registered its key
    implicit val enc: Encoder[(Long, String)] = Encoders.product[(Long, String)]
    val boiler = (1 to 4).map(i => s"b$i").mkString(" ")
    val stream = MemoryStream[(Long, String)](enc, spark)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_passage_state").toString
    val sinkRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("passage_key",
          org.apache.spark.sql.types.StringType))))
      .write.mode("overwrite").parquet(stateDir)
    val query = stream.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val seen = spark.read.parquet(stateDir)
        val (fresh, seenNext) = graft.ops.Dedup
          .incrementalPassageDedup(batch, seen, "text", "doc_id", 4)
        sinkRows.synchronized {
          sinkRows ++= fresh.select("doc_id", "chunk_text")
            .as[(Long, String)](enc).collect()
        }
        val next = stateDir + "_next"
        seenNext.write.mode("overwrite").parquet(next)
        spark.read.parquet(next).write.mode("overwrite").parquet(stateDir)
        ()
      }
      .start()
    try {
      stream.addData((1L, s"$boiler u1 u2 u3 u4"))
      query.processAllAvailable()
      stream.addData((2L, s"$boiler v1 v2 v3 v4"), (3L, s"$boiler u1 u2 u3 u4"))
      query.processAllAvailable()
      // batch 1: doc 1 contributes boiler + u-passage. batch 2: doc 2's
      // boiler is a cross-batch dup (dropped), its v-passage is fresh;
      // doc 3 is a full replay (nothing fresh).
      sinkRows.sortBy(r => (r._1, r._2)).toSeq shouldBe Seq(
        (1L, boiler), (1L, "u1 u2 u3 u4"), (2L, "v1 v2 v3 v4"))
      spark.read.parquet(stateDir).count() shouldBe 3L
    } finally query.stop()
  }

  test("streaming PQ encode: stream codes match the batch encode exactly") {
    // the embedding-index maintenance path: the codebook is trained
    // offline ONCE (codes are only comparable within one codebook), and
    // pqEncodeWith is a stateless per-row projection, so it applies to
    // a stream unchanged — new vectors append codes incrementally
    // without touching old index rows
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.pqCodebookOf(emb, m = 4, k = 16)
    implicit val enc: Encoder[(Long, Array[Float])] =
      Encoders.product[(Long, Array[Float])]
    val stream = MemoryStream[(Long, Array[Float])](enc, spark)
    val encoded = Similarity.pqEncodeWith(
      stream.toDF().toDF("vec_id", "embedding"), cb)
    val query = encoded.writeStream
      .format("memory").queryName("pq_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val rows = emb.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      stream.addData(b1.toSeq: _*)
      query.processAllAvailable()
      // append-only growth: first batch contributes m rows per vector
      spark.table("pq_stream").count() shouldBe b1.length * 4L
      stream.addData(b2.toSeq: _*)
      query.processAllAvailable()
      val got = spark.table("pq_stream")
        .as[(Long, Int, Int)].collect().toSet
      val want = Similarity.pqEncodeWith(emb, cb)
        .as[(Long, Int, Int)].collect().toSet
      got shouldBe want
    } finally query.stop()
  }

  test("mapGroupsWithState keeps running per-key state across batches") {
    implicit val enc: Encoder[(String, Long)] = Encoders.product[(String, Long)]
    val stream = MemoryStream[(String, Long)](enc, spark)
    val counted = stream.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          (key, total)
      }
    val query = counted.toDF("user", "total").writeStream
      .format("memory").queryName("user_totals")
      .outputMode(OutputMode.Update())
      .start()
    try {
      stream.addData(("u1", 3L), ("u2", 4L))
      query.processAllAvailable()
      stream.addData(("u1", 5L))
      query.processAllAvailable()
      val totals = spark.table("user_totals")
        .groupBy("user").agg(max("total").as("total"))
        .as[(String, Long)].collect().toMap
      totals shouldBe Map("u1" -> 8L, "u2" -> 4L)
    } finally query.stop()
  }
}
