package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. The engine treats
  * image/audio/video as `binary` columns; decode/feature-extraction is a
  * per-partition batch transform. */
case class MediaBlob(id: Long, mime: String, blob: Array[Byte])

/** Decoder output: dimensions + a fixed-width feature vector. */
case class MediaFeatures(
    id: Long,
    mime: String,
    byte_len: Int,
    width: Int,
    height: Int,
    features: Array[Float])

/** Multimodal-column plumbing for training-data pipelines.
  *
  * The Spark-side mechanics are real and tested: schema (`binary` +
  * typed metadata), hash-partitioning by id so blobs spread evenly,
  * batched per-partition iteration (the JVM equivalent of
  * `mapInPandas`-style batch decode — the decoder sees `batchSize`
  * blobs at a time, amortizing model/codec setup), and a typed
  * `Dataset[MediaFeatures]` result.
  *
  * The DECODE ITSELF IS A STUB: this container has no image/audio
  * codecs, so [[decodeBatchStub]] derives deterministic fake
  * dimensions/features from the bytes. A real deployment replaces that
  * one function with JavaCPP/FFmpeg/ImageIO calls — nothing else
  * changes.
  */
object Multimodal {

  /** Adapt the documents table into a media table: utf-8 bytes as the
    * blob, mime derived from the source column. Stands in for reading a
    * real `binary` parquet column. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      concat(lit("application/x-src-"), col("source")).as("mime"),
      col("text").cast("binary").as("blob"))

  /** STUB decoder — deterministic fake. Real impl: decode image/audio,
    * measure dimensions, run a feature extractor over the batch. */
  private def decodeBatchStub(batch: Seq[MediaBlob]): Seq[MediaFeatures] =
    batch.map { m =>
      val len = m.blob.length
      val features = (0 until 8).map { i =>
        if (len == 0) 0f else (m.blob(i % len) & 0xff) / 255.0f
      }.toArray
      MediaFeatures(m.id, m.mime, len,
        width = 64 + (len % 64), height = 64 + (len % 48), features)
    }

  /** Batched per-partition decode. `repartition(id)` spreads blobs by
    * key (at 100 TB: no partition holds more than its hash share, and
    * decode parallelism = partition count, sized by the caller). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    media
      .repartition(parts, col("id"))
      .as[MediaBlob]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatchStub))
  }

  /** Uniform FRAME SAMPLING over the raw byte stream — the video-style
    * "take k frames spread across the clip" primitive, done entirely
    * with codegen'd expressions (byte slicing is byte math; only
    * INTERPRETING a frame needs a codec). The blob is cut into
    * `frameBytes` chunks; `ceil(nFrames / maxFrames)` strides pick ≤
    * `maxFrames` uniformly-spaced chunks. Output one row per sampled
    * frame: `(id, frame_idx, frame_off, frame_len, frame_hash)` — the
    * hash stands in for handing the frame bytes to a decoder.
    * Scale shape: narrow per-row transform + explode, no shuffle. */
  def frameSample(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val len = length(col("blob")).cast("long") // bytes (BinaryType)
    media
      .select(col("id"), col("blob"),
        ((len + (frameBytes - 1)) / frameBytes).cast("long").as("nf"))
      .withColumn("stride",
        ((col("nf") + (maxFrames - 1)) / maxFrames).cast("long"))
      .withColumn("frame_idx",
        explode(when(col("nf") > 0,
          sequence(lit(0L), col("nf") - 1, col("stride")))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_off"),
        expr(s"CAST(length(substring(blob, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)) AS BIGINT)")
          .as("frame_len"),
        expr(s"md5(substring(blob, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes))")
          .as("frame_hash"))
  }

  /** Resized thumbnail: id + target dims + pixel bytes. */
  case class MediaThumb(id: Long, width: Int, height: Int, thumb: Array[Byte])

  /** RESIZE plumbing: nearest-neighbor resampling of the byte stream to
    * a `w×h` grid — the resampling arithmetic is real; only the
    * interpretation of the source bytes as pixels is the stub (a real
    * deployment decodes first, then resamples). A pure per-row map: no
    * shuffle, no batching needed (unlike [[extractFeatures]], whose
    * decoder amortizes setup across a batch). Null blobs (null source
    * text) resample to the zero grid, matching [[frameSample]]'s
    * zero-rows treatment of empty input. */
  def resizeStub(spark: SparkSession, media: DataFrame, w: Int, h: Int)
      : Dataset[MediaThumb] = {
    import spark.implicits._
    media.as[MediaBlob].map { m =>
      val n = w * h
      val out = new Array[Byte](n)
      if (m.blob != null && m.blob.nonEmpty) {
        var i = 0
        while (i < n) {
          out(i) = m.blob((i.toLong * m.blob.length / n).toInt)
          i += 1
        }
      }
      MediaThumb(m.id, w, h, out)
    }
  }
}
