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
  * IMAGE decode is REAL: `image/…` mimes go through
  * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP readers ship in the JDK),
  * producing true dimensions and an 8-dim color-statistics feature
  * vector — see [[decodeImage]]. AUDIO decode is REAL for the formats
  * the JDK ships (PCM WAV/AIFF/AU via `javax.sound.sampled`): true
  * sample rate / channel count and an 8-segment RMS energy envelope —
  * see [[decodeAudio]]. Only VIDEO decode remains a stub
  * ([[decodeBatchStub]]: deterministic fake dimensions/features from
  * the bytes) because this container has no video codecs; a real
  * deployment replaces that one function with JavaCPP/FFmpeg calls —
  * nothing else changes.
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

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP).
    * Output: true pixel dimensions + an 8-dim feature vector of color
    * statistics in [0,1] — mean R/G/B/luma over all pixels, plus the
    * mean luma of each 2×2 spatial quadrant (a tiny spatial signature,
    * deterministic for a given image). Undecodable `image/…` bytes
    * (truncated file, unsupported subformat) yield `width = height = -1`
    * and zero features rather than poisoning the batch — at 100 TB some
    * corrupt blobs are a certainty and one bad file must not kill a
    * 10^6-row partition task. */
  private[ops] def decodeImage(m: MediaBlob): MediaFeatures = {
    // NonFatal, not just IOException: ImageIO readers throw
    // RuntimeExceptions on malformed input (IllegalArgument, CMM,
    // index-out-of-bounds in the JPEG/BMP readers) — same containment
    // as decodeAudio
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.blob))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null)
      MediaFeatures(m.id, m.mime, m.blob.length, -1, -1, new Array[Float](8))
    else {
      val w = img.getWidth
      val h = img.getHeight
      var r = 0.0; var g = 0.0; var b = 0.0
      val quadLuma = new Array[Double](4)
      val quadN = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val pr = (rgb >> 16) & 0xff; val pg = (rgb >> 8) & 0xff; val pb = rgb & 0xff
          r += pr; g += pg; b += pb
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quadLuma(q) += 0.299 * pr + 0.587 * pg + 0.114 * pb
          quadN(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val features = Array(
        (r / n / 255.0).toFloat, (g / n / 255.0).toFloat, (b / n / 255.0).toFloat,
        ((0.299 * r + 0.587 * g + 0.114 * b) / n / 255.0).toFloat,
        (if (quadN(0) == 0) 0.0 else quadLuma(0) / quadN(0) / 255.0).toFloat,
        (if (quadN(1) == 0) 0.0 else quadLuma(1) / quadN(1) / 255.0).toFloat,
        (if (quadN(2) == 0) 0.0 else quadLuma(2) / quadN(2) / 255.0).toFloat,
        (if (quadN(3) == 0) 0.0 else quadLuma(3) / quadN(3) / 255.0).toFloat)
      MediaFeatures(m.id, m.mime, m.blob.length, w, h, features)
    }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (PCM
    * WAV/AIFF/AU readers ship in the JDK — no external codec needed).
    * Field mapping for audio: `width` = sample rate in Hz, `height` =
    * channel count; `features` = the 8-segment RMS energy envelope
    * (root-mean-square amplitude of each eighth of the clip, normalized
    * to [0,1]) — the standard cheap fingerprint for silence trimming /
    * clip dedup before an expensive model pass. Undecodable bytes yield
    * `width = height = -1` and zero features (same corrupt-blob
    * containment as [[decodeImage]]). Only 8/16-bit PCM is read here;
    * other encodings report format metadata with a zero envelope. */
  private[ops] def decodeAudio(m: MediaBlob): MediaFeatures = {
    import javax.sound.sampled.AudioSystem
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(m.blob))
      catch { case _: Exception => null }
    if (in == null)
      MediaFeatures(m.id, m.mime, m.blob.length, -1, -1, new Array[Float](8))
    else {
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      in.close()
      val bps = fmt.getSampleSizeInBits
      val frameSz = fmt.getFrameSize
      val nFrames = if (frameSz > 0) bytes.length / frameSz else 0
      val features = new Array[Float](8)
      if (nFrames > 0 && (bps == 8 || bps == 16)) {
        val sumSq = new Array[Double](8)
        val cnt = new Array[Long](8)
        var f = 0
        while (f < nFrames) {
          val seg = math.min((f * 8L / nFrames).toInt, 7)
          // first channel only: the envelope is a fingerprint, not a mix
          val off = f * frameSz
          val s =
            if (bps == 8) ((bytes(off) & 0xff) - 128) / 128.0
            else {
              val s16 =
                if (fmt.isBigEndian) ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
                else ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              s16 / 32768.0
            }
          sumSq(seg) += s * s
          cnt(seg) += 1
          f += 1
        }
        var i = 0
        while (i < 8) {
          if (cnt(i) > 0) features(i) = math.sqrt(sumSq(i) / cnt(i)).toFloat
          i += 1
        }
      }
      MediaFeatures(m.id, m.mime, m.blob.length,
        fmt.getSampleRate.toInt, fmt.getChannels, features)
    }
  }

  /** Batch dispatch: real ImageIO decode for `image/…`, real
    * javax.sound decode for `audio/…`, stub for the rest (video — no
    * codecs in this container). */
  private def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] =
    batch.map { m =>
      if (m.mime.startsWith("image/")) decodeImage(m)
      else if (m.mime.startsWith("audio/")) decodeAudio(m)
      else decodeBatchStub(Seq(m)).head
    }

  /** STUB decoder for audio/video mimes — deterministic fake. Real
    * impl: decode, measure dimensions, run a feature extractor over the
    * batch. */
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
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
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
