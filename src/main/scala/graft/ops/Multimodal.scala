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

/** Video decoder output: container dims + frame count + the mean luma
  * over all complete frames (in [0,1]; None when no frame decoded) +
  * the 8-segment luma envelope (per-frame mean luma bucketed into
  * eighths of the clip — [[Multimodal.decodeAudio]]'s RMS-envelope
  * shape, applied to brightness: the cheap fingerprint for
  * scene-change/clip-dedup triage before an expensive model pass). */
case class VideoFeatures(
    id: Long,
    mime: String,
    byte_len: Int,
    width: Int,
    height: Int,
    frames: Int,
    mean_luma: Option[Double],
    features: Array[Float])

/** One sampled frame: index + its mean luma in [0,1]. */
case class VideoFrame(id: Long, frame_idx: Int, frame_luma: Double)

/** Perceptual hash output: None when the blob didn't decode. */
case class ImageHash(id: Long, dhash: Option[Long])

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
  * see [[decodeAudio]]. VIDEO decode is REAL for the codec-free
  * containers a pure JVM can parse: Y4M (a text header + uncompressed
  * YUV planes — [[decodeY4m]]) and MJPEG (concatenated JPEGs ImageIO
  * already reads — [[decodeMjpeg]]), dispatched by content sniff in
  * [[decodeVideo]]: true dims, complete-frame count, mean luma, and an
  * 8-segment luma envelope, with corrupt-blob degradation (bad header
  * → width/height −1; a truncated trailing frame is simply not
  * counted). Compressed codecs (H.264 etc.) stay out of scope in this
  * container — a deployment adds a JavaCPP/FFmpeg branch beside the
  * two real parsers; nothing else changes. [[decodeBatchStub]] remains
  * only for unrecognized mimes.
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

  // ------------------------------------------------------------------
  // Video: the two codec-free containers a pure JVM parses for real.
  // ------------------------------------------------------------------

  /** Per-frame mean luma bucketed into eighths of the clip, normalized
    * to [0,1] — [[decodeAudio]]'s envelope shape for brightness. */
  private def lumaEnvelope(frameLumas: Seq[Double]): Array[Float] = {
    val f = new Array[Float](8)
    val n = frameLumas.length
    if (n > 0) {
      val sum = new Array[Double](8)
      val cnt = new Array[Long](8)
      frameLumas.zipWithIndex.foreach { case (v, i) =>
        val s = math.min(i * 8 / n, 7)
        sum(s) += v; cnt(s) += 1
      }
      var i = 0
      while (i < 8) {
        if (cnt(i) > 0) f(i) = (sum(i) / cnt(i) / 255.0).toFloat
        i += 1
      }
    }
    f
  }

  private def videoBad(m: MediaBlob): VideoFeatures =
    VideoFeatures(m.id, m.mime, m.blob.length, -1, -1, 0, None,
      new Array[Float](8))

  private def videoFromFrames(m: MediaBlob, w: Int, h: Int,
      frameLumas: Seq[Double]): VideoFeatures = {
    val mean =
      if (frameLumas.isEmpty) None
      else Some(frameLumas.sum / frameLumas.length / 255.0)
    VideoFeatures(m.id, m.mime, m.blob.length, w, h, frameLumas.length,
      mean, lumaEnvelope(frameLumas))
  }

  /** Y4M container parse: `YUV4MPEG2 W<w> H<h> …\n` then per frame
    * `FRAME[params]\n` + the raw planes (Y then chroma, sized by the
    * C colourspace tag; 8-bit 4:2:0 default). Returns (w, h, per-frame
    * mean luma in the BYTE domain 0–255) — None on a bad header. A
    * truncated trailing frame is not counted (the corrupt-blob
    * containment: at 100 TB a cut-off upload must not kill the task,
    * and the complete prefix is still good data). */
  private[ops] def y4mFrames(blob: Array[Byte])
      : Option[(Int, Int, Seq[Double])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < blob.length && blob(i) != '\n'.toByte) i += 1
      if (i < blob.length) i else -1
    }
    val hEnd = lineEnd(0)
    if (hEnd < 0) return None
    val header = new String(blob, 0, hEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!header.startsWith("YUV4MPEG2")) return None
    var w = -1; var h = -1; var cs = "420"
    header.split(' ').drop(1).foreach { p =>
      try p.headOption match {
        case Some('W') => w = p.tail.toInt
        case Some('H') => h = p.tail.toInt
        case Some('C') => cs = p.tail
        case _ => ()
      } catch { case _: NumberFormatException => return None }
    }
    if (w <= 0 || h <= 0) return None
    val ySize = w * h
    val chromaSize =
      if (cs.startsWith("420")) (w / 2) * (h / 2) * 2
      else if (cs.startsWith("422")) (w / 2) * h * 2
      else if (cs.startsWith("444")) ySize * 2
      else if (cs.startsWith("mono")) 0
      else (w / 2) * (h / 2) * 2
    val lumas = scala.collection.mutable.ArrayBuffer[Double]()
    var off = hEnd + 1
    var ok = true
    while (ok && off < blob.length) {
      val fEnd = lineEnd(off)
      val isFrame = fEnd >= off + 5 &&
        new String(blob, off, 5,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "FRAME"
      if (!isFrame) ok = false
      else {
        val dataStart = fEnd + 1
        if (dataStart + ySize + chromaSize > blob.length) ok = false
        else {
          var s = 0L
          var i = dataStart
          val yEnd = dataStart + ySize
          while (i < yEnd) { s += (blob(i) & 0xff); i += 1 }
          lumas += s.toDouble / ySize
          off = dataStart + ySize + chromaSize
        }
      }
    }
    Some((w, h, lumas.toSeq))
  }

  /** Real Y4M decode (see [[y4mFrames]]): true dims + complete-frame
    * count + mean/envelope luma; bad header → −1 dims, 0 frames. */
  private[ops] def decodeY4m(m: MediaBlob): VideoFeatures =
    try y4mFrames(m.blob) match {
      case None => videoBad(m)
      case Some((w, h, lumas)) => videoFromFrames(m, w, h, lumas)
    } catch { case scala.util.control.NonFatal(_) => videoBad(m) }

  /** Real MJPEG decode: frames are located by their SOI markers
    * (FF D8 FF) and each segment goes through ImageIO — a real JPEG
    * decode per frame. A frame's END is the first EOI (FF D9) whose
    * successor byte is end-of-blob or a new SOI — NOT the next SOI
    * occurrence anywhere: real-world JPEG frames carry EXIF-embedded
    * thumbnails whose APP1 payload contains an interior SOI *and* EOI,
    * and splitting at every SOI would inflate the frame count and skew
    * per-frame luma (the thumbnail's interior EOI is followed by more
    * APP1/TIFF payload, never a frame start, so this rule cannot
    * truncate a frame at it). Dims from the first decodable frame;
    * per-frame mean luma via the 0.299/0.587/0.114 weights
    * [[decodeImage]] uses; undecodable segments are skipped
    * (corrupt-frame containment). */
  private[ops] def decodeMjpeg(m: MediaBlob): VideoFeatures =
    try {
      val b = m.blob
      def isSoi(p: Int): Boolean =
        p + 2 < b.length && (b(p) & 0xff) == 0xff &&
          (b(p + 1) & 0xff) == 0xd8 && (b(p + 2) & 0xff) == 0xff
      // end (exclusive) of the frame starting at `from`: first EOI
      // followed by end-of-blob or a frame start; a frame with a
      // missing EOI (truncated tail) runs to the end of the blob
      def frameEnd(from: Int): Int = {
        var j = from
        while (j + 1 < b.length) {
          if ((b(j) & 0xff) == 0xff && (b(j + 1) & 0xff) == 0xd9) {
            val e = j + 2
            if (e >= b.length || isSoi(e)) return e
          }
          j += 1
        }
        b.length
      }
      val segs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var i = 0
      while (i + 2 < b.length) {
        if (isSoi(i)) {
          val end = frameEnd(i)
          segs += ((i, end))
          i = end
        } else i += 1
      }
      var w = -1; var h = -1
      val lumas = scala.collection.mutable.ArrayBuffer[Double]()
      segs.foreach { case (s0, end) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, s0, end - s0))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          if (w < 0) { w = img.getWidth; h = img.getHeight }
          var lum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              lum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          lumas += lum / (img.getWidth.toLong * img.getHeight)
        }
      }
      if (lumas.isEmpty) videoBad(m)
      else videoFromFrames(m, w, h, lumas.toSeq)
    } catch { case scala.util.control.NonFatal(_) => videoBad(m) }

  /** Video dispatch by CONTENT sniff (the mime only says `video/…`):
    * a `YUV4MPEG2` magic → Y4M, a JPEG SOI → MJPEG, anything else —
    * including every compressed codec this container cannot decode —
    * degrades to the −1-dims corrupt shape rather than failing. */
  private[ops] def decodeVideo(m: MediaBlob): VideoFeatures = {
    val b = m.blob
    if (b.length >= 9 &&
        new String(b, 0, 9,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "YUV4MPEG2")
      decodeY4m(m)
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      decodeMjpeg(m)
    else videoBad(m)
  }

  /** Typed batched decode for video blobs — [[extractFeatures]]'s
    * mapPartitions shape with the video-specific output (frame count,
    * mean luma). Same scale argument: hash-spread by id, decode
    * parallelism = partition count. */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, partitions: Int = 0): Dataset[VideoFeatures] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    media
      .repartition(parts, col("id"))
      .as[MediaBlob]
      .mapPartitions(it => it.grouped(batchSize)
        .flatMap(_.map(decodeVideo)))
  }

  /** DECODE-AWARE frame sampling for Y4M: unlike [[frameSample]]'s
    * fixed byte stride, the container's real frame boundaries (header
    * dims + colourspace) drive the stride — ≤ `maxFrames` uniformly
    * spaced REAL frames per clip, each emitted with its decoded mean
    * luma. Corrupt headers emit nothing; a truncated trailing frame is
    * not sampled. Narrow per-row work + explode, no shuffle beyond the
    * id spread. */
  def frameSampleVideo(spark: SparkSession, media: DataFrame,
      maxFrames: Int, batchSize: Int = 64,
      partitions: Int = 0): Dataset[VideoFrame] = {
    // validate on the DRIVER: maxFrames <= 0 would divide by zero
    // inside executor tasks, violating the module's never-throw
    // containment discipline
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    media
      .repartition(parts, col("id"))
      .as[MediaBlob]
      .mapPartitions(it => it.grouped(batchSize).flatMap(_.flatMap { m =>
        y4mFrames(m.blob) match {
          case None => Seq.empty[VideoFrame]
          case Some((_, _, lumas)) =>
            val n = lumas.length
            if (n == 0) Seq.empty[VideoFrame]
            else {
              val stride = (n + maxFrames - 1) / maxFrames
              (0 until n by stride).map(i =>
                VideoFrame(m.id, i, lumas(i) / 255.0))
            }
        }
      }))
  }

  /** Deterministic Y4M ENCODER (constant-luma frames, neutral chroma):
    * the write side of [[decodeY4m]], used by the round-trip specs and
    * the q239/q241 gates' fixture synthesis. Emits 8-bit C420jpeg. */
  def encodeY4m(width: Int, height: Int, frameLumas: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"C420 needs positive even dims, got ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420jpeg\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    frameLumas.foreach { v =>
      out.write("FRAME\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val y = new Array[Byte](ySize)
      java.util.Arrays.fill(y, (v & 0xff).toByte)
      out.write(y)
      val c = new Array[Byte](cSize * 2)
      java.util.Arrays.fill(c, 128.toByte)
      out.write(c)
    }
    out.toByteArray
  }

  /** Deterministic MJPEG ENCODER (constant-gray frames): concatenated
    * ImageIO-written JPEGs — the fixture synthesis for [[decodeMjpeg]]
    * (JPEG is lossy, so only dims/frame-count are exact; a constant
    * gray survives within ~1–2 luma steps). */
  def encodeMjpeg(width: Int, height: Int, frameLumas: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frameLumas.foreach { v =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = ((v & 0xff) << 16) | ((v & 0xff) << 8) | (v & 0xff)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
    }
    out.toByteArray
  }

  /** Difference hash (dHash) over a REAL image decode — the standard
    * perceptual fingerprint for image near-dup triage: the decoded
    * image is nearest-neighbor resampled to a 9×8 grayscale grid and
    * each of the 64 bits records whether the right neighbor is
    * brighter (bit `y·8+x` = lum(x+1,y) > lum(x,y)), packed into one
    * Long. Identical images hash identically regardless of container
    * bytes; small edits flip few bits, so Hamming distance ranks
    * near-duplicates. Undecodable blobs → None (corrupt containment,
    * never a thrown task). */
  private[ops] def dHash(m: MediaBlob): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.blob))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      // 9x8 nearest-neighbor luma grid
      val g = Array.ofDim[Double](8, 9)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          val rgb = img.getRGB(x * w / 9, y * h / 8)
          g(y)(x) = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      var bits = 0L
      y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y)(x + 1) > g(y)(x)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(bits)
    }
  }

  /** Batched typed dHash over a media table — the decode step of the
    * image-dedup pipeline ([[extractFeatures]]'s mapPartitions shape).
    * Downstream: group/join on `dhash` for exact perceptual dups
    * (q243), or [[dHashNearDupPairs]] for banded near-dups (q244). */
  def imageDHash(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, partitions: Int = 0): Dataset[ImageHash] = {
    import spark.implicits._
    // The decode is embarrassingly parallel and key-agnostic, so the
    // blob bytes must never pay a shuffle just to be decoded (guide
    // §2.3 — the payload-proxy rule): repartition only when the caller
    // pins a count, or when the source scan has too few splits to fill
    // the cores ([[Dedup.underSpread]]'s one-file-fixture case). When
    // spreading IS needed, hash by id rather than round-robin — the
    // keyless form pre-sorts every partition's blob rows (guide §2.5).
    val parts = spark.sessionState.conf.numShufflePartitions
    val spreadMedia =
      if (partitions > 0) media.repartition(partitions, col("id"))
      else if (Dedup.underSpread(media)) media.repartition(parts, col("id"))
      else media
    spreadMedia
      .as[MediaBlob]
      .mapPartitions(it => it.grouped(batchSize)
        .flatMap(_.map(m => ImageHash(m.id, dHash(m)))))
  }

  /** dHash NEAR-dup pairs — the [[Dedup]] LSH shape with hash bands
    * instead of minhash bands: the 64-bit hash splits into four 16-bit
    * quarters, hashes sharing ANY quarter become candidates
    * (pigeonhole: Hamming distance < 4 cannot touch all four quarters,
    * so at `maxDist` ≤ 3 the candidate set is COMPLETE, not
    * probabilistic), and candidates verify by exact Hamming distance ≤
    * `maxDist` (codegen'd `bit_count(a ^ b)`). NULL hashes
    * (undecodable blobs) never pair.
    *
    * Skew discipline (the exact workload this operator targets is the
    * one that breaks naive banding): a template farm of N
    * near-identical images shares all four quarters, and banding IDS
    * would put N rows in one bucket and self-join them into N²/2
    * candidate rows. So (1) EXACT-equal hashes never enter the banding
    * at all — they pair through one equality join on the full 64-bit
    * key (q243's shape, uniform by construction), which collapses an
    * identical farm to a single banded row; and (2) the banding runs
    * over DISTINCT hashes only, with [[Dedup.candidatePairs]]'s
    * `maxBucket` cap on the DISTINCT hashes a quarter bucket may hold
    * — default 4096, a finite ceiling (≤ 8M candidate rows per
    * degenerate bucket) for corpora where distinct-but-clustered
    * hashes pile into one quarter (near-solid-color storms: the
    * exact-equal pre-collapse can't help when the hashes differ by a
    * few bits). Buckets above the cap contribute no banded candidates
    * — a recall cap, stated, never an OOM; pass `Int.MaxValue` to
    * uncap when completeness at maxDist ≤ 3 must be absolute.
    * Scale shape: one keyed shuffle on (band, quarter) — 4 rows
    * per DISTINCT hash — then a parameter-bounded verify join and two
    * id-expansion joins. Note the OUTPUT itself is quadratic in farm
    * size (an N-identical farm genuinely has N²/2 dup pairs); the
    * discipline bounds the intermediate state, not the true answer. */
  def dHashNearDupPairs(hashes: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"banded candidates are complete only for maxDist <= 3, got $maxDist")
    require(maxBucket > 0, s"maxBucket must be positive, got $maxBucket")
    val h = hashes.filter(col("dhash").isNotNull)
      .select(col("id"), col("dhash"))
    // exact-equal pairs: equality self-join on the full hash
    val exact = h.select(col("id").as("id_a"), col("dhash"))
      .join(h.select(col("id").as("id_b"), col("dhash")), Seq("dhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // near pairs: band the DISTINCT hashes
    val dh = h.select(col("dhash")).distinct()
    val bands = (0 until 4).map { b =>
      dh.select(col("dhash"), lit(b).as("band"),
        shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL))
          .as("bkey"))
    }.reduce(_ unionByName _)
    val capped =
      if (maxBucket == Int.MaxValue) bands
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bkey"))
        bands.withColumn("__bucket_n", count(lit(1)).over(w))
          .filter(col("__bucket_n") <= maxBucket)
          .drop("__bucket_n")
      }
    val a = capped.select(col("dhash").as("__da"), col("band"), col("bkey"))
    val b2 = capped.select(col("dhash").as("__db"), col("band"), col("bkey"))
    val candH = a.join(b2, Seq("band", "bkey"))
      .filter(col("__da") < col("__db"))
      .select(col("__da"), col("__db")).distinct()
      .filter(expr(s"bit_count(__da ^ __db) <= $maxDist"))
    val near = candH
      .join(h.select(col("id").as("id_a"), col("dhash").as("__da")),
        Seq("__da"))
      .join(h.select(col("id").as("id_b"), col("dhash").as("__db")),
        Seq("__db"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    exact.unionByName(near).distinct()
  }

  // ------------------------------------------------------------------
  // Incremental image dedup: the dHash quarter banding PERSISTED — the
  // [[DedupIndex]] deployment shape (a small daily batch of new images
  // probed against an enormous resident corpus, resident side
  // shuffle-free) with perceptual-hash quarters as the band keys and
  // the 64-bit hash riding beside them as payload, so the probe's
  // Hamming verify needs no second lookup. All storage/lifecycle
  // machinery (bucketed+sorted layout, tombstone deletes, compact /
  // rebucket generation rewrites) is DedupIndex's, key-agnostic.
  // ------------------------------------------------------------------

  /** The persisted rows for one image hash: 4 × (id, dhash, bk) with
    * bk = `q<band>:<16-bit quarter hex>` — one row per quarter, NULL
    * hashes (undecodable blobs) never indexed. */
  def dHashBandKeys(hashes: DataFrame): DataFrame = {
    val h = hashes.filter(col("dhash").isNotNull)
      .select(col("id"), col("dhash"))
    (0 until 4).map { b =>
      h.select(col("id"), col("dhash"),
        concat(lit(s"q$b:"), lower(hex(
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL)))))
          .as("bk"))
    }.reduce(_ unionByName _)
  }

  private val DHashIndexParams = Map("scheme" -> "dhash16")

  /** Persist `hashes` (id, dhash — [[imageDHash]]'s output) as the
    * resident image-dedup index. */
  def writeDHashIndex(hashes: DataFrame, path: String, table: String,
      buckets: Int = 32): Unit =
    DedupIndex.writeKeys(dHashBandKeys(hashes), path, table, buckets,
      DHashIndexParams)

  /** Absorb a day's new image hashes into the resident index —
    * [[DedupIndex.absorb]]'s contract (append into the buckets,
    * resident files untouched). */
  def absorbDHashIndex(hashes: DataFrame, path: String, table: String,
      buckets: Int = 32): Unit =
    DedupIndex.absorbKeys(dHashBandKeys(hashes), path, table, buckets,
      DHashIndexParams)

  /** Near-dup pairs between a probe batch's hashes and the resident
    * index: quarter-key candidates (pigeonhole-COMPLETE at `maxDist` ≤
    * 3 — [[dHashNearDupPairs]]' argument, cross-corpus edition; exact
    * duplicates pass at Hamming 0 through the same verify), Hamming-
    * verified against the payload hash the index stores beside each
    * quarter. Only the batch's quarters are computed and shuffled;
    * the resident side streams from its co-located buckets with
    * tombstoned ids excluded ([[DedupIndex.delete]] owns forgetting).
    * Output: (new_id, resident_id), distinct. */
  def probeDHashIndex(spark: SparkSession, table: String,
      hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"banded candidates are complete only for maxDist <= 3, got $maxDist")
    DedupIndex.checkProps(spark, table, DHashIndexParams.toSeq: _*)
    val probe = dHashBandKeys(hashes)
      .select(col("id").as("new_id"), col("dhash").as("__da"), col("bk"))
    // Hamming-verify BEFORE the distinct (guide §2.3): the verify is a
    // codegen'd per-row filter, so running it first means the dedupe
    // exchange carries only the pairs that survived — two id columns
    // instead of ids plus both 64-bit hashes (an id's hash is
    // functionally determined, so the narrower distinct key is the
    // same pair set).
    DedupIndex.probeKeys(spark, table, probe)
      .filter(col("id") =!= col("new_id"))
      .filter(expr(s"bit_count(__da ^ dhash) <= $maxDist"))
      .select(col("new_id"), col("id").as("resident_id"))
      .distinct()
  }

  /** Maintain the image index from a STREAM of (id, dhash) rows —
    * [[DedupIndex.maintainStream]]'s shape: band keys are a
    * deterministic function of the hash, so a crash-replayed batch
    * appends identical rows that every probe's distinct collapses and
    * the next [[DedupIndex.compact]] purges. */
  def maintainDHashStream(stream: DataFrame, path: String, table: String,
      checkpoint: String,
      buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        absorbDHashIndex(batch, path, table, buckets)
      }
      .start()

  /** Batch dispatch: real ImageIO decode for `image/…`, real
    * javax.sound decode for `audio/…`, real container parse for
    * `video/…` (Y4M / MJPEG — adapted into the MediaFeatures shape:
    * true dims + the luma envelope), stub for the rest. */
  private def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaFeatures] =
    batch.map { m =>
      if (m.mime.startsWith("image/")) decodeImage(m)
      else if (m.mime.startsWith("audio/")) decodeAudio(m)
      else if (m.mime.startsWith("video/")) {
        val v = decodeVideo(m)
        MediaFeatures(v.id, v.mime, v.byte_len, v.width, v.height,
          v.features)
      }
      else decodeBatchStub(Seq(m)).head
    }

  /** STUB decoder for unrecognized mimes — deterministic fake
    * byte-derived features (q42 gates the plumbing through it). Image,
    * audio, and video mimes never reach it. */
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
