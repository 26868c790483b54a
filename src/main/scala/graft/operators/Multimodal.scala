package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * Real JDK-built-in codecs (no external deps): PNG via
  * `javax.imageio.ImageIO` with 4×4 grid-pooled grayscale features, WAV
  * via `javax.sound.sampled.AudioSystem` with 16-window mean-|amplitude|
  * features. Only the VIDEO path remains a labeled stub (===STUB===
  * below): no video codec ships in the JDK, so frame sampling hashes
  * byte windows deterministically instead.
  *
  * Design notes for 100 TB of media:
  *  - media bytes never hit a shuffle: decode/feature-extract is a
  *    mapPartitions projection, so each task streams its split;
  *  - `binary` columns dominate row size → size splits by
  *    `spark.sql.files.maxPartitionBytes`, not row count;
  *  - codecs are pure JVM (headless-safe) and init per batch, the
  *    `mapInPandas` batching analogue;
  *  - feature vectors (small) are what flows downstream to joins/ANN.
  */
object Multimodal {

  /** Typed schema of a media row: opaque payload + metadata. */
  final case class MediaRecord(
      media_id: Long, payload: Array[Byte], mime: String,
      width: Int, height: Int, duration_ms: Long)

  /** Decoded/extracted features (fixed-length embedding + shape info). */
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Int,
      frames_sampled: Int, features: Array[Float])

  val FeatureDim = 16

  /** Deterministic synthetic media table with REAL payloads: valid PNG
    * images (deterministic RGB gradient seeded by id), valid 16-bit PCM
    * WAV clips (deterministic waveform), and opaque pseudo-random bytes
    * for video (whose decode is the one stubbed path). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3) match {
        case 0 =>
          val w = 8 + (id % 9).toInt
          val h = 8 + (id % 7).toInt
          MediaRecord(id, syntheticPng(id, w, h), "image/png", w, h, 0L)
        case 1 =>
          val nSamples = 800 + (id % 800).toInt
          MediaRecord(id, syntheticWav(id, nSamples), "audio/wav",
            0, 0, nSamples * 1000L / SampleRate)
        case _ =>
          val rnd = new scala.util.Random(id) // seeded by id: deterministic
          val payload = new Array[Byte](256 + (id % 1024).toInt)
          rnd.nextBytes(payload)
          MediaRecord(id, payload, "video/mp4",
            width = 32 + (id % 64).toInt, height = 32 + (id % 48).toInt,
            duration_ms = 1000 + id % 60000)
      }
    }
  }

  val SampleRate = 8000

  /** Deterministic PNG: RGB channels are affine functions of (x, y, id). */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 53 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV seeded by id. */
  def syntheticWav(id: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((id * 31 + i.toLong * 7) % 2000) - 1000).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    wavFromPcm(pcm)
  }

  /** Wrap little-endian 16-bit mono PCM bytes in a WAV container. */
  def wavFromPcm(pcm: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      SampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** PNG → FeatureDim grid-pooled grayscale features: the image is cut
    * into a 4×4 grid (row-major cells); each feature is the mean of
    * (r+g+b)/(3·255) over the cell's pixels (0.0 for cells an image
    * smaller than 4×4 leaves empty). Deterministic, hand-computable. */
  def pngFeatures(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Int](FeatureDim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / (3.0 * 255.0)
        val cell = (y * 4 / h) * 4 + (x * 4 / w)
        sums(cell) += gray; counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) > 0) (sums(i) / counts(i)).toFloat else 0.0f)
  }

  /** WAV → FeatureDim windowed loudness features: samples are split into
    * FeatureDim contiguous windows; each feature is the window's mean of
    * |sample|/32768. Supports 16-bit PCM (any endianness/channels the JDK
    * parser yields; synthetic clips are mono LE). */
  def wavFeatures(payload: Array[Byte]): Array[Float] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i) & 0xFF; val hi = bytes(2 * i + 1)
      val s =
        if (fmt.isBigEndian) (((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort).toInt
        else ((hi << 8) | lo).toShort.toInt
      val win = math.min(i.toLong * FeatureDim / n, FeatureDim - 1).toInt
      sums(win) += math.abs(s) / 32768.0; counts(win) += 1
      i += 1
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) > 0) (sums(i) / counts(i)).toFloat else 0.0f)
  }

  /** ===STUB=== video "decode": no video codec ships in the JDK, so
    * frame sampling hashes `frameSample` byte windows deterministically —
    * same output shape and batch mechanics as a real codec would have. */
  def videoFeaturesStub(payload: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](FeatureDim)
    var f = 0
    while (f < FeatureDim) {
      var acc = 0L
      var i = f
      while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xff); i += FeatureDim }
      feats(f) = (acc % 1000).toFloat / 1000.0f
      f += 1
    }
    feats
  }

  /** Decode one record by mime: real PNG/WAV codecs, stubbed video.
    * A payload the codec rejects yields `frames_sampled = 0` with an
    * all-zero feature vector — a flaggable row, not a job-killing
    * exception (one corrupt image in 10^9 must not abort the pass). */
  private def decodeOne(r: MediaRecord, frameSample: Int): MediaFeatures =
    try r.mime match {
      case "image/png" =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, 1, pngFeatures(r.payload))
      case "audio/wav" =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, 1, wavFeatures(r.payload))
      case _ => // ===STUB=== (video)
        MediaFeatures(r.media_id, r.mime, r.payload.length, frameSample,
          videoFeaturesStub(r.payload))
    } catch {
      case scala.util.control.NonFatal(_) =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, 0, new Array[Float](FeatureDim))
    }

  /** Batched per-partition decode/feature-extraction — the Scala analogue
    * of `mapInPandas`: each task pulls `batchSize` rows at a time so the
    * codec can amortize setup across a batch, and the media bytes never
    * leave the scan task. */
  def extractFeatures(
      media: Dataset[MediaRecord], frameSample: Int = 4,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would live here (ImageIO/AudioSystem are
        // static; a native codec would allocate its context once per batch)
        batch.iterator.map(decodeOne(_, frameSample))
      }
    }
  }

  /** Real pixel resize of a PNG payload (JDK Graphics2D, bilinear,
    * aspect-preserving cap at `maxSide`; returns the input unchanged when
    * already within bounds). Deterministic for a fixed JDK. */
  def resizePng(payload: Array[Byte], maxSide: Int): Array[Byte] =
    resizePngWithDims(payload, maxSide)._1

  /** Resize + the OUTPUT dims from the single decode (the distributed
    * path needs both; re-decoding the fresh payload just for dims would
    * double per-image codec cost, and trusting row metadata would
    * propagate stale/zero dims). */
  def resizePngWithDims(payload: Array[Byte], maxSide: Int): (Array[Byte], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "not a decodable image")
    val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
    if (scale >= 1.0) return (payload, img.getWidth, img.getHeight)
    val w = math.max(1, math.round(img.getWidth * scale).toInt)
    val h = math.max(1, math.round(img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Per-partition image resize: PNG rows are re-encoded at the capped
    * size with width/height set from the actual decode (stale metadata
    * is corrected, not propagated); non-image rows pass through
    * untouched, as does any row whose payload fails to decode — one
    * corrupt image must not kill a 100 TB job (callers detect those rows
    * by `max(width, height) > maxSide` after the pass). Bytes never
    * leave the scan task. */
  def resizeImages(media: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map {
      case r if r.mime == "image/png" =>
        try {
          val (resized, w, h) = resizePngWithDims(r.payload, maxSide)
          r.copy(payload = resized, width = w, height = h)
        } catch {
          case scala.util.control.NonFatal(_) => r // undecodable: untouched
        }
      case r => r
    })
  }

  /** Resize metadata transform (pure Catalyst — aspect-preserving target
    * dims; the pixel work lives in [[resizePng]]). */
  def planResize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)),
      lit(1.0))
    df.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
