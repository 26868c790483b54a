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
  * features, and VIDEO as MJPEG-in-AVI — a hand-rolled RIFF chunk walk
  * (the container is just length-prefixed fourcc chunks) yielding JPEG
  * frames that ImageIO decodes; features are the frame-averaged grid
  * pool over `frameSample` evenly-spaced frames. Payloads in codecs the
  * JDK cannot decode (e.g. H.264 mp4) surface as `frames_sampled = 0`
  * flag rows rather than fakes or failures.
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
    * WAV clips (deterministic waveform), and valid MJPEG-AVI clips
    * (4–6 deterministic gradient frames in a RIFF container). */
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
          val w = 16 + (id % 4).toInt * 4
          val h = 12 + (id % 3).toInt * 4
          val nFrames = 4 + (id % 3).toInt
          MediaRecord(id, syntheticAviMjpeg(id, w, h, nFrames),
            "video/x-msvideo", w, h, nFrames * 1000L / VideoFps)
      }
    }
  }

  val VideoFps = 4

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
    gridPool(img)
  }

  /** 4×4 grid-pooled grayscale of one decoded frame (shared by the PNG
    * and AVI paths). */
  private def gridPool(img: java.awt.image.BufferedImage): Array[Float] = {
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

  // ---------- MJPEG-AVI video codec (pure JDK: RIFF walk + ImageIO) ----------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal structurally-valid MJPEG AVI: RIFF('AVI ') with an hdrl
    * LIST (avih + one 'vids'/'MJPG' stream) and a movi LIST of '00dc'
    * JPEG chunks (even-padded per RIFF). Enough container for any
    * MJPEG-aware reader, including [[aviMjpegFrames]]. */
  def aviFromJpegFrames(frames: Seq[Array[Byte]], w: Int, h: Int,
                        fps: Int = VideoFps): Array[Byte] = {
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc(cc) ++ le32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(listType) ++ body)
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = chunk("avih", le32(1000000 / fps) ++ le32(maxFrame * fps) ++
      le32(0) ++ le32(0) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++
      le32(maxFrame) ++ le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le32(0) ++ le32((h << 16) | w))
    val strf = chunk("strf", le32(40) ++ le32(w) ++ le32(h) ++
      le32((24 << 16) | 1) ++ fourcc("MJPG") ++ le32(w * h * 3) ++
      Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Deterministic MJPEG AVI seeded by id: `nFrames` gradient frames
    * whose intensity shifts per frame (JPEG-encoded via ImageIO). */
  def syntheticAviMjpeg(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + f * 40 + x * 3 + y * 5) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    aviFromJpegFrames(frames, w, h)
  }

  /** RIFF chunk walk → MJPEG frame payloads: finds the 'movi' LIST and
    * returns every video-data chunk ('##dc'/'##db') inside it. Truncated
    * or malformed chunk lengths end the walk (partial result) rather
    * than throwing — a corrupt tail must not kill the batch. */
  def aviMjpegFrames(payload: Array[Byte]): Vector[Array[Byte]] = {
    def cc(off: Int): String =
      if (off + 4 <= payload.length)
        new String(payload, off, 4, "US-ASCII") else ""
    def sz(off: Int): Int =
      (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8) |
        ((payload(off + 2) & 0xFF) << 16) | ((payload(off + 3) & 0xFF) << 24)
    if (payload.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
      return Vector.empty
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, end: Int, inMovi: Boolean): Unit = {
      var p = from
      while (p >= 0 && p + 8 <= end) {
        val id = cc(p); val len = sz(p + 4)
        val dataStart = p + 8
        val dataEnd = dataStart.toLong + len // Long: a hostile len can't wrap
        if (len < 0) return // malformed: stop
        if (id == "LIST" && len >= 4 && dataStart + 4 <= end) {
          // a LIST truncated by a cut payload still yields its intact
          // prefix; 'rec ' (and any other) grouping LISTs inside movi
          // keep the movi context — interleaved AVIs nest frames there
          val listType = cc(dataStart)
          walk(dataStart + 4, math.min(dataEnd, end).toInt,
            inMovi = inMovi || listType == "movi")
        } else if (dataEnd > end) {
          return // truncated data chunk: drop it, keep what came before
        } else if (inMovi && id.length == 4 &&
            id.charAt(2) == 'd' && (id.charAt(3) == 'c' || id.charAt(3) == 'b')) {
          frames += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd.toInt)
        }
        val next = dataEnd + (len & 1) // chunks are even-padded
        if (next > end) return
        p = next.toInt
      }
    }
    walk(12, payload.length, inMovi = false)
    frames.result()
  }

  /** AVI → (frames decoded, frame-averaged grid-pool features): sample
    * `frameSample` evenly-spaced frames (all of them when the clip is
    * shorter), JPEG-decode each with ImageIO, average their 4×4 pooled
    * grayscale grids. Undecodable individual frames are skipped and not
    * counted. */
  def aviFeatures(payload: Array[Byte], frameSample: Int): (Int, Array[Float]) = {
    val frames = aviMjpegFrames(payload)
    if (frames.isEmpty) return (0, new Array[Float](FeatureDim))
    val take = math.min(frameSample, frames.length)
    val idxs = (0 until take).map(k => k.toLong * frames.length / take)
    val sums = new Array[Double](FeatureDim)
    var decoded = 0
    idxs.foreach { i =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(frames(i.toInt)))
      if (img != null) {
        val g = gridPool(img)
        var c = 0
        while (c < FeatureDim) { sums(c) += g(c); c += 1 }
        decoded += 1
      }
    }
    if (decoded == 0) (0, new Array[Float](FeatureDim))
    else (decoded, Array.tabulate(FeatureDim)(i => (sums(i) / decoded).toFloat))
  }

  /** Decode one record by mime: real PNG/WAV/MJPEG-AVI codecs. A payload
    * the codec rejects — or a mime with no JDK codec (e.g. H.264 mp4) —
    * yields `frames_sampled = 0` with an all-zero feature vector: a
    * flaggable row, not a job-killing exception (one corrupt file in
    * 10^9 must not abort the pass). */
  private def decodeOne(r: MediaRecord, frameSample: Int): MediaFeatures =
    try r.mime match {
      case "image/png" =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, 1, pngFeatures(r.payload))
      case "audio/wav" =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, 1, wavFeatures(r.payload))
      case "video/x-msvideo" | "video/avi" =>
        val (n, feats) = aviFeatures(r.payload, frameSample)
        MediaFeatures(r.media_id, r.mime, r.payload.length, n, feats)
      case _ => // no codec for this mime: flag row
        MediaFeatures(r.media_id, r.mime, r.payload.length, 0, new Array[Float](FeatureDim))
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

  // ------------------------------------------------ perceptual image dedup

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual near-dup signature: area-average the pixels down to a
    * 9×8 grayscale grid, set bit (y·8 + x) iff cell (x,y) is brighter
    * than its right neighbor. Byte-level hashing misses re-encoded /
    * resized copies; dHash survives both (gradients are scale-stable),
    * and Hamming distance between dHashes is a visual-similarity
    * metric — which plugs straight into [[Dedup.hammingNearDuplicates]],
    * the same banded join the text SimHash path uses. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](9 * 8)
    val counts = new Array[Int](9 * 8)
    var y = 0
    while (y < h) {
      val gy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val gx = math.min(x * 9 / w, 8)
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
        sums(gy * 9 + gx) += gray; counts(gy * 9 + gx) += 1
        x += 1
      }
      y += 1
    }
    def cell(gx: Int, gy: Int): Double = {
      val i = gy * 9 + gx
      if (counts(i) > 0) sums(i) / counts(i) else 0.0
    }
    var sig = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (cell(gx, gy) > cell(gx + 1, gy)) sig |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    sig
  }

  /** dHash of an encoded image payload; None when undecodable (the
    * flag-row convention — never a fake hash). */
  def imageDHash(payload: Array[Byte]): Option[Long] = {
    val img = try javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map(dHash64)
  }

  /** (media_id, dhash) for every visual row — PNG stills and the FIRST
    * frame of MJPEG-AVI clips (title-card dedup; full-clip dedup would
    * hash sampled frames the same way). Batched mapPartitions like
    * [[extractFeatures]]: bytes never shuffle, only 16-byte signature
    * rows flow into the banded near-dup join. Undecodable/non-visual
    * rows are absent from the output (countable by anti-join — no
    * silent drops at the operator boundary). */
  def imageDHashes(media: Dataset[MediaRecord],
                   batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val hash = r.mime match {
            case "image/png" => imageDHash(r.payload)
            case "video/x-msvideo" | "video/avi" =>
              aviMjpegFrames(r.payload).headOption.flatMap(imageDHash)
            case _ => None
          }
          hash.map(h => (r.media_id, h))
        }
      }
    }.toDF("media_id", "dhash")
  }

  /** Noisy deterministic PNG (hash-mixed pixels, NOT the affine gradient
    * of [[syntheticPng]] — gradients of different ids share neighbor
    * ORDERINGS, so every gradient image dHashes identically; dedup
    * exercises need images whose signatures actually differ). */
  def syntheticNoisyPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = id * 6364136223846793005L + x * 1442695040888963407L + y * 2862933555777941757L
        v ^= (v >>> 33); v *= 0xFF51AFD7ED558CCDL; v ^= (v >>> 33)
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Magic-byte content sniffing vs the declared MIME — the multimodal
    * ingest-trust check: a crawl's Content-Type header lies constantly
    * (JPEGs served as image/png, HTML error pages as audio/wav), and a
    * codec fed the wrong container wastes a decode attempt per row at
    * best. Sniffs the REAL type from leading magic bytes (PNG, JPEG,
    * GIF, RIFF with WAVE/AVI subtype, PDF, ZIP) and flags rows whose
    * declared type disagrees. Returns (idCol, declared, sniffed,
    * mismatch); mismatch is NULL when no type was declared (nothing to
    * disagree with).
    *
    * Scale shape: a pure codegen'd projection on `hex()` prefixes of
    * the binary column — zero shuffles, zero decode, zero UDFs; both
    * engines uppercase hex identically, so the oracle replays the
    * sniff byte for byte. Run it BEFORE [[extractFeatures]] so the
    * decode tier only sees containers it can open. */
  def magicSniff(df: DataFrame, idCol: String, binCol: String,
                 declaredCol: String): DataFrame = {
    val hx = hex(col(binCol))
    val riffSub = substring(hx, 17, 8) // bytes 9-12: the RIFF subtype
    val sniffed =
      when(col(binCol).isNull, lit(null).cast("string"))
        .when(substring(hx, 1, 8) === "89504E47", "image/png")
        .when(substring(hx, 1, 6) === "FFD8FF", "image/jpeg")
        .when(substring(hx, 1, 8) === "47494638", "image/gif")
        .when(substring(hx, 1, 8) === "52494646" &&
          riffSub === "57415645", "audio/wav")
        .when(substring(hx, 1, 8) === "52494646" &&
          riffSub === "41564920", "video/avi")
        .when(substring(hx, 1, 8) === "52494646", "riff/unknown")
        .when(substring(hx, 1, 8) === "25504446", "application/pdf")
        .when(substring(hx, 1, 8) === "504B0304", "application/zip")
        .otherwise("unknown")
    df.select(col(idCol), col(declaredCol).as("declared"),
        sniffed.as("sniffed"))
      .withColumn("mismatch",
        when(col("declared").isNotNull,
          col("declared") =!= col("sniffed")))
  }
}
