package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration,
  * output shape — is real and tested; the actual codec call is STUBBED
  * (===STUB=== below) behind a deterministic fake because no image/audio
  * libraries ship in this container. Swapping in a real decoder changes
  * only the body of `decodeOne`.
  *
  * Design notes for 100 TB of media:
  *  - media bytes never hit a shuffle: decode/feature-extract is a
  *    mapPartitions projection, so each task streams its split;
  *  - `binary` columns dominate row size → size splits by
  *    `spark.sql.files.maxPartitionBytes`, not row count;
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

  /** Deterministic synthetic media table: payload bytes derived from the
    * id (hash-expanded), mimes cycled — enough to exercise the plumbing. */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    val mimes = Seq("image/png", "audio/wav", "video/mp4")
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(id) // seeded by id: deterministic
      val size = 256 + (id % 1024).toInt
      val payload = new Array[Byte](size)
      rnd.nextBytes(payload)
      MediaRecord(id, payload, mimes((id % 3).toInt),
        width = 32 + (id % 64).toInt, height = 32 + (id % 48).toInt,
        duration_ms = if (id % 3 == 2) 1000 + id % 60000 else 0)
    }
  }

  /** ===STUB=== codec: a real implementation would decode `payload` with
    * an image/audio library and pool pixels/samples into `features`.
    * This deterministic fake hashes byte windows instead — same shape,
    * same batch mechanics, zero external deps. */
  private def decodeOne(r: MediaRecord, frameSample: Int): MediaFeatures = {
    val nFrames = if (r.mime.startsWith("video")) frameSample else 1
    val feats = new Array[Float](FeatureDim)
    var f = 0
    while (f < FeatureDim) {
      // window-pooled byte "feature" — stands in for pooled pixels
      var acc = 0L
      var i = f
      while (i < r.payload.length) { acc = acc * 31 + (r.payload(i) & 0xff); i += FeatureDim }
      feats(f) = ((acc % 1000).toFloat / 1000.0f)
      f += 1
    }
    MediaFeatures(r.media_id, r.mime, r.payload.length, nFrames, feats)
  }

  /** Batched per-partition decode/feature-extraction — the Scala analogue
    * of `mapInPandas`: each task pulls `batchSize` rows at a time so the
    * (stub) codec can amortize setup across a batch, and the media bytes
    * never leave the scan task. */
  def extractFeatures(
      media: Dataset[MediaRecord], frameSample: Int = 4,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would init once per batch here (===STUB===)
        batch.iterator.map(decodeOne(_, frameSample))
      }
    }
  }

  /** Resize metadata transform (pure Catalyst — aspect-preserving target
    * dims; the pixel work would live in the stubbed codec). */
  def planResize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)),
      lit(1.0))
    df.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
