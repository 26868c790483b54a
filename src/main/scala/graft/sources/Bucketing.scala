package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins — the
  * storage-side half of the engine's shuffle discipline. A join or
  * aggregation on a bucketed key needs NO exchange: Spark's planner
  * sees both scans already hash-distributed (and, with `sortBy`,
  * sorted) on the key, so a 100 TB fact⋈fact join that would
  * otherwise move both sides becomes a zipped per-bucket merge. The
  * price is paid ONCE at write time (the bucketing write shuffles into
  * nBuckets output files per partition) and amortizes over every
  * subsequent join/groupBy on that key — the right trade for tables
  * joined repeatedly (corpus ⋈ scores, corpus ⋈ dedup verdicts,
  * snapshot ⋈ snapshot diffs). Reference analogue: none (engine
  * extension; the same play as [[graft.operators.Similarity]]'s
  * centroid-partitioned IVF storage, applied to equi-joins).
  *
  * Bucket counts must match on both sides; keep them a power of two
  * so a future re-bucket by 2× splits files instead of reshuffling.
  * BucketingSpec pins the plan: zero ShuffleExchange on the bucketed
  * join AND on a groupBy over the bucket key, and the result is
  * row-identical to the plain shuffled join.
  */
object Bucketing {

  /** Write `df` as a bucketed external parquet table (`name` in the
    * session catalog, files under `path`), hash-bucketed AND sorted by
    * `bucketCol`. Overwrites any previous table of the same name. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets=$nBuckets must be a power of two (re-bucketing headroom)")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Join two bucketed catalog tables on their bucket keys. With equal
    * bucket counts this plans as an exchange-free sort-merge join
    * (both sides scan pre-distributed, pre-sorted). */
  def colocatedJoin(spark: SparkSession, leftName: String, leftKey: String,
                    rightName: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftName)
      .join(spark.table(rightName), col(leftKey) === col(rightKey))
  }
}
