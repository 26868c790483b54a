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

  /** Write `df` hive-partitioned by `partCol` (one file per partition
    * value: the hash repartition on the key routes each value to one
    * task, and the partitioned writer splits per value within it). The
    * physical-layout half of the storage tier next to [[writeBucketed]]:
    * partition pruning needs the directories, and the AUDIT below needs
    * a layout to audit. */
  def writePartitionedBy(df: DataFrame, path: String,
                         partCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)
  }

  /** Physical-layout audit of a partitioned parquet dataset: rows and
    * FILE COUNT per partition directory — the small-files / skewed-
    * partition check that decides compaction before a 100 TB table
    * rots (10⁶ tiny files cost more in listing + task overhead than
    * the data; one 500 GB partition starves its readers). Derived from
    * `input_file_name()` inside one aggregate scan — no filesystem
    * walk on the driver, so it parallelizes with the read itself. */
  def partitionAudit(spark: SparkSession, path: String,
                     partCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .select(regexp_extract(input_file_name(),
        java.util.regex.Pattern.quote(partCol) + "=([^/]+)", 1).as("part"),
        input_file_name().as("__f"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("__f")).as("n_files"))
      .orderBy(col("part"))
  }
}
