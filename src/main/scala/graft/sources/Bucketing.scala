package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
    // repartition on the bucket key first: repartition's HashPartitioning
    // and the bucket spec share the same murmur3 `pmod` assignment, so
    // each writer task holds exactly one bucket and emits ONE file per
    // bucket (without it, every input partition × bucket pair writes its
    // own file — 32×nBuckets small files — and the multi-file buckets
    // void the sortBy metadata, forcing the downstream sort-merge join
    // to re-sort both sides; with one file per bucket the bucketed scan
    // is recognized as sorted and the join runs exchange-free AND
    // sort-free)
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
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

  /** Per-file zone map of `valueCol` — (n_rows, min_val, max_val) for
    * every parquet file of the dataset, from ONE `input_file_name()`
    * aggregate scan (the [[partitionAudit]] mechanism pointed at DATA
    * SKIPPING instead of file counts). This is exactly the metadata a
    * min/max-pruning reader consults; measuring it from the rows makes
    * the audit engine-independent. File identity is deliberately
    * dropped from the output (paths are writer-specific): the zone map
    * is the multiset of (rows, min, max) triples.
    *
    * Why it matters at 100 TB: whether a predicate scan reads 1 % or
    * 100 % of the table is decided by how well file min/max ranges
    * separate — the property [[writeSortedBy]]-style layouts buy.
    * Run this BEFORE trusting a clustered layout, and after every
    * compaction: overlapping ranges mean the sort rotted. */
  def zoneMap(spark: SparkSession, path: String,
              valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(input_file_name().as("__f"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("min_val"),
        max(col(valueCol)).as("max_val"))
      .select(col("n_rows"), col("min_val"), col("max_val"))
      .orderBy(col("min_val"), col("max_val"), col("n_rows"))
  }

  /** Data-skipping effectiveness of the layout for the predicate
    * `valueCol BETWEEN lo AND hi`: one summary row (n_files, n_rows,
    * n_files_skipped, n_rows_skipped, skip_fraction, row_skip_fraction)
    * where a file is skippable iff its [min, max] zone is disjoint
    * from [lo, hi] — the exact rule a pruning reader applies. A
    * well-clustered 100 TB table answers a selective range predicate
    * from a handful of files; skip_fraction ≈ 0 on a selective
    * predicate is the "rewrite the layout" signal. Derived from the
    * [[zoneMap]] frame (O(files) rows), so the audit costs one scan. */
  def zoneMapSkipStats(spark: SparkSession, path: String, valueCol: String,
                       lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(lo <= hi, s"zoneMapSkipStats: empty predicate range [$lo, $hi]")
    val zm = zoneMap(spark, path, valueCol)
    val skipped = col("max_val") < lit(lo) || col("min_val") > lit(hi)
    zm.agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(skipped, 1L).otherwise(0L)).as("n_files_skipped"),
        sum(when(skipped, col("n_rows")).otherwise(0L)).as("n_rows_skipped"))
      .select(col("n_files"), col("n_rows"),
        col("n_files_skipped"), col("n_rows_skipped"),
        when(col("n_files") > 0,
          round(col("n_files_skipped").cast("double") /
            col("n_files").cast("double"), 6)).as("skip_fraction"),
        when(col("n_rows") > 0,
          round(col("n_rows_skipped").cast("double") /
            col("n_rows").cast("double"), 6)).as("row_skip_fraction"))
  }

  /** Range-clustered write: global range partition + in-partition sort
    * on `sortCol` — the layout that makes [[zoneMap]] ranges disjoint
    * and range predicates prunable. `nFiles` bounds the file count
    * (one per range partition). The write-once cost that every
    * subsequent selective scan amortizes — the range-predicate sibling
    * of [[writeBucketed]]'s equi-join co-location. */
  def writeSortedBy(df: DataFrame, path: String, sortCol: String,
                    nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(nFiles > 0, "writeSortedBy: nFiles must be positive")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)
  }

  /** Morton bit-spread: the 32 low bits of `c` spaced out to even bit
    * positions of a 64-bit value — five magic-mask shift/or rounds, all
    * codegen'd integer arithmetic (no UDF, no loop). Inputs must be in
    * [0, 2³⁰) so the interleaved value stays positive (sign-extension
    * would corrupt the range sort); [[zValue]] requires it. */
  def mortonSpread(c: Column): Column = {
    import org.apache.spark.sql.functions._
    var x = c.cast("long").bitwiseAND(lit(0xffffffffL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Z-order (Morton) interleave of two non-negative int columns —
    * the MULTI-dimensional clustering key: sorting by zValue keeps
    * rows close in BOTH dimensions close on disk, so per-file min/max
    * zones stay tight on BOTH columns and a pruning reader skips on
    * either predicate. A 1-D sort buys skipping on one column and
    * destroys it on the other; Z-order splits the budget — the
    * standard answer for a 100 TB table queried by more than one key.
    * Both inputs must be in [0, 2³⁰); rescale/bucket wider domains
    * first (bit-interleaving is rank-based, so any monotone bucketing
    * preserves the property). */
  def zValue(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    mortonSpread(a).bitwiseOR(shiftleft(mortonSpread(b), 1))
  }

  /** Z-order-clustered write: range partition + sort on the Morton
    * interleave of two columns. Audit the result with [[zoneMap]] /
    * [[zoneMapSkipStats]] on EACH dimension — both should prune. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(nFiles > 0, "writeZOrdered: nFiles must be positive")
    df.withColumn("__z", zValue(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-clustered write: [[writeZOrdered]] with the Hilbert
    * d-index ([[graft.functions.SpatialExpressions.hilbertIndex]], a
    * native codegen'd expression) as the clustering key instead of
    * the Morton interleave. Hilbert's no-diagonal-jump walk keeps
    * adjacent curve positions adjacent in BOTH dimensions, so for the
    * same file count the per-file min/max boxes are tighter than
    * Morton's — measurably better [[zoneMapSkipStats]] on selective
    * 2-D predicates. Inputs are masked to [0, 2^bits) by the
    * expression; quantize wider domains first (rank-monotone
    * bucketing preserves the clustering property). */
  def writeHilbert(df: DataFrame, path: String, colA: String,
                   colB: String, bits: Int, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(nFiles > 0, "writeHilbert: nFiles must be positive")
    df.withColumn("__h", graft.functions.SpatialExpressions
        .hilbertIndex(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
