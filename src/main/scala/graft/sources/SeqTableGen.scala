package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generator for the primary engine input
  * (BASELINE.json input_hint): a table of pre-tokenized training
  * sequences (doc_id string, tokens array<int>, n_tok int, source string)
  * with seeded violations at known ids (FIXTURES.md §3).
  *
  * Fully distributed and reproducible: built from `spark.range(n)` with
  * hash-derived pseudo-randomness (xxhash64 of the row id + a fixed
  * seed) — no driver-side data, no RNG state, identical output for a
  * given (n, seed) at any parallelism. Scales to any n the cluster can
  * hold; nothing is collected.
  *
  * Violation seeding (deterministic by id arithmetic, k = n/1000 min 10):
  *  - ids ≡ 0 (mod 997)  → blank doc_id            (R_NONNULL_DOCID)
  *  - ids ≡ 1 (mod 997)  → malformed doc_id         (R_REGEX_DOCID)
  *  - ids ≡ 2 (mod 997)  → n_tok off by one         (R_NTOK_EQ_SIZE)
  *  - ids ≡ 3 (mod 997)  → first token = vocab+7    (R_TOKEN_RANGE)
  *  - ids ≡ 4 (mod 997)  → source = "scraped"      (R_ENUM_SOURCE)
  *  - ids ≡ 5 (mod 4991) → doc_id of id-1 (duplicate); plus id 42 is a
  *    hot key duplicated by every id ≡ 6 (mod 4991) — the skew case for
  *    the salted uniqueness aggregate (R_UNIQUE_DOCID)
  */
object SeqTableGen {
  val Vocab = 50000
  val Sources: Seq[String] = Seq("web", "books", "code", "wiki")
  /** Referential allowlist intentionally missing "wiki": rows with
    * source == "wiki" are enum-valid but referentially orphaned
    * (R_REF_SOURCE ≠ R_ENUM_SOURCE — FIXTURES.md §3). */
  val RefAllowlist: Seq[String] = Seq("web", "books", "code")

  def docId(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    format_string("doc_%012d", idCol)

  /** Generate `n` rows with seeded violations; `numPartitions` controls
    * the physical layout (default: session parallelism). */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               numPartitions: Int = 0, withViolations: Boolean = true): DataFrame = {
    val base = if (numPartitions > 0) spark.range(0, n, 1, numPartitions) else spark.range(n)
    val id = col("id")
    val h = (salt: Int) => abs(xxhash64(id, lit(seed), lit(salt)))

    // length 8..263 tokens, deterministic per row
    val len = (h(1) % 256 + 8).cast("int")
    val tokensClean = transform(sequence(lit(0), len - 1),
      i => abs(xxhash64(id, i, lit(seed))).mod(Vocab).cast("int"))
    val sourceClean = element_at(
      array(Sources.map(lit): _*), (h(2) % Sources.size).cast("int") + 1)

    val df0 = base.select(
      id,
      docId(id).as("doc_id"),
      tokensClean.as("tokens"),
      len.as("n_tok"),
      sourceClean.as("source"))

    if (!withViolations) return df0.drop("id")

    val m = id % 997
    val dupSel = id % 4991
    df0.select(
      when(m === 0, lit("  ")) // blank → R_NONNULL_DOCID
        .when(m === 1, concat(lit("DOC-"), id.cast("string"))) // R_REGEX_DOCID
        .when(dupSel === 5 && id > 0, docId(id - 1)) // duplicate of neighbor
        .when(dupSel === 6, docId(lit(42))) // hot duplicate key (skew)
        .otherwise(col("doc_id")).as("doc_id"),
      when(m === 3, concat(array(lit(Vocab + 7)), slice(col("tokens"), 2, 1000000)))
        .otherwise(col("tokens")).as("tokens"),
      when(m === 2, col("n_tok") + 1).otherwise(col("n_tok")).cast("int").as("n_tok"),
      when(m === 4, lit("scraped")).otherwise(col("source")).as("source"))
  }

  /** Write as a partitioned-parquet Iceberg stand-in, partitioned by a
    * doc_id hash bucket (the layout the checkpoint manifest keys on). */
  def writePartitioned(df: DataFrame, path: String, nBuckets: Int = 16): Unit =
    df.withColumn("part_bucket", pmod(xxhash64(col("doc_id")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("part_bucket").parquet(path)
}
