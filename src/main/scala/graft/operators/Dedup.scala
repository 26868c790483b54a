package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextExpressions, VectorExpressions}

/** Deduplication suite for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design:
  *  - exact: one hash-aggregate shuffle keyed by the content hash
  *    (O(distinct) shuffle rows, partial agg collapses per-partition dups);
  *  - MinHash+LSH: signatures computed in a single codegen'd projection
  *    (nested higher-order functions, no UDFs), candidate generation
  *    shuffles only (band_idx, band_hash, doc_id) triples — rows × bands,
  *    NEVER the quadratic pair space; pair verification touches only
  *    bucket-colliding candidates;
  *  - SimHash: 64-bit signature per doc (custom Expression), near-dup =
  *    identical signature or Hamming ≤ k via banded equality on signature
  *    quarters (exact-match buckets, no pairwise scan);
  *  - embedding near-dup: random-hyperplane LSH bucketing, cosine verify
  *    within buckets only.
  */
object Dedup {

  // ---------- shingling (shared) ----------

  /** Lower-cased whitespace words. */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= "")

  /** n-gram word shingles as strings ("a b c"). */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", ws)))
  }

  // ---------- exact ----------

  /** Exact duplicate groups by full content equality (hash pre-key keeps
    * the shuffle row narrow; the group key is the hash, collisions are
    * broken by the value itself). Returns (group key, n_docs, doc_ids). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String,
                      maxIdsPerGroup: Int = 100): DataFrame =
    df.groupBy(col(textCol))
      .agg(count(lit(1)).as("n_docs"),
        slice(sort_array(collect_list(col(idCol))), 1, maxIdsPerGroup).as("doc_ids"))
      .where(col("n_docs") > 1)
      .select(xxhash64(col(textCol)).as("content_hash"), col("n_docs"), col("doc_ids"))

  /** Keep one representative per exact-duplicate group (min id wins) —
    * the dedup *apply* step. Single shuffle on the content hash. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  // ---------- MinHash + LSH ----------

  /** k MinHash values over word shingles, one projection, no UDF:
    * sig[j] = min over shingles of xxhash64(shingle, j). */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles(text, shingleN), s => xxhash64(s, j))))

  /** LSH band keys: bands × (hash of r consecutive signature values).
    * Jaccard-similar docs (s ≈ 1 - (1 - s^r)^b) collide in ≥1 band. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Candidate near-duplicate pairs via banded MinHash-LSH, verified with
    * exact shingle-set Jaccard. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ threshold. */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, threshold: Double = 0.8,
      shingleN: Int = 3): DataFrame = {
    val r = k / bands
    val sigs = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"),
      minhashSignature(col(textCol), k, shingleN).as("sig"))
    val banded = sigs.select(
        col("id"), col("sh"),
        posexplode(lshBandKeys(col("sig"), bands, r)).as(Seq("band_idx", "band_hash")))
    // candidates: same (band_idx, band_hash); a<b kills self/mirror pairs.
    // Shuffle: rows×bands narrow triples; the join is bucket-local.
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---------- n-gram Jaccard (exact, no LSH) ----------

  /** Exact all-pairs n-gram Jaccard via shingle inverted index: explode
    * shingles → self-join per shingle → count common / union. Quadratic
    * only within identical-shingle groups; use the LSH variant at scale
    * (this one is the correctness oracle / small-table path). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), n)).as("sh"))
    val inv = sh.select(col("id"), col("sh"), explode(col("sh")).as("s"))
    val common = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"),
        first(size(col("a.sh"))).as("n_a"), first(size(col("b.sh"))).as("n_b"))
    common.select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash per document (custom Expression over the word array). */
  def withSimHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    TextExpressions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      TextExpressions.simhash64(words(col(textCol))).as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) ≤ maxHamming, found by banding
    * the 64-bit signature into 4 × 16-bit chunks: pairs within Hamming ≤3
    * must agree exactly on ≥1 chunk (pigeonhole) — bucket join, then
    * exact Hamming verify via bit_count(xor). */
  def simhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sh = withSimHash(df, idCol, textCol)
    val chunks = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ---------- embedding cosine near-dup ----------

  /** Random-hyperplane LSH sign-bucket for an embedding: `nBits` signs of
    * dot(v, h_i) with deterministic pseudo-hyperplanes derived from
    * xxhash64(seed, i, dim) — no stored model, reproducible anywhere. */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int = 16, seed: Int = 7): Column = {
    val bits = (0 until nBits).map { i =>
      // deterministic ±1 hyperplane h_i: sign pattern from a hash
      val dotExpr = aggregate(
        zip_with(vec, transform(sequence(lit(0), lit(dim - 1)),
          d => when(pmod(xxhash64(lit(seed), lit(i), d), lit(2)) === 0, 1.0).otherwise(-1.0)),
          (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(dotExpr >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-duplicates: bucket by hyperplane signs (+ verify with
    * the codegen'd cosine Expression within buckets only). Multi-probe:
    * `nTables` independent bucketings OR'd together for recall. */
  def embeddingNearDuplicates(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nBits: Int = 12, nTables: Int = 2): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val tables = (0 until nTables).map { t =>
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        hyperplaneBucket(col(vecCol), dim, nBits, seed = 7 + t).as("bucket"),
        lit(t).as("table_id"))
    }.reduce(_ unionByName _)
    val cand = tables.as("a").join(tables.as("b"),
        col("a.table_id") === col("b.table_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("v_a"), col("b.v").as("v_b"))
      .dropDuplicates("id_a", "id_b")
    cand.select(col("id_a"), col("id_b"),
        VectorExpressions.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Brute-force exact variant (correctness oracle; O(n²) — small inputs
    * or per-bucket use only). */
  def embeddingNearDuplicatesExact(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorExpressions.cosine(col("a.v"), col("b.v")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
