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

  /** n-gram word shingles as strings ("a b c") — native
    * [[graft.functions.WordShingles]] expression (the HOF spelling is
    * 100×+ slower interpreted; see its Scaladoc). Callers must register
    * [[graft.functions.ShingleExpression]] on the session first — every
    * Dedup operator does so itself. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.ShingleExpression.shingles(text, n)

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

  /** k MinHash values over word shingles via the native
    * [[graft.functions.MinHashSignature]] expression (one string hash per
    * shingle + k affine rehashes — see its Scaladoc for why the
    * HOF-composition alternative is 100×+ slower under CollapseProject).
    * Callers must have registered [[graft.functions.MinHashExpression]]. */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3): Column =
    graft.functions.MinHashExpression.minhash(
      array_distinct(shingles(text, shingleN)), k)

  /** LSH band keys: bands × (hash of r consecutive signature values).
    * Jaccard-similar docs (s ≈ 1 - (1 - s^r)^b) collide in ≥1 band. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Candidate near-duplicate pairs via banded MinHash-LSH, verified with
    * exact shingle-set Jaccard. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ threshold.
    *
    * Scale discipline (each matters at 10^9 docs):
    *  1. the banded self-join moves ONLY (band_idx, band_hash, id)
    *     triples — the heavy shingle arrays never enter the shuffle;
    *  2. pair dedup happens on the narrow (id_a, id_b) BEFORE the
    *     shingle sets are re-attached for verification;
    *  3. `maxBucket` drops degenerate buckets (boilerplate/spam clusters
    *     where every member collides with every other): a bucket of m
    *     docs contributes m(m-1)/2 candidates, so one 10^5-doc bucket is
    *     5×10^9 pairs — capping is the standard recall-for-survival
    *     trade; dropped buckets are counted, not silently ignored
    *     (callers can route them to [[exactDuplicates]], which handles
    *     identical text in one hash-agg pass).
    *  4. r = k/bands controls the collision curve P(candidate) = 1-(1-j^r)^b;
    *     r=8 makes j=0.5 impostors collide with P≈0.3%/band.
    */
  def minhashNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 8, threshold: Double = 0.8,
      shingleN: Int = 3, maxBucket: Int = 200): DataFrame = {
    graft.functions.MinHashExpression.register(df.sparkSession)
    graft.functions.ShingleExpression.register(df.sparkSession)
    val sh = df.select(
      col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
    val banded = df.select(
        col(idCol).as("id"),
        posexplode(graft.functions.ShingleExpression.minhashBands(
          array_distinct(shingles(col(textCol), shingleN)), k, bands))
          .as(Seq("band_idx", "band_hash")))
    // group per bucket; cap bucket size; emit candidate pairs inside the
    // bucket via self-product of the collected id list (narrow rows)
    val buckets = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    val cand = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // re-attach shingle sets only for surviving candidates
    val verified = cand
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
    verified.where(col("jaccard") >= threshold)
  }

  /** Apply near-dedup: drop the larger id of every near-duplicate pair
    * (min-id representative survives). Not a transitive-closure
    * clustering — for chains a~b~c it may keep {a} or {a,c} depending on
    * which pairs the LSH surfaced; that is the standard single-pass
    * dedup-apply trade at corpus scale (a connected-components pass is a
    * separate iterative job). `pairs` carries (id_a, id_b) with a<b. */
  def applyNearDedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Buckets skipped by the `maxBucket` cap (observability companion to
    * [[minhashNearDuplicates]] — "no silent caps"). */
  def minhashOverflowBuckets(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 8, shingleN: Int = 3,
      maxBucket: Int = 200): DataFrame = {
    graft.functions.MinHashExpression.register(df.sparkSession)
    graft.functions.ShingleExpression.register(df.sparkSession)
    df.select(
        col(idCol).as("id"),
        posexplode(graft.functions.ShingleExpression.minhashBands(
          array_distinct(shingles(col(textCol), shingleN)), k, bands))
          .as(Seq("band_idx", "band_hash")))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > maxBucket)
  }

  // ---------- n-gram Jaccard (exact, no LSH) ----------

  /** Exact all-pairs n-gram Jaccard via shingle inverted index: explode
    * shingles → self-join per shingle → count common / union. Quadratic
    * only within identical-shingle groups; use the LSH variant at scale
    * (this one is the correctness oracle / small-table path). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    graft.functions.ShingleExpression.register(df.sparkSession)
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
