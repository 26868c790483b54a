package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation by importance weighting — the DSIR recipe (Xie et
  * al. 2023, arXiv:2302.03169, "Data Selection for Language Models via
  * Importance Resampling"): score every raw document by how much more
  * likely its unigrams are under a TARGET distribution (the
  * high-quality exemplar set) than under the RAW distribution, then
  * keep the top of the ranking.
  *
  * weight(doc) = Σ_{w ∈ doc} [ ln p_T(f(w)) − ln p_R(f(w)) ]
  * with add-one-smoothed maximum-likelihood estimates
  * p(b) = (c_b + 1) / (N + V) over feature buckets b = f(w).
  *
  * Two feature maps, one estimator:
  *  - `hashed = true` (production): f(w) = xxhash64(w) mod nBuckets —
  *    the paper's hashed-n-gram trick. The feature table is BOUNDED at
  *    nBuckets rows no matter how big the corpus, so the per-document
  *    scoring join broadcasts (forced — bounded by construction, the
  *    [[Decontamination]] bench-side convention) and the corpus never
  *    shuffles for scoring; V = nBuckets.
  *  - `hashed = false` (oracle): f(w) = w, V = distinct raw words —
  *    exactly replicable in SQL (q_dsir_weights); the weight table is
  *    vocabulary-sized, joined with AQE's choice.
  *
  * Scale shape: both count passes collapse map-side (narrow
  * (bucket, partial count) shuffles, O(partitions × buckets) rows);
  * scoring explodes words to (id, bucket) pairs, joins the weight
  * table, and re-aggregates per id — exploded same-doc rows stay
  * co-partitioned, so the final groupBy ships ~one partial row per
  * document. Document text never enters an exchange.
  */
object Curation {

  private def bucket(word: Column, nBuckets: Int, hashed: Boolean): Column =
    // unhashed mode keys on the FULL 64-bit word hash instead of the
    // word string: every count table and the scoring join below carry
    // fixed-width longs, and counts per key are identical to per-word
    // counts absent 64-bit collisions (the q_bigram_logprob keying
    // discipline) — V = distinct keys is then the distinct word count
    if (hashed) pmod(xxhash64(word), lit(nBuckets.toLong))
    else xxhash64(word)

  /** Per-document DSIR log importance weight, rounded to 6 dp:
    * (idCol, dsir_weight). `target` needs only its text column. */
  def dsirLogWeights(raw: DataFrame, idCol: String, textCol: String,
                     target: DataFrame, targetTextCol: String,
                     nBuckets: Int = 65536,
                     hashed: Boolean = true): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val rawWords = raw.select(col(idCol),
      explode(Dedup.words(col(textCol))).as("__w"))
      .select(col(idCol), bucket(col("__w"), nBuckets, hashed).as("__b"))
    val targetWords = target
      .select(explode(Dedup.words(col(targetTextCol))).as("__w"))
      .select(bucket(col("__w"), nBuckets, hashed).as("__b"))

    val cR = rawWords.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val cT = targetWords.groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    // scalar totals: N_R, N_T, V — three tiny aggregates, one 1-row frame
    val totals = cR.agg(
        sum(col("__cr")).cast("double").as("__nr"),
        count(lit(1)).cast("double").as("__v"))
      .crossJoin(cT.agg(
        coalesce(sum(col("__ct")), lit(0L)).cast("double").as("__nt")))
    val vCol: Column =
      if (hashed) lit(nBuckets.toDouble) else col("__v")
    // per-bucket log ratio; raw-side buckets only (scoring joins on the
    // raw corpus's own words, so every scored bucket exists in cR)
    val logw = cR.join(cT, Seq("__b"), "left").crossJoin(totals)
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) / (col("__nt") + vCol))
          - log((col("__cr") + lit(1.0)) / (col("__nr") + vCol))).as("__lw"))
    val weightTable = if (hashed) broadcast(logw) else logw
    rawWords.join(weightTable, Seq("__b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__lw")), 6).as("dsir_weight"))
  }

  /** The selection step: top-`k` raw documents by DSIR weight
    * (TakeOrderedAndProject on the narrow (id, weight) frame — no
    * global sort materializes — then one id-keyed semi-join moves only
    * the selected payloads; ties break on id for determinism). The
    * paper resamples with Gumbel noise; deterministic top-k is the
    * retry-stable variant, and callers wanting sampled selection can
    * add a seeded hash jitter to the weight column first. */
  def dsirSelect(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String, k: Int,
                 nBuckets: Int = 65536, hashed: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    val top = dsirLogWeights(raw, idCol, textCol, target, targetTextCol,
        nBuckets, hashed)
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(k)
      .select(col(idCol))
    raw.join(top, Seq(idCol), "left_semi")
  }
}
