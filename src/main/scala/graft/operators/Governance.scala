package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy release gates over quasi-identifier combinations — the audit
  * a dataset runs BEFORE publication or training-set release. Rebuilt
  * from the validation-engine viewpoint (declarative predicates → loud
  * violation rows, reference crn-meta-validate's report discipline,
  * app.py error-table shape) for the two standard disclosure-risk
  * checks:
  *
  *  - k-anonymity (Sweeney 2002): every combination of quasi-identifier
  *    values must be shared by ≥ k rows, or the rows in that cell are
  *    re-identifiable by linking the QI columns to an external table.
  *  - l-diversity (Machanavajjhala 2007): within each QI cell the
  *    SENSITIVE column must take ≥ l distinct values, or membership in
  *    the cell itself discloses the sensitive value even at high k.
  *
  * Scale shape: both are ONE hash aggregate over the QI key — map-side
  * partial combine crushes each cell to a single row per task before the
  * exchange, so shuffle volume is O(distinct cells), never O(rows), and
  * no payload column moves. NULL QI values form their own cells (a null
  * group is a population like any other — the repo-wide loud-null rule);
  * for l-diversity, NULL sensitive values are counted as one additional
  * distinct value ("value withheld" is itself an observable state).
  */
object Governance {

  /** Per-cell k-anonymity audit: one row per distinct QI combination
    * with its occupancy `n` and `at_risk = n < k`. Callers gate a
    * release on `at_risk` count == 0 or suppress/generalize the flagged
    * cells. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** One-row release verdict: total cells, risky cells, rows living in
    * risky cells (the suppression bill), and the table's realized
    * k-anonymity (`min_cell` — the k the table actually satisfies). */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    kAnonymity(df, qiCols, k).agg(
      count(lit(1)).as("n_cells"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("risky_cells"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("risky_rows"),
      min(col("n")).as("min_cell"))

  /** Per-cell l-diversity audit: distinct sensitive values per QI cell
    * (NULL counted as its own value when present), `at_risk = l_div <
    * l`. Exact distinct — the release gate must not be sketch-fuzzy; the
    * (QI, sensitive) pre-aggregate keeps the exchange at O(distinct
    * pairs) rows of narrow keys. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 1, "l must be >= 1")
    val qi = qiCols.map(col)
    // two-level: distinct (QI, sensitive) first (map-side combine), then
    // count per cell — the same salted-shape argument as Uniqueness
    df.select((qi :+ col(sensitiveCol).as("__sens")): _*)
      .distinct()
      .groupBy(qi: _*)
      .agg(count(lit(1)).as("l_div"))
      .withColumn("at_risk", col("l_div") < l)
  }

  /** ε-differentially-private per-group count release (the Laplace
    * mechanism, Dwork et al. 2006) — the third privacy gate next to
    * [[kAnonymity]]/[[lDiversity]]: when even the exact group COUNTS
    * are a disclosure (per-hospital patient tallies, per-site user
    * counts in a published data card), release n + Laplace(1/ε) noise
    * instead. Count sensitivity is 1, so scale b = 1/ε.
    *
    * The noise draw is DETERMINISTIC: u ∈ (0,1) from a seeded
    * multiplicative hash of `drawKey` (inverse-CDF Laplace,
    * −b·sign(u−½)·ln(1−2|u−½|)), so a retried or re-planned release
    * emits bit-identical numbers — re-running with a FRESH seed is a
    * FRESH privacy spend (ε adds up; callers own the accounting, and
    * the u = (h+½)/2^32 offset keeps the tail finite at |noise| ≤
    * b·32·ln 2). `drawKey` must be a numeric expression of the GROUP
    * (not of rows — one draw per released number): inject the group
    * ordinal or a group-key hash, the [[SnapshotDiff.partitionDigests]]
    * injection pattern, which keeps the whole release SQL-replicable.
    *
    * One map-side-combined count aggregate + a stateless projection —
    * O(groups) shuffle rows. Returns (group, n_true, noise, n_dp);
    * production releases ONLY (group, n_dp) — n_true/noise are the
    * audit columns (kept so tests and oracles can pin the arithmetic),
    * documented, never for publication. */
  def dpCounts(df: DataFrame, groupCol: String, drawKey: Column,
               epsilon: Double, seed: Long): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val b = 1.0 / epsilon
    val h = (drawKey.cast("long") * lit(2654435761L) + lit(seed)) %
      lit(4294967296L)
    // pmod: drawKey may be negative; the +0.5 offset keeps u in (0,1)
    val u = (pmod(h, lit(4294967296L)).cast("double") + 0.5) / 4294967296.0
    val c = u - 0.5
    val noise = -lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_true"))
      .select(col(groupCol), col("n_true"),
        round(noise, 6).as("noise"),
        round(col("n_true") + noise, 6).as("n_dp"))
  }
}
