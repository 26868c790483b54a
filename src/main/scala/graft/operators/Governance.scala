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
}
