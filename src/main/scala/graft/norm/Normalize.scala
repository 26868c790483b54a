package graft.norm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null-like normalization + missing-mask semantics, replicated exactly
  * from the reference (/root/reference/utils/find_missing_values.py:4-56)
  * as pure Catalyst `Column` builders — no UDFs, constant-folded,
  * whole-stage-codegen friendly.
  *
  * Two deliberate asymmetries of the reference are preserved:
  *  - textual "NA" (the sentinel) is NOT "missing"
  *    (find_missing_values.py:18-34): missing = true null or
  *    whitespace-only string;
  *  - normalization maps true null, whitespace-only, and the null-like
  *    token set to the sentinel, leaving "NA" itself untouched.
  */
object Normalize {
  /** Canonical sentinel (find_missing_values.py:4). */
  val NullSentinel = "NA"

  /** Token set normalized to the sentinel (find_missing_values.py:7-15). */
  val NullLikeTokens: Seq[String] =
    Seq("none", "None", "nan", "NaN", "NAN", "N/A", "n/a")

  /** Missing ⇔ true null ∨ empty/whitespace-only. `rlike("^\\s*$")`
    * matches "" like pandas `str.fullmatch(r"\s*")`. */
  def missingMask(c: Column): Column = c.isNull || c.rlike("^\\s*$")

  /** blanks/null/null-like → "NA"; everything else passes through. */
  def normalizeNullLike(c: Column): Column =
    when(missingMask(c) || c.isin(NullLikeTokens: _*), lit(NullSentinel))
      .otherwise(c)

  /** Whole-frame normalization: every column cast to string then
    * normalized (reference normalize_null_like_dataframe,
    * find_missing_values.py:59-70 — frames are all-string by contract,
    * processed_data_loader.py:133-142). One projection, zero shuffles. */
  def normalizeDf(df: DataFrame): DataFrame =
    df.select(df.columns.map { name =>
      normalizeNullLike(col(name).cast("string")).as(name)
    }.toIndexedSeq: _*)

  /** Fill missing cells of one column with a chosen value, preserving the
    * reference precedence that textual "NA" is not refilled
    * (app.py:770-847 `apply_fill_choice` ∘ compute_missing_mask). */
  def fillMissing(c: Column, fill: String): Column =
    when(missingMask(c), lit(fill)).otherwise(c)

  /** Multi-format timestamp ingestion QC: try each format IN ORDER with
    * `try_to_timestamp` (never ANSI-throwing `to_timestamp` — a single
    * malformed cell must not kill a 10^12-row job), record which format
    * won, leave unparseable cells NULL with the format label
    * '<unparsed>' (and true nulls '<null>') so the failure volume is
    * first-class rather than silently folded into missing. Engine
    * extension (reference loads pre-typed frames and never parses
    * dates); the declared-order precedence mirrors how pandas
    * `to_datetime(format=...)` pipelines are stacked.
    *
    * Pure codegen'd projection — a coalesce chain of k parses per row,
    * zero shuffle/UDF; the per-format tally downstream is one
    * O(formats) aggregate. Appends `<out>` (timestamp) and
    * `<out>_format` (winning pattern) columns. */
  def parseTimestamps(df: DataFrame, colName: String,
                      formats: Seq[String],
                      outCol: String = "parsed"): DataFrame = {
    require(formats.nonEmpty, "at least one format")
    val c = col(colName)
    val parses = formats.map(f => try_to_timestamp(c, lit(f)))
    val parsed = coalesce(parses: _*)
    val label = formats.zip(parses).foldRight(
      when(c.isNull, lit("<null>")).otherwise(lit("<unparsed>"))) {
      case ((f, p), rest) => when(p.isNotNull, lit(f)).otherwise(rest)
    }
    df.withColumn(outCol, parsed).withColumn(s"${outCol}_format", label)
  }
}
