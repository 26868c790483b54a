package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSONL-column ingest QC — field extraction + malformed-record
  * accounting for the crawl/API-dump shape where each row carries one
  * JSON record as a string column (WARC-derived JSONL, event firehoses).
  * Reference analogue: the reference's CSV structural-validation tier
  * (crn-meta-validate validate.py's strict→forgiving read ladder)
  * re-expressed for the JSON record format a web-scale pipeline actually
  * ingests; file-level JSON already comes free via `spark.read.json` —
  * this operator covers the JSON-IN-A-COLUMN case where records must be
  * parsed mid-plan without a second pass over the files.
  *
  * Scale shape: `get_json_object` is a codegen'd Catalyst path
  * expression (Jackson streaming parse per row, no UDF); extraction +
  * validity is ONE stateless projection — zero exchanges (PlanSpec
  * pin) — and [[qcStats]] is one aggregate over that projection, so the
  * malformed-rate report costs a single pass. Malformed rows are
  * FLAGGED, not dropped (the quarantine convention: no silent drops —
  * callers route on `json_ok`).
  */
object JsonIngest {

  /** Parse-probe validity: a record is well-formed iff `probePath`
    * extracts non-null. Callers pass a path REQUIRED in well-formed
    * records (get_json_object returns null both for malformed JSON and
    * for a missing path — probing a required field folds the two into
    * the one flag QC needs; records that are valid JSON but missing the
    * required field are exactly as unusable downstream). */
  def jsonOk(json: Column, probePath: String): Column =
    get_json_object(json, probePath).isNotNull

  /** Extract `fields` (outName, '$.path', castTo-DDL-type) plus a
    * `json_ok` probe on `probeField`. Malformed records keep their row
    * with null extracts and json_ok=false; an extracted value that does
    * not parse as its declared type goes NULL via try_cast rather than
    * failing the job under ANSI mode (flag-don't-abort: one bad record
    * in 10^12 must not kill the ingest — it lands in [[qcStats]]'s
    * per-field null count instead). One projection, zero shuffles;
    * untouched input columns pass through. */
  def extractFields(df: DataFrame, jsonCol: String,
                    fields: Seq[(String, String, String)],
                    probePath: String): DataFrame =
    fields.foldLeft(
      df.withColumn("json_ok", jsonOk(col(jsonCol), probePath))) {
      case (acc, (out, path, tpe)) =>
        acc.withColumn(out,
          get_json_object(col(jsonCol), path).try_cast(tpe))
    }

  /** One-row QC report over an [[extractFields]] output: row count,
    * malformed count, and per-extracted-field null counts AMONG
    * well-formed records (nulls caused by malformation are already in
    * n_malformed; double-counting them per field would hide true
    * missing-field rates). One aggregate pass. */
  def qcStats(parsed: DataFrame, fieldNames: Seq[String]): DataFrame = {
    val perField = fieldNames.map(f =>
      sum(when(col("json_ok") && col(f).isNull, 1L).otherwise(0L))
        .as(s"n_null_$f"))
    val aggs = count(lit(1)).as("n_rows") +:
      sum(when(col("json_ok"), 0L).otherwise(1L)).as("n_malformed") +:
      perField
    parsed.agg(aggs.head, aggs.tail: _*)
  }

  /** Top-k keys across a semi-structured JSON column — the schema
    * DISCOVERY step before [[extract]]'s declared field list: which
    * keys actually occur, and how often (which are worth promoting to
    * columns, which are tracking junk). `json_object_keys` is a
    * codegen'd per-row projection (malformed rows and non-objects
    * yield NULL and vanish at the explode — q_json_qc counts those);
    * key counts collapse map-side, and the top-k is a
    * TakeOrderedAndProject on the O(distinct keys) frame under the
    * (count desc, key asc) total order — never a global sort of the
    * corpus. Returns (key, n). */
  def topJsonKeys(df: DataFrame, jsonCol: String, k: Int): DataFrame = {
    require(k > 0, "topJsonKeys: k must be positive")
    df.select(explode(json_object_keys(col(jsonCol))).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("key")).limit(k)
  }
}
