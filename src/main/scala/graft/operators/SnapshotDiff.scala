package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed between two corpus snapshots": the
  * operator behind incremental crawl refreshes, retraining triggers and
  * audit trails. Classifies every key as `added` / `removed` /
  * `changed` / `unchanged` between an `old` and a `new` frame.
  *
  * Scale shape: both sides are first PROJECTED to (key, xxhash64 of the
  * compared columns) — 16-byte rows — and the full-outer join runs on
  * those narrow frames, so document payloads never enter the exchange
  * regardless of corpus width. With both snapshots stored bucketed on
  * the key (`SeqTableGen.writePartitioned` layout) the join is
  * co-located and needs no shuffle at all. Content equality via a
  * 64-bit content hash carries the same collision trade documented on
  * [[Dedup.exactDuplicates]]: two DIFFERENT versions of one document
  * colliding (≈5.4e-20 per changed doc) reads as `unchanged` — at
  * 10^12 changed docs, ~0.05 expected misses; pass `exact = true` to
  * compare the raw columns instead (payload-width shuffle, exact).
  *
  * Reference behavior grafted: the reference validates one upload at a
  * time and has no snapshot story; this is the cross-snapshot
  * generalization its CI manifest diff hints at
  * (crn-meta-validate utils/generate_readme.py checks table manifests).
  */
object SnapshotDiff {

  /** Per-key status frame: (key, status) for every key present in
    * either snapshot. `compareCols` are the value columns whose change
    * flips `unchanged` → `changed`. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           compareCols: Seq[String], exact: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // xxhash64 SKIPS null inputs when folding, so hashing the raw
    // columns would make (x, null) and (null, x) collide SYSTEMATICALLY
    // (a value moving across columns reads as "unchanged"). Interleave
    // each column with its null flag: the fold is sequential, so the
    // flag positions disambiguate every null pattern.
    def sig(df: DataFrame): Column =
      if (exact) struct(compareCols.map(df(_)): _*)
      else xxhash64(compareCols.flatMap(c =>
        Seq(df(c), df(c).isNull.cast("int"))): _*)
    val o = oldDf.select(col(idCol).as("__ko"), sig(oldDf).as("__so"))
    val n = newDf.select(col(idCol).as("__kn"), sig(newDf).as("__sn"))
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .select(
        coalesce(col("__kn"), col("__ko")).as(idCol),
        when(col("__ko").isNull, lit("added"))
          .when(col("__kn").isNull, lit("removed"))
          .when(col("__so") === col("__sn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Observability rollup: one row per status with its key count (the
    * number every incremental-refresh run should log — "no silent
    * caps" applies to snapshot churn too). */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
              compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, compareCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))

  /** The refresh delta: full NEW-side rows whose key is `added` or
    * `changed` — exactly the set a downstream incremental pipeline
    * (re-tokenize, re-embed, re-validate) must process. One narrow
    * diff + a semi-join back to the new snapshot: payloads move only
    * for keys that actually changed. */
  def changedRows(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  compareCols: Seq[String]): DataFrame = {
    val delta = diff(oldDf, newDf, idCol, compareCols)
      .where(col("status").isin("added", "changed"))
      .select(col(idCol))
    newDf.join(delta, Seq(idCol), "left_semi")
  }
}
