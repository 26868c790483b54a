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

  /** Column-level change attribution: for every `changed` key, WHICH
    * compare columns differ and how — (key, column, old_value,
    * new_value), one row per differing column. The audit-trail
    * companion of [[diff]] ("what changed" → "what exactly changed"):
    * a refresh where 98 % of changes touch one boilerplate column is a
    * template rollout, not new content — route it past re-embedding.
    *
    * Scale shape: the narrow hash [[diff]] runs first and BOTH sides
    * semi-join down to the changed keys, so full-width rows move only
    * for keys that actually changed (the [[changedRows]] discipline);
    * the per-column explode is in-row. Values are surfaced as strings
    * (a diff report column must hold every source type); null-safe
    * compare, so value ↔ NULL transitions attribute correctly. */
  def changedColumns(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                     compareCols: Seq[String]): DataFrame = {
    val changedKeys = diff(oldDf, newDf, idCol, compareCols)
      .where(col("status") === "changed")
      .select(col(idCol))
    val o = oldDf.join(changedKeys, Seq(idCol), "left_semi")
      .select(col(idCol) +:
        compareCols.map(c => col(c).cast("string").as(s"__o_$c")): _*)
    val n = newDf.join(changedKeys, Seq(idCol), "left_semi")
      .select(col(idCol) +:
        compareCols.map(c => col(c).cast("string").as(s"__n_$c")): _*)
    o.join(n, Seq(idCol))
      .select(col(idCol), explode(array(compareCols.map(c =>
        struct(lit(c).as("column"), col(s"__o_$c").as("old_value"),
          col(s"__n_$c").as("new_value"))): _*)).as("__d"))
      .where(!(col("__d.old_value") <=> col("__d.new_value")))
      .select(col(idCol), col("__d.column").as("column"),
        col("__d.old_value").as("old_value"),
        col("__d.new_value").as("new_value"))
  }

  // ------------------------------------------------ partition digests

  /** Production row hash for [[partitionDigests]]: xxhash64 over the
    * key and the null-flag-interleaved compare columns (the exact
    * [[diff]] signature discipline — a value moving between columns or
    * flipping to null always changes the hash). */
  def rowHash(idCol: String, compareCols: Seq[String]): Column =
    xxhash64(col(idCol) +: compareCols.flatMap(c =>
      Seq(col(c), col(c).isNull.cast("int"))): _*)

  private val SumModulus = 2305843009213693951L // 2^61 - 1 (prime)

  /** Per-partition content digests — the 100-TB fast path for snapshot
    * comparison. [[diff]] is one narrow full-outer join, but it still
    * SCANS both snapshots end to end; when snapshots are stored
    * partitioned (date / source / shard — the Iceberg layout of the
    * north star), comparing per-partition digests first reduces the
    * work to O(partitions) metadata rows, and the row-level diff then
    * runs ONLY over partitions whose digests disagree (partition-pruned
    * scans on both sides).
    *
    * The digest must not depend on row order — file order, shuffle
    * order and task order are all non-deterministic — so it is built
    * from commutative aggregates of a per-row hash: `n_rows` (count),
    * `xor64` (bit_xor of the hashes) and `sum_mod` (hash sum modulo
    * 2^61−1; the decimal intermediate never overflows and the result
    * is engine-exact). XOR alone is blind to a row appearing an EVEN
    * number of times (pairs cancel); count+sum break that symmetry.
    * Commutativity also makes digests MERGEABLE: sub-partition digests
    * roll up to coarser ones without rescanning (xor of xors, sum of
    * sums mod m, sum of counts).
    *
    * `rowHashExpr` is injected so production uses [[rowHash]]
    * (xxhash64) while SQL-oracle replays can pass a multiplicative-
    * hash spelling — the [[graft.operators.Mixing]] epoch-order
    * pattern. */
  def partitionDigests(df: DataFrame, partCol: String,
                       rowHashExpr: Column): DataFrame =
    df.groupBy(col(partCol).as("part"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(rowHashExpr).as("xor64"),
        pmod(sum(rowHashExpr.cast("decimal(38,0)")), lit(SumModulus))
          .cast("long").as("sum_mod"))

  /** Digest-level snapshot comparison: one row per partition present in
    * either snapshot, classified `added` / `removed` / `changed` /
    * `unchanged` — O(partitions) rows total. Feed the `changed` set to
    * [[diff]] as a partition filter for the row-level pass. */
  def changedPartitions(oldDigests: DataFrame,
                        newDigests: DataFrame): DataFrame = {
    val o = oldDigests.select(col("part").as("__po"),
      col("n_rows").as("__no"), col("xor64").as("__xo"),
      col("sum_mod").as("__mo"))
    val n = newDigests.select(col("part").as("__pn"),
      col("n_rows").as("__nn"), col("xor64").as("__xn"),
      col("sum_mod").as("__mn"))
    o.join(n, col("__po") <=> col("__pn"), "full_outer")
      .select(
        coalesce(col("__pn"), col("__po")).as("part"),
        when(col("__po").isNull && col("__no").isNull, lit("added"))
          .when(col("__pn").isNull && col("__nn").isNull, lit("removed"))
          .when(col("__no") === col("__nn") &&
            col("__xo") === col("__xn") && col("__mo") === col("__mn"),
            lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("__no"), lit(0L)).as("n_rows_old"),
        coalesce(col("__nn"), lit(0L)).as("n_rows_new"))
  }
}
