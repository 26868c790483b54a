package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the latest
  * right row with the same key and `right.ts <= left.ts` (backward,
  * default — "most recent prior observation"), or the earliest with
  * `right.ts >= left.ts` (`forward = true` — "next following
  * observation"); both inclusive at equal timestamps. Used to stamp
  * events with the state that preceded (or the outcome that followed)
  * them. Spark has no ASOF JOIN operator; the naive spelling
  * (`l JOIN r ON key AND r.ts <= l.ts` + max-window) explodes to
  * O(|L|·|R|) pairs per key before pruning. This implementation
  * composes it from a union and ONE running window instead:
  *
  *   1. deduplicate the right side to one row per (key, ts) —
  *      deterministically keeping the lexicographically greatest
  *      payload — so the match is well-defined under ties;
  *   2. union left and right rows tagged by side, right-before-left at
  *      equal timestamps;
  *   3. one `last(payload, ignoreNulls) OVER (PARTITION BY key ORDER BY
  *      ts, side ROWS UNBOUNDED PRECEDING..CURRENT ROW)` carries each
  *      right payload forward to every later left row;
  *   4. keep the left rows, expand the carried struct.
  *
  * Scale shape: cost is one hash-shuffle of |L|+|R| narrow rows on the
  * key plus a spillable partition-local sort — the same shape as a
  * sort-merge join, with zero pairwise blow-up. The running frame
  * (UNBOUNDED PRECEDING..CURRENT ROW) is evaluated incrementally, so
  * the window never buffers a key's history. A single pathological key
  * serializes through one task's sort (spills, not OOMs); the
  * escalation path for that skew is bucketing time into coarse ranges
  * and carrying each bucket's closing payload into the next — not
  * needed until one key alone outgrows a task.
  *
  * Reference scope: the reference validates frames row-by-row and has
  * no temporal join; this is an engine extension for event-shaped
  * training data (e.g. stamping each interaction with the last prior
  * context row).
  */
object AsOfJoin {

  /** @param keys     equi-join key columns (present on both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param payload  right columns to attach (prefixed on output)
    * @param prefix   output prefix: matched ts lands as `<prefix><rightTs>`,
    *                 each payload column as `<prefix><name>`
    * @param forward  false (default): latest right row with
    *                 `right.ts <= left.ts` (backward); true: EARLIEST
    *                 right row with `right.ts >= left.ts` — the
    *                 "next following observation" join, identical
    *                 machinery walked in descending time order
    * @return left.* plus the prefixed matched-right columns (null where
    *         no right row precedes/follows the left row); right rows
    *         with a null timestamp never match, left rows with a null
    *         timestamp match nothing
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_", forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "as-of join needs at least one payload column")

    // 1. one right row per (key, ts): keep the lexicographically
    // greatest payload struct so ties are deterministic on any engine.
    // Null-key right rows are dropped up front: under SQL equi-join
    // semantics NULL matches nothing, and Window.partitionBy would
    // otherwise group null keys TOGETHER and wrongly stamp null-key
    // left rows with them (null-key left rows still come back, with a
    // null match, like any unmatched left row).
    val payloadStruct = struct(payload.map(col): _*)
    val rightDedup = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max_by(payloadStruct, payloadStruct).as("__graft_payload"))

    val payloadType = rightDedup.schema("__graft_payload").dataType

    // 2. tagged union: side 0 (right) sorts before side 1 (left) at
    // equal timestamps, making the match inclusive
    val leftCols = left.columns
    val lt = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__graft_ts"), lit(1).as("__graft_side"),
        struct(leftCols.map(col): _*).as("__graft_row"),
        lit(null).cast(payloadType).as("__graft_payload")): _*)
    val rt = rightDedup.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__graft_ts"), lit(0).as("__graft_side"),
        lit(null).cast(lt.schema("__graft_row").dataType).as("__graft_row"),
        col("__graft_payload")): _*)

    // 3. carry the latest right payload (and its ts) forward — or, for
    // the forward join, walk time DESCENDING so "last carried" means
    // "earliest at-or-after"; right still sorts before left at equal
    // ts. Null-ts LEFT rows must sort before every right row so their
    // running frame is empty of matches: nulls FIRST in both walks
    // (null-ts right rows were already dropped in step 1).
    val tsOrder =
      if (forward) col("__graft_ts").desc_nulls_first
      else col("__graft_ts").asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lt.unionByName(rt)
      .withColumn("__graft_match", // null on left rows → skipped by ignoreNulls
        last(when(col("__graft_side") === 0,
            struct(col("__graft_ts").as("__ts"), col("__graft_payload").as("__p"))),
          ignoreNulls = true).over(w))

    // 4. keep left rows; expand row + prefixed match columns
    val out: Seq[Column] =
      leftCols.toSeq.map(c => col(s"__graft_row.$c").as(c)) ++
        (col("__graft_match.__ts").as(s"$prefix$rightTs") +:
          payload.map(p => col(s"__graft_match.__p.$p").as(s"$prefix$p")))
    carried.where(col("__graft_side") === 1).select(out: _*)
  }
}
