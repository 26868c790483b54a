package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Point-in-interval range join: pair every point row with every
  * interval row whose `[start, end]` (inclusive both ends) contains the
  * point's timestamp, optionally under additional equi-keys. The
  * building block behind "stamp each event with the campaign / outage /
  * session that covers it" and "count events inside each anchor's
  * follow-up window".
  *
  * Spark has no range-join operator: the direct spelling
  * (`p JOIN i ON p.ts BETWEEN i.start AND i.end`) plans as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side is
  * broadcastable) — O(|P|·|I|) comparisons, the classic 100-TB
  * cliff. This implementation turns the theta-join into an EQUI-join by
  * time bucketing:
  *
  *   1. pick a bucket width `W` (microseconds); a point lands in bucket
  *      `floor(ts / W)`, an interval covers buckets
  *      `floor(start/W) .. floor(end/W)` (a `sequence` + `explode`
  *      fan-out of ⌈len/W⌉+1 rows per interval);
  *   2. equi-join on (bucket, keys…) — hash-partitioned, AQE-skew-
  *      splittable, the same shape as any production join;
  *   3. re-check the exact `start <= ts <= end` predicate to discard
  *      same-bucket non-overlaps.
  *
  * Each matching (point, interval) pair meets in EXACTLY one bucket —
  * the point's — so no post-join dedup is needed. Cost is one
  * hash-shuffle of |P| + |I|·⌈len/W⌉ narrow rows; pick `W` near the
  * typical interval length so the interval fan-out stays O(1) per row
  * (callers with mixed interval scales should split intervals by
  * length class and union the joins, one W per class). A hot bucket
  * (event burst) is ordinary join skew — AQE splits it; no single-task
  * serialization is built into the shape.
  *
  * Reference scope: the reference has no temporal operators; this is an
  * engine extension for event-shaped data, sibling of [[AsOfJoin]]
  * (which matches the single latest row, where this matches ALL
  * covering intervals).
  */
object RangeJoin {

  /** Inclusive point-in-interval join.
    *
    * @param points      point side; every column is kept on output
    * @param intervals   interval side; every column is kept on output —
    *                    column names (other than `keys`) must not
    *                    collide with the point side's
    * @param pointTs     point timestamp column (timestamp or numeric)
    * @param ivStart     interval start column (same type family)
    * @param ivEnd       interval end column, inclusive
    * @param bucketWidth bucket width in MICROSECONDS for timestamp
    *                    columns (raw units for numeric columns); choose
    *                    ≈ the typical interval length
    * @param keys        extra equi-key columns present on both sides
    * @return inner join: one row per (point, interval) containment
    *         pair, `points.* ++ intervals.*` minus the duplicated keys;
    *         null timestamps / bounds and inverted intervals
    *         (end < start) match nothing
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, ivStart: String, ivEnd: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // FULL cross-side intersection (only the equi-keys may repeat):
    // excluding each side's own role columns would let e.g. an
    // intervals frame that also carries a column named like `pointTs`
    // slip past the guard and blow up later with AMBIGUOUS_REFERENCE
    // deep inside the join instead of this message.
    val overlap = (points.columns.toSet -- keys)
      .intersect(intervals.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"non-key columns present on both sides: ${overlap.mkString(", ")}")

    // NTZ→TZ cast shifts by the session offset, but the shift is
    // UNIFORM across points and intervals, so bucket alignment and the
    // exact containment re-check (on the original columns) both hold
    def micros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }

    // floor division in exact integer arithmetic (SQL `div` truncates
    // toward zero, which mis-buckets negative epochs; double-rounded
    // floor() loses exactness past 2^53): subtract the non-negative
    // remainder, then the division is exact
    def floorDiv(t: String): String =
      s"($t - (($t % $bucketWidth + $bucketWidth) % $bucketWidth)) div $bucketWidth"

    val p = points
      .where(col(pointTs).isNotNull)
      .withColumn("__graft_t", micros(points, pointTs))
      .withColumn("__graft_b", expr(floorDiv("__graft_t")))
      .drop("__graft_t")
    // fan each interval out to the buckets it touches; sequence() is
    // codegen'd and the fan-out is ⌈len/W⌉+1 — O(1) when W ≈ len.
    // The interval side's join columns get fresh __graft_ names so the
    // join resolves by name even when both sides derive from the SAME
    // table (self-range-joins would otherwise hit Spark's shared-
    // lineage attribute ambiguity).
    val iv = keys.foldLeft(intervals
        .where(col(ivStart).isNotNull && col(ivEnd).isNotNull &&
          col(ivEnd) >= col(ivStart))
        .withColumn("__graft_s", micros(intervals, ivStart))
        .withColumn("__graft_e", micros(intervals, ivEnd))
        .withColumn("__graft_bi", explode(sequence(
          expr(floorDiv("__graft_s")), expr(floorDiv("__graft_e")))))
        .drop("__graft_s", "__graft_e")) {
      (df, k) => df.withColumn(s"__graft_k_$k", col(k)).drop(k)
    }

    val cond = ((col("__graft_b") === col("__graft_bi")) +:
      keys.map(k => col(k) === col(s"__graft_k_$k"))).reduce(_ && _)
    p.join(iv, cond)
      .where(col(pointTs) >= col(ivStart) && col(pointTs) <= col(ivEnd))
      .drop("__graft_b" +: "__graft_bi" +: keys.map(k => s"__graft_k_$k"): _*)
  }

  /** Interval-OVERLAP join: pair every left interval with every right
    * interval sharing at least one instant — `[ls, le] ∩ [rs, re] ≠ ∅`,
    * all bounds inclusive — optionally under extra equi-keys. The
    * interval×interval sibling of [[pointInInterval]] ("which outages
    * overlapped which deploy windows", "which crawl sessions overlapped
    * which rate-limit episodes").
    *
    * Same bucketing strategy, with one extra subtlety: BOTH sides fan
    * out to the buckets they cover, so an overlapping pair can meet in
    * every bucket its intersection touches. The pair is kept exactly
    * once — in the bucket containing the intersection's START,
    * `max(ls, rs)` (both intervals cover that instant by definition of
    * a non-empty overlap, so both fan-outs produced that bucket) — a
    * pure post-join predicate, never a `distinct()`: a dedup shuffle of
    * the joined payload would dwarf the join itself at scale.
    *
    * Cost: one hash-shuffle of (|L| + |R|) · ⌈len/W⌉ narrow rows; pick
    * `W` near the typical interval length (split-by-length-class and
    * union for mixed scales, as with [[pointInInterval]]). Null bounds
    * and inverted intervals (end < start) match nothing.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"non-key columns present on both sides: ${overlap.mkString(", ")}")

    def micros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }
    def floorDiv(t: String): String =
      s"($t - (($t % $bucketWidth + $bucketWidth) % $bucketWidth)) div $bucketWidth"

    val l = left
      .where(col(lStart).isNotNull && col(lEnd).isNotNull &&
        col(lEnd) >= col(lStart))
      .withColumn("__graft_ls", micros(left, lStart))
      .withColumn("__graft_le", micros(left, lEnd))
      .withColumn("__graft_bl", explode(sequence(
        expr(floorDiv("__graft_ls")), expr(floorDiv("__graft_le")))))
      .drop("__graft_le")
    // fresh names on the right side for the same self-join-lineage
    // reason as pointInInterval's interval side
    val r = keys.foldLeft(right
        .where(col(rStart).isNotNull && col(rEnd).isNotNull &&
          col(rEnd) >= col(rStart))
        .withColumn("__graft_rs", micros(right, rStart))
        .withColumn("__graft_re", micros(right, rEnd))
        .withColumn("__graft_br", explode(sequence(
          expr(floorDiv("__graft_rs")), expr(floorDiv("__graft_re")))))
        .drop("__graft_re")) {
      (df, k) => df.withColumn(s"__graft_k_$k", col(k)).drop(k)
    }

    val cond = ((col("__graft_bl") === col("__graft_br")) +:
      keys.map(k => col(k) === col(s"__graft_k_$k"))).reduce(_ && _)
    l.join(r, cond)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // meet-exactly-once: keep the pair only in the bucket that holds
      // the overlap's first instant
      .withColumn("__graft_ms", greatest(col("__graft_ls"), col("__graft_rs")))
      .where(col("__graft_bl") === expr(floorDiv("__graft_ms")))
      .drop("__graft_ls" +: "__graft_rs" +: "__graft_ms" +:
        "__graft_bl" +: "__graft_br" +: keys.map(k => s"__graft_k_$k"): _*)
  }
}
