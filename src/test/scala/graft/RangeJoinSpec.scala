package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Differential correctness for the bucketed point-in-interval join:
  * the equi-join spelling must return EXACTLY the pairs the naive
  * theta-join returns, for every bucket width (bucketing is a pure
  * execution-strategy choice, invisible in the result). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points =
    (0 until 200).map(i => (i.toLong, (i * 13 % 500).toLong)).toDF("pid", "ts")

  // mixed lengths (0, 37, 74, 111, 148), one inverted (end < start),
  // one null-start — the last two must match nothing
  private def intervals =
    (0 until 30).map { i =>
      val s = (i * 17 % 400).toLong
      (100L + i, s, s + (i % 5) * 37L)
    }.toDF("iv_id", "start", "end")
      .union(Seq((900L, 50L, 10L)).toDF("iv_id", "start", "end"))
      .union(Seq((901L, null.asInstanceOf[java.lang.Long], 10L))
        .toDF("iv_id", "start", "end"))

  private def naivePairs: Set[(Long, Long)] =
    points.join(intervals,
        col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet

  test("bucketed join equals naive theta-join at several bucket widths") {
    val truth = naivePairs
    assert(truth.nonEmpty)
    for (w <- Seq(1L, 7L, 37L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          "ts", "start", "end", bucketWidth = w)
        .select("pid", "iv_id").as[(Long, Long)].collect()
      assert(got.toSet === truth, s"bucketWidth=$w")
      // exactly-once: no duplicate pairs from the bucket fan-out
      assert(got.length === got.toSet.size, s"duplicate pairs at W=$w")
    }
  }

  test("inverted and null intervals match nothing; bounds are inclusive") {
    val got = RangeJoin.pointInInterval(points, intervals,
        "ts", "start", "end", bucketWidth = 37L)
      .select("pid", "iv_id", "ts", "start", "end").collect()
    assert(!got.exists(r => r.getLong(1) >= 900L))
    // a zero-length interval [s, s] keeps exact-hit points (inclusive)
    val zeroLen = intervals.where(col("end") === col("start"))
      .select("start").as[Long].collect().toSet
    val hits = points.select("ts").as[Long].collect().toSet.intersect(zeroLen)
    assert(hits.nonEmpty, "fixture must exercise zero-length intervals")
    assert(got.exists(r => r.getLong(3) == r.getLong(4)))
  }

  test("equi-keys restrict matches; key columns come back un-duplicated") {
    val pk = points.withColumn("k", (col("pid") % 3).cast("long"))
    val ik = intervals.withColumn("k", (col("iv_id") % 3).cast("long"))
    val truth = pk.join(ik.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
        col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    val out = RangeJoin.pointInInterval(pk, ik,
      "ts", "start", "end", bucketWidth = 37L, keys = Seq("k"))
    assert(out.columns.count(_ == "k") === 1)
    assert(out.select("pid", "iv_id").as[(Long, Long)].collect().toSet === truth)
    assert(truth !== naivePairs, "keys must actually restrict the fixture")
  }

  test("cross-side name collision is rejected up front, role columns included") {
    // intervals also carrying a column named like the POINT timestamp
    // used to slip past the guard and explode later with an ambiguous
    // reference inside the operator
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points,
        intervals.withColumn("ts", col("start")),
        "ts", "start", "end", bucketWidth = 37L)
    }
    assert(ex.getMessage.contains("non-key columns present on both sides"))
  }

  // -------------------------------------------------- intervalOverlap

  // second interval set with different phase/lengths (0, 29, 58, 87),
  // plus inverted + null rows that must match nothing
  private def intervalsB =
    (0 until 40).map { i =>
      val s = (i * 23 % 450).toLong
      (500L + i, s, s + (i % 4) * 29L)
    }.toDF("b_id", "b_start", "b_end")
      .union(Seq((950L, 80L, 20L)).toDF("b_id", "b_start", "b_end"))
      .union(Seq((951L, 5L, null.asInstanceOf[java.lang.Long]))
        .toDF("b_id", "b_start", "b_end"))

  private def naiveOverlapPairs: Set[(Long, Long)] =
    intervals.join(intervalsB,
        col("start") <= col("b_end") && col("b_start") <= col("end") &&
        col("end") >= col("start") && col("b_end") >= col("b_start"))
      .select("iv_id", "b_id").as[(Long, Long)].collect().toSet

  test("interval overlap equals naive theta-join, exactly once per pair") {
    val truth = naiveOverlapPairs
    assert(truth.nonEmpty)
    for (w <- Seq(1L, 7L, 37L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(intervals, intervalsB,
          "start", "end", "b_start", "b_end", bucketWidth = w)
        .select("iv_id", "b_id").as[(Long, Long)].collect()
      assert(got.toSet === truth, s"bucketWidth=$w")
      // the meet-once predicate, not a distinct(), dedups the fan-out
      assert(got.length === got.toSet.size, s"duplicate pairs at W=$w")
    }
    // fixture must exercise touching endpoints (inclusive overlap) and
    // containment (one interval inside another)
    val rows = intervals.join(intervalsB,
      col("start") <= col("b_end") && col("b_start") <= col("end"))
    assert(rows.where(col("b_start") === col("end") ||
      col("start") === col("b_end")).count() > 0, "no touching pair")
    assert(rows.where(col("b_start") >= col("start") &&
      col("b_end") <= col("end")).count() > 0, "no contained pair")
  }

  test("interval overlap: inverted/null rows match nothing; keys restrict") {
    val got = RangeJoin.intervalOverlap(intervals, intervalsB,
        "start", "end", "b_start", "b_end", bucketWidth = 37L)
      .select("iv_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!got.exists { case (a, b) => a >= 900L || b >= 950L })
    val lk = intervals.withColumn("k", (col("iv_id") % 3).cast("long"))
    val rk = intervalsB.withColumn("k", (col("b_id") % 3).cast("long"))
    val truth = lk.join(rk.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
        col("start") <= col("b_end") && col("b_start") <= col("end") &&
        col("end") >= col("start") && col("b_end") >= col("b_start"))
      .select("iv_id", "b_id").as[(Long, Long)].collect().toSet
    val out = RangeJoin.intervalOverlap(lk, rk,
      "start", "end", "b_start", "b_end", bucketWidth = 37L, keys = Seq("k"))
    assert(out.columns.count(_ == "k") === 1)
    assert(out.select("iv_id", "b_id").as[(Long, Long)].collect().toSet === truth)
    assert(truth !== naiveOverlapPairs, "keys must actually restrict")
  }

  test("timestamp columns bucket via unix_micros (self-range-join lineage)") {
    // both sides derived from ONE frame — the shared-lineage case the
    // internal renames exist for
    val ev = points.withColumn("t", timestamp_micros(col("ts") * 1000000L))
    val anchors = ev.where(col("pid") % 10 === 0)
      .select(col("pid").as("anchor_id"), col("t").as("w_start"),
        (col("t") + expr("INTERVAL 100 SECONDS")).as("w_end"))
    val got = RangeJoin.pointInInterval(
        ev.select("pid", "t"), anchors, "t", "w_start", "w_end",
        bucketWidth = 60L * 1000000L)
      .select("pid", "anchor_id").as[(Long, Long)].collect().toSet
    val truth = ev.select("pid", "t")
      .join(anchors, col("t") >= col("w_start") && col("t") <= col("w_end"))
      .select("pid", "anchor_id").as[(Long, Long)].collect().toSet
    assert(got === truth)
    assert(truth.nonEmpty)
  }
}
