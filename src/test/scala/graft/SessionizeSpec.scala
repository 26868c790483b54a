package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Session-boundary semantics for the gap sessionizer: exactly-at-gap
  * splits, strictly-inside-gap merges, chains extend, null keys/ts
  * drop. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapSec = 60L // "1 minutes"

  private def ev(rows: (java.lang.Long, Long, Double)*) =
    rows.toSeq.toDF("user", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Sessionize.sessionize(df, Seq("user"), "ts", "1 minutes",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .select(col("user"),
        (unix_micros(col("session_start")) / 1000000L).cast("long"),
        (unix_micros(col("session_last")) / 1000000L).cast("long"),
        col("n"), col("v"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet

  test("gap boundary: exactly prev+gap still merges; gap+1 splits") {
    val merged = run(ev((1L, 0L, 1.0), (1L, gapSec, 2.0)))
    assert(merged === Set((1L, 0L, 60L, 2L, 3.0)))
    val split = run(ev((1L, 0L, 1.0), (1L, gapSec + 1, 2.0)))
    assert(split === Set((1L, 0L, 0L, 1L, 1.0), (1L, 61L, 61L, 1L, 2.0)))
  }

  test("strictly inside the gap merges; chains extend past one gap total") {
    // 0, 59, 118: each step < 60 apart, total span 118 > gap — one session
    val got = run(ev((1L, 0L, 1.0), (1L, 59L, 2.0), (1L, 118L, 4.0)))
    assert(got === Set((1L, 0L, 118L, 3L, 7.0)))
  }

  test("keys separate sessions; null key and null ts rows drop") {
    val base = ev((1L, 0L, 1.0), (2L, 10L, 2.0),
      (null.asInstanceOf[java.lang.Long], 20L, 4.0))
      .union(ev((3L, 0L, 8.0)).withColumn("ts",
        lit(null).cast(ev((1L, 0L, 1.0)).schema("ts").dataType)))
    val got = run(base)
    assert(got === Set((1L, 0L, 0L, 1L, 1.0), (2L, 10L, 10L, 1L, 2.0)))
  }

  test("differential: session_window equals lag/cumsum reconstruction") {
    // pseudo-random event times, many users, many sessions
    val df = (0 until 3000).map { i =>
      (java.lang.Long.valueOf(i % 17L), (i * 2654435761L + 11) % 86400L, 1.0)
    }.toDF("user", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
    val got = run(df)
    // reconstruct with window functions (the oracle spelling)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("sec")
    val truth = df
      .withColumn("brk", when(lag(col("sec"), 1).over(w).isNull ||
        col("sec") - lag(col("sec"), 1).over(w) > gapSec, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user", "sid")
      .agg(min(col("sec")).as("s"), max(col("sec")).as("l"),
        count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("user"), col("s"), col("l"), col("n"), col("v"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got === truth)
    assert(got.size > 17, "fixture must produce multiple sessions per user")
  }
}
