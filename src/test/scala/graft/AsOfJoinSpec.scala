package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def quotes = Seq(
    // key, ts, px
    ("A", ts("2026-01-01 10:00:00"), 1.0),
    ("A", ts("2026-01-01 10:05:00"), 2.0),
    ("A", ts("2026-01-01 10:10:00"), 3.0),
    ("B", ts("2026-01-01 10:02:00"), 9.0)
  ).toDF("k", "qts", "px")

  private def trades = Seq(
    ("A", ts("2026-01-01 09:59:00"), 100L), // before any quote → null
    ("A", ts("2026-01-01 10:05:00"), 101L), // equal ts → inclusive (2.0)
    ("A", ts("2026-01-01 10:07:00"), 102L), // between → 2.0
    ("A", ts("2026-01-01 11:00:00"), 103L), // after all → 3.0
    ("B", ts("2026-01-01 10:03:00"), 104L), // other key → 9.0
    ("C", ts("2026-01-01 10:03:00"), 105L)  // key with no quotes → null
  ).toDF("k", "tts", "trade_id")

  test("backward as-of: latest right row at-or-before each left ts, per key") {
    val got = AsOfJoin.asOfJoin(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), prefix = "q_")
      .select("trade_id", "q_qts", "q_px").orderBy("trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got === Seq(
      (100L, None, None),
      (101L, Some(ts("2026-01-01 10:05:00")), Some(2.0)),
      (102L, Some(ts("2026-01-01 10:05:00")), Some(2.0)),
      (103L, Some(ts("2026-01-01 10:10:00")), Some(3.0)),
      (104L, Some(ts("2026-01-01 10:02:00")), Some(9.0)),
      (105L, None, None)))
  }

  test("forward as-of: earliest right row at-or-after each left ts, per key") {
    val got = AsOfJoin.asOfJoin(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), prefix = "q_", forward = true)
      .select("trade_id", "q_qts", "q_px").orderBy("trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got === Seq(
      (100L, Some(ts("2026-01-01 10:00:00")), Some(1.0)), // next quote after 09:59
      (101L, Some(ts("2026-01-01 10:05:00")), Some(2.0)), // equal ts inclusive
      (102L, Some(ts("2026-01-01 10:10:00")), Some(3.0)),
      (103L, None, None),                                 // nothing after 11:00
      (104L, None, None),                                 // B's only quote precedes
      (105L, None, None)))
  }

  test("right-side ties on (key, ts) resolve to the greatest payload, deterministically") {
    val tied = quotes.unionByName(
      Seq(("A", ts("2026-01-01 10:05:00"), 7.5)).toDF("k", "qts", "px"))
    val got = AsOfJoin.asOfJoin(trades, tied, Seq("k"), "tts", "qts", Seq("px"))
      .where($"trade_id" === 102L).select("asof_px").as[Double].head()
    assert(got === 7.5) // max of {2.0, 7.5} at the tied timestamp
  }

  test("null timestamps: right nulls never match, left nulls match nothing") {
    val q = quotes.unionByName(
      Seq(("A", null.asInstanceOf[Timestamp], 99.0)).toDF("k", "qts", "px"))
    val t = trades.unionByName(
      Seq(("A", null.asInstanceOf[Timestamp], 999L)).toDF("k", "tts", "trade_id"))
    for (fwd <- Seq(false, true)) {
      val out = AsOfJoin.asOfJoin(t, q, Seq("k"), "tts", "qts", Seq("px"),
        forward = fwd)
      assert(out.where($"asof_px" === 99.0).count() === 0L, s"forward=$fwd")
      assert(out.where($"trade_id" === 999L).select("asof_px").head().isNullAt(0),
        s"null-ts left row must match nothing (forward=$fwd)")
      assert(out.count() === t.count(), s"left-outer shape (forward=$fwd)")
    }
  }

  test("null keys never match each other (SQL equi-join semantics)") {
    val q = quotes.unionByName(
      Seq((null.asInstanceOf[String], ts("2026-01-01 09:00:00"), 99.0))
        .toDF("k", "qts", "px"))
    val t_ = trades.unionByName(
      Seq((null.asInstanceOf[String], ts("2026-01-01 10:00:00"), 999L))
        .toDF("k", "tts", "trade_id"))
    val out = AsOfJoin.asOfJoin(t_, q, Seq("k"), "tts", "qts", Seq("px"))
    // the null-key left row comes back, but unmatched
    val row = out.where($"trade_id" === 999L).select("asof_px").collect()
    assert(row.length === 1 && row.head.isNullAt(0))
    assert(out.where($"asof_px" === 99.0).count() === 0)
  }

  test("differential: agrees with the brute-force spelling on pseudo-random data") {
    // deterministic LCG rows across 7 keys with deliberate ts collisions
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)
    val base = ts("2026-03-01 00:00:00").getTime
    val rnd = lcg(42L).map(math.abs)
    val leftRows = (0 until 300).map { i =>
      ("k" + rnd.next() % 7, new Timestamp(base + (rnd.next() % 500) * 1000), i.toLong)
    }
    val rightRows = (0 until 300).map { i =>
      ("k" + rnd.next() % 7, new Timestamp(base + (rnd.next() % 500) * 1000),
        (rnd.next() % 1000).toDouble)
    }
    val l = leftRows.toDF("k", "tts", "trade_id")
    val r = rightRows.toDF("k", "qts", "px")

    // brute force: max right ts ≤ left ts per key; ties → greatest payload
    val byKey = rightRows.groupBy(_._1)
    val expected = leftRows.map { case (k, t, id) =>
      val prior = byKey.getOrElse(k, Seq.empty).filter(!_._2.after(t))
      val best =
        if (prior.isEmpty) None
        else {
          val mts = prior.map(_._2.getTime).max
          Some((new Timestamp(mts),
            prior.filter(_._2.getTime == mts).map(_._3).max))
        }
      id -> best
    }.toMap

    val got = AsOfJoin.asOfJoin(l, r, Seq("k"), "tts", "qts", Seq("px"))
      .select("trade_id", "asof_qts", "asof_px").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None
         else Some((row.getTimestamp(1), row.getDouble(2))))).toMap
    assert(got === expected)
  }

  test("plan: no join operator, no pairwise explosion — one window over a tagged union") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("k"), "tts", "qts", Seq("px"))
    out.collect() // materialize so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan
    val nodes = collectWithSubqueries(plan) { case p => p.nodeName }
    assert(!nodes.exists(_.toLowerCase.contains("join")),
      s"as-of must not lower to a join: $nodes")
    assert(nodes.exists(_.contains("Window")))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 2, // right dedup agg + the key-partitioned window
      s"expected ≤2 shuffles, got ${exchanges.size}")
  }
}
