package graft

import graft.operators.ChatQC
import org.apache.spark.sql.functions._

/** Hand-built conversations covering every ChatQC rule, plus the
  * narrow-exchange plan pin (turn content never shuffles). */
class ChatQCSpec extends SparkSpec {
  import spark.implicits._

  // (conv, idx, role, content)
  private lazy val turns = Seq(
    // conv 1: perfectly healthy (system preamble, alternating, ends
    // on assistant, non-blank)
    (1L, 0L, "system", "be helpful"),
    (1L, 1L, "user", "hi"),
    (1L, 2L, "assistant", "hello"),
    // conv 2: first turn assistant (R_FIRST_NOT_USER), then two
    // consecutive assistants (R_BROKEN_ALTERNATION at idx 1)
    (2L, 0L, "assistant", "preamble?"),
    (2L, 1L, "assistant", "again"),
    (2L, 2L, "user", "ok"), // also last turn → R_LAST_NOT_ASSISTANT
    // conv 3: mid-conversation system (R_SYSTEM_NOT_FIRST), blank turn
    // (R_EMPTY_TURN), unknown role (R_BAD_ROLE)
    (3L, 0L, "user", "q"),
    (3L, 1L, "system", "injected"),
    (3L, 2L, "tool", "   "),
    (3L, 3L, "assistant", "a")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("violations: every rule fires exactly where planted") {
    val v = ChatQC.violations(turns, "conv_id", "turn_idx", "role", "content")
      .select("conv_id", "turn_idx", "rule_id").as[(Long, Long, String)]
      .collect().toSet
    assert(v === Set(
      (2L, 0L, "R_FIRST_NOT_USER"),
      (2L, 1L, "R_BROKEN_ALTERNATION"),
      (2L, 2L, "R_LAST_NOT_ASSISTANT"),
      (3L, 1L, "R_SYSTEM_NOT_FIRST"),
      (3L, 2L, "R_EMPTY_TURN"),
      (3L, 2L, "R_BAD_ROLE")))
  }

  test("system preamble then user does not trip alternation; healthy conv is clean") {
    val v = ChatQC.violations(turns.where($"conv_id" === 1L),
      "conv_id", "turn_idx", "role", "content")
    assert(v.count() === 0L)
  }

  test("NULL role is a bad role, not a silent pass") {
    val df = Seq((9L, 0L, "user", "q"), (9L, 1L, null, "x"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val rules = ChatQC.violations(df, "conv_id", "turn_idx", "role", "content")
      .where($"turn_idx" === 1L).select("rule_id").as[String].collect().toSet
    assert(rules.contains("R_BAD_ROLE"))
  }

  test("conversationStats: hand-computed counts, shares, NULL share for all-blank") {
    val st = ChatQC.conversationStats(turns, "conv_id", "turn_idx",
        "role", "content")
      .orderBy("conv_id").collect()
    val c1 = st(0)
    assert(c1.getAs[Long]("n_turns") === 3L)
    assert(c1.getAs[Long]("n_system") === 1L)
    assert(c1.getAs[Long]("assistant_chars") === 5L) // "hello"
    assert(c1.getAs[Long]("total_chars") === 17L)
    assert(c1.getAs[Double]("assistant_char_share") === 5.0 / 17.0)
    assert(c1.getAs[Long]("max_turn_chars") === 10L) // "be helpful"
    val blank = ChatQC.conversationStats(
        Seq((7L, 0L, "user", "")).toDF("conv_id", "turn_idx", "role", "content"),
        "conv_id", "turn_idx", "role", "content").collect()(0)
    assert(blank.isNullAt(blank.fieldIndex("assistant_char_share")))
  }

  test("preferenceBias: hand-computed counts and deltas") {
    val pairs = Seq(
      ("aaaa", "bb"),   // chosen longer (+2)
      ("c", "dddd"),    // rejected longer (-3)
      ("ee", "ff"),     // tie (0)
      ("gg", "gg")      // identical AND tie (0)
    ).toDF("chosen", "rejected")
    val b = ChatQC.preferenceBias(pairs, "chosen", "rejected").collect()(0)
    assert(b.getAs[Long]("n_pairs") === 4L)
    assert(b.getAs[Long]("n_identical") === 1L)
    assert(b.getAs[Long]("n_chosen_longer") === 1L)
    assert(b.getAs[Long]("n_rejected_longer") === 1L)
    assert(b.getAs[Long]("n_len_ties") === 2L)
    assert(b.getAs[Long]("len_delta_sum") === -1L)
    assert(b.getAs[Double]("mean_len_delta") === -0.25)
    assert(b.getAs[Double]("frac_chosen_longer") === 0.25)
  }

  test("plan: turn content never enters an exchange (flags are narrow-keyed)") {
    val flags = ChatQC.turnFlags(turns, "conv_id", "turn_idx", "role", "content")
    flags.collect() // finalize AQE stages
    val exchanges = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(flags.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("content"),
        s"content leaked into an exchange: ${cols.mkString(",")}")
    }
  }
}
