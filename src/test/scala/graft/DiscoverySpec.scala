package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Profile, Referential, TextAnalysis}

/** Batch-29 operators: Good–Turing unseen-mass estimate, dedup
  * saturation curve, Hill tail index, join-key containment pre-flight,
  * and string column type inference. Hand-computed values plus
  * exchange-payload pins. */
class DiscoverySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- Good–Turing

  test("goodTuring: hand-computed count-of-counts and smoothed probs") {
    // words: a:3 b:2 c:2 d:1 → N=8, N1=1, N2=2, N3=1
    val docs = Seq("a a a b b c", "c d").toDF("text")
    val rows = TextAnalysis.goodTuring(docs, "text").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 1L)))
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    // r=0: unseen mass N1/N = 0.125
    assert(byR(0L).isNullAt(2) && byR(0L).getDouble(3) === 0.125)
    // r=1: r* = 2·N2/N1 = 4 → p = 0.5
    assert(byR(1L).getDouble(2) === 4.0 && byR(1L).getDouble(3) === 0.5)
    // r=2: r* = 3·N3/N2 = 1.5 → p = 0.1875
    assert(byR(2L).getDouble(2) === 1.5 && byR(2L).getDouble(3) === 0.1875)
    // r=3 (max observed): N4 absent → estimator undefined, surfaced
    assert(byR(3L).isNullAt(2) && byR(3L).isNullAt(3))
  }

  // ---------------------------------------------- dedup saturation

  test("duplicateSaturation: per-bucket and cumulative duplicate rates") {
    val docs = Seq((0L, "x0"), (1L, "x1"), (2L, "x0"), (3L, "x2"),
      (4L, "x1"), (5L, "x0"), (6L, "x3"), (7L, "x3"), (8L, "x9"),
      (9L, "x0")).toDF("id", "text")
    val out = Dedup.duplicateSaturation(docs, "id", "text", 5L).collect()
    assert(out.length === 2)
    // bucket 0: dups are ids 2 (x0) and 4 (x1) → 2/5
    assert(out(0).getLong(0) === 0L && out(0).getLong(1) === 5L &&
      out(0).getLong(2) === 2L && out(0).getDouble(3) === 0.4 &&
      out(0).getLong(4) === 2L && out(0).getDouble(5) === 0.4)
    // bucket 1: dups 5 (x0), 7 (x3), 9 (x0) → 3/5; cumulative 5/10
    assert(out(1).getLong(2) === 3L && out(1).getDouble(3) === 0.6 &&
      out(1).getLong(4) === 5L && out(1).getDouble(5) === 0.5)
  }

  test("duplicateSaturation: text never enters an exchange") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.duplicateSaturation(docs, "doc_id", "text", 100L)
    out.collect()
    val exchanges = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(out.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("text"),
        s"saturation exchange shuffled text: $names")
    }
  }

  // --------------------------------------------------- Hill index

  test("hillTailIndex: hand-computed alpha on a dyadic tail") {
    // top-4 of (16,8,4,2,1,1) with k=3: Σln(xᵢ/2) = ln8+ln4+ln2 = 6ln2
    val df = Seq(16.0, 8.0, 4.0, 2.0, 1.0, 1.0).toDF("v")
    val r = Profile.hillTailIndex(df, "v", k = 3).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L &&
      r.getDouble(2) === 2.0)
    val expected = BigDecimal(3.0 / (6.0 * math.log(2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === expected && expected === 0.721348)
  }

  test("hillTailIndex: insufficient rows and degenerate tail are NULL") {
    val few = Seq(5.0, 4.0).toDF("v")
    val r = Profile.hillTailIndex(few, "v", k = 10).head()
    assert(r.getLong(1) === 2L && r.isNullAt(2) && r.isNullAt(3))
    val flat = Seq(7.0, 7.0, 7.0).toDF("v")
    val r2 = Profile.hillTailIndex(flat, "v", k = 2).head()
    assert(r2.getDouble(2) === 7.0 && r2.isNullAt(3))
    intercept[IllegalArgumentException] {
      Profile.hillTailIndex(few, "v", k = 0)
    }
  }

  // ---------------------------------------------- key containment

  test("keyContainment: hand-computed fractions, NULLs never match") {
    val left = Seq(Some(1), Some(1), Some(2), Some(3), None).toDF("k")
    val right = Seq(1, 3, 4, 5).toDF("k")
    val r = Referential.keyContainment(left, "k", right, "k").head()
    assert(r.getLong(0) === 5L && r.getLong(1) === 4L) // rows, nonnull
    assert(r.getLong(2) === 3L && r.getLong(3) === 4L) // left/right keys
    assert(r.getLong(4) === 2L && r.getLong(5) === 3L) // shared, matched
    assert(r.getDouble(6) === 0.666667 && r.getDouble(7) === 0.75)
  }

  test("keyContainment: empty right side reports zero loudly") {
    val left = Seq(1, 2).toDF("k")
    val right = Seq.empty[Int].toDF("k")
    val r = Referential.keyContainment(left, "k", right, "k").head()
    assert(r.getLong(4) === 0L && r.getDouble(6) === 0.0 &&
      r.getDouble(7) === 0.0)
  }

  // ----------------------------------------------- type inference

  test("typeInference: ladder picks the strictest covering type") {
    val df = Seq(
      ("1", "1.5", "2024-01-15", "true", Option.empty[String]),
      ("2", "7", "2024-13-40", "FALSE", Option.empty[String]))
      .toDF("a", "b", "c", "d", "e")
    val out = Profile.typeInference(df, Seq("a", "b", "c", "d", "e"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getString(7) === "bigint")
    assert(out("b").getString(7) === "double")
    // '2024-13-40' passes the regex but fails the calendar try_cast
    assert(out("c").getLong(5) === 1L && out("c").getString(7) === "string")
    assert(out("d").getString(7) === "boolean")
    assert(out("e").getLong(2) === 2L && out("e").getString(7) === "empty")
    // bigint cells also count as double (the ladder needs the overlap)
    assert(out("a").getLong(4) === 2L)
  }

  test("typeInference: one fused aggregate scan for all columns") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Profile.typeInference(
      docs.selectExpr("CAST(doc_id AS STRING) AS a", "lang AS b"),
      Seq("a", "b"))
    // pre-execution plan: post-collect AQE output prints Initial AND
    // Final plans, double-counting the scan in the string
    val p = q.queryExecution.executedPlan.toString
    assert("FileScan parquet|Scan parquet".r.findAllIn(p).size === 1,
      s"type inference must scan once:\n$p")
    assert(p.contains("partial_"), s"no map-side partials:\n$p")
  }
}
