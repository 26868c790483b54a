package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Drift, Profile}
import graft.norm.Normalize

/** Hand-computed verification of the round-5 statistical-QC battery:
  * the two-sample drift tests (Welch t / Mann–Whitney U / Brown–
  * Forsythe / KL / EWMA chart / effect sizes), the validation-discovery
  * profilers (missingness patterns, entropy profile, KMV sketch,
  * correlation matrix, multi-format timestamp parsing), and the
  * retrieval/rule evaluators (MRR, P/R@k, confusion stats, association
  * rules). Every expected number is derived off-engine (pure-python
  * arithmetic, cross-checked against the published formulas). */
class StatBatterySpec extends AnyFunSuite {

  private def ds(pairs: (String, Double)*) = {
    val spark = SparkSpec.session
    import spark.implicits._
    pairs.toSeq.toDF("g", "v")
  }

  test("welchT: textbook two-sample case, complement stats exact") {
    // a=[1,2,3,4] vs complement b=[2,4,6,8,10]:
    // t = -2.251436, Welch df = 5.520788 (hand-computed)
    val df = ds(Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("b", v.toDouble)): _*)
    val rows = Drift.welchT(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("a") === ((4L, 5L, -2.251436, 5.520788)))
    // symmetric direction: b vs complement a flips the sign, same df
    assert(rows("b") === ((5L, 4L, 2.251436, 5.520788)))
  }

  test("welchT: group of one yields NULL t, not a crash or ±Inf") {
    val df = ds(("a", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0))
    val a = Drift.welchT(df, "g", "v").where(col("g") === "a").collect()(0)
    assert(a.isNullAt(3) && a.isNullAt(4))
  }

  test("mannWhitneyU: tied example U=2, tie-corrected z=-1.123666") {
    // A=[1,2,3] vs B=[2,3,4]: avg ranks 1, 2.5, 4.5 → R_A=8, U=2,
    // sigma^2 = (9/12)(7 - 12/30) = 4.95
    val df = ds(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 3.0), ("B", 4.0))
    val r = Drift.mannWhitneyU(df, "v", col("g") === "A").collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === -1.123666)
  }

  test("mannWhitneyU: all values tied → NULL z; empty side → NULL stats") {
    val tied = ds(("A", 5.0), ("A", 5.0), ("B", 5.0))
    val r1 = Drift.mannWhitneyU(tied, "v", col("g") === "A").collect()(0)
    assert(r1.isNullAt(3), "zero variance must yield NULL z")
    val oneSided = ds(("A", 1.0), ("A", 2.0))
    val r2 = Drift.mannWhitneyU(oneSided, "v", col("g") === "B").collect()(0)
    assert(r2.getLong(0) === 0L && r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("brownForsythe: hand-computed F=2.424675 on median-centered groups") {
    // a=[1,2,3,4] (median 2.5), b=[10,20,60] (median 20)
    val df = ds(Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(10, 20, 60).map(v => ("b", v.toDouble)): _*)
    val r = Drift.brownForsythe(df, "g", "v").collect()(0)
    assert(r.getLong(0) === 7L && r.getInt(1) === 2)
    assert(r.getDouble(2) === 2.424675)
    assert(r.getInt(3) === 1 && r.getLong(4) === 5L)
    // approx (scale) mode: approx_percentile does NOT interpolate even
    // groups — median(a)=2.0 not 2.5 → hand-recomputed F = 2.421884;
    // the bounded-memory trade documented on the operator
    val ra = Drift.brownForsythe(df, "g", "v", exact = false).collect()(0)
    assert(ra.getDouble(2) === 2.421884)
  }

  test("effectSizes: pooled-sd Cohen's d and Hedges' g, hand-computed") {
    val df = ds(Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("b", v.toDouble)): _*)
    val rows = Drift.effectSizes(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("a") === ((-1.380419, -1.227039)))
    assert(rows("b") === ((1.380419, 1.227039)))
  }

  test("KL divergence: hand value, zero on identical, asymmetric") {
    val obs = Drift.CategoricalProfile(Map("a" -> 3L, "b" -> 1L))
    val base = Drift.CategoricalProfile(Map("a" -> 1L, "b" -> 1L))
    assert(math.abs(Drift.kl(obs, base) - 0.130812) < 1e-6)
    assert(Drift.kl(base, base) === 0.0)
    assert(Drift.kl(obs, base) !== Drift.kl(base, obs))
  }

  test("ewmaChart: closed form equals the recursion, limits widen to steady state") {
    val spark = SparkSpec.session
    import spark.implicits._
    // 10 events day 1, 20 day 2, 30 day 3 → z0=20, sigma=10
    // recursion: z1=18, z2=18.4, z3=20.72; bands 6 / 7.683749 / 8.589854
    val rows = (1 to 10).map(i => ("2024-03-01 00:00:" + f"$i%02d")) ++
      (1 to 20).map(i => ("2024-03-02 00:00:" + f"$i%02d")) ++
      (1 to 30).map(i => ("2024-03-03 00:00:" + f"$i%02d"))
    val df = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val got = Drift.ewmaChart(df, "ts").orderBy("day").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    assert(got.map(_.getDouble(2)).toSeq === Seq(18.0, 18.4, 20.72))
    assert(got(0).getDouble(4) === 26.0 && got(0).getDouble(3) === 14.0)
    assert(got(1).getDouble(4) === 27.683749)
    assert(got(2).getDouble(4) === 28.589854)
    assert(got.forall(!_.getBoolean(5)), "all three points inside the band")
  }

  test("missingnessPatterns: joint-null pattern counted once, shares sum to 1") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), Some("x")), (None, None), (None, None),
      (Some(2), None), (None, Some("y"))).toDF("a", "b")
    val got = Profile.missingnessPatterns(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("11") === ((2L, 0.4)))
    assert(got("01") === ((1L, 0.2)))
    assert(got("10") === ((1L, 0.2)))
    assert(got("00") === ((1L, 0.2)))
  }

  test("entropyProfile: uniform pair ln2/evenness 1/simpson .5; constant column") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(("x", "k"), ("x", "k"), ("y", "k"), ("y", "k"))
      .toDF("bal", "const")
    val got = Profile.entropyProfile(df, Seq("bal", "const")).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getDouble(5)))).toMap
    assert(got("bal") === ((4L, 2L, 0.693147, Some(1.0), 0.5)))
    assert(got("const") === ((4L, 1L, 0.0, None, 0.0)))
  }

  test("kmvDistinct: fewer distincts than k → exact; k=64 estimate lands near truth") {
    val spark = SparkSpec.session
    import spark.implicits._
    val tiny = Seq(1L, 1L, 2L, 3L).toDF("id")
    val r = Profile.kmvDistinct(tiny, "id", 5).collect()(0)
    assert(r.isNullAt(1) && r.getDouble(2) === 3.0 &&
      r.getLong(3) === 3L && r.getDouble(4) === 0.0)
    val big = spark.range(2000).toDF("id")
    val r2 = Profile.kmvDistinct(big, "id", 64).collect()(0)
    assert(r2.getLong(3) === 2000L)
    assert(r2.getDouble(4) < 0.35,
      s"KMV k=64 should estimate 2000 within ~35%: got ${r2.getDouble(2)}")
  }

  test("corrMatrix: perfect linear +1/-1, constant column NULL, pairwise n") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0, 7.0), (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0)).toDF("x", "y2x", "neg", "c")
    val got = Profile.corrMatrix(df, Seq("x", "y2x", "neg", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(("x", "y2x")) === ((3L, Some(1.0))))
    assert(got(("x", "neg")) === ((3L, Some(-1.0))))
    assert(got(("x", "c")) === ((3L, None)), "zero variance → NULL r")
  }

  test("parseTimestamps: ordered formats win, unparsed and null labeled") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(Some("2024-01-02 03:04:05"), Some("2024/01/02 03:04:05"),
      Some("garbage"), None).toDF("raw")
    val got = Normalize.parseTimestamps(df, "raw",
      Seq("yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd HH:mm:ss")).collect()
    assert(got(0).getString(2) === "yyyy-MM-dd HH:mm:ss")
    assert(got(1).getString(2) === "yyyy/MM/dd HH:mm:ss")
    assert(got(0).getTimestamp(1) === got(1).getTimestamp(1),
      "both formats decode the same instant")
    assert(got(2).isNullAt(1) && got(2).getString(2) === "<unparsed>")
    assert(got(3).isNullAt(1) && got(3).getString(2) === "<null>")
  }

  test("mrrAtK and precisionRecallAtK: hand-built ranking") {
    val spark = SparkSpec.session
    import spark.implicits._
    // group g1: scores 9,8,7 — relevant at rank 2 → rr 0.5
    // group g2: no relevant in top-2 (k=2), relevant at rank 3 → rr 0
    val df = Seq(
      ("g1", 1L, 9.0, false), ("g1", 2L, 8.0, true), ("g1", 3L, 7.0, true),
      ("g2", 4L, 9.0, false), ("g2", 5L, 8.0, false), ("g2", 6L, 7.0, true)
    ).toDF("g", "id", "score", "rel")
    val mrr = Profile.mrrAtK(df, "g", "id", "score", "rel", k = 2).collect()(0)
    assert(mrr.getLong(0) === 2L)
    assert(mrr.getDouble(1) === 0.25) // (0.5 + 0)/2
    val pr = Profile.precisionRecallAtK(df, "g", "id", "score", "rel", k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(pr("g1") === ((2L, 1L, 0.5, Some(0.5))))
    assert(pr("g2") === ((1L, 0L, 0.0, Some(0.0))))
  }

  test("precisionRecallAtK: zero relevant in group → recall NULL, not 0/0") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(("g", 1L, 1.0, false)).toDF("g", "id", "score", "rel")
    val r = Profile.precisionRecallAtK(df, "g", "id", "score", "rel", 5)
      .collect()(0)
    assert(r.getLong(1) === 0L && r.isNullAt(4))
  }

  test("confusionStats: hand counts, metrics, null rows counted out") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq[(Option[Boolean], Option[Boolean])](
      (Some(true), Some(true)), (Some(true), Some(true)),   // tp 2
      (Some(true), Some(false)),                            // fp 1
      (Some(false), Some(true)),                            // fn 1
      (Some(false), Some(false)), (Some(false), Some(false)), // tn 2
      (None, Some(true)), (Some(true), None)                // null 2
    ).toDF("p", "l")
    val r = Profile.confusionStats(df, "p", "l").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 1L, 1L, 2L, 2L)))
    assert(r.getDouble(5) === 0.666667) // accuracy 4/6
    assert(r.getDouble(6) === 0.666667) // precision 2/3
    assert(r.getDouble(7) === 0.666667) // recall 2/3
    assert(r.getDouble(8) === 0.666667) // f1 (p==r)
  }

  test("confusionStats: degenerate all-negative predictions → NULL precision/f1") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((false, true), (false, false)).toDF("p", "l")
    val r = Profile.confusionStats(df, "p", "l").collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(8))
    assert(r.getDouble(7) === 0.0) // recall 0/1 = 0
  }

  test("associationRules: independence → lift 1, perfect pairing → lift k") {
    val spark = SparkSpec.session
    import spark.implicits._
    // independent: every (a,b) combination equally likely → lift 1
    val ind = (for { a <- Seq("a1", "a2"); b <- Seq("b1", "b2") }
      yield (a, b)).toDF("x", "y")
    val li = Profile.associationRules(ind, "x", "y").collect()
    assert(li.forall(_.getDouble(5) === 1.0))
    // perfectly paired: a1↔b1, a2↔b2 → lift 2, confidence 1
    val dep = Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"), ("a2", "b2"))
      .toDF("x", "y")
    val ld = Profile.associationRules(dep, "x", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(ld(("a1", "b1")) === ((2L, 0.5, 1.0, 2.0)))
    assert(ld(("a2", "b2")) === ((2L, 0.5, 1.0, 2.0)))
    // minSupport prunes but denominators stay whole-frame
    val pruned = Profile.associationRules(dep, "x", "y", minSupport = 0.6)
    assert(pruned.count() === 0)
  }

  test("wasserstein1ByGroup: hand-computed masses, identity is zero") {
    val spark = SparkSpec.session
    import spark.implicits._
    // values 0..10 in 5 bins (width 2): a = [1,1,9], b = [5];
    // baseline = all 4. Cumulative gaps: a → (1/3 + 1/6)·2 = 1.0,
    // b → (0.5·2 + 0.25·2)·2 = 3.0 (hand-computed)
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 9.0), ("b", 5.0))
      .toDF("g", "v")
    val base = Drift.numericHistogram(df, "v", 0.0, 10.0, 5)
    val m = Drift.wasserstein1ByGroup(df, "g", "v", base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a") === ((3L, 1.0)))
    assert(m("b") === ((1L, 3.0)))
    // a single group IS the baseline → W1 = 0
    val one = Seq(("x", 1.0), ("x", 9.0)).toDF("g", "v")
    val b1 = Drift.numericHistogram(one, "v", 0.0, 10.0, 5)
    val r1 = Drift.wasserstein1ByGroup(one, "g", "v", b1).collect()(0)
    assert(r1.getDouble(2) === 0.0)
  }

  test("holtLinear: hand-computed recursion and horizon row") {
    val spark = SparkSpec.session
    import spark.implicits._
    // daily counts [2,4,5,3] with alpha=0.5, beta=0.25:
    // levels [2,4,5.5,5.1875], trends [2,2,1.875,1.328125],
    // fitted [2,4,6,7.375], horizon 6.515625 (hand-computed)
    val ts = Seq("2024-01-01" -> 2, "2024-01-02" -> 4,
      "2024-01-03" -> 5, "2024-01-04" -> 3)
      .flatMap { case (d, n) => Seq.fill(n)(d + " 12:00:00") }
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val rows = Drift.holtLinear(ts, "ts").collect()
    assert(rows.length === 5)
    val byDay = rows.filter(!_.isNullAt(0))
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(byDay("2024-01-01") === ((2L, 2.0, 2.0, 2.0)))
    assert(byDay("2024-01-02") === ((4L, 4.0, 2.0, 4.0)))
    assert(byDay("2024-01-03") === ((5L, 5.5, 1.875, 6.0)))
    assert(byDay("2024-01-04") === ((3L, 5.1875, 1.328125, 7.375)))
    val horizon = rows.filter(_.isNullAt(0))
    assert(horizon.length === 1 && horizon(0).getDouble(4) === 6.515625)
    // single-day series: trend init 0, horizon = the level
    val single = Seq("2024-01-01 12:00:00", "2024-01-01 13:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val sr = Drift.holtLinear(single, "ts").collect()
    assert(sr.length === 2 && sr(0).getDouble(3) === 0.0 &&
      sr(1).getDouble(4) === 2.0)
  }

  test("changedColumns: per-column attribution incl. value<->NULL") {
    val spark = SparkSpec.session
    import spark.implicits._
    val oldDf = Seq((1L, Option("a"), Option("x")),
      (2L, Option("b"), Option.empty[String]),
      (3L, Option("c"), Option("z"))).toDF("id", "u", "v")
    val newDf = Seq((1L, Option("a"), Option("x")),   // unchanged
      (2L, Option("b"), Option("y")),                 // v: NULL -> y
      (3L, Option("C"), Option("z")),                 // u: c -> C
      (4L, Option("d"), Option("w"))).toDF("id", "u", "v") // added (no rows)
    val out = graft.operators.SnapshotDiff
      .changedColumns(oldDf, newDf, "id", Seq("u", "v"))
      .orderBy("id", "column").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))
    assert(out.toSeq === Seq(
      (2L, "v", None, Some("y")),
      (3L, "u", Some("c"), Some("C"))))
  }

  test("groupRobustFence: per-group fences, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // g=a: [1,2,3,4,100] → med 3, mad 1.4826... abs devs [2,1,0,1,97]
    //   → mad 1; fence 3 ± 3.5·1.4826·1 = [−2.1891, 8.1891] → 1 outlier
    // g=b: [10,10] → med 10, mad 0 → degenerate fence flags any dev
    val df = ds(Seq(1, 2, 3, 4, 100).map(v => ("a", v.toDouble)) ++
      Seq(10, 10).map(v => ("b", v.toDouble)): _*)
    val m = Profile.groupRobustFence(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(6))).toMap
    assert(m("a") === ((5L, 3.0, 1.0, 1L)))
    assert(m("b") === ((2L, 10.0, 0.0, 0L)))
    // exact and approx agree at tiny n
    val ap = Profile.groupRobustFence(df, "g", "v", exact = false)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ap("a") === 3.0 && ap("b") === 10.0)
  }

  test("uncertaintySample: margin ordering matches |log-odds|") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "the the the the"), (2L, "zz zz zz"),
      (3L, "a b c d e f g h")).toDF("id", "text")
    val w = Map("n_words" -> 0.5)
    val out = graft.operators.TextAnalysis
      .uncertaintySample(df, "id", "text", bias = -2.0, w, k = 3).collect()
    // null text (unscorable) must sort LAST, never top the sample
    val dirty = df.unionByName(Seq((9L, null.asInstanceOf[String]))
      .toDF("id", "text"))
    val d = graft.operators.TextAnalysis
      .uncertaintySample(dirty, "id", "text", bias = -2.0, w, k = 4)
      .collect()
    assert(d.last.getLong(0) === 9L && d.last.isNullAt(2))
    // log-odds = 0.5·n_words − 2: id1/id3 → 0 margin... n_words 4 → 0,
    // 3 → −0.5, 8 → 2: order by |lo| = [id1(0), id2(0.5), id3(2)]
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).getDouble(2) === 0.0 && out(1).getDouble(2) === 0.5)
  }

  test("rollingDistinct: gap-correct RANGE window, sketch exact at test scale") {
    val spark = SparkSpec.session
    import spark.implicits._
    // d1 {1,2}, d2 {2,3}, d4 {1} with window 2: d4's window is d3..d4,
    // so d2 must NOT leak in (a ROWS frame would stretch across the gap)
    val df = Seq(("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 2L), ("2024-01-02", 3L), ("2024-01-04", 1L))
      .toDF("s", "u").select(to_timestamp(col("s")).as("ts"), col("u"))
    val m = Profile.rollingDistinct(df, "ts", "u", windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m("2024-01-01") === ((2L, 2L)))
    assert(m("2024-01-02") === ((2L, 3L)))
    assert(m("2024-01-04") === ((1L, 1L))) // gap-correct: NOT 3
  }

  test("rollingDistinct / sketchOverlap: exact past the lgK-12 coupon limit") {
    val spark = SparkSpec.session
    import spark.implicits._
    // 5000 distinct keys busts lgConfigK=12 coupon capacity (~1.5k) —
    // the sf0.1 regression class: default lgK must keep the sketch in
    // coupon (exact) mode at test scale, here well past 1.5k per day
    // and across the 2-day rolling union
    val df = (0L until 5000L).map(k =>
        (if (k % 2 == 0) "2024-01-01" else "2024-01-02", k))
      .toDF("s", "u").select(to_timestamp(col("s")).as("ts"), col("u"))
    val m = Profile.rollingDistinct(df, "ts", "u", windowDays = 2)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m("2024-01-01") === ((2500L, 2500L)))
    assert(m("2024-01-02") === ((2500L, 5000L)))
    val ov = Seq.tabulate(2500)(i => ("a", i.toLong)) ++
      Seq.tabulate(2500)(i => ("b", i.toLong + 1000L))
    val o = Profile.sketchOverlap(ov.toDF("g", "k"), "g", "k").collect()
    assert(o.length === 1)
    assert((o(0).getLong(2), o(0).getLong(3), o(0).getLong(4),
      o(0).getLong(5)) === ((2500L, 2500L, 3500L, 1500L)))
  }

  test("twoProportionZ: pooled z vs complement, degenerate pool NULL") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: 2/4, b: 4/4 → pool .75, se = sqrt(.75·.25·.5) = .306186,
    // z_a = -1.632993, z_b = +1.632993 (hand-computed)
    val df = Seq(("a", 150L), ("a", 250L), ("a", 100L), ("a", 300L),
      ("b", 201L), ("b", 202L), ("b", 203L), ("b", 204L))
      .toDF("g", "n_chars")
    val m = Drift.twoProportionZ(df, "g", col("n_chars") >= 200).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(m("a") === ((4L, 2L, 0.5, -1.632993)))
    assert(m("b") === ((4L, 4L, 1.0, 1.632993)))
    // pool = 1 (every row passes) → untestable, NULL z
    val all = Seq(("a", 300L), ("b", 300L)).toDF("g", "n_chars")
    val rows = Drift.twoProportionZ(all, "g", col("n_chars") >= 200)
      .collect()
    assert(rows.forall(_.isNullAt(4)))
  }

  test("totalVariation: hand-computed, novel category floor-free") {
    import graft.operators.Drift.CategoricalProfile
    // p = (.75, .25, 0) vs q = (.25, .25, .5) → TV = (.5 + 0 + .5)/2
    val a = CategoricalProfile(Map("x" -> 3L, "y" -> 1L))
    val b = CategoricalProfile(Map("x" -> 1L, "y" -> 1L, "z" -> 2L))
    assert(Drift.totalVariation(a, b) === 0.5)
    assert(Drift.totalVariation(a, a) === 0.0)
  }

  test("mutualInformation: dependence ln2, independence 0, degenerate NULL") {
    val spark = SparkSpec.session
    import spark.implicits._
    // x == y deterministic → MI = H(X) = H(Y) = ln 2, both U = 1
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val d = Profile.mutualInformation(dep, "x", "y").collect()(0)
    assert(d.getLong(0) === 4L && d.getDouble(1) === 0.693147)
    assert(d.getDouble(4) === 1.0 && d.getDouble(5) === 1.0)
    // full independence → MI 0
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("x", "y")
    val i = Profile.mutualInformation(ind, "x", "y").collect()(0)
    assert(i.getDouble(1) === 0.0 && i.getDouble(4) === 0.0)
    // constant x → H(X) = 0 → U(X|Y) undefined (NULL), U(Y|X) = 0
    val const = Seq(("k", "a"), ("k", "b")).toDF("x", "y")
    val c = Profile.mutualInformation(const, "x", "y").collect()(0)
    assert(c.isNullAt(4) && c.getDouble(5) === 0.0)
  }

  test("captureRecapture: Chapman estimate, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6} → N̂ = 5·5/3 − 1 = 7.333333,
    // coverage_a = 4/7.333333 = 0.545455
    val a = Seq(1L, 2L, 3L, 4L).toDF("k")
    val b = Seq(3L, 4L, 5L, 6L).toDF("k")
    val r = Profile.captureRecapture(a, b, "k").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 4L, 2L)))
    assert(r.getDouble(3) === 7.333333 && r.getDouble(4) === 0.545455)
  }

  test("decayedVolume: half-life weighting from the corpus's own newest day") {
    val spark = SparkSpec.session
    import spark.implicits._
    // group a: 2 events on the ref day + 1 event 7 days back →
    // mass 2 + 0.5 = 2.5, freshness 2.5/3 = 0.833333
    val df = Seq(("a", "2024-01-08"), ("a", "2024-01-08"),
      ("a", "2024-01-01"), ("b", "2024-01-01"))
      .toDF("g", "s").select(col("g"), to_timestamp(col("s")).as("ts"))
    val m = Drift.decayedVolume(df, "ts", "g", halfLifeDays = 7.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m("a") === ((3L, 2.5, 0.833333)))
    assert(m("b") === ((1L, 0.5, 0.5))) // dead-archive group decays
  }

  test("normalizationGain: disguised copies caught only after canonicalization") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "Hello World"), (2L, "hello   world "),
      (3L, "unique"), (4L, "unique")).toDF("id", "text")
    val r = graft.operators.Dedup.normalizationGain(df, "id", "text")
      .collect()(0)
    // raw: only the exact "unique" pair; normalized adds the case/ws pair
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 4L, 2L)))
  }

  test("ucbAllocation: exploration bonus outranks a barely-seen arm") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: [1,1], b: [2], N=3 → ucb_a = 1 + √(2ln3/2) = 2.048147,
    // ucb_b = 2 + √(2ln3) = 3.482304 (hand-computed)
    val df = Seq(("a", Option(1.0)), ("a", Option(1.0)),
      ("b", Option(2.0)), ("c", Option.empty[Double])).toDF("g", "r")
    val out = graft.operators.Mixing.ucbAllocation(df, "g", "r").collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(m("a") === ((2L, Some(2.048147))))
    assert(m("b") === ((1L, Some(3.482304))))
    assert(m("c") === ((0L, None))) // unscored arm: no evidence, NULL
    assert(out.map(_.getString(0)).take(2).toSeq === Seq("b", "a"))
  }

  test("paretoFrontier: dominance incl. same-x and duplicate points") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 8L, 7.0),
      (4L, 6L, 9.0), (5L, 5L, 1.0), (6L, 10L, 7.0)).toDF("id", "x", "y")
    val out = graft.operators.Selection.paretoFrontier(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    // id3 (8,7) dominated by (10,7); id1 by same-x (10,7); id5 by all;
    // duplicates (2,6) both survive (neither strictly dominates)
    assert(out === Set(2L, 4L, 6L))
  }

  test("transitionEntropy: deterministic state machine is predictability 1") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a→b→a→b: H(next|cur)=0, H(next) = H(2/3,1/3) = 0.636514
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (1L, 4L, "b")).toDF("u", "eid", "t")
      .withColumn("ts", timestamp_micros(col("eid") * 1000000L))
    val r = graft.operators.Sessionize
      .transitionEntropy(df, "u", "ts", "t", "eid").collect()(0)
    assert(r.getLong(0) === 3L && r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === 0.636514 && r.getDouble(3) === 1.0)
    // single event type → degenerate marginal → NULL predictability
    val one = Seq((1L, 1L, "a"), (1L, 2L, "a")).toDF("u", "eid", "t")
      .withColumn("ts", timestamp_micros(col("eid") * 1000000L))
    val o = graft.operators.Sessionize
      .transitionEntropy(one, "u", "ts", "t", "eid").collect()(0)
    assert(o.isNullAt(3))
  }

  test("kishEss: effective n under weights, invalid weights counted") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: [1,1,1] → ess 3, ratio 1; b: [3,1] → 16/10 = 1.6, ratio 0.8;
    // c: [2, 0, null] → invalid 2, ess over the single valid weight
    val df = Seq(("a", Option(1.0)), ("a", Option(1.0)), ("a", Option(1.0)),
      ("b", Option(3.0)), ("b", Option(1.0)),
      ("c", Option(2.0)), ("c", Option(0.0)), ("c", Option.empty[Double]))
      .toDF("g", "w")
    val m = Profile.kishEss(df, "g", "w").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(m("a") === ((3L, 0L, 3.0, 1.0)))
    assert(m("b") === ((2L, 0L, 1.6, 0.8)))
    assert(m("c") === ((3L, 2L, 1.0, 1.0)))
  }

  test("simpsonsCheck: planted paradox — every stratum opposes the pool") {
    val spark = SparkSpec.session
    import spark.implicits._
    // A: (1,10),(2,9); B: (11,20),(12,19): each slope −1, pooled
    // slope 396/404 = +0.980198 → both strata oppose
    val df = Seq(("A", 1.0, 10.0), ("A", 2.0, 9.0),
      ("B", 11.0, 20.0), ("B", 12.0, 19.0)).toDF("g", "x", "y")
    val out = Profile.simpsonsCheck(df, "g", "x", "y").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("A") === ((-1.0, 0.980198, true)))
    assert(out("B") === ((-1.0, 0.980198, true)))
    // zero-variance stratum: NULL slope, never opposes
    val dg = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0),
      ("C", 5.0, 1.0), ("C", 5.0, 9.0)).toDF("g", "x", "y")
    val c = Profile.simpsonsCheck(dg, "g", "x", "y").collect()
      .find(_.getString(0) == "C").get
    assert(c.isNullAt(2) && !c.getBoolean(4))
  }

  test("inBatchCollisions: single batch counts all same-group pairs") {
    val spark = SparkSpec.session
    import spark.implicits._
    // one batch: a×3, b×2 → same pairs 3+1 = 4 of C(5,2) = 10
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "g")
    val r = graft.operators.Mixing
      .inBatchCollisions(df, "id", "g", nBatches = 1).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((5L, 1L, 4L, 10L, 0.4)))
  }

  test("maskPlan: deterministic positions, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // key 0, seed 0, rate 15, n_tok 8: (i·2654435761) % 100 =
    // [0,61,22,83,44,5,66,27] → positions {0,5} mask → 2/8 = 0.25
    val df = Seq(("d0", 0L, 8)).toDF("id", "k", "n_tok")
    val r = graft.operators.Packing
      .maskPlan(df, "id", "k", "n_tok", ratePct = 15).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((8L, 2L, 0.25)))
    // zero-length sequence: 0 masked, NULL rate (not NaN)
    val z = Seq(("d1", 1L, 0)).toDF("id", "k", "n_tok")
    val rz = graft.operators.Packing
      .maskPlan(z, "id", "k", "n_tok").collect()(0)
    assert(rz.getLong(2) === 0L && rz.isNullAt(3))
  }

  test("sourceExclusivity: unique-word mass per source, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: "x y z" (y, z exclusive), b: "x w" (w exclusive)
    val df = Seq(("a", "x y z"), ("b", "x w")).toDF("src", "text")
    val m = graft.operators.TextAnalysis
      .sourceExclusivity(df, "src", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m("a") === ((3L, 2L, 3L, 2L, 0.666667)))
    assert(m("b") === ((2L, 1L, 2L, 1L, 0.5)))
  }

  test("survivalCurve: product-limit with right-censoring, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // u1 days 1-2 (lifetime 1, churned), u2 day 1 (lifetime 0,
    // churned), u3 days 1-3 (lifetime 2, CENSORED — active on the
    // final day): S = [2/3, 1/3, 1/3]
    val df = Seq((1L, 1), (1L, 2), (2L, 1), (3L, 1), (3L, 3))
      .toDF("u", "day").withColumn("ts", to_timestamp(
        concat(lit("2024-01-0"), col("day"), lit(" 12:00:00"))))
    val rows = graft.operators.Sessionize.survivalCurve(df, "u", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(0L) === ((3L, 1L, 0L, 0.666667)))
    assert(rows(1L) === ((2L, 1L, 0L, 0.333333)))
    assert(rows(2L) === ((1L, 0L, 1L, 0.333333)))
  }

  test("hoeffdingBounds: distribution-free radii, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // n = 2: eps95 = sqrt(ln40/4) = 0.960323, eps99 = sqrt(ln200/4)
    // = 1.150904 — honestly useless radii at n=2, which is the point
    val df = Seq(("a", 250L), ("a", 100L)).toDF("g", "v")
    val r = Drift.hoeffdingBounds(df, "g", col("v") >= 200).collect()(0)
    assert(r.getLong(1) === 2L && r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.960323 && r.getDouble(4) === 1.150904)
  }

  test("ruleLocality: concentrated vs diffuse fallout, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // A: parts [0,0,0,1] → max 0.75, hhi (9+1)/16 = 0.625;
    // B: [0,1] → 0.5 / 0.5
    val v = Seq(("d1", "A", 0), ("d2", "A", 0), ("d3", "A", 0),
      ("d4", "A", 1), ("d5", "B", 0), ("d6", "B", 1))
      .toDF("doc_id", "rule_id", "part")
    val m = graft.operators.ValidationPass.ruleLocality(v, "part")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(m("A") === ((4L, 2L, 0.75, 0.625)))
    assert(m("B") === ((2L, 2L, 0.5, 0.5)))
  }

  test("truncationLoss: mass past the window, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(("a", 5), ("a", 10), ("a", 12), ("b", 3)).toDF("g", "n")
    val m = graft.operators.Packing.truncationLoss(df, "g", "n", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m("a") === ((3L, 2L, 27L, 6L, 0.222222)))
    assert(m("b") === ((1L, 0L, 3L, 0L, 0.0)))
  }

  test("homoglyphGain: Cyrillic-substituted twin caught only folded") {
    val spark = SparkSpec.session
    import spark.implicits._
    // "pax" vs its confusable twin (Cyrillic р, а, х): byte-distinct,
    // fold-identical; plus one raw exact pair
    val df = Seq((1L, "pax"), (2L, "рах"),
      (3L, "same"), (4L, "same")).toDF("id", "text")
    val r = graft.operators.Dedup.homoglyphGain(df, "id", "text")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 2L, 4L, 2L)))
  }

  test("distributionMatchPlan: bottleneck bin keeps all, unmatchable surfaced") {
    val spark = SparkSpec.session
    import spark.implicits._
    // ref A: bins [8, 2, 1]; target B: [2, 8, 0] over lo 0, hi 30, 3
    // bins → s* = bin0's 0.275, keep = [1, 0.0625, 0], bin2 unmatchable
    val rows = Seq.fill(8)(("A", 1)) ++ Seq.fill(2)(("A", 11)) ++
      Seq(("A", 21)) ++ Seq.fill(2)(("B", 1)) ++ Seq.fill(8)(("B", 11))
    val df = rows.toDF("g", "v")
    val m = graft.operators.Mixing.distributionMatchPlan(df, "g", "v",
      "A", "B", 0.0, 30.0, 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4),
        r.getBoolean(5))).toMap
    assert(m(0L) === ((1.0, 2L, false)))
    assert(m(1L) === ((0.0625, 1L, false)))
    assert(m(2L) === ((0.0, 0L, true)))
  }

  test("contextualRare: globally-common value rare in one group flags") {
    val spark = SparkSpec.session
    import spark.implicits._
    val rows = Seq.fill(9)(("g1", "x")) ++ Seq(("g1", "y")) ++
      Seq.fill(9)(("g2", "y")) ++ Seq(("g2", "x"))
    val out = Profile.contextualRare(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out(("g1", "y")) === ((0.5, 0.2, true)))  // lift 0.2 < 0.25
    assert(out(("g1", "x")) === ((0.5, 1.8, false)))
    assert(out(("g2", "x")) === ((0.5, 0.2, true)))
  }

  test("trendByGroup: Sen slope robust on zero-filled series") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: [1,2,3] → +1; b: [3,2,1] → −1; c: [4,0,2] (gap-filled day 2)
    // → slopes {−4, −1, 2} → median −1
    val rows = Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3),
      ("b", 1, 3), ("b", 2, 2), ("b", 3, 1),
      ("c", 1, 4), ("c", 3, 2)).flatMap { case (g, day, n) =>
        Seq.fill(n)((g, day)) }
    val df = rows.toDF("g", "day").withColumn("ts", to_timestamp(
      concat(lit("2024-01-0"), col("day"), lit(" 12:00:00"))))
    val m = graft.operators.Sessionize.trendByGroup(df, "ts", "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a") === ((3L, 1.0)))
    assert(m("b") === ((3L, -1.0)))
    assert(m("c") === ((3L, -1.0)))
  }

  test("bootstrapDelta: identical ids draw identical weights") {
    val spark = SparkSpec.session
    import spark.implicits._
    // same ids in both groups → identical Poisson draws per replicate:
    // equal values ⇒ delta exactly 0; shifted values ⇒ delta exactly
    // the shift, replicate by replicate
    val base = (1L to 5L).map(i => (i, "a", (i * 10).toDouble))
    val same = base ++ base.map { case (i, _, v) => (i, "b", v) }
    val d0 = Profile.bootstrapDelta(same.toDF("id", "g", "v"), "id",
      "v", "g", "a", "b", nBoot = 8, seed = 7L, hashKey = false)
      .collect()
    assert(d0.length === 8 && d0.forall(_.getDouble(3) === 0.0))
    val shift = base ++ base.map { case (i, _, v) => (i, "b", v + 100.0) }
    val d1 = Profile.bootstrapDelta(shift.toDF("id", "g", "v"), "id",
      "v", "g", "a", "b", nBoot = 8, seed = 7L, hashKey = false)
      .collect()
    assert(d1.forall(_.getDouble(3) === -100.0))
  }

  test("dispersionIndex: Poisson-flat vs bursty days, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: [2,2] → var 0 → D 0; b: [0,6] (zero-filled gap) → var 18,
    // mean 3 → D 6 → flagged
    val df = (Seq(("a", 1), ("a", 1), ("a", 2), ("a", 2)) ++
      Seq.fill(6)(("b", 2))).toDF("g", "day")
      .withColumn("ts", to_timestamp(
        concat(lit("2024-01-0"), col("day"), lit(" 12:00:00"))))
    val m = graft.operators.Sessionize.dispersionIndex(df, "ts", "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(m("a") === ((2L, 2.0, 0.0, false)))
    assert(m("b") === ((2L, 3.0, 6.0, true)))
  }

  test("fisherSeparability: separated clouds, hand-computed") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a: (0,0),(0,2) → mean (0,1), trace 1; b: (10,0),(10,2) →
    // mean (10,1), trace 1 → dist2 100, J = 50
    val df = Seq((0, Seq(0f, 0f)), (0, Seq(0f, 2f)),
      (1, Seq(10f, 0f)), (1, Seq(10f, 2f))).toDF("label", "vec")
    val r = graft.operators.EmbeddingStats.fisherSeparability(df, "label", "vec")
      .collect()(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5)) === (("0", "1", 2L, 2L, 100.0, 50.0)))
  }

  test("olsResiduals: closed-form fit, degenerate x, null exclusion") {
    val spark = SparkSpec.session
    import spark.implicits._
    // (1,2),(2,4),(3,7): slope 2.5, intercept -2/3 → residuals
    // [1/6, -1/3, 1/6]; top |residual| is x=2 (hand-computed)
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 7.0))
      .toDF("id", "x", "y")
    val out = Profile.olsResiduals(df, Seq("id"), "x", "y", k = 3).collect()
    assert(out(0).getLong(0) === 2L && out(0).getDouble(3) === -0.333333)
    val m = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) === 0.166667 && m(3L) === 0.166667)
    // constant x → slope 0, intercept = mean(y); residuals y - ȳ
    val const = Seq((1L, 5.0, 1.0), (2L, 5.0, 3.0)).toDF("id", "x", "y")
    val co = Profile.olsResiduals(const, Seq("id"), "x", "y", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(co(1L) === -1.0 && co(2L) === 1.0)
    // null x: excluded from the fit, NULL residual sorts last
    val wNull = Seq((1L, Option(1.0), 2.0), (2L, Option(2.0), 4.0),
      (3L, Option(3.0), 7.0), (4L, Option.empty[Double], 9.0))
      .toDF("id", "x", "y")
    val nr = Profile.olsResiduals(wNull, Seq("id"), "x", "y", k = 4).collect()
    assert(nr.last.getLong(0) === 4L && nr.last.isNullAt(3))
    assert(nr(0).getLong(0) === 2L) // fit unchanged by the null row
  }

  test("kendallTau: textbook tau-b with ties") {
    val spark = SparkSpec.session
    import spark.implicits._
    // x = [1,2,3,4,5], y = [2,1,4,4,5]:
    // pairs: 10; concordant = 8, discordant = 1 ((1,2) vs (2,1)),
    // one y-tie (4,4): n1 = 0, n2 = 1
    // tau_b = (8-1)/sqrt(10 * 9) = 0.737865
    val df = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 4L), (5L, 5L))
      .toDF("x", "y")
    val r = Profile.kendallTau(df, "x", "y").collect()(0)
    assert(r.getLong(0) == 5 && r.getLong(1) == 8 && r.getLong(2) == 1)
    assert(r.getLong(3) == 0 && r.getLong(4) == 1)
    assert(math.abs(r.getDouble(5) - 7.0 / math.sqrt(90.0)) < 1e-6)
    // Goodman-Kruskal gamma ignores the tie: (8-1)/(8+1)
    assert(math.abs(r.getDouble(6) - 7.0 / 9.0) < 1e-6)
  }

  test("empiricalBernsteinBounds: variance shrinks the radius at skewed p") {
    val spark = SparkSpec.session
    import spark.implicits._
    // skewed group: 200/10000 -> Bernstein beats Hoeffding (the
    // additive 3 ln3/n term needs n in the thousands to get out of
    // the way); balanced group stays near the Hoeffding worst case
    val rows = Seq.fill(200)(("skew", 1)) ++
      Seq.fill(9800)(("skew", 0)) ++
      Seq.fill(5000)(("bal", 1)) ++ Seq.fill(5000)(("bal", 0))
    val out = Drift.empiricalBernsteinBounds(
        rows.toDF("g", "s"), "g", col("s") === 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val sk = out("skew")
    val n = 10000.0; val k = 200.0
    val v = k * (n - k) / (n * (n - 1.0))
    val ln3 = math.log(3.0 / 0.05)
    val expected = math.sqrt(2.0 * v * ln3 / n) + 3.0 * ln3 / n
    assert(math.abs(sk.getDouble(4) - expected) < 1e-6)
    assert(sk.getDouble(4) < sk.getDouble(3)) // tighter than Hoeffding
    assert(out("bal").getDouble(4) > out("skew").getDouble(4))
    // n = 1: variance undefined -> NULL Bernstein, Hoeffding present
    val one = Drift.empiricalBernsteinBounds(
      Seq(("x", 1)).toDF("g", "s"), "g", col("s") === 1).collect()(0)
    assert(one.isNullAt(4) && !one.isNullAt(3))
  }

  test("jackknifeRatio: hand-computed two-day case, single day -> NULL SE") {
    val spark = SparkSpec.session
    import spark.implicits._
    import java.sql.Timestamp
    // day1: x = 10+20 = 30, y = 2; day2: x = 40, y = 1
    // R = 70/3; R_(1) = 40/1, R_(2) = 30/2
    // SE = sqrt(1/2 * ((40-27.5)^2 + (15-27.5)^2)) = 12.5
    val rows = Seq(
      (Timestamp.valueOf("2026-01-01 10:00:00"), 10.0),
      (Timestamp.valueOf("2026-01-01 11:00:00"), 20.0),
      (Timestamp.valueOf("2026-01-02 10:00:00"), 40.0))
    val r = Drift.jackknifeRatio(rows.toDF("ts", "v"), "ts", col("v"))
      .collect()(0)
    assert(r.getLong(0) == 2)
    assert(math.abs(r.getDouble(1) - 70.0 / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 12.5) < 1e-6)
    val single = Drift.jackknifeRatio(
      rows.take(2).toDF("ts", "v"), "ts", col("v")).collect()(0)
    assert(single.getLong(0) == 1 && single.isNullAt(2))
  }

  test("conformalQuantileByGroup: per-group ranks, nulls, clamping") {
    val spark = SparkSpec.session
    import spark.implicits._
    // group a: 1..9 -> k = ceil(10*9/10) = 9 -> q_hat = 9
    // group b: 1..3 -> k0 = ceil(4*9/10) = 4 > 3 -> clamped, q_hat = 3
    // null group key folds to <null>
    val rows = (1L to 9L).map(v => (Some("a"), Some(v))) ++
      (1L to 3L).map(v => (Some("b"), Some(v))) ++
      Seq((None: Option[String], Some(5L)), (Some("a"), None))
    val out = Profile.conformalQuantileByGroup(
        rows.toDF("g", "s"), "g", "s", 1, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 9 && a.getLong(2) == 9 && a.getLong(3) == 9)
    assert(!a.getBoolean(4)) // the null score is excluded, not counted
    val b = out("b")
    assert(b.getBoolean(4) && b.getLong(3) == 3)
    assert(out("<null>").getLong(1) == 1)
  }

  test("psiBreakdown: terms sum to psi, share attributes the drift") {
    val spark = SparkSpec.session
    val obs = Drift.CategoricalProfile(Map("a" -> 50L, "b" -> 50L))
    val base = Drift.CategoricalProfile(Map("a" -> 90L, "b" -> 10L))
    val rows = Drift.psiBreakdown(spark, obs, base).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("b", "a")) // b shifted more
    val termSum = rows.map(_.getDouble(3)).sum
    val psi = Drift.psi(obs, base)
    assert(math.abs(termSum - psi) < 1e-5)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-5)
    // identical profiles: zero terms, NULL shares
    val same = Drift.psiBreakdown(spark, obs, obs).collect()
    assert(same.forall(r => r.getDouble(3) == 0.0 && r.isNullAt(4)))
  }

  test("chao1: hand-computed richness and coverage") {
    val spark = SparkSpec.session
    import spark.implicits._
    import graft.operators.TextAnalysis
    // words: a x2, b x1, c x1 -> N=4, S=3, f1=2, f2=1
    // chao1 = 3 + 2*1/(2*2) = 3.5; coverage = 1 - 2/4 = 0.5
    val df = Seq("a a b", "c").toDF("text")
    val r = TextAnalysis.chao1(df, "text").collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getDouble(4) == 3.5 && r.getDouble(5) == 0.5)
  }

  test("kendallTau: perfect concordance, reversal, constant side") {
    val spark = SparkSpec.session
    import spark.implicits._
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Profile.kendallTau(up, "x", "y").collect()(0).getDouble(5) == 1.0)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Profile.kendallTau(down, "x", "y").collect()(0)
      .getDouble(5) == -1.0)
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    assert(Profile.kendallTau(const, "x", "y").collect()(0).isNullAt(5))
  }

  test("cuped: known covariance structure, constant covariate -> NULL") {
    val spark = SparkSpec.session
    import spark.implicits._
    // y = 2x + noise-free: theta = 2, var_reduction = 1.0
    val exact = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .toDF("pre", "post")
    val r = Drift.cuped(exact, "pre", "post").collect()(0)
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    // independent-ish: hand case x=[1,2], y=[5,5] -> cov 0, theta 0, rho2 0
    val flat = Seq((1.0, 5.0), (2.0, 5.0)).toDF("pre", "post")
    val f = Drift.cuped(flat, "pre", "post").collect()(0)
    assert(f.getDouble(1) == 0.0 && f.isNullAt(2)) // vy = 0 -> NULL rho2
    val const = Seq((3.0, 1.0), (3.0, 2.0)).toDF("pre", "post")
    val c = Drift.cuped(const, "pre", "post").collect()(0)
    assert(c.isNullAt(1) && c.isNullAt(2)) // vx = 0 -> NULL theta
  }

  test("kthSmallestLong: negative values, byte-skip bounds, k=1 fast path") {
    val spark = SparkSpec.session
    import spark.implicits._
    // negatives are where the sign-bit bias bites: min/max must
    // aggregate SIGNED originals, not biased values (regression)
    val vals = Seq(-500L, -3L, 0L, 7L, 250L, 499L)
    val df = vals.toDF("v")
    assert(Profile.kthSmallestLong(df, "v", 1) == -500L)
    assert(Profile.kthSmallestLong(df, "v", 2) == -3L)
    assert(Profile.kthSmallestLong(df, "v", 6) == 499L)
    // explicit bounds give identical answers (shared-agg path)
    assert(Profile.kthSmallestLong(df, "v", 3,
      Some((-500L, 499L))) == 0L)
    val (n, med) = Profile.exactMedianLong(df, "v")
    assert(n == 6 && med.contains((0L + 7L) / 2.0))
  }

  test("bloomPlan: optimal k, fpr curve, first acceptable budget") {
    val spark = SparkSpec.session
    import spark.implicits._
    import graft.operators.Dedup
    val df = (1L to 100L).toDF("id")
    val out = Dedup.bloomPlan(df, "id", targetFpr = 0.01).collect()
      .map(r => r.getInt(0) -> r).toMap
    // b=10: k* = round(10 ln2) = 7, fpr = (1-e^(-0.7))^7 ~ 0.00819
    val ten = out(10)
    assert(ten.getLong(1) == 100 && ten.getLong(2) == 1000)
    assert(ten.getLong(3) == 7)
    val expFpr = math.pow(1.0 - math.exp(-0.7), 7.0)
    assert(math.abs(ten.getDouble(4) - expFpr) < 1e-6)
    assert(ten.getBoolean(5))
    // b=4: k* = 3, fpr ~ 0.147 — not acceptable at 1%
    val four = out(4)
    assert(four.getLong(3) == 3 && !four.getBoolean(5))
  }

  test("conformalQuantile: exact rank, coverage, clamping") {
    val spark = SparkSpec.session
    import spark.implicits._
    val cal = (1L to 9L).toDF("s")
    val tst = (1L to 10L).toDF("s")
    // alpha = 1/2: k = ceil(10/2) = 5 -> q_hat = 5; coverage 5/10
    val r = Profile.conformalQuantile(cal, tst, "s", 1, 2).collect()(0)
    assert(r.getLong(0) == 9 && r.getLong(1) == 5 && r.getLong(2) == 5)
    assert(!r.getBoolean(3) && r.getDouble(6) == 0.5)
    // alpha = 1/10 with n = 3: k0 = ceil(4*9/10) = 4 > 3 -> clamped
    val small = (1L to 3L).toDF("s")
    val c = Profile.conformalQuantile(small, tst, "s", 1, 10).collect()(0)
    assert(c.getBoolean(3) && c.getLong(1) == 3 && c.getLong(2) == 3)
    // integer-rank regression: n = 9, alpha = 1/10 -> k = ceil(10*0.9)
    // must be 9 (the float spelling would overshoot to 10 > n)
    val e = Profile.conformalQuantile(cal, tst, "s", 1, 10).collect()(0)
    assert(e.getLong(1) == 9 && !e.getBoolean(3))
  }

  test("sprtGate: boundaries, llr arithmetic, degenerate baseline") {
    val spark = SparkSpec.session
    import spark.implicits._
    // group 'hot': 9/10 success; 'cold': 1/10 -> pooled p0 = 0.5
    val rows = Seq.fill(9)(("hot", 1)) ++ Seq(("hot", 0)) ++
      Seq(("cold", 1)) ++ Seq.fill(9)(("cold", 0))
    val out = Drift.sprtGate(rows.toDF("g", "s"), "g", col("s") === 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val p0 = 0.5; val p1 = 0.5 * 1.05
    def llr(k: Int, n: Int): Double =
      k * math.log(p1 / p0) + (n - k) * math.log((1 - p1) / (1 - p0))
    assert(math.abs(out("hot").getDouble(4) - llr(9, 10)) < 1e-6)
    assert(math.abs(out("cold").getDouble(4) - llr(1, 10)) < 1e-6)
    assert(out("hot").getDouble(6) ==
      BigDecimal(math.log(0.8 / 0.05)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all-failure corpus: pooled rate 0 -> untestable
    val degen = Seq(("a", 0), ("b", 0)).toDF("g", "s")
    val d = Drift.sprtGate(degen, "g", col("s") === 1).collect()(0)
    assert(d.isNullAt(4) && d.getString(7) == "untestable")
  }
}
