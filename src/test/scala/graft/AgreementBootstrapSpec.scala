package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Drift, Profile, WebFilter}

/** Hand-computed checks for the agreement/uncertainty tier:
  * Krippendorff's alpha (nominal, multi-rater, missing data), the
  * online Poisson bootstrap, and EB-shrunk host quality. */
class AgreementBootstrapSpec extends AnyFunSuite {

  private def ratings(rows: (Int, Int, String)*) = {
    val spark = SparkSpec.session
    import spark.implicits._
    rows.toSeq.toDF("item", "rater", "value")
  }

  test("krippendorffAlpha: Krippendorff's published nominal example") {
    // Krippendorff (2004) §11.3 nominal data, the canonical worked
    // example (also Hayes & Krippendorff 2007 Table 1 reduced): two
    // raters, perfect agreement → alpha 1
    val perfect = ratings((1, 0, "a"), (1, 1, "a"), (2, 0, "b"),
      (2, 1, "b"), (3, 0, "a"), (3, 1, "a"))
    val r = Drift.krippendorffAlpha(perfect, "item", "rater", "value")
      .head()
    assert(r.getDouble(5) === 1.0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L && r.getLong(2) === 6L)
  }

  test("krippendorffAlpha: hand-computed mixed case with a missing cell") {
    // items: 1:(a,a) 2:(a,b) 3:(b) — item 3 has one rating → excluded.
    // Pairable ratings n = 4. Coincidences: item1 → (a,a)+(a,a) w=1
    // each; item2 → (a,b),(b,a) w=1 each. o_aa=2, o_ab=o_ba=1, o_bb=0.
    // n_a = 3, n_b = 1. Do = 2/4 = 0.5.
    // De = (n_a·n_b + n_b·n_a)/(n(n−1)) = 6/12 = 0.5. alpha = 0.
    val df = ratings((1, 0, "a"), (1, 1, "a"), (2, 0, "a"), (2, 1, "b"),
      (3, 0, "b"))
    val r = Drift.krippendorffAlpha(df, "item", "rater", "value").head()
    assert(r.getLong(0) === 3L, "items seen")
    assert(r.getLong(1) === 2L, "items with >= 2 ratings")
    assert(r.getLong(2) === 4L, "pairable ratings")
    assert(r.getDouble(3) === 0.5 && r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === 0.0)
  }

  test("krippendorffAlpha: three raters, weight 1/(m-1) per pair") {
    // one item, raters give (a, a, b): m=3, pairs weighted 1/2:
    // o_aa = 2·(1/2) = 1, o_ab = o_ba = 2·(1/2) = 1... total n = 3.
    // Do = 2/3. n_a = 2, n_b = 1, De = (2·1+1·2)/(3·2) = 2/3 → alpha 0.
    val df = ratings((1, 0, "a"), (1, 1, "a"), (1, 2, "b"))
    val r = Drift.krippendorffAlpha(df, "item", "rater", "value").head()
    assert(r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.666667 && r.getDouble(4) === 0.666667)
    assert(r.getDouble(5) === 0.0)
  }

  test("krippendorffAlpha: single category everywhere → NULL alpha") {
    val df = ratings((1, 0, "a"), (1, 1, "a"), (2, 0, "a"), (2, 1, "a"))
    val r = Drift.krippendorffAlpha(df, "item", "rater", "value").head()
    assert(r.getDouble(3) === 0.0) // observed disagreement zero
    assert(r.isNullAt(4) && r.isNullAt(5), "degenerate De → NULL, not Inf")
  }

  test("consolidateLabels: majority, tie-break, unanimity, abstentions") {
    val df = ratings((1, 0, "a"), (1, 1, "a"), (1, 2, "b"), // majority a
      (2, 0, "b"), (2, 1, "a"),                             // tie → 'a'
      (3, 0, "c"), (3, 1, "c"),                             // unanimous
      (4, 0, "d"), (4, 1, null))                            // null = abstain
    val got = Drift.consolidateLabels(df, "item", "rater", "value")
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(got(1) === (("a", 3L, 2L, 0.666667, false)))
    assert(got(2) === (("a", 2L, 1L, 0.5, false)), "tie → lexicographic")
    assert(got(3) === (("c", 2L, 2L, 1.0, true)))
    assert(got(4) === (("d", 1L, 1L, 1.0, true)), "abstention excluded")
  }

  test("raterAgreement: the dissenter scores below the conformists") {
    // rater 2 disagrees with the consensus on both items
    val df = ratings((1, 0, "a"), (1, 1, "a"), (1, 2, "b"),
      (2, 0, "c"), (2, 1, "c"), (2, 2, "d"))
    val got = Drift.raterAgreement(df, "item", "rater", "value")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0) === ((2L, 2L, 1.0)))
    assert(got(1) === ((2L, 2L, 1.0)))
    assert(got(2) === ((2L, 0L, 0.0)))
  }

  test("bootstrapMeans: replicates vary, weights average ~1, " +
    "deterministic across repartition") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (100 + i % 300).toLong))
      .toDF("id", "v")
    val out = Profile.bootstrapMeans(df, "id", "v", nBoot = 32,
      seed = 7L, hashKey = false).collect()
    assert(out.length === 32)
    val neffs = out.map(_.getLong(1))
    // Poisson(1) weights: Σw ≈ n ± a few σ (σ = √500 ≈ 22), and the
    // replicates must actually DIFFER (the lattice-mix regression)
    assert(neffs.min > 400 && neffs.max < 600, neffs.toSeq)
    assert(neffs.distinct.length > 10, "replicates must differ")
    val means = out.map(_.getDouble(2))
    assert(means.distinct.length > 10)
    // determinism: same result from a different partitioning
    val out2 = Profile.bootstrapMeans(df.repartition(13), "id", "v",
      nBoot = 32, seed = 7L, hashKey = false).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      === out2.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("bootstrapCI: brackets the true mean on a well-behaved sample") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, (i % 101).toLong))
      .toDF("id", "v") // true mean 50
    val r = Profile.bootstrapCI(df, "id", "v", nBoot = 64, seed = 3L,
      hashKey = false).head()
    assert(r.getInt(0) === 64)
    val (lo, hi) = (r.getDouble(2), r.getDouble(3))
    assert(lo < 50.0 && 50.0 < hi, s"CI [$lo, $hi] should cover 50")
    assert(hi - lo < 5.0, s"CI [$lo, $hi] absurdly wide for n=2000")
  }

  test("bootstrapCI: empty input → NULL CI, zero replicates used") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val r = Profile.bootstrapCI(df, "id", "v", nBoot = 8).head()
    assert(r.getInt(0) === 0 && r.isNullAt(1) && r.isNullAt(2) &&
      r.isNullAt(3))
  }

  test("hostQualityShrunk: small hosts pulled to the prior, big hosts " +
    "keep their evidence") {
    val spark = SparkSpec.session
    import spark.implicits._
    // big.com: 200 docs, 50% keep. tiny.com: 2 docs, 100% keep.
    val rows = (0 until 200).map(i =>
        (s"http://big.com/$i", i % 2 == 0)) ++
      Seq(("http://tiny.com/1", true), ("http://tiny.com/2", true))
    val df = rows.toDF("url", "keep")
    val got = WebFilter.hostQualityShrunk(df, "url", "keep",
        priorStrength = 20.0).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // global p0 = 102/202 ≈ 0.50495
    val (rawBig, shrunkBig) = got("big.com")
    val (rawTiny, shrunkTiny) = got("tiny.com")
    assert(rawTiny === 1.0)
    assert(shrunkTiny < 0.6, s"tiny host must shrink hard, got $shrunkTiny")
    assert(math.abs(shrunkBig - rawBig) < 0.01,
      "200-doc host barely moves")
    // exact: (2 + 20·(102/202)) / 22
    val p0 = 102.0 / 202.0
    val want = BigDecimal((2.0 + 20.0 * p0) / 22.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(shrunkTiny === want)
  }
}
