package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Mixing, Profile, TextAnalysis}

/** Split hygiene + feed-contract tier: leakage-safe group-aware splits,
  * temporal embargo splits, schema drift between snapshots, and the
  * per-source boilerplate-prefix detector. */
class SplitHygieneSpec extends AnyFunSuite {

  test("groupAwareSplit: exact duplicates never span splits") {
    val spark = SparkSpec.session
    import spark.implicits._
    // 200 docs over 40 distinct texts (5 copies each) — with 40 groups
    // across a 100-bucket hash, id-hash splitting would almost surely
    // leak; group-hash splitting CANNOT
    val df = (0 until 200).map(i => (i.toLong, s"text-${i % 40}"))
      .toDF("id", "text")
    val split = Mixing.groupAwareSplit(df, "text")
    val leak = Dedup.splitLeakage(split, "text", "split")
      .agg(sum("n_leaked_docs")).head().getLong(0)
    assert(leak === 0L)
    // every doc labeled, all five copies of a text agree
    assert(split.where(col("split").isNull).count() === 0)
    val disagree = split.groupBy("text")
      .agg(countDistinct("split").as("k")).where(col("k") > 1).count()
    assert(disagree === 0L)
  }

  test("groupAwareSplit: fractions realized within hash tolerance; " +
    "null content groups under one split") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, s"unique-$i")).toDF("id", "text")
    val counts = Mixing.groupAwareSplit(df, "text")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 unique groups, 80/10/10 fences: binomial noise ~ ±3σ ≈ ±2.7%
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05, counts)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.04, counts)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.04, counts)
    val withNull = df.withColumn("text",
      when(col("id") % 2 === 0, col("text")).otherwise(lit(null: String)))
    val nullSplits = Mixing.groupAwareSplit(withNull, "text")
      .where(col("text").isNull).select("split").distinct().count()
    assert(nullSplits === 1L, "all NULL-content rows share one split")
  }

  test("groupAwareSplit: malformed fraction fences rejected") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Mixing.groupAwareSplit(df, "text", Seq(("train", 90))) // ≠ 100
    }
    intercept[IllegalArgumentException] {
      Mixing.groupAwareSplit(df, "text",
        Seq(("train", 90), ("val", 80), ("test", 100))) // not ascending
    }
  }

  test("temporalSplit: fence semantics exact at the boundaries") {
    val spark = SparkSpec.session
    import spark.implicits._
    val rows = Seq(
      ("2024-01-22 23:59:59", "train"),   // < cutoff − embargo
      ("2024-01-23 00:00:00", "embargo"), // exactly at lo → embargo
      ("2024-01-23 23:59:59", "embargo"),
      ("2024-01-24 00:00:00", "test"),    // exactly at cutoff → test
      ("2024-01-25 12:00:00", "test"))
    val df = rows.map(_._1).toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"))
    val got = Mixing.temporalSplit(df, "ts", "2024-01-24 00:00:00", 86400L)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), col("split"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (ts, want) => assert(got(ts) === want, ts) }
    // NULL ts → NULL split (surfaced, not dropped)
    val n = Mixing.temporalSplit(
      Seq((1L, None: Option[java.sql.Timestamp])).toDF("id", "ts"),
      "ts", "2024-01-24 00:00:00", 0L).head()
    assert(n.isNullAt(1))
    intercept[IllegalArgumentException] {
      Mixing.temporalSplit(df, "ts", "2024-01-24 00:00:00", -1L)
    }
  }

  test("schemaDrift: all five statuses from a hand-built pair") {
    val spark = SparkSpec.session
    import spark.implicits._
    val oldDf = Seq(
      ("1", "x", "10", "t"), ("2", "y", "11", "f"), ("3", null, "12", "t"))
      .toDF("id", "gone", "num", "flagish")
    // num becomes fractional (type change), flagish stays string-ish but
    // goes 1/3 → 3/3 null? no — null RATE shift: 0/3 → 2/3
    val newDf = Seq(
      ("1", "10.5", "t", "a"), ("2", "11", null, "b"), ("3", "12", null, "c"))
      .toDF("id", "num", "flagish", "fresh")
    val got = Profile.schemaDrift(oldDf, newDf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("id") === "unchanged")
    assert(got("gone") === "removed")
    assert(got("fresh") === "added")
    assert(got("num") === "type_changed") // bigint → double
    assert(got("flagish") === "null_shift") // 0 → 2/3 nulls, same type
  }

  test("schemaDrift: null-rate shift below tolerance is unchanged") {
    val spark = SparkSpec.session
    import spark.implicits._
    val oldDf = (1 to 100).map(i => Tuple1(s"v$i")).toDF("c")
    val newDf = (1 to 100).map(i =>
      Tuple1(if (i <= 3) null else s"v$i")).toDF("c")
    val r = Profile.schemaDrift(oldDf, newDf, nullShiftTol = 0.05).head()
    assert(r.getString(1) === "unchanged") // 3% < 5% tolerance
    val r2 = Profile.schemaDrift(oldDf, newDf, nullShiftTol = 0.01).head()
    assert(r2.getString(1) === "null_shift")
  }

  test("prefixBoilerplate: modal prefix, share, deterministic tie-break") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(
      // siteA: 3 of 4 docs share the banner prefix → share .75
      ("siteA", "COOKIE BANNER first"), ("siteA", "COOKIE BANNER second"),
      ("siteA", "COOKIE BANNER third"), ("siteA", "organic text"),
      // siteB: a 2-2 tie — lexicographically smaller prefix must win
      ("siteB", "bbb same"), ("siteB", "bbb same"),
      ("siteB", "aaa same"), ("siteB", "aaa same"))
      .toDF("source", "text")
    val got = TextAnalysis.prefixBoilerplate(df, "source", "text",
        k = 13, minShare = 0.5).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got("siteA") === (("COOKIE BANNER", 3L, 0.75, true)))
    assert(got("siteB")._1 === "aaa same") // tie → lexicographic
    assert(got("siteB")._3 === 0.5)
    assert(got("siteB")._4 === true)
  }

  test("prefixBoilerplate: short and NULL texts keep their denominator") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(("s", Some("ab")), ("s", Some("ab")), ("s", None),
        ("s", Some("a much longer document text here")))
      .toDF("source", "text")
    val r = TextAnalysis.prefixBoilerplate(df, "source", "text",
      k = 8, minShare = 0.5).head()
    // modal prefix 'ab' (2 of 4) — share uses ALL 4 docs incl. the NULL
    assert(r.getString(1) === "ab" && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 0.5)
  }

  test("stratifiedFolds: exact balance by construction, deterministic") {
    val spark = SparkSpec.session
    import spark.implicits._
    // strata of 7 and 5 rows, k=3 → cell sizes {3,2,2} and {2,2,1}
    val df = ((1L to 7L).map(i => (i, "a")) ++ (8L to 12L).map(i => (i, "b")))
      .toDF("id", "g")
    val folds = Mixing.stratifiedFolds(df, "id", "g", k = 3)
    val bal = Mixing.foldBalance(folds, "g").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(Seq(bal(("a", 0)), bal(("a", 1)), bal(("a", 2))).sorted ===
      Seq(2L, 2L, 3L))
    assert(Seq(bal(("b", 0)), bal(("b", 1)), bal(("b", 2))).sorted ===
      Seq(1L, 2L, 2L))
    // deterministic under repartition
    val again = Mixing.stratifiedFolds(df.repartition(7), "id", "g", k = 3)
    assert(folds.orderBy("id").collect().toSeq ===
      again.orderBy("id").collect().toSeq)
    // fractional key type guard fires
    val frac = Seq((1.5, "a")).toDF("id", "g")
    val e = intercept[IllegalArgumentException](
      Mixing.stratifiedFolds(frac, "id", "g", k = 2))
    assert(e.getMessage.contains("fractional"))
  }
}
