package graft

import org.apache.spark.sql.functions._
import graft.operators.{Continuity, EditDistance}

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("neardupPairs: hand-computed distances, exactly-once per pair") {
    val df = Seq(
      (1L, "kitten"), (2L, "sitten"),   // 1 sub
      (3L, "sittin"),                   // kitten→sittin 2, sitten→sittin 1
      (4L, "kittens"),                  // kitten+1 insert
      (5L, "banana"),                   // far from all
      (6L, "kitten")                    // exact dup of 1
    ).toDF("id", "k")
    val got = EditDistance.neardupPairs(df, "id", "k", maxDist = 2,
        bucketWidth = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 1), (1L, 6L, 0),
      (2L, 3L, 1), (2L, 6L, 1),
      (3L, 6L, 2), // sittin vs kittens is 3 edits — correctly absent
      (2L, 4L, 2), (4L, 6L, 1)))
    // exactly-once: a multiset collect must equal the set size
    val n = EditDistance.neardupPairs(df, "id", "k", 2, 2).count()
    assert(n === got.size.toLong, "a pair was produced more than once")
  }

  test("neardupPairs: differential vs brute force across length buckets") {
    // pseudo-random keys with lengths 4..13 so qualifying pairs straddle
    // bucket boundaries in both directions
    val rows = (0 until 160).map { i =>
      val h = i * 2654435761L % 97
      val base = s"k${h % 13}x${h % 7}"
      (i.toLong, base + "y" * (i % 6))
    }
    val df = rows.toDF("id", "k")
    val banded = EditDistance.neardupPairs(df, "id", "k", maxDist = 2,
        bucketWidth = 2)
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (ia, ka) <- rows; (ib, kb) <- rows if ia < ib
      d = levenshteinRef(ka, kb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must produce qualifying pairs")
    assert(brute.exists { case (a, b, _) =>
      (rows(a.toInt)._2.length / 2) != (rows(b.toInt)._2.length / 2)
    }, "fixture must exercise cross-bucket pairs")
  }

  test("neardupPairs: null keys and over-length keys are excluded") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, null),
      (4L, "a" * 300)).toDF("id", "k")
    val got = EditDistance.neardupPairs(df, "id", "k", 1, 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1)))
  }

  test("neardupPairs: bucketWidth below maxDist is rejected") {
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      EditDistance.neardupPairs(df, "id", "k", maxDist = 4, bucketWidth = 2)
    }
  }

  test("neardupPairs: banded join plans as a hash join, never nested-loop") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "k")
    val plan = EditDistance.neardupPairs(df, "id", "k", 2, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"banded candidate join degenerated:\n$plan")
  }

  test("bucketSizes surfaces the occupancy hazard") {
    val df = (Seq.fill(9)("aaaa") ++ Seq("bbbbbbbbbb")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = EditDistance.bucketSizes(df, "k", bucketWidth = 4)
      .as[(Long, Long)].collect()
    assert(got.head === ((1L, 9L))) // hottest bucket first
    assert(got.toSet === Set((1L, 9L), (2L, 1L)))
  }

  // reference DP (test-only; the operator uses Spark's builtin)
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("bandingStats: hand-counted reduction, completeness measured 1.0") {
    // lengths 3 and 10: cross-length pairs fail both the length filter
    // and the bucket filter, so the banding tests only within-cluster
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"),
      (4L, "abcdefghij"), (5L, "abcdefghiz")).toDF("id", "k")
    val got = EditDistance.bandingStats(df, "id", "k", maxDist = 2,
      bucketWidth = 2).head()
    assert(got.getAs[Long]("n_items") === 5L)
    assert(got.getAs[Long]("n_pairs_total") === 10L)
    // candidates: the 3+1 within-length pairs (3 among len-3, 1 len-10)
    assert(got.getAs[Long]("n_candidates") === 4L)
    assert(got.getAs[Double]("reduction_ratio") === 0.6)
    // true matches: (abc,abd)=1 and (…hij,…hiz)=1; abc/xyz is 3 edits
    assert(got.getAs[Long]("n_true") === 2L)
    assert(got.getAs[Long]("n_found") === 2L)
    assert(got.getAs[Double]("completeness") === 1.0)
  }

  test("gapSummary: hand-built islands, duplicates, and planted holes") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L, 10L, 15L, 15L) // dup 15
    val got = Continuity.gapSummary(ids.toDF("id"), "id").collect()(0)
    assert(got.getAs[Long]("n_rows") === 9L)
    assert(got.getAs[Long]("n_distinct") === 8L)
    assert(got.getAs[Long]("min_id") === 1L)
    assert(got.getAs[Long]("max_id") === 15L)
    assert(got.getAs[Long]("n_missing") === 7L) // 6,7,8,11,12,13,14
    assert(got.getAs[Long]("n_islands") === 3L)
  }

  test("gaps: the ranges themselves, ordered") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L, 10L, 15L)
    val got = Continuity.gaps(ids.toDF("id"), "id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((6L, 8L, 3L), (11L, 14L, 4L)))
  }

  test("gapSummary: contiguous and empty inputs") {
    val contiguous = Continuity.gapSummary(
      (10L to 20L).toDF("id"), "id").collect()(0)
    assert(contiguous.getAs[Long]("n_missing") === 0L)
    assert(contiguous.getAs[Long]("n_islands") === 1L)
    assert(Continuity.gaps((10L to 20L).toDF("id"), "id").count() === 0L)
    val empty = Continuity.gapSummary(
      Seq.empty[Long].toDF("id"), "id").collect()(0)
    assert(empty.getAs[Long]("n_rows") === 0L)
    assert(empty.getAs[Long]("n_missing") === 0L)
    assert(empty.getAs[Long]("n_islands") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("min_id")))
  }

  test("gapSummary: no global sort, no window — anti-joins only") {
    val plan = Continuity.gapSummary((1L to 100L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"islands used a window:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"islands used a global sort exchange:\n$plan")
  }
}
