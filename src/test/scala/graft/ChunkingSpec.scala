package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, EmbeddingQC, Mixing, Profile}

/** Chunking + embedding QC + robust outliers + epoch shuffle — the
  * round-3 pipeline additions. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def toksDf(rows: (Long, Seq[Int])*) =
    rows.toDF("id", "tokens")

  // ---------- chunking ----------

  test("chunking: hand-computed windows (maxLen=4, overlap=1)") {
    // len 10, stride 3 → chunks start 0,3,6 and the tail [6..10) = 4 toks
    val df = toksDf(1L -> (0 until 10), 2L -> Seq(7), 3L -> Seq.empty[Int])
    val out = Chunking.chunkTokens(df, "id", "tokens", maxLen = 4, overlap = 1)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "chunk_start", "chunk_tokens")
      .as[(Long, Int, Int, Seq[Int])].collect()
    assert(out === Array(
      (1L, 0, 0, Seq(0, 1, 2, 3)),
      (1L, 1, 3, Seq(3, 4, 5, 6)),
      (1L, 2, 6, Seq(6, 7, 8, 9)),
      (2L, 0, 0, Seq(7)))) // short doc → single chunk; empty doc → none
  }

  test("chunking invariants: coverage, bounds, no pure-overlap chunk, round-trip") {
    val lens = Seq(1, 3, 4, 5, 7, 8, 9, 12, 100, 101)
    val df = toksDf(lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(t => t * 7 + i)) }: _*)
    for ((maxLen, overlap) <- Seq((4, 1), (8, 0), (5, 4), (16, 3))) {
      val ch = Chunking.chunkTokens(df, "id", "tokens", maxLen, overlap)
      val rows = ch.select("id", "chunk_id", "chunk_start", "chunk_tokens")
        .as[(Long, Int, Int, Seq[Int])].collect()
      val orig = df.as[(Long, Seq[Int])].collect().toMap
      rows.groupBy(_._1).foreach { case (id, cs) =>
        val sorted = cs.sortBy(_._2)
        assert(sorted.map(_._2).toSeq === sorted.indices, "dense 0-based ids")
        assert(sorted.forall(_._4.size <= maxLen), "chunk size bound")
        assert(sorted.last._3 < orig(id).size, "no chunk starts past the end")
        // every chunk is the exact slice it claims
        sorted.foreach { case (_, _, start, toks) =>
          assert(toks === orig(id).slice(start, start + maxLen))
        }
        // coverage: strides tile [0, n) — last chunk reaches the end
        assert(sorted.last._3 + sorted.last._4.size === orig(id).size)
      }
      // round-trip through unchunk reproduces every non-empty document
      val back = Chunking.unchunk(ch, "id", overlap)
        .as[(Long, Seq[Int])].collect().toMap
      orig.filter(_._2.nonEmpty).foreach { case (id, toks) =>
        assert(back(id) === toks, s"round-trip id=$id maxLen=$maxLen overlap=$overlap")
      }
    }
  }

  test("chunking plan: narrow Generate over the scan, zero exchanges") {
    val df = toksDf(1L -> (0 until 10))
    val plan = Chunking.chunkTokens(df, "id", "tokens", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  // ---------- embedding QC ----------

  private def vecDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("embedding QC: dim / nonfinite / zero / norm violations, clean rows pass") {
    val df = vecDf(
      0L -> Seq(3f, 4f),                 // clean, norm 5
      1L -> Seq(1f, Float.NaN),          // nonfinite
      2L -> Seq(0f, 0f),                 // all-zero
      3L -> Seq(1f, 2f, 3f),             // bad dim
      4L -> Seq(Float.PositiveInfinity, 0f), // nonfinite (Inf)
      5L -> Seq(30f, 40f))               // norm 50 — outside bounds
    val v = EmbeddingQC.violations(df, "vec_id", "embedding", expectedDim = 2,
        normBounds = Some((0.1, 10.0)))
      .as[(Long, String, String)].collect().sorted
    assert(v === Array(
      (1L, "R_EMB_NONFINITE", "n_nonfinite=1"),
      (2L, "R_EMB_NORM", "l2_norm=0.0"), // zero vector also fails the norm floor
      (2L, "R_EMB_ZERO", "all_zero"),
      (3L, "R_EMB_DIM", "dim=3"),
      (4L, "R_EMB_NONFINITE", "n_nonfinite=1"),
      (4L, "R_EMB_NORM", "l2_norm=0.0"), // norm is over finite components only
      (5L, "R_EMB_NORM", "l2_norm=50.0")))
  }

  test("embedding QC: NULL whole-vector rows are flagged, not silently healthy") {
    // round-3 ADVICE: VecStats yields a null struct on a null vector, so
    // every field-derived when(!valid, …) cell evaluates to null and a
    // writer emitting all-null embeddings sailed through the gate
    val df = vecDf(0L -> Seq(3f, 4f), 1L -> null, 2L -> null)
    val v = EmbeddingQC.violations(df, "vec_id", "embedding", expectedDim = 2)
      .as[(Long, String, String)].collect().sorted
    assert(v === Array(
      (1L, "R_EMB_NULL", "null_embedding"),
      (2L, "R_EMB_NULL", "null_embedding")))
    val sm = EmbeddingQC.summary(df, "embedding", expectedDim = 2).head()
    assert(sm.getAs[Long]("n_rows") === 3)
    assert(sm.getAs[Long]("n_null_rows") === 2)
    assert(sm.getAs[Long]("n_bad_dim") === 0)
  }

  test("embedding QC stats + summary: hand-computed norms, one traversal per row") {
    val df = vecDf(0L -> Seq(3f, 4f), 1L -> Seq(1f, 1f))
    val st = EmbeddingQC.stats(df, "vec_id", "embedding")
      .as[(Long, Int, Int, Boolean, Double)].collect().sortBy(_._1)
    assert(st === Array((0L, 2, 0, false, 5.0), (1L, 2, 0, false, 1.4142)))
    val sm = EmbeddingQC.summary(df, "embedding", expectedDim = 2).head()
    assert(sm.getAs[Long]("n_rows") === 2)
    assert(sm.getAs[Long]("n_bad_dim") === 0)
    assert(sm.getAs[Double]("norm_max") === 5.0)
    // single graft_vec_stats in the optimized violations plan (the
    // SPARK-36718 multi-reference guard keeps the projection); range
    // leaf, not a LocalRelation the optimizer would constant-fold away
    val big = spark.range(100).select(col("id").as("vec_id"),
      array(col("id").cast("float"), lit(2f)).as("embedding"))
    val plan = EmbeddingQC.violations(big, "vec_id", "embedding", 2)
      .queryExecution.optimizedPlan.toString
    val evals = "graft_vec_stats".r.findAllIn(plan).length
    assert(evals === 1, s"expected one VecStats eval, got $evals:\n$plan")
  }

  // ---------- robust outliers ----------

  test("robust outliers: hand-computed median/MAD fence") {
    // median 5, deviations {4,1,0,1,4,995} → MAD ≈ 2.5 (interpolated)
    val df = Seq(1.0, 4.0, 5.0, 6.0, 9.0, 1000.0).toDF("x")
    val r = Profile.robustOutliers(df, "x", k = 3.5).head()
    assert(r.getAs[Double]("median") === 5.5) // (5+6)/2
    // devs from 5.5: {4.5,1.5,0.5,0.5,3.5,994.5} sorted {0.5,0.5,1.5,3.5,4.5,994.5} → median 2.5
    assert(r.getAs[Double]("mad") === 2.5)
    val lo = 5.5 - 3.5 * 1.4826 * 2.5
    val hi = 5.5 + 3.5 * 1.4826 * 2.5
    assert(math.abs(r.getAs[Double]("lo") - BigDecimal(lo).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(r.getAs[Long]("n_outliers") === 1) // only 1000.0 outside ±~13
    assert(r.getAs[Long]("n_rows") === 6)
    assert(hi < 1000.0 && lo > -20.0)
  }

  test("robust outliers: approx mode agrees with exact on a well-spread column") {
    val df = spark.range(10001).select(($"id" % 1000).cast("double").as("x"))
    val exact = Profile.robustOutliers(df, "x", exact = true).head()
    val approx = Profile.robustOutliers(df, "x", exact = false).head()
    assert(math.abs(exact.getAs[Double]("median") - approx.getAs[Double]("median")) <= 1.0)
    assert(exact.getAs[Long]("n_outliers") === 0)
  }

  // ---------- exact order statistics (radix select) ----------

  test("kth smallest longs: bounded-span histogram path equals sorted order") {
    // span 1000 < 2^16 engages the exact-histogram fast path; the
    // domain straddles the sign byte, which is exactly where the radix
    // descent's byte-skip cannot help — every k must still be exact
    val vals = (0 until 777).map(i => (i.toLong * 37) % 1001 - 500)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    val ks = Seq(1L, 2L, 388L, 389L, 776L, 777L)
    val got = Profile.kthSmallestLongs(df, "v", ks)
    ks.zip(got).foreach { case (k, g) =>
      assert(g === sorted(k.toInt - 1), s"k=$k")
    }
    // multi-k shares one histogram with the even-n median rule
    assert(Profile.exactOrderStatsLong(df, "v") ===
      ((777L, Some(sorted(388).toDouble), Some(sorted.head),
        Some(sorted.last))))
    intercept[IllegalArgumentException] {
      Profile.kthSmallestLongs(df, "v", Seq(778L))
    }
  }

  test("kth smallest long: every k on a messy fixture equals sorted order") {
    // negatives, Long extremes, heavy ties, zero — the sign-bias and
    // equal-value byte paths all exercised
    val vals = Seq(Long.MinValue, Long.MaxValue, -1L, -1L, 0L, 0L, 0L,
      42L, 42L, -999999999999L, 7L, Long.MinValue + 1, 255L, 256L, -256L)
    val df = vals.toDF("v")
    val sorted = vals.sorted
    sorted.indices.foreach { i =>
      assert(Profile.kthSmallestLong(df, "v", i + 1) === sorted(i), s"k=${i + 1}")
    }
    intercept[IllegalArgumentException] {
      Profile.kthSmallestLong(df, "v", vals.size + 1L)
    }
    intercept[IllegalArgumentException] {
      Profile.kthSmallestLong(df, "v", 0L)
    }
  }

  test("kth smallest long: LCG differential at scale, nulls excluded") {
    // 5000 pseudo-random signed longs via a seeded LCG (built driver-
    // side — the wrapping multiply throws under ANSI as a column);
    // nulls interleaved must be invisible to the order statistic
    val vals: Seq[java.lang.Long] = (0 until 5000).map { i =>
      if (i % 11 == 0) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(
        i.toLong * 6364136223846793005L + 1442695040888963407L)
    }
    val df = vals.toDF("v")
    val nonNull = df.where($"v".isNotNull).as[Long].collect().sorted
    for (k <- Seq(1, 17, nonNull.length / 2, nonNull.length))
      assert(Profile.kthSmallestLong(df, "v", k.toLong) === nonNull(k - 1), s"k=$k")
  }

  test("exact median long: odd, even (SQL mean-of-middles), empty") {
    assert(Profile.exactMedianLong(Seq(5L, -3L, 9L).toDF("v"), "v")
      === ((3L, Some(5.0))))
    assert(Profile.exactMedianLong(Seq(4L, 10L, -2L, 0L).toDF("v"), "v")
      === ((4L, Some(2.0)))) // (0 + 4) / 2
    assert(Profile.exactMedianLong(
      Seq(null.asInstanceOf[java.lang.Long]).toDF("v"), "v") === ((0L, None)))
  }

  // ---------- epoch shuffle ----------

  test("epoch order: a seeded permutation — deterministic, seed-sensitive, complete") {
    val df = spark.range(500).toDF("id")
    val e1 = Mixing.epochOrder(df, "id", seed = 1).as[Long].collect()
    val e1b = Mixing.epochOrder(df, "id", seed = 1).as[Long].collect()
    val e2 = Mixing.epochOrder(df, "id", seed = 2).as[Long].collect()
    assert(e1 === e1b, "same seed → identical order")
    assert(!(e1 sameElements e2), "different seed → different order")
    val identity = Array.tabulate(500)(_.toLong)
    assert(e1.sorted === identity, "a permutation, nothing lost")
    assert(!(e1 sameElements identity), "actually shuffled")
  }
}
