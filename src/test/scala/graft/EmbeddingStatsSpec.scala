package graft

import graft.operators.EmbeddingStats
import org.apache.spark.sql.functions._

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("moments: hand-computed mean/cov, merge across partitions identical") {
    val vecs = Seq(
      Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 0.0f), Seq(7.0f, 2.0f))
    val df = vecs.toDF("v")
    val m = EmbeddingStats.moments(df, "v", 2)
    assert(m.n === 4L && m.skipped === 0L)
    assert(approx(m.mean(0), 4.0) && approx(m.mean(1), 2.0))
    // population cov: E[xy]-E[x]E[y]
    // x: 1,3,5,7 → var 5; y: 2,4,0,2 → var 2; xy mean: (2+12+0+14)/4=7 → cov xy = 7-8 = -1
    assert(approx(m.cov(0)(0), 5.0))
    assert(approx(m.cov(1)(1), 2.0))
    assert(approx(m.cov(0)(1), -1.0) && approx(m.cov(1)(0), -1.0))
    val m4 = EmbeddingStats.moments(df.repartition(4), "v", 2)
    assert(m4.n === m.n && approx(m4.cov(0)(1), m.cov(0)(1), 1e-12))
  }

  test("moments: NULL vector, wrong dim, null element all counted skipped") {
    val good = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val badDim = Seq(Seq(1.0f)).toDF("v")
    val nullVec = Seq(Tuple1(null.asInstanceOf[Seq[Float]])).toDF("v")
    val nullElem = Seq(Tuple1(Seq[java.lang.Float](1.0f, null))).toDF("v")
    val m = EmbeddingStats.moments(
      good.union(badDim).union(nullVec).union(nullElem), "v", 2)
    assert(m.n === 2L && m.skipped === 3L)
    assert(approx(m.mean(0), 2.0))
  }

  test("jacobiEigen: known 2x2 and 3x3 spectra, orthonormal, Av = lambda v") {
    val (vals2, vecs2) = EmbeddingStats.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(vals2(0), 3.0) && approx(vals2(1), 1.0))
    val r = 1.0 / math.sqrt(2.0)
    assert(approx(vecs2(0)(0), r) && approx(vecs2(0)(1), r))
    // 3x3 diag + rank-1: eigen relation + orthonormality invariants
    val a = Array(
      Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.25), Array(0.5, 0.25, 1.0))
    val (vals, vecs) = EmbeddingStats.jacobiEigen(a)
    assert(vals(0) >= vals(1) && vals(1) >= vals(2))
    for (k <- 0 until 3) {
      val av = Array.tabulate(3)(i =>
        (0 until 3).map(j => a(i)(j) * vecs(k)(j)).sum)
      for (i <- 0 until 3) assert(approx(av(i), vals(k) * vecs(k)(i), 1e-9))
    }
    for (k1 <- 0 until 3; k2 <- 0 until 3) {
      val dot = (0 until 3).map(i => vecs(k1)(i) * vecs(k2)(i)).sum
      assert(approx(dot, if (k1 == k2) 1.0 else 0.0, 1e-9))
    }
    // trace = sum of eigenvalues
    assert(approx(vals.sum, 8.0, 1e-9))
  }

  test("pca: planted dominant direction is recovered") {
    // points along (0.6, 0.8) with small orthogonal jitter
    val rows = (0 until 200).map { i =>
      val s = (i % 21) - 10.0       // spread along the line
      val o = ((i % 7) - 3.0) * 0.01 // tiny orthogonal noise
      Seq((0.6 * s - 0.8 * o).toFloat, (0.8 * s + 0.6 * o).toFloat)
    }
    val df = rows.toDF("v")
    val (vals, comps, m) = EmbeddingStats.pca(df, "v", 2, 2)
    val dot = math.abs(comps(0)(0) * 0.6 + comps(0)(1) * 0.8)
    assert(dot > 0.9999, s"top PC ${comps(0).toSeq} not along (0.6,0.8)")
    assert(vals(0) > 100 * vals(1))
    assert(approx(vals.sum, m.cov(0)(0) + m.cov(1)(1), 1e-9))
  }

  test("project: hand dot products, centering, zero-exchange plan") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val comps = Array(Array(1.0, 0.0), Array(1.0, 1.0))
    val out = EmbeddingStats.project(df, "v", comps)
    val got = out.select("projection").as[Seq[Double]].collect()
    assert(got(0) === Seq(1.0, 3.0) && got(1) === Seq(3.0, 7.0))
    val centered = EmbeddingStats.project(df, "v", comps,
      mean = Some(Array(2.0, 3.0)))
    val gc = centered.select("projection").as[Seq[Double]].collect()
    assert(gc(0) === Seq(-1.0, -2.0) && gc(1) === Seq(1.0, 2.0))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection shuffled:\n$p")
  }

  test("covarianceDf matches a brute-force driver computation on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cov = EmbeddingStats.covarianceDf(df, "embedding", 64)
    assert(cov.count() === 64L * 65 / 2)
    // spot-check (1,1) and (1,2) against a driver-side brute force
    val vecs = df.select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    def ent(i: Int, j: Int): Double = {
      val exy = vecs.map(v => v(i) * v(j)).sum / n
      val ex = vecs.map(_(i)).sum / n
      val ey = vecs.map(_(j)).sum / n
      BigDecimal(exy - ex * ey)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = cov.where(col("i") === 1 && col("j") <= 2)
      .orderBy("j").select("cov").as[Double].collect()
    assert(got(0) === ent(0, 0) && got(1) === ent(0, 1))
  }

  test("diagMahalanobis: hand-computed scores, zero-var dim weightless") {
    // dim 3: last dim constant → variance 0 → weight 0 (no signal)
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f, 7.0f)),
      (2L, Seq(2.0f, 0.0f, 7.0f)),
      (3L, Seq(0.0f, 4.0f, 7.0f)),
      (4L, Seq(2.0f, 4.0f, 7.0f))
    ).toDF("id", "vec")
    val got = EmbeddingStats.diagMahalanobisScores(vecs, "id", "vec", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // dim0: mu 1, var 1; dim1: mu 2, var 4; dim2: var 0 → dropped
    // every row: (±1)²/1 + (±2)²/4 = 1 + 1 = 2
    (1L to 4L).foreach(id => assert(math.abs(got(id) - 2.0) < 1e-12))
    // null and wrong-dim vectors score null (VecStats' jurisdiction)
    val bad = Seq((1L, Seq(0.0f, 0.0f, 7.0f)), (2L, Seq(2.0f, 4.0f, 7.0f)),
      (3L, null.asInstanceOf[Seq[Float]]), (4L, Seq(1.0f))).toDF("id", "vec")
    val r = EmbeddingStats.diagMahalanobisScores(bad, "id", "vec", 3)
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(!r(1L) && !r(2L) && r(3L) && r(4L))
    // scoring never joins or shuffles: params ride as a literal
    val plan = EmbeddingStats.diagMahalanobisScores(vecs, "id", "vec", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"mahalanobis scoring joined:\n$plan")
  }

  test("groupCentroids: hand-computed cosines to the corpus centroid") {
    // a: [1,0]×2 → centroid (1,0); b: [0,1] → (0,1);
    // global (2/3, 1/3): cos(a,g) = 0.894427, cos(b,g) = 0.447214
    val df = Seq(("a", Seq(1f, 0f)), ("a", Seq(1f, 0f)),
      ("b", Seq(0f, 1f))).toDF("g", "vec")
    val m = EmbeddingStats.groupCentroids(df, "g", "vec").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("a") === ((2L, 0.894427)))
    assert(m("b") === ((1L, 0.447214)))
  }

  test("effectiveRank: isotropic -> d, collapsed -> 1") {
    // cov = diag(0.5, 0.5): PR = 1.0^2 / 0.5 = 2.0
    val iso = Seq(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f),
      Seq(0.0f, 1.0f), Seq(0.0f, -1.0f)).toDF("v")
    val r = EmbeddingStats.effectiveRank(iso, "v", 2).collect()(0)
    assert(r.getInt(0) == 2 && r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 2.0)
    // all mass on one direction: cov = [[2.5,2.5],[2.5,2.5]] -> PR = 1
    val flat = Seq(Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f),
      Seq(2.0f, 2.0f), Seq(-2.0f, -2.0f)).toDF("v")
    val f = EmbeddingStats.effectiveRank(flat, "v", 2).collect()(0)
    assert(f.getDouble(2) == 1.0)
  }

  test("mmd: identical groups -> 0, separated groups -> positive") {
    val same = (Seq((0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))))
      .toDF("label", "v")
    val s = EmbeddingStats.mmd(same, "v", "label", 0, 1, 0.25).collect()(0)
    assert(s.getLong(0) == 2 && s.getLong(1) == 2)
    assert(s.getDouble(2) == 0.0)
    val apart = (Seq((0, Seq(0.0f, 0.0f)), (0, Seq(0.1f, 0.0f)),
      (1, Seq(5.0f, 5.0f)), (1, Seq(5.1f, 5.0f))))
      .toDF("label", "v")
    val a = EmbeddingStats.mmd(apart, "v", "label", 0, 1, 0.25).collect()(0)
    assert(a.getDouble(2) > 0.5) // within-kernel ~1, cross-kernel ~0
    // empty side -> NULL mmd2, zero count
    val e = EmbeddingStats.mmd(apart, "v", "label", 0, 7, 0.25).collect()(0)
    assert(e.getLong(1) == 0 && e.isNullAt(2))
  }
}
