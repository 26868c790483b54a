package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift, LinkGraph, Packing, Profile}

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extractDocLinks: parses doc:// hrefs, collapses duplicate edges") {
    val pages = Seq(
      (1L, """<a href="doc://2">x</a> <a href="doc://3">y</a>""" +
        """<a href="doc://2">again</a> <a href="/home">nav</a>"""),
      (2L, """no links here"""),
      (3L, """<a href="doc://1">back</a>""")).toDF("id", "html")
    val edges = LinkGraph.extractDocLinks(pages, "id", "html")
      .orderBy("src", "dst").as[(Long, Long)].collect()
    assert(edges === Array((1L, 2L), (1L, 3L), (3L, 1L)))
  }

  test("extractAnchors: target and anchor text, nav links ignored") {
    val pages = Seq(
      (1L, """<a href="doc://2">read me</a> <a href="/home">Home</a>""" +
        """<a href="doc://3"></a>"""),
      (2L, """<a href="doc://2">read me</a>""")).toDF("id", "html")
    val got = LinkGraph.extractAnchors(pages, "id", "html")
      .orderBy("src", "dst").as[(Long, Long, String)].collect()
    assert(got === Array((1L, 2L, "read me"), (1L, 3L, ""),
      (2L, 2L, "read me")))
  }

  test("anchorSummary: counts, diversity, deterministic top anchor") {
    val anchors = Seq(
      (1L, 9L, "beta"), (2L, 9L, "beta"), (3L, 9L, "alpha"),
      (3L, 9L, "alpha"), // duplicate text from the same src counts twice
      (1L, 8L, "x")).toDF("src", "dst", "anchor")
    val got = LinkGraph.anchorSummary(anchors)
      .orderBy("dst").as[(Long, Long, Long, Long, String)].collect()
    // dst 9: 4 anchors, texts {beta, alpha}, srcs {1,2,3};
    // top anchor ties 2-2 → lexicographic "alpha"
    assert(got === Array((8L, 1L, 1L, 1L, "x"), (9L, 4L, 2L, 3L, "alpha")))
  }

  test("degrees: isolated vertices appear with (0, 0)") {
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val d = LinkGraph.degrees(edges, Some(verts))
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(d === Array((1L, 2L, 1L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 0L, 0L)))
  }

  test("pageRank: hand-computed two iterations with a dangling vertex") {
    // 0 → 1, 1 → 0, vertex 2 dangling; N = 3, d = 0.85
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val verts = Seq(0L, 1L, 2L).toDF("id")
    val pr = LinkGraph.pageRank(edges, iterations = 2, damping = 0.85,
      vertices = Some(verts))
    val got = pr.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Packing.releaseOffsets(pr)
    // replay the same arithmetic sequentially
    val n = 3.0; val d = 0.85; val base = (1.0 - d) / n
    var r = Map(0L -> 1 / n, 1L -> 1 / n, 2L -> 1 / n)
    (1 to 2).foreach { _ =>
      val m = r(2L)
      r = Map(
        0L -> (base + d * (r(1L) / 1.0 + m / n)),
        1L -> (base + d * (r(0L) / 1.0 + m / n)),
        2L -> (base + d * (m / n)))
    }
    Seq(0L, 1L, 2L).foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-12, s"vertex $v: ${got(v)} vs ${r(v)}")
    }
    // probability mass is conserved by the dangling redistribution
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: releases every intermediate checkpoint (one pinned frame out)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val pr = LinkGraph.pageRank(edges, iterations = 5)
    assert(pr.count() === 3)
    // 5 iterations ran; only the RETURNED frame's blocks may remain —
    // shares, vertex flags, and all prior rank rounds must be gone
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1, s"leaked checkpoints: $before -> $after")
    Packing.releaseOffsets(pr)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("volumeAnomalies: hand-computed trailing z; cold start unflagged") {
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hourly counts for src "a": 10, 12, 8, 11, 30 — the last hour is
    // the planted spike; one null-ts and one null-type row must drop
    val rows = Seq.tabulate(10)(i => (ts(0, i), "a")) ++
      Seq.tabulate(12)(i => (ts(1, i), "a")) ++
      Seq.tabulate(8)(i => (ts(2, i), "a")) ++
      Seq.tabulate(11)(i => (ts(3, i), "a")) ++
      Seq.tabulate(30)(i => (ts(4, i), "a")) ++
      Seq((null.asInstanceOf[java.sql.Timestamp], "a"), (ts(0, 0), null))
    val df = rows.toDF("ts", "event_type")
    val out = Drift.volumeAnomalies(df, "ts", "event_type",
        trailing = 6, zThreshold = 2.0)
      .orderBy("hour").collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 12L, 8L, 11L, 30L))
    // first bucket: empty window → null z; second: single bucket → null
    assert(out(0).isNullAt(3) && !out(0).getBoolean(4))
    assert(out(1).isNullAt(3) && !out(1).getBoolean(4))
    // last bucket: window [10,12,8,11], mu=10.25, sd=sqrt(8.75/3)
    val sd = math.sqrt(8.75 / 3)
    val z = BigDecimal((30 - 10.25) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(4).getDouble(3) === z)
    assert(out(4).getBoolean(4))
    // hour 2 (n=8) against window [10,12]: z = (8-11)/sqrt(2) ≈ -2.12 —
    // a genuine (if early) flag; hour 3 (n=11) vs [10,12,8]: z = 0.5
    val z2 = BigDecimal((8 - 11.0) / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2).getDouble(3) === z2 && out(2).getBoolean(4))
    assert(out(3).getDouble(3) === 0.5 && !out(3).getBoolean(4))
  }

  test("keySkew: hand-computed concentration stats with a null key") {
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), Some("c"),
      None).toDF("k")
    val r = Profile.keySkew(df, "k").head()
    assert(r.getLong(0) === 6L)   // n_rows
    assert(r.getLong(1) === 4L)   // n_keys (null counts as its own)
    assert(r.getString(2) === "a")
    assert(r.getLong(3) === 3L)
    assert(r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === BigDecimal(12.0 / 36.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // hhi
    val entropy = math.log(6.0) - 3 * math.log(3.0) / 6.0
    assert(r.getDouble(6) === BigDecimal(entropy)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("keySkew: hot-key tie breaks on key string (both engines' rule)") {
    val df = Seq("x", "x", "y", "y").toDF("k")
    assert(Profile.keySkew(df, "k").head().getString(2) === "y")
  }

  test("hits: hand-computed two iterations, L1-normalized, isolated vertex 0") {
    // 0→1, 0→2, 1→2; vertex 3 isolated
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val verts = Seq(0L, 1L, 2L, 3L).toDF("id")
    val out = LinkGraph.hits(edges, iterations = 2, vertices = Some(verts))
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    Packing.releaseOffsets(out)
    // iter 1: auth raw = in-degree (0,1,2,0) → a1 = (0, 1/3, 2/3, 0)
    // hub raw: h(0)=a1(1)+a1(2)=1, h(1)=a1(2)=2/3 → h1 = (3/5, 2/5, 0, 0)
    // iter 2: auth raw: a(1)=h1(0)=3/5, a(2)=h1(0)+h1(1)=1
    //   → a2 = (0, 3/8, 5/8, 0)
    // hub raw: h(0)=a2(1)+a2(2)=1, h(1)=a2(2)=5/8 → h2 = (8/13, 5/13, 0, 0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(g => (g._1, r6(g._2), r6(g._3))) === Array(
      (0L, r6(8.0 / 13), 0.0), (1L, r6(5.0 / 13), 0.375),
      (2L, 0.0, 0.625), (3L, 0.0, 0.0)))
  }

  test("hits: empty edge set normalizes to all-zero scores, not NaN") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val verts = Seq(1L, 2L).toDF("id")
    val out = LinkGraph.hits(edges, iterations = 1, vertices = Some(verts))
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    Packing.releaseOffsets(out)
    assert(got === Array((1L, 0.0, 0.0), (2L, 0.0, 0.0)))
  }

  test("degreeDistribution: power-of-two buckets, isolated bucket -1") {
    // degrees 0, 1, 2, 3, 4, 8 → buckets -1, 0, 1, 1, 2, 3
    val deg = Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (6L, 8L)).toDF("id", "in_degree")
    val out = LinkGraph.degreeDistribution(deg, "in_degree")
      .as[(Long, Long)].collect()
    assert(out === Array((-1L, 1L), (0L, 1L), (1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("triangleStats: K4-minus-an-edge, dup/reverse/self edges collapse") {
    // edges (1,2)(1,3)(2,3)(2,4)(3,4) + noise (2,1) dup-reverse, (1,1)
    // self: triangles (1,2,3) and (2,3,4); hand-computed clustering
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (1L, 1L)).toDF("src", "dst")
    val m = LinkGraph.triangleStats(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(m(1L) === ((2L, 1L, 1.0)))
    assert(m(2L) === ((3L, 2L, 0.666667)))
    assert(m(3L) === ((3L, 2L, 0.666667)))
    assert(m(4L) === ((2L, 1L, 1.0)))
  }

  test("assortativity: star is -1, regular ring is NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val s = LinkGraph.assortativity(star).collect()(0)
    assert(s.getLong(0) === 3L && s.getDouble(1) === -1.0)
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = LinkGraph.assortativity(ring).collect()(0)
    assert(r.getLong(0) === 3L && r.isNullAt(1)) // zero degree variance
  }

  test("sketchOverlap: inclusion-exclusion exact in coupon mode") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L),
      ("b", 4L), ("c", 9L)).toDF("g", "k")
    val m = Profile.sketchOverlap(df, "g", "k").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(m(("a", "b")) === ((3L, 3L, 4L, 2L, 0.5)))
    assert(m(("a", "c")) === ((3L, 1L, 4L, 0L, 0.0)))
    assert(m(("b", "c")) === ((3L, 1L, 4L, 0L, 0.0)))
  }
}
