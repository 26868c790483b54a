package graft

import graft.operators.Winnowing
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Independent brute-force reference: md5-prefix gram hashes +
    * rightmost-min per window, reimplemented from the paper (not from
    * the operator) so agreement is evidence. */
  private def refWinnowMd5(s: String, k: Int, w: Int): Set[String] = {
    def md5hex(x: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(16)
    }
    val m = s.length - k + 1
    if (m < 1) return Set(md5hex(s))
    val grams = (0 until m).map(i => md5hex(s.substring(i, i + k)))
    val starts = (math.min(w, m) - 1) until m
    starts.map { p =>
      val lo = math.max(0, p - w + 1)
      // rightmost min: scan left→right keeping <=
      var best = lo
      for (i <- lo to p) if (grams(i) <= grams(best)) best = i
      grams(best)
    }.toSet
  }

  /** Same reference for the Karp–Rabin mode (mirrors the expression's
    * hash constants; selection logic independent). */
  private def refWinnowKR(s: String, k: Int, w: Int): Set[Long] = {
    val m = s.length - k + 1
    if (m < 1) return Set.empty // singleton whole-text hash checked separately
    val B = 1000003L
    val grams = (0 until m).map { i =>
      var h = 0L
      for (j <- i until i + k) h = h * B + s.charAt(j)
      h
    }
    val starts = (math.min(w, m) - 1) until m
    starts.map { p =>
      val lo = math.max(0, p - w + 1)
      var best = lo
      for (i <- lo to p)
        if (java.lang.Long.compareUnsigned(grams(i), grams(best)) <= 0) best = i
      grams(best)
    }.toSet
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaa", // degenerate: all grams equal
    "abcabcabcabcabc",      // periodic
    "short",                 // shorter than k
    "exactly8",              // len == k → one gram
    "a longer sentence with some repeated repeated words in it")

  test("md5 mode matches the brute-force reference on varied inputs") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Winnowing.fingerprintsMd5(df, "id", "text", 8, 4)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === refWinnowMd5(t, 8, 4), s"text #$i: '$t'")
    }
  }

  test("native md5 deque equals the exploded window spelling (incl. unicode)") {
    // the oracle runs the window spelling; the engine runs the native
    // deque — the sets must be identical per doc, including code-point
    // substring semantics on multi-byte text
    val uni = texts :+ "привет мир один два три четыре пять" :+
      "mixé unicode graphèmes many words être ça où déjà vu"
    val df = uni.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    def sets(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, String)].collect().groupBy(_._1)
        .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert(sets(Winnowing.fingerprintsMd5(df, "id", "text", 8, 4)) ===
      sets(Winnowing.fingerprintsMd5Windowed(df, "id", "text", 8, 4)))
  }

  test("native KR mode matches its brute-force reference + short-doc singleton") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Winnowing.fingerprints(df, "id", "text", 8, 4)
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k2, v) => k2 -> v.map(_._2).toSet }
    texts.zipWithIndex.foreach { case (t, i) =>
      if (t.length >= 8)
        assert(got(i.toLong) === refWinnowKR(t, 8, 4), s"text #$i: '$t'")
      else assert(got(i.toLong).size === 1) // whole-text hash singleton
    }
  }

  test("detection guarantee: a prefix shift preserves shared fingerprints") {
    val base = "some article body that is long enough to carry many grams of text"
    val df = Seq((1L, base), (2L, "ZQ " + base)).toDF("id", "text")
    for (mode <- Seq("md5", "kr")) {
      val fps = if (mode == "md5")
        Winnowing.fingerprintsMd5(df, "id", "text", 8, 4)
          .select($"id", $"fp".cast("string"))
      else Winnowing.fingerprints(df, "id", "text", 8, 4)
        .select($"id", $"fp".cast("string"))
      val sets = fps.as[(Long, String)].collect().groupBy(_._1)
        .map { case (k2, v) => k2 -> v.map(_._2).toSet }
      val shared = sets(1L).intersect(sets(2L))
      assert(shared.nonEmpty, s"$mode: shift lost every fingerprint")
      // winnowing guarantee is >= 1; in practice most survive a shift
      assert(shared.size * 2 >= sets(1L).size,
        s"$mode: only ${shared.size}/${sets(1L).size} survived")
    }
  }

  test("sharedPairs finds the planted copy; cap drops hot fingerprints loudly") {
    val df = Seq(
      (1L, "a wholly unique document body with enough length here"),
      (2L, "a wholly unique document body with enough length here"),
      (3L, "completely different content that shares nothing at all")
    ).toDF("id", "text")
    val fps = Winnowing.fingerprints(df, "id", "text", 8, 4)
    val pairs = Winnowing.sharedPairs(fps, "id").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs.exists { case (a, b, n) => a == 1L && b == 2L && n > 0 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
    // cap = 1 → every fingerprint shared by the pair overflows
    val capped = Winnowing.sharedPairs(fps, "id", maxBucket = 1)
    assert(capped.count() === 0L)
    assert(Winnowing.overflowFingerprints(fps, maxBucket = 1).count() > 0L)
  }

  test("plan: native fingerprinting is a zero-exchange projection") {
    val df = Seq((1L, "abcdefghijklmnop")).toDF("id", "text")
    val p = df.select(graft.functions.TextExpressions.winnow($"text", 8, 4))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"winnow shuffled:\n$p")
  }
}
