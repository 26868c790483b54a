package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Selection}

/** Budget-selection semantics: best-first walk, boundary inclusion,
  * exact cum_before, and the generalized globalOffsets ordering it
  * rides on. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // scores: higher better; walk order by (score desc, id): 5, 3, 1, 2, 4
  private def docs = Seq(
    (1L, 30L, 70.0), (2L, 40L, 20.0), (3L, 20L, 80.0),
    (4L, 50L, 10.0), (5L, 10L, 90.0)
  ).toDF("id", "cost", "score")

  test("keeps best-first until the budget fills; boundary doc included") {
    // walk: 5(10) 3(20) 1(30) 2(40) 4(50); cum_before: 0,10,30,60,100
    val got = Selection.tokenBudget(docs, "id", "cost", col("score"), budget = 60L)
      .select("id", "cum_before").as[(Long, Long)].collect().toMap
    // id=2 has cum_before=60 — budget already full → dropped;
    // id=1 (cum_before 30 < 60) is kept even though 30+30 == 60
    assert(got === Map(5L -> 0L, 3L -> 10L, 1L -> 30L))
    // budget crossing INSIDE a doc keeps it: budget 15 → 5 and 3
    val cross = Selection.tokenBudget(docs, "id", "cost", col("score"), 15L)
      .select("id").as[Long].collect().toSet
    assert(cross === Set(5L, 3L))
  }

  test("budget >= total keeps everything; all original columns survive") {
    val all = Selection.tokenBudget(docs, "id", "cost", col("score"), 1000L)
    assert(all.count() === 5)
    assert(all.columns.toSet === Set("id", "cost", "score", "cum_before"))
    intercept[IllegalArgumentException] {
      Selection.tokenBudget(docs, "id", "cost", col("score"), 0L)
    }
  }

  test("globalOffsets custom walk order matches a brute-force prefix sum") {
    val df = (0 until 500).map { i =>
      (i.toLong, (i * 37 % 97).toLong + 1L, ((i * 2654435761L + 5) % 1000).toDouble)
    }.toDF("id", "cost", "score")
    val offs = Packing.globalOffsets(df, "id", "cost",
        orderBy = Seq(col("score") * lit(-1), col("id")))
      .select("id", "offset").as[(Long, Long)].collect().toMap
    val walk = df.select("id", "cost", "score")
      .as[(Long, Long, Double)].collect()
      .sortBy { case (id, _, s) => (-s, id) }
    var acc = 0L
    walk.foreach { case (id, c, _) =>
      assert(offs(id) === acc, s"id=$id")
      acc += c
    }
    assert(acc === walk.map(_._2).sum)
  }

  test("mmrSelect: low lambda lets diversity beat an exact duplicate") {
    import spark.implicits._
    // query (1,0); id1 = (1,0), id2 = exact duplicate, id3 = (0.6,0.8)
    // at lambda 0.3: step2 prefers the diverse id3 (-0.24) over the
    // duplicate id2 (0.3 - 0.7 = -0.4); step1 tie breaks to id1
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)),
      (3L, Seq(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val out = Selection.mmrSelect(df, "vec_id", "embedding",
      Array(1f, 0f), k = 3, lambda = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 1L, 0.3), (2L, 3L, -0.24),
      (3L, 2L, -0.4)))
  }

  test("cvarByGroup: tail mean below the interpolated quantile") {
    import spark.implicits._
    // 1..10: p10 = 1.9, closed tail {1} -> cvar 1.0
    val df = (1 to 10).map(v => ("a", v.toLong)).toDF("g", "v")
    val r = graft.operators.Profile.cvarByGroup(df, "g", "v", 0.1)
      .collect()(0)
    assert((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      === ((10L, 1.9, 1L, 1.0)))
  }

  test("crossSourceCopies: distinct shared texts per source pair") {
    import spark.implicits._
    // t1 in a (twice) and b; t2 only in a -> (a, b) shares exactly 1
    val df = Seq((1L, "t1", "a"), (2L, "t1", "a"), (3L, "t1", "b"),
      (4L, "t2", "a")).toDF("id", "text", "source")
    val out = graft.operators.Dedup.crossSourceCopies(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", "b", 1L)))
  }

  test("mmrSelect: k beyond the scorable pool returns what exists") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Selection.mmrSelect(df, "vec_id",
      "embedding", Array(1f, 0f), k = 10, lambda = 0.5)
    assert(out.count() === 2L)
  }
}
