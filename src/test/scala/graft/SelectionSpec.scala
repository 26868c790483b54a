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
}
