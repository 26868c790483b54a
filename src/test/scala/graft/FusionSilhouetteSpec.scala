package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Mixing, Similarity}

/** Hand-built checks for reciprocal-rank fusion and the simplified
  * silhouette cluster-quality score. */
class FusionSilhouetteSpec extends AnyFunSuite {

  test("rrfFuse: hand-computed two-list fusion, k=60") {
    val spark = SparkSpec.session
    import spark.implicits._
    // list A ranks: d1=1, d2=2, d3=3; list B ranks: d3=1, d2=2, d4=3
    val a = Seq((1L, 30.0), (2L, 20.0), (3L, 10.0)).toDF("id", "score")
    val b = Seq((3L, 9.0), (2L, 8.0), (4L, 7.0)).toDF("id", "score")
    val got = Mixing.rrfFuse(Seq(a, b), "id", "score", topN = 10, k = 60)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L) === ((2L, r6(1.0 / 62 + 1.0 / 62)))) // rank 2 both
    assert(got(3L) === ((2L, r6(1.0 / 63 + 1.0 / 61))))
    assert(got(1L) === ((1L, r6(1.0 / 61))))
    assert(got(4L) === ((1L, r6(1.0 / 63))))
    // d2 (consistent 2nd) must out-score d1 (one 1st, absent elsewhere)
    assert(got(2L)._2 > got(1L)._2)
  }

  test("rrfFuse: topN prunes tails; NULL scores drop from that list") {
    val spark = SparkSpec.session
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, (1000 - i).toDouble))
      .toDF("id", "score")
    val b = Seq((1L, Option.empty[Double]), (2L, Some(5.0)))
      .toDF("id", "score")
    val got = Mixing.rrfFuse(Seq(a, b), "id", "score", topN = 10, k = 60)
    // list A contributes only ids 1..10; id 1's null in B drops B's vote
    assert(got.count() === 10)
    val one = got.where(col("id") === 1L).head()
    assert(one.getLong(1) === 1L, "null score must not count as a list")
    val two = got.where(col("id") === 2L).head()
    assert(two.getLong(1) === 2L)
  }

  test("simplifiedSilhouette: tight separated clusters ≈ 1, boundary " +
    "point ≈ 0, ties break to larger cid") {
    val spark = SparkSpec.session
    import spark.implicits._
    val cents = Array(
      (0, Array(1f, 0f, 0f, 0f)),
      (1, Array(0f, 1f, 0f, 0f)))
    val rows = Seq(
      (1L, Seq(10f, 0.1f, 0f, 0f)),  // ~axis 0: a≈0, b≈1 → s≈1
      (2L, Seq(0.1f, 10f, 0f, 0f)),  // ~axis 1
      (3L, Seq(1f, 1f, 0f, 0f)))     // exact boundary: a = b → s = 0
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.simplifiedSilhouette(df, "vec_id", "embedding",
        cents).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0)._1 === 1L)
    assert(got(0)._2 > 0.95, s"tight cluster 0 got ${got(0)._2}")
    // boundary vector ties on score → larger cid wins the assignment
    assert(got(1)._1 === 2L, "tie must assign to cid 1")
    val silStats = Similarity.simplifiedSilhouette(df, "vec_id",
      "embedding", cents)
    val boundary = silStats.where(col("cluster_id") === 1).head()
    // cluster 1 holds vec 2 (s≈1) and the boundary vec 3 (s=0)
    assert(boundary.getDouble(2) > 0.4 && boundary.getDouble(2) < 0.6)
  }

  test("simplifiedSilhouette: coincident centroids score 0, not NaN; " +
    "needs >= 2 centroids") {
    val spark = SparkSpec.session
    import spark.implicits._
    val same = Array((0, Array(1f, 0f)), (1, Array(1f, 0f)))
    val df = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.simplifiedSilhouette(df, "vec_id", "embedding",
      same).head()
    assert(r.getDouble(2) === 0.0)
    intercept[IllegalArgumentException] {
      Similarity.simplifiedSilhouette(df, "vec_id", "embedding",
        Array((0, Array(1f, 0f))))
    }
  }
}
