package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.DuckRound.duckRound

/** Pins [[graft.functions.DuckRound]] to DuckDB's scaled-double
  * `std::round(x·10^p)/10^p` semantics on exactly the tie class that
  * made the round-5 driver flag q_group_fence red: values whose scaled
  * magnitude lands on a representable .5, where Spark's own `round()`
  * (HALF_UP over the shortest decimal repr) disagrees with the DuckDB
  * oracle. Expected values below are DuckDB 1.0.0 outputs, captured
  * from `SELECT round(v, p)` over these exact doubles. */
class DuckRoundSpec extends AnyFunSuite {

  private def run(p: Int, vs: Double*): Seq[java.lang.Double] = {
    val spark = SparkSpec.session
    import spark.implicits._
    vs.toDF("v").select(duckRound(col("v"), p).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null
        else Double.box(r.getDouble(0))).toSeq
  }

  test("the four round-5 driver-red q_group_fence rows match DuckDB") {
    // raw lo/hi values at sf0.1 where Spark round() emitted the OTHER
    // side of the tie (src14 lo, src6/8/9 hi)
    assert(run(4, -281.13915, 898.5301499999999, 862.5718499999999,
      947.3666499999999) ===
      Seq[java.lang.Double](-281.1391, 898.5302, 862.5719, 947.3667))
  }

  test("ties round half away from zero on the scaled double") {
    assert(run(4, 2.00005, -2.00005, 0.5, -0.5) ===
      Seq[java.lang.Double](2.0001, -2.0001, 0.5, -0.5))
    assert(run(0, 2.5, -2.5, 3.5, -3.5) ===
      Seq[java.lang.Double](3.0, -3.0, 4.0, -4.0))
  }

  test("non-tie values agree with plain rounding, nulls propagate") {
    assert(run(6, 0.2793049115530215, -1.1172196462120847) ===
      Seq[java.lang.Double](0.279305, -1.11722))
    val spark = SparkSpec.session
    import spark.implicits._
    val r = Seq[Option[Double]](None).toDF("v")
      .select(duckRound(col("v"), 4)).collect()
    assert(r.head.isNullAt(0))
  }

  test("exact halves of an integer-derived median stay exact") {
    // med/mad at p=4: .0 and .5 inputs are fixed points
    assert(run(4, 732.5, 41.0, -12.5) ===
      Seq[java.lang.Double](732.5, 41.0, -12.5))
  }
}
