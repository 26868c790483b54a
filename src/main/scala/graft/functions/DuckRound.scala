package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-compatible double rounding.
  *
  * DuckDB's `round(DOUBLE, p)` is `std::round(x * 10^p) / 10^p` — ties
  * round half away from zero on the SCALED DOUBLE — while Spark's
  * `round()` applies HALF_UP to `BigDecimal.valueOf(x)` (the shortest
  * decimal repr). The two disagree exactly when the scaled value lands
  * on a representable .5: the round-5 driver flagged q_group_fence red
  * on 4 of 20 rows (e.g. lo = −281.13915 → Spark −281.1392 vs DuckDB
  * −281.1391) because median±MAD of integer columns are exact halves
  * and k·1.4826 products systematically hit that tie.
  *
  * [[duckRound]] reproduces the DuckDB formula with whole-stage-codegen
  * built-ins only: scale, split the magnitude at its floor (exact in
  * IEEE for |v| < 2^52), bump when the fractional part ≥ 0.5, re-apply
  * the sign (negation keeps −0.0 identical to std::round), divide. The
  * emulation was validated value-by-value against DuckDB 1.0.0 over
  * every group_fence / gate_ztest row at sf0.001/0.01/0.1 — zero
  * diffs, including the 4 rows where Spark's round() disagrees. */
object DuckRound {

  /** DuckDB-semantics `round(c, p)` for non-negative `p` on doubles.
    * NULLs propagate through the arithmetic unchanged. */
  def duckRound(c: Column, p: Int): Column = {
    require(p >= 0 && p <= 15, s"precision $p out of the validated range")
    val pw = math.pow(10.0, p) // exact double for p <= 15
    val v = c.cast("double") * lit(pw)
    val a = abs(v)
    val fa = floor(a)
    val r = fa + when(a - fa >= 0.5, lit(1.0)).otherwise(lit(0.0))
    when(v < 0, -r).otherwise(r) / lit(pw)
  }
}
