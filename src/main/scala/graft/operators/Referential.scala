package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity check of a fact column against an allowlist
  * dimension via broadcast hash anti-join (north-star requirement;
  * reference analogue is the `isin` vocabulary membership at
  * /root/reference/utils/validate_core.py:272,298, which is semantically
  * a broadcast left-semi join against a literal vocabulary).
  *
  * The dimension is metadata-sized (an allowlist), so `broadcast()` pins
  * `BroadcastHashJoinExec` — zero shuffle of the fact table at any scale.
  */
object Referential {

  /** Rows of `fact` whose `factCol` has no match in `dim.dimCol`. */
  def orphans(fact: DataFrame, factCol: String, dim: DataFrame, dimCol: String): DataFrame = {
    val allow = dim.select(col(dimCol).as(factCol)).distinct()
    fact.join(broadcast(allow), Seq(factCol), "left_anti")
  }

  /** Violation rows (idCol as doc_id, rule_id, offending_value). */
  def violations(
      fact: DataFrame, idCol: String, factCol: String,
      dim: DataFrame, dimCol: String,
      ruleId: String = "R_REF_SOURCE"): DataFrame =
    orphans(fact, factCol, dim, dimCol).select(
      col(idCol).cast("string").as("doc_id"),
      lit(ruleId).as("rule_id"),
      col(factCol).cast("string").as("offending_value"))
}
