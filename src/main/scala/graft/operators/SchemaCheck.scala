package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Schema-evolution validation: diff an observed table schema against
  * the declared contract BEFORE any row-level pass runs — the cheap
  * driver-side gate that catches a writer deploying a new column, a
  * type widening, or a nullability relaxation the moment a snapshot
  * lands, instead of as a confusing row-level failure 10^12 rows later.
  *
  * Violations use the engine's (field, rule_id, offending_value) shape:
  *  - R_SCHEMA_MISSING     — contract column absent from the table;
  *  - R_SCHEMA_EXTRA       — table column the contract doesn't declare
  *                           (suppressed with `allowExtra`, the additive
  *                           schema-evolution mode);
  *  - R_SCHEMA_TYPE        — same name, different type (nested types
  *                           compared structurally via simpleString);
  *  - R_SCHEMA_NULLABILITY — contract says required (non-nullable) but
  *                           the table admits nulls; the opposite
  *                           direction (table stricter) is fine.
  *
  * Pure metadata — zero jobs, zero scans. Matching is by name,
  * order-insensitive (column order is not part of a columnar contract).
  */
object SchemaCheck {

  final case class SchemaViolation(field: String, ruleId: String, detail: String)

  def diff(actual: StructType, expected: StructType,
           allowExtra: Boolean = false): Seq[SchemaViolation] = {
    val act = actual.fields.map(f => f.name -> f).toMap
    val exp = expected.fields.map(f => f.name -> f).toMap
    val missing = expected.fields.toSeq.filterNot(f => act.contains(f.name)).map(f =>
      SchemaViolation(f.name, "R_SCHEMA_MISSING", s"expected ${f.dataType.simpleString}"))
    val extra: Seq[SchemaViolation] =
      if (allowExtra) Nil
      else actual.fields.toSeq.filterNot(f => exp.contains(f.name)).map(f =>
        SchemaViolation(f.name, "R_SCHEMA_EXTRA", s"found ${f.dataType.simpleString}"))
    val common = expected.fields.toSeq.flatMap { e =>
      act.get(e.name).toSeq.flatMap { a => typeViolations(a, e) }
    }
    (missing ++ extra ++ common).sortBy(v => (v.field, v.ruleId))
  }

  private def typeViolations(a: StructField, e: StructField): Seq[SchemaViolation] = {
    val t =
      if (a.dataType.simpleString != e.dataType.simpleString)
        Seq(SchemaViolation(a.name, "R_SCHEMA_TYPE",
          s"expected ${e.dataType.simpleString}, found ${a.dataType.simpleString}"))
      else Nil
    val n =
      if (!e.nullable && a.nullable)
        Seq(SchemaViolation(a.name, "R_SCHEMA_NULLABILITY",
          "expected required, found nullable"))
      else Nil
    t ++ n
  }

  /** DataFrame flavor for report/sink composition. */
  def violations(spark: SparkSession, actual: StructType, expected: StructType,
                 allowExtra: Boolean = false): DataFrame = {
    import spark.implicits._
    diff(actual, expected, allowExtra)
      .map(v => (v.field, v.ruleId, v.detail))
      .toDF("field", "rule_id", "offending_value")
  }

  /** Gate helper: true iff the table can be validated under the
    * contract (no missing columns, no type conflicts; extras and
    * nullability are advisory). */
  def compatible(actual: StructType, expected: StructType): Boolean =
    diff(actual, expected, allowExtra = true)
      .forall(_.ruleId == "R_SCHEMA_NULLABILITY")
}
