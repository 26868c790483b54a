package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.{Rule, RuleType}
import graft.norm.Normalize.NullSentinel

/** Compiles a [[graft.model.Rule]] into a Catalyst validity predicate
  * (`Column` of BooleanType) — the Spark-native replacement for the
  * reference's per-rule pandas passes and per-cell Python lambdas
  * (/root/reference/utils/validate_core.py:238-341). Zero row-level UDFs:
  * everything is `isin`/`cast`/`rlike`/higher-order functions, so the
  * whole rule set fuses into one whole-stage-codegen'd scan.
  *
  * Sentinel asymmetry preserved exactly (the reference's trickiest
  * semantics — validate_core.py:229 vs :270-298 vs :291):
  *  - Integer/Float/Regex auto-allow FillNull ∪ {"NA"};
  *  - single-Enum allows "NA" only when listed in FillNull (or Validation);
  *  - multi-Enum re-allows bare "NA".
  */
object Predicates {

  /** FillNull ∪ sentinel — `allowed_specials` (validate_core.py:229). */
  private def specials(rule: Rule): Seq[String] =
    (rule.fillNull :+ NullSentinel).distinct

  private def isSpecial(c: Column, rule: Rule): Column =
    c.isin(specials(rule): _*)

  /** True where the (string) cell satisfies the rule. */
  def valid(rule: Rule, c: Column): Column = rule.dataType match {
    case RuleType.IntegerT =>
      // pd.to_numeric(errors="coerce") parses ∧ x % 1 == 0 — "5.0"/"1e3"
      // are valid Integers (validate_core.py:240-241). try_cast to double
      // (NOT long) replicates the coerce-to-NaN semantics under Spark 4
      // ANSI mode.
      val d = c.try_cast("double")
      isSpecial(c, rule) || (d.isNotNull && d % 1.0 === 0.0)

    case RuleType.FloatT =>
      isSpecial(c, rule) || c.try_cast("double").isNotNull

    case RuleType.EnumT if rule.allowMultiEnum =>
      // validate_core.py:287-296: cell ∈ FillNull ∨ cell == "NA" ∨
      // (non-empty trimmed ';' tokens all ∈ Validation)
      val tokens = filter(transform(split(c, ";"), t => trim(t)), t => t =!= "")
      val inFill =
        if (rule.fillNull.nonEmpty) c.isin(rule.fillNull: _*) else lit(false)
      inFill || c === NullSentinel ||
        (size(tokens) > 0 && forall(tokens, t => t.isin(rule.validation: _*)))

    case RuleType.EnumT =>
      // single Enum: Validation ∪ FillNull only — "NA" is NOT auto-allowed
      // (validate_core.py:270-298). Catalyst rewrites In → InSet for
      // large vocabularies (OptimizeIn).
      val vocab = (rule.validation ++ rule.fillNull).distinct
      if (vocab.isEmpty) lit(false) else c.isin(vocab: _*)

    case RuleType.RegexT =>
      // fullmatch semantics → anchor as ^(?:pat)$ (validate_core.py:324).
      // Invalid pattern ⇒ every non-special cell invalid (:325-327); the
      // compile check happens once here on the driver, never per row.
      val compiles =
        try { java.util.regex.Pattern.compile(rule.pattern); true }
        catch { case _: java.util.regex.PatternSyntaxException => false }
      if (compiles)
        isSpecial(c, rule) || c.rlike("^(?:" + rule.pattern + ")$")
      else isSpecial(c, rule)

    case RuleType.StringT => lit(true) // unconstrained (validate_core.py:341)
  }

  /** Convenience: the violation (negated) predicate. */
  def invalid(rule: Rule, c: Column): Column = !valid(rule, c)
}
