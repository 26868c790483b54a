package graft.model

/** Rule data model for the validation engine.
  *
  * Mirrors the reference CDE rule-row shape (one row per (Table, Field);
  * see /root/reference/resource/app_schema_v0.9.3.json:9-22 and the
  * cleaning pipeline in /root/reference/utils/cde.py:258-339) as a Scala
  * ADT compiled once on the driver into Catalyst predicates.
  */
sealed trait RuleType extends Product with Serializable
object RuleType {
  /** String cell parses as a number with no fractional part ("5", "5.0",
    * "1e3" all valid — reference /root/reference/utils/validate_core.py:238-252). */
  case object IntegerT extends RuleType
  /** String cell parses as a number (/root/reference/utils/validate_core.py:254-268). */
  case object FloatT extends RuleType
  /** Cell must be a member of the Validation vocabulary
    * (/root/reference/utils/validate_core.py:270-315). */
  case object EnumT extends RuleType
  /** Full-match of the Validation pattern
    * (/root/reference/utils/validate_core.py:317-339). */
  case object RegexT extends RuleType
  /** Unconstrained (/root/reference/utils/validate_core.py:341). */
  case object StringT extends RuleType

  def parse(s: String): RuleType = s.trim match {
    case "Integer" => IntegerT
    case "Float"   => FloatT
    case "Enum"    => EnumT
    case "Regex"   => RegexT
    case _         => StringT
  }
}

sealed trait Requirement extends Product with Serializable
object Requirement {
  case object Required extends Requirement
  case object Optional extends Requirement
  /** Skipped during validation (/root/reference/utils/validate_core.py:210-211). */
  case object Assigned extends Requirement
  /** Dropped when cleaning the rule table (/root/reference/utils/cde.py:423-469). */
  case object Alias extends Requirement

  def parse(s: String): Requirement = s.trim match {
    case "Required" => Required
    case "Assigned" => Assigned
    case "Alias"    => Alias
    case _          => Optional
  }
}

/** One declarative constraint over one column of one table.
  *
  * `validation` holds the Enum vocabulary (in declaration order — order
  * matters for report rendering); `pattern` the Regex source. List-literal
  * cells ("['a','b']") are parsed once on the driver
  * (reference: /root/reference/utils/validate_core.py:65-76).
  */
final case class Rule(
    table: String,
    field: String,
    dataType: RuleType,
    required: Requirement,
    validation: Seq[String] = Nil,
    pattern: String = "",
    fillNull: Seq[String] = Nil,
    allowMultiEnum: Boolean = false,
    specificSpecies: Seq[String] = Nil,
    specificSampleSource: Seq[String] = Nil,
    specificAssays: Seq[String] = Nil,
    displayName: String = "",
    description: String = "") {
  def ruleId: String = s"$table.$field"
  def isRequired: Boolean = required == Requirement.Required
  /** "REQUIRED" / "OPTIONAL" tag used in report rows
    * (/root/reference/utils/validate_core.py:214). */
  def optReq: String = if (isRequired) "REQUIRED" else "OPTIONAL"
}

object Rule {
  /** Parse a Python-ish list literal cell: "['a', 'b']", '["a"]', "[]",
    * bare scalars force-wrapped to a single-element list — semantics of
    * the reference's parse_literal_list
    * (/root/reference/utils/validate_core.py:65-76). Tolerant, driver-side
    * only (runs once per rule, never per row).
    */
  def parseListLiteral(raw: String): Seq[String] = {
    if (raw == null) return Nil
    val s = raw.trim
    if (s.isEmpty) return Nil
    if (!(s.startsWith("[") && s.endsWith("]"))) return Seq(stripQuotes(s))
    val inner = s.substring(1, s.length - 1).trim
    if (inner.isEmpty) return Nil
    // split on commas not inside quotes
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < inner.length) { cur.append(c).append(inner.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = 0
        else cur.append(c)
      } else c match {
        case '\'' | '"' => quote = c
        case ','        => out += cur.result().trim; cur.clear()
        case _          => cur.append(c)
      }
      i += 1
    }
    val last = cur.result().trim
    if (last.nonEmpty || inner.endsWith(",")) out += last
    out.result().map(unescape)
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') || (s.head == '"' && s.last == '"')))
      s.substring(1, s.length - 1)
    else s

  private def unescape(s: String): String =
    s.replace("\\'", "'").replace("\\\"", "\"").replace("\\\\", "\\")

  /** Reference truthiness for the AllowMultiEnum cell — Excel stores 1 as
    * float so "1.0" counts (/root/reference/utils/validate_core.py:284-285). */
  def parseAllowMulti(raw: String): Boolean = {
    if (raw == null) false
    else raw.trim.toLowerCase match {
      case "true" | "1" | "1.0" | "yes" => true
      case _                            => false
    }
  }
}

/** A sparse violation row — the scalable replacement for the reference's
  * dense rows×cols invalid-cell mask
  * (/root/reference/utils/validate_core.py:202). */
final case class Violation(doc_id: String, rule_id: String, offending_value: String)

/** Typed row of the primary engine input (BASELINE.json input_hint):
  * an Iceberg/parquet table of pre-tokenized training sequences. */
final case class SeqRecord(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)
