package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for document fingerprinting:
  *
  *  - [[SimHash64]] — 64-bit SimHash over a token array (near-dup
  *    signature; Hamming-close signatures ⇒ similar documents).
  *  - [[RollingFingerprint]] — Karp–Rabin rolling hash winnowed to the
  *    minimum window hash (robust content fingerprint).
  *
  * Both are per-row compute-bound loops, so an interpreted Expression
  * (CodegenFallback) already beats HOF chains; token hashing reuses
  * Spark's XxHash64 kernel. They sit in a projection, not an aggregate,
  * so the scan around them still pipelines.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = XxHash64Function.hash(
          tokens.getUTF8String(t), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "graft_simhash64"
}

/** min-of-window Karp–Rabin fingerprint over the raw text (window in
  * characters) — the winnowing idea (Schleimer et al., SIGMOD'03) reduced
  * to the single global minimum for a compact per-doc fingerprint. */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < window) return XxHash64Function.hash(
      UTF8String.fromString(s), StringType, 7L)
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < window - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * B + s.charAt(i); i += 1 }
    var minH = h
    while (i < s.length) {
      h = (h - s.charAt(i - window) * pow) * B + s.charAt(i)
      if (java.lang.Long.compareUnsigned(h, minH) < 0) minH = h
      i += 1
    }
    minH
  }

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
  override def prettyName: String = "graft_fingerprint"
}

object TextExpressions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head))
    reg.registerFunction(FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (es: Seq[Expression]) => RollingFingerprint(
        es.head,
        es(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString.toInt))
  }

  def simhash64(tokens: Column): Column = call_function("graft_simhash64", tokens)
  def fingerprint(text: Column, window: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_fingerprint", text, lit(window))
  }
}
