package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as ONE native expression: lowercase → whitespace
  * split → n-gram join, in a single pass over the string.
  *
  * The HOF spelling (`transform(sequence(0, size(ws)-n), i →
  * concat_ws(' ', ws[i], ws[i+1], ws[i+2]))`) re-evaluates the whole
  * `ws = filter(split(lower(trim(text))))` subtree at every element_at
  * site of every lambda element — interpreted HOFs have no common-
  * subexpression elimination, so shingling 5 000 docs cost ~100 s where
  * this expression costs < 1 s. Semantics identical (incl. the
  * fewer-than-n-words fallback to one joined shingle).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT: word identity must not depend on the JVM default
    // locale (matches WordIds and the SQL lower() the oracles use)
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
    val shingles: Array[UTF8String] =
      if (words.length < n) Array(UTF8String.fromString(words.mkString(" ")))
      else {
        val out = new Array[UTF8String](words.length - n + 1)
        var i = 0
        while (i + n <= words.length) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        out
      }
    ArrayData.toArrayData(shingles)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "graft_shingles"
}

/** MinHash-LSH band keys straight from the token array: signature minima
  * and banded hashes in one evaluation — nothing for CollapseProject to
  * duplicate downstream. Output: array of `bands` longs. */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val coefA: Array[Long] = {
    val rnd = new java.util.SplittableRandom(seed)
    Array.fill(k)(rnd.nextLong() | 1L)
  }
  @transient private lazy val coefB: Array[Long] = {
    val rnd = new java.util.SplittableRandom(seed + 1)
    Array.fill(k)(rnd.nextLong())
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nEl = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nEl) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(arr.getUTF8String(i), StringType, seed)
        var j = 0
        while (j < k) {
          val hj = coefA(j) * h + coefB(j)
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    val r = k / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L ^ b
      var j = b * r
      while (j < (b + 1) * r) { h = (h ^ mins(j)) * 0xC2B2AE3D27D4EB4FL; j += 1 }
      keys(b) = h
      b += 1
    }
    ArrayData.toArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBandKeys = copy(child = c)
  override def prettyName: String = "graft_minhash_bands"
}

object ShingleExpression {
  /** Idempotent; Column builders self-register on the active session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("graft_shingles"))) return
    def intArg(es: Seq[Expression], i: Int): Int =
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString.toInt
    reg.registerFunction(FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => WordShingles(es.head, intArg(es, 1)))
    reg.registerFunction(FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "graft_minhash_bands"),
      (es: Seq[Expression]) => MinHashBandKeys(es.head, intArg(es, 1), intArg(es, 2)))
  }

  private def ensure(): Unit =
    try register(SparkSession.active) catch { case _: IllegalStateException => () }

  def shingles(text: Column, n: Int): Column = {
    ensure(); call_function("graft_shingles", text, lit(n))
  }
  def minhashBands(tokens: Column, k: Int, bands: Int): Column = {
    ensure(); call_function("graft_minhash_bands", tokens, lit(k), lit(bands))
  }
}
