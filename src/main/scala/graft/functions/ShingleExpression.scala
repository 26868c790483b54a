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

/** Fixed-width word chunks in ONE native pass: lowercase → whitespace
  * split → join each group of `chunkWords` words (last chunk short),
  * the "paragraph" unit for chunk-level dedup. Same split semantics as
  * [[WordShingles]]/`Dedup.words`. The HOF spelling (`transform` over
  * a chunk-index sequence with `slice(ws, …)` inside the lambda)
  * re-evaluates the whole word-split subtree once per CHUNK per
  * reference — the no-CSE-in-interpreted-lambdas cost this file's
  * header documents. Empty/blank text ⇒ empty array. */
case class WordChunks(child: Expression, chunkWords: Int)
    extends UnaryExpression with CodegenFallback {
  require(chunkWords >= 1, "chunkWords must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return ArrayData.toArrayData(Array.empty[UTF8String])
    val nChunks = (words.length + chunkWords - 1) / chunkWords
    val out = new Array[UTF8String](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * chunkWords
      val end = math.min(start + chunkWords, words.length)
      val sb = new java.lang.StringBuilder(words(start))
      var j = start + 1
      while (j < end) { sb.append(' ').append(words(j)); j += 1 }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordChunks = copy(child = c)
  override def prettyName: String = "graft_word_chunks"
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

/** Distinct hashes of every n-token window of a token array, in ONE
  * native evaluation — the gram-extraction primitive for token-level
  * decontamination (benchmark-leak detection on the north-star
  * `tokens:array<int>` payload, no detokenization; the 13-gram overlap
  * check of GPT-3 appendix C / PaLM-style decontamination, here with
  * configurable n).
  *
  * Output is the SORTED DISTINCT window hashes: dedup happens per row
  * inside the expression so the downstream explode→join carries each
  * doc-gram once (shuffle/broadcast-probe volume = distinct grams, not
  * windows — repetitive docs collapse before leaving the row). Docs
  * shorter than n have no n-gram and return an empty array.
  *
  * The hash is an order-sensitive chain of splitmix64-finalized tokens
  * (h ← (h ⊕ fmix64(tok)) · C per element), so equal windows hash equal
  * and permuted windows don't. The oracle joins on gram CONTENT
  * (DuckDB list slices); hash-equality equals content-equality absent
  * 64-bit collisions (≈2.7e4 expected colliding PAIRS at 10^12 grams —
  * negligible false-contamination, and decontamination errs safe:
  * a collision flags a clean doc, never unflags a leaked one). */
case class TokenGramHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType | StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int|bigint|string>, got ${other.simpleString}")
    }

  private def fmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // element accessor resolved ONCE from the child type: int32 is the
  // north-star tokens payload; int64 widens it; string covers word-level
  // decontamination (no tokenizer) — word identity via xxhash64 of the
  // UTF-8 bytes, so equal words hash equal across rows and frames
  @transient private lazy val tokAt: (ArrayData, Int) => Long =
    child.dataType match {
      case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toLong
      case ArrayType(LongType, _)    => (a, i) => a.getLong(i)
      case ArrayType(StringType, _)  => (a, i) =>
        val s = a.getUTF8String(i)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val nWin = len - n + 1
    if (nWin <= 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var h = 0x9E3779B97F4A7C15L ^ n
      var j = 0
      while (j < n) {
        // null token elements hash as a reserved sentinel (tokens are
        // non-null by schema; defensive for hand-built test frames)
        val tok = if (arr.isNullAt(i + j)) Long.MinValue
                  else tokAt(arr, i + j)
        h = (h ^ fmix64(tok)) * 0xC2B2AE3D27D4EB4FL
        j += 1
      }
      hs(i) = h
      i += 1
    }
    // distinct=false keeps WINDOW ORDER (index i = window start) — the
    // positional mode span-scrubbing needs; distinct=true is the
    // set-semantics mode decontamination explodes
    if (!distinct) return ArrayData.toArrayData(hs)
    java.util.Arrays.sort(hs)
    var out = 1
    var k = 1
    while (k < nWin) {
      if (hs(k) != hs(k - 1)) { hs(out) = hs(k); out += 1 }
      k += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(hs, out))
  }

  override protected def withNewChildInternal(c: Expression): TokenGramHashes = copy(child = c)
  override def prettyName: String =
    if (distinct) "graft_token_grams" else "graft_token_grams_seq"
}

object ShingleExpression {
  /** Idempotent; Column builders self-register on the active session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // keyed on the NEWEST function: an older partial registration must
    // not short-circuit the additions that came after it
    if (reg.functionExists(FunctionIdentifier("graft_word_chunks"))) return
    def intArg(es: Seq[Expression], i: Int): Int =
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString.toInt
    reg.registerFunction(FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => WordShingles(es.head, intArg(es, 1)))
    reg.registerFunction(FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "graft_minhash_bands"),
      (es: Seq[Expression]) => MinHashBandKeys(es.head, intArg(es, 1), intArg(es, 2)))
    reg.registerFunction(FunctionIdentifier("graft_token_grams"),
      new ExpressionInfo(classOf[TokenGramHashes].getName, "graft_token_grams"),
      (es: Seq[Expression]) => TokenGramHashes(es.head, intArg(es, 1)))
    reg.registerFunction(FunctionIdentifier("graft_token_grams_seq"),
      new ExpressionInfo(classOf[TokenGramHashes].getName, "graft_token_grams_seq"),
      (es: Seq[Expression]) => TokenGramHashes(es.head, intArg(es, 1), distinct = false))
    reg.registerFunction(FunctionIdentifier("graft_word_chunks"),
      new ExpressionInfo(classOf[WordChunks].getName, "graft_word_chunks"),
      (es: Seq[Expression]) => WordChunks(es.head, intArg(es, 1)))
  }

  private def ensure(): Unit =
    try register(SparkSession.active) catch { case _: IllegalStateException => () }

  def shingles(text: Column, n: Int): Column = {
    ensure(); call_function("graft_shingles", text, lit(n))
  }
  def minhashBands(tokens: Column, k: Int, bands: Int): Column = {
    ensure(); call_function("graft_minhash_bands", tokens, lit(k), lit(bands))
  }
  def tokenGrams(tokens: Column, n: Int): Column = {
    ensure(); call_function("graft_token_grams", tokens, lit(n))
  }
  /** Window-ordered (non-distinct) gram hashes: index i = window start. */
  def tokenGramsSeq(tokens: Column, n: Int): Column = {
    ensure(); call_function("graft_token_grams_seq", tokens, lit(n))
  }
  def wordChunks(text: Column, chunkWords: Int): Column = {
    ensure(); call_function("graft_word_chunks", text, lit(chunkWords))
  }
}
