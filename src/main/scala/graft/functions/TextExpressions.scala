package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
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

/** FULL winnowing fingerprint set (Schleimer et al., SIGMOD'03): the
  * rightmost minimum of each `w`-hash window over the `k`-gram
  * Karp–Rabin hash stream, deduplicated and sorted. Unlike
  * [[RollingFingerprint]]'s single global min, this is the MOSS local
  * fingerprinting scheme with the detection guarantee: any shared
  * substring of length ≥ w + k − 1 contributes at least one shared
  * fingerprint — deterministic recall, where MinHash is probabilistic.
  * O(len) via a monotonic deque (amortized one push/pop per gram); the
  * md5 window spelling (the SQL-replicable oracle mode in
  * [[graft.operators.Winnowing]]) re-hashes every gram from scratch.
  * Documents shorter than k yield the whole-text hash as a singleton.
  * Per-row compute-bound loop ⇒ interpreted Expression in a
  * projection (same rationale as [[RollingFingerprint]]). */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = s.length - k + 1
    if (m < 1) {
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(XxHash64Function.hash(UTF8String.fromString(s), StringType, 7L)))
    }
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    // gram hashes, rolling
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = h
    while (i < s.length) {
      h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
      hs(i - k + 1) = h
      i += 1
    }
    // monotonic deque of indices, values strictly increasing front→back
    // (equal values popped ⇒ rightmost tie survives, matching the
    // min-by-(hash asc, pos desc) oracle spelling)
    val deque = new Array[Int](m)
    var lo = 0; var hi = 0 // [lo, hi) holds candidate indices
    val firstRecord = math.min(w, m) - 1 // 0-based window-end position
    val out = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p < m) {
      while (hi > lo &&
        java.lang.Long.compareUnsigned(hs(deque(hi - 1)), hs(p)) >= 0) hi -= 1
      deque(hi) = p; hi += 1
      if (deque(lo) <= p - w) lo += 1
      if (p >= firstRecord) out.add(hs(deque(lo)))
      p += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): WinnowedFingerprints =
    copy(child = c)
  override def prettyName: String = "graft_winnow"
}

/** The md5 ORACLE spelling of [[WinnowedFingerprints]] as one in-row
  * pass: gram hash = the first 16 hex chars of md5(substr(text, i, k))
  * — bit-identical to the DataFrame/DuckDB window spelling in
  * [[graft.operators.Winnowing]] — selected by the same rightmost-
  * minimum monotonic deque, deduplicated in-row. Exists because the
  * exploded DataFrame spelling shuffles the whole (id, pos, hash) gram
  * stream through an exchange + per-doc sort window + distinct, which
  * at corpus scale moves ~len rows per document for a selection that
  * is a pure per-row function; this expression keeps text out of every
  * exchange and leaves only the O(2·len/w) selected fingerprints to
  * move. Lexicographic order on the fixed-width lowercase hex equals
  * unsigned numeric order of the md5's first 8 bytes, so the deque
  * compares longs and hex-encodes only the survivors. Substring
  * semantics are code-point based (Spark `substr`), implemented as
  * UTF-8 byte-slice hashing over code-point boundaries — identical
  * bytes to md5(substr(...)) for any input. Documents shorter than k
  * yield the whole-text md5 prefix as a singleton. */
case class WinnowedFingerprintsMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def hashPrefix(bytes: Array[Byte], from: Int, until: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, from, until - from)
    val out = d.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (out(i) & 0xFFL); i += 1 }
    h
  }

  private def hex16(h: Long): UTF8String = {
    val cs = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val nib = ((h >>> ((15 - i) << 2)) & 0xFL).toInt
      cs(i) = (if (nib < 10) '0' + nib else 'a' + nib - 10).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // code-point start offsets (Spark substr counts code points)
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) nChars += 1
      b += 1
    }
    val offsets = new Array[Int](nChars + 1)
    var ci = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) { offsets(ci) = b; ci += 1 }
      b += 1
    }
    offsets(nChars) = bytes.length
    val m = nChars - k + 1
    if (m < 1) {
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array[AnyRef](hex16(hashPrefix(bytes, 0, bytes.length))))
    }
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = hashPrefix(bytes, offsets(i), offsets(i + k))
      i += 1
    }
    // rightmost-minimum monotonic deque — identical selection rule to
    // [[WinnowedFingerprints]] (equal values popped ⇒ rightmost tie)
    val deque = new Array[Int](m)
    var lo = 0; var hi = 0
    val firstRecord = math.min(w, m) - 1
    val out = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    var p = 0
    while (p < m) {
      while (hi > lo &&
        java.lang.Long.compareUnsigned(hs(deque(hi - 1)), hs(p)) >= 0) hi -= 1
      deque(hi) = p; hi += 1
      if (deque(lo) <= p - w) lo += 1
      if (p >= firstRecord) out.add(hs(deque(lo)))
      p += 1
    }
    val arr = new Array[AnyRef](out.size())
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = hex16(it.next()); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): WinnowedFingerprintsMd5 =
    copy(child = c)
  override def prettyName: String = "graft_winnow_md5"
}

/** Content-defined-chunking cut positions (the LBFS/rsync boundary
  * rule, Muthitacharoen et al. SOSP 2001): ONE O(len) Karp–Rabin pass;
  * position i (1-based, i ≥ window) is a boundary when the rolling hash
  * of chars (i-window, i] matches the seed's low `maskBits` bits —
  * expected chunk length ≈ 2^maskBits chars. The hash state is a pure
  * function of the window's CONTENT (the seed shifts only the target
  * pattern): a seed folded into the polynomial would scale as B^i with
  * absolute position and break shift-resynchronization. Returns the ascending
  * array<int> of boundaries in (0, len] for
  * [[graft.operators.CdcChunking]]'s scale mode (the md5 oracle mode
  * re-hashes every window from scratch: O(len×window)). Per-row
  * compute-bound loop ⇒ interpreted Expression in a projection, same
  * rationale as [[RollingFingerprint]]. */
case class CdcBoundaries(child: Expression, window: Int, maskBits: Int,
                         seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(window > 0, "window must be positive")
  require(maskBits > 0 && maskBits < 63, "maskBits must be in [1, 62]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val mask = (1L << maskBits) - 1
    // the seed enters the boundary PREDICATE, never the rolling state: a
    // seed term inside h would ride along as seed*B^i — a function of
    // ABSOLUTE position that breaks the shift-resynchronization contract
    // (boundaries of a prefix-shifted copy would never realign)
    val target = seed & mask
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (s.length >= window) {
      val B = 1000003L
      var pow = 1L
      var i = 0
      while (i < window - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = h * B + s.charAt(i); i += 1 }
      // i is now the count of chars consumed = the 1-based position of
      // the window's last char
      if ((h & mask) == target) out += i
      while (i < s.length) {
        h = (h - s.charAt(i - window) * pow) * B + s.charAt(i)
        i += 1
        if ((h & mask) == target) out += i
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcBoundaries =
    copy(child = c)
  override def prettyName: String = "graft_cdc_boundaries"
}

/** One-pass CDC chunker: boundaries AND per-chunk (md5-hex hash, char
  * length) in a single native eval — the whole chunking step as one
  * expression. `maskBits == 0` selects the md5-boundary ORACLE mode
  * (boundary at i ⇔ md5 of the `window` chars ending at i starts with
  * hex '0' — byte-identical to DuckDB's md5, so the q_cdc oracles
  * replay it); `maskBits > 0` selects the Karp–Rabin rolling SCALE
  * mode with [[CdcBoundaries]]'s exact loop (seed in the predicate,
  * never the polynomial). Chunk hashes are md5 of the chunk's UTF-8
  * bytes, lowercase hex — exactly Spark's `md5()`.
  *
  * Why one expression instead of boundaries + a `transform` split: the
  * interpreted-HOF spelling re-inlines the whole cuts tree into every
  * `element_at` reference of the split lambda (no CSE in interpreted
  * lambdas — the BENCH.md root cause), which made the md5 mode
  * O(chunks × len × window) PER ROW: measured 172 s for the sf0.1
  * 5k-doc corpus vs well under a second here. One MessageDigest
  * instance serves all windows and chunk hashes of a row. */
case class CdcChunkHashes(child: Expression, window: Int, maskBits: Int,
                          seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(window > 0, "window must be positive")
  require(maskBits >= 0 && maskBits < 63,
    "maskBits must be 0 (md5 oracle mode) or in [1, 62] (rolling mode)")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_hash", StringType, nullable = false),
    StructField("chunk_len", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  private def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(java.lang.Character.forDigit((b(i) >> 4) & 0xF, 16))
      sb.append(java.lang.Character.forDigit(b(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = scala.collection.mutable.ArrayBuffer(0)
    if (maskBits == 0) {
      var i = window
      while (i <= len) {
        val d = md.digest(s.substring(i - window, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0xF0) == 0) cuts += i
        i += 1
      }
    } else if (len >= window) {
      val mask = (1L << maskBits) - 1
      val target = seed & mask
      val B = 1000003L
      var pow = 1L
      var i = 0
      while (i < window - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = h * B + s.charAt(i); i += 1 }
      if ((h & mask) == target) cuts += i
      while (i < len) {
        h = (h - s.charAt(i - window) * pow) * B + s.charAt(i)
        i += 1
        if ((h & mask) == target) cuts += i
      }
    }
    if (cuts.last != len) cuts += len
    val out = new Array[Any](math.max(cuts.length - 1, 0))
    var j = 0
    while (j < out.length) {
      val chunk = s.substring(cuts(j), cuts(j + 1))
      out(j) = InternalRow(
        UTF8String.fromString(hex(md.digest(
          chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)))),
        chunk.length)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunkHashes =
    copy(child = c)
  override def prettyName: String = "graft_cdc_chunk_hashes"
}

/** Apply trained BPE merges to ONE word: split to chars, then for each
  * merge in rank order run one leftmost-first non-overlapping merge-all
  * pass over the token list — the reference BPE apply step (Sennrich et
  * al. 2016), and the SCALE mode for [[graft.operators.TextAnalysis
  * .bpeTrain]]'s vocabulary: list-based merging has no delimiter-block
  * artifact, so arbitrary-length repeat runs resolve exactly (the
  * string-replace tier needs its stacked [[graft.operators.TextAnalysis
  * .BpePasses]] and still caps at 2^passes — the two modes agree
  * whenever runs stay under that cap, the differential PipelineOps
  * test). Merges ride the plan as broadcast-literal arrays: per-row
  * work is O(len × nMerges), no shuffle, no UDF. Returns the subword
  * token array. */
case class BpeApply(child: Expression, lefts: Seq[String],
                    rights: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(lefts.length == rights.length,
    "lefts/rights must be parallel merge arrays")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    var toks = w.map(_.toString).toBuffer
    var m = 0
    while (m < lefts.length && toks.length > 1) {
      val (a, b) = (lefts(m), rights(m))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += a + b; i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out
      m += 1
    }
    ArrayData.toArrayData(toks.toArray.map(UTF8String.fromString))
  }

  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
  override def prettyName: String = "graft_bpe_apply"
}

/** One-pass text profile for language ID + quality scoring: word stats,
  * per-character ratios, BPE-ish token count, stopword hits, and the
  * argmax language — everything the curation heuristics need, computed in
  * a SINGLE traversal of the string.
  *
  * Replaces the round-1 interpreted-HOF spelling (`aggregate(transform(
  * words, …))` per feature plus `array_intersect(array_distinct(ws), …)`
  * per language): interpreted lambdas get no common-subexpression
  * elimination, so the word-split subtree re-evaluated once per language
  * and once per feature — the same 100×+ blowup class documented on
  * [[WordShingles]]. Semantics are identical to the Column spelling it
  * replaces (see field-by-field notes in the eval body).
  */
case class TextProfile(child: Expression) extends UnaryExpression with CodegenFallback {
  import TextProfile._

  override def dataType: DataType = Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_text_profile requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nCp = math.max(s.codePointCount(0, s.length), 1).toDouble

    // character classes in one pass (= regexp_replace count deltas:
    // [\p{Punct}] / [A-Z] / [0-9]), plus the BPE-ish token count
    // (= split on alnum/non-alnum boundaries, keep tokens matching ^\S:
    // maximal alnum runs + every non-alnum non-whitespace char)
    var punct = 0; var upper = 0; var digit = 0
    var bpe = 0; var prevAlnum = false
    var ci = 0
    while (ci < s.length) {
      val c = s.charAt(ci)
      val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (!prevAlnum) bpe += 1 }
      else if (!(c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'))
        bpe += 1
      if (c >= '!' && c <= '~' && !alnum) punct += 1 // ASCII \p{Punct}
      if (c >= 'A' && c <= 'Z') upper += 1
      if (c >= '0' && c <= '9') digit += 1
      prevAlnum = alnum
      ci += 1
    }

    // words = filter(split(lower(trim(text)), "\s+"), _ != "")
    val words = s.toLowerCase(java.util.Locale.ROOT).trim
      .split("\\s+").filter(_.nonEmpty)
    val nWords = words.length
    var sumLen = 0L
    var enHits = 0
    val distinct = new java.util.HashSet[String]()
    var wi = 0
    while (wi < nWords) {
      val w = words(wi)
      sumLen += w.codePointCount(0, w.length)
      if (EnStopSet.contains(w)) enHits += 1
      distinct.add(w)
      wi += 1
    }

    // language scores: |distinct words ∩ profile| per language; zh by
    // raw-text substring containment. argmax with (score, lang) struct
    // ordering: ties go to the lexicographically greatest language —
    // identical to array_max over struct(score, lang).
    var bestScore = Int.MinValue
    var bestLang = ""
    var li = 0
    while (li < Langs.length) {
      val lang = Langs(li)
      var score = 0
      if (lang == "zh") {
        var zi = 0
        while (zi < ZhChars.length) { if (s.contains(ZhChars(zi))) score += 1; zi += 1 }
      } else {
        val stops = StopArrays(li)
        var si = 0
        while (si < stops.length) { if (distinct.contains(stops(si))) score += 1; si += 1 }
      }
      if (score > bestScore || (score == bestScore && lang > bestLang)) {
        bestScore = score; bestLang = lang
      }
      li += 1
    }

    InternalRow(
      nWords,
      bpe,
      if (nWords > 0) sumLen.toDouble / nWords else 0.0,
      punct / nCp,
      upper / nCp,
      digit / nCp,
      if (nWords > 0) enHits.toDouble / nWords else 0.0,
      UTF8String.fromString(if (bestScore > 0) bestLang else "und"),
      math.max(bestScore, 0),
      distinct.size)
  }

  override protected def withNewChildInternal(c: Expression): TextProfile = copy(child = c)
  override def prettyName: String = "graft_text_profile"
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD via java.text.Normalizer) —
  * the canonical first step of text cleaning: visually identical strings
  * with different codepoint sequences (composed é vs e+combining acute)
  * hash differently, so dedup/fingerprinting MUST normalize first.
  * Spark ships no built-in for this; a native expression keeps it off
  * the UDF path. Validated cross-engine: DuckDB's nfc_normalize agrees
  * (both implement the Unicode standard forms). */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val normForm =
    java.text.Normalizer.Form.valueOf(form.toUpperCase(java.util.Locale.ROOT))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if Seq("NFC", "NFD", "NFKC", "NFKD")
          .contains(form.toUpperCase(java.util.Locale.ROOT)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unknown normalization form '$form' (NFC/NFD/NFKC/NFKD)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_normalize_text requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, normForm)) input // common case: no copy
    else UTF8String.fromString(java.text.Normalizer.normalize(s, normForm))
  }

  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
  override def prettyName: String = "graft_normalize_text"
}

/** Deflate compression ratio (compressed/raw bytes, level 6) — the
  * Gopher/RefinedWeb-class gibberish-vs-boilerplate signal: highly
  * repetitive text compresses far below ~0.4, random bytes sit near 1.
  * Per-thread Deflater reuse (reset between rows) keeps the native
  * zlib context allocation off the per-row path. Not SQL-expressible —
  * covered by unit tests and a rows-only query. */
case class CompressionRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import CompressionRatio._
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_compression_ratio requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 1.0
    val d = LocalDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = LocalBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
  override def prettyName: String = "graft_compression_ratio"
}

object CompressionRatio {
  private val LocalDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val LocalBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }
}

object TextProfile {
  /** Tiny per-language stopword profiles (the cheap first-pass heuristic;
    * ambiguous docs get re-scored by a heavier model downstream). */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "dans", "que", "une"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "中", "大"))

  private[functions] val Langs: Array[String] =
    StopwordProfiles.keys.toArray.sorted
  private[functions] val StopArrays: Array[Array[String]] =
    Langs.map(l => StopwordProfiles(l).toArray)
  private[functions] val ZhChars: Array[String] = StopwordProfiles("zh").toArray
  private[functions] val EnStopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    StopwordProfiles("en").foreach(s.add)
    s
  }

  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("upper_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("lang_score", IntegerType, nullable = false),
    // distinct whitespace-words: with n_words this gives the Gopher-style
    // repetition signal (1 - distinct/total) from the SAME single pass
    StructField("n_distinct_words", IntegerType, nullable = false)))
}

/** Whitespace-word → vocabulary-id tokenizer: one pass over the string,
  * each lower-cased word looked up in a driver-built vocabulary (rank
  * order = id; see `TextAnalysis.buildVocab`), misses mapped to
  * `unkId`. The vocabulary rides the expression like
  * [[graft.functions.MultiEnumTokensValid]]'s value list — a transient
  * hash map per executor, no shuffle, no UDF, no join: the
  * explode-join-reassemble spelling shuffles O(total words) rows, this
  * projection shuffles nothing. Word semantics identical to
  * [[WordShingles]] (lowercase, trim, split \s+, drop empties); blank
  * text yields an empty array. The vocabulary is serialized into the
  * plan (once per task binary, like a broadcast var) — fine for
  * word-vocab sizes (50k words ≈ 0.5 MB); a multi-GB BPE merge table
  * would instead warrant an executor-side broadcast handle. */
case class WordIds(child: Expression, vocab: Seq[String], unkId: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT: tokenization must not depend on the JVM's default
    // locale (tr_TR dotless-ı would silently de-sync vocab and oracle)
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
    val out = new Array[Int](words.length)
    var i = 0
    while (i < words.length) {
      val id = ids.get(words(i))
      out(i) = if (id == null) unkId else id.intValue()
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordIds = copy(child = c)
  override def prettyName: String = "graft_word_ids"
}

/** Gopher-style character-level repetition signals (Rae et al. 2021,
  * arXiv:2112.11446, Table A1) in one pass per n over the word stream:
  *
  *  - `top_ngram_char_frac`: character mass covered by the MOST
  *    FREQUENT word `topN`-gram — count × gram character length
  *    (whitespace excluded) over the total word-character mass. Count
  *    ties resolve to the larger character coverage, so the VALUE is
  *    deterministic without a lexicographic tie-break.
  *  - `dup_ngram_char_frac`: the same mass summed over all `dupN`-grams
  *    occurring at least twice — the simple overlap-counting variant
  *    (occurrences may overlap, so the fraction can exceed 1; gating
  *    pipelines threshold it far below that). Both are exactly
  *    integer-ratio arithmetic, so the SQL oracle reproduces them
  *    bit-for-bit.
  *
  * Complements [[TextProfile]]'s word-level `repetition_ratio`: these
  * catch the stutter that distinct-word counting can't see (repeated
  * PHRASES over a diverse vocabulary). Native expression for the same
  * reason as [[WordShingles]] — a per-row HashMap loop has no HOF
  * spelling that isn't interpreted. */
case class RepetitionSignals(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression with CodegenFallback {
  require(topN >= 1 && dupN >= 1, "n-gram sizes must be >= 1")

  override def dataType: DataType = RepetitionSignals.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_repetition_signals requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // same tokenization as TextProfile: filter(split(lower(trim), \s+))
    val words = s.toLowerCase(java.util.Locale.ROOT).trim
      .split("\\s+").filter(_.nonEmpty)
    val n = words.length
    val lens = new Array[Long](n)
    var denom = 0L
    var i = 0
    while (i < n) {
      lens(i) = words(i).codePointCount(0, words(i).length).toLong
      denom += lens(i); i += 1
    }
    // (top-gram mass, duplicated-gram mass) for one n-gram size
    def masses(k: Int): (Long, Long) = {
      if (n < k || denom == 0L) return (0L, 0L)
      val counts = new java.util.HashMap[String, Array[Long]]()
      var a = 0
      while (a + k <= n) {
        val sb = new java.lang.StringBuilder
        var cl = 0L
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ') // words contain no whitespace
          sb.append(words(a + j)); cl += lens(a + j); j += 1
        }
        val e = counts.get(sb.toString)
        if (e == null) counts.put(sb.toString, Array(1L, cl)) else e(0) += 1
        a += 1
      }
      var maxCount = 0L; var topMass = 0L; var dupMass = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        val mass = e(0) * e(1)
        if (e(0) > maxCount) { maxCount = e(0); topMass = mass }
        else if (e(0) == maxCount && mass > topMass) topMass = mass
        if (e(0) >= 2L) dupMass += mass
      }
      (topMass, dupMass)
    }
    val (top, dupAtTopN) = masses(topN)
    val dup = if (dupN == topN) dupAtTopN else masses(dupN)._2
    if (denom == 0L) InternalRow(0.0, 0.0)
    else InternalRow(top.toDouble / denom, dup.toDouble / denom)
  }

  override protected def withNewChildInternal(c: Expression): RepetitionSignals =
    copy(child = c)
  override def prettyName: String = "graft_repetition_signals"
}

object RepetitionSignals {
  val Schema: StructType = StructType(Seq(
    StructField("top_ngram_char_frac", DoubleType, nullable = false),
    StructField("dup_ngram_char_frac", DoubleType, nullable = false)))
}

/** Shannon entropy (bits) of the CODEPOINT distribution of a string —
  * the classic cheap gibberish/boilerplate signal orthogonal to the
  * word-level profile: key-mash and base64 blobs score HIGH (flat
  * char distribution), template spam and run-padding score LOW, and
  * natural language sits in a stable mid band (~3.5–4.5 bits for
  * English), so both tails are filterable. One HashMap pass per row,
  * zero shuffle, sits in the projection next to [[TextProfile]].
  *
  * Determinism: the per-count terms are summed in SORTED count order
  * (HashMap iteration order would vary run to run and make the last
  * ulp of the double nondeterministic — results feed hash-compared
  * oracle rows, so bit-stability matters). Computed as
  * log2(n) − Σ c·log2(c) / n, the count-weighted form a SQL
  * `entropy()` aggregate replays. Empty string → 0.0; null → null. */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_char_entropy requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val e = counts.get(cp)
      if (e == null) counts.put(cp, Array(1L)) else e(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    val cs = new Array[Long](counts.size())
    val it = counts.values().iterator()
    var j = 0
    while (it.hasNext) { cs(j) = it.next()(0); j += 1 }
    java.util.Arrays.sort(cs)
    var acc = 0.0
    j = 0
    val ln2 = math.log(2.0)
    while (j < cs.length) {
      val c = cs(j).toDouble
      acc += c * (math.log(c) / ln2)
      j += 1
    }
    math.log(n.toDouble) / ln2 - acc / n.toDouble
  }

  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
  override def prettyName: String = "graft_char_entropy"
}

/** RAKE candidate phrases (Rose et al. 2010, "Automatic keyword
  * extraction from individual documents"): maximal runs of
  * non-stopword tokens between stopword/document boundaries
  * (whitespace tokenization + Locale.ROOT lowercase — the [[WordIds]]
  * convention), with runs LONGER than `maxLen` words discarded, not
  * truncated (the standard RAKE cap — an over-long run is a failed
  * delimiter split, not a keyphrase). Returns array<string> of phrase
  * instances in document order (duplicates preserved — the scorer
  * needs instance multiplicity for word freq/degree).
  *
  * Native expression for the [[WordIds]] reason: the declarative
  * spelling of this gaps-and-islands fold is a per-document window
  * over EXPLODED tokens — a token-granularity shuffle of the whole
  * corpus — when it is really one in-row loop. */
case class RakePhrases(child: Expression, stopwords: Seq[String], maxLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxLen >= 1, "maxLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rake_phrases requires string, got ${other.simpleString}")
    }

  @transient private lazy val stops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = {
      if (cur.nonEmpty && cur.length <= maxLen)
        out += UTF8String.fromString(cur.mkString(" "))
      cur.clear()
    }
    var i = 0
    while (i < words.length) {
      if (stops.contains(words(i))) flush() else cur += words(i)
      i += 1
    }
    flush()
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): RakePhrases =
    copy(child = c)
  override def prettyName: String = "graft_rake_phrases"
}

object TextExpressions {
  /** Idempotent registration (quiet re-entry: no "replaced function"
    * warnings on repeat calls). The Column builders below self-register
    * against the ACTIVE session, so callers holding only a Column (no
    * session handle) — e.g. `TextAnalysis.tokenCount` — keep working on
    * sessions that never called register explicitly. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("graft_text_profile"))) return
    reg.registerFunction(FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head))
    reg.registerFunction(FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (es: Seq[Expression]) => RollingFingerprint(
        es.head,
        es(1).eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString.toInt))
    reg.registerFunction(FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowedFingerprints].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowedFingerprints(es.head,
        es(1).eval(InternalRow.empty).toString.toInt,
        es(2).eval(InternalRow.empty).toString.toInt))
    reg.registerFunction(FunctionIdentifier("graft_winnow_md5"),
      new ExpressionInfo(classOf[WinnowedFingerprintsMd5].getName,
        "graft_winnow_md5"),
      (es: Seq[Expression]) => WinnowedFingerprintsMd5(es.head,
        es(1).eval(InternalRow.empty).toString.toInt,
        es(2).eval(InternalRow.empty).toString.toInt))
    reg.registerFunction(FunctionIdentifier("graft_text_profile"),
      new ExpressionInfo(classOf[TextProfile].getName, "graft_text_profile"),
      (es: Seq[Expression]) => TextProfile(es.head))
    reg.registerFunction(FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (es: Seq[Expression]) => NormalizeText(es.head,
        es(1).eval(InternalRow.empty).toString))
    reg.registerFunction(FunctionIdentifier("graft_compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName, "graft_compression_ratio"),
      (es: Seq[Expression]) => CompressionRatio(es.head))
    reg.registerFunction(FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_char_entropy"),
      (es: Seq[Expression]) => CharEntropy(es.head))
    reg.registerFunction(FunctionIdentifier("graft_repetition_signals"),
      new ExpressionInfo(classOf[RepetitionSignals].getName,
        "graft_repetition_signals"),
      (es: Seq[Expression]) => RepetitionSignals(es.head,
        es(1).eval(InternalRow.empty).toString.toInt,
        es(2).eval(InternalRow.empty).toString.toInt))
    reg.registerFunction(FunctionIdentifier("graft_bpe_apply"),
      new ExpressionInfo(classOf[BpeApply].getName, "graft_bpe_apply"),
      (es: Seq[Expression]) => {
        def strs(e: Expression): Seq[String] = e.eval(InternalRow.empty)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(StringType).map(_.toString).toSeq
        BpeApply(es.head, strs(es(1)), strs(es(2)))
      })
    reg.registerFunction(FunctionIdentifier("graft_cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "graft_cdc_boundaries"),
      (es: Seq[Expression]) => CdcBoundaries(es.head,
        es(1).eval(InternalRow.empty).toString.toInt,
        es(2).eval(InternalRow.empty).toString.toInt,
        es(3).eval(InternalRow.empty).toString.toLong))
    reg.registerFunction(FunctionIdentifier("graft_cdc_chunk_hashes"),
      new ExpressionInfo(classOf[CdcChunkHashes].getName,
        "graft_cdc_chunk_hashes"),
      (es: Seq[Expression]) => CdcChunkHashes(es.head,
        es(1).eval(InternalRow.empty).toString.toInt,
        es(2).eval(InternalRow.empty).toString.toInt,
        es(3).eval(InternalRow.empty).toString.toLong))
    reg.registerFunction(FunctionIdentifier("graft_word_ids"),
      new ExpressionInfo(classOf[WordIds].getName, "graft_word_ids"),
      (es: Seq[Expression]) => WordIds(
        es.head,
        es(1).eval(InternalRow.empty)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(StringType).map(_.toString).toSeq,
        es(2).eval(InternalRow.empty).toString.toInt))
    reg.registerFunction(FunctionIdentifier("graft_rake_phrases"),
      new ExpressionInfo(classOf[RakePhrases].getName, "graft_rake_phrases"),
      (es: Seq[Expression]) => RakePhrases(
        es.head,
        es(1).eval(InternalRow.empty)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(StringType).map(_.toString).toSeq,
        es(2).eval(InternalRow.empty).toString.toInt))
  }

  /** Best-effort self-registration on the active session (no-op when no
    * session is active yet — the Column then needs an explicit
    * register/GraftExtensions before use, as before). */
  private def ensure(): Unit =
    try register(SparkSession.active) catch { case _: IllegalStateException => () }

  def simhash64(tokens: Column): Column = {
    ensure(); call_function("graft_simhash64", tokens)
  }
  def fingerprint(text: Column, window: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensure(); call_function("graft_fingerprint", text, lit(window))
  }
  def textProfile(text: Column): Column = {
    ensure(); call_function("graft_text_profile", text)
  }
  def normalizeText(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.functions.lit
    ensure(); call_function("graft_normalize_text", text, lit(form))
  }
  def compressionRatio(text: Column): Column = {
    ensure(); call_function("graft_compression_ratio", text)
  }
  def charEntropy(text: Column): Column = {
    ensure(); call_function("graft_char_entropy", text)
  }
  def repetitionSignals(text: Column, topN: Int, dupN: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensure(); call_function("graft_repetition_signals", text, lit(topN), lit(dupN))
  }
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    ensure()
    call_function("graft_bpe_apply", word,
      array(merges.map(m => lit(m._1)): _*),
      array(merges.map(m => lit(m._2)): _*))
  }
  def cdcBoundaries(text: Column, window: Int, maskBits: Int,
                    seed: Long = 37L): Column = {
    import org.apache.spark.sql.functions.lit
    ensure()
    call_function("graft_cdc_boundaries", text, lit(window), lit(maskBits),
      lit(seed))
  }
  def cdcChunkHashes(text: Column, window: Int, maskBits: Int,
                     seed: Long = 37L): Column = {
    import org.apache.spark.sql.functions.lit
    ensure()
    call_function("graft_cdc_chunk_hashes", text, lit(window),
      lit(maskBits), lit(seed))
  }
  def winnow(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensure()
    call_function("graft_winnow", text, lit(k), lit(w))
  }
  def winnowMd5(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensure()
    call_function("graft_winnow_md5", text, lit(k), lit(w))
  }
  def wordIds(text: Column, vocab: Seq[String], unkId: Int = -1): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    ensure()
    call_function("graft_word_ids", text,
      array(vocab.map(lit(_)): _*), lit(unkId))
  }
  def rakePhrases(text: Column, stopwords: Seq[String],
                  maxLen: Int = 4): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    ensure()
    call_function("graft_rake_phrases", text,
      array(stopwords.map(lit(_)): _*), lit(maxLen))
  }
}
