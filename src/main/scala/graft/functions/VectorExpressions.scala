package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding math. A native `Expression`
  * with `doGenCode` beats both higher-order-function chains
  * (`aggregate(zip_with(...))` allocates a lambda frame per element) and
  * Scala UDFs (serde per row) — this is the hot inner loop of ANN search
  * over 10^11 vectors, so it stays inside whole-stage codegen with a
  * primitive float loop.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> or two array<double> arguments, " +
            s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  protected def getter(arr: String, i: String): String =
    if (elemIsFloat) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def get(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** cosine(a, b) ∈ [-1, 1]; null-safe; 1e-30 floor avoids div-by-zero on
  * zero vectors. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i); val y = get(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb) + 1e-30)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, i)};
         |  double $y = ${getter(b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb) + 1e-30);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"
}

/** dot(a, b). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(a, i) * get(b, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += ${getter(a, i)} * ${getter(b, i)}; }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Random-hyperplane LSH sign bucket: `nBits` signs of dot(v, h_i) packed
  * into one long, with deterministic ±1 pseudo-hyperplanes derived from
  * the xxhash64 kernel — no stored model, reproducible anywhere.
  *
  * All nBits dot products are accumulated in ONE pass over the vector
  * against a precomputed sign table. The round-1 Column spelling built
  * each dot as `aggregate(zip_with(vec, transform(sequence…, xxhash64…)))`
  * — nBits × nTables interpreted-HOF trees per row, the no-CSE
  * anti-pattern measured at 100×+ on [[WordShingles]] (VERDICT.md round 1,
  * "What's wrong" #4). */
case class HyperplaneBucket(child: Expression, dim: Int, nBits: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_bucket requires array<float|double>, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** sign(i, d) table, one xxhash64 per cell, built once per task. */
  @transient private lazy val signs: Array[Double] = {
    val t = new Array[Double](nBits * dim)
    var i = 0
    while (i < nBits) {
      var d = 0
      while (d < dim) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash((i.toLong << 32) | d.toLong, LongType, seed.toLong)
        t(i * dim + d) = if ((h & 1L) == 0L) 1.0 else -1.0
        d += 1
      }
      i += 1
    }
    t
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val isF = elemIsFloat
    val dots = new Array[Double](nBits)
    var d = 0
    while (d < n) {
      val x = if (isF) arr.getFloat(d).toDouble else arr.getDouble(d)
      var i = 0
      while (i < nBits) { dots(i) += x * signs(i * dim + d); i += 1 }
      d += 1
    }
    var bucket = 0L
    var i = 0
    while (i < nBits) { if (dots(i) >= 0) bucket |= (1L << i); i += 1 }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
    copy(child = c)
  override def prettyName: String = "graft_hyperplane_bucket"
}

/** One-pass embedding health stats: struct(dim, n_nonfinite, all_zero,
  * l2_norm) from a single traversal of the vector. The QC checks an
  * embedding column needs at 10^11 vectors (dimension consistency,
  * NaN/Inf poisoning, zero-vector detection, norm profile) would each be
  * a separate interpreted-HOF tree (`exists(vec, isnan)`,
  * `aggregate(vec, …)`, `size`) with no CSE between them — the measured
  * 100×+ anti-pattern (BENCH.md optimization log). Null elements count
  * as non-finite: a vector with holes is as unusable as one with NaNs. */
case class VecStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("dim", IntegerType, nullable = false),
    StructField("n_nonfinite", IntegerType, nullable = false),
    StructField("all_zero", BooleanType, nullable = false),
    StructField("l2_norm", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_stats requires array<float|double>, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isF = elemIsFloat
    var nonfinite = 0; var sumSq = 0.0; var anyNonZero = false; var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nonfinite += 1
      else {
        val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) nonfinite += 1
        else { if (x != 0.0) anyNonZero = true; sumSq += x * x }
      }
      i += 1
    }
    // all_zero: a non-empty, fully-finite vector of exact zeros — a
    // vector with NaN/Inf holes is NONFINITE, not zero (and an empty
    // one is a DIM problem); l2_norm is over the finite components only
    val allZero = n > 0 && nonfinite == 0 && !anyNonZero
    org.apache.spark.sql.catalyst.InternalRow(
      n, nonfinite, allZero, math.sqrt(sumSq))
  }

  override protected def withNewChildInternal(c: Expression): VecStats = copy(child = c)
  override def prettyName: String = "graft_vec_stats"
}

/** Product-quantization encoder (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split the vector into
  * nSub contiguous subspaces and store, per subspace, the index of the
  * L2-nearest codeword — one byte per subspace (codebooks ≤ 256
  * entries), i.e. dim×4 bytes of float32 become nSub bytes. `right` is
  * the codebook tensor as a FOLDABLE nested-array literal
  * (sub → code → subvector), decoded once per executor into flat float
  * arrays. Ties in the argmin break to the LOWEST code index —
  * deterministic, so identical vectors always encode to identical
  * codes (the invariant the planted-recall oracle keys on). Codes are
  * stored offset by -128 so all 256 fit a signed byte. */
case class PqEncode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _), true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r, f) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode requires (array<float|double>, foldable " +
          s"array<array<array<float>>>), got (${l.simpleString}, " +
          s"${r.simpleString}, foldable=$f)")
    }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val cb: Array[Array[Array[Float]]] = {
    val subs = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(subs.numElements()) { s =>
      val codes = subs.getArray(s)
      Array.tabulate(codes.numElements()) { c =>
        codes.getArray(c).toFloatArray()
      }
    }
  }

  override def nullSafeEval(input: Any, unused: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nSub = cb.length
    if (nSub == 0) return null
    val subDim = cb(0)(0).length
    if (arr.numElements() < nSub * subDim) return null
    val isF = elemIsFloat
    val out = new Array[Byte](nSub)
    var s = 0
    while (s < nSub) {
      val base = s * subDim
      val codes = cb(s)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < codes.length) {
        val cw = codes(c); var d = 0.0; var i = 0
        while (i < subDim) {
          val x = if (arr.isNullAt(base + i)) 0.0
            else if (isF) arr.getFloat(base + i).toDouble
            else arr.getDouble(base + i)
          val diff = x - cw(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest
        c += 1
      }
      out(s) = (best - 128).toByte
      s += 1
    }
    out
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
  override def prettyName: String = "graft_pq_encode"
}

/** Asymmetric-distance (ADC) scorer for PQ codes: the query is NOT
  * quantized — the driver precomputes lut(sub)(code) = dot(q_sub,
  * codeword) and the per-row score is nSub table lookups + adds,
  * approximating dot(query, vector) with only quantization error on
  * the DATABASE side (the A in ADC). `right` is the foldable LUT
  * literal. On L2-normalized inputs the score approximates cosine. */
case class PqAdcScore(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (BinaryType, ArrayType(ArrayType(DoubleType, _), _), true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r, f) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc requires (binary, foldable array<array<double>>), " +
          s"got (${l.simpleString}, ${r.simpleString}, foldable=$f)")
    }

  @transient private lazy val lut: Array[Array[Double]] = {
    val subs = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(subs.numElements())(s => subs.getArray(s).toDoubleArray())
  }

  override def nullSafeEval(input: Any, unused: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != lut.length) return null
    var score = 0.0; var s = 0
    while (s < codes.length) {
      val idx = codes(s) + 128
      val t = lut(s)
      if (idx < 0 || idx >= t.length) return null
      score += t(idx); s += 1
    }
    score
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "graft_pq_adc"
}

/** Diagonal-covariance Mahalanobis distance²: Σᵢ (xᵢ−μᵢ)²·wᵢ with
  * w = 1/σᵢ² — the multivariate outlier score over embedding columns
  * (per-dim z-scores summed in quadrature), the statistical companion
  * to [[VecStats]]' structural checks. `right` is a FOLDABLE
  * [μ, w] pair of double arrays (trained on one [[VecMomentsAgg]]
  * pass, broadcast as a literal — no join touches the corpus).
  * Accumulates in dimension order so the result is bit-stable; null /
  * wrong-length vectors → null (dim defects are [[VecStats]]' job).
  * One interpreted loop per row — the measured-faster shape vs HOF
  * chains (BENCH.md optimization log). */
case class DiagMahalanobis(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType, right.foldable) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _), true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r, f) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_diag_mahalanobis requires (array<float|double>, foldable " +
          s"array<array<double>> [mu, weights]), got (${l.simpleString}, " +
          s"${r.simpleString}, foldable=$f)")
    }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val (mu, wt): (Array[Double], Array[Double]) = {
    val p = right.eval(null).asInstanceOf[ArrayData]
    require(p.numElements() == 2,
      "params must be [mu, weights] — exactly two arrays")
    (p.getArray(0).toDoubleArray(), p.getArray(1).toDoubleArray())
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val d = mu.length
    if (v.numElements() != d || wt.length != d) return null
    val isF = elemIsFloat
    var acc = 0.0
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return null
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      val c = x - mu(i)
      acc += c * c * wt(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DiagMahalanobis =
    copy(left = l, right = r)
  override def prettyName: String = "graft_diag_mahalanobis"
}

object VectorExpressions {
  /** Idempotent; Column builders self-register on the active session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("graft_cosine"))) return
    def intArg(es: Seq[Expression], i: Int): Int =
      es(i).eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString.toInt
    reg.registerFunction(FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1)))
    reg.registerFunction(FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1)))
    reg.registerFunction(FunctionIdentifier("graft_hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "graft_hyperplane_bucket"),
      (es: Seq[Expression]) => HyperplaneBucket(
        es.head, intArg(es, 1), intArg(es, 2), intArg(es, 3)))
    reg.registerFunction(FunctionIdentifier("graft_vec_stats"),
      new ExpressionInfo(classOf[VecStats].getName, "graft_vec_stats"),
      (es: Seq[Expression]) => VecStats(es.head))
    reg.registerFunction(FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (es: Seq[Expression]) => PqEncode(es(0), es(1)))
    reg.registerFunction(FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "graft_pq_adc"),
      (es: Seq[Expression]) => PqAdcScore(es(0), es(1)))
    reg.registerFunction(FunctionIdentifier("graft_diag_mahalanobis"),
      new ExpressionInfo(classOf[DiagMahalanobis].getName,
        "graft_diag_mahalanobis"),
      (es: Seq[Expression]) => DiagMahalanobis(es(0), es(1)))
  }

  private def ensure(): Unit =
    try register(SparkSession.active) catch { case _: IllegalStateException => () }

  def cosine(a: Column, b: Column): Column = {
    ensure(); call_function("graft_cosine", a, b)
  }
  def dot(a: Column, b: Column): Column = {
    ensure(); call_function("graft_dot", a, b)
  }
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, seed: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ensure(); call_function("graft_hyperplane_bucket", vec, lit(dim), lit(nBits), lit(seed))
  }
  def vecStats(vec: Column): Column = {
    ensure(); call_function("graft_vec_stats", vec)
  }
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    ensure(); call_function("graft_pq_encode", vec, typedlit(codebooks))
  }
  def pqAdcScore(codes: Column, lut: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    ensure(); call_function("graft_pq_adc", codes, typedlit(lut))
  }
  def diagMahalanobis(vec: Column, mu: Seq[Double],
                      weights: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.typedlit
    ensure()
    call_function("graft_diag_mahalanobis", vec, typedlit(Seq(mu, weights)))
  }
}
