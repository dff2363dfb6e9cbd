package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels called from generated code — tight primitive
  * loops over `ArrayData`, no boxing, no per-element lambda dispatch.
  *
  * Why these exist: Spark's higher-order functions (`zip_with`,
  * `aggregate`, `transform`) do NOT participate in whole-stage
  * codegen — each element evaluates through interpreted lambda
  * dispatch with boxed arithmetic. For the similarity-search hot path
  * (millions of candidate pairs × vector dims) that interpreter cost
  * dominates, and in a long-lived session it degrades further as the
  * interpreter's megamorphic call sites defeat the JIT (observed:
  * the same warm pair-join query 1.8 s in a fresh session, 20-40 s
  * late in a 52-query run). A native `Expression` with `doGenCode`
  * keeps the whole operator inside one codegen span.
  *
  * Null elements inside vectors are not supported (embedding arrays
  * are dense by construction); null ARRAYS null out via
  * `nullSafeEval`/`defineCodeGen` as usual.
  */
object VecKernel {
  // Embeddings are fixed-dim by construction: a length mismatch is a
  // wiring bug (mixed models, truncated column), and silently
  // truncating would return a plausible-but-wrong similarity through
  // every oracle-free path (Ivf.assign/search). Fail loudly instead.
  private def checkDims(an: Int, bn: Int): Unit =
    if (an != bn) throw new IllegalArgumentException(
      s"vector dimension mismatch: $an vs $bn")
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
  def normSqL(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L; var i = 0
    while (i < n) { val v = a.getLong(i); s += v * v; i += 1 }
    s
  }
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
  def l2SqD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    s
  }
  /** Element-wise difference a − b (the IVF-PQ RESIDUAL kernel:
    * vector minus its assigned coarse centroid). Native for the same
    * reason as the distances — `zip_with` would interpret per element
    * AND the collapsed projection re-evaluates it per downstream
    * probe; one kernel call materializes the residual once.
    */
  def subD(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements(); checkDims(n, b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Asymmetric-distance computation for product quantization:
    * Σ_j lut(j)(code(j)) — the per-row cost of a PQ scan is m array
    * lookups + m adds, NOT a d-dimensional distance. Out-of-range
    * codes fail loudly (a corrupted code would otherwise read another
    * codeword's distance and silently mis-rank).
    */
  def pqAdc(code: ArrayData, lut: ArrayData): Double = {
    val m = code.numElements(); checkDims(m, lut.numElements())
    var s = 0.0; var j = 0
    while (j < m) {
      val row = lut.getArray(j)
      val c = code.getInt(j)
      if (c < 0 || c >= row.numElements()) throw new IllegalArgumentException(
        s"pq code $c out of range for codebook of ${row.numElements()} " +
          s"codewords (subspace $j)")
      s += row.getDouble(c); j += 1
    }
    s
  }
}

/** vec_dot(array<bigint>, array<bigint>) -> bigint — exact integer dot
  * product (the quantized-embedding similarity kernel).
  */
case class VecDotL(left: Expression, right: Expression)
    extends BinaryExpression {
  // AbstractDataType (ExpectsInputTypes) is private[sql]; validate
  // explicitly instead — callers cast to ARRAY<Long>.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.dotL($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotL =
    copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** vec_norm_sq(array<bigint>) -> bigint — exact squared L2 norm. */
case class VecNormSqL(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    VecKernel.normSqL(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernel.normSqL($a)")
  override protected def withNewChildInternal(c: Expression): VecNormSqL = copy(c)
  override def prettyName: String = "vec_norm_sq"
}

/** vec_dot_d(array<double>, array<double>) -> double — float-vector
  * dot product (cast array<float> inputs to ARRAY<DOUBLE> at the
  * call site).
  */
case class VecDotD(left: Expression, right: Expression)
    extends BinaryExpression {
  // AbstractDataType (ExpectsInputTypes) is private[sql]; validate
  // explicitly instead — callers cast to ARRAY<Double>.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.dotD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotD =
    copy(l, r)
  override def prettyName: String = "vec_dot_d"
}

/** vec_l2_sq(array<double>, array<double>) -> double — squared
  * euclidean distance (the k-means / IVF assignment kernel).
  */
case class VecL2SqD(left: Expression, right: Expression)
    extends BinaryExpression {
  // AbstractDataType (ExpectsInputTypes) is private[sql]; validate
  // explicitly instead — callers cast to ARRAY<Double>.
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> args, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.l2SqD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.l2SqD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2SqD =
    copy(l, r)
  override def prettyName: String = "vec_l2_sq"
}

/** vec_pq_adc(code array<int>, lut array<array<double>>) -> double —
  * PQ asymmetric distance: the code column is the corpus side
  * (m small ints per row), the look-up table is the query side
  * (per-query distances to every codeword, broadcast). Keeps the
  * PQ scan's hot path in one codegen span like its vec_* siblings.
  */
case class VecPqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<INT>, ARRAY<ARRAY<DOUBLE>>) args, " +
          s"got ${left.dataType.sql}, ${right.dataType.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecPqAdc =
    copy(l, r)
  override def prettyName: String = "vec_pq_adc"
}

/** vec_sub(array<double>, array<double>) -> array<double> —
  * element-wise difference (the residual kernel).
  */
case class VecSubD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE>, got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.subD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.subD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSubD =
    copy(l, r)
  override def prettyName: String = "vec_sub"
}

/** Registry for the vec_* family — mirror of [[GeoFunctions]]. */
object VecFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VecDotL].getName, null, name, usage, "", "", "",
      "", "4.0.0", "", "scala_udf")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - integer dot product"),
      (e: Seq[Expression]) => VecDotL(e(0), e(1))),
    ("vec_norm_sq", info("vec_norm_sq", "vec_norm_sq(a) - integer squared L2 norm"),
      (e: Seq[Expression]) => VecNormSqL(e.head)),
    ("vec_dot_d", info("vec_dot_d", "vec_dot_d(a, b) - double dot product"),
      (e: Seq[Expression]) => VecDotD(e(0), e(1))),
    ("vec_l2_sq", info("vec_l2_sq", "vec_l2_sq(a, b) - squared L2 distance"),
      (e: Seq[Expression]) => VecL2SqD(e(0), e(1))),
    ("vec_pq_adc", info("vec_pq_adc",
      "vec_pq_adc(code, lut) - PQ asymmetric distance"),
      (e: Seq[Expression]) => VecPqAdc(e(0), e(1))),
    ("vec_sub", info("vec_sub",
      "vec_sub(a, b) - element-wise difference (residual kernel)"),
      (e: Seq[Expression]) => VecSubD(e(0), e(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
