package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Perceptual image fingerprinting for MULTIMODAL dedup — the
  * difference hash (dHash): reduce a grayscale image to a 9×8 grid
  * of block sums and emit one bit per horizontally-adjacent
  * comparison (sum(r,c) > sum(r,c+1)), 8 rows × 8 comparisons =
  * 64 bits. Near-identical images (re-encodes, uniform
  * brightness/contrast shifts, small noise) keep their bit pattern
  * because only the ORDERING of neighboring block sums matters —
  * dHash is exactly invariant under any monotone per-pixel
  * transform applied uniformly (the q180 oracle exploits the
  * brightness-shift case analytically).
  *
  * All-integer: block sums of byte pixels, strict `>` comparisons —
  * no resampling arithmetic, so the hash is engine- and
  * platform-exact. The 64 bits return as ARRAY<BIGINT>[2]
  * (rows 0-3 in [0], rows 4-7 in [1], bit (r%4)*8+c weighted
  * 2^((r%4)*8+c)) — two non-negative longs, avoiding the signed
  * 2^63 overflow a single 64-bit key would hit in ANSI engines.
  *
  * Geometry contract (refused loudly otherwise): width divisible by
  * 9 and height divisible by 8, so block sums are exact integer
  * rectangles (no fractional resampling — the caller picks the
  * decode/thumbnail size; 18×8, 36×16, 144×64 all conform).
  */
object ImgKernel {

  def dhash(bytes: Array[Byte], w: Int, h: Int): ArrayData = {
    require(w > 0 && h > 0 && bytes.length == w * h,
      s"img_dhash: ${bytes.length} bytes is not a ${w}x$h grayscale plane")
    require(w % 9 == 0 && h % 8 == 0,
      s"img_dhash: ${w}x$h does not block-align to the 9x8 grid " +
        "(width % 9 == 0 and height % 8 == 0 required — fractional " +
        "resampling would break integer exactness)")
    val bw = w / 9
    val bh = h / 8
    val sums = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val br = y / bh
      var x = 0
      while (x < w) {
        sums(br)(x / bw) += bytes(y * w + x) & 0xff
        x += 1
      }
      y += 1
    }
    val out = new Array[Long](2)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r)(c) > sums(r)(c + 1))
          out(r / 4) |= 1L << ((r % 4) * 8 + c)
        c += 1
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  def boxdown(px: Array[Byte], w: Int, h: Int, f: Int): Array[Byte] = {
    require(f > 0 && w > 0 && h > 0 && px.length == w * h,
      s"img_boxdown: ${px.length} bytes is not a ${w}x$h plane")
    require(w % f == 0 && h % f == 0,
      s"img_boxdown: ${w}x$h does not tile by factor $f — fractional " +
        "boxes would break integer exactness")
    val (ow, oh) = (w / f, h / f)
    val sums = new Array[Long](ow * oh)
    var y = 0
    while (y < h) {
      val oy = y / f
      var x = 0
      while (x < w) {
        sums(oy * ow + x / f) += px(y * w + x) & 0xff
        x += 1
      }
      y += 1
    }
    val area = f.toLong * f
    val out = new Array[Byte](ow * oh)
    var i = 0
    while (i < out.length) {
      out(i) = (sums(i) / area).toByte // floor mean — exact
      i += 1
    }
    out
  }

  def luma(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"img_luma: ${rgb.length} bytes is not a ${w}x$h RGB raster")
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      out(i) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
      i += 1
    }
    out
  }
}

/** img_dhash(bytes BINARY, w INT, h INT) -> ARRAY<BIGINT>[2]. */
case class ImgDhash(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT, INT), got $other")
    }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullSafeEval(b: Any, w: Any, h: Any): Any =
    ImgKernel.dhash(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w, h) =>
      s"graft.functions.ImgKernel.dhash($b, $w, $h)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): ImgDhash = copy(a, b, c)
  override def prettyName: String = "img_dhash"
}

/** img_luma(rgb BINARY, w INT, h INT) -> BINARY — integer BT.601
  * luma of an interleaved 8-bit RGB raster: y = (77·R + 150·G +
  * 29·B) >> 8 (the 8-bit fixed-point weights summing to 256, so the
  * result is exact integer arithmetic — engine- and platform-stable,
  * where the float 0.299/0.587/0.114 form would hand last-bit
  * rounding to the libm in play). The grayscale-conversion step
  * every perceptual-hash pipeline runs between "decoded color
  * raster" and img_dhash.
  */
case class ImgLuma(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT, INT), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(b: Any, w: Any, h: Any): Any =
    ImgKernel.luma(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w, h) =>
      s"graft.functions.ImgKernel.luma($b, $w, $h)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): ImgLuma = copy(a, b, c)
  override def prettyName: String = "img_luma"
}

/** img_boxdown(px BINARY, w INT, h INT, f INT) -> BINARY — integer
  * box-filter downsample by factor f: each output sample is the
  * FLOOR MEAN of its f×f source tile (exact integer division — no
  * float resampling, so thumbnails are engine- and platform-stable,
  * and a uniform +k brightness shift on the source moves every
  * output sample by exactly k). The thumbnail step a perceptual-hash
  * pipeline runs between full-resolution decode and fingerprinting.
  */
case class ImgBoxdown(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT, INT, INT), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(b: Any, w: Any, h: Any, f: Any): Any =
    ImgKernel.boxdown(b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], f.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w, h, f) =>
      s"graft.functions.ImgKernel.boxdown($b, $w, $h, $f)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): ImgBoxdown = copy(a, b, c, d)
  override def prettyName: String = "img_boxdown"
}

object ImgFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("img_boxdown",
      new ExpressionInfo(classOf[ImgBoxdown].getName, null, "img_boxdown",
        "img_boxdown(px, w, h, f) - integer box-filter downsample by " +
          "factor f (floor mean per f x f tile); w % f == 0, " +
          "h % f == 0", "", "", "", "", "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(b, w, h, f) => ImgBoxdown(b, w, h, f)
        case other => throw new IllegalArgumentException(
          s"img_boxdown takes 4 arguments, got ${other.size}")
      }),
    ("img_luma",
      new ExpressionInfo(classOf[ImgLuma].getName, null, "img_luma",
        "img_luma(rgb, w, h) - integer BT.601 luma plane " +
          "((77R + 150G + 29B) >> 8) of an interleaved 8-bit RGB " +
          "raster", "", "", "", "", "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(b, w, h) => ImgLuma(b, w, h)
        case other => throw new IllegalArgumentException(
          s"img_luma takes 3 arguments, got ${other.size}")
      }),
    ("img_dhash",
      new ExpressionInfo(classOf[ImgDhash].getName, null, "img_dhash",
        "img_dhash(bytes, w, h) - 64-bit perceptual difference hash " +
          "of a grayscale plane as ARRAY<BIGINT>[2]; w % 9 == 0, " +
          "h % 8 == 0", "", "", "", "", "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(b, w, h) => ImgDhash(b, w, h)
        case other => throw new IllegalArgumentException(
          s"img_dhash takes 3 arguments, got ${other.size}")
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
