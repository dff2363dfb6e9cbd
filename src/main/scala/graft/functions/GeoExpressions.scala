package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static, codegen-friendly entry points: generated Java calls these
  * directly, so the st_* expressions participate in whole-stage
  * codegen (no virtual Expression.eval dispatch, no fallback row).
  */
object GeoKernel {
  def area(wkt: UTF8String): Double = Geo.area(wkt.toString)
  def intersectionArea(a: UTF8String, b: UTF8String): Double =
    Geo.intersectionArea(a.toString, b.toString)
  def intersects(a: UTF8String, b: UTF8String): Boolean =
    Geo.intersects(a.toString, b.toString)
  def envelope(wkt: UTF8String): GenericArrayData = {
    val (a, b, c, d) = Geo.envelope(wkt.toString)
    new GenericArrayData(Array(a, b, c, d))
  }
  /** Grid cells "cx:cy" overlapped by the geometry's envelope — ONE
    * WKT parse and a tight loop, vs the interpreted
    * sequence/transform/flatten lambda pipeline it replaces (higher-
    * order functions don't codegen and go megamorphic in long
    * sessions — see [[VecKernel]]).
    */
  def gridCells(wkt: UTF8String, cell: Double): GenericArrayData = {
    val (x1, y1, x2, y2) = Geo.envelope(wkt.toString)
    val cx1 = math.floor(x1 / cell).toInt; val cx2 = math.floor(x2 / cell).toInt
    val cy1 = math.floor(y1 / cell).toInt; val cy2 = math.floor(y2 / cell).toInt
    val out = new Array[Any]((cx2 - cx1 + 1) * (cy2 - cy1 + 1))
    var i = 0; var cx = cx1
    while (cx <= cx2) {
      var cy = cy1
      while (cy <= cy2) {
        out(i) = UTF8String.fromString(s"$cx:$cy"); i += 1; cy += 1
      }
      cx += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst `Expression`s for the geometry family (SURVEY.md §2.9 F9,
  * §2.2 P6, §2.4 J1): `st_area`, `st_envelope`, `st_intersects`,
  * `st_intersection_area` over WKT strings.
  *
  * Genuine engine extensions (Spark has no geo built-ins); all four
  * implement `doGenCode` as a static call into [[GeoKernel]], so a
  * plan using them keeps its whole-stage-codegen span. The
  * raster normalize kernel (R1), per-pixel hot, is expressed with
  * codegen'd built-ins instead — see [[Raster.normalizeS2]].
  */
case class StArea(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(wkt: Any): Any =
    GeoKernel.area(wkt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoKernel.area($c)")
  override protected def withNewChildInternal(c: Expression): StArea = copy(c)
  override def prettyName: String = "st_area"
}

/** Envelope as array(minx, miny, maxx, maxy) — the reference's
  * `.bounds` (`code/dataset.py:38-40`).
  */
case class StEnvelope(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(wkt: Any): Any =
    GeoKernel.envelope(wkt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoKernel.envelope($c)")
  override protected def withNewChildInternal(c: Expression): StEnvelope = copy(c)
  override def prettyName: String = "st_envelope"
}

case class StIntersects(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoKernel.intersects(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GeoKernel.intersects($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersects =
    copy(l, r)
  override def prettyName: String = "st_intersects"
}

/** Area of left ∩ right (right must be convex — the AOI bbox). The
  * scoring kernel of the reference's overlay+groupby-sum
  * (`code/imagery_store.py:249-252`).
  */
case class StIntersectionArea(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GeoKernel.intersectionArea(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GeoKernel.intersectionArea($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersectionArea =
    copy(l, r)
  override def prettyName: String = "st_intersection_area"
}

/** Envelope grid-cell assignment for the bucketed spatial join
  * (`st_grid_cells(wkt, cell_size)` → array of "cx:cy") — the cell
  * explode key of [[graft.operators.SpatialJoin]].
  */
case class StGridCells(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(wkt: Any, cell: Any): Any =
    GeoKernel.gridCells(wkt.asInstanceOf[UTF8String],
      cell.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GeoKernel.gridCells($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StGridCells =
    copy(l, r)
  override def prettyName: String = "st_grid_cells"
}

/** Registration of the st_* family into a session's FunctionRegistry,
  * so they are usable from `expr("st_area(wkt)")` / `spark.sql`.
  * Callable directly or via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GeoFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[StArea].getName, null, name, usage, "", "", "",
      "", "4.0.0", "", "scala_udf")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("st_area", info("st_area", "st_area(wkt) - planar area"),
      (e: Seq[Expression]) => StArea(e.head)),
    ("st_envelope", info("st_envelope", "st_envelope(wkt) - [minx,miny,maxx,maxy]"),
      (e: Seq[Expression]) => StEnvelope(e.head)),
    ("st_intersects", info("st_intersects", "st_intersects(a, b)"),
      (e: Seq[Expression]) => StIntersects(e(0), e(1))),
    ("st_intersection_area",
      info("st_intersection_area", "st_intersection_area(a, convex_b)"),
      (e: Seq[Expression]) => StIntersectionArea(e(0), e(1))),
    ("st_grid_cells",
      info("st_grid_cells", "st_grid_cells(wkt, cell_size) - envelope grid cells"),
      (e: Seq[Expression]) => StGridCells(e(0), e(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
