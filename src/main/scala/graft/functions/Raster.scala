package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Raster chip model + compute kernels (SURVEY.md §2.10 R1–R5),
  * re-expressed for Spark's execution model. A band raster is a row:
  * a dense row-major pixel array plus its georeferencing struct —
  * exactly the `(array, transform, crs, nodata)` bundle rasterio
  * carries (`/root/reference/code/tx.py:26-34`), flattened into
  * columns so it shuffles/spills like any other row.
  *
  * Kernel placement: R1 (per-pixel normalize) is the only kernel that
  * is hot at 100 TB (it touches every pixel of every chip) — it is
  * expressed with built-in `transform` lambdas so it stays inside
  * whole-stage codegen. R2/R5 are per-chip-group aggregations (a few
  * thousand groups per tile-date), expressed as a typed `Aggregator`
  * with explicit sort keys so results are deterministic under Spark's
  * unordered shuffle (SURVEY §7.3 hard part c).
  */
object Raster {

  /** A single-band georeferenced chip. Bounds are (minx, miny, maxx,
    * maxy) in CRS units; px is row-major, row 0 = north edge.
    */
  case class Chip(
      width: Int, height: Int,
      minx: Double, miny: Double, maxx: Double, maxy: Double,
      nodata: Double,
      px: Array[Double])

  // -----------------------------------------------------------------
  // R1 — radiometric normalize: uint8(clip(px/10000, 0, 1) * 255)
  // (`/root/reference/code/tx.py:20-23`). Built-in lambda → codegen.
  def normalizeS2(px: Column): Column =
    transform(px, x =>
      (least(greatest(x / lit(10000.0), lit(0.0)), lit(1.0)) * 255.0)
        .cast("int"))

  /** Scalar form for tests / per-pixel use. */
  def normalizeS2Scalar(x: Double): Int =
    (math.min(math.max(x / 10000.0, 0.0), 1.0) * 255.0).toInt

  // -----------------------------------------------------------------
  // R2 — band stack: N single-band rows → one N-band row, band order
  // = lexicographic band name (the reference's sorted-filename order,
  // `code/imagery_store.py:67-68` + `code/tx.py:37-47`). groupBy +
  // collect_list + array_sort: partial aggregation map-side, one
  // shuffle on the (scene) key.
  def bandStack(df: DataFrame, sceneKey: Seq[String], bandCol: String,
      pxCol: String): DataFrame =
    df.groupBy(sceneKey.map(col): _*)
      .agg(array_sort(collect_list(struct(col(bandCol).as("band"),
        col(pxCol).as("px")))).as("stack"))
      .withColumn("bands", expr("transform(stack, s -> s.band)"))
      .withColumn("px", expr("transform(stack, s -> s.px)"))
      .withColumn("num_bands", size(col("bands")))
      .drop("stack")

  // -----------------------------------------------------------------
  // R3 — clip by box: crop the chip to the pixel window intersecting
  // an axis-aligned box (`rasterio.mask(crop=True)` for the
  // reference's bbox AOIs, `code/tx.py:25-35`).
  def clipByBox(c: Chip, bminx: Double, bminy: Double, bmaxx: Double,
      bmaxy: Double): Chip = {
    val pw = (c.maxx - c.minx) / c.width   // pixel width
    val ph = (c.maxy - c.miny) / c.height  // pixel height
    val col0 = math.max(0, math.floor((bminx - c.minx) / pw).toInt)
    val col1 = math.min(c.width, math.ceil((bmaxx - c.minx) / pw).toInt)
    val row0 = math.max(0, math.floor((c.maxy - bmaxy) / ph).toInt)
    val row1 = math.min(c.height, math.ceil((c.maxy - bminy) / ph).toInt)
    val w = math.max(0, col1 - col0); val h = math.max(0, row1 - row0)
    val out = new Array[Double](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(c.px, (row0 + r) * c.width + col0, out, r * w, w)
      r += 1
    }
    Chip(w, h,
      c.minx + col0 * pw, c.maxy - row1 * ph,
      c.minx + col1 * pw, c.maxy - row0 * ph,
      c.nodata, out)
  }

  // -----------------------------------------------------------------
  // R3b — mask by polygon: crop to the polygon's envelope, then set
  // pixels whose centers fall outside the polygon to nodata — the
  // full `rasterio.mask(src, geometry, crop=True)` semantics
  // (`code/tx.py:25-35`) for non-rectangular AOIs; clipByBox is the
  // bbox fast path the reference's own AOIs exercise.
  def maskByPolygon(c: Chip, polygonWkt: String): Chip = {
    val rings = Geo.parseWkt(polygonWkt)
    val (bx1, by1, bx2, by2) = Geo.envelope(polygonWkt)
    val cropped = clipByBox(c, bx1, by1, bx2, by2)
    val pw = (cropped.maxx - cropped.minx) / math.max(cropped.width, 1)
    val ph = (cropped.maxy - cropped.miny) / math.max(cropped.height, 1)
    val out = cropped.px.clone()
    var r = 0
    while (r < cropped.height) {
      val y = cropped.maxy - (r + 0.5) * ph
      var cc = 0
      while (cc < cropped.width) {
        val x = cropped.minx + (cc + 0.5) * pw
        if (!Geo.containsPoint(rings, x, y)) out(r * cropped.width + cc) = c.nodata
        cc += 1
      }
      r += 1
    }
    cropped.copy(px = out)
  }

  // -----------------------------------------------------------------
  // R4 — reproject/resample to a target grid, nearest neighbor
  // (`Resampling.nearest`, `code/tx.py:49-71`). The affine transform
  // here is the linear part; a true CRS warp plugs a point-transform
  // function into `invMap`.
  def resampleNearest(c: Chip, outW: Int, outH: Int,
      ominx: Double, ominy: Double, omaxx: Double, omaxy: Double): Chip = {
    val out = Array.fill(outW * outH)(c.nodata)
    val opw = (omaxx - ominx) / outW
    val oph = (omaxy - ominy) / outH
    val ipw = (c.maxx - c.minx) / c.width
    val iph = (c.maxy - c.miny) / c.height
    var r = 0
    while (r < outH) {
      val y = omaxy - (r + 0.5) * oph
      val ir = math.floor((c.maxy - y) / iph).toInt
      if (ir >= 0 && ir < c.height) {
        var cc = 0
        while (cc < outW) {
          val x = ominx + (cc + 0.5) * opw
          val ic = math.floor((x - c.minx) / ipw).toInt
          if (ic >= 0 && ic < c.width) out(r * outW + cc) = c.px(ir * c.width + ic)
          cc += 1
        }
      }
      r += 1
    }
    Chip(outW, outH, ominx, ominy, omaxx, omaxy, c.nodata, out)
  }

  // -----------------------------------------------------------------
  // R5 — mosaic, first-wins (`rasterio.merge`, `method='first'`,
  // `code/tx.py:73-90`): chips merge onto the union grid; where chips
  // overlap, the chip with the SMALLEST priority key wins. Order-
  // sensitivity under unordered shuffle is resolved by carrying an
  // explicit priority and reducing with commutative min-by-priority
  // per pixel — merge order no longer matters, which is exactly what
  // a distributed first-wins needs.
  case class PChip(priority: Long, chip: Chip)

  /** Merge two same-grid mosaics: per pixel keep the value whose
    * source priority is smaller (nodata always loses).
    */
  private def mergeOnto(acc: Chip, accPrio: Array[Long], p: PChip): Unit = {
    val c = p.chip
    val pw = (acc.maxx - acc.minx) / acc.width
    val ph = (acc.maxy - acc.miny) / acc.height
    var r = 0
    while (r < c.height) {
      val y = c.maxy - (r + 0.5) * (c.maxy - c.miny) / c.height
      val ar = math.floor((acc.maxy - y) / ph).toInt
      if (ar >= 0 && ar < acc.height) {
        var cc = 0
        while (cc < c.width) {
          val v = c.px(r * c.width + cc)
          if (v != c.nodata) {
            val x = c.minx + (cc + 0.5) * (c.maxx - c.minx) / c.width
            val ac = math.floor((x - acc.minx) / pw).toInt
            if (ac >= 0 && ac < acc.width) {
              val idx = ar * acc.width + ac
              if (acc.px(idx) == acc.nodata || p.priority < accPrio(idx)) {
                acc.px(idx) = v
                accPrio(idx) = p.priority
              }
            }
          }
          cc += 1
        }
      }
      r += 1
    }
  }

  /** Mosaic a set of same-resolution chips onto their union grid. */
  def mosaicFirstWins(chips: Seq[PChip], nodata: Double = 0.0): Chip = {
    require(chips.nonEmpty, "empty mosaic")
    val c0 = chips.head.chip
    val pw = (c0.maxx - c0.minx) / c0.width
    val ph = (c0.maxy - c0.miny) / c0.height
    val minx = chips.map(_.chip.minx).min; val maxx = chips.map(_.chip.maxx).max
    val miny = chips.map(_.chip.miny).min; val maxy = chips.map(_.chip.maxy).max
    val w = math.round((maxx - minx) / pw).toInt
    val h = math.round((maxy - miny) / ph).toInt
    val acc = Chip(w, h, minx, miny, maxx, maxy, nodata,
      Array.fill(w * h)(nodata))
    val prio = Array.fill(w * h)(Long.MaxValue)
    chips.foreach(p => mergeOnto(acc, prio, p))
    acc
  }

  /** Typed Aggregator wrapper: distributed first-wins mosaic — reduce
    * and merge both delegate to the commutative priority merge, so the
    * result is invariant to Spark's partitioning/merge order.
    */
  case class PChipList(items: Seq[PChip])

  class MosaicAggregator(nodata: Double)
      extends Aggregator[PChip, PChipList, Chip] {
    override def zero: PChipList = PChipList(Nil)
    override def reduce(b: PChipList, a: PChip): PChipList =
      PChipList(b.items :+ a)
    override def merge(b1: PChipList, b2: PChipList): PChipList =
      PChipList(b1.items ++ b2.items)
    override def finish(r: PChipList): Chip =
      mosaicFirstWins(r.items.sortBy(_.priority), nodata)
    override def bufferEncoder: Encoder[PChipList] = Encoders.product[PChipList]
    override def outputEncoder: Encoder[Chip] = Encoders.product[Chip]
  }
}
