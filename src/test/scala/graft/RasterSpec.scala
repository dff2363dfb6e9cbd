package graft

import graft.functions.Raster
import graft.functions.Raster.{Chip, PChip}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raster kernels R1–R5 (SURVEY.md §2.10): golden values + the
  * properties SURVEY §5 calls out (normalize clamp bounds,
  * monotonicity, px=10000 → 255; mosaic first-wins invariance to
  * input permutation).
  */
class RasterSpec extends AnyFunSuite with SharedSpark {

  // ---- R1 normalize ------------------------------------------------
  test("normalize: golden points") {
    assert(Raster.normalizeS2Scalar(0.0) == 0)
    assert(Raster.normalizeS2Scalar(10000.0) == 255)
    assert(Raster.normalizeS2Scalar(20000.0) == 255) // clamp high
    assert(Raster.normalizeS2Scalar(-5.0) == 0)      // clamp low
    assert(Raster.normalizeS2Scalar(5000.0) == 127)
  }

  test("normalize: monotone and bounded over a sweep") {
    val xs = (-2000 to 22000 by 37).map(_.toDouble)
    val ys = xs.map(Raster.normalizeS2Scalar)
    assert(ys.forall(y => y >= 0 && y <= 255))
    assert(ys.zip(ys.tail).forall { case (a, b) => a <= b })
  }

  test("normalize column form matches scalar form (codegen'd builtin)") {
    import spark.implicits._
    val xs = Seq(-100.0, 0.0, 123.0, 5000.0, 9999.9, 10000.0, 15000.0)
    val df = xs.toDF("x").agg(collect_list(col("x")).as("px"))
      .select(Raster.normalizeS2(col("px")).as("norm"))
    val got = df.head().getSeq[Int](0)
    assert(got == xs.map(Raster.normalizeS2Scalar))
  }

  // ---- R2 band stack ----------------------------------------------
  test("band stack orders bands lexicographically per scene") {
    import spark.implicits._
    val df = Seq(
      ("t1", "B08", Seq(8.0)), ("t1", "B02", Seq(2.0)),
      ("t1", "B04", Seq(4.0)), ("t1", "B03", Seq(3.0)),
      ("t2", "B03", Seq(30.0)), ("t2", "B02", Seq(20.0))
    ).toDF("scene", "band", "px")
    val out = Raster.bandStack(df, Seq("scene"), "band", "px")
      .orderBy("scene").collect()
    assert(out(0).getAs[scala.collection.Seq[String]]("bands")
      == Seq("B02", "B03", "B04", "B08"))
    assert(out(0).getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("px")
      .map(_.toSeq) == Seq(Seq(2.0), Seq(3.0), Seq(4.0), Seq(8.0)))
    assert(out(0).getAs[Int]("num_bands") == 4)
    assert(out(1).getAs[scala.collection.Seq[String]]("bands") == Seq("B02", "B03"))
  }

  // ---- R3 clip ----------------------------------------------------
  private def gridChip(w: Int, h: Int, minx: Double, miny: Double,
      cell: Double): Chip =
    Chip(w, h, minx, miny, minx + w * cell, miny + h * cell, -1.0,
      Array.tabulate(w * h)(i => i.toDouble))

  test("clipByBox crops to the pixel window") {
    // 4x4 grid over [0,4]x[0,4], 1.0 cells; px = row-major index,
    // row 0 = north (y in [3,4)).
    val c = gridChip(4, 4, 0, 0, 1.0)
    val clipped = Raster.clipByBox(c, 1.0, 1.0, 3.0, 3.0)
    assert(clipped.width == 2 && clipped.height == 2)
    assert((clipped.minx, clipped.miny, clipped.maxx, clipped.maxy) == ((1.0, 1.0, 3.0, 3.0)))
    // rows 1..2, cols 1..2 of the 4x4 index grid
    assert(clipped.px.toSeq == Seq(5.0, 6.0, 9.0, 10.0))
  }

  test("clipByBox with box beyond bounds returns the full chip") {
    val c = gridChip(3, 3, 0, 0, 1.0)
    val clipped = Raster.clipByBox(c, -5, -5, 10, 10)
    assert(clipped.width == 3 && clipped.height == 3)
    assert(clipped.px.toSeq == c.px.toSeq)
  }

  test("maskByPolygon crops to envelope and nodatas outside the polygon") {
    // 4x4 grid over [0,4]^2, mask by triangle (0,0)(4,0)(0,4)
    val c = gridChip(4, 4, 0, 0, 1.0).copy(nodata = -1.0)
    val masked = Raster.maskByPolygon(c, "POLYGON ((0 0, 4 0, 0 4, 0 0))")
    assert(masked.width == 4 && masked.height == 4)
    // pixel centers (x+0.5, y+0.5); inside iff x+y < 4 (below hypotenuse)
    val expectInside = for (r <- 0 until 4; cc <- 0 until 4) yield {
      val x = cc + 0.5; val y = 4 - (r + 0.5)
      x + y < 4.0
    }
    val got = masked.px.toSeq.map(_ != -1.0)
    assert(got == expectInside)
  }

  test("CRS transform round-trips and matches known Mercator points") {
    import graft.functions.Geo
    // exact anchors of the spherical Mercator grid
    val (ax, ay) = Geo.Crs.wgs84ToMercator(180.0, 0.0)
    assert(math.abs(ax - 20037508.342789244) < 1e-6 && math.abs(ay) < 1e-3)
    val (mx, my) = Geo.Crs.wgs84ToMercator(1.4442, 43.6047) // Toulouse
    assert(mx > 0 && my > 0 && my > mx) // sanity: NE hemisphere, lat>lon
    val (lon, lat) = Geo.Crs.mercatorToWgs84(mx, my)
    assert(math.abs(lon - 1.4442) < 1e-9 && math.abs(lat - 43.6047) < 1e-9)
    // polygon transform preserves ring shape through round-trip
    val wkt = "POLYGON ((1.2 43.3, 1.5 43.3, 1.5 43.7, 1.2 43.7, 1.2 43.3))"
    val rt = Geo.transformWkt(
      Geo.transformWkt(wkt, Geo.Crs.wgs84ToMercator),
      Geo.Crs.mercatorToWgs84)
    val back = Geo.parseWkt(rt).head
    Geo.parseWkt(wkt).head.zip(back).foreach { case ((ax, ay), (bx, by)) =>
      assert(math.abs(ax - bx) < 1e-9 && math.abs(ay - by) < 1e-9)
    }
  }

  // ---- R4 resample ------------------------------------------------
  test("resampleNearest identity grid returns same pixels") {
    val c = gridChip(4, 4, 0, 0, 1.0)
    val r = Raster.resampleNearest(c, 4, 4, 0, 0, 4, 4)
    assert(r.px.toSeq == c.px.toSeq)
  }

  test("resampleNearest 2x upsample replicates pixels") {
    val c = gridChip(2, 2, 0, 0, 1.0)
    val r = Raster.resampleNearest(c, 4, 4, 0, 0, 2, 2)
    assert(r.px.toSeq == Seq(
      0.0, 0.0, 1.0, 1.0,
      0.0, 0.0, 1.0, 1.0,
      2.0, 2.0, 3.0, 3.0,
      2.0, 2.0, 3.0, 3.0))
  }

  // ---- R5 mosaic --------------------------------------------------
  test("mosaic first-wins: lower priority wins overlaps; nodata loses") {
    val a = Chip(2, 1, 0, 0, 2, 1, 0.0, Array(1.0, 1.0))  // covers x[0,2]
    val b = Chip(2, 1, 1, 0, 3, 1, 0.0, Array(2.0, 2.0))  // covers x[1,3]
    val m = Raster.mosaicFirstWins(Seq(PChip(1, a), PChip(2, b)))
    assert(m.width == 3 && m.height == 1)
    assert(m.px.toSeq == Seq(1.0, 1.0, 2.0)) // overlap cell x[1,2] -> a (prio 1)
  }

  test("mosaic first-wins is invariant to input permutation") {
    val chips = Seq(
      PChip(3, Chip(2, 2, 0, 0, 2, 2, 0.0, Array(3, 3, 3, 3.0))),
      PChip(1, Chip(2, 2, 1, 1, 3, 3, 0.0, Array(1, 1, 1, 1.0))),
      PChip(2, Chip(2, 2, 0, 1, 2, 3, 0.0, Array(2, 2, 2, 2.0))))
    val base = Raster.mosaicFirstWins(chips).px.toSeq
    chips.permutations.foreach { p =>
      assert(Raster.mosaicFirstWins(p).px.toSeq == base)
    }
  }

  test("MosaicAggregator produces the same mosaic through Spark") {
    import spark.implicits._
    val chips = Seq(
      PChip(2, Chip(2, 1, 1, 0, 3, 1, 0.0, Array(2.0, 2.0))),
      PChip(1, Chip(2, 1, 0, 0, 2, 1, 0.0, Array(1.0, 1.0))))
    val ds = spark.createDataset(chips)
    val agg = new Raster.MosaicAggregator(0.0).toColumn
    val out = ds.select(agg).head()
    assert(out.px.toSeq == Seq(1.0, 1.0, 2.0))
  }
}
