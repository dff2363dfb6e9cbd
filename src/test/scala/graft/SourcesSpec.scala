package graft

import graft.sources.VectorSources
import graft.operators.Manifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Vector readers S1/S2 (+P10 dispatch) and XML manifest parsing S4
  * over inline fixtures shaped like the reference's shipped data
  * (`/root/reference/data/toulouse_bbox_wgs84.geojson`, MTD_MSIL2A).
  */
class SourcesSpec extends AnyFunSuite with SharedSpark {

  private def tmpFile(suffix: String, content: String): String = {
    val p = Files.createTempFile("graft-test", suffix)
    Files.writeString(p, content)
    p.toFile.deleteOnExit()
    p.toString
  }

  // the reference AOI, verbatim shape (fid property + bbox polygon)
  private val geojson =
    """{"type":"FeatureCollection",
      |"features":[{"type":"Feature","properties":{"fid":1},
      | "geometry":{"type":"Polygon","coordinates":[[
      |  [1.2047,43.3882],[1.5121,43.3882],[1.5121,43.662],[1.2047,43.662],[1.2047,43.3882]]]}}]}
      |""".stripMargin

  test("S1: GeoJSON FeatureCollection → properties + WKT geometry") {
    val df = VectorSources.readGeoJson(spark, tmpFile(".geojson", geojson))
    val row = df.head()
    assert(row.getAs[Long]("fid") == 1L)
    val wkt = row.getAs[String]("geometry")
    assert(wkt.startsWith("POLYGON ((1.2047 43.3882, 1.5121 43.3882"))
    // round-trips through the geometry kernel with the right area
    val area = graft.functions.Geo.area(wkt)
    assert(math.abs(area - (1.5121 - 1.2047) * (43.662 - 43.3882)) < 1e-9)
  }

  test("S1: Polygon with an interior ring keeps the hole in the WKT") {
    val holed =
      """{"type":"FeatureCollection",
        |"features":[{"type":"Feature","properties":{"fid":7},
        | "geometry":{"type":"Polygon","coordinates":[
        |  [[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]],
        |  [[1.0,1.0],[2.0,1.0],[2.0,2.0],[1.0,2.0],[1.0,1.0]]]}}]}
        |""".stripMargin
    val df = VectorSources.readGeoJson(spark, tmpFile(".geojson", holed))
    val wkt = df.head().getAs[String]("geometry")
    assert(wkt.startsWith("POLYGON ((0.0 0.0,"))
    assert(wkt.contains("), (1.0 1.0,")) // interior ring present
    // hole subtracts: 16 - 1
    assert(math.abs(graft.functions.Geo.area(wkt) - 15.0) < 1e-12)
  }

  test("S1: MultiPolygon FeatureCollection reads and sums areas") {
    val multi =
      """{"type":"FeatureCollection",
        |"features":[{"type":"Feature","properties":{"fid":9},
        | "geometry":{"type":"MultiPolygon","coordinates":[
        |  [[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]],
        |  [[[2.0,0.0],[4.0,0.0],[4.0,1.0],[2.0,1.0],[2.0,0.0]]]]}}]}
        |""".stripMargin
    val df = VectorSources.readGeoJson(spark, tmpFile(".geojson", multi))
    val wkt = df.head().getAs[String]("geometry")
    assert(wkt.startsWith("MULTIPOLYGON (((0.0 0.0,"))
    assert(math.abs(graft.functions.Geo.area(wkt) - 3.0) < 1e-12)
    // envelope spans both parts
    assert(graft.functions.Geo.envelope(wkt) == ((0.0, 0.0, 4.0, 1.0)))
  }

  test("S1: non-polygon GeoJSON fails loudly") {
    val pts =
      """{"type":"FeatureCollection",
        |"features":[{"type":"Feature","properties":{"fid":1},
        | "geometry":{"type":"Point","coordinates":[1.0,2.0]}}]}
        |""".stripMargin
    val e = intercept[IllegalArgumentException] {
      VectorSources.readGeoJson(spark, tmpFile(".geojson", pts))
    }
    assert(e.getMessage.contains("unsupported GeoJSON geometry nesting"))
  }

  test("S2 + P10: CSV tile grid via suffix dispatch") {
    val csv = "tile_id,geometry\n31TCJ,\"POLYGON ((1 43, 2 43, 2 44, 1 44, 1 43))\"\n"
    val df = VectorSources.readVector(spark, tmpFile(".csv", csv))
    val row = df.head()
    assert(row.getAs[String]("tile_id") == "31TCJ")
    assert(graft.functions.Geo.area(row.getAs[String]("geometry")) == 1.0)
  }

  // ---- S1: Shapefile (binary fixture built to the published spec) --

  private def shpFixture(): (String, String) = {
    import java.nio.{ByteBuffer, ByteOrder}
    // record 1: CW shell (0,0)->(0,4)->(4,4)->(4,0) + CCW hole
    val shell = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
    val hole = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    // record 2: CW unit square at x=10
    val sq = Seq((10.0, 0.0), (10.0, 1.0), (11.0, 1.0), (11.0, 0.0), (10.0, 0.0))
    def content(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
      val nPts = rings.map(_.size).sum
      val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.size + 16 * nPts)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(5).putDouble(0).putDouble(0).putDouble(0).putDouble(0)
      b.putInt(rings.size).putInt(nPts)
      rings.scanLeft(0)(_ + _.size).dropRight(1).foreach(b.putInt)
      rings.flatten.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    val recs = Seq(content(Seq(shell, hole)), content(Seq(sq)))
    val fileLen = 100 + recs.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(fileLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994).putInt(24, fileLen / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000).putInt(32, 5)
    shp.position(100)
    recs.zipWithIndex.foreach { case (c, i) =>
      shp.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(c.length / 2)
      shp.put(c)
    }
    // dbf: NAME C(8) + RANK N(4), 2 records
    val dbf = ByteBuffer.allocate(97 + 2 * 13).order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 3.toByte).putInt(4, 2).putShort(8, 97.toShort).putShort(10, 13.toShort)
    def field(off: Int, name: String, t: Char, len: Int): Unit = {
      name.getBytes("US-ASCII").zipWithIndex.foreach { case (ch, i) =>
        dbf.put(off + i, ch) }
      dbf.put(off + 11, t.toByte); dbf.put(off + 16, len.toByte)
    }
    field(32, "NAME", 'C', 8); field(64, "RANK", 'N', 4)
    dbf.put(96, 0x0d.toByte)
    dbf.position(97)
    Seq(("alpha   ", "   1"), ("beta    ", "  22")).foreach { case (n, r) =>
      dbf.put(' '.toByte).put(n.getBytes("US-ASCII")).put(r.getBytes("US-ASCII"))
    }
    val base = Files.createTempFile("graft-test", ".shp")
    Files.write(base, shp.array())
    val dbfPath = java.nio.file.Paths.get(base.toString.replaceAll("\\.shp$", ".dbf"))
    Files.write(dbfPath, dbf.array())
    base.toFile.deleteOnExit(); dbfPath.toFile.deleteOnExit()
    (base.toString, dbfPath.toString)
  }

  test("S1: Shapefile + DBF read via suffix dispatch, holes intact") {
    val (shpPath, _) = shpFixture()
    val df = VectorSources.readVector(spark, shpPath)
    val rows = df.orderBy("RANK").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("NAME") == "alpha")
    assert(rows(0).getAs[Long]("RANK") == 1L)
    val holed = rows(0).getAs[String]("geometry")
    assert(holed.startsWith("POLYGON ((0.0 0.0,"))
    assert(math.abs(graft.functions.Geo.area(holed) - 15.0) < 1e-12) // 16 - 1
    assert(rows(1).getAs[String]("NAME") == "beta")
    assert(graft.functions.Geo.area(rows(1).getAs[String]("geometry")) == 1.0)
  }

  // ---- S1: GeoPackage (SQLite fixture in test resources) ----------

  test("S1: GeoPackage layer reads attributes + WKT, holes and overflow intact") {
    val path = getClass.getResource("/aoi_fixture.gpkg").getPath
    val df = graft.sources.GeoPackage.read(spark, path)
    val rows = df.orderBy("fid").collect()
    assert(rows.length == 3)
    assert(df.columns.toSeq == Seq("fid", "name", "rank", "note", "geometry"))
    // row 1: polygon with a hole (area 16 - 1)
    assert(rows(0).getAs[Long]("fid") == 1L)
    assert(rows(0).getAs[String]("name") == "toulouse")
    val holed = rows(0).getAs[String]("geometry")
    assert(holed.startsWith("POLYGON ((0.0 0.0,"))
    assert(math.abs(graft.functions.Geo.area(holed) - 15.0) < 1e-12)
    // row 2 carries a 6000-char note — crosses a page: overflow chain
    assert(rows(1).getAs[String]("note").length == 6000)
    assert(rows(1).getAs[String]("note").forall(_ == 'x'))
    assert(graft.functions.Geo.area(rows(1).getAs[String]("geometry")) == 1.0)
    // row 3: MultiPolygon, summed area
    val multi = rows(2).getAs[String]("geometry")
    assert(multi.startsWith("MULTIPOLYGON ((("))
    assert(math.abs(graft.functions.Geo.area(multi) - 3.0) < 1e-12)
  }

  test("S1: GeoPackage REAL column types from declared affinity, not storage") {
    // SQLite stores REAL values with no fractional part as INTEGER on
    // disk; the reader must type from the CREATE TABLE declaration.
    val path = getClass.getResource("/aoi_real_fixture.gpkg").getPath
    val df = graft.sources.GeoPackage.read(spark, path)
    assert(df.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    // NUMERIC column with mixed integer/real storage widens to Double
    assert(df.schema("yield").dataType == org.apache.spark.sql.types.DoubleType)
    val rows = df.orderBy("fid").collect()
    assert(rows(0).getAs[Double]("score") == 2.0) // integer-stored on disk
    assert(rows(1).getAs[Double]("score") == 2.5)
    assert(rows(0).getAs[Double]("yield") == 7.0)
    assert(rows(1).getAs[Double]("yield") == 7.25)
    assert(rows(2).isNullAt(rows(2).fieldIndex("score")))
  }

  test("S1: non-SQLite bytes fail loudly as GeoPackage") {
    val bogus = tmpFile(".gpkg", "definitely not sqlite")
    val e = intercept[IllegalArgumentException] {
      graft.sources.GeoPackage.read(spark, bogus)
    }
    assert(e.getMessage.contains("not a SQLite database"))
  }

  private val manifestXml =
    """<Level-2A_User_Product>
      |  <Product_Organisation>
      |    <IMAGE_FILE>GRANULE/L2A_T31TCJ/IMG_DATA/R10m/T31TCJ_20230615T104621_B02_10m</IMAGE_FILE>
      |    <IMAGE_FILE>GRANULE/L2A_T31TCJ/IMG_DATA/R10m/T31TCJ_20230615T104621_B03_10m</IMAGE_FILE>
      |    <IMAGE_FILE>GRANULE/L2A_T31TCJ/IMG_DATA/R20m/T31TCJ_20230615T104621_B02_20m</IMAGE_FILE>
      |    <IMAGE_FILE>GRANULE/L2A_T31TCJ/IMG_DATA/R10m/T31TCJ_20230615T104621_TCI_10m</IMAGE_FILE>
      |  </Product_Organisation>
      |  <Quality_Indicators_Info>
      |    <Cloud_Coverage_Assessment>2.53</Cloud_Coverage_Assessment>
      |  </Quality_Indicators_Info>
      |  <SENSING_ORBIT_DIRECTION>DESCENDING</SENSING_ORBIT_DIRECTION>
      |  <Special_Values>
      |    <SPECIAL_VALUE_TEXT>NODATA</SPECIAL_VALUE_TEXT>
      |    <SPECIAL_VALUE_INDEX>0</SPECIAL_VALUE_INDEX>
      |  </Special_Values>
      |  <Special_Values>
      |    <SPECIAL_VALUE_TEXT>SATURATED</SPECIAL_VALUE_TEXT>
      |    <SPECIAL_VALUE_INDEX>65535</SPECIAL_VALUE_INDEX>
      |  </Special_Values>
      |</Level-2A_User_Product>""".stripMargin

  test("S4/J3/P8: manifest band files cross-matched at 10m") {
    import spark.implicits._
    val df = Seq(manifestXml).toDF("manifest_xml")
    val files = Manifest.bandFiles(df, Seq("B02", "B03", "B04"), 10)
      .select("band", "jp2_path").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    // B02@10m and B03@10m match; B02@20m and TCI do not; B04 absent
    assert(files.map(_._1) == Seq("B02", "B03"))
    assert(files.head._2.endsWith("B02_10m.jp2"))
  }

  test("S4/A3: scalar metadata extraction incl. predicated nodata") {
    import spark.implicits._
    val df = Seq(manifestXml).toDF("manifest_xml")
    val row = Manifest.metadata(df)
      .select("cloudcoverage", "orbitdirection", "nodata").head()
    assert(row.getDouble(0) == 2.53)
    assert(row.getString(1) == "DESCENDING")
    assert(row.getInt(2) == 0)
  }
}
