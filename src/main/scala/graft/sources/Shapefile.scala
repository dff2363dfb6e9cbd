package graft.sources

import graft.functions.Geo
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal ESRI Shapefile reader, pure Scala (zero-egress build):
  * polygon/multipolygon main files (shape type 5) plus the sibling
  * `.dbf` attribute table — closing the `gpd.read_file` surface for
  * the formats the reference's AOI loader accepts
  * (`/root/reference/code/download_imagery.py:14-27`).
  *
  * The published format: a 100-byte big/little-endian mixed header,
  * then records of [BE record header][LE shape content]; polygon
  * content = bbox + part offsets + points, rings clockwise for
  * shells and counter-clockwise for holes. The `.dbf` sidecar is
  * classic dBASE III: 32-byte field descriptors + fixed-width ASCII
  * records.
  *
  * Vector files are AOI-sized (the reference reads ONE file per run
  * driver-side through geopandas); parsing happens on the driver and
  * the result is a regular DataFrame, so everything downstream —
  * the spatial joins, st_* predicates — is distributed as usual.
  */
object Shapefile {

  /** One .shp polygon record as WKT (POLYGON or MULTIPOLYGON). */
  private def recordToWkt(content: ByteBuffer): Option[String] = {
    val shapeType = content.getInt()
    if (shapeType == 0) return None // null shape
    require(shapeType == 5, s"only polygon shapefiles supported, got type $shapeType")
    content.position(content.position() + 32) // skip bbox
    val numParts = content.getInt()
    val numPoints = content.getInt()
    val parts = Array.fill(numParts)(content.getInt())
    val pts = Array.fill(numPoints)((content.getDouble(), content.getDouble()))
    val rings: Seq[Geo.Ring] = (0 until numParts).map { i =>
      val end = if (i + 1 < numParts) parts(i + 1) else numPoints
      pts.slice(parts(i), end)
    }
    // shells are CW (negative shoelace), holes CCW: attach each hole
    // to the most recent shell (well-formed files list shell-then-holes)
    val polys = scala.collection.mutable.ArrayBuffer.empty[(Geo.Ring, scala.collection.mutable.ArrayBuffer[Geo.Ring])]
    rings.foreach { r =>
      val isShell = Geo.signedArea(r) <= 0 || polys.isEmpty
      if (isShell) polys += ((r, scala.collection.mutable.ArrayBuffer.empty))
      else polys.last._2 += r
    }
    def ringStr(r: Geo.Ring): String = {
      val closed = if (r.nonEmpty && r.head == r.last) r else r :+ r.head
      closed.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")")
    }
    def polyStr(p: (Geo.Ring, scala.collection.mutable.ArrayBuffer[Geo.Ring])) =
      (ringStr(p._1) +: p._2.map(ringStr).toSeq).mkString("(", ", ", ")")
    Some(
      if (polys.size == 1)
        "POLYGON " + polyStr(polys.head)
      else
        "MULTIPOLYGON (" + polys.map(polyStr).mkString(", ") + ")")
  }

  /** Parse the .shp main file into per-record WKT. */
  def readShpWkt(bytes: Array[Byte]): Seq[String] = {
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLenBytes = be.getInt(24) * 2
    var off = 100
    val out = Seq.newBuilder[String]
    while (off + 8 <= fileLenBytes) {
      val contentLenBytes = be.getInt(off + 4) * 2
      val content = ByteBuffer.wrap(bytes, off + 8, contentLenBytes)
        .order(ByteOrder.LITTLE_ENDIAN)
      recordToWkt(content).foreach(out += _)
      off += 8 + contentLenBytes
    }
    out.result()
  }

  private case class DbfField(name: String, ftype: Char, len: Int, dec: Int)

  /** Parse the .dbf sidecar: (schema fields, row values). */
  def readDbf(bytes: Array[Byte]): (Seq[StructField], Seq[Seq[Any]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = buf.getInt(4)
    val headerSize = buf.getShort(8).toInt
    val recordSize = buf.getShort(10).toInt
    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off < headerSize && bytes(off) != 0x0d)
      .map { off =>
        val name = new String(bytes, off, 11, "US-ASCII").takeWhile(c => c != '\u0000' && c != ' ').trim
        DbfField(name, bytes(off + 11).toChar,
          bytes(off + 16) & 0xff, bytes(off + 17) & 0xff)
      }.toSeq
    val schema = fields.map { f =>
      val dt = f.ftype match {
        case 'N' if f.dec == 0 && f.len < 19 => LongType
        case 'N' | 'F' => DoubleType
        case 'L' => BooleanType
        case _ => StringType // C, D, and anything exotic
      }
      StructField(f.name, dt, nullable = true)
    }
    val rows = (0 until nRecords).map { r =>
      var off = headerSize + r * recordSize + 1 // +1 deletion flag
      fields.map { f =>
        val raw = new String(bytes, off, f.len, "US-ASCII").trim
        off += f.len
        if (raw.isEmpty) null
        else f.ftype match {
          case 'N' if f.dec == 0 && f.len < 19 => raw.toLong
          case 'N' | 'F' => raw.toDouble
          case 'L' => "TtYy".contains(raw.head)
          case _ => raw
        }
      }
    }
    (schema, rows)
  }

  /** S1 — read a `.shp` (+ optional sibling `.dbf`) into a DataFrame
    * of attributes + `geometry` (WKT), the same uniform shape as the
    * GeoJSON/CSV readers.
    */
  def read(spark: SparkSession, shpPath: String): DataFrame = {
    val wkts = readShpWkt(Files.readAllBytes(Paths.get(shpPath)))
    val dbfPath = Paths.get(shpPath.replaceAll("\\.shp$", ".dbf"))
    val (attrFields, attrRows) =
      if (Files.exists(dbfPath)) readDbf(Files.readAllBytes(dbfPath))
      else (Seq(StructField("fid", LongType)), wkts.indices.map(i => Seq(i.toLong)))
    require(attrRows.size == wkts.size,
      s".dbf rows (${attrRows.size}) != .shp records (${wkts.size})")
    val schema = StructType(attrFields :+ StructField("geometry", StringType))
    val rows = attrRows.zip(wkts).map { case (attrs, wkt) =>
      Row.fromSeq(attrs :+ wkt)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
