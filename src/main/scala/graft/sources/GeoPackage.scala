package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal read-only GeoPackage (.gpkg) reader, pure Scala — closing
  * the last `gpd.read_file` format of the reference's AOI loader
  * (`/root/reference/code/download_imagery.py:22`; GeoJSON/CSV/SHP are
  * the sibling readers in this package).
  *
  * A GeoPackage is a SQLite database with published metadata tables.
  * This implements exactly the read path from the two public specs:
  *
  *  - SQLite file format: page header / table b-tree walk (leaf 0x0D,
  *    interior 0x05), record serial types, varints, and overflow-page
  *    chains for large payloads;
  *  - GeoPackage: `gpkg_geometry_columns` discovery, the "GP"
  *    geometry blob header (flags + envelope skip), and 2-D WKB
  *    Polygon/MultiPolygon → WKT.
  *
  * Scope: read-only, UTF-8, 2-D polygon layers (the AOI use case);
  * anything else fails loudly. AOI-sized files parse on the driver
  * (same stance as Shapefile.read) into a regular DataFrame.
  */
object GeoPackage {

  // ---- SQLite primitives -----------------------------------------

  private final class Db(bytes: Array[Byte]) {
    require(new String(bytes, 0, 15, "US-ASCII") == "SQLite format 3",
      "not a SQLite database")
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val pageSize: Int = {
      val raw = bb.getShort(16) & 0xffff
      if (raw == 1) 65536 else raw
    }
    val usable: Int = pageSize - (bytes(20) & 0xff) // minus reserved space
    require(bb.getInt(56) == 1, "only UTF-8 GeoPackages supported")

    def pageStart(page: Int): Int = (page - 1) * pageSize

    /** Walk a table b-tree rooted at `page`, yielding (rowid, record
      * bytes) with overflow chains resolved.
      */
    def walkTable(page: Int): Seq[(Long, Array[Byte])] = {
      val base = pageStart(page)
      val hdr = base + (if (page == 1) 100 else 0)
      val ptype = bytes(hdr) & 0xff
      val nCells = bb.getShort(hdr + 3) & 0xffff
      ptype match {
        case 0x05 => // interior: recurse left children + right-most
          val cells = (0 until nCells).map { i =>
            val cp = base + (bb.getShort(hdr + 12 + 2 * i) & 0xffff)
            bb.getInt(cp) // left child page
          }
          val rightMost = bb.getInt(hdr + 8)
          (cells :+ rightMost).flatMap(walkTable)
        case 0x0d => // leaf
          (0 until nCells).map { i =>
            val cp = base + (bb.getShort(hdr + 8 + 2 * i) & 0xffff)
            var p = cp
            val (payloadLen, p1) = varint(p); p = p1
            val (rowid, p2) = varint(p); p = p2
            rowid -> readPayload(p, payloadLen.toInt)
          }
        case other =>
          throw new IllegalArgumentException(
            f"unsupported SQLite page type 0x$other%02x (index page in table walk?)")
      }
    }

    /** Payload with the spec's overflow spill formula. */
    private def readPayload(at: Int, total: Int): Array[Byte] = {
      val x = usable - 35
      if (total <= x) java.util.Arrays.copyOfRange(bytes, at, at + total)
      else {
        val m = (usable - 12) * 32 / 255 - 23
        val k = m + (total - m) % (usable - 4)
        val local = if (k <= x) k else m
        val out = new Array[Byte](total)
        System.arraycopy(bytes, at, out, 0, local)
        var next = bb.getInt(at + local)
        var off = local
        while (next != 0 && off < total) {
          val ps = pageStart(next)
          val chunk = math.min(usable - 4, total - off)
          System.arraycopy(bytes, ps + 4, out, off, chunk)
          off += chunk
          next = bb.getInt(ps)
        }
        require(off == total, "truncated overflow chain")
        out
      }
    }

    /** SQLite varint at `p`: (value, next offset). */
    def varint(p0: Int): (Long, Int) = {
      var p = p0; var v = 0L; var i = 0
      while (i < 8) {
        val b = bytes(p) & 0xff
        v = (v << 7) | (b & 0x7f)
        p += 1; i += 1
        if ((b & 0x80) == 0) return (v, p)
      }
      v = (v << 8) | (bytes(p) & 0xff)
      (v, p + 1)
    }

    /** Decode a record into column values (Long | Double | String |
      * Array[Byte] | null).
      */
    def record(payload: Array[Byte]): Seq[Any] = {
      val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      def varintB(p0: Int): (Long, Int) = {
        var p = p0; var v = 0L; var i = 0
        while (i < 8) {
          val b = payload(p) & 0xff
          v = (v << 7) | (b & 0x7f)
          p += 1; i += 1
          if ((b & 0x80) == 0) return (v, p)
        }
        ((v << 8) | (payload(p) & 0xff), p + 1)
      }
      val (hdrLen, afterHdrLen) = varintB(0)
      val types = Seq.newBuilder[Long]
      var p = afterHdrLen
      while (p < hdrLen) {
        val (t, p2) = varintB(p); types += t; p = p2
      }
      var dp = hdrLen.toInt
      types.result().map { t =>
        def intN(n: Int): Long = {
          var v = if ((payload(dp) & 0x80) != 0) -1L else 0L
          (0 until n).foreach(i => v = (v << 8) | (payload(dp + i) & 0xff))
          dp += n; v
        }
        t match {
          case 0 => null
          case 1 => intN(1)
          case 2 => intN(2)
          case 3 => intN(3)
          case 4 => intN(4)
          case 5 => intN(6)
          case 6 => intN(8)
          case 7 => val d = pb.getDouble(dp); dp += 8; d
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(payload, dp, len, "UTF-8"); dp += len; s
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(payload, dp, dp + len)
            dp += len; b
          case other =>
            throw new IllegalArgumentException(s"serial type $other unsupported")
        }
      }
    }
  }

  /** sqlite_master: (name → (rootpage, create sql)). */
  private def master(db: Db): Map[String, (Int, String)] =
    db.walkTable(1).flatMap { case (_, payload) =>
      db.record(payload) match {
        case Seq("table", name: String, _, rootpage: Long, sql: String) =>
          Some(name -> (rootpage.toInt, sql))
        case _ => None
      }
    }.toMap

  /** Column (name, declared type) pairs from a CREATE TABLE statement
    * (top-level commas; trailing table constraints skipped). The
    * declared type is everything after the name up to the first
    * column-constraint keyword — needed because SQLite stores values
    * by value, not by declaration: a REAL column legally holds
    * integer-encoded values on disk.
    */
  private def columnsOf(sql: String): Seq[(String, String)] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    var depth = 0
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    val colConstraintKw = Set("PRIMARY", "NOT", "NULL", "UNIQUE", "CHECK",
      "DEFAULT", "COLLATE", "REFERENCES", "GENERATED", "AS", "AUTOINCREMENT")
    parts.result().map(_.trim).filter(_.nonEmpty)
      .filterNot(p => constraintKw.contains(
        p.split("[\\s(]+").head.toUpperCase))
      .map { p =>
        val toks = p.split("\\s+")
        val name = toks.head.replaceAll("[\"'`\\[\\]]", "")
        val decl = toks.drop(1)
          .takeWhile(t => !colConstraintKw.contains(t.toUpperCase))
          .mkString(" ")
        (name, decl)
      }
  }

  /** SQLite type affinity of a declared column type (the published
    * affinity rules): INT→'I', CHAR/CLOB/TEXT→'T', BLOB/empty→'B',
    * REAL/FLOA/DOUB→'R', else NUMERIC→'N'.
    */
  private def affinityOf(decl: String): Char = {
    val u = decl.toUpperCase
    if (u.contains("INT")) 'I'
    else if (u.contains("CHAR") || u.contains("CLOB") || u.contains("TEXT")) 'T'
    else if (u.isEmpty || u.contains("BLOB")) 'B'
    else if (u.contains("REAL") || u.contains("FLOA") || u.contains("DOUB")) 'R'
    else 'N'
  }

  // ---- GeoPackage geometry blob + WKB ----------------------------

  /** GPKG geometry blob → WKT (2-D Polygon/MultiPolygon). */
  def gpkgGeometryToWkt(blob: Array[Byte]): String = {
    require(blob(0) == 'G' && blob(1) == 'P', "not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    require((flags & 0x20) == 0, "empty geometry")
    val envBytes = ((flags >> 1) & 0x07) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"bad envelope code $other")
    }
    wkbToWkt(blob, 8 + envBytes)
  }

  private def wkbToWkt(b: Array[Byte], at: Int): String = {
    val order = if (b(at) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(b).order(order)
    val rawType = bb.getInt(at + 1)
    require((rawType & 0xf0000000) == 0 && rawType < 1000,
      s"non-2D / EWKB geometry type $rawType unsupported")
    val gtype = rawType
    def rings(p0: Int): (Seq[String], Int) = {
      var p = p0
      val n = bb.getInt(p); p += 4
      val out = (0 until n).map { _ =>
        val nPts = bb.getInt(p); p += 4
        val pts = (0 until nPts).map { _ =>
          val x = bb.getDouble(p); val y = bb.getDouble(p + 8); p += 16
          s"$x $y"
        }
        pts.mkString("(", ", ", ")")
      }
      (out, p)
    }
    gtype match {
      case 3 => // Polygon
        val (rs, _) = rings(at + 5)
        "POLYGON " + rs.mkString("(", ", ", ")")
      case 6 => // MultiPolygon: each element is a full WKB polygon
        var p = at + 5
        val n = bb.getInt(p); p += 4
        val polys = (0 until n).map { _ =>
          val sub = ByteBuffer.wrap(b)
            .order(if (b(p) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          require((sub.getInt(p + 1) & 0x0fffffff) == 3, "non-polygon in multi")
          var q = p + 5
          val nr = sub.getInt(q); q += 4
          val rs = (0 until nr).map { _ =>
            val nPts = sub.getInt(q); q += 4
            val pts = (0 until nPts).map { _ =>
              val x = sub.getDouble(q); val y = sub.getDouble(q + 8); q += 16
              s"$x $y"
            }
            pts.mkString("(", ", ", ")")
          }
          p = q
          rs.mkString("(", ", ", ")")
        }
        "MULTIPOLYGON " + polys.mkString("(", ", ", ")")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported WKB geometry type $other (polygons only)")
    }
  }

  // ---- public reader ---------------------------------------------

  /** S1 — read the (single) feature layer of a .gpkg into a DataFrame
    * of attributes + `geometry` (WKT) — the same uniform shape as the
    * GeoJSON/CSV/SHP readers. `layer` selects a table when the
    * package has several.
    */
  def read(spark: SparkSession, path: String, layer: Option[String] = None)
      : DataFrame = {
    val db = new Db(Files.readAllBytes(Paths.get(path)))
    val tables = master(db)
    val geomCols = tables.getOrElse("gpkg_geometry_columns",
      throw new IllegalArgumentException("no gpkg_geometry_columns — not a GeoPackage"))
    val layers = db.walkTable(geomCols._1).map { case (_, p) =>
      val r = db.record(p) // table_name, column_name, geometry_type_name, srs_id, z, m
      (r(0).asInstanceOf[String], r(1).asInstanceOf[String])
    }
    val (table, geomCol) = layer match {
      case Some(l) => layers.find(_._1 == l).getOrElse(
        throw new IllegalArgumentException(s"layer $l not in ${layers.map(_._1)}"))
      case None =>
        require(layers.size == 1,
          s"multiple layers ${layers.map(_._1)} — pass layer=")
        layers.head
    }
    val (rootpage, createSql) = tables(table)
    val colDecls = columnsOf(createSql)
    val cols = colDecls.map(_._1)
    val geomIdx = cols.indexOf(geomCol)
    require(geomIdx >= 0, s"geometry column $geomCol not in $cols")

    val raw = db.walkTable(rootpage).map { case (rowid, p) =>
      val vals = db.record(p).toArray
      // INTEGER PRIMARY KEY columns store NULL; the value is the rowid
      if (vals.nonEmpty && vals(0) == null) vals(0) = rowid
      vals
    }
    val attrIdx = cols.indices.filterNot(_ == geomIdx)
    // Type from declared affinity first, stored serial types second:
    // SQLite stores REAL-affinity values with no fractional part as
    // INTEGER on disk, so observed-only inference would mistype (or
    // mix-type) a valid REAL column. NUMERIC/BLOB affinity falls back
    // to the widest observed numeric type.
    val sparkTypes: Map[Int, DataType] = attrIdx.map { i =>
      val observed = raw.iterator.map(_(i)).filter(_ != null)
        .map {
          case _: Long => LongType: DataType
          case _: Double => DoubleType
          case _: String => StringType
          case _ => BinaryType
        }.toSet
      val dt = affinityOf(colDecls(i)._2) match {
        case 'R' => DoubleType
        case 'I' | 'N' =>
          if (observed.contains(DoubleType)) DoubleType
          else if (observed.contains(StringType)) StringType
          else LongType
        case 'T' => StringType
        case _ =>
          if (observed == Set[DataType](LongType)) LongType
          else if (observed.subsetOf(Set[DataType](LongType, DoubleType)))
            DoubleType
          else StringType
      }
      i -> dt
    }.toMap
    def coerce(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (l: Long, DoubleType) => l.toDouble
      case (d: Double, LongType) => d.toLong
      case (s: String, t) if t != StringType =>
        throw new IllegalArgumentException(
          s"cannot coerce text value '$s' to $t")
      case (x, StringType) if !x.isInstanceOf[String] => x.toString
      case (x, _) => x
    }
    val fields = attrIdx.map { i =>
      StructField(cols(i), sparkTypes(i), nullable = true)
    } :+ StructField("geometry", StringType)
    val rows = raw.map { vals =>
      Row.fromSeq(attrIdx.map(i => coerce(vals(i), sparkTypes(i))) :+
        gpkgGeometryToWkt(vals(geomIdx).asInstanceOf[Array[Byte]]))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), StructType(fields))
  }
}
