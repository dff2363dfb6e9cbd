package graft.sources

import graft.functions.Raster.Chip
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GeoTIFF codec, pure Scala (zero-egress build — no imaging
  * libraries): single-band, uncompressed, float64 samples, one strip,
  * little-endian classic TIFF, with the standard GeoTIFF
  * georeferencing tags (ModelPixelScale + ModelTiepoint +
  * GeoKeyDirectory carrying the EPSG code) and GDAL's nodata tag.
  *
  * This is the real S7 raster sink the reference writes through
  * rasterio (`driver='GTiff'`, `/root/reference/code/tx.py:33-34`):
  * files produced here carry valid TIFF structure + georeferencing
  * and decode back bit-exactly. Scope is exactly what the engine
  * emits — the DECODER reads this profile (and rejects others
  * loudly); JP2 input decode remains out of scope (wavelet codec,
  * documented in SURVEY §2.1 S5).
  */
object GeoTiff {

  private val TYPE_SHORT = 3
  private val TYPE_LONG = 4
  private val TYPE_ASCII = 2
  private val TYPE_DOUBLE = 12

  /** Encode a chip as GeoTIFF. `epsg` 4326 → geographic model keys;
    * anything else is written as a projected CS code (e.g. 32631 for
    * UTM 31N).
    */
  def encode(c: Chip, epsg: Int = 4326): Array[Byte] = {
    val pixBytes = c.px.length * 8
    val pixOff = 8
    val auxOff = pixOff + pixBytes
    val scaleOff = auxOff           // 3 doubles
    val tieOff = auxOff + 24        // 6 doubles
    val keysOff = auxOff + 72       // 16 shorts
    val nodataStr = c.nodata.toString
    val nodataBytes = (nodataStr + "\u0000").getBytes("US-ASCII")
    // TIFF spec: values of count*size <= 4 bytes live INLINE in the
    // tag's value field, not behind an offset (the default 0.0 nodata
    // is exactly 4 bytes — '0.0'+NUL).
    val nodataInline = nodataBytes.length <= 4
    val nodataOff = auxOff + 104
    var ifdOff = nodataOff + (if (nodataInline) 0 else nodataBytes.length)
    if (ifdOff % 2 == 1) ifdOff += 1 // TIFF offsets must be even

    case class Tag(id: Int, tpe: Int, count: Int, value: Long)
    val sx = (c.maxx - c.minx) / c.width
    val sy = (c.maxy - c.miny) / c.height
    val tags = Seq(
      Tag(256, TYPE_LONG, 1, c.width),          // ImageWidth
      Tag(257, TYPE_LONG, 1, c.height),         // ImageLength
      Tag(258, TYPE_SHORT, 1, 64),              // BitsPerSample
      Tag(259, TYPE_SHORT, 1, 1),               // Compression: none
      Tag(262, TYPE_SHORT, 1, 1),               // Photometric: BlackIsZero
      Tag(273, TYPE_LONG, 1, pixOff),           // StripOffsets
      Tag(277, TYPE_SHORT, 1, 1),               // SamplesPerPixel
      Tag(278, TYPE_LONG, 1, c.height),         // RowsPerStrip: one strip
      Tag(279, TYPE_LONG, 1, pixBytes),         // StripByteCounts
      Tag(339, TYPE_SHORT, 1, 3),               // SampleFormat: IEEE float
      Tag(33550, TYPE_DOUBLE, 3, scaleOff),     // ModelPixelScale
      Tag(33922, TYPE_DOUBLE, 6, tieOff),       // ModelTiepoint
      Tag(34735, TYPE_SHORT, 16, keysOff),      // GeoKeyDirectory
      Tag(42113, TYPE_ASCII, nodataBytes.length,
        if (nodataInline) 0 else nodataOff)) // GDAL_NODATA

    val total = ifdOff + 2 + tags.size * 12 + 4
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    // header
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    // pixel strip (row-major float64, row 0 = north — the chip layout)
    c.px.foreach(buf.putDouble)
    // ModelPixelScale (sx, sy, 0)
    buf.putDouble(sx).putDouble(sy).putDouble(0.0)
    // ModelTiepoint: raster (0,0) -> (minx, maxy)
    buf.putDouble(0).putDouble(0).putDouble(0)
    buf.putDouble(c.minx).putDouble(c.maxy).putDouble(0)
    // GeoKeyDirectory: version 1.1.0, 3 keys
    val modelType = if (epsg == 4326) 2 else 1 // geographic | projected
    val csKey = if (epsg == 4326) 2048 else 3072 // Geographic | ProjectedCSType
    Seq(1, 1, 0, 3,
      1024, 0, 1, modelType, // GTModelType
      1025, 0, 1, 1,         // GTRasterType: PixelIsArea
      csKey, 0, 1, epsg)
      .foreach(v => buf.putShort(v.toShort))
    if (!nodataInline) buf.put(nodataBytes)
    buf.position(ifdOff)
    buf.putShort(tags.size.toShort)
    tags.foreach { t =>
      buf.putShort(t.id.toShort).putShort(t.tpe.toShort).putInt(t.count)
      if (t.id == 42113 && nodataInline)
        buf.put(java.util.Arrays.copyOf(nodataBytes, 4))
      else if (t.tpe == TYPE_SHORT && t.count == 1)
        buf.putShort(t.value.toShort).putShort(0)
      else buf.putInt(t.value.toInt)
    }
    buf.putInt(0) // no next IFD
    buf.array()
  }

  /** Decode a GeoTIFF written by [[encode]] (same single-band
    * float64/uncompressed profile). Returns the chip and the EPSG
    * code. Fails loudly on other TIFF profiles rather than
    * mis-reading them.
    */
  def decode(bytes: Array[Byte]): (Chip, Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'I' && buf.get() == 'I' && buf.getShort() == 42,
      "not a little-endian TIFF")
    val ifdOff = buf.getInt()
    buf.position(ifdOff)
    val nTags = buf.getShort().toInt
    // tag id -> (type, count, raw value field). Values of
    // count*size <= 4 are inline: their bytes sit AT the value field
    // (position ifdOff + 2 + i*12 + 8), not behind an offset.
    val tags = (0 until nTags).map { i =>
      val id = buf.getShort() & 0xffff
      val tpe = buf.getShort().toInt
      val count = buf.getInt()
      val value = buf.getInt()
      id -> ((tpe, count, value, ifdOff + 2 + i * 12 + 8))
    }.toMap
    def short1(id: Int, default: Int = -1): Int =
      tags.get(id).map(t => t._3 & 0xffff).getOrElse(default)
    def long1(id: Int): Int = tags(id)._3
    require(short1(259) == 1, s"compressed TIFF unsupported (${short1(259)})")
    require(short1(258) == 64 && short1(339) == 3,
      "only float64 samples supported")
    require(short1(277, 1) == 1, "only single-band supported")
    val w = long1(256); val h = long1(257)
    val doubles = (id: Int) => {
      val (tpe, count, off, _) = tags(id)
      require(tpe == TYPE_DOUBLE, s"tag $id not DOUBLE")
      val b = ByteBuffer.wrap(bytes, off, count * 8).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(count)(b.getDouble)
    }
    val scale = doubles(33550); val tie = doubles(33922)
    val minx = tie(3); val maxy = tie(4)
    val maxx = minx + scale(0) * w; val miny = maxy - scale(1) * h
    val nodata = tags.get(42113).map { case (_, count, off, valuePos) =>
      val src = if (count <= 4) valuePos else off
      new String(bytes, src, count, "US-ASCII").takeWhile(_ != '\u0000')
        .trim.toDouble
    }.getOrElse(0.0)
    val epsg = tags.get(34735).map { case (_, count, off, _) =>
      val b = ByteBuffer.wrap(bytes, off, count * 2).order(ByteOrder.LITTLE_ENDIAN)
      val shorts = Array.fill(count)(b.getShort().toInt & 0xffff)
      // keys start at index 4, 4 shorts each: (id, loc, count, value)
      shorts.drop(4).grouped(4)
        .collectFirst { case Array(id, 0, 1, v) if id == 2048 || id == 3072 => v }
        .getOrElse(0)
    }.getOrElse(0)
    val pixOff = long1(273); val pixBytes = long1(279)
    require(pixBytes == w * h * 8, "strip size mismatch")
    val pb = ByteBuffer.wrap(bytes, pixOff, pixBytes).order(ByteOrder.LITTLE_ENDIAN)
    val px = Array.fill(w * h)(pb.getDouble)
    (Chip(w, h, minx, miny, maxx, maxy, nodata, px), epsg)
  }
}
