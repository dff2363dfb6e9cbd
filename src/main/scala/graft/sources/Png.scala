package graft.sources

/** Baseline PNG codec (ISO/IEC 15948 / RFC 2083) — the OTHER
  * dominant crawl-image format next to JPEG (`sources/Jpeg.scala`):
  * the reference's raster stack reads imagery through rasterio
  * (`/root/reference/code/tx.py:26`); the web-crawl archives the
  * WARC tier ingests carry their images as JPEG and PNG, and this
  * zero-dependency decoder (plus matching encoder) extends the
  * decode→img_dhash→dedup chain to the lossless modality
  * (q195/q196). Implemented from the public spec like the repo's
  * other binary codecs (Jp2/GeoTiff/Warc/Jpeg):
  *
  *   - signature + chunk stream parse with CRC-32 VERIFIED on every
  *     chunk (§5.3; java.util.zip.CRC32 — the polynomial the spec
  *     fixes), unknown ancillary chunks skipped, unknown CRITICAL
  *     chunks refused loudly (§5.4's rule: a decoder that cannot
  *     honor a critical chunk must not render);
  *   - IHDR validation with explicit LOUD REFUSAL outside the
  *     supported profile: bit depth 8, color types 0 (grayscale)
  *     and 2 (truecolor), compression 0, filter method 0,
  *     interlace 0 (Adam7 refused — silently deinterlacing wrong
  *     would corrupt every downstream fingerprint);
  *   - zlib inflate of the concatenated IDAT stream (§10;
  *     java.util.zip.Inflater, the WARC tier's inflate dependency)
  *     with an exact expected-size check — truncated or oversized
  *     image data refuses rather than yielding a partial plane;
  *   - ALL FIVE scanline filters reconstructed per §9 (None / Sub /
  *     Up / Average / Paeth, including the floor-average and the
  *     Paeth predictor's exact tie order a←b←c).
  *
  * The encoder writes the exact inverse and deliberately CYCLES the
  * filter type per scanline (row % 5), so one encode→decode round
  * trip exercises every reconstruction path; PNG is lossless, so
  * round trips are bit-exact on ARBITRARY pixel content (the q195
  * oracle derives decoded pixels straight from the corpus formula —
  * no constant-block restriction like lossy JPEG's q186).
  * Validation (PngSpec) is ImageIO-cross-certified both ways, the
  * JpegSpec discipline: the JDK's independent PNG codec decodes this
  * encoder's output and this decoder reads ImageIO's output (whose
  * own per-row filter choices are foreign to ours).
  *
  * Scale shape: decode/encode are per-row kernels over binary
  * columns (the q146 batch-codec discipline) — no state crosses
  * rows, so the modality pipeline is embarrassingly parallel and
  * shuffles only on the downstream fingerprint keys.
  */
object Png {

  /** Decoded image: `data` is the raster-order sample plane —
    * 1 byte/px for grayscale (color type 0), 3 bytes/px RGB for
    * truecolor (color type 2).
    */
  case class Decoded(width: Int, height: Int, colorType: Int,
      data: Array[Byte]) {
    def gray: Array[Byte] = {
      require(colorType == 0, s"PNG: color type $colorType is not grayscale")
      data
    }
    def rgb: Array[Byte] = {
      require(colorType == 2, s"PNG: color type $colorType is not truecolor")
      data
    }
  }

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("PNG: " + msg)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** §9.4 Paeth predictor — the spec's exact tie order (a, then b,
    * then c on equal distances).
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(bytes: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new Array[Byte](expected)
    var at = 0
    try {
      while (at < expected && !inf.finished()) {
        val n = inf.inflate(out, at, expected - at)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary())
            fail("truncated or dictionary-dependent IDAT zlib stream")
        }
        at += n
      }
      if (at < expected)
        fail(s"IDAT inflated to $at bytes, expected $expected")
      // anything beyond the exact raster refuses too — a stream that
      // keeps producing data is not the image the header declared
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) > 0)
        fail(s"IDAT inflates past the expected $expected bytes")
      out
    } finally inf.end()
  }

  /** Decode a PNG byte stream (bit depth 8, color type 0 or 2,
    * non-interlaced). Chunk CRCs are verified; unknown critical
    * chunks, Adam7 interlace, palettes, alpha, and 16-bit depth
    * refuse loudly.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 && (0 until 8).forall(i =>
      bytes(i) == Signature(i)), "PNG: bad signature")
    var pos = 8
    var w = 0
    var h = 0
    var colorType = -1
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (pos + 12 > bytes.length) fail(s"truncated chunk at byte $pos")
      val len = u32(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length)
        fail(s"chunk at byte $pos declares $len bytes past the stream end")
      val dataAt = pos + 8
      val typ = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32(bytes, dataAt + len.toInt))
        fail(s"CRC mismatch on $typ chunk at byte $pos")
      typ match {
        case "IHDR" =>
          if (seenIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len != 13")
          w = u32(bytes, dataAt).toInt
          h = u32(bytes, dataAt + 4).toInt
          val bitDepth = bytes(dataAt + 8) & 0xff
          colorType = bytes(dataAt + 9) & 0xff
          val compression = bytes(dataAt + 10) & 0xff
          val filterMethod = bytes(dataAt + 11) & 0xff
          val interlace = bytes(dataAt + 12) & 0xff
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          if (w.toLong * h * 3 > (1L << 28))
            fail(s"${w}x$h exceeds the decoder's 256 MiB raster guard")
          if (bitDepth != 8) fail(s"bit depth $bitDepth unsupported " +
            "(baseline profile: 8)")
          if (colorType != 0 && colorType != 2)
            fail(s"color type $colorType unsupported (grayscale 0 / " +
              "truecolor 2; palette, alpha and 16-bit refuse)")
          if (compression != 0) fail(s"compression method $compression")
          if (filterMethod != 0) fail(s"filter method $filterMethod")
          if (interlace != 0)
            fail("Adam7 interlace unsupported — refusing rather than " +
              "mis-deinterlacing")
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) fail("IDAT before IHDR")
          idat.write(bytes, dataAt, len.toInt)
        case "IEND" =>
          if (len != 0) fail(s"IEND length $len != 0")
          seenIend = true
        case t =>
          // bit 5 of the first type byte: lowercase = ancillary
          if (!seenIhdr) fail(s"$t chunk before IHDR")
          if ((bytes(pos + 4) & 0x20) == 0)
            fail(s"unknown CRITICAL chunk $t — refusing per §5.4")
        // ancillary chunks (tEXt, tIME, gAMA, ...) are skipped
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr) fail("missing IHDR")
    val bpp = if (colorType == 0) 1 else 3
    val stride = w * bpp
    val raw = inflate(idat.toByteArray, (stride + 1) * h)
    val out = new Array[Byte](stride * h)
    var row = 0
    while (row < h) {
      val ft = raw(row * (stride + 1)) & 0xff
      val base = row * (stride + 1) + 1
      var i = 0
      while (i < stride) {
        val x = raw(base + i) & 0xff
        val a = if (i >= bpp) out(row * stride + i - bpp) & 0xff else 0
        val b = if (row > 0) out((row - 1) * stride + i) & 0xff else 0
        val c = if (row > 0 && i >= bpp)
          out((row - 1) * stride + i - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
          case other => fail(s"unknown filter type $other on row $row")
        }
        out(row * stride + i) = (rec & 0xff).toByte
        i += 1
      }
      row += 1
    }
    Decoded(w, h, colorType, out)
  }

  // ----------------------------------------------------------------
  // encoder

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length), 0, 4)
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t)
    crc.update(data)
    out.write(be32(crc.getValue), 0, 4)
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Encode a raster-order sample plane. The filter type CYCLES
    * row % 5, so one round trip exercises every §9 reconstruction
    * path in [[decode]].
    */
  private def encode(px: Array[Byte], w: Int, h: Int, bpp: Int,
      colorType: Int): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * bpp,
      s"PNG encode: ${px.length} bytes is not a ${w}x$h plane ($bpp B/px)")
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var row = 0
    while (row < h) {
      val ft = row % 5
      raw(row * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = px(row * stride + i) & 0xff
        val a = if (i >= bpp) px(row * stride + i - bpp) & 0xff else 0
        val b = if (row > 0) px((row - 1) * stride + i) & 0xff else 0
        val c = if (row > 0 && i >= bpp)
          px((row - 1) * stride + i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, c)
        }
        raw(row * (stride + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      row += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    def putBe32(at: Int, v: Int): Unit = {
      ihdr(at) = (v >>> 24).toByte; ihdr(at + 1) = (v >>> 16).toByte
      ihdr(at + 2) = (v >>> 8).toByte; ihdr(at + 3) = v.toByte
    }
    putBe32(0, w); putBe32(4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode an 8-bit grayscale plane (color type 0). */
  def encodeGray(px: Array[Byte], w: Int, h: Int): Array[Byte] =
    encode(px, w, h, 1, 0)

  /** Encode an 8-bit RGB raster (color type 2, 3 bytes/px). */
  def encodeRgb(px: Array[Byte], w: Int, h: Int): Array[Byte] =
    encode(px, w, h, 3, 2)
}
