package graft.sources

/** Baseline JFIF/JPEG codec (ITU-T T.81) — the crawl-image modality
  * of S5: the reference's raster stack decodes imagery through
  * rasterio (`/root/reference/code/tx.py:26`); the web-crawl archives
  * the WARC tier ingests carry their images as baseline JPEG, and
  * this is the zero-dependency decoder (plus matching encoder) that
  * makes the decode→img_dhash→near-dup chain real end-to-end
  * (q186/q187). Implemented from the public spec, like the repo's
  * other binary codecs (Jp2/GeoTiff/Warc):
  *
  *   - marker segment parse (SOI/APPn/COM/DQT/DHT/SOF0/SOF2/DRI/
  *     SOS/EOI, T.81 §B.2), every read bounds-checked (truncated or
  *     garbage streams raise the documented IllegalArgumentException
  *     refusal, never a raw JVM error) and B.1.1.2 fill bytes
  *     accepted, with explicit LOUD REFUSAL of everything outside
  *     the two Huffman 8-bit profiles: extended sequential (SOF1),
  *     arithmetic coding (SOF9+/DAC), lossless, 12-bit precision,
  *     sampling factors outside {1,2};
  *   - PROGRESSIVE decode (SOF2, T.81 Annex G — the majority
  *     profile in real web crawls): spectral selection + successive
  *     approximation, interleaved and single-component DC scans,
  *     single-component AC scans with EOB-run accounting, DC/AC
  *     refinement correction bits, quantized coefficients
  *     accumulated across scans and reconstructed at EOI;
  *   - restart intervals (DRI/RSTn) in both profiles: byte-aligned
  *     cycling markers, predictor/EOB-run resets (E.2.4);
  *   - canonical Huffman table construction and the MINCODE/MAXCODE
  *     decode procedure (T.81 §C.2, F.2.2.3), DC prediction +
  *     EXTEND sign recovery (F.2.2.1), AC run-length/EOB/ZRL
  *     (F.2.2.2), entropy-stream 0xFF00 byte unstuffing (B.1.1.5);
  *   - dequantization + 2-D IDCT via the orthonormal cosine matrix
  *     (A.3.3) — double-precision separable matrix products; a
  *     DC-only block reconstructs EXACTLY (error ~1e-13 ≪ the 0.5
  *     rounding margin), which is what the constant-block oracle
  *     corpus of q186/q187 relies on;
  *   - interleaved MCU layout for subsampled scans (A.2.3):
  *     4:4:4, 4:2:2 and 4:2:0 (h,v ∈ {1,2}), per-component planes
  *     at their natural subsampled resolution, cropped from the
  *     padded MCU grid.
  *
  * The encoder writes the exact inverse (FDCT → quantize → Huffman
  * with the T.81 Annex K tables → stuffed entropy stream) so specs
  * can drive arbitrary pixel corpora through a real byte stream.
  * Validation (JpegSpec) is THREE-sided, closing the cancel-bug gap
  * the JP2 suite cannot (no external JP2 encoder exists in this
  * environment): hand-assembled golden streams with hand-computed
  * bit strings pin the decoder alone; the JDK's independent ImageIO
  * JPEG codec (javax.imageio, public standard library) decodes this
  * encoder's output and this decoder reads ImageIO's output —
  * encoder and decoder are each certified against a foreign
  * implementation, not just each other.
  *
  * Scale shape: decode/encode are per-row kernels over binary
  * columns (the q146 batch-codec discipline) — no state crosses
  * rows, so the modality pipeline is embarrassingly parallel and
  * shuffles only on the downstream fingerprint keys.
  */
object Jpeg {

  // ----------------------------------------------------------------
  // shared tables

  /** Zig-zag scan order: zigzag(k) = raster index of the k-th
    * coefficient in scan order (T.81 Figure A.6).
    */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Orthonormal 8-point DCT-II basis: C(u)(x) = c_u/2 ·
    * cos((2x+1)uπ/16), rows orthonormal, so FDCT = C·f·Cᵀ and
    * IDCT = Cᵀ·F·C with no extra scaling (A.3.3 up to the
    * orthonormal normalization).
    */
  private val C: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** T.81 Annex K.3 typical Huffman tables (BITS, HUFFVAL). */
  private[graft] val StdDcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[graft] val StdDcLumaVals = (0 to 11).toArray
  private[graft] val StdDcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private[graft] val StdDcChromaVals = (0 to 11).toArray
  private[graft] val StdAcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[graft] val StdAcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private[graft] val StdAcChromaBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private[graft] val StdAcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** The repo's default quant table: DC step 8 (so a constant
    * block's DC = 8·(v−128) quantizes and reconstructs EXACTLY for
    * every byte value — the oracle-corpus property), modest AC
    * steps.
    */
  private[graft] val DefaultQuant: Array[Int] =
    Array.tabulate(64)(k => if (k == 0) 8 else 16)

  /** All-ones quant table: quantization error ≤ 0.5 per coefficient
    * — the error-bounded round-trip property table.
    */
  private[graft] val LosslessishQuant: Array[Int] = Array.fill(64)(1)

  // ----------------------------------------------------------------
  // canonical Huffman tables

  /** Canonical Huffman table from (BITS, HUFFVAL) — decode side
    * carries the T.81 F.16 MINCODE/MAXCODE/VALPTR arrays, encode
    * side the per-value (code, length) pair.
    */
  private[graft] final class Huff(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16, "JPEG DHT: BITS must have 16 entries")
    require(bits.sum == vals.length,
      s"JPEG DHT: BITS sums to ${bits.sum} but ${vals.length} values given")
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (l <- 1 to 16) {
      valPtr(l) = k
      minCode(l) = code
      code += bits(l - 1); k += bits(l - 1)
      maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
      require(code <= (1 << l),
        s"JPEG DHT: over-subscribed code space at length $l")
      code <<= 1
    }
    val values: Array[Int] = vals
    /** encode side: value -> (code, nbits) */
    val enc: Map[Int, (Int, Int)] = {
      var c = 0
      var i = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        var n = 0
        while (n < bits(l - 1)) {
          m += vals(i) -> ((c, l)); c += 1; i += 1; n += 1
        }
        c <<= 1
      }
      m.result()
    }
  }

  // ----------------------------------------------------------------
  // decoded form

  /** One decoded component plane at its NATURAL (subsampled)
    * resolution, cropped to ceil(W·h/hmax) × ceil(H·v/vmax).
    */
  case class Plane(id: Int, h: Int, v: Int, width: Int, height: Int,
      data: Array[Byte])

  /** A decoded image: `planes` in SOF order (Y first for JFIF). */
  case class Decoded(width: Int, height: Int, planes: Seq[Plane]) {
    /** The luma plane (first component) — the dedup-chain input. */
    def gray: Array[Byte] = planes.head.data
  }

  // ----------------------------------------------------------------
  // decoder

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("JPEG: " + msg)

  private def u16(b: Array[Byte], i: Int): Int = {
    if (i + 2 > b.length) fail(s"truncated stream at byte $i")
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  }

  /** Decode a JFIF/JPEG byte stream: baseline sequential (SOF0) and
    * progressive (SOF2, spectral selection + successive
    * approximation, T.81 Annex G), both with or without restart
    * intervals (DRI/RSTn). Refuses (loudly) everything else:
    * extended/arithmetic/lossless SOFn, 12-bit precision, sampling
    * factors outside {1,2}. Every marker/segment read is
    * bounds-checked so a truncated or garbage stream raises the
    * codec's documented IllegalArgumentException refusal, never a
    * raw ArrayIndexOutOfBoundsException; spec-legal 0xFF fill bytes
    * before a marker code (B.1.1.2) are skipped.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) fail("missing SOI marker")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var width = 0
    var height = 0
    // per component: (id, h, v, quantId)
    var comps: Array[(Int, Int, Int, Int)] = null
    var progressive = false
    var restartInt = 0
    // progressive: per-component quantized coefficients in zig-zag
    // order over the MCU-padded block grid, accumulated across scans
    var coefStore: Array[Array[Int]] = null
    var out: Decoded = null
    def need(n: Int): Unit =
      if (pos + n > bytes.length) fail(s"truncated stream at byte $pos")
    // a segment's declared end, validated against the buffer
    def segEnd(): Int = {
      val end = pos + u16(bytes, pos)
      if (end > bytes.length) fail(s"truncated segment at byte $pos")
      end
    }
    while (out == null) {
      need(2)
      if ((bytes(pos) & 0xff) != 0xff)
        fail(s"expected a marker at byte $pos, got 0x${
          (bytes(pos) & 0xff).toHexString}")
      // B.1.1.2: any number of 0xff fill bytes may precede the marker
      while ({ need(2); (bytes(pos + 1) & 0xff) == 0xff }) pos += 1
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => // stray SOI
          fail("unexpected SOI inside the stream")
        case 0xd9 =>
          if (coefStore != null)
            out = reconstructProgressive(width, height, comps,
              coefStore, quant)
          else fail("EOI before SOS — no image data")
        case 0x01 => () // TEM, parameterless
        case m if m >= 0xd0 && m <= 0xd7 =>
          fail(f"stray RST${m - 0xd0}%d between segments")
        case m if m >= 0xe0 && m <= 0xef => pos = segEnd() // APPn
        case 0xfe => pos = segEnd() // COM
        case 0xdb => // DQT
          val end = segEnd()
          var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (pq > 1) fail(s"DQT precision $pq unsupported")
            p += 1
            if (p + (if (pq == 0) 64 else 128) > end)
              fail("truncated DQT segment")
            val t = new Array[Int](64)
            for (k <- 0 until 64) {
              t(k) = if (pq == 0) bytes(p + k) & 0xff
                else u16(bytes, p + 2 * k)
            }
            p += (if (pq == 0) 64 else 128)
            quant(tq) = t
          }
          pos = end
        case 0xc4 => // DHT
          val end = segEnd()
          var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            p += 1
            if (p + 16 > end) fail("truncated DHT segment")
            val bits = Array.tabulate(16)(i => bytes(p + i) & 0xff)
            p += 16
            val n = bits.sum
            if (p + n > end) fail("truncated DHT segment")
            val vals = Array.tabulate(n)(i => bytes(p + i) & 0xff)
            p += n
            val h = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = h
            else if (tc == 1) acTabs(th) = h
            else fail(s"DHT class $tc unsupported")
          }
          pos = end
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          progressive = marker == 0xc2
          val end = segEnd()
          if (pos + 8 > end) fail("truncated SOF segment")
          val prec = bytes(pos + 2) & 0xff
          if (prec != 8) fail(s"$prec-bit precision unsupported " +
            "(baseline/progressive 8-bit only)")
          height = u16(bytes, pos + 3)
          width = u16(bytes, pos + 5)
          if (width == 0 || height == 0) fail("zero image dimension")
          val nc = bytes(pos + 7) & 0xff
          if (nc != 1 && nc != 3)
            fail(s"$nc components unsupported (1 or 3)")
          if (pos + 8 + 3 * nc > end) fail("truncated SOF segment")
          comps = Array.tabulate(nc) { i =>
            val b = pos + 8 + 3 * i
            val id = bytes(b) & 0xff
            val hs = (bytes(b + 1) & 0xff) >> 4
            val vs = bytes(b + 1) & 0x0f
            if (hs < 1 || hs > 2 || vs < 1 || vs > 2)
              fail(s"sampling factor ${hs}x$vs unsupported " +
                "(h,v must be 1 or 2)")
            (id, hs, vs, bytes(b + 2) & 0xff)
          }
          if (progressive) {
            val hMax = comps.map(_._2).max
            val vMax = comps.map(_._3).max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            coefStore = comps.map { c =>
              new Array[Int](mcusX * c._2 * mcusY * c._3 * 64)
            }
          }
          pos = end
        case 0xcc => fail("arithmetic conditioning (DAC) unsupported")
        case m if (m >= 0xc1 && m <= 0xcf) && m != 0xc4 && m != 0xc8 =>
          fail(f"SOF${m - 0xc0}%d is not baseline or progressive " +
            "Huffman (extended/arithmetic/lossless unsupported)")
        case 0xdd => // DRI
          val end = segEnd()
          if (pos + 4 > end) fail("truncated DRI segment")
          restartInt = u16(bytes, pos + 2)
          pos = end
        case 0xda => // SOS
          if (comps == null) fail("SOS before SOF")
          val end = segEnd()
          if (pos + 3 > end) fail("truncated SOS header")
          val ns = bytes(pos + 2) & 0xff
          if (end - pos != 6 + 2 * ns) fail("malformed SOS header")
          // scan component -> (component index, dcTab, acTab)
          val scanTabs = Array.tabulate(ns) { i =>
            val b = pos + 3 + 2 * i
            val cid = bytes(b) & 0xff
            val ci = comps.indexWhere(_._1 == cid)
            if (ci < 0) fail(s"SOS names unknown component $cid")
            (ci, (bytes(b + 1) & 0xff) >> 4, bytes(b + 1) & 0x0f)
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahal = bytes(pos + 5 + 2 * ns) & 0xff
          val ah = ahal >> 4
          val al = ahal & 0x0f
          pos = end
          if (!progressive) {
            if (ss != 0 || se != 63 || ah != 0 || al != 0)
              fail("baseline scan must cover band 0..63 with no " +
                "successive approximation")
            if (ns != comps.length)
              fail("baseline must be one interleaved scan of all " +
                "components")
            out = decodeScan(bytes, pos, width, height, comps,
              scanTabs, quant, dcTabs, acTabs, restartInt)
          } else {
            pos = progressiveScan(bytes, pos, width, height, comps,
              coefStore, scanTabs, ss, se, ah, al, dcTabs, acTabs,
              restartInt)
          }
        case m => fail(f"unsupported marker 0xff$m%02x")
      }
    }
    out
  }

  /** Entropy-coded-segment bit reader with B.1.1.5 byte unstuffing.
    * An unexpected marker mid-stream (including an RSTn that is NOT
    * at a declared restart boundary) is refused; declared boundaries
    * are consumed with [[expectRestart]].
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) fail("entropy stream truncated")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) fail("entropy stream truncated at 0xff")
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed
          else if (b2 >= 0xd0 && b2 <= 0xd7)
            fail("RSTn off the declared restart boundary")
          else fail(f"marker 0xff$b2%02x inside entropy stream " +
            "(truncated scan?)")
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** Consume the RSTm marker at a declared restart boundary:
      * discard the pad bits to the byte edge (B.2.1), require the
      * cycling marker index, and reset the bit state.
      */
    def expectRestart(m: Int): Unit = {
      nbits = 0
      if (pos + 2 > bytes.length) fail("truncated stream at restart")
      val b2 = bytes(pos + 1) & 0xff
      if ((bytes(pos) & 0xff) != 0xff || b2 != 0xd0 + m)
        fail(f"expected RST$m%d at byte $pos, got 0x${b2}%02x")
      pos += 2
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(h: Huff): Int = {
      if (h == null) fail("scan references an undefined Huffman table")
      var l = 1
      var code = nextBit()
      while (l <= 16 && (h.maxCode(l) < 0 || code > h.maxCode(l))) {
        code = (code << 1) | nextBit(); l += 1
      }
      if (l > 16) fail("invalid Huffman code in entropy stream")
      h.values(h.valPtr(l) + code - h.minCode(l))
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a V-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def decodeScan(bytes: Array[Byte], at: Int, width: Int,
      height: Int, comps: Array[(Int, Int, Int, Int)],
      scanTabs: Array[(Int, Int, Int)], quant: Array[Array[Int]],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInt: Int): Decoded = {
    val hMax = comps.map(_._2).max
    val vMax = comps.map(_._3).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // padded plane geometry per component
    val planeW = comps.map(c => mcusX * 8 * c._2)
    val planeH = comps.map(c => mcusY * 8 * c._3)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val pred = new Array[Int](comps.length)
    val br = new BitReader(bytes, at)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val px = Array.ofDim[Double](8, 8)
    var mcusDone = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // DRI: each restart interval ends with a byte-aligned RSTn
        // (cycling index) and resets the DC predictors (E.2.4)
        if (restartInt > 0 && mcusDone > 0 && mcusDone % restartInt == 0) {
          br.expectRestart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        var s = 0
        while (s < scanTabs.length) {
          val (ci, dcId, acId) = scanTabs(s)
          val (_, hs, vs, tq) = comps(ci)
          val q = quant(tq)
          if (q == null) fail(s"component $ci references undefined " +
            s"quant table $tq")
          var v = 0
          while (v < vs) {
            var h = 0
            while (h < hs) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = br.decodeHuff(dcTabs(dcId))
              if (t > 11) fail(s"DC category $t out of range")
              pred(ci) += extend(br.receive(t), t)
              coef(0) = pred(ci) * q(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decodeHuff(acTabs(acId))
                val r = rs >> 4
                val sz = rs & 15
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  if (k > 63) fail("AC run past coefficient 63")
                  coef(Zigzag(k)) = extend(br.receive(sz), sz) * q(k)
                  k += 1
                }
              }
              idctBlock(coef, tmp, px)
              // place block at (my*vs+v, mx*hs+h) in the plane
              val plane = planes(ci)
              val pw = planeW(ci)
              val bx0 = (mx * hs + h) * 8
              val by0 = (my * vs + v) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val p = math.round(px(y)(x)).toInt + 128
                  plane((by0 + y) * pw + bx0 + x) =
                    (if (p < 0) 0 else if (p > 255) 255 else p).toByte
                  x += 1
                }
                y += 1
              }
              h += 1
            }
            v += 1
          }
          s += 1
        }
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    cropPlanes(width, height, comps, planes, planeW, hMax, vMax)
  }

  /** Crop MCU-padded planes to each component's natural dims. */
  private def cropPlanes(width: Int, height: Int,
      comps: Array[(Int, Int, Int, Int)], planes: Array[Array[Byte]],
      planeW: Array[Int], hMax: Int, vMax: Int): Decoded = {
    val cropped = comps.indices.map { i =>
      val (id, hs, vs, _) = comps(i)
      val cw = (width * hs + hMax - 1) / hMax
      val ch = (height * vs + vMax - 1) / vMax
      val d = new Array[Byte](cw * ch)
      var y = 0
      while (y < ch) {
        System.arraycopy(planes(i), y * planeW(i), d, y * cw, cw)
        y += 1
      }
      Plane(id, hs, vs, cw, ch, d)
    }
    Decoded(width, height, cropped)
  }

  // ----------------------------------------------------------------
  // progressive (SOF2) scan decode — T.81 Annex G

  /** Decode one progressive scan into the per-component quantized
    * coefficient store (zig-zag order, MCU-padded block grid) and
    * return the stream position of the next marker. Implements all
    * four scan kinds of G.1.2: DC first / DC refinement (interleaved
    * or single-component) and AC first / AC refinement
    * (single-component only, as the spec requires), with EOB-run
    * accounting and restart intervals.
    */
  private def progressiveScan(bytes: Array[Byte], at: Int, width: Int,
      height: Int, comps: Array[(Int, Int, Int, Int)],
      store: Array[Array[Int]], scanTabs: Array[(Int, Int, Int)],
      ss: Int, se: Int, ah: Int, al: Int, dcTabs: Array[Huff],
      acTabs: Array[Huff], restartInt: Int): Int = {
    val hMax = comps.map(_._2).max
    val vMax = comps.map(_._3).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val br = new BitReader(bytes, at)
    val pred = new Array[Int](comps.length)
    var eobrun = 0
    var rstIdx = 0
    var unitsDone = 0
    def restartBoundary(): Unit =
      if (restartInt > 0 && unitsDone > 0 && unitsDone % restartInt == 0) {
        br.expectRestart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
    val isDc = ss == 0
    if (isDc) {
      if (se != 0) fail("progressive DC scan must have Se = 0")
    } else {
      if (scanTabs.length != 1)
        fail("progressive AC scan must be single-component")
      if (ss > se || se > 63) fail(s"bad spectral band $ss..$se")
    }
    if (ah != 0 && ah != al + 1)
      fail(s"successive approximation Ah=$ah Al=$al must step by one bit")

    // ---- per-block band decoders (blk = zig-zag coefficient array,
    // off = block offset in the store) ----
    def dcFirst(ci: Int, dcId: Int, blk: Array[Int], off: Int): Unit = {
      val t = br.decodeHuff(dcTabs(dcId))
      if (t > 11) fail(s"DC category $t out of range")
      pred(ci) += extend(br.receive(t), t)
      blk(off) = pred(ci) << al
    }
    def dcRefine(blk: Array[Int], off: Int): Unit = {
      // G.1.2.2: append the next lower magnitude bit; the first pass
      // stored an arithmetic-shifted value, so two's-complement OR is
      // exact for negative coefficients too
      if (br.receive(1) == 1) blk(off) |= 1 << al
    }
    def acFirst(acId: Int, blk: Array[Int], off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = br.decodeHuff(acTabs(acId))
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r < 15) { // EOBn: run of (1<<r)+bits end-of-band blocks
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            return
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) fail("AC run past the spectral band")
          blk(off + k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(acId: Int, blk: Array[Int], off: Int): Unit = {
      // G.1.2.3 correction-bit procedure: newly-significant
      // coefficients carry ±1<<al; every already-nonzero coefficient
      // crossed on the way emits one correction bit.
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var brk = false
        while (k <= se && !brk) {
          val rs = br.decodeHuff(acTabs(acId))
          var r = rs >> 4
          val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              brk = true // rest of the band is correction-only below
            }
            // r == 15: ZRL — skip 16 zero-history positions
          } else {
            if (s != 1) fail("AC refinement size must be 1")
            newval = if (br.receive(1) == 1) p1 else m1
          }
          if (!brk) {
            var placed = false
            while (k <= se && !placed) {
              val c = blk(off + k)
              if (c != 0) {
                if (br.receive(1) == 1 && (c & p1) == 0)
                  blk(off + k) = c + (if (c >= 0) p1 else m1)
                k += 1
              } else if (r == 0) {
                if (newval != 0) { blk(off + k) = newval; k += 1 }
                else k += 1 // ZRL's 16th zero slot
                placed = true
              } else { r -= 1; k += 1 }
            }
            // refuse loudly for BOTH unplaced kinds: a pending new
            // coefficient (s=1) AND a ZRL (r=15, s=0) whose 16
            // zero-history slots run past the band — the silent ZRL
            // exit would mis-decode a corrupt stream at the band edge
            if (!placed)
              fail("AC refinement ran past the spectral band")
          }
        }
      }
      if (eobrun > 0) {
        // end-of-band: correction bits only for surviving nonzeros
        while (k <= se) {
          val c = blk(off + k)
          if (c != 0 && br.receive(1) == 1 && (c & p1) == 0)
            blk(off + k) = c + (if (c >= 0) p1 else m1)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (scanTabs.length > 1) {
      // interleaved MCU walk — DC scans only (enforced above)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          restartBoundary()
          var s = 0
          while (s < scanTabs.length) {
            val (ci, dcId, _) = scanTabs(s)
            val (_, hs, vs, _) = comps(ci)
            val bw = mcusX * hs
            var v = 0
            while (v < vs) {
              var h = 0
              while (h < hs) {
                val off = (((my * vs + v) * bw) + mx * hs + h) * 64
                if (ah == 0) dcFirst(ci, dcId, store(ci), off)
                else dcRefine(store(ci), off)
                h += 1
              }
              v += 1
            }
            s += 1
          }
          unitsDone += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan: the block grid of the component's
      // NATURAL (non-MCU-padded) dims, G.1; the store keeps the
      // padded stride
      val (ci, dcId, acId) = scanTabs(0)
      val (_, hs, vs, _) = comps(ci)
      val cw = (width * hs + hMax - 1) / hMax
      val ch = (height * vs + vMax - 1) / vMax
      val nbW = (cw + 7) / 8
      val nbH = (ch + 7) / 8
      val stride = mcusX * hs
      var by = 0
      while (by < nbH) {
        var bx = 0
        while (bx < nbW) {
          restartBoundary()
          val off = (by * stride + bx) * 64
          if (isDc) {
            if (ah == 0) dcFirst(ci, dcId, store(ci), off)
            else dcRefine(store(ci), off)
          } else {
            if (ah == 0) acFirst(acId, store(ci), off)
            else acRefine(acId, store(ci), off)
          }
          unitsDone += 1
          bx += 1
        }
        by += 1
      }
    }
    // advance to the next marker: tolerate stuffed bytes, trailing
    // RSTn, and fill bytes left in the entropy segment
    var p = br.pos
    var found = -1
    while (found < 0) {
      if (p + 2 > bytes.length) fail("truncated stream after scan")
      if ((bytes(p) & 0xff) != 0xff) p += 1
      else {
        val b2 = bytes(p + 1) & 0xff
        if (b2 == 0x00) p += 2
        else if (b2 >= 0xd0 && b2 <= 0xd7) p += 2
        else if (b2 == 0xff) p += 1
        else found = p
      }
    }
    found
  }

  /** Dequantize + IDCT the accumulated progressive coefficient store
    * into planes, then crop — the final pass after EOI.
    */
  private def reconstructProgressive(width: Int, height: Int,
      comps: Array[(Int, Int, Int, Int)], store: Array[Array[Int]],
      quant: Array[Array[Int]]): Decoded = {
    val hMax = comps.map(_._2).max
    val vMax = comps.map(_._3).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcusX * 8 * c._2)
    val planeH = comps.map(c => mcusY * 8 * c._3)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val px = Array.ofDim[Double](8, 8)
    var i = 0
    while (i < comps.length) {
      val (_, hs, vs, tq) = comps(i)
      val q = quant(tq)
      if (q == null)
        fail(s"component $i references undefined quant table $tq")
      val bw = mcusX * hs
      val bh = mcusY * vs
      val plane = planes(i)
      val pw = planeW(i)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val off = (by * bw + bx) * 64
          var k = 0
          while (k < 64) {
            coef(Zigzag(k)) = store(i)(off + k) * q(k)
            k += 1
          }
          idctBlock(coef, tmp, px)
          val bx0 = bx * 8
          val by0 = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val p = math.round(px(y)(x)).toInt + 128
              plane((by0 + y) * pw + bx0 + x) =
                (if (p < 0) 0 else if (p > 255) 255 else p).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      i += 1
    }
    cropPlanes(width, height, comps, planes, planeW, hMax, vMax)
  }

  /** IDCT of a dequantized raster-order block into px (centered,
    * pre-level-shift): px = Cᵀ·F·C.
    */
  private def idctBlock(coef: Array[Int], tmp: Array[Array[Double]],
      px: Array[Array[Double]]): Unit = {
    // tmp = F·C   (tmp[u][x] = Σ_v F[u][v]·C[v][x])
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += coef(u * 8 + v) * C(v)(x); v += 1 }
        tmp(u)(x) = s
        x += 1
      }
      u += 1
    }
    // px = Cᵀ·tmp (px[y][x] = Σ_u C[u][y]·tmp[u][x])
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += C(uu)(y) * tmp(uu)(x); uu += 1 }
        px(y)(x) = s
        x += 1
      }
      y += 1
    }
  }

  /** JFIF YCbCr→RGB (T.871 §7): full-range, float coefficients,
    * rounded and clamped. `planes` must be full-resolution (call
    * [[upsample]] on subsampled chroma first). Returns packed RGB
    * (3 bytes per pixel).
    */
  def toRgb(y: Array[Byte], cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
    require(y.length == cb.length && y.length == cr.length,
      "JPEG toRgb: planes must be equal-size (upsample chroma first)")
    val out = new Array[Byte](y.length * 3)
    var i = 0
    while (i < y.length) {
      val yy = y(i) & 0xff
      val b = (cb(i) & 0xff) - 128
      val r = (cr(i) & 0xff) - 128
      def clamp(d: Double): Byte = {
        val v = math.round(d).toInt
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
      }
      out(3 * i) = clamp(yy + 1.402 * r)
      out(3 * i + 1) = clamp(yy - 0.344136 * b - 0.714136 * r)
      out(3 * i + 2) = clamp(yy + 1.772 * b)
      i += 1
    }
    out
  }

  /** Nearest-neighbor chroma upsample from (w,h) to (W,H) — the
    * JFIF default reconstruction for 4:2:0/4:2:2.
    */
  def upsample(data: Array[Byte], w: Int, h: Int, toW: Int,
      toH: Int): Array[Byte] = {
    val out = new Array[Byte](toW * toH)
    var y = 0
    while (y < toH) {
      val sy = math.min(y * h / toH, h - 1)
      var x = 0
      while (x < toW) {
        out(y * toW + x) = data(sy * w + math.min(x * w / toW, w - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  // ----------------------------------------------------------------
  // encoder

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // B.1.1.5 stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Array[Byte] = {
      if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits) // pad 1s
      out.toByteArray
    }
    /** Byte-align (1-padded) and emit RSTm — raw, never stuffed. */
    def restart(m: Int): Unit = {
      if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
      out.write(0xff); out.write(0xd0 + m)
    }
  }

  /** FDCT with explicit index discipline: F(u,v) =
    * Σy Σx C(v)(x)·C(u)(y)·f(y,x) — u the vertical frequency, v the
    * horizontal, matching [[idctBlock]]'s px(y)(x) = Σu Σv
    * C(u)(y)·C(v)(x)·F(u,v) and the coef(u*8+v) raster layout.
    */
  private def fdct(block: Array[Int]): Array[Double] = {
    val rowT = Array.ofDim[Double](8, 8) // rowT[y][v] = Σx f(y,x)C(v)(x)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * C(v)(x); x += 1 }
        rowT(y)(v) = s
        v += 1
      }
      y += 1
    }
    val f = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += C(u)(yy) * rowT(yy)(v); yy += 1 }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    f
  }

  /** Encode one component plane's block at (bx,by) (with edge
    * replication past the plane edge), returning quantized zig-zag
    * coefficients.
    */
  private def blockCoefs(plane: Array[Byte], w: Int, h: Int, bx: Int,
      by: Int, q: Array[Int]): Array[Int] = {
    val blk = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        blk(y * 8 + x) = (plane(sy * w + sx) & 0xff) - 128
        x += 1
      }
      y += 1
    }
    val f = fdct(blk)
    Array.tabulate(64)(k => math.round(f(Zigzag(k)) / q(k)).toInt)
  }

  private def writeDc(bw: BitWriter, dcv: Int, pred: Int,
      dc: Huff): Int = {
    val diff = dcv - pred
    val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
      math.abs(diff))
    val (c, l) = dc.enc.getOrElse(t, fail(s"DC category $t not in table"))
    bw.put(c, l)
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    dcv
  }

  /** AC band [1..63] run-length coding (F.2.2.2). The closing EOB
    * code doubles as EOBRUN=1 in a progressive AC scan, so the same
    * writer serves both profiles.
    */
  private def writeAcBand(bw: BitWriter, zz: Array[Int], ac: Huff): Unit = {
    var k = 1
    var run = 0
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val (zc, zl) = ac.enc(0xf0); bw.put(zc, zl); run -= 16
        }
        val sz = 32 - Integer.numberOfLeadingZeros(math.abs(v))
        val rs = (run << 4) | sz
        val (acC, acL) = ac.enc.getOrElse(rs,
          fail(s"AC run/size 0x${rs.toHexString} not in table"))
        bw.put(acC, acL)
        bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac.enc(0x00); bw.put(ec, el) }
  }

  private def writeBlock(bw: BitWriter, zz: Array[Int], pred: Int,
      dc: Huff, ac: Huff): Int = {
    val d = writeDc(bw, zz(0), pred, dc)
    writeAcBand(bw, zz, ac)
    d
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  private def dqtBody(id: Int, q: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](65)
    b(0) = id.toByte
    for (k <- 0 until 64) b(k + 1) = q(k).toByte
    b
  }

  private def dhtBody(tc: Int, th: Int, bits: Array[Int],
      vals: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](17 + vals.length)
    b(0) = ((tc << 4) | th).toByte
    for (i <- 0 until 16) b(i + 1) = bits(i).toByte
    for (i <- vals.indices) b(i + 17) = vals(i).toByte
    b
  }

  /** Encode a grayscale plane as baseline JFIF. `quant` defaults to
    * [[DefaultQuant]] (constant 8×8 blocks round-trip exactly).
    * `restartInterval` > 0 writes a DRI segment and byte-aligned
    * RSTn markers with predictor resets every that-many MCUs.
    */
  def encodeGray(pixels: Array[Byte], width: Int, height: Int,
      quant: Array[Int] = DefaultQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == width * height,
      s"JPEG encode: ${pixels.length} bytes is not ${width}x$height")
    require(quant.forall(q => q >= 1 && q <= 255),
      "JPEG encode: quant entries must be 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0)) // APP0 v1.1, no density, no thumb
    seg(out, 0xdb, dqtBody(0, quant))
    seg(out, 0xc0, Array[Byte](8,
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    seg(out, 0xc4, dhtBody(0, 0, StdDcLumaBits, StdDcLumaVals))
    seg(out, 0xc4, dhtBody(1, 0, StdAcLumaBits, StdAcLumaVals))
    if (restartInterval > 0)
      seg(out, 0xdd, Array[Byte](
        (restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val dc = new Huff(StdDcLumaBits, StdDcLumaVals)
    val ac = new Huff(StdAcLumaBits, StdAcLumaVals)
    val bw = new BitWriter
    val bxN = (width + 7) / 8
    val byN = (height + 7) / 8
    var pred = 0
    var done = 0
    var rstIdx = 0
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        if (restartInterval > 0 && done > 0 && done % restartInterval == 0) {
          bw.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          pred = 0
        }
        pred = writeBlock(bw,
          blockCoefs(pixels, width, height, bx, by, quant), pred, dc, ac)
        done += 1
        bx += 1
      }
      by += 1
    }
    val es = bw.flush()
    out.write(es, 0, es.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a grayscale plane as PROGRESSIVE JFIF (SOF2) by spectral
    * selection: one DC scan (Ss=Se=0) followed by one AC scan
    * (Ss=1, Se=63), no successive approximation. Same quantized
    * coefficients as [[encodeGray]], so the two profiles decode to
    * IDENTICAL pixels — the property the progressive round-trip
    * specs and the q197 mixed-profile crawl corpus pin.
    */
  def encodeGrayProgressive(pixels: Array[Byte], width: Int, height: Int,
      quant: Array[Int] = DefaultQuant): Array[Byte] = {
    require(pixels.length == width * height,
      s"JPEG encode: ${pixels.length} bytes is not ${width}x$height")
    require(quant.forall(q => q >= 1 && q <= 255),
      "JPEG encode: quant entries must be 1..255")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, dqtBody(0, quant))
    seg(out, 0xc2, Array[Byte](8,
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))
    seg(out, 0xc4, dhtBody(0, 0, StdDcLumaBits, StdDcLumaVals))
    seg(out, 0xc4, dhtBody(1, 0, StdAcLumaBits, StdAcLumaVals))
    val dc = new Huff(StdDcLumaBits, StdDcLumaVals)
    val ac = new Huff(StdAcLumaBits, StdAcLumaVals)
    val bxN = (width + 7) / 8
    val byN = (height + 7) / 8
    // the quantized blocks are shared by both scans
    val blocks = Array.tabulate(byN * bxN) { i =>
      blockCoefs(pixels, width, height, i % bxN, i / bxN, quant)
    }
    // scan 1: DC, band 0..0
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 0, 0, 0))
    val bwDc = new BitWriter
    var pred = 0
    blocks.foreach { zz => pred = writeDc(bwDc, zz(0), pred, dc) }
    val esDc = bwDc.flush()
    out.write(esDc, 0, esDc.length)
    // scan 2: AC, band 1..63 (EOB = EOBRUN of one block)
    seg(out, 0xda, Array[Byte](1, 1, 0x00, 1, 63, 0))
    val bwAc = new BitWriter
    blocks.foreach(zz => writeAcBand(bwAc, zz, ac))
    val esAc = bwAc.flush()
    out.write(esAc, 0, esAc.length)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Encode YCbCr 4:2:0 baseline JFIF: `y` at (width×height), `cb`
    * and `cr` at (ceil(w/2)×ceil(h/2)) — the caller supplies the
    * subsampled chroma (no hidden downsample filter). Luma uses
    * quant table 0 / Huffman 0, chroma table 1 / Huffman 1, the
    * Annex K layout.
    */
  def encode420(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
      width: Int, height: Int,
      quantLuma: Array[Int] = DefaultQuant,
      quantChroma: Array[Int] = DefaultQuant): Array[Byte] = {
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    require(y.length == width * height && cb.length == cw * ch &&
      cr.length == cw * ch,
      s"JPEG encode420: plane sizes must be ${width}x$height and " +
        s"${cw}x$ch")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, dqtBody(0, quantLuma))
    seg(out, 0xdb, dqtBody(1, quantChroma))
    seg(out, 0xc0, Array[Byte](8,
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(out, 0xc4, dhtBody(0, 0, StdDcLumaBits, StdDcLumaVals))
    seg(out, 0xc4, dhtBody(1, 0, StdAcLumaBits, StdAcLumaVals))
    seg(out, 0xc4, dhtBody(0, 1, StdDcChromaBits, StdDcChromaVals))
    seg(out, 0xc4, dhtBody(1, 1, StdAcChromaBits, StdAcChromaVals))
    seg(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcL = new Huff(StdDcLumaBits, StdDcLumaVals)
    val acL = new Huff(StdAcLumaBits, StdAcLumaVals)
    val dcC = new Huff(StdDcChromaBits, StdDcChromaVals)
    val acC = new Huff(StdAcChromaBits, StdAcChromaVals)
    val bw = new BitWriter
    val mcusX = (width + 15) / 16
    val mcusY = (height + 15) / 16
    var predY = 0
    var predCb = 0
    var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < 2) {
          var h = 0
          while (h < 2) {
            predY = writeBlock(bw, blockCoefs(y, width, height,
              mx * 2 + h, my * 2 + v, quantLuma), predY, dcL, acL)
            h += 1
          }
          v += 1
        }
        predCb = writeBlock(bw,
          blockCoefs(cb, cw, ch, mx, my, quantChroma), predCb, dcC, acC)
        predCr = writeBlock(bw,
          blockCoefs(cr, cw, ch, mx, my, quantChroma), predCr, dcC, acC)
        mx += 1
      }
      my += 1
    }
    val es = bw.flush()
    out.write(es, 0, es.length)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
