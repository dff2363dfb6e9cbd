package graft

import graft.sources.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec certification — three independent sides so
  * encoder/decoder bugs cannot cancel:
  *   1. hand-assembled golden streams (markers + hand-computed
  *      Huffman bit strings) pin the DECODER alone;
  *   2. the JDK's ImageIO JPEG codec (an independent, foreign
  *      implementation) decodes THIS encoder's output and this
  *      decoder reads ImageIO's output — the external-golden role
  *      the JP2 suite has been blocked on since round 8, available
  *      here because baseline JPEG ships in the standard library;
  *   3. algebraic properties: constant-block mosaics round-trip
  *      BIT-EXACTLY (the q186/q187 oracle device), arbitrary
  *      content is error-bounded under the all-ones quant table.
  * Plus loud refusal of everything outside the baseline profile.
  */
class JpegSpec extends AnyFunSuite {

  // ---- 1. hand-assembled goldens (decoder only) -------------------

  /** Minimal grayscale JPEG built byte-by-byte with a custom 1-entry
    * Huffman code space — completely independent of the encoder.
    */
  private def handStream(dcBits: Array[Int], dcVals: Array[Int],
      w: Int, h: Int, entropy: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def seg(m: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // DQT id 0: DC step 8, AC step 16 (zig-zag order)
    seg(0xdb, 0 +: Array.tabulate(64)(k => if (k == 0) 8 else 16))
    // SOF0: 8-bit, h, w, 1 component id=1 sampling 1x1 quant 0
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    // DHT DC table 0 (custom), AC table 0: single length-1 code for
    // EOB (value 0x00)
    seg(0xc4, (0x00 +: dcBits) ++ dcVals)
    seg(0xc4, (0x10 +: Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0)) ++ Array(0x00))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    out.write(entropy, 0, entropy.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  test("golden 1: single 8x8 block, hand-coded DC diff 2 -> constant " +
      "130 plane") {
    // DC table: one code of length 2 ("00") for category 2.
    // Bits: DC "00", diff bits "10" (=2), AC EOB "0";
    // padded: 00100 111 -> 0x27. DC=2, dequant 16, IDCT -> 2, +128.
    val jpg = handStream(Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0), Array(2), 8, 8, Array(0x27.toByte))
    val d = Jpeg.decode(jpg)
    assert(d.width == 8 && d.height == 8)
    assert(d.gray.forall(b => (b & 0xff) == 130))
  }

  test("golden 2: two blocks pin DC PREDICTION (130 then 134) and " +
      "the category-3 code path") {
    // DC table: codes "00"->cat2, "01"->cat3 (two length-2 codes).
    // blk1: "00"+"10"+EOB"0"; blk2: "01"+"100"(diff=4)+EOB"0"
    // bits: 00100 011000 -> 00100011 000 + pad 11111 ->
    //   00100011 00011111 = 0x23 0x1F
    val jpg = handStream(Array(0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0), Array(2, 3), 16, 8,
      Array(0x23.toByte, 0x1f.toByte))
    val d = Jpeg.decode(jpg)
    assert(d.width == 16 && d.height == 8)
    val px = d.gray.map(_ & 0xff)
    for (y <- 0 until 8; x <- 0 until 16)
      assert(px(y * 16 + x) == (if (x < 8) 130 else 134),
        s"pixel ($x,$y)")
  }

  test("golden 3: an AC coefficient through the hand stream " +
      "(run/size decode + zig-zag placement + EXTEND)") {
    // AC table now has two codes: len-1 "0" = EOB, len-2 "10" =
    // rs 0x01 (run 0, size 1). Stream: DC "00"+"10" (cat2, diff 2),
    // AC "10"+"1" (coef k=1 -> zigzag (0,1), value +1), EOB "0".
    // bits: 0010 101 0 -> 00101010 = 0x2A.
    // Dequant: DC 16, AC(0,1) 16. IDCT: px(y,x) = 2 + 16·C1(x)/ (2·√2)
    //   = 2 + (16/(2·sqrt 2))·cos((2x+1)π/16)·... computed below with
    // the same public formula (independent arithmetic, no codec code).
    val out = new java.io.ByteArrayOutputStream()
    def seg(m: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(m)
      out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8)
    seg(0xdb, 0 +: Array.tabulate(64)(k => if (k == 0) 8 else 16))
    seg(0xc0, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xc4, (0x00 +: Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0)) ++ Array(2))
    seg(0xc4, (0x10 +: Array(1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0)) ++ Array(0x00, 0x01))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    out.write(0x2a)
    out.write(0xff); out.write(0xd9)
    val d = Jpeg.decode(out.toByteArray)
    val px = d.gray.map(_ & 0xff)
    for (y <- 0 until 8; x <- 0 until 8) {
      // F(0,0)=16, F(0,1)=16: px(y,x) = 16·C(0)(y)·C(0)(x)
      //   + 16·C(0)(y)·C(1)(x), C(0)(·) = 1/(2√2),
      //   C(1)(x) = cos((2x+1)π/16)/2 — independent arithmetic, no
      // codec code (no value lands near a .5 rounding boundary).
      val c1 = math.cos((2 * x + 1) * math.Pi / 16.0) / 2.0
      val expect = math.round(2.0 + 16.0 / (2.0 * math.sqrt(2.0)) * c1)
        .toInt + 128
      assert(px(y * 8 + x) == expect, s"pixel ($x,$y) expect $expect")
    }
  }

  // ---- 2. ImageIO cross-validation (foreign implementation) -------

  private def imageIOGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = Array.tabulate(w * h)(i =>
      img.getRaster.getSample(i % w, i / w, 0))
    (w, h, px)
  }

  test("cross 1: ImageIO decodes THIS encoder's grayscale output " +
      "bit-exactly on a constant-block mosaic") {
    val (w, h) = (24, 16)
    val px = Array.tabulate(w * h) { i =>
      val (bx, by) = ((i % w) / 8, (i / w) / 8)
      (40 * by + 13 * bx + 37).toByte
    }
    val (gw, gh, got) = imageIOGray(Jpeg.encodeGray(px, w, h))
    assert(gw == w && gh == h)
    assert(got.toSeq == px.map(_ & 0xff).toSeq,
      "foreign decoder disagrees with this encoder")
  }

  test("cross 2: ImageIO decodes this encoder's output within the " +
      "quant error bound on ARBITRARY content (all-ones quant)") {
    val rnd = new scala.util.Random(42)
    val (w, h) = (40, 24)
    val px = Array.tabulate(w * h)(i =>
      (rnd.nextInt(200) + 28).toByte)
    val enc = Jpeg.encodeGray(px, w, h, Jpeg.LosslessishQuant)
    val (_, _, got) = imageIOGray(enc)
    val mine = Jpeg.decode(enc).gray.map(_ & 0xff)
    // foreign and own decode agree with each other within IDCT
    // rounding (±1) and with the source within the quant bound
    got.indices.foreach { i =>
      assert(math.abs(got(i) - mine(i)) <= 1, s"decoders differ at $i")
      assert(math.abs(mine(i) - (px(i) & 0xff)) <= 4,
        s"round-trip error too large at $i")
    }
  }

  test("cross 3: THIS decoder reads ImageIO's encoder output " +
      "(foreign encoder) and agrees with ImageIO's own decode") {
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0,
        (math.sin(x / 5.0) * 60 + math.cos(y / 3.0) * 40 + 128).toInt
          .max(0).min(255))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos))
    val foreign = bos.toByteArray
    val mine = Jpeg.decode(foreign)
    assert(mine.width == w && mine.height == h)
    val (_, _, ref) = imageIOGray(foreign)
    val got = mine.gray.map(_ & 0xff)
    var maxd = 0
    got.indices.foreach(i => maxd = maxd.max(math.abs(got(i) - ref(i))))
    // T.83 lets conforming IDCTs differ by ±1 each -> ±2 between two
    assert(maxd <= 2, s"decoder disagrees with ImageIO by $maxd")
    assert(rnd != null)
  }

  test("cross 4: this decoder reads ImageIO's COLOR (4:2:0 or " +
      "4:4:4) output and the luma plane matches ImageIO's decode") {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos))
    val mine = Jpeg.decode(bos.toByteArray)
    assert(mine.width == w && mine.height == h)
    assert(mine.planes.length == 3)
    // reconstruct RGB via the shared JFIF math and compare to
    // ImageIO's own RGB decode within the resampling tolerance
    val y0 = mine.planes(0)
    val cbP = mine.planes(1)
    val crP = mine.planes(2)
    val cbU = Jpeg.upsample(cbP.data, cbP.width, cbP.height, w, h)
    val crU = Jpeg.upsample(crP.data, crP.width, crP.height, w, h)
    val rgb = Jpeg.toRgb(y0.data, cbU, crU)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    var maxd = 0
    for (yy <- 1 until h - 1; xx <- 1 until w - 1) { // interior: avoid
      // edge-resampling differences between upsample kernels
      val p = ref.getRGB(xx, yy)
      val i = yy * w + xx
      maxd = maxd.max(math.abs(((p >> 16) & 0xff) - (rgb(3 * i) & 0xff)))
        .max(math.abs(((p >> 8) & 0xff) - (rgb(3 * i + 1) & 0xff)))
        .max(math.abs((p & 0xff) - (rgb(3 * i + 2) & 0xff)))
    }
    assert(maxd <= 16, s"color reconstruction off by $maxd")
  }

  test("cross 5: ImageIO reads this encoder's 4:2:0 COLOR output " +
      "and the constant-chroma mosaic survives bit-exactly") {
    val (w, h) = (32, 16)
    val y = Array.tabulate(w * h) { i =>
      (((i % w) / 8) * 20 + ((i / w) / 8) * 30 + 60).toByte
    }
    val cw = w / 2
    val chh = h / 2
    val cb = Array.fill(cw * chh)(110.toByte)
    val cr = Array.fill(cw * chh)(140.toByte)
    val enc = Jpeg.encode420(y, cb, cr, w, h)
    // own decode: planes exact
    val own = Jpeg.decode(enc)
    assert(own.planes(0).data.toSeq == y.toSeq, "luma plane round trip")
    assert(own.planes(1).data.forall(b => (b & 0xff) == 110))
    assert(own.planes(2).data.forall(b => (b & 0xff) == 140))
    // foreign decode: RGB = JFIF formula of the exact (Y,Cb,Cr)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(enc))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    val rgb = Jpeg.toRgb(y,
      Jpeg.upsample(cb, cw, chh, w, h), Jpeg.upsample(cr, cw, chh, w, h))
    var maxd = 0
    for (yy <- 0 until h; xx <- 0 until w) {
      val p = ref.getRGB(xx, yy)
      val i = yy * w + xx
      maxd = maxd.max(math.abs(((p >> 16) & 0xff) - (rgb(3 * i) & 0xff)))
        .max(math.abs(((p >> 8) & 0xff) - (rgb(3 * i + 1) & 0xff)))
        .max(math.abs((p & 0xff) - (rgb(3 * i + 2) & 0xff)))
    }
    assert(maxd <= 3, s"foreign color decode off by $maxd")
  }

  // ---- 3. properties ---------------------------------------------

  test("property: constant-block grayscale mosaics round-trip " +
      "BIT-EXACTLY across shapes, incl. non-multiple-of-8 dims") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 8) {
      val w = 8 + rnd.nextInt(60)
      val h = 8 + rnd.nextInt(40)
      val bv = Array.fill((h + 7) / 8, (w + 7) / 8)(rnd.nextInt(256))
      val px = Array.tabulate(w * h)(i =>
        bv((i / w) / 8)((i % w) / 8).toByte)
      val back = Jpeg.decode(Jpeg.encodeGray(px, w, h))
      assert(back.width == w && back.height == h)
      assert(back.gray.toSeq == px.toSeq, s"${w}x$h mosaic")
    }
  }

  test("property: constant-block 4:2:0 color mosaics round-trip " +
      "bit-exactly; chroma planes come back at ceil-half dims") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 5) {
      val w = 16 + rnd.nextInt(33) // odd widths too
      val h = 16 + rnd.nextInt(17)
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      val y = {
        val bv = Array.fill((h + 7) / 8, (w + 7) / 8)(rnd.nextInt(256))
        Array.tabulate(w * h)(i => bv((i / w) / 8)((i % w) / 8).toByte)
      }
      val cbv = rnd.nextInt(256).toByte
      val crv = rnd.nextInt(256).toByte
      val back = Jpeg.decode(Jpeg.encode420(y,
        Array.fill(cw * ch)(cbv), Array.fill(cw * ch)(crv), w, h))
      assert(back.planes(0).width == w && back.planes(0).height == h)
      assert(back.planes(1).width == cw && back.planes(1).height == ch)
      assert(back.planes(0).data.toSeq == y.toSeq)
      assert(back.planes(1).data.forall(_ == cbv))
      assert(back.planes(2).data.forall(_ == crv))
    }
  }

  test("property: arbitrary content under the all-ones quant table " +
      "is error-bounded (and the entropy stream exercises stuffing)") {
    val rnd = new scala.util.Random(5150)
    val (w, h) = (64, 48)
    val px = Array.tabulate(w * h)(_ => rnd.nextInt(256).toByte)
    val enc = Jpeg.encodeGray(px, w, h, Jpeg.LosslessishQuant)
    val back = Jpeg.decode(enc).gray
    var maxd = 0
    px.indices.foreach(i =>
      maxd = maxd.max(math.abs((px(i) & 0xff) - (back(i) & 0xff))))
    assert(maxd <= 4, s"quant-1 round-trip error $maxd")
    // white-noise content at quant 1 makes 0xff bytes in the entropy
    // stream statistically certain; verify stuffing actually fired
    val sosAt = {
      var i = 2
      while (!((enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda))
        i += 2 + (((enc(i + 2) & 0xff) << 8) | (enc(i + 3) & 0xff))
      i
    }
    val stuffed = (sosAt until enc.length - 2).exists(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0x00)
    assert(stuffed, "expected at least one stuffed 0xff00 pair")
  }

  // ---- 4. progressive (SOF2) --------------------------------------

  test("progressive: spectral-selection encode decodes to the SAME " +
      "pixels as the baseline profile (identical coefficients)") {
    val rnd = new scala.util.Random(777)
    for (_ <- 1 to 4) {
      val w = 8 + rnd.nextInt(50)
      val h = 8 + rnd.nextInt(40)
      val px = Array.tabulate(w * h)(_ => rnd.nextInt(256).toByte)
      val base = Jpeg.decode(Jpeg.encodeGray(px, w, h))
      val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(px, w, h))
      assert(prog.width == w && prog.height == h)
      assert(prog.gray.toSeq == base.gray.toSeq, s"${w}x$h")
    }
  }

  test("progressive cross 1: ImageIO (foreign) decodes THIS " +
      "encoder's progressive output within the IDCT tolerance") {
    val rnd = new scala.util.Random(31)
    val (w, h) = (41, 23)
    val px = Array.tabulate(w * h)(i =>
      ((i % w) * 3 + (i / w) * 5 + rnd.nextInt(8)).toByte)
    val enc = Jpeg.encodeGrayProgressive(px, w, h)
    // the stream really is SOF2
    assert((2 until enc.length - 1).exists(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc2))
    val (gw, gh, got) = imageIOGray(enc)
    assert(gw == w && gh == h)
    val mine = Jpeg.decode(enc).gray.map(_ & 0xff)
    mine.indices.foreach(i =>
      assert(math.abs(got(i) - mine(i)) <= 1, s"decoders differ at $i"))
  }

  test("progressive cross 2: this decoder reads ImageIO's OWN " +
      "progressive output (successive approximation script) and " +
      "agrees with ImageIO's decode") {
    val rnd = new scala.util.Random(4242)
    val (w, h) = (50, 34)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 4 + y * 2 + rnd.nextInt(16)) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.flush(); writer.dispose()
    val enc = bos.toByteArray
    // the foreign writer really produced SOF2 with a multi-scan
    // (successive approximation) script — this is what exercises the
    // DC/AC refinement paths against a foreign encoder
    assert((2 until enc.length - 1).exists(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xc2),
      "ImageIO did not write a progressive stream")
    val nScans = (2 until enc.length - 1).count(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda)
    assert(nScans >= 3, s"expected a multi-scan script, got $nScans")
    val mine = Jpeg.decode(enc)
    assert(mine.width == w && mine.height == h)
    val my = mine.gray.map(_ & 0xff)
    val (gw, gh, ref) = imageIOGray(enc)
    assert(gw == w && gh == h)
    var maxd = 0
    my.indices.foreach(i => maxd = maxd.max(math.abs(my(i) - ref(i))))
    assert(maxd <= 2, s"progressive decode disagrees with ImageIO by $maxd")
  }

  // ---- 5. restart intervals (DRI/RSTn) ----------------------------

  test("DRI: restart markers + predictor resets decode bit-exactly " +
      "and ImageIO agrees on the same stream") {
    val rnd = new scala.util.Random(808)
    val (w, h) = (48, 24) // 6x3 = 18 MCUs
    val bv = Array.fill(3, 6)(rnd.nextInt(256))
    val px = Array.tabulate(w * h)(i => bv((i / w) / 8)((i % w) / 8).toByte)
    val plain = Jpeg.encodeGray(px, w, h)
    for (ri <- Seq(1, 4, 7)) {
      val dri = Jpeg.encodeGray(px, w, h, restartInterval = ri)
      // the stream carries RST markers and a DRI segment
      assert((2 until dri.length - 1).exists(i =>
        (dri(i) & 0xff) == 0xff && (dri(i + 1) & 0xff) == 0xdd))
      assert((2 until dri.length - 1).exists(i =>
        (dri(i) & 0xff) == 0xff &&
          (dri(i + 1) & 0xff) >= 0xd0 && (dri(i + 1) & 0xff) <= 0xd7))
      val got = Jpeg.decode(dri)
      assert(got.gray.toSeq == Jpeg.decode(plain).gray.toSeq, s"ri=$ri")
      assert(got.gray.toSeq == px.toSeq, s"ri=$ri vs source mosaic")
      // foreign decoder agrees on the restart-marker stream
      val (gw, gh, ref) = imageIOGray(dri)
      assert(gw == w && gh == h)
      got.gray.indices.foreach(i =>
        assert(math.abs((got.gray(i) & 0xff) - ref(i)) <= 1, s"ri=$ri at $i"))
    }
  }

  // ---- refusals + robustness --------------------------------------

  test("refusals: 12-bit, truncation, bad sampling, arithmetic " +
      "coding — all loud and descriptive") {
    val px = Array.fill(64)(100.toByte)
    val good = Jpeg.encodeGray(px, 8, 8)

    def mutate(find: Array[Byte] => Int, patch: (Array[Byte], Int) => Unit)
        : Array[Byte] = {
      val b = good.clone()
      patch(b, find(b)); b
    }
    def markerAt(b: Array[Byte], m: Int): Int = {
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m))
        i += 2 + (((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff))
      i
    }
    // SOF0 -> SOF2 with a full-band baseline scan is NOT a legal
    // progressive scan — still refused loudly
    val prog = mutate(markerAt(_, 0xc0), (b, i) => b(i + 1) = 0xc2.toByte)
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("DC scan must have Se = 0"))
    // 12-bit precision
    val deep = mutate(markerAt(_, 0xc0), (b, i) => b(i + 4) = 12.toByte)
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(deep))
    assert(e2.getMessage.contains("12-bit"))
    // sampling factor 3
    val samp = mutate(markerAt(_, 0xc0), (b, i) => b(i + 11) = 0x31.toByte)
    val e3 = intercept[IllegalArgumentException](Jpeg.decode(samp))
    assert(e3.getMessage.contains("sampling factor"))
    // truncated entropy stream
    val e4 = intercept[IllegalArgumentException](
      Jpeg.decode(good.take(good.length - 6)))
    assert(e4.getMessage.contains("truncated") ||
      e4.getMessage.contains("marker"))
    // SOF9 (extended sequential, arithmetic)
    val arith = mutate(markerAt(_, 0xc0), (b, i) => b(i + 1) = 0xc9.toByte)
    val e6 = intercept[IllegalArgumentException](Jpeg.decode(arith))
    assert(e6.getMessage.contains("not baseline"))
    // no SOI
    val e7 = intercept[IllegalArgumentException](
      Jpeg.decode("not a jpeg at all".getBytes("UTF-8")))
    assert(e7.getMessage.contains("SOI"))
  }

  test("robustness: EVERY truncation of valid baseline and " +
      "progressive streams refuses with the codec's exception, " +
      "never a raw JVM error") {
    val rnd = new scala.util.Random(2026)
    val px = Array.tabulate(24 * 16)(_ => rnd.nextInt(256).toByte)
    for (stream <- Seq(Jpeg.encodeGray(px, 24, 16),
        Jpeg.encodeGrayProgressive(px, 24, 16),
        Jpeg.encodeGray(px, 24, 16, restartInterval = 2))) {
      for (n <- 0 until stream.length) {
        try { Jpeg.decode(stream.take(n)); () }
        catch {
          case _: IllegalArgumentException => () // the documented refusal
          case e: Throwable =>
            fail(s"prefix $n/${stream.length} leaked ${e.getClass.getName}")
        }
      }
    }
  }

  test("robustness: spec-legal 0xFF fill bytes before markers " +
      "(B.1.1.2) are accepted") {
    val px = Array.tabulate(64)(i => (i * 3).toByte)
    val good = Jpeg.encodeGray(px, 8, 8)
    // insert two fill bytes before every marker segment (scan the
    // header region only — entropy-internal 0xff are data)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    var i = 2
    var inEntropy = false
    while (i < good.length) {
      if (!inEntropy && (good(i) & 0xff) == 0xff &&
          (good(i + 1) & 0xff) != 0x00) {
        out.write(0xff); out.write(0xff) // fill bytes
        out.write(good(i)); out.write(good(i + 1))
        if ((good(i + 1) & 0xff) == 0xda) inEntropy = true
        i += 2
      } else { out.write(good(i)); i += 1 }
    }
    val d = Jpeg.decode(out.toByteArray)
    assert(d.gray.toSeq == Jpeg.decode(good).gray.toSeq)
  }
}
