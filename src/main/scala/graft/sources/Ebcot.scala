package graft.sources

/** EBCOT tier-1: code-block bit-plane coding (ITU-T T.800 Annex D) —
  * the stage between the packet parse (tier-2, [[Jp2]]) and the
  * inverse DWT ([[Wavelet53]]). Decoder only in the library (the
  * reference never writes JP2); the matching encoder lives in the
  * test fixture (Jp2Fixture) where it generates golden codestreams
  * for the bit-exact round-trip proof.
  *
  * Scope = the default coding style (Scb = 0): no selective bypass,
  * no reset/termination per pass, not vertically causal, single MQ
  * codeword segment per code-block. Context model: 9 zero-coding +
  * 5 sign + 3 magnitude-refinement + run-length + UNIFORM = 19
  * contexts (Tables D.1-D.4), initial states per Table D.7.
  */
object Ebcot {

  // context indices
  private[graft] val CxZc = 0 // ..8
  private[graft] val CxSc = 9 // ..13
  private[graft] val CxMr = 14 // ..16
  private[graft] val CxRl = 17
  private[graft] val CxUni = 18
  private[graft] val NCx = 19

  /** Fresh context bank with Table D.7 initial states: zero-coding
    * context 0 → 4, run-length → 3, UNIFORM → 46, rest 0.
    */
  private[graft] def freshContexts(): Mq.Contexts = {
    val cx = new Mq.Contexts(NCx)
    cx.set(CxZc, 4)
    cx.set(CxRl, 3)
    cx.set(CxUni, 46)
    cx
  }

  /** Zero-coding context (Table D.1) from neighbor significance sums.
    * `band`: 0=LL 1=HL 2=LH 3=HH. LL/LH read (h,v) as-is, HL swaps
    * them (its energy is horizontally high-pass), HH is
    * diagonal-primary.
    */
  private[graft] def zcContext(band: Int, h0: Int, v0: Int, d: Int): Int = {
    val (h, v) = if (band == 1) (v0, h0) else (h0, v0)
    if (band == 3) {
      val hv = h + v
      if (d >= 3) 8
      else if (d == 2) { if (hv >= 1) 7 else 6 }
      else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4
        else if (v == 1) 3
        else if (d >= 2) 2
        else if (d == 1) 1
        else 0
      }
    }
  }

  /** Sign-coding context + XOR bit (Tables D.2-D.3). `hc`/`vc` are
    * the clamped [-1,1] neighbor sign contributions.
    */
  private[graft] def scContext(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1) => (CxSc + 4, 0)
    case (1, 0) => (CxSc + 3, 0)
    case (1, -1) => (CxSc + 2, 0)
    case (0, 1) => (CxSc + 1, 0)
    case (0, 0) => (CxSc, 0)
    case (0, -1) => (CxSc + 1, 1)
    case (-1, 1) => (CxSc + 2, 1)
    case (-1, 0) => (CxSc + 3, 1)
    case (-1, -1) => (CxSc + 4, 1)
    case _ => throw new IllegalArgumentException(s"($hc,$vc)")
  }

  /** Mutable per-block coding state shared by decode (here) and the
    * fixture encoder: magnitudes, significance, signs (1 = negative),
    * the per-plane visited flag (pi) and the refined flag.
    */
  private[graft] final class Block(val w: Int, val h: Int, val band: Int) {
    val v = new Array[Int](w * h)
    val sig = new Array[Boolean](w * h)
    val neg = new Array[Boolean](w * h)
    val visited = new Array[Boolean](w * h)
    val refined = new Array[Boolean](w * h)

    private def sigAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else if (sig(y * w + x)) 1 else 0

    def neighborSums(x: Int, y: Int): (Int, Int, Int) = (
      sigAt(x - 1, y) + sigAt(x + 1, y),
      sigAt(x, y - 1) + sigAt(x, y + 1),
      sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) +
        sigAt(x - 1, y + 1) + sigAt(x + 1, y + 1))

    def zcCx(x: Int, y: Int): Int = {
      val (hh, vv, dd) = neighborSums(x, y)
      CxZc + zcContext(band, hh, vv, dd)
    }

    private def signContrib(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h || !sig(y * w + x)) 0
      else if (neg(y * w + x)) -1 else 1

    def scCx(x: Int, y: Int): (Int, Int) = {
      val clamp = (s: Int) => math.max(-1, math.min(1, s))
      scContext(
        clamp(signContrib(x - 1, y) + signContrib(x + 1, y)),
        clamp(signContrib(x, y - 1) + signContrib(x, y + 1)))
    }

    def mrCx(x: Int, y: Int): Int = {
      val i = y * w + x
      if (refined(i)) CxMr + 2
      else {
        val (hh, vv, dd) = neighborSums(x, y)
        if (hh + vv + dd > 0) CxMr + 1 else CxMr
      }
    }

    /** Column starts a full 4-row stripe usable for run-length mode? */
    def rlEligible(x: Int, y0: Int): Boolean =
      y0 + 3 < h && (0 until 4).forall { k =>
        val i = (y0 + k) * w + x
        !sig(i) && !visited(i) && zcCx(x, y0 + k) == CxZc
      }

    /** Signed coefficients after all passes. */
    def coefficients: Array[Int] = {
      val out = new Array[Int](w * h)
      var i = 0
      while (i < out.length) {
        out(i) = if (!sig(i)) 0 else if (neg(i)) -v(i) else v(i)
        i += 1
      }
      out
    }
  }

  /** Iterate the tier-1 scan order: stripes of 4 rows, columns
    * left-to-right within a stripe, rows top-to-bottom within a
    * column. `f(x, y, stripeTop)`.
    */
  private[graft] def scan(w: Int, h: Int)(f: (Int, Int, Int) => Unit): Unit = {
    var y0 = 0
    while (y0 < h) {
      var x = 0
      while (x < w) {
        var y = y0
        val yEnd = math.min(y0 + 4, h)
        while (y < yEnd) { f(x, y, y0); y += 1 }
        x += 1
      }
      y0 += 4
    }
  }

  /** Decode one code-block: `numPasses` coding passes over bit-planes
    * `msbPlane` down, first pass a cleanup pass (D.4). Returns signed
    * coefficients in row-major order.
    */
  def decodeBlock(data: Array[Byte], from: Int, until: Int,
      w: Int, h: Int, band: Int, numPasses: Int, msbPlane: Int): Array[Int] = {
    // msbPlane < 0 means the packet header claimed more zero bit-planes
    // than Mb-1 — a corrupt header; returning an all-zero block would
    // hide it, so refuse loudly (fail-loudly contract of the module).
    require(msbPlane >= 0,
      s"EBCOT: msbPlane=$msbPlane < 0 (zeroBitplanes exceeds Mb-1 — " +
        "corrupt tier-2 packet header)")
    val mq = new Mq.Decoder(data, from, until)
    val cx = freshContexts()
    val blk = new Block(w, h, band)
    var pass = 0
    var plane = msbPlane
    var passType = 2
    while (pass < numPasses && plane >= 0) {
      passType match {
        case 0 => sigPropDec(mq, cx, blk, plane)
        case 1 => magRefDec(mq, cx, blk, plane)
        case 2 => cleanupDec(mq, cx, blk, plane)
      }
      pass += 1
      if (passType == 2) {
        plane -= 1; passType = 0
        java.util.Arrays.fill(blk.visited, false)
      } else passType += 1
    }
    // If the plane counter hit -1 before all claimed passes ran, the
    // header's numPasses exceeds the available bit-planes — a silent
    // truncation would return partially-decoded coefficients.
    require(pass == numPasses,
      s"EBCOT: header claims $numPasses passes but only $pass fit in " +
        s"${msbPlane + 1} bit-planes (corrupt tier-2 packet header)")
    blk.coefficients
  }

  private def decodeSign(mq: Mq.Decoder, cx: Mq.Contexts, blk: Block,
      x: Int, y: Int): Unit = {
    val (sc, xor) = blk.scCx(x, y)
    blk.neg(y * blk.w + x) = (mq.decode(cx, sc) ^ xor) == 1
  }

  private def sigPropDec(mq: Mq.Decoder, cx: Mq.Contexts, blk: Block,
      plane: Int): Unit =
    scan(blk.w, blk.h) { (x, y, _) =>
      val i = y * blk.w + x
      if (!blk.sig(i)) {
        val zc = blk.zcCx(x, y)
        if (zc != CxZc) { // has a significant neighbor
          blk.visited(i) = true
          if (mq.decode(cx, zc) == 1) {
            blk.sig(i) = true
            blk.v(i) |= 1 << plane
            decodeSign(mq, cx, blk, x, y)
          }
        }
      }
    }

  private def magRefDec(mq: Mq.Decoder, cx: Mq.Contexts, blk: Block,
      plane: Int): Unit =
    scan(blk.w, blk.h) { (x, y, _) =>
      val i = y * blk.w + x
      if (blk.sig(i) && !blk.visited(i)) {
        val bit = mq.decode(cx, blk.mrCx(x, y))
        blk.refined(i) = true
        blk.v(i) |= bit << plane
      }
    }

  private def cleanupDec(mq: Mq.Decoder, cx: Mq.Contexts, blk: Block,
      plane: Int): Unit = {
    var skipUntilY = -1
    var skipX = -1
    scan(blk.w, blk.h) { (x, y, y0) =>
      val i = y * blk.w + x
      if (x == skipX && y <= skipUntilY) () // inside a zero run
      else {
        var runFirstSig = -1
        if (y == y0 && blk.rlEligible(x, y0)) {
          if (mq.decode(cx, CxRl) == 0) {
            skipX = x; skipUntilY = y0 + 3 // whole column stays zero
          } else {
            runFirstSig = (mq.decode(cx, CxUni) << 1) | mq.decode(cx, CxUni)
            // coefficients above the first significant one are zero
            skipX = x; skipUntilY = y0 + runFirstSig - 1
            val yy = y0 + runFirstSig
            val ii = yy * blk.w + x
            blk.sig(ii) = true
            blk.v(ii) |= 1 << plane
            decodeSign(mq, cx, blk, x, yy)
            skipUntilY = yy // this one is done too
          }
        } else if (!blk.sig(i) && !blk.visited(i)) {
          if (mq.decode(cx, blk.zcCx(x, y)) == 1) {
            blk.sig(i) = true
            blk.v(i) |= 1 << plane
            decodeSign(mq, cx, blk, x, y)
          }
        }
      }
    }
  }
}
