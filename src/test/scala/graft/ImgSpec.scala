package graft

import graft.functions.ImgKernel
import org.scalatest.funsuite.AnyFunSuite

/** The image kernels against their documented contracts (the oracle
  * gates q180/q186/q195/q201 certify them over full corpora
  * cross-engine; this suite pins the kernel-level invariants with
  * direct cases).
  */
class ImgSpec extends AnyFunSuite {

  test("luma: BT.601 integer weights on pure channels and white") {
    def one(r: Int, g: Int, b: Int): Int =
      ImgKernel.luma(Array(r.toByte, g.toByte, b.toByte), 1, 1)(0) & 0xff
    assert(one(255, 0, 0) == (77 * 255) >> 8)   // 76
    assert(one(0, 255, 0) == (150 * 255) >> 8)  // 149
    assert(one(0, 0, 255) == (29 * 255) >> 8)   // 28
    assert(one(255, 255, 255) == 255)           // weights sum to 256
    assert(one(0, 0, 0) == 0)
  }

  test("luma: +k on every channel shifts luma by exactly k (the " +
      "variant-invariance q201 relies on)") {
    val rnd = new scala.util.Random(201)
    val rgb = Array.fill(30 * 3)((rnd.nextInt(240)).toByte)
    val base = ImgKernel.luma(rgb, 6, 5)
    for (k <- Seq(1, 7, 15)) {
      val shifted = ImgKernel.luma(
        rgb.map(v => ((v & 0xff) + k).toByte), 6, 5)
      base.indices.foreach(i =>
        assert((shifted(i) & 0xff) - (base(i) & 0xff) == k, s"k=$k i=$i"))
    }
  }

  test("luma: size mismatch refuses loudly") {
    val e = intercept[IllegalArgumentException](
      ImgKernel.luma(new Array[Byte](10), 2, 2))
    assert(e.getMessage.contains("img_luma"))
  }

  test("dhash: uniform monotone shifts preserve every bit; geometry " +
      "contract refuses non-aligned planes") {
    val rnd = new scala.util.Random(180)
    val (w, h) = (18, 8)
    val px = Array.fill(w * h)(rnd.nextInt(240).toByte)
    val a = ImgKernel.dhash(px, w, h)
    val b = ImgKernel.dhash(px.map(v => ((v & 0xff) + 7).toByte), w, h)
    assert(a.toLongArray.toSeq == b.toLongArray.toSeq)
    val e = intercept[IllegalArgumentException](
      ImgKernel.dhash(new Array[Byte](10 * 8), 10, 8))
    assert(e.getMessage.contains("9x8"))
  }
}
