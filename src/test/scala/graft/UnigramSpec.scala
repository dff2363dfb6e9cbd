package graft

import graft.operators.Unigram
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM kernels against their documented contracts
  * (Unigram scaladoc): the quantized-log device's algebraic
  * properties and the Viterbi segmentation's score/tie-break
  * semantics (which the q174 oracle certifies cross-engine over the
  * full corpus; this suite pins the kernel-level invariants with
  * adversarial cases).
  */
class UnigramSpec extends AnyFunSuite {

  test("ql32: anchor values, exact shift-equivariance, monotonicity") {
    assert(Unigram.ql32(1) == 0)
    assert(Unigram.ql32(2) == 32)
    assert(Unigram.ql32(3) == 48)
    assert(Unigram.ql32(100) == 210)
    // ql32(2c) = ql32(c) + 32 EXACTLY, for every c (the property that
    // makes it a sound log2 substitute)
    val rnd = new scala.util.Random(174)
    for (_ <- 0 until 2000) {
      val c = 1L + rnd.nextLong(1L << 40)
      assert(Unigram.ql32(2 * c) == Unigram.ql32(c) + 32, s"c=$c")
    }
    // monotone (non-strict: the 1/32 quantization collapses near ties)
    var prev = Long.MinValue
    for (c <- 1L to 5000L) {
      val v = Unigram.ql32(c)
      assert(v >= prev, s"c=$c")
      prev = v
    }
    // bounded error vs true log2: the chord under-shoots log2(1+f)
    // by at most ~0.086 (at f≈0.44) and the floor by < 1/32, so
    // −0.118 ≤ err ≤ 0 everywhere
    for (_ <- 0 until 500) {
      val c = 1L + rnd.nextLong(1L << 50)
      val err = Unigram.ql32(c) / 32.0 - math.log(c.toDouble) / math.log(2)
      assert(err > -0.125 && err <= 0.0, s"c=$c err=$err")
    }
    intercept[IllegalArgumentException](Unigram.ql32(0))
  }

  test("ql32: full Long range — no overflow, SQL-double semantics above 2^53") {
    // the old ((c-half)*32)/half form overflowed for c >= ~2^59;
    // the fixed form must be sane right up to Long.MaxValue
    // 2^63-1: the mantissa cast rounds 2^62-1 UP to 2^62, so the frac
    // term saturates at 32 — exactly what ql32Sql returns in both
    // engines (monotonicity is preserved; only the top half-ulp of
    // each octave can saturate)
    assert(Unigram.ql32(Long.MaxValue) == 32L * 63)
    assert(Unigram.ql32(1L << 62) == 32L * 62)
    assert(Unigram.ql32((1L << 62) - 1) == 32L * 62) // saturates too
    // canonical semantics = ql32Sql's: one round-to-nearest-even cast
    // of (c - half) to double, then exact *32/half. Replicate that
    // reference computation and require bit-agreement everywhere.
    def sqlForm(c: Long): Long = {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(c)
      val half = 1L << (b - 1)
      32L * (b - 1) +
        math.floor((c - half).toDouble * 32.0 / half.toDouble).toLong
    }
    val rnd = new scala.util.Random(18)
    for (_ <- 0 until 5000) {
      val c = 1L + (rnd.nextLong() & Long.MaxValue - 1)
      assert(Unigram.ql32(c) == sqlForm(c), s"c=$c")
    }
    // adversarial: quantization-step boundaries above 2^53, where the
    // exact-integer floor and the rounded-double floor used to differ
    for (b <- 54 to 62; k <- Seq(1L, 7L, 31L)) {
      val half = 1L << (b - 1)
      val step = half >> 5
      for (d <- -2L to 2L) {
        val c = half + k * step + d
        if (c >= half && c < 2 * half)
          assert(Unigram.ql32(c) == sqlForm(c), s"c=$c b=$b")
      }
    }
    // shift-equivariance survives the integer->double branch boundary
    for (_ <- 0 until 2000) {
      val c = (1L << 52) + rnd.nextLong(1L << 52)
      assert(Unigram.ql32(2 * c) == Unigram.ql32(c) + 32, s"c=$c")
    }
  }

  test("segment: maximizes the score sum; prefers frequent long pieces") {
    // 'ab' much more frequent than 'a'/'b' => one piece wins
    val sc = Map("a" -> -100L, "b" -> -100L, "ab" -> -10L)
    assert(Unigram.segment("ab", sc, 4).get == Seq("ab"))
    assert(Unigram.segment("aab", sc, 4).get == Seq("a", "ab"))
    // pieces can only start where a valid predecessor path exists
    assert(Unigram.segment("ba", sc, 4).get == Seq("b", "a"))
  }

  test("segment: ties resolve to the lex-smallest comma-joined path") {
    // "ab,c" vs "a,bc": equal scores; ',' < 'b' so "a,bc" wins
    val sc = Map("a" -> -10L, "bc" -> -20L, "ab" -> -10L, "c" -> -20L,
      "b" -> -999L)
    assert(Unigram.segment("abc", sc, 4).get == Seq("a", "bc"))
    // equal-score single-char vs two-char split of "aa": path "aa"
    // vs "a,a" — ',' < 'a' so the split wins when scores tie
    val sc2 = Map("a" -> -5L, "aa" -> -10L)
    assert(Unigram.segment("aa", sc2, 4).get == Seq("a", "a"))
    // and when the long piece is strictly better it wins regardless
    val sc3 = Map("a" -> -6L, "aa" -> -11L)
    assert(Unigram.segment("aa", sc3, 4).get == Seq("aa"))
  }

  test("segment: maxPieceLen bounds lookups; uncoverable words are None") {
    val sc = Map("a" -> -1L, "aaaaa" -> -1L)
    // 5-char piece exists in the map but maxPieceLen=4 must ignore it
    assert(Unigram.segment("aaaaa", sc, 4).get == Seq.fill(5)("a"))
    assert(Unigram.segment("ax", sc, 4).isEmpty)
    assert(Unigram.segment("x", Map.empty[String, Long], 4).isEmpty)
  }

  test("segment agrees with brute-force enumeration on random words " +
      "(score and tie-break)") {
    val rnd = new scala.util.Random(175)
    val alphabet = "abc"
    def brute(w: String, sc: Map[String, Long], maxLen: Int)
        : Option[(Long, String)] = {
      def go(pos: Int): Seq[(Long, String)] =
        if (pos == w.length) Seq((0L, ""))
        else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
          val piece = w.substring(pos, pos + l)
          sc.get(piece).toSeq.flatMap { s =>
            go(pos + l).map { case (s2, p2) =>
              (s + s2, if (p2.isEmpty) piece else piece + "," + p2)
            }
          }
        }
      val all = go(0)
      if (all.isEmpty) None
      else Some(all.minBy { case (s, p) => (-s, p) })
    }
    for (trial <- 0 until 300) {
      val w = Seq.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random sparse vocab over substrings + guaranteed singles
      val subs = (for {
        i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      val sc = (subs.filter(_ => rnd.nextBoolean()) ++
        alphabet.map(_.toString))
        .distinct.map(p => p -> -(1L + rnd.nextInt(50))).toMap
      val got = Unigram.segment(w, sc, 4)
        .map(p => (p.map(sc).sum, p.mkString(",")))
      assert(got == brute(w, sc, 4), s"trial $trial w=$w sc=$sc")
    }
  }

  test("expectedCounts agrees with brute-force weighted enumeration " +
      "on random words (fixed-point exact)") {
    val rnd = new scala.util.Random(193)
    val alphabet = "abc"
    // brute soft E-step: enumerate every covering segmentation with
    // its exact BigInt weight, sum per-piece multiplicity·weight,
    // floor-divide in 2^-20 fixed point — the q193 oracle's device
    def brute(w: String, qw: Map[String, Long], maxLen: Int)
        : Map[String, Long] = {
      def go(pos: Int): Seq[(BigInt, Seq[String])] =
        if (pos == w.length) Seq((BigInt(1), Nil))
        else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
          val piece = w.substring(pos, pos + l)
          qw.get(piece).toSeq.flatMap { x =>
            go(pos + l).map { case (wt, ps) => (wt * x, piece +: ps) }
          }
        }
      val all = go(0)
      if (all.isEmpty) Map.empty
      else {
        val den = all.map(_._1).sum
        all.flatMap { case (wt, ps) => ps.map(_ -> wt) }
          .groupBy(_._1).view
          .mapValues(v => ((v.map(_._2).sum << 20) / den).toLong)
          .toMap
      }
    }
    for (trial <- 0 until 300) {
      val w = Seq.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val subs = (for {
        i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      // random 8-bit weights; singles sometimes absent so some words
      // are uncoverable (must return empty, matching brute)
      val qw = subs.filter(_ => rnd.nextInt(4) > 0)
        .map(p => p -> (1L + rnd.nextInt(255))).toMap
      val got = Unigram.expectedCounts(w, qw, 4).toMap
      assert(got == brute(w, qw, 4), s"trial $trial w=$w qw=$qw")
    }
  }
}
