package graft.operators

/** Unigram-LM tokenizer training kernels (the SentencePiece
  * counterpart to [[Bpe]] — Kudo 2018's unigram language model,
  * here in its hard-EM / Viterbi form so every step is exact
  * integer arithmetic and cross-engine reproducible).
  *
  * The transcendental-free scoring device (the q158 algebraic-sigmoid
  * discipline applied to log-likelihood): a piece's log-probability
  * surrogate is the QUANTIZED PIECEWISE-LINEAR LOG2
  *
  *   ql32(c) = 32·(b−1) + ⌊32·(c − 2^(b−1)) / 2^(b−1)⌋,
  *   b = bit-length of c,
  *
  * i.e. floor-log2 in units of 1/32 with linear interpolation of the
  * mantissa. Properties that make it a sound log substitute:
  * monotone in c, and EXACTLY shift-equivariant — ql32(2c) =
  * ql32(c) + 32 for every c (the interpolated fraction is preserved
  * by the doubling, by the floor-division identity
  * ⌊2x·32/2^b⌋ = ⌊x·32/2^(b−1)⌋). A segmentation's score is
  * Σ (ql32(count_i) − ql32(total)) — all integers, so the Viterbi
  * argmax is engine- and order-independent, where a float log would
  * hand the tie-breaks to libm rounding.
  *
  * Tie-break contract (pinned by the q174 oracle): among max-score
  * segmentations, the lexicographically SMALLEST comma-joined piece
  * path wins. Lexicographic order composes under the DP because two
  * distinct prefixes to the same position always differ at a
  * concrete character (equal coverage with different comma
  * placements can never make one a string-prefix of the other), so
  * per-node (max score, lex-min path) state suffices.
  */
object Unigram {

  /** Quantized piecewise-linear log2 (×32). Requires c ≥ 1.
    *
    * Canonical semantics = [[ql32Sql]]'s (the engine-shared double
    * form), for EVERY c in the positive Long range: below 2^53 the
    * integer and double mantissa terms are provably identical (the
    * BIGINT→DOUBLE cast is exact, ×32.0 and ÷2^(b−1) only move the
    * exponent), so the exact integer division is used there —
    * overflow-free as (c − half) · 32 < 2^58. At and above 2^53 the
    * SQL device's one rounding step (the BIGINT→DOUBLE cast of
    * c − half, round-to-nearest-even) is REPLICATED here via
    * `.toDouble` rather than "corrected", so the streamed ledgers
    * (psiQ32) and the gated batch SQL can never disagree by the
    * ±1 quantization-step the exact-integer form would introduce.
    * Shift-equivariance survives the double branch because rounding
    * to nearest commutes with scaling by powers of two.
    */
  def ql32(c: Long): Long = {
    require(c >= 1, s"ql32 requires a positive count, got $c")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(c)
    val half = 1L << (b - 1)
    val frac =
      if (b <= 54) ((c - half) * 32L) / half
      else math.floor((c - half).toDouble * 32.0 / half.toDouble).toLong
    32L * (b - 1) + frac
  }

  /** [[ql32]] as an SQL string BOTH engines (Spark and the DuckDB
    * oracle twins) evaluate identically — the engine-shared
    * transcendental-free log device used wherever a gated row needs
    * a logarithm of an exact positive BIGINT (q79/q98/q179's recipe,
    * extended to the idf/PSI/DSIR rows in round 17): 32·(bitlen−1) +
    * ⌊32·(x−2^(bitlen−1)) / 2^(bitlen−1)⌋. `bin()` gives the bit
    * length in both engines; `power(2, k)` is exact in double for
    * k ≤ 52; the FLOOR division is IEEE-correctly-rounded on exact
    * operands, so the floor of the quotient is engine-independent;
    * CAST of an integer-valued double to BIGINT agrees under both
    * truncation (Spark) and rounding (DuckDB) semantics. A ratio's
    * log is ql32(num) − ql32(den) in "32nds of a bit" units
    * (≈ 46.166·ln by ql32 ≈ 32·log2); the substitution is exact,
    * monotone, and shift-equivariant (see the object scaladoc).
    * `x` must be an SQL expression yielding a POSITIVE BIGINT
    * (< 2^63 — callers with wider products document their bound).
    */
  def ql32Sql(x: String): String =
    s"(32 * (length(bin($x)) - 1) + CAST(FLOOR((($x) - " +
      s"CAST(power(2, length(bin($x)) - 1) AS BIGINT)) * 32.0 / " +
      s"CAST(power(2, length(bin($x)) - 1) AS BIGINT)) AS BIGINT))"

  /** SOFT-EM expected piece counts for one word — the
    * forward-backward pass over the segmentation lattice (Kudo
    * 2018's true E-step, where [[segment]] is the hard/Viterbi
    * approximation), made engine-exact by two quantizations:
    *
    *   - piece probabilities enter as small INTEGER weights `qw`
    *     (the caller's 8-bit quantized-probability device), so a
    *     segmentation's weight Π qw over ≤ `w.length` factors is an
    *     exact big integer (≤ 255^12 < 2^96 — BigInt here, HUGEINT
    *     in the oracle twin);
    *   - the expected count of piece p, Σ_seg mult_p(seg)·wt(seg) /
    *     Σ_seg wt(seg), is emitted in 2^-20 FIXED POINT via one
    *     floor division — identical in any engine, and the ql32
    *     rescoring downstream is shift-equivariant so the 2^20
    *     scale cancels out of score differences.
    *
    * forward f(i) = Σ segmentations of w[0,i); backward b(i) =
    * Σ segmentations of w[i,n); an occurrence of p at (i, l)
    * contributes f(i)·qw(p)·b(i+l) — exactly the enumeration sum the
    * oracle computes with a recursive CTE. Returns one (piece,
    * fixed-point expected count) row per vocab piece occurring in
    * `w`; empty when no covering segmentation exists.
    */
  def expectedCounts(w: String, qw: scala.collection.Map[String, Long],
      maxPieceLen: Int): Seq[(String, Long)] = {
    val n = w.length
    val f = Array.fill(n + 1)(BigInt(0)); f(0) = BigInt(1)
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (f(i - l).signum > 0) qw.get(w.substring(i - l, i))
          .foreach(x => f(i) += f(i - l) * x)
        l += 1
      }
      i += 1
    }
    if (f(n).signum == 0) return Seq.empty
    val b = Array.fill(n + 1)(BigInt(0)); b(n) = BigInt(1)
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        if (b(i + l).signum > 0) qw.get(w.substring(i, i + l))
          .foreach(x => b(i) += b(i + l) * x)
        l += 1
      }
      i -= 1
    }
    val den = f(n)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, BigInt]
    i = 0
    while (i < n) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val p = w.substring(i, i + l)
        qw.get(p).foreach { x =>
          val m = f(i) * x * b(i + l)
          if (m.signum > 0) acc(p) = acc.getOrElse(p, BigInt(0)) + m
        }
        l += 1
      }
      i += 1
    }
    acc.iterator
      .map { case (p, num) => p -> ((num << 20) / den).toLong }.toSeq
  }

  /** Viterbi segmentation of `w` under integer piece scores:
    * maximize Σ score(piece); ties resolve to the lexicographically
    * smallest comma-joined path. Returns None when no concatenation
    * of scored pieces covers `w` (callers that guarantee single-char
    * coverage may `.get` loudly).
    */
  def segment(w: String, score: scala.collection.Map[String, Long],
      maxPieceLen: Int): Option[Seq[String]] = {
    val n = w.length
    val dpScore = Array.fill(n + 1)(Long.MinValue)
    val dpPath = new Array[String](n + 1)
    dpScore(0) = 0L
    dpPath(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dpScore(j) != Long.MinValue) {
          score.get(w.substring(j, i)) match {
            case Some(sc) =>
              val cand = dpScore(j) + sc
              if (cand >= dpScore(i)) {
                val piece = w.substring(j, i)
                val candPath =
                  if (j == 0) piece else dpPath(j) + "," + piece
                if (cand > dpScore(i) || candPath < dpPath(i)) {
                  dpScore(i) = cand
                  dpPath(i) = candPath
                }
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (dpScore(n) == Long.MinValue) None
    else Some(scala.collection.immutable.ArraySeq
      .unsafeWrapArray(dpPath(n).split(',')))
  }
}
