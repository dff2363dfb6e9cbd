package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._

/** Acoustic fingerprinting for MULTIMODAL dedup — the audio leg of
  * the text (md5 / MinHash) and image (img_dhash) fingerprint
  * family: frame the PCM stream, take per-frame ENERGY, and emit one
  * bit per adjacent-frame comparison E(f) > E(f+1) — the
  * energy-contour fingerprint (the robust core of the classic
  * landmark schemes, minus the FFT this container cannot justify:
  * the CONTOUR ordering, like dHash's block ordering, is exactly
  * invariant under uniform gain — every energy scales by g², so a
  * re-encode at a different level lands in the same group).
  *
  * All-integer: s16 samples, energies Σs² ≤ n·2³⁰ per frame, strict
  * comparisons, bits packed little-endian (bit f weighs 2^f) into
  * ONE non-negative BIGINT — at most 63 comparisons are emitted so
  * the signed 2^63 boundary is never touched.
  *
  * Input contract (refused loudly): byte length even (s16le pairs),
  * sample count divisible by `frameLen`, at least 2 frames.
  */
object AudioKernel {

  def energyFp(bytes: Array[Byte], frameLen: Int): Long = {
    require(frameLen > 0, s"pcm_energy_fp: frameLen $frameLen")
    require(bytes.length % 2 == 0,
      s"pcm_energy_fp: odd byte count ${bytes.length} is not s16le PCM")
    val n = bytes.length / 2
    require(n % frameLen == 0 && n / frameLen >= 2,
      s"pcm_energy_fp: $n samples do not frame into >= 2 frames of " +
        s"$frameLen")
    val nFrames = n / frameLen
    val e = new Array[Long](nFrames)
    var i = 0
    while (i < n) {
      // s16 little-endian, sign-extended
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
      e(i / frameLen) += s * s
      i += 1
    }
    var fp = 0L
    var f = 0
    val bits = math.min(nFrames - 1, 63)
    while (f < bits) {
      if (e(f) > e(f + 1)) fp |= 1L << f
      f += 1
    }
    fp
  }
}

/** pcm_energy_fp(bytes BINARY, frameLen INT) -> BIGINT. */
case class PcmEnergyFp(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT), got $other")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any, fl: Any): Any =
    AudioKernel.energyFp(b.asInstanceOf[Array[Byte]], fl.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, fl) =>
      s"graft.functions.AudioKernel.energyFp($b, $fl)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PcmEnergyFp = copy(l, r)
  override def prettyName: String = "pcm_energy_fp"
}

object AudioFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("pcm_energy_fp",
      new ExpressionInfo(classOf[PcmEnergyFp].getName, null,
        "pcm_energy_fp",
        "pcm_energy_fp(bytes, frameLen) - 63-bit energy-contour " +
          "fingerprint of s16le PCM (gain-invariant)", "", "", "", "",
        "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(b, fl) => PcmEnergyFp(b, fl)
        case other => throw new IllegalArgumentException(
          s"pcm_energy_fp takes 2 arguments, got ${other.size}")
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
