package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking as ONE native expression (SURVEY.md §7.3's
  * preference ladder, rung (b)): the token walk — 32-bit md5 hash,
  * 4-token rolling polynomial, boundary test, per-chunk fingerprint —
  * runs as a tight per-row loop over `ArrayData`.
  *
  * Why native: composed from higher-order functions the same walk
  * needs `transform`+`filter`+`zip_with` lambdas, which don't
  * participate in whole-stage codegen and pay interpreted dispatch
  * per TOKEN (measured 0.73 s for the chunk build at sf0.1; worse,
  * without explicit lambda-binding the collapsed projection
  * re-evaluates the hash transform per element_at probe — 195 s).
  * The kernel does the identical arithmetic in one pass.
  *
  * Exactness contract (must match the DuckDB twin and the
  * explode+window reference form, both pinned by CdcSpec/the q144
  * gate): token hash = first 8 hex chars of lowercase md5 parsed as
  * an unsigned 32-bit integer; rolling hash
  * h_i = t_{i-3}·B³ + t_{i-2}·B² + t_{i-1}·B + t_i with missing
  * prefix terms = 0 and B = 1031 (max term 4.3e9·1031³ < 2⁶³);
  * boundary where h % 16 == 0 closes the chunk AT that token; chunk
  * fingerprint = md5 hex of the space-joined tokens (md5 runs over
  * the concatenated UTF-8 bytes — identical to encoding the joined
  * string, by UTF-8's concatenation property).
  */
object CdcKernel {
  val B = 1031L
  val B2: Long = B * B
  val B3: Long = B2 * B

  private val hexDigits = "0123456789abcdef".toCharArray

  private val digestTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5HexOf(bytes: Array[Byte]): String = {
    val d = digestTl.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((h(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 8 hex chars of md5 as unsigned 32-bit — the cross-engine
    * token hash (`conv(substring(md5(t),1,8),16,10)`).
    */
  private def h32(bytes: Array[Byte]): Long = {
    val d = digestTl.get()
    d.reset()
    val h = d.digest(bytes)
    // first 4 digest bytes == first 8 hex chars
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** toks: ARRAY<STRING> → ARRAY<STRUCT<chunk BIGINT, n_tok BIGINT,
    * fp STRING>> in chunk order.
    */
  def chunks(toks: ArrayData): ArrayData = chunksClamped(toks, 1, Int.MaxValue)

  /** FastCDC-style length normalization: boundaries inside the first
    * `minLen − 1` tokens of a chunk are SUPPRESSED, and a chunk is
    * force-cut at `maxLen` tokens — the production guards against the
    * pathological tails of pure content-defined chunking (a run of
    * boundary-hash tokens sprays 1-token chunks; boundary-free
    * content never cuts at all). The documented tradeoff: every
    * suppression/force-cut is a POSITION-dependent decision, so the
    * re-synchronization property weakens locally — after an edit,
    * chunking realigns at the first unsuppressed content boundary
    * past a min-length window rather than within the 4-token hash
    * window (CdcSpec pins that the tail still re-syncs). The default
    * (minLen=1, maxLen=∞) is the pure form the q144 oracle certifies.
    */
  def chunksClamped(toks: ArrayData, minLen: Int, maxLen: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val tokBytes = new Array[Array[Byte]](n)
    val t32 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val b = toks.getUTF8String(i).getBytes
      tokBytes(i) = b
      t32(i) = h32(b)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var chunk = 0L
    var start = 0
    i = 0
    while (i < n) {
      val h = (if (i >= 3) t32(i - 3) * B3 else 0L) +
        (if (i >= 2) t32(i - 2) * B2 else 0L) +
        (if (i >= 1) t32(i - 1) * B else 0L) + t32(i)
      val last = i == n - 1
      val curLen = i - start + 1
      val cut = (h % 16 == 0 && curLen >= minLen) || curLen >= maxLen
      if (cut || last) {
        // chunk = tokens [start..i]; fingerprint the space-joined run
        var len = -1
        var j = start
        while (j <= i) { len += tokBytes(j).length + 1; j += 1 }
        val joined = new Array[Byte](len)
        var off = 0
        j = start
        while (j <= i) {
          val b = tokBytes(j)
          System.arraycopy(b, 0, joined, off, b.length)
          off += b.length
          if (off < len) { joined(off) = ' '; off += 1 }
          j += 1
        }
        out += new GenericInternalRow(Array[Any](chunk, (i - start + 1).toLong,
          UTF8String.fromString(md5HexOf(joined))))
        chunk += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** cdc_chunks(array<string>) -> array<struct<chunk,n_tok,fp>> */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(a: Any): Any =
    CdcKernel.chunks(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CdcKernel.chunks($a)")
  override protected def withNewChildInternal(c: Expression): CdcChunks = copy(c)
  override def prettyName: String = "cdc_chunks"
}

/** cdc_chunks(array<string>, minLen, maxLen) — the length-normalized
  * form (see [[CdcKernel.chunksClamped]]).
  */
case class CdcChunksClamped(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, INT, INT), got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(a: Any, mn: Any, mx: Any): Any =
    CdcKernel.chunksClamped(a.asInstanceOf[ArrayData],
      mn.asInstanceOf[Int], mx.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, mn, mx) =>
      s"graft.functions.CdcKernel.chunksClamped($a, $mn, $mx)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): CdcChunksClamped = copy(a, b, c)
  override def prettyName: String = "cdc_chunks"
}

object CdcFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cdc_chunks",
      new ExpressionInfo(classOf[CdcChunks].getName, null, "cdc_chunks",
        "cdc_chunks(toks[, minLen, maxLen]) - content-defined chunks " +
          "with md5 fingerprints (optionally length-normalized)",
        "", "", "", "", "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(a) => CdcChunks(a)
        case Seq(a, mn, mx) => CdcChunksClamped(a, mn, mx)
        case other => throw new IllegalArgumentException(
          s"cdc_chunks takes 1 or 3 arguments, got ${other.size}")
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
