package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Bloom filter over 64-bit join keys — the runtime semi-join
  * PRUNING sketch: build a ~100 KB filter from the small side of a
  * join in one aggregation, broadcast it as a literal, and drop the
  * large side's non-matching rows map-side BEFORE they reach the
  * shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling only the fraction that can match
  * (false positives bounded, false negatives impossible — the exact
  * join after the prune keeps the result exact).
  *
  * Deterministic double hashing (two mixed 64-bit hashes, bit_i =
  * h1 + i*h2): partial filters merge by word-wise OR — commutative,
  * associative, idempotent — so any partitioning/retry builds the
  * same filter. See [[graft.operators.BloomPrune]] for the operator.
  */
object Bloom {

  /** Mix finalizer (splitmix64-style) — avalanche for sequential ids. */
  private[functions] def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  case class Filter(numBits: Int, k: Int, words: Array[Long]) {
    def add(key: Long): Filter = {
      val h1 = Bloom.mix(key)
      val h2 = Bloom.mix(key ^ 0x5851f42d4c957f2dL) | 1L
      var i = 0
      while (i < k) {
        val bit = (((h1 + i * h2) % numBits) + numBits) % numBits
        words((bit >>> 6).toInt) |= 1L << (bit & 63)
        i += 1
      }
      this
    }
    def contains(key: Long): Boolean = {
      val h1 = Bloom.mix(key)
      val h2 = Bloom.mix(key ^ 0x5851f42d4c957f2dL) | 1L
      var i = 0
      while (i < k) {
        val bit = (((h1 + i * h2) % numBits) + numBits) % numBits
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
    def mergeWith(o: Filter): Filter = {
      require(numBits == o.numBits && k == o.k, "bloom shape mismatch")
      var i = 0
      while (i < words.length) { words(i) |= o.words(i); i += 1 }
      this
    }
  }

  def empty(numBits: Int, k: Int): Filter = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    Filter(numBits, k, new Array[Long](numBits / 64))
  }

  /** Typed Aggregator: Dataset[Long] → Filter (word-wise OR merge). */
  class BloomAggregator(numBits: Int, k: Int)
      extends Aggregator[Long, Filter, Filter] {
    override def zero: Filter = empty(numBits, k)
    override def reduce(b: Filter, key: Long): Filter = b.add(key)
    override def merge(b1: Filter, b2: Filter): Filter = b1.mergeWith(b2)
    override def finish(r: Filter): Filter = r
    override def bufferEncoder: Encoder[Filter] = Encoders.product[Filter]
    override def outputEncoder: Encoder[Filter] = Encoders.product[Filter]
  }

  /** Codegen entry: membership test against the packed word array. */
  def mightContain(words: ArrayData, k: Int, key: Long): Boolean = {
    val numBits = words.numElements() * 64
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = (((h1 + i * h2) % numBits) + numBits) % numBits
      if ((words.getLong((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** bloom_might_contain(words_array, k, key) — codegen'd membership
  * test; the words array is a broadcast-folded literal in the prune
  * filter, so the test stays inside whole-stage codegen on the
  * large-side scan.
  */
case class BloomMightContain(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (ARRAY<BIGINT>, INT, BIGINT), got $other")
    }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(words: Any, k: Any, key: Any): Any =
    Bloom.mightContain(words.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], key.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, k, key) => s"graft.functions.Bloom.mightContain($w, $k, $key)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): BloomMightContain = copy(f, s, t)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[BloomMightContain].getName, null, name, usage,
      "", "", "", "", "4.0.0", "", "scala_udf")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(words, k, key) - bloom membership test"),
      (e: Seq[Expression]) => BloomMightContain(e(0), e(1), e(2)))
}
