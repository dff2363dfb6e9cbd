package graft.operators

import graft.functions.{Bloom, BloomFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join — the explicit runtime-filter operator for
  * "keep fact rows whose key appears in a dimension subset" when the
  * subset is too large to broadcast-join cheaply but its FILTER is a
  * few hundred KB.
  *
  * Plan (the 100 TB shape):
  *   1. aggregate the small side's keys into a Bloom filter — one
  *      pass, word-wise OR merge, ~numBits/8 bytes total;
  *   2. fold the filter into the large side's scan as a literal and
  *      drop non-members MAP-SIDE (`bloom_might_contain` is codegen'd,
  *      so the test rides the scan's whole-stage span — before any
  *      exchange);
  *   3. finish with the exact semi join on the survivors: false
  *      positives (bounded by the classic (1-e^(-kn/m))^k rate) are
  *      removed here, false negatives cannot occur, so the result is
  *      EXACT while the shuffle carries only ~selectivity of the
  *      fact table.
  *
  * Catalyst injects its own bloom runtime filters for some shapes
  * (spark.sql.optimizer.runtime.bloomFilter.*); this operator is the
  * library-level form for when the pruning set is an arbitrary
  * DataFrame the optimizer cannot see through (a curated id list, a
  * prior pipeline stage's output).
  */
object BloomPrune {

  /** Exact `large LEFT SEMI JOIN small ON largeKey = smallKey`, with
    * the large side Bloom-pruned before the shuffle.
    *
    * @param numBits filter size in bits (multiple of 64); default
    *        2^20 = 128 KB — ~1% false positives at 1M keys, k=5
    * @param k hash count
    */
  def prunedSemiJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val smallKeys = normalizedKeys(small, smallKey, largeKey)
    prunedSemiJoinWith(large, largeKey, smallKeys,
      buildFilter(smallKeys, numBits, k), k)
  }

  /** Key normalization: try_cast (NOT cast — ANSI mode throws on
    * malformed input) + drop NULLs. A plain semi join silently drops
    * NULL/malformed keys, so the pruned form must too — and the
    * primitive Long encoder in the aggregation would throw on NULLs.
    */
  def normalizedKeys(small: DataFrame, smallKey: String,
      as: String): DataFrame =
    small.select(expr(s"try_cast($smallKey AS BIGINT)").as(as)).na.drop()

  /** The filter-build ACTION (one-row aggregate: the filter itself is
    * the only thing collected), exposed separately so callers can
    * build once per pruning set and reuse across probes — the filter
    * is index state of the dimension subset, not per-query work.
    * `smallKeys` must be a single normalized BIGINT column
    * ([[normalizedKeys]]).
    */
  def buildFilter(smallKeys: DataFrame, numBits: Int = 1 << 20,
      k: Int = 5): Bloom.Filter = {
    val spark = smallKeys.sparkSession
    import spark.implicits._
    smallKeys.as[Long]
      .select(new Bloom.BloomAggregator(numBits, k).toColumn)
      .head()
  }

  /** [[prunedSemiJoin]] with a prebuilt filter. */
  def prunedSemiJoinWith(large: DataFrame, largeKey: String,
      smallKeys: DataFrame, filter: Bloom.Filter, k: Int = 5): DataFrame = {
    BloomFunctions.register(large.sparkSession)
    large
      .withColumn("__bloom", lit(filter.words))
      .filter(expr(
        s"bloom_might_contain(__bloom, $k, try_cast($largeKey AS BIGINT))"))
      .drop("__bloom")
      .join(smallKeys.distinct(), Seq(largeKey), "left_semi")
      .select(large.columns.map(col).toIndexedSeq: _*) // original column order
  }
}
