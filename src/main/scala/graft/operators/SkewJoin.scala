package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §7.1 scale stance; the
  * explicit fallback when AQE's runtime skew-join split
  * — `spark.sql.adaptive.skewJoin.enabled`, on by default — cannot
  * apply, e.g. when the skewed side feeds an aggregation or the join
  * is planned sort-merge with one hot key dominating a partition).
  *
  * The big (skewed) side gets a DETERMINISTIC salt derived from a
  * non-key column (never `rand()` — retries/speculative tasks must
  * produce identical rows); the small-but-not-broadcastable side is
  * replicated `saltFactor` times. Hot keys spread over `saltFactor`
  * partitions; result is row-identical to the unsalted join.
  */
object SkewJoin {

  /** @param big        skewed side
    * @param small      replicated side (rows × saltFactor)
    * @param keys       equi-join key columns (same names both sides)
    * @param saltSource a big-side column whose hash spreads hot keys
    * @param saltFactor number of splits per hot key
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltSource: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
