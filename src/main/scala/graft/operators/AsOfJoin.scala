package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` per key (Spark has no built-in; the
  * task-relevant custom operator class from the builder brief).
  *
  * Implemented as the MERGE formulation, not a range join: tag both
  * sides, union, one window pass per key ordered by (time, side,
  * tieBreak) carrying `last(payload, ignoreNulls)` — rights sort
  * before lefts at equal time, so "<=" semantics fall out of the sort
  * order. ONE shuffle (the window partitioning), zero join blowup,
  * and the partition key is the join key — at 100 TB this is the
  * formulation that survives, because candidate-pair row explosion
  * never happens and skew is bounded by per-key event density.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     rows providing the as-of payload
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param payload   right columns to carry (emitted as `asof_<name>`)
    * @param leftId    a unique left column for deterministic ordering
    * @param rightId   a unique right column for deterministic
    *                  tie-breaks among equal-time right rows (the
    *                  largest id wins, consistently)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      leftId: String, rightId: String): DataFrame = {
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    val l = left.select(
      keyCols ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        col(leftId).cast("long").as("__ord"),
        struct(leftCols.map(col): _*).as("__l")) :+
        lit(null).cast(structType(right, payload)).as("__p"): _*)
    val r = right.select(
      keyCols ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightId).cast("long").as("__ord"),
        lit(null).cast(structType(left, leftCols)).as("__l")) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
