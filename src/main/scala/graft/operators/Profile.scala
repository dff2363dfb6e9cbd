package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality report a curation pipeline
  * runs on every new crawl/table before it enters the corpus: per
  * column, null count, distinct count, and min/max (stringified so
  * heterogeneous columns stack into one result).
  *
  * Shape: TWO aggregates, no per-column jobs.
  *   1. extrema pass — one wide `agg` of null-counts + typed
  *      min/max per column (simple aggregates only: HashAggregate,
  *      map-side partials, 1-row result reshaped with `stack`);
  *   2. distinct pass — the table MELTED to (col_name, value_string)
  *      rows via `stack`, then ONE single-distinct aggregate per
  *      column group.
  * The k-row results join back trivially (AQE broadcasts).
  *
  * Why not one `agg` with k `COUNT(DISTINCT col)`s: Spark rewrites
  * multi-distinct aggregates into a k+1-way Expand with stacked
  * SortAggregates — at k=6 profiled columns that plan costs ~4 s to
  * analyze/optimize/codegen per invocation (measured), two orders of
  * magnitude more than it costs to RUN at test scale. The melt form
  * keeps the same data volume through the shuffle ((k·n) rows either
  * way) with a plan that stays linear in k.
  *
  * Distinct counts are over the STRINGIFIED value; renderings of the
  * supported types (integers, strings, decimals, date/time) are
  * injective, so the count equals the typed distinct count. At the
  * 100 TB design point exact distinct is the expensive measure —
  * `exactDistinct = false` swaps in `approx_count_distinct` (HLL,
  * mergeable) with the same report schema.
  *
  * Type note: min/max are CAST to string AFTER aggregation. Columns
  * whose string rendering is engine-ambiguous (raw DOUBLE) should be
  * pre-cast by the caller (e.g. `.withColumn(c, col(c).cast(
  * "decimal(18,2)"))`) — see the q87 query for the composed form.
  */
object Profile {

  /** @param df    input table.
    * @param cols  columns to profile (order preserved in the report).
    * @param exactDistinct exact COUNT(DISTINCT) when true (oracle-
    *        comparable); HLL approx_count_distinct when false (the
    *        at-scale default).
    * @return one row per column: (col_name, n_rows, n_nulls,
    *         n_distinct, min_val, max_val).
    */
  // Column names appear in the stack() SQL only as backquoted
  // IDENTIFIERS (backtick-doubled — the identifier grammar is the
  // same in every parser mode). The report LABEL is never a SQL
  // string literal: literal escaping is parser-mode-dependent
  // (spark.sql.parser.escapedStringLiterals flips the meaning of a
  // backslash), so labels travel as integer ordinals through stack()
  // and get their names back from a parser-free programmatic join.
  private def sqlId(s: String): String =
    "`" + s.replace("`", "``") + "`"

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns requested")
    // ordinal → name lookup, built WITHOUT the SQL parser: a typedlit
    // array literal indexed per report row (k elements, no join)
    val nameOf = element_at(typedlit(cols), col("__ord") + 1)
    // pass 1: null counts + typed extrema, one wide simple aggregate.
    // col() parses its argument as a (backtick-aware) attribute name,
    // so column READS go through sqlId too.
    val aggs = cols.flatMap { c =>
      Seq(
        // coalesce: SUM over an empty table is NULL, but "0 nulls" is
        // the truthful report for an empty input
        coalesce(sum(when(col(sqlId(c)).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__${c}__nulls"),
        min(col(sqlId(c))).cast("string").as(s"__${c}__min"),
        max(col(sqlId(c))).cast("string").as(s"__${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.zipWithIndex.map {
      case (c, i) =>
        s"$i, ${sqlId(s"__${c}__nulls")}, " +
          s"${sqlId(s"__${c}__min")}, ${sqlId(s"__${c}__max")}"
    }.mkString(", ") + ") AS (__ord, n_nulls, min_val, max_val)"
    val extrema = wide.select(col("__total").as("n_rows"), expr(stackExpr))

    // pass 2: melt to (ordinal, value) and count distincts per group
    val meltExpr = s"stack(${cols.size}, " + cols.zipWithIndex.map {
      case (c, i) => s"$i, CAST(${sqlId(c)} AS STRING)"
    }.mkString(", ") + ") AS (__ord, __val)"
    val dist = df.select(expr(meltExpr)).groupBy("__ord")
      .agg((if (exactDistinct) countDistinct(col("__val"))
            else approx_count_distinct(col("__val"))).as("n_distinct"))

    extrema.join(dist, Seq("__ord"), "left")
      .select(nameOf.as("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
  }
}
