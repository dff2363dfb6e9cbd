package graft.queries

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Breadth of the function surface beyond SURVEY's minimum: ranking
  * window functions, correlated-aggregate filters, ordered string
  * aggregation, date-part extraction, and null-semantics operators —
  * all cross-engine exact (total orders, decimal-routed doubles,
  * aligned type casts).
  */
object FunctionBreadth extends QueryModule {

  // ---------------------------------------------------------------
  // q43 — ranking windows: rank / dense_rank / ntile / lead with a
  // total (tie-broken) ORDER BY so every engine agrees row-for-row.
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    T.customer(s, dir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("next_key", lead(col("c_custkey"), 1).over(w))
      .filter(col("rnk") <= 5)
      .select("c_nationkey", "c_custkey", "rnk", "drnk", "quartile", "next_key")
      .orderBy("c_nationkey", "rnk", "c_custkey")
  }

  private val q43Sql =
    """SELECT c_nationkey, c_custkey, rnk, drnk, quartile, next_key FROM (
      |  SELECT c_nationkey, c_custkey,
      |    CAST(RANK() OVER w AS BIGINT) AS rnk,
      |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      |    CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |    LEAD(c_custkey, 1) OVER w AS next_key
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey
      |               ORDER BY c_acctbal DESC, c_custkey))
      |WHERE rnk <= 5
      |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q44 — correlated-aggregate filter: customers above their nation's
  // average balance. DataFrame form = broadcast the 25-row per-nation
  // aggregate (the decorrelated plan Catalyst would produce); oracle
  // states it as the correlated subquery.
  private val avgBal =
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"

  private def q44(s: SparkSession, dir: String): DataFrame = {
    val cust = T.customer(s, dir)
    val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(expr(avgBal).as("nation_avg"))
    cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
      .orderBy("c_custkey")
  }

  private val q44Sql =
    s"""SELECT c_custkey, c_nationkey, c_acctbal,
       |  (SELECT $avgBal FROM customer c2
       |   WHERE c2.c_nationkey = c1.c_nationkey) AS nation_avg
       |FROM customer c1
       |WHERE c_acctbal > (SELECT $avgBal FROM customer c2
       |                   WHERE c2.c_nationkey = c1.c_nationkey)
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q45 — ordered string aggregation per group (collect_list +
  // array_sort + concat_ws ≡ string_agg ORDER BY).
  private def q45(s: SparkSession, dir: String): DataFrame =
    T.supplier(s, dir)
      .groupBy("s_nationkey")
      .agg(
        concat_ws(",", array_sort(collect_list(col("s_name")))).as("names"),
        count(lit(1)).as("n"))
      .orderBy("s_nationkey")

  private val q45Sql =
    """SELECT s_nationkey,
      |  string_agg(s_name, ',' ORDER BY s_name) AS names,
      |  COUNT(*) AS n
      |FROM supplier GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q46 — date-part extraction + aggregation (year/month/quarter,
  // day-of-week aligned across engines: Spark dayofweek is 1=Sunday,
  // DuckDB dayofweek is 0=Sunday).
  private def q46(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .withColumn("m", month(col("o_orderdate")).cast("long"))
      .withColumn("q", quarter(col("o_orderdate")).cast("long"))
      .withColumn("dow", (dayofweek(col("o_orderdate")) - 1).cast("long"))
      .groupBy("y", "q", "m")
      .agg(count(lit(1)).as("n"),
        sum(col("dow")).cast("long").as("sum_dow"))
      .orderBy("y", "q", "m")

  private val q46Sql =
    """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(quarter(ts) AS BIGINT) AS q,
      |  CAST(month(ts) AS BIGINT) AS m, COUNT(*) AS n,
      |  CAST(SUM(dayofweek(ts)) AS BIGINT) AS sum_dow
      |FROM (SELECT CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders)
      |GROUP BY 1, 2, 3
      |ORDER BY y, q, m""".stripMargin

  // ---------------------------------------------------------------
  // q47 — null semantics: NULLIF-created nulls, null-safe equality
  // (<=> vs IS NOT DISTINCT FROM), coalesce fallback, null-aware
  // counting.
  private def q47(s: SparkSession, dir: String): DataFrame =
    T.lineitem(s, dir)
      .withColumn("d0", expr("NULLIF(l_discount, 0.0)"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("d0")).as("n_discounted"),
        sum(expr("CASE WHEN d0 <=> CAST(NULL AS DOUBLE) THEN 1 ELSE 0 END"))
          .cast("long").as("n_zero_disc"),
        expr("CAST(SUM(CAST(coalesce(d0, 0.0) AS DECIMAL(8,2))) AS DOUBLE)")
          .as("sum_disc"))
      .orderBy("l_returnflag")

  private val q47Sql =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  COUNT(d0) AS n_discounted,
      |  CAST(SUM(CASE WHEN d0 IS NOT DISTINCT FROM NULL
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
      |  CAST(SUM(CAST(coalesce(d0, 0.0) AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc
      |FROM (SELECT l_returnflag, NULLIF(l_discount, 0.0) AS d0 FROM lineitem)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // q50 — RANGE-frame window: per event, the sum of `value` over the
  // same user's trailing hour (event-time range frame, not row
  // frame). Numeric epoch-micros ordering so both engines frame
  // identically; peers at equal ts are all included by RANGE
  // semantics, so ties cannot flake the result.
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-3600000000L, 0)
    T.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("hour_sum",
        sum(expr("CAST(value AS DECIMAL(18,2))")).over(w).cast("double"))
      .select("user_id", "event_id", "hour_sum")
      .orderBy("user_id", "event_id")
  }

  private val q50Sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS hour_sum
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------
  // q51 — exact percentiles (order statistics + linear interpolation:
  // Spark `percentile` ≡ DuckDB `quantile_cont`).
  private def q51(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_tp"),
        expr("percentile(o_totalprice, 0.9)").as("p90_tp"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  private val q51Sql =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS median_tp,
      |  quantile_cont(o_totalprice, 0.9) AS p90_tp,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_range_frame" -> (q50 _),
    "q51_percentiles" -> (q51 _),
    "q43_rank_windows" -> (q43 _),
    "q44_correlated_avg" -> (q44 _),
    "q45_string_agg" -> (q45 _),
    "q46_date_parts" -> (q46 _),
    "q47_null_semantics" -> (q47 _))

  override val oracle: Map[String, String] = Map(
    "q50_range_frame" -> q50Sql,
    "q51_percentiles" -> q51Sql,
    "q43_rank_windows" -> q43Sql,
    "q44_correlated_avg" -> q44Sql,
    "q45_string_agg" -> q45Sql,
    "q46_date_parts" -> q46Sql,
    "q47_null_semantics" -> q47Sql)
}
