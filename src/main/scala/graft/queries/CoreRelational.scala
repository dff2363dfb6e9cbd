package graft.queries

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator inventory (SURVEY.md §2.2, §2.4, §2.5,
  * §2.7, §2.8, §2.9): filters/projections P1–P10, joins J1–J4,
  * aggregations A1–A4, sorts/limits O1–O5, scalar functions F1–F13,
  * expressed over the driver testdata star schema.
  *
  * Scale notes (100 TB stance): dimension tables (region/nation/
  * customer-at-filtered-selectivity/part/supplier) are broadcast so
  * fact-side scans never shuffle for the join; aggregations are plain
  * groupBy so Catalyst plans partial (map-side) aggregation; all
  * top-k queries are sort+limit so Catalyst collapses them to
  * TakeOrderedAndProject (no global sort materialization).
  */
object CoreRelational extends QueryModule {

  // Shared SQL fragments — used verbatim by BOTH the Spark plan (via
  // expr()) and the DuckDB oracle, so the arithmetic is textually
  // identical on both engines.
  private val sumBase =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
  private val sumDisc =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
  private val avgQty = "CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)"
  private val sumTotal =
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------
  // q01 — A1 group-by aggregate (pricing summary, TPC-H Q1 shape).
  // Partial aggregation happens map-side; only (flag,status) groups
  // shuffle. At 100 TB this is the canonical 2-phase hash agg.
  private def q01(s: SparkSession, dir: String): DataFrame =
    T.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        expr(sumBase).as("sum_base_price"),
        expr(sumDisc).as("sum_disc_price"),
        expr(avgQty).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       | SUM(l_quantity) AS sum_qty,
       | $sumBase AS sum_base_price,
       | $sumDisc AS sum_disc_price,
       | $avgQty AS avg_qty,
       | COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q02 — P2/P4/P5 conjunctive filter + projection. Both the
  // predicates and the 4-column projection reach the parquet scan
  // (PushedFilters / ReadSchema) — at 100 TB this is the difference
  // between reading 4 columns of a date-pruned slice and the world.
  private def q02(s: SparkSession, dir: String): DataFrame =
    T.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-06-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.08)
        && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.08
      |  AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------
  // q03 — flagship: the reference's select→score→pick pipeline
  // (SURVEY §3 E3) on the star schema: filter (P2/P4) → 3-way join
  // (J1-as-equi-join; filtered customer dim broadcast) → group-score
  // (A1/F12) → top-k with tie-break (A2/O1–O3 →
  // TakeOrderedAndProject).
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val cust = T.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = T.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = T.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(broadcast(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey"))),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(expr(sumDisc).as("revenue"))
      .select(col("l_orderkey"),
        expr("CAST(o_orderdate AS TIMESTAMP_NTZ)").as("o_orderdate"),
        col("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    s"""SELECT l_orderkey, o_orderdate, $sumDisc AS revenue
       |FROM customer
       |JOIN orders   ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // q04 — A2 argmax-with-tiebreak, windowed per-group form (the
  // reference's sort→head generalized to per-partition row_number).
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), col("c_custkey"))
    T.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey")
  }

  private val q04Sql =
    """SELECT c_nationkey, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn = 1
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q05 — J4/P7 left-semi join (EXISTS). Broadcast the filtered
  // build side: at scale the big-order id set is small.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val big = T.orders(s, dir).filter(col("o_totalprice") > 450000.0)
    T.customer(s, dir)
      .join(broadcast(big), col("c_custkey") === big("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q06 — left-anti join (NOT EXISTS): customers who never placed a
  // big-ticket order.
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val ord = T.orders(s, dir).filter(col("o_totalprice") > 300000.0)
    T.customer(s, dir)
      .join(ord, col("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q07 — O1–O3/O5 top-k: sort+limit → TakeOrderedAndProject (per-
  // partition heaps + driver merge of k rows; no global sort at scale).
  private def q07(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        expr("CAST(o_orderdate AS TIMESTAMP_NTZ)").as("o_orderdate"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(15)

  private val q07Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 15""".stripMargin

  // ---------------------------------------------------------------
  // q08 — multi-join star aggregation: region ⋈ nation ⋈ customer ⋈
  // orders. All dims broadcast → the orders fact table never
  // shuffles for the joins; only the tiny (region,nation) group
  // keys shuffle for the final agg.
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val r = T.region(s, dir); val n = T.nation(s, dir)
    val c = T.customer(s, dir); val o = T.orders(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), expr(sumTotal).as("total_rev"))
      .orderBy("r_name", "n_name")
  }

  private val q08Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS n_orders, $sumTotal AS total_rev
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------
  // q09 — F1–F5 scalar string functions: split+index, substring,
  // concat, case change, length, regex predicate. All codegen'd
  // built-ins — no UDFs in the hot path.
  private def q09(s: SparkSession, dir: String): DataFrame =
    T.part(s, dir)
      .select(
        col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("name_head"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_type"), 1, 3).as("type_code"),
        concat_ws("_", col("p_brand"), col("p_size").cast("string")).as("sku"),
        length(col("p_name")).as("name_len"),
        col("p_name").rlike("widget$").as("is_widget"))
      .orderBy("p_partkey")

  private val q09Sql =
    """SELECT p_partkey,
      | string_split(p_name, ' ')[1] AS name_head,
      | upper(p_brand) AS brand_up,
      | substring(p_type, 1, 3) AS type_code,
      | concat_ws('_', p_brand, CAST(p_size AS VARCHAR)) AS sku,
      | CAST(length(p_name) AS INTEGER) AS name_len,
      | regexp_matches(p_name, 'widget$') AS is_widget
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q10 — A4 + distinct aggregate: count, count-distinct, min/max.
  private def q10(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("nd_cust"),
        min("o_totalprice").as("min_tp"),
        max("o_totalprice").as("max_tp"),
        expr(sumTotal).as("sum_tp"))
      .orderBy("o_orderpriority")

  private val q10Sql =
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       | COUNT(DISTINCT o_custkey) AS nd_cust,
       | MIN(o_totalprice) AS min_tp, MAX(o_totalprice) AS max_tp,
       | $sumTotal AS sum_tp
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q11 — F7/F12 conditional bucketing (CASE WHEN) + agg.
  private val bucketExpr =
    "CASE WHEN l_quantity < 10 THEN 'low' " +
      "WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END"

  private def q11(s: SparkSession, dir: String): DataFrame =
    T.lineitem(s, dir)
      .withColumn("bucket", expr(bucketExpr))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .orderBy("bucket")

  private val q11Sql =
    s"""SELECT $bucketExpr AS bucket, COUNT(*) AS n,
       | SUM(l_quantity) AS sum_qty
       |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  // q12 — §2.8 relational set op: UNION ALL of two tagged key sets.
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val c = T.customer(s, dir)
      .select(lit("customer").as("kind"), col("c_custkey").as("id"))
    val p = T.supplier(s, dir)
      .select(lit("supplier").as("kind"), col("s_suppkey").as("id"))
    c.unionAll(p).orderBy("kind", "id")
  }

  private val q12Sql =
    """SELECT * FROM (
      |  SELECT 'customer' AS kind, c_custkey AS id FROM customer
      |  UNION ALL
      |  SELECT 'supplier' AS kind, s_suppkey AS id FROM supplier)
      |ORDER BY kind, id""".stripMargin

  // ---------------------------------------------------------------
  // q13 — rollup (grouping-sets family). Null grouping keys are
  // coalesced to 'ALL' so cross-engine NULL sort order is moot.
  private def q13(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"))
      .orderBy("priority", "status")

  private val q13Sql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status, COUNT(*) AS n
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  // ---------------------------------------------------------------
  // q14 — N1/N2 nested-data unpack: JSON attribute extraction
  // (the reference's Attributes pivot, SURVEY §2.3) over events.props.
  private def q14(s: SparkSession, dir: String): DataFrame =
    T.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  private val q14Sql =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      | MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      | MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q15 — DISTINCT projection.
  private def q15(s: SparkSession, dir: String): DataFrame =
    T.customer(s, dir)
      .select("c_nationkey", "c_mktsegment")
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  private val q15Sql =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q40/q41 — §2.8 set ops: INTERSECT / EXCEPT between the nation-key
  // sets of customers vs suppliers. Spark plans both as aggregates +
  // a semi/anti join — at scale these are one shuffle on the compared
  // key set, nothing more.
  private def q40(s: SparkSession, dir: String): DataFrame =
    T.customer(s, dir).filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("k"))
      .intersect(T.supplier(s, dir).filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("k")))
      .orderBy("k")

  private val q40Sql =
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
      |INTERSECT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY k""".stripMargin

  private def q41(s: SparkSession, dir: String): DataFrame =
    T.customer(s, dir).select(col("c_nationkey").as("k"))
      .except(T.supplier(s, dir).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("k")))
      .orderBy("k")

  private val q41Sql =
    """SELECT c_nationkey AS k FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
      |ORDER BY k""".stripMargin

  // q42 — cube (full grouping-sets lattice), null keys coalesced.
  private def q42(s: SparkSession, dir: String): DataFrame =
    T.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  private val q42Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // ---------------------------------------------------------------
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_intersect" -> (q40 _),
    "q41_except" -> (q41 _),
    "q42_cube" -> (q42 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_top_revenue" -> (q03 _),
    "q04_argmax_tiebreak" -> (q04 _),
    "q05_semi_join" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_topk_orders" -> (q07 _),
    "q08_multi_join_agg" -> (q08 _),
    "q09_string_funcs" -> (q09 _),
    "q10_agg_stats" -> (q10 _),
    "q11_case_bucket" -> (q11 _),
    "q12_union_all" -> (q12 _),
    "q13_rollup" -> (q13 _),
    "q14_json_unpack" -> (q14 _),
    "q15_distinct" -> (q15 _))

  override val oracle: Map[String, String] = Map(
    "q40_intersect" -> q40Sql,
    "q41_except" -> q41Sql,
    "q42_cube" -> q42Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_top_revenue" -> q03Sql,
    "q04_argmax_tiebreak" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_topk_orders" -> q07Sql,
    "q08_multi_join_agg" -> q08Sql,
    "q09_string_funcs" -> q09Sql,
    "q10_agg_stats" -> q10Sql,
    "q11_case_bucket" -> q11Sql,
    "q12_union_all" -> q12Sql,
    "q13_rollup" -> q13Sql,
    "q14_json_unpack" -> q14Sql,
    "q15_distinct" -> q15Sql)
}
