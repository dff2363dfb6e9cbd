package graft

import graft.functions.GeoFunctions
import graft.plans.SpatialJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FilterExec, FormattedMode}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule that turns a naive `st_intersects` theta-join
  * into the grid-bucketed equi-join: plan shape (no nested-loop /
  * cartesian) and result equality against the un-rewritten join.
  */
class SpatialJoinRuleSpec extends AnyFunSuite with SharedSpark {

  private def boxes(n: Int, shift: Double, tag: String) = {
    import spark.implicits._
    (0 until n).map { i =>
      val x = (i % 10) * 3.0 + shift; val y = (i / 10) * 3.0 + shift
      (s"$tag$i",
        s"POLYGON (($x $y, ${x + 2} $y, ${x + 2} ${y + 2}, $x ${y + 2}, $x $y))")
    }.toDF(s"${tag}_id", s"${tag}_geom")
  }

  /** Every nested-loop join left in the rewritten plan must be the
    * guarded oversized-row fallback — i.e. sit above an
    * `st_cell_count` routing filter — never the unguarded O(|L|·|R|)
    * plan the rule exists to remove.
    */
  private def assertNestedLoopsGuarded(df: DataFrame): Unit = {
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), p)
    val bnl = df.queryExecution.sparkPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    bnl.foreach(b => assert(b.exists {
      case f: FilterExec => f.condition.toString.contains("st_cell_count")
      case _ => false
    }, s"unguarded nested-loop join:\n$p"))
  }

  private def bruteForce(l: DataFrame, r: DataFrame): Set[(String, String)] = {
    spark.conf.set("spark.graft.spatial.autoGridJoin", "false")
    try l.crossJoin(r).filter(expr("st_intersects(l_geom, r_geom)"))
      .select("l_id", "r_id").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    finally spark.conf.set("spark.graft.spatial.autoGridJoin", "true")
  }

  test("rewrites naive st_intersects join to a cell equi-join") {
    GeoFunctions.register(spark)
    SpatialJoinRule.install(spark)
    val l = boxes(40, 0.0, "l")
    val r = boxes(40, 1.0, "r")
    val naive = l.join(r, expr("st_intersects(l_geom, r_geom)"))
    val p = naive.queryExecution.explainString(FormattedMode)
    assert("""Generate \(\d+\)""".r.findAllIn(p).length == 2, p) // both cell explodes
    assertNestedLoopsGuarded(naive)
    // the rewrite is exact: same pairs as evaluating the predicate
    // over the full cross product with the rule disabled
    val brute = bruteForce(l, r)
    val got = naive.select("l_id", "r_id").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(got.length == got.toSet.size, "reference-cell dedup failed")
    assert(got.toSet == brute, "pair set diverged")
    assert(got.nonEmpty)
  }

  test("oversized geometries route through the guarded theta-join " +
      "fallback instead of exploding") {
    GeoFunctions.register(spark)
    SpatialJoinRule.install(spark)
    import spark.implicits._
    // envelope 30000×30000 at pitch 1.0 → 9·10⁸ cells: exploding it
    // would trip st_grid_cells' hard cap (and, pre-guard, allocate
    // gigabytes). The maxCellsPerRow split must keep it un-exploded.
    val wide = Seq(("lBIG",
      "POLYGON ((-15000 -15000, 15000 -15000, 15000 15000, " +
        "-15000 15000, -15000 -15000))")).toDF("l_id", "l_geom")
    val l = boxes(40, 0.0, "l").union(wide)
    val r = boxes(40, 1.0, "r")
    val naive = l.join(r, expr("st_intersects(l_geom, r_geom)"))
    assertNestedLoopsGuarded(naive)
    val got = naive.select("l_id", "r_id").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(got.length == got.toSet.size, "fallback branches overlap")
    assert(got.toSet == bruteForce(l, r), "pair set diverged")
    // the continent-sized polygon covers every right-side box
    assert(got.count(_._1 == "lBIG") == 40)
  }

  test("joins with an existing cross-side equality are left alone") {
    GeoFunctions.register(spark)
    SpatialJoinRule.install(spark)
    val l = boxes(10, 0.0, "l").withColumn("k", expr("substring(l_id, 2)"))
    val r = boxes(10, 1.0, "r").withColumn("k2", expr("substring(r_id, 2)"))
    val j = l.join(r, expr("k = k2 AND st_intersects(l_geom, r_geom)"))
    val p = j.queryExecution.explainString(FormattedMode)
    assert(!"""Generate \(\d+\)""".r.findAllIn(p).hasNext, p) // no rewrite
    assert(j.count() > 0)
  }
}
