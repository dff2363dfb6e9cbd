package graft

import graft.functions.GeoFunctions
import graft.plans.SpatialJoinRule
import org.apache.spark.sql.execution.FormattedMode
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

  test("rewrites naive st_intersects join to a cell equi-join") {
    GeoFunctions.register(spark)
    SpatialJoinRule.install(spark)
    val l = boxes(40, 0.0, "l")
    val r = boxes(40, 1.0, "r")
    val naive = l.join(r, expr("st_intersects(l_geom, r_geom)"))
    val p = naive.queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert("""Generate \(\d+\)""".r.findAllIn(p).length == 2, p) // both cell explodes
    // the rewrite is exact: same pairs as evaluating the predicate
    // over the full cross product with the rule disabled
    spark.conf.set("spark.graft.spatial.autoGridJoin", "false")
    val brute =
      try l.crossJoin(r).filter(expr("st_intersects(l_geom, r_geom)"))
        .select("l_id", "r_id").collect().map(x => (x.getString(0), x.getString(1))).toSet
      finally spark.conf.set("spark.graft.spatial.autoGridJoin", "true")
    val got = naive.select("l_id", "r_id").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(got.length == got.toSet.size, "reference-cell dedup failed")
    assert(got.toSet == brute, "pair set diverged")
    assert(got.nonEmpty)
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
