package graft.plans

import graft.functions.{StEnvelope, StGridCells, StIntersects}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** Catalyst optimizer rule: rewrite a naive spatial theta-join
  *
  *   `left.join(right, expr("st_intersects(lgeom, rgeom)"))`
  *
  * — which Spark can only plan as a BroadcastNestedLoopJoin or a
  * CartesianProduct (O(|L|·|R|) exact-predicate evaluations) — into
  * the grid-bucketed equi-join of
  * [[graft.operators.SpatialJoin.intersectJoin]]:
  *
  *   explode each side's envelope grid cells → hash-join on the cell
  *   id → reference-cell dedup (emit a pair only from the top-left
  *   shared cell, no distinct needed) → exact `st_intersects` last.
  *
  * The user keeps the declarative one-liner; the optimizer supplies
  * the 100 TB plan — the same division of labor Catalyst applies to
  * predicate pushdown. The rewrite is semantics-preserving for any
  * inputs the exact predicate accepts: positive-area intersection
  * implies envelope overlap, so the candidate set is a superset and
  * the ORIGINAL StIntersects expression still decides every pair.
  *
  * Guards:
  *   - inner joins only, with an `st_intersects` conjunct whose
  *     arguments are bound one per side (either order);
  *   - skipped when the condition already has a cross-side equality
  *     conjunct — the join is then already hash-joinable, and this
  *     also makes the rule idempotent (its own output joins on the
  *     exploded cell id);
  *   - cell pitch from `spark.graft.spatial.cellSize` (default 1.0,
  *     ≈ the median geometry extent in geometry units; the session
  *     that owns the query sets it per corpus).
  *
  * Install via `spark.sql.extensions=graft.functions.GraftExtensions`
  * or programmatically with [[SpatialJoinRule.install]].
  */
object SpatialJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotent programmatic registration for sessions built without
    * the extensions conf.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SpatialJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRule

  private def cellSize: Double =
    conf.getConfString("spark.graft.spatial.cellSize", "1.0").toDouble

  private def boundTo(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if conf.getConfString("spark.graft.spatial.autoGridJoin", "true") == "true" => {
      val conjuncts = splitConjunctivePredicates(cond)
      val crossEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (boundTo(a, left) && boundTo(b, right)) ||
            (boundTo(a, right) && boundTo(b, left))
        case _ => false
      }
      val spatial = conjuncts.collectFirst {
        case si @ StIntersects(g1, g2)
            if (boundTo(g1, left) && boundTo(g2, right)) ||
              (boundTo(g1, right) && boundTo(g2, left)) => si
      }
      if (crossEqui || spatial.isEmpty) j
      else rewrite(j, spatial.get, conjuncts.filterNot(_ eq spatial.get))
    }
  }

  private def rewrite(j: Join, si: StIntersects,
      rest: Seq[Expression]): LogicalPlan = {
    val cs = Literal(cellSize, DoubleType)
    val (lGeom, rGeom) =
      if (boundTo(si.left, j.left)) (si.left, si.right) else (si.right, si.left)

    // Per side: project the envelope ONCE (one WKT parse, carried
    // through the join for the reference-cell arithmetic), then
    // explode the overlapped grid cells.
    def prep(child: LogicalPlan, geom: Expression)
        : (LogicalPlan, Attribute, Attribute) = {
      val env = Alias(StEnvelope(geom), "__env")()
      val cell = AttributeReference("__cell", StringType, nullable = false)()
      val gen = Generate(Explode(StGridCells(geom, cs)), Nil, outer = false,
        None, Seq(cell), Project(child.output :+ env, child))
      (gen, env.toAttribute, cell)
    }
    val (lPlan, lEnv, lCell) = prep(j.left, lGeom)
    val (rPlan, rEnv, rCell) = prep(j.right, rGeom)

    // Reference cell = top-left cell of the envelope intersection,
    // from the carried envelopes ([minx, miny, maxx, maxy], 1-based
    // element_at). The Long→Int→String casts reproduce GeoKernel
    // .gridCells' "cx:cy" formatting exactly.
    def minCell(env: Attribute, i: Int): Expression =
      Floor(Divide(ElementAt(env, Literal(i)), cs))
    def axis(i: Int): Expression =
      Cast(Cast(Greatest(Seq(minCell(lEnv, i), minCell(rEnv, i))),
        IntegerType), StringType)
    val refCell = Concat(Seq(axis(1), Literal(":"), axis(2)))

    // Equi-conjunct first (join planning extracts it as the hash
    // key); reference-cell dedup and the EXACT original predicate run
    // as the join's residual filter on the few cell-sharing pairs.
    val newCond = (Seq(EqualTo(lCell, rCell), EqualTo(lCell, refCell), si)
      ++ rest).reduce(And)
    Project(j.output, Join(lPlan, rPlan, Inner, Some(newCond), j.hint))
  }
}
