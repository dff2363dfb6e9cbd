package graft

import graft.operators.Components
import org.scalatest.funsuite.AnyFunSuite

/** Connected components: min-label propagation over small known
  * graphs, including transitive chains longer than one hop (the case
  * pairwise near-dup dropping gets wrong).
  */
class ComponentsSpec extends AnyFunSuite with SharedSpark {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, clique, and isolated pair resolve to min-id components") {
    val comp = cc(Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),   // chain 1-2-3-4 (mixed orientation)
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L)))                    // pair
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(comp.size == 9) // only vertices that appear in edges
  }

  test("empty edge set yields an empty result, not a crash") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("long chain converges within the iteration bound") {
    // diameter 12: propagation needs several rounds, not one
    val chain = (1L until 13L).map(i => (i, i + 1))
    val comp = cc(chain)
    assert((1L to 13L).forall(comp(_) == 1L))
  }

  test("label propagation matches a reference union-find") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    assert(cc(edges) == expected)
  }

  test("strict mode surfaces non-convergence at maxIter loudly") {
    import spark.implicits._
    // a 40-vertex chain cannot converge in 1 round even with two
    // pointer jumps; silent exit would split the cluster downstream.
    // maxLocalEdges = 0 forces the distributed loop; handoffEdges = 0
    // disables the contraction cutover so the loop must flood.
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(chain, maxIter = 1, strict = true,
        maxLocalEdges = 0, handoffEdges = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // non-strict completes and a higher cap converges to one component
    val ok = Components.connectedComponents(chain, maxLocalEdges = 0,
        handoffEdges = 0)
      .collect().map(_.getLong(1)).toSet
    assert(ok == Set(1L))
  }

  test("contraction handoff finishes a long chain exactly in one round") {
    import spark.implicits._
    // the worst case for min-label flooding (diameter = n) is exactly
    // what the contraction cutover shortcuts: one distributed round,
    // then the driver-sized residual is solved with union-find. The
    // labels must still be the EXACT per-component minima.
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(chain, maxIter = 3,
        strict = true, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 60 && got.values.forall(_ == 1L))
  }

  test("driver fast path and distributed loop agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val fast = Components.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Components.connectedComponents(df, maxLocalEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    assert(fast.nonEmpty)
  }
}
