package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-internal invariants of the round-7 analytics additions —
  * properties that must hold regardless of the DuckDB twin (which
  * certifies cross-engine value equality, not semantics): the
  * documented order-independence claims under physical re-layout,
  * and the algebraic identities each operator is built on.
  */
class QueryInvariantsSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq

  test("q97 cluster cohesion is aggregation-layout-invariant") {
    // the exact-integer sum-vector argument says accumulation order
    // cannot matter; vary the shuffle layout (and with it the
    // partial-aggregation grouping and reduction order) and demand
    // bit-identical output
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val outs = Seq("1", "7", "32").map { n =>
        spark.conf.set(key, n)
        rows("q97_cluster_cohesion")
      }
      assert(outs.distinct.size == 1,
        s"cohesion diverged across shuffle layouts")
    } finally spark.conf.set(key, orig)
  }

  test("q96 recall audit: recall is in [0, 1] and hits match the " +
      "intersection definition") {
    val df = SparkEntry.queries("q96_ann_recall")(spark, dir)
    val bad = df.filter(col("recall") < 0 || col("recall") > 1
      || col("hits") =!= (col("recall") * 5).cast("long")).count()
    assert(bad == 0)
  }

  test("q100 pagerank conserves probability mass") {
    // on the symmetrized graph every node has out-degree >= 1, so
    // each iteration redistributes all mass: sum(pr) == 1 up to the
    // per-node round-6 output rounding (n/2 * 1e-6 worst case)
    val df = SparkEntry.queries("q100_pagerank")(spark, dir)
    val n = df.count()
    val total = df.agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) <= n * 5e-7 + 1e-9,
      s"mass $total over $n nodes")
  }

  test("q101 cohort matrix: n_active never exceeds cohort_size and " +
      "every cohort is fully active in its onboarding week") {
    val df = SparkEntry.queries("q101_cohort_retention")(spark, dir).cache()
    assert(df.filter(col("n_active") > col("cohort_size")).count() == 0)
    // a user is by definition active in the week containing their
    // first-seen day: retention == 1.0 at week = cohort DIV 7
    val onboarding = df.filter(col("week") === expr("CAST(cohort DIV 7 AS INT)"))
    assert(onboarding.filter(col("retention") =!= 1.0).count() == 0)
  }

  test("q99 ledger never reports more drops than droppable windows") {
    val df = SparkEntry.queries("q99_window_dedup")(spark, dir)
    assert(df.filter(col("n_dropped") >= col("n_windows")).count() == 0)
    assert(df.filter(col("drop_ratio") <= 0 || col("drop_ratio") >= 1)
      .count() == 0)
  }
}
