package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) join evidence — SURVEY.md §4 / the builder
  * brief's "bucketing for co-located joins": when both fact tables are
  * bucketed on the join key, the sort-merge join needs NO exchange on
  * either side; at 100 TB this removes the two largest shuffles of a
  * fact-fact join entirely.
  */
class BucketingSpec extends AnyFunSuite with SharedSpark {

  test("join of two tables bucketed on the key plans no shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "o_payload")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_orders")
    (1 to 3000).map(i => ((i % 1000 + 1).toLong, i, s"l$i"))
      .toDF("k", "line", "l_payload")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_lines")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("b_orders").join(spark.table("b_lines"), "k")
      assert(j.count() == 3000)
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected bucket join without exchanges, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
