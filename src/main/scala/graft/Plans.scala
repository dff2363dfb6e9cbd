package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * pushdown/broadcast/codegen story is inspectable (SURVEY.md §4).
  * Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q03_top_revenue", "q25_knn_brute")
    // SPARK_GRAFT_PLANS_DIR overrides the stock sf0.001 dir — round
    // 22's broadcast-vs-shuffle gate reads plans at the 10x
    // ScaleCorpus size, where the planner's estimates (not the
    // bench-sf ones) decide the join strategy
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
      "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
