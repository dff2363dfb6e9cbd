package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: per-stage task counts + names for ONE query's warm
  * serve. {{{ sbt "runMain graft.StageProbe q100_pagerank" }}} */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the whole suite's shared memos the bench way? No — just
    // this query twice (memo build + warm serve).
    SparkEntry.queries(name)(spark, sfDir).count()
    val buf = scala.collection.mutable.Buffer[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = st.stageInfo
          buf += f"[stage] id=${i.stageId} tasks=${i.numTasks} name=${i.name.take(90)}"
        }
      })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    buf.foreach(println)
    println(f"[stage] TOTAL ${buf.size} stages, $sec%.3f s")
    spark.stop()
  }
}
