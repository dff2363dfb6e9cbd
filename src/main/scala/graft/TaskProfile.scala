package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (round 20): per-query serve DISPATCH profile — jobs,
  * stages, tasks for one warm execution of every query. The q153
  * adjudication showed dispatch (not data) dominates warm serves at
  * sf0.1, and that a key-cardinality memo cached off a groupBy keeps
  * 32 post-shuffle partitions (AQE cannot re-coalesce a cached plan),
  * fanning every consumer stage into 32 near-empty tasks. This
  * profile finds the rest of that class: sort by tasks, read the
  * memos of the top rows.
  *
  * {{{ sbt "runMain graft.TaskProfile /root/testdata/sf0.1" }}}
  */
object TaskProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // A/B flag: let AQE right-size cached-plan output partitioning
    if (args.length > 1 && args(1) == "aqecache")
      b.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm pass (memos + codegen)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[taskprofile-warm] $n failed: $e")
      }
    }
    // EXECUTED work only (ADVICE r20 #4): jobs from onJobStart, but
    // stages/tasks from onStageCompleted — a stage skipped via
    // cached-exchange reuse never completes, while onJobStart's
    // stageInfos include it, so the old census over-counted exactly
    // the reuse the layout work targets. Per-query isolation comes
    // from draining the listener bus (waitUntilEmpty, the hook
    // Spark's own tests use) before resetting and after running,
    // instead of a racy fixed 50 ms sleep.
    val counts = new java.util.concurrent.atomic.AtomicLongArray(3)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counts.incrementAndGet(0)
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          counts.incrementAndGet(1)
          counts.addAndGet(2, st.stageInfo.numTasks.toLong)
        }
      })
    def drain(): Unit =
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    val rows = names.map { n =>
      drain()
      counts.set(0, 0); counts.set(1, 0); counts.set(2, 0)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => }
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      (n, counts.get(0), counts.get(1), counts.get(2), sec)
    }
    println("[taskprofile] name jobs stages tasks sec tasks_per_stage")
    rows.sortBy(-_._4).foreach { case (n, j, st, ta, sec) =>
      val tps = if (st == 0) 0.0 else ta.toDouble / st
      println(f"[taskprofile] $n $j $st $ta $sec%.3f $tps%.1f")
    }
    val tot = rows.map(_._5).sum
    println(f"[taskprofile] TOTAL jobs=${rows.map(_._2).sum} stages=${rows.map(_._3).sum} tasks=${rows.map(_._4).sum} sec=$tot%.1f")
    spark.stop()
  }
}
