package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE named query from [[SparkEntry.queries]].
  *
  * {{{ sbt "runMain graft.TimeOne q70_cc_distributed /root/testdata/sf0.1 3" }}}
  *
  * First execution is an untimed warmup (codegen + JIT), mirroring
  * [[Bench]]'s methodology, then `passes` timed runs print per-pass
  * seconds and the minimum.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    q(spark, sfDir).count() // warmup
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name rows=$n $s%.2f s")
      s
    }
    println(f"[timeone] min=${times.min}%.2f s")
    spark.stop()
  }
}
