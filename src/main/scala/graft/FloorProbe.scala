package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose the per-query fixed cost the bench pays 221
  * times — DataFrame construction (`spark.read.parquet` schema/footer
  * work + plan building) vs job execution. Not part of the library
  * surface.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeN(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[floor] $tag: $ms%.1f ms/op")
    }
    timeN("read.parquet(documents) construct", 50) {
      Tables.t(spark, dir, "documents")
    }
    timeN("read.parquet(lineitem) construct", 50) {
      Tables.t(spark, dir, "lineitem")
    }
    val docs = Tables.t(spark, dir, "documents")
    timeN("docs.count() prebuilt", 20) { docs.count() }
    timeN("construct+count documents", 20) {
      Tables.t(spark, dir, "documents").count()
    }
    timeN("trivial agg on docs", 20) {
      import org.apache.spark.sql.functions._
      Tables.t(spark, dir, "documents")
        .groupBy("lang").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
