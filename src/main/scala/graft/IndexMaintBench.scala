package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: wall-clock the ANN index MAINTENANCE path (encode,
  * save, append, delete, compact, search) on a given corpus dir —
  * the build-side numbers TimeOne's warmup pass hides for q117/q121/
  * q122. {{{ sbt "runMain graft.IndexMaintBench /tmp/graft-sfx100" }}}
  */
object IndexMaintBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{IndexStore, Ivf, Pq}

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[maint] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus = graft.operators.FixedModel.quantizedCast(spark, dir)
    val n = corpus.count()
    println(s"[maint] corpus $dir: $n vectors")
    val cents = graft.operators.FixedModel.centroids(corpus,
      Seq(0L, 10L, 20L, 30L))
    val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)

    val encoded = timed("encode (assign + pq, materialized)") {
      val e = Pq.encode(Ivf.assign(corpus, cents, "embedding"), codebooks,
        "embedding").localCheckpoint()
      e.count(); e
    }
    val out = java.nio.file.Files
      .createTempDirectory("graft-maint-bench").toString
    timed(s"save 90% ($out)") {
      IndexStore.save(encoded.filter(col("vec_id") % 10 =!= 9),
        cents, codebooks, out)
    }
    timed("append 10%") {
      IndexStore.append(encoded.filter(col("vec_id") % 10 === 9), out)
    }
    timed("delete 10% (cell-pruned repair)") {
      IndexStore.delete(spark, out,
        corpus.filter(col("vec_id") % 10 === 3).select("vec_id"))
    }
    timed("compact") { IndexStore.compact(spark, out) }
    timed("vacuum (GC superseded versions)") {
      IndexStore.vacuum(spark, out, minAgeMs = 0L)
    }
    println("[maint] history:")
    IndexStore.history(spark, out).show(false)
    val probed = Ivf.probeCells(corpus.filter(col("vec_id") < 8), cents,
      nProbe = 2)
    timed("search warm") {
      Pq.adcSearchCells(IndexStore.loadCodes(spark, out), codebooks,
        probed, topK = 3).count()
    }
    timed("search again") {
      Pq.adcSearchCells(IndexStore.loadCodes(spark, out), codebooks,
        probed, topK = 3).count()
    }
    println("[maint] stats:")
    IndexStore.stats(spark, out).show(false)
    spark.stop()
  }
}
