package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: times q210's exact-truth component (the ground-truth
  * Jaccard join behind the LSH operating curve) in its FULL pair
  * universe vs the round-18 PARITY-PARTITIONED form, at each given
  * dir — the evidence that the q28 parity device halves the curve's
  * f² blowup (BASELINE.md SCALING; the full form spilled >40 GB at
  * 100× when probed in round 16).
  *
  * {{{ sbt "runMain graft.LshTruthProbe /root/testdata/sf0.1,/tmp/graft-sfx10" }}}
  *
  * Shingle memo is warmed first (shared by both forms, untimed);
  * each form then runs min-of-2 (ScaleCheck's methodology).
  */
object LshTruthProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      // warm the shared shingle memo so only the join is timed
      queries.Dedup.truthJoinCount(spark, dir, parity = true)
      def timeIt(parity: Boolean): (Double, Long) = {
        var n = 0L
        val t = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          n = queries.Dedup.truthJoinCount(spark, dir, parity)
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, n)
      }
      val (tp, np) = timeIt(parity = true)
      val (tf, nf) = timeIt(parity = false)
      println(f"""{"dir":"$dir","parity_sec":$tp%.2f,"full_sec":$tf%.2f,""" +
        f""""parity_pairs":$np,"full_pairs":$nf,"speedup":${tf / tp}%.2f}""")
    }
    spark.stop()
  }
}
