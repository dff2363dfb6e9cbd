package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: sf-scaling sweep over headline queries — the check
  * that catches a plan whose cost grows faster than its data (q99's
  * round-7 rewrite was justified exactly this way: a 4.7× sf-scaling
  * exposed the explode-shuffle plan). Results feed BASELINE.md's
  * SCALING table.
  *
  * {{{ sbt "runMain graft.ScaleCheck q03_top_revenue,q28_ngram_jaccard" }}}
  *
  * Per (query, sf): one untimed warmup, then min of `passes` timed
  * runs (Bench's methodology). The printed exponent is
  * log10 t(sf0.1)/t(sf0.01) — data grows 10× per step, so ≤ 1.0 is
  * at-worst-linear scaling; job overhead keeps small-sf times flat,
  * which UNDERSTATES growth, so an exponent near 1 at this size
  * already warrants a plan read.
  */
object ScaleCheck {
  private val defaults = Seq("q03_top_revenue", "q28_ngram_jaccard",
    "q53_ivf_search", "q70_cc_distributed", "q99_window_dedup",
    "q103_ivfpq_search", "q106_embed_drift_psi", "q107_mixture_interleave",
    "q108_cell_migration", "q109_boilerplate_prefixes", "q110_token_budget",
    "q111_containment", "q112_pipeline_ledger")
  private val sfs = Seq("0.001", "0.01", "0.1")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args(0).split(",").toSeq else defaults
    val passes = if (args.length > 1) args(1).toInt else 2
    // optional explicit dir list (e.g. a ScaleCorpus output) instead
    // of the three stock sf dirs
    val dirs =
      if (args.length > 2) args(2).split(",").toSeq
      else sfs.map(s => s"/root/testdata/sf$s")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val q = SparkEntry.queries(name)
      val times = dirs.map { dir =>
        q(spark, dir).count() // warmup
        val t = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          q(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[scale] $name dir=$dir $t%.3f s")
        t
      }
      if (times.length == 3 && args.length <= 2) {
        val e1 = math.log10(times(1) / times(0))
        val e2 = math.log10(times(2) / times(1))
        println(f"[scale] $name exponents: 0.001->0.01 $e1%.2f, 0.01->0.1 $e2%.2f")
      } else if (times.length >= 2) {
        println(f"[scale] $name ratio last/first: ${times.last / times.head}%.2f")
      }
    }
    spark.stop()
  }
}
