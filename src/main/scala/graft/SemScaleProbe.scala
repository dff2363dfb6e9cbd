package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the q211 SCALING question: the gated row's FROZEN
  * 8-centroid demo model makes within-cell occupancy grow linearly
  * with the corpus, so the eval×train pair set grows QUADRATICALLY —
  * a model artifact, not an operator defect. The production
  * discipline (SemDeDup: cluster count scales with the corpus so
  * per-cell occupancy stays bounded) keeps the same plan linear.
  * This probe times q211's exact join shape (Ivf.assign + within-cell
  * eval×train cosine + threshold) with the cell budget held at
  * ~n/600 vectors per cell across three corpus decades.
  *
  * {{{ sbt "runMain graft.SemScaleProbe" }}}
  */
object SemScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VecFunctions.register(spark)
    val dirs = Seq(
      "/root/testdata/sf0.1" -> 8,
      "/tmp/graft-sfx10" -> 80,
      "/tmp/graft-sfx100" -> 800)
    dirs.foreach { case (dir, k) =>
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"),
          expr("CAST(embedding AS ARRAY<DOUBLE>)").as("embedding"))
        .withColumn("n2", expr("vec_dot_d(embedding, embedding)"))
      val n = corpus.count()
      val stride = math.max(1L, n / k)
      val cents = corpus.filter(col("vec_id") % stride === 0)
        .orderBy("vec_id").limit(k)
        .select("embedding").collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      def run(hier: Boolean = false): Long = {
        val assigned =
          if (hier) graft.operators.Ivf.assignHierarchical(
            corpus, cents, "embedding", probeSuper = 2)
          else graft.operators.Ivf.assign(corpus, cents, "embedding")
        val ev = assigned.filter(col("vec_id") % 11 === 0)
          .select(col("vec_id").as("eval_id"), col("cell"),
            col("embedding").as("ve"), col("n2").as("ne"))
        val tr = assigned.filter(col("vec_id") % 11 =!= 0)
          .select(col("vec_id").as("train_id"), col("cell").as("cell_t"),
            col("embedding").as("vt"), col("n2").as("nt"))
        ev.join(tr, col("cell") === col("cell_t"))
          .withColumn("cosine",
            expr("vec_dot_d(ve, vt) / (sqrt(ne) * sqrt(nt))"))
          .filter(col("cosine") >= 0.995)
          .count()
      }
      run() // warmup
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val hits = run()
        ((System.nanoTime() - t0) / 1e9, hits)
      }
      println(f"[semscale] dir=$dir n=$n cells=$k " +
        f"hits=${times.head._2} min=${times.map(_._1).min}%.2f s")

      // the SAME end-to-end audit with the two-level router in place
      // of flat assignment — the production SemDeDup shape once k
      // grows with the corpus (hits differ slightly where routing
      // disagrees with flat; the q211 gate pins that recall)
      run(hier = true) // warmup
      val timesH = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val hits = run(hier = true)
        ((System.nanoTime() - t0) / 1e9, hits)
      }
      println(f"[semscale] dir=$dir n=$n cells=$k HIER " +
        f"hits=${timesH.head._2} min=${timesH.map(_._1).min}%.2f s")

      // ASSIGNMENT-ONLY bend (the round-16 finding's fix): flat
      // nearest-centroid is O(n·k); two-level routing
      // (Ivf.assignHierarchical, g = ⌈√k⌉ supercenters, probe 2) is
      // O(n·√k). Same reduce (sum of cells) on both so the timed
      // work is the assignment expression, not the sink.
      def timeAssign(label: String, mk: () => org.apache.spark.sql.DataFrame)
          : Unit = {
        mk().agg(sum("cell")).collect() // warmup
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          mk().agg(sum("cell")).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[semscale-assign] dir=$dir n=$n k=$k $label " +
          f"min=${ts.min}%.2f s")
      }
      timeAssign("flat",
        () => graft.operators.Ivf.assign(corpus, cents, "embedding"))
      timeAssign("hier(g=sqrt,p=2)",
        () => graft.operators.Ivf.assignHierarchical(
          corpus, cents, "embedding", probeSuper = 2))
    }
    spark.stop()
  }
}
