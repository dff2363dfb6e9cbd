package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: does the two-level assignment (Ivf.assignHierarchical)
  * agree EXACTLY with flat assignment on the gate corpus/model — and
  * at what probeSuper? Run per sf dir with a 16-centroid fixed model
  * (the q53 device widened: vec_id 0,10,...,150 of the quantized
  * corpus).
  *
  * {{{ sbt "runMain graft.HierProbe /root/testdata/sf0.01" }}}
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VecFunctions.register(spark)
    dirs.foreach { dir =>
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), expr(
          """CAST(transform(embedding,
            |  x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS DOUBLE))
            |AS ARRAY<DOUBLE>)""".stripMargin).as("embedding"))
      val centIds = (0 until 16).map(_ * 10L)
      val cents = corpus.filter(col("vec_id").isin(centIds: _*))
        .orderBy("vec_id").select("embedding")
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val n = corpus.count()
      val flat = graft.operators.Ivf.assign(corpus, cents, "embedding")
        .select(col("vec_id"), col("cell").as("cf"))
      Seq(1, 2, 3).foreach { p =>
        val hier = graft.operators.Ivf
          .assignHierarchical(corpus, cents, "embedding", p)
          .select(col("vec_id"), col("cell").as("ch"))
        val agree = flat.join(hier, "vec_id")
          .filter(col("cf") === col("ch")).count()
        println(s"[hierprobe] dir=$dir n=$n k=16 p=$p agree=$agree/" +
          s"$n ${if (agree == n) "EXACT" else "approx"}")
      }
    }
    spark.stop()
  }
}
