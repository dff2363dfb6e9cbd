package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: wall-clock `graft.operators.Bpe.train` across MERGE
  * COUNTS (the round-9 verdict's ask: q125 trains 3 rounds, a real
  * tokenizer trains 32k — is the per-round cost vocabulary-bound, or
  * does the driver round-trip dominate as merges grow?).
  *
  * Prints one line per (corpus, steps): total seconds, seconds per
  * merge round, and the symbolized-vocabulary row count at the end
  * (the working set — it SHRINKS as merges fuse symbols, so if the
  * algorithm is vocabulary-bound the per-round cost must be flat or
  * falling in `steps`).
  *
  * A corpus argument of the form `synth:N` swaps in a deterministic
  * hash-seeded vocabulary of N distinct words with Zipfian counts —
  * the driver's corpora have a ~31-word vocabulary (training
  * exhausts at ~90 merges), so realistic merge counts need a
  * realistic vocabulary. Wall-clock evidence only; correctness stays
  * gated on q125's oracle.
  *
  * {{{ sbt "runMain graft.BpeScaleBench /root/testdata/sf0.1,synth:100000 10,100,300" }}}
  */
object BpeScaleBench {

  /** Deterministic word: 3..14 lower-case letters from a mixed hash. */
  private def synthWord(i: Long): String = {
    var x = i * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    def next(): Long = { x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 29; x & Long.MaxValue }
    val len = 3 + (next() % 12).toInt
    (0 until len).map(_ => ('a' + (next() % 26).toInt).toChar).mkString
  }

  def main(args: Array[String]): Unit = {
    val dirs = (if (args.nonEmpty) args(0)
      else "/root/testdata/sf0.1").split(",").toSeq
    val stepCounts = (if (args.length > 1) args(1) else "10,100")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { dir =>
      val vocab = (if (dir.startsWith("synth:")) {
        val n = dir.drop(6).toLong
        spark.range(n)
          .map(i => (synthWord(i), n / (i + 1))) // Zipfian counts
          .toDF("w", "n")
          .groupBy("w").agg(sum("n").as("n")) // hash collisions fold
      } else Tables.documents(spark, dir)
        .select(explode(expr(
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      ).cache()
      val nWords = vocab.count()
      // warmup: JIT + codegen for all three round plan shapes
      graft.operators.Bpe.train(vocab, steps = 2)
      graft.operators.Bpe.trainBatched(vocab, steps = 2)
      graft.operators.Bpe.trainIncremental(vocab, steps = 2)
      stepCounts.foreach { steps =>
        val t0 = System.nanoTime()
        val (merges, fin) = graft.operators.Bpe.train(vocab, steps)
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = fin.count()
        val t1 = System.nanoTime()
        val (bm, _) = graft.operators.Bpe.trainBatched(vocab, steps)
        val bsecs = (System.nanoTime() - t1) / 1e9
        require(bm == merges, "trainBatched diverged from train")
        val t2 = System.nanoTime()
        val (im, _) = graft.operators.Bpe.trainIncremental(vocab, steps)
        val isecs = (System.nanoTime() - t2) / 1e9
        require(im == merges, "trainIncremental diverged from train")
        println(f"[bpescale] dir=$dir words=$nWords steps=$steps " +
          f"got=${merges.size} seq=$secs%.1f s " +
          f"(perRound=${secs / math.max(1, merges.size)}%.3f) " +
          f"batched=$bsecs%.1f s " +
          f"(perMerge=${bsecs / math.max(1, bm.size)}%.3f) " +
          f"incr=$isecs%.1f s " +
          f"(perMerge=${isecs / math.max(1, im.size)}%.3f) " +
          f"finalRows=$rows")
      }
      vocab.unpersist()
    }
    spark.stop()
  }
}
