package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: synthesize a LARGER documents corpus from the sf0.1
  * table's own statistics — unigram vocabulary (with frequencies, via
  * token sampling) and the empirical document-length / lang / source
  * distributions — so the text/dedup family can be TIMED beyond
  * sf0.1 (the one empirical gap the round-7 verdict named). The
  * corpus is deterministic (hash-seeded, no RNG state), written to
  * /tmp, and used for wall-clock evidence only — correctness stays
  * gated on the driver's own tables.
  *
  * {{{ sbt "runMain graft.ScaleCorpus 10 /tmp/graft-sfx10" }}}
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val out = if (args.length > 1) args(1) else s"/tmp/graft-sfx$factor"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    // empirical stats: a 1M-token unigram sample (keeps real df
    // skew), the length distribution, and the (lang, source) pairs
    val vocab = base
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .sample(withReplacement = false, 0.25, seed = 42)
      .limit(1000000).as[String].collect()
    val lens = base
      .selectExpr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
      .as[Int].collect()
    val meta = base.select("lang", "source").as[(String, String)].collect()
    val nBase = lens.length
    println(s"[scalecorpus] vocab sample ${vocab.length}, $nBase base docs, " +
      s"writing ${nBase * factor} docs to $out")

    val bv = spark.sparkContext.broadcast(vocab)
    val bl = spark.sparkContext.broadcast(lens)
    val bm = spark.sparkContext.broadcast(meta)
    def h(a: Long, b: Long): Long = {
      var x = a * 0x9E3779B97F4A7C15L + b
      x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
      x & Long.MaxValue
    }
    spark.range(nBase.toLong * factor).map { i =>
      val len = bl.value(((h(i, 0) % bl.value.length)).toInt)
      val v = bv.value
      val sb = new StringBuilder
      var k = 0
      while (k < len) {
        if (k > 0) sb.append(' ')
        sb.append(v((h(i, k + 1) % v.length).toInt))
        k += 1
      }
      val (lang, source) = bm.value((h(i, -1) % bm.value.length).toInt)
      (i, sb.toString, lang, source, sb.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: jittered copies of the real vectors (±0.01 per dim,
    // hash-seeded) — preserves the cluster structure the IVF family
    // routes on, so index-vs-brute timings stay meaningful
    val baseVecs = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect()
    val bvv = spark.sparkContext.broadcast(baseVecs)
    spark.range(baseVecs.length.toLong * factor).map { i =>
      val (_, v0, lab) = bvv.value((i % bvv.value.length).toInt)
      val v = v0.zipWithIndex.map { case (x, d) =>
        x + ((h(i, 1000L + d) % 2001L) - 1000L) / 100000.0f
      }
      (i, v, lab)
    }.toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[scalecorpus] done: $out (documents + embeddings)")
    spark.stop()
  }
}
