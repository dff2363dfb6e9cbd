package graft

import graft.streaming.StreamingChunkDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

object StreamingChunkDedupSpec {
  case class Doc(doc_id: Long, text: String)
  case class TsDoc(ts: Timestamp, doc_id: Long, text: String)
}

class StreamingChunkDedupSpec extends AnyFunSuite with SharedSpark {
  import StreamingChunkDedupSpec._

  private val toksExpr =
    "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  private val rng = new scala.util.Random(53)
  private def words(n: Int, tag: String): String =
    Seq.fill(n)(tag + rng.nextInt(200)).mkString(" ")

  // wave 1: two docs sharing a long boilerplate tail; wave 2: a
  // re-crawl of doc 1 (verbatim) plus one genuinely new doc
  private val boiler = words(120, "b")
  private val d1 = Doc(1, words(40, "x") + " " + boiler)
  private val d2 = Doc(2, words(25, "y") + " " + boiler)
  private val d3 = Doc(3, d1.text)
  private val d4 = Doc(4, words(90, "z"))

  private def batchChunks(docs: Seq[Doc]) = {
    import spark.implicits._
    graft.functions.CdcFunctions.register(spark)
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .select(col("doc_id"), explode(expr("cdc_chunks(toks)")).as("c"))
      .select(col("doc_id"), col("c.n_tok").as("n_tok"), col("c.fp").as("fp"))
  }

  test("streaming first-seen chunk set == batch distinct fingerprints, " +
      "and a duplicate wave admits only novel chunks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingChunkDedup.firstSeenChunks(
      mem.toDF().select(col("doc_id"), expr(toksExpr).as("toks")))
      .writeStream.format("memory").queryName("chunkstore")
      .outputMode("append").start()
    try {
      mem.addData(d1, d2)
      q.processAllAvailable()
      val wave1 = spark.table("chunkstore").collect()
      val batch12 = batchChunks(Seq(d1, d2))
      val distinct12 = batch12.select("fp").distinct().count()
      assert(wave1.length == distinct12)
      // the shared boilerplate tail deduped at chunk granularity:
      // admitted chunks < total chunks of the two docs
      assert(wave1.length < batch12.count())

      mem.addData(d3, d4)
      q.processAllAvailable()
      val all = spark.table("chunkstore").collect()
      // d3 is a verbatim re-crawl of d1 -> contributes NOTHING; d4 is
      // novel -> all the growth is d4's chunks (plus any fp collision
      // would shrink it, never grow it)
      val d4Chunks = batchChunks(Seq(d4)).count()
      assert(all.length == wave1.length + d4Chunks,
        s"wave2 admitted ${all.length - wave1.length}, expected $d4Chunks")
      assert(!all.exists(_.getLong(0) == 3L), "re-crawl chunks leaked")
      // admitted set == batch distinct over everything fed
      val batchAll = batchChunks(Seq(d1, d2, d3, d4))
        .select("fp").distinct().count()
      assert(all.length == batchAll)
    } finally q.stop()
  }

  test("micro-batch slicing does not change the admitted fingerprint set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(name: String, waves: Seq[Seq[Doc]]): Set[String] = {
      val mem = MemoryStream[Doc]
      val q = StreamingChunkDedup.firstSeenChunks(
        mem.toDF().select(col("doc_id"), expr(toksExpr).as("toks")))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        waves.foreach { w => mem.addData(w: _*); q.processAllAvailable() }
        spark.table(name).collect().map(_.getAs[String]("fp")).toSet
      } finally q.stop()
    }
    val a = run("cs_a", Seq(Seq(d1, d2, d3, d4)))
    val b = run("cs_b", Seq(Seq(d1), Seq(d2, d3), Seq(d4)))
    assert(a == b && a.nonEmpty)
  }

  test("watermark-bounded variant re-admits a duplicate past the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TsDoc]
    val q = StreamingChunkDedup.firstSeenChunksWithin(
      mem.toDF().select(col("ts"), col("doc_id"), expr(toksExpr).as("toks")),
      "10 minutes")
      .writeStream.format("memory").queryName("chunkstore_wm")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData(TsDoc(t0, 1, d1.text))
      q.processAllAvailable()
      val n1 = spark.table("chunkstore_wm").count()
      // in-horizon duplicate: suppressed
      mem.addData(TsDoc(Timestamp.valueOf("2024-01-01 10:05:00"), 2, d1.text))
      q.processAllAvailable()
      assert(spark.table("chunkstore_wm").count() == n1)
      // advance event time far past the horizon, then re-send: state
      // for the old fingerprints has expired -> re-admitted
      mem.addData(TsDoc(Timestamp.valueOf("2024-01-01 12:00:00"), 3, d4.text))
      q.processAllAvailable()
      mem.addData(TsDoc(Timestamp.valueOf("2024-01-01 12:01:00"), 4, d1.text))
      q.processAllAvailable()
      val dupRows = spark.table("chunkstore_wm")
        .filter(col("doc_id") === 4L).count()
      assert(dupRows == n1, s"expected horizon-expired re-admission of " +
        s"$n1 chunks, got $dupRows")
    } finally q.stop()
  }
}
