package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.{FixedModel, IndexStore, Ivf, Pq}
import graft.streaming.{StreamingChunkDedup, StreamingIndexIngest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

object StreamingPipelineSpec {
  /** Poll row type at top level so the Dataset encoder resolves. */
  case class PolledDoc(doc_id: Long, text: String)
}

/** END-TO-END streaming composition (round-12 verdict ask #4): the
  * three §2.11 pieces run as ONE pipeline —
  *
  *   catalog poll (live DSv2 scan over a loopback socket, re-serving
  *   the whole catalog every tick like the reference's re-poll)
  *     → CDC chunk dedup (dropDuplicates keyed state on fp)
  *       → IndexStore append (per-batch marker commit log)
  *
  * — with a FORCED restart mid-stream: the query is stopped, the
  * checkpoint's last commit record is deleted (the crash window:
  * sink work done, checkpoint commit lost), and a new query resumes
  * from the same checkpoint. Structured Streaming then REPLAYS the
  * last micro-batch into foreachBatch — the at-least-once path — and
  * the marker log must make the replayed append a no-op, while the
  * restored dropDuplicates state must keep deduping re-polled and
  * re-crawled documents against chunks admitted BEFORE the restart.
  * Exactly-once chunk admission is asserted as set equality: the
  * index's vec_ids equal the batch-computed distinct chunk
  * fingerprints of every distinct document ever served.
  */
class StreamingPipelineSpec extends AnyFunSuite with SharedSpark {
  import StreamingPipelineSpec.PolledDoc

  private val toksExpr =
    "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  // deterministic pseudo-embedding per chunk: 8 dims from the chunk
  // fingerprint (the spec's concern is plumbing + exactly-once, not
  // embedding semantics; a real pipeline would call its encoder here)
  private def embed(chunks: DataFrame): DataFrame =
    chunks.select(expr("xxhash64(fp)").as("vec_id"),
      array((0 until 8).map(i =>
        (pmod(expr(s"xxhash64(fp, $i)"), lit(1000L)).cast("double") / lit(100.0))): _*)
        .as("embedding"))

  private val cents: Seq[Seq[Double]] =
    Seq.tabulate(4)(c => Seq.tabulate(8)(d => (c * 2.5) + (d % 3) * 0.7))
  private val codebooks = FixedModel.codebooks(cents, m = 4)

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) x.getResponseBody.write(body)
    x.close()
  }

  private def catalogJson(docs: Seq[(Long, String)]): String = {
    val rows = docs.map { case (id, text) =>
      s"""{"Id":"p$id","Name":"D$id.SAFE","S3Path":"/data/D$id",
         | "OriginDate":"2023-06-15T10:00:00Z","Collection":"SENTINEL-2",
         | "ContentDate":{"Start":"2023-06-15T10:00:00Z","End":"2023-06-15T10:00:00Z"},
         | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         | "Attributes":[{"Name":"text","Value":"$text"}]}"""
        .stripMargin.replace("\n", "")
    }
    s"""{"value":[${rows.mkString(",")}]}"""
  }

  private val rng = new scala.util.Random(59)
  private def words(n: Int, tag: String): String =
    Seq.fill(n)(tag + rng.nextInt(200)).mkString(" ")

  // d1/d2 share a long boilerplate tail; d3 is a verbatim re-crawl of
  // d1 under a new id; d4 is genuinely novel
  private val boiler = words(120, "b")
  private val t1 = words(40, "x") + " " + boiler
  private val t2 = words(25, "y") + " " + boiler
  private val t3 = t1
  private val t4 = words(90, "z")

  /** Batch truth: distinct chunk fingerprints of `texts`. */
  private def batchFps(texts: Seq[String]): Set[String] = {
    graft.functions.CdcFunctions.register(spark)
    import spark.implicits._
    texts.toDF("text")
      .select(explode(expr(s"cdc_chunks($toksExpr)")).as("c"))
      .select(col("c.fp").as("fp")).distinct()
      .as[String].collect().toSet
  }

  test("ONE pipeline poll -> chunk dedup -> index append: exactly-once " +
      "chunk admission across a forced restart that replays the last " +
      "micro-batch") {
    implicit val s: SparkSession = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.CdcFunctions.register(spark)

    val live = new AtomicReference[Seq[(Long, String)]](
      Seq(1L -> t1, 2L -> t2))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/odata/Products", (x: HttpExchange) =>
      respond(x, 200, catalogJson(live.get).getBytes(StandardCharsets.UTF_8)))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val out = java.nio.file.Files
        .createTempDirectory("graft-e2e-index").toString
      val ck = java.nio.file.Files
        .createTempDirectory("graft-e2e-ck").toString
      // bootstrap: empty index under the fixed model (the streaming
      // bootstrap path IndexStoreSpec certifies)
      IndexStore.save(
        Pq.encode(Ivf.assign(
          embed(Seq(("seed", 0L, "seed", "seed")).toDF("chunk", "n_tok", "doc_id", "fp")),
          cents, "embedding"), codebooks, "embedding").limit(0),
        cents, codebooks, out)

      val token = StreamingIndexIngest.streamToken(ck)
      val mem = MemoryStream[PolledDoc]
      def startPipeline(): StreamingQuery =
        StreamingChunkDedup.firstSeenChunks(
          mem.toDF().select(col("doc_id"), expr(toksExpr).as("toks")))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            StreamingIndexIngest.ingestBatch(embed(batch), batchId,
              cents, codebooks, out, token)
            ()
          }
          .option("checkpointLocation", ck)
          .start()

      // one poll tick = one LIVE DSv2 scan over the socket: the
      // provider re-serves the WHOLE catalog every poll (the
      // reference's re-poll semantics) — downstream dedup state is
      // what keeps re-served content out of the store
      def poll(q: StreamingQuery): Unit = {
        val rows = spark.read.format("graft.sources.ODataCatalogSource")
          .option("url", s"$base/odata").load()
          .select(expr("CAST(substr(Id, 2) AS BIGINT)").as("doc_id"),
            expr("filter(Attributes, a -> a.Name = 'text')[0].Value")
              .as("text"))
          .as[PolledDoc].collect()
        mem.addData(rows.toIndexedSeq: _*)
        q.processAllAvailable()
      }

      def indexIds(): Set[Long] =
        IndexStore.loadCodes(spark, out).select("vec_id")
          .as[Long].collect().toSet
      def fpIds(fps: Set[String]): Set[Long] =
        if (fps.isEmpty) Set.empty
        else fps.toSeq.toDF("fp").select(expr("xxhash64(fp)"))
          .as[Long].collect().toSet

      // ---- wave 1: d1 + d2 ----
      val q1 = startPipeline()
      try poll(q1) finally q1.stop()
      val wave1 = batchFps(Seq(t1, t2))
      assert(indexIds() == fpIds(wave1),
        "after wave 1 the index must hold exactly d1/d2's distinct chunks")
      // the shared boilerplate deduped at chunk granularity already
      assert(wave1.size < batchFps(Seq(t1)).size + batchFps(Seq(t2)).size)

      // ---- FORCED restart with replay: delete the checkpoint's last
      // commit record — the crash window where the sink append ran
      // but the checkpoint commit was lost ----
      val commits = new java.io.File(s"$ck/commits")
      val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      // the local checkpoint FS writes a checksum sidecar next to the
      // commit record; the injected "crash" must take both, as a real
      // crash-before-commit leaves neither
      val crc = new java.io.File(commits, s".${last.getName}.crc")
      assert(last.delete(), "could not inject the crash window")
      if (crc.exists()) crc.delete()

      // provider publishes d3 (verbatim re-crawl of d1) + d4 (novel);
      // d1/d2 are still in the catalog and come back in the next poll
      live.set(live.get ++ Seq(3L -> t3, 4L -> t4))

      val q2 = startPipeline()
      try {
        // the restart first REPLAYS the deleted batch into
        // foreachBatch; the marker log must skip the append
        q2.processAllAvailable()
        assert(indexIds() == fpIds(wave1),
          "replayed micro-batch must not duplicate codes")
        poll(q2)
      } finally q2.stop()

      // exactly-once admission across restart + re-poll + re-crawl:
      // the index equals the batch distinct-fp set of the DISTINCT
      // texts ever served (d3 contributed nothing; d1/d2 re-polls
      // contributed nothing; all growth is d4's chunks)
      val all = batchFps(Seq(t1, t2, t4))
      assert(batchFps(Seq(t1, t2, t3, t4)) == all)
      assert(indexIds() == fpIds(all),
        "index must hold exactly one code row per distinct chunk ever admitted")
      assert(IndexStore.loadCodes(spark, out).count() == all.size,
        "no fingerprint may appear twice in the code table")

      // and the same (token, batchId) replayed OUT of band is still a
      // no-op through the composed path
      val dummy = Seq(("c", 1L, 9L, "fresh-fp")).toDF("chunk", "n_tok", "doc_id", "fp")
      val lastBatch = new java.io.File(s"$ck/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong).max
      assert(!StreamingIndexIngest.ingestBatch(embed(dummy), lastBatch,
        cents, codebooks, out, token))
      assert(IndexStore.loadCodes(spark, out).count() == all.size)
    } finally server.stop(0)
  }
}
