package graft

import graft.operators.{IndexStore, Ivf, Pq}
import graft.streaming.StreamingIndexIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Test row type at top level so Dataset encoders resolve without an
  * outer scope (MemoryStream instantiates it reflectively).
  */
case class IngestVec(vec_id: Long, embedding: Seq[Double])

/** Streaming ingest into the persisted index: after any prefix of
  * micro-batches, searching the on-disk index is bit-identical to a
  * batch rebuild over the vectors ingested so far, and a replayed
  * micro-batch (foreachBatch's at-least-once restart path) does not
  * duplicate codes.
  */
class StreamingIndexIngestSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = graft.operators.FixedModel.quantizedCast(spark, dir)

  

  test("stream-appended index == batch-built index; replays are no-ops") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val probed = Ivf.probeCells(c.filter(col("vec_id") < 8), cents,
        nProbe = 2)
      def search(codes: org.apache.spark.sql.DataFrame) =
        Pq.adcSearchCells(codes, codebooks, probed, topK = 3)
          .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

      // bootstrap: vec_id < 20 saved as the initial index
      val out = java.nio.file.Files
        .createTempDirectory("graft-stream-index").toString
      val ck = java.nio.file.Files
        .createTempDirectory("graft-stream-ck").toString
      IndexStore.save(
        Pq.encode(Ivf.assign(c.filter(col("vec_id") < 20), cents,
          "embedding"), codebooks, "embedding"),
        cents, codebooks, out)

      val all = c.select(col("vec_id"), col("embedding"))
        .as[IngestVec].collect().sortBy(_.vec_id)
      val (wave1, wave2) = all.filter(_.vec_id >= 20).partition(_.vec_id < 40)

      val mem = MemoryStream[IngestVec]
      val q = StreamingIndexIngest.start(mem.toDF(), cents, codebooks,
        out, ck)
      try {
        mem.addData(wave1.toIndexedSeq)
        q.processAllAvailable()
        // mid-stream: index == batch build over everything ingested
        assert(search(IndexStore.loadCodes(spark, out)) ==
          search(Pq.encode(Ivf.assign(c.filter(col("vec_id") < 40), cents,
            "embedding"), codebooks, "embedding")))
        mem.addData(wave2.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()

      val full = search(Pq.encode(Ivf.assign(c, cents, "embedding"),
        codebooks, "embedding"))
      assert(search(IndexStore.loadCodes(spark, out)) == full)

      // at-least-once replay: re-running an already-committed
      // (stream, batchId) is skipped by the commit log — codes do
      // not duplicate
      val token = StreamingIndexIngest.streamToken(ck)
      val replay = StreamingIndexIngest.ingestBatch(
        wave2.toIndexedSeq.toDF(), batchId = 1L, cents, codebooks, out,
        token)
      assert(!replay)
      assert(search(IndexStore.loadCodes(spark, out)) == full)
      // counts, not just top-k: no row was appended twice
      assert(IndexStore.loadCodes(spark, out).count() == all.length)

      // a genuinely new batch id still lands
      val extra = StreamingIndexIngest.ingestBatch(
        Seq(IngestVec(9000L, all.head.embedding)).toDF(), batchId = 99L,
        cents, codebooks, out, token)
      assert(extra)
      assert(IndexStore.loadCodes(spark, out).count() == all.length + 1)

      // a NEW stream (fresh checkpoint) restarts batch numbering at
      // 0 — its batches must NOT be mistaken for the old stream's
      // committed ids (markers are keyed per stream token)
      val fresh = StreamingIndexIngest.ingestBatch(
        Seq(IngestVec(9001L, all.head.embedding)).toDF(), batchId = 0L,
        cents, codebooks, out,
        StreamingIndexIngest.streamToken(s"$ck-second-run"))
      assert(fresh)
      assert(IndexStore.loadCodes(spark, out).count() == all.length + 2)
    } finally c.unpersist()
  }

  test("streaming ingest and a concurrent maintenance compact both " +
      "land — the 100 TB interleaving the optimistic commit loop " +
      "exists for (one ingest stream + one maintenance loop, no " +
      "coordination)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val out = java.nio.file.Files
        .createTempDirectory("graft-stream-race").toString
      val ck = java.nio.file.Files
        .createTempDirectory("graft-stream-race-ck").toString
      IndexStore.save(
        Pq.encode(Ivf.assign(c.filter(col("vec_id") < 10), cents,
          "embedding"), codebooks, "embedding"),
        cents, codebooks, out)
      val all = c.select(col("vec_id"), col("embedding"))
        .as[IngestVec].collect().sortBy(_.vec_id)
      val rest = all.filter(_.vec_id >= 10)

      val mem = MemoryStream[IngestVec]
      val q = StreamingIndexIngest.start(mem.toDF(), cents, codebooks,
        out, ck)
      // the maintenance loop, racing the stream's append commits:
      // compact rebases across concurrent appends (appends never
      // remove files), appends rebase across compact commits — any
      // interleaving must land BOTH sides or fail loudly
      @volatile var maintErr: Option[Throwable] = None
      val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
      val maint = new Thread(() => {
        while (!stopFlag.get) {
          try {
            IndexStore.compact(spark, out, maxFilesPerCell = 2)
            Thread.sleep(25)
          } catch {
            case t: Throwable => maintErr = Some(t); stopFlag.set(true)
          }
        }
      }, "maintenance-loop")
      maint.start()
      try {
        rest.grouped(5).foreach { wave =>
          mem.addData(wave.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      stopFlag.set(true)
      maint.join(60000)
      assert(maintErr.isEmpty, s"maintenance loop failed: $maintErr")

      // quiesced: one final compact + vacuum, then the index must
      // hold EXACTLY the saved + streamed vectors and search like a
      // batch rebuild — nothing lost to a lost race, nothing doubled
      IndexStore.compact(spark, out, maxFilesPerCell = 2)
      IndexStore.vacuum(spark, out, minAgeMs = 0L)
      assert(IndexStore.loadCodes(spark, out).count() == all.length)
      val probed = Ivf.probeCells(c.filter(col("vec_id") < 8), cents,
        nProbe = 2)
      def search(codes: org.apache.spark.sql.DataFrame) =
        Pq.adcSearchCells(codes, codebooks, probed, topK = 3)
          .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(search(IndexStore.loadCodes(spark, out)) ==
        search(Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
          "embedding")))
    } finally c.unpersist()
  }
}
