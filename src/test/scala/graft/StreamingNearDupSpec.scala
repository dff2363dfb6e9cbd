package graft

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandHit, DocEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Incremental MinHash/LSH near-dup candidates: batch path semantics
  * + cross-microbatch state persistence.
  */
class StreamingNearDupSpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  // B is A's token set reordered (a true near-dup: identical MinHash
  // bands); C shares no tokens with A
  private val docA = DocEvent(1L, ts("2024-01-01 10:00:00"),
    "spark query engine shuffles data across the cluster")
  private val docB = DocEvent(2L, ts("2024-01-01 10:05:00"),
    "across the cluster spark shuffles query engine data")
  private val docC = DocEvent(3L, ts("2024-01-01 10:10:00"),
    "wholly unrelated words about gardening tulips and soil")

  private def dupBands(hits: Seq[BandHit], doc: Long): Seq[BandHit] =
    hits.filter(h => h.doc_id == doc && h.seen_before)

  test("batch path: reordered token set flags on all 4 bands, distinct on none") {
    implicit val s = spark
    import s.implicits._
    val hits = StreamingNearDup.bandCandidates(
      Seq(docA, docB, docC).toDS()).collect().toSeq
    assert(hits.count(_.doc_id == 1L) == 4) // 4 band rows per doc
    val b = dupBands(hits, 2L)
    assert(b.length == 4 && b.forall(_.first_doc == 1L))
    assert(dupBands(hits, 3L).isEmpty) // no shared tokens, no shared minima
    // q30-style verdict: >= 2 agreeing bands = near-dup candidate
    assert(b.length >= 2)
  }

  test("streaming path: state persists across microbatches") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = StreamingNearDup.bandCandidates(mem.toDF().as[DocEvent])
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      mem.addData(docA, docC) // batch 1: two unrelated docs
      q.processAllAvailable()
      mem.addData(docB)       // batch 2: near-dup of A arrives LATER
      q.processAllAvailable()
      val hits = spark.table("neardup").as[BandHit].collect().toSeq
      // A and C were first in their buckets
      assert(dupBands(hits, 1L).isEmpty && dupBands(hits, 3L).isEmpty)
      // B collides with A's buckets across the microbatch boundary
      val b = dupBands(hits, 2L)
      assert(b.length == 4 && b.forall(_.first_doc == 1L))
    } finally q.stop()
  }
}
