package graft

import graft.streaming.StreamingFrontier
import graft.streaming.StreamingFrontier.{FrontierDecision, UrlEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming crawl-frontier admission: canonical-key dedup is
  * exactly-once ACROSS microbatches, robots verdicts and crawl-delay
  * ride each decision, and the batch path has identical semantics.
  */
class StreamingFrontierSpec extends AnyFunSuite with SharedSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  // two spellings of the same resource (q176's variant device) —
  // must collapse to ONE canonical key
  private val spellA = UrlEvent(
    "HTTP://SRC1.EXAMPLE.COM:80/c/../c/./d41?b=1&a=6#sec",
    ts("2024-01-01 10:00:00"))
  private val spellB = UrlEvent(
    "http://src1.example.com/%63/d41?a=6&&b=1",
    ts("2024-01-01 10:05:00"))
  // a robots-blocked id (decimal ends in 3, not 13)
  private val blocked = UrlEvent(
    "http://src2.example.com/c/d23",
    ts("2024-01-01 10:01:00"))
  // a re-admitted id (ends in 13 — longest-match Allow wins)
  private val allowed13 = UrlEvent(
    "http://src2.example.com/c/d13",
    ts("2024-01-01 10:02:00"))

  test("batch path: spellings collapse, first admits, dup is flagged; " +
      "robots verdict and crawl-delay ride the decision") {
    implicit val s = spark
    import s.implicits._
    val out = StreamingFrontier.decide(
      Seq(spellA, spellB, blocked, allowed13).toDS()).collect().toSeq
    val d41 = out.filter(_.canonical.contains("/c/d41"))
    assert(d41.length == 2)
    assert(d41.count(_.admitted) == 1 && d41.count(_.first_seen) == 1)
    assert(d41.forall(_.canonical ==
      "http://src1.example.com/c/d41?a=6&b=1"))
    assert(d41.forall(_.crawl_delay == 5 + "src1".length % 3))
    val b23 = out.filter(_.canonical.endsWith("/c/d23"))
    assert(b23.length == 1 && !b23.head.allowed && !b23.head.admitted)
    val a13 = out.filter(_.canonical.endsWith("/c/d13"))
    assert(a13.length == 1 && a13.head.allowed && a13.head.admitted)
  }

  test("streaming path: a re-discovered URL in a LATER microbatch is " +
      "a duplicate — one admission per canonical key, ever") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UrlEvent]
    val q = StreamingFrontier.decide(mem.toDF().as[UrlEvent])
      .writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    try {
      mem.addData(spellA, blocked) // batch 1
      q.processAllAvailable()
      mem.addData(spellB, allowed13) // batch 2: spelling #2 of d41
      q.processAllAvailable()
      val out = spark.table("frontier").as[FrontierDecision]
        .collect().toSeq
      val d41 = out.filter(_.canonical.contains("/c/d41"))
      assert(d41.length == 2, d41)
      // admitted exactly once, in the FIRST batch; the batch-2
      // arrival crossed the microbatch boundary into existing state
      assert(d41.count(_.admitted) == 1)
      assert(d41.count(_.first_seen) == 1)
      assert(out.filter(_.canonical.endsWith("/c/d23"))
        .forall(d => !d.admitted))
      assert(out.filter(_.canonical.endsWith("/c/d13"))
        .forall(_.admitted))
    } finally q.stop()
  }
}
