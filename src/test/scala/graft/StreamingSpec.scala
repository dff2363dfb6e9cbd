package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured Streaming transforms (SURVEY.md §2.11) driven through
  * MemoryStream → memory sink, checked against their batch twins'
  * semantics.
  */
object StreamingSpec {
  case class Ev(ts: Timestamp, event_id: Long, user_id: Long,
      event_type: String, value: Double)
}

class StreamingSpec extends AnyFunSuite with SharedSpark {
  import StreamingSpec.Ev

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(ts("2024-01-01 10:05:00"), 1, 1, "click", 1.0),
    Ev(ts("2024-01-01 10:20:00"), 2, 1, "click", 2.0),
    Ev(ts("2024-01-01 10:40:00"), 3, 2, "view", 3.0),
    Ev(ts("2024-01-01 11:30:00"), 4, 1, "click", 4.0), // new hour, new session
    Ev(ts("2024-01-01 11:45:00"), 5, 2, "view", 5.0),
    Ev(ts("2024-01-01 11:45:00"), 5, 2, "view", 5.0))  // dup event_id

  test("tumblingAgg over a memory stream matches batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("tumb")
        .orderBy("wstart", "event_type")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .toSeq
      assert(got == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 3.0),
        ("2024-01-01 11:00:00.0", "click", 1L, 4.0),
        ("2024-01-01 11:00:00.0", "view", 2L, 10.0)))
    } finally q.stop()
  }

  test("sessionAgg groups by 30-minute gaps per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(mem.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("sess")
        .orderBy("user_id", "session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3)))
        .toSeq
      // user 1: {10:05,10:20} then {11:30}; user 2: {10:40} then {11:45 x2}
      assert(got == Seq(
        (1L, "2024-01-01 10:05:00.0", 2L),
        (1L, "2024-01-01 11:30:00.0", 1L),
        (2L, "2024-01-01 10:40:00.0", 1L),
        (2L, "2024-01-01 11:45:00.0", 2L)))
    } finally q.stop()
  }

  test("dedupByKey drops the duplicate event_id within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupByKey(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("clickViewJoin attributes clicks to in-horizon views, matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      Ev(ts("2024-01-01 10:00:00"), 101, 1, "view", 0.0),
      Ev(ts("2024-01-01 10:30:00"), 102, 1, "view", 0.0),
      Ev(ts("2024-01-01 09:00:00"), 103, 2, "view", 0.0)) // > 1h before click
    val clicks = Seq(
      Ev(ts("2024-01-01 10:45:00"), 201, 1, "click", 7.0),  // joins 101+102
      Ev(ts("2024-01-01 10:30:00"), 202, 2, "click", 8.0))  // no in-horizon view
    val vMem = MemoryStream[Ev]; val cMem = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(vMem.toDF(), cMem.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      vMem.addData(views: _*); cMem.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("click_id", "view_id").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got == Seq((201L, 101L), (201L, 102L)))
      // batch twin: same predicate as a plain join
      val bv = views.toDF(); val bc = clicks.toDF()
      val batchGot = EventStreams.clickViewJoin(bv, bc)
        .select("click_id", "view_id").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(batchGot == got) // streaming converges to the batch answer
    } finally q.stop()
  }
}
