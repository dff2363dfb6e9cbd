package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelState, StageOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.api.java.Optional

/** StreamingFunnel vs its certified batch twin (q73): the batch path
  * (every group sees all its events in one call — the
  * StatefulSessions testing discipline for flatMapGroupsWithState
  * operators) must reproduce q73's per-user stage logic exactly,
  * plus handcrafted strict-chain semantics with per-stage emission
  * checks.
  */
class StreamingFunnelSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def funnelEvents = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
  }

  test("batch path reproduces q73's stage counts exactly") {
    implicit val s = spark
    // a user reaching final stage s emits one row per stage 1..s, so
    // the per-stage row count IS the "reached stage k" count q73's
    // n_* columns report
    val byStage = StreamingFunnel.stages(funnelEvents)
      .groupBy("stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def reached(k: Int) = byStage.getOrElse(k, 0L)
    val q73 = SparkEntry.queries("q73_funnel")(spark, dir).collect()(0)
    assert(reached(1) == q73.getAs[Long]("n_view"))
    assert(reached(2) == q73.getAs[Long]("n_click"))
    assert(reached(3) == q73.getAs[Long]("n_signup"))
    assert(reached(4) == q73.getAs[Long]("n_purchase"))
  }

  test("strict-chain semantics and per-stage emissions on a " +
      "handcrafted group (batch path — the StatefulSessions discipline)") {
    import spark.implicits._
    implicit val s = spark
    def ts(t: String) = Timestamp.valueOf(t)
    // user 1 converts fully; user 2's first click precedes its first
    // view, so the strict chain stops at stage 1 even after the
    // signup; user 3 views only
    val events = Seq(
      FunnelEvent(1, 1, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(1, 2, ts("2024-01-01 10:05:00"), "click"),
      FunnelEvent(1, 6, ts("2024-01-01 10:10:00"), "signup"),
      FunnelEvent(1, 7, ts("2024-01-01 10:20:00"), "purchase"),
      FunnelEvent(2, 3, ts("2024-01-01 10:01:00"), "click"),
      FunnelEvent(2, 4, ts("2024-01-01 10:02:00"), "view"),
      FunnelEvent(2, 8, ts("2024-01-01 10:30:00"), "signup"),
      FunnelEvent(3, 5, ts("2024-01-01 10:03:00"), "view"))
    val got = StreamingFunnel.stages(events.toDS()).collect().toSeq
    // one emission per reached (user, stage), stamped with the
    // first time of the completing event
    assert(got.map(o => (o.user_id, o.stage)).distinct.size == got.size)
    val finalStage = got.groupBy(_.user_id).view
      .mapValues(_.map(_.stage).max).toMap
    assert(finalStage == Map(1L -> 4, 2L -> 1, 3L -> 1))
    val u1 = got.filter(_.user_id == 1).sortBy(_.stage)
      .map(o => (o.stage, o.reached_us))
    assert(u1 == Seq(
      (1, ts("2024-01-01 10:00:00").getTime * 1000),
      (2, ts("2024-01-01 10:05:00").getTime * 1000),
      (3, ts("2024-01-01 10:10:00").getTime * 1000),
      (4, ts("2024-01-01 10:20:00").getTime * 1000)))
  }

  test("cross-batch emission over a memory stream stays monotone per " +
      "user; a late stage-regressing click emits nothing") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def ts(t: String) = Timestamp.valueOf(t)
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stages(mem.toDS())
      .writeStream.format("memory").queryName("funnel_mb")
      .outputMode("append").start()
    def emitted() = spark.table("funnel_mb").as[StageOut].collect().toSeq
    try {
      // batch 1: user 1 climbs to stage 2, user 2 to stage 1
      mem.addData(
        FunnelEvent(1, 1, ts("2024-01-01 10:00:00"), "view"),
        FunnelEvent(1, 2, ts("2024-01-01 10:05:00"), "click"),
        FunnelEvent(2, 3, ts("2024-01-01 10:01:00"), "view"))
      q.processAllAvailable()
      assert(emitted().map(o => (o.user_id, o.stage)).toSet ==
        Set((1L, 1), (1L, 2), (2L, 1)))

      // batch 2: user 1 gets a LATE click below its first view — the
      // strict chain breaks, the internal stage regresses to 1, and
      // the emitted stream (running MAX) must emit NOTHING for it;
      // user 2 climbs normally to stage 2 across the batch boundary
      mem.addData(
        FunnelEvent(1, 4, ts("2024-01-01 09:55:00"), "click"),
        FunnelEvent(2, 5, ts("2024-01-01 10:06:00"), "click"))
      q.processAllAvailable()
      assert(emitted().map(o => (o.user_id, o.stage)).toSet ==
        Set((1L, 1), (1L, 2), (2L, 1), (2L, 2)))

      // batch 3: user 1's signup lands on the broken chain (stage
      // stays 1 < emitted 2 — nothing); user 2 climbs to 3
      mem.addData(
        FunnelEvent(1, 6, ts("2024-01-01 10:10:00"), "signup"),
        FunnelEvent(2, 7, ts("2024-01-01 10:15:00"), "signup"))
      q.processAllAvailable()
      val fin = emitted()
      assert(fin.map(o => (o.user_id, o.stage)).toSet ==
        Set((1L, 1), (1L, 2), (2L, 1), (2L, 2), (2L, 3)))
      // append-safety: no (user, stage) pair was ever re-delivered
      assert(fin.map(o => (o.user_id, o.stage)).distinct.size == fin.size)
    } finally q.stop()
  }

  // The TTL timeout branch, driven deterministically through Spark's
  // public TestGroupState — a real ProcessingTimeTimeout MemoryStream
  // test spins no-data timer batches (StatefulSessions' discipline).
  test("TTL timeout branch removes state; a returning user re-emits " +
      "climbed stages (the documented expiry trade)") {
    def ts(t: String) = Timestamp.valueOf(t)
    val ttl = Some("10 minutes")
    val proc = StreamingFunnel.processGroup(ttl, streaming = true) _

    // 1) live processing arms the timer
    val live = TestGroupState.create[FunnelState](
      Optional.empty[FunnelState](), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.empty[Long](), hasTimedOut = false)
    val out1 = proc(7L, Iterator(
      FunnelEvent(7, 1, ts("2024-01-01 10:00:00"), "view"),
      FunnelEvent(7, 2, ts("2024-01-01 10:05:00"), "click")), live).toSeq
    assert(out1.map(_.stage) == Seq(1, 2))
    assert(live.isUpdated && live.getTimeoutTimestampMs.get() == 1000L + 600000L)

    // 2) the timer fires: state is dropped, nothing is emitted
    val fired = TestGroupState.create[FunnelState](
      Optional.of(live.get), GroupStateTimeout.ProcessingTimeTimeout(),
      700000L, Optional.empty[Long](), hasTimedOut = true)
    assert(proc(7L, Iterator.empty, fired).isEmpty)
    assert(fired.isRemoved)

    // 3) the user returns after expiry: first times are gone, so the
    //    climbed stages RE-emit — the double-count the scaladoc trades
    //    away; a late purchase alone (chain evidence expired) emits
    //    nothing at all
    val back = TestGroupState.create[FunnelState](
      Optional.empty[FunnelState](), GroupStateTimeout.ProcessingTimeTimeout(),
      800000L, Optional.empty[Long](), hasTimedOut = false)
    val out2 = proc(7L, Iterator(
      FunnelEvent(7, 3, ts("2024-01-01 11:00:00"), "view"),
      FunnelEvent(7, 4, ts("2024-01-01 11:05:00"), "click")), back).toSeq
    assert(out2.map(_.stage) == Seq(1, 2)) // re-emitted
    val orphan = TestGroupState.create[FunnelState](
      Optional.empty[FunnelState](), GroupStateTimeout.ProcessingTimeTimeout(),
      900000L, Optional.empty[Long](), hasTimedOut = false)
    assert(proc(8L, Iterator(
      FunnelEvent(8, 5, ts("2024-01-01 11:30:00"), "purchase")), orphan).isEmpty)
  }
}
