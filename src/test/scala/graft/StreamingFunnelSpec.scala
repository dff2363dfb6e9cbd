package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

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
}
