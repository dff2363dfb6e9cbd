package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

object AsOfJoinSpec {
  case class Quote(sym: String, qt: Timestamp, qid: Long, px: Double)
  case class Trade(sym: String, tt: Timestamp, tid: Long, qty: Long)
}

/** Reusable as-of join operator (merge/window formulation). */
class AsOfJoinSpec extends AnyFunSuite with SharedSpark {
  import AsOfJoinSpec._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq(
      Quote("A", ts("2024-01-01 10:00:00"), 1, 10.0),
      Quote("A", ts("2024-01-01 10:00:05"), 2, 11.0),
      Quote("A", ts("2024-01-01 10:00:10"), 3, 12.0),
      Quote("B", ts("2024-01-01 10:00:07"), 4, 99.0)).toDF()
    val trades = Seq(
      Trade("A", ts("2024-01-01 10:00:03"), 100, 5),   // -> quote 1
      Trade("A", ts("2024-01-01 10:00:05"), 101, 6),   // tie -> quote 2 (<=)
      Trade("A", ts("2024-01-01 10:00:20"), 102, 7),   // -> quote 3
      Trade("B", ts("2024-01-01 10:00:01"), 103, 8),   // no prior quote
      Trade("C", ts("2024-01-01 10:00:01"), 104, 9)).toDF() // unseen key
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"),
        leftTime = "tt", rightTime = "qt", payload = Seq("qid", "px"),
        leftId = "tid", rightId = "qid")
      .orderBy("tid").collect()
    val got = out.map(r => (r.getAs[Long]("tid"),
      Option(r.getAs[Any]("asof_qid")), Option(r.getAs[Any]("asof_px"))))
    assert(got.toSeq == Seq(
      (100L, Some(1L), Some(10.0)),
      (101L, Some(2L), Some(11.0)),
      (102L, Some(3L), Some(12.0)),
      (103L, None, None),
      (104L, None, None)))
  }
}
