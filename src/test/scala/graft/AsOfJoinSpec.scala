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

  test("property: asOf equals a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    def t(offMin: Int) = ts("2024-01-01 00:00:00").getTime + offMin * 60000L
    // deliberately includes duplicate timestamps per key on both sides
    val quotes = (1 to 200).map { i =>
      Quote(s"S${rnd.nextInt(5)}", new Timestamp(t(rnd.nextInt(120))),
        i.toLong, rnd.nextInt(1000) / 10.0)
    }
    val trades = (1 to 200).map { i =>
      Trade(s"S${rnd.nextInt(6)}", new Timestamp(t(rnd.nextInt(120))),
        1000L + i, rnd.nextInt(50).toLong)
    }
    val got = AsOfJoin.asOf(trades.toDF(), quotes.toDF(), Seq("sym"),
        "tt", "qt", Seq("qid", "px"), "tid", "qid")
      .collect()
      .map(r => r.getAs[Long]("tid") -> Option(r.getAs[Any]("asof_qid")))
      .toMap
    // brute force: latest quote at or before the trade; ties on time
    // resolved by largest qid (the merge formulation's sort order)
    val expected = trades.map { tr =>
      val c = quotes.filter(q => q.sym == tr.sym && !q.qt.after(tr.tt))
      tr.tid -> (if (c.isEmpty) None
        else Some(c.maxBy(q => (q.qt.getTime, q.qid)).qid))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (tid, want) =>
      assert(got(tid) == want, s"trade $tid: got ${got(tid)}, want $want")
    }
  }
}
