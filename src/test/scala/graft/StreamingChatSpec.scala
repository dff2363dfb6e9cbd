package graft

import graft.streaming.StreamingChat
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

object StreamingChatSpec {
  case class Line(conv_id: Long, json: String)
}

/** Streaming chat-transcript ingest: PERMISSIVE in-plan JSON parse
  * with inline dead-letter rows, turn explode, and first-seen
  * admission of assistant replies (q219/q220's tier made
  * continuous).
  */
class StreamingChatSpec extends AnyFunSuite with SharedSpark {
  import StreamingChatSpec._

  private def conv(id: Long, turns: (String, String)*): Line =
    Line(id, turns.map { case (r, c) =>
      s"""{"role":"$r","content":"$c"}"""
    }.mkString("[", ",", "]"))

  private def truncated(id: Long): Line = {
    val good = conv(id, "user" -> "hello there", "assistant" -> "hi")
    Line(id, good.json.dropRight(5))
  }

  private def runReplies(name: String,
      waves: Seq[Seq[Line]]): Seq[(Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Line]
    val q = StreamingChat.firstSeenReplies(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { wv => mem.addData(wv: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("conv_id"), r.getAs[String]("content")))
        .toSeq
    } finally q.stop()
  }

  test("malformed lines land in the inline dead letter and valid " +
      "turns parse alongside them — one plan, no crash, no drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Line]
    val q = StreamingChat.parsedTurns(mem.toDF())
      .writeStream.format("memory").queryName("chat_turns")
      .outputMode("append").start()
    try {
      mem.addData(
        conv(1, "user" -> "hello", "assistant" -> "hi there"),
        truncated(2),
        conv(3, "user" -> "query", "assistant" -> "answer",
          "user" -> "more", "assistant" -> "done"))
      q.processAllAvailable()
      val rows = spark.table("chat_turns").collect()
      val dead = rows.filter(!_.getAs[Boolean]("ok"))
      assert(dead.map(_.getAs[Long]("conv_id")).toSeq == Seq(2L))
      assert(dead.head.getAs[Int]("idx") == -1
        && dead.head.getAs[String]("content") == null)
      val ok = rows.filter(_.getAs[Boolean]("ok"))
      assert(ok.count(_.getAs[Long]("conv_id") == 1L) == 2)
      assert(ok.count(_.getAs[Long]("conv_id") == 3L) == 4)
      assert(!ok.exists(_.getAs[Long]("conv_id") == 2L),
        "a malformed conversation must contribute no turns")
      val roles = ok.filter(_.getAs[Long]("conv_id") == 3L)
        .sortBy(_.getAs[Int]("idx")).map(_.getAs[String]("role")).toSeq
      assert(roles == Seq("user", "assistant", "user", "assistant"))
    } finally q.stop()
  }

  test("a valid-but-EMPTY conversation ([]) emits exactly one " +
      "ok=true idx=-1 sentinel — counted as a conversation, never " +
      "as a turn, never mistaken for a dead letter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Line]
    val q = StreamingChat.parsedTurns(mem.toDF())
      .writeStream.format("memory").queryName("chat_empty")
      .outputMode("append").start()
    try {
      mem.addData(
        conv(1, "user" -> "hello", "assistant" -> "hi"),
        Line(2, "[]"),
        truncated(3))
      q.processAllAvailable()
      val rows = spark.table("chat_empty").collect()
      val sentinel = rows.filter(r =>
        r.getAs[Long]("conv_id") == 2L)
      assert(sentinel.length == 1, "exactly one row per empty conv")
      assert(sentinel.head.getAs[Boolean]("ok")
        && sentinel.head.getAs[Int]("idx") == -1
        && sentinel.head.getAs[String]("role") == null,
        "empty conv sentinel is ok=true idx=-1 (NOT a dead letter)")
      // per-conversation ledger semantics: conv 2 is present (so a
      // stream-vs-batch conversation count cannot silently diverge)
      // but contributes zero turns under the idx >= 0 turn filter
      assert(rows.count(r => r.getAs[Boolean]("ok")
        && r.getAs[Int]("idx") >= 0
        && r.getAs[Long]("conv_id") == 2L) == 0)
      assert(rows.map(_.getAs[Long]("conv_id")).distinct.sorted.toSeq
        == Seq(1L, 2L, 3L), "all three conversations appear")
    } finally q.stop()
  }

  test("repeated assistant replies are admitted exactly once across " +
      "micro-batches — the templated-response store") {
    val admitted = runReplies("chat_replies", Seq(
      Seq(conv(1, "user" -> "a", "assistant" -> "canned reply"),
        conv(2, "user" -> "b", "assistant" -> "novel one")),
      // wave 2: the canned reply returns under new conversations,
      // plus one genuinely new reply and one malformed line
      Seq(conv(3, "user" -> "c", "assistant" -> "canned reply"),
        conv(4, "user" -> "d", "assistant" -> "another new"),
        truncated(5))))
    assert(admitted.map(_._2).sorted ==
      Seq("another new", "canned reply", "novel one"))
    // first-seen: the canned reply's admitted row is conv 1, not 3
    assert(admitted.find(_._2 == "canned reply").get._1 == 1L)
  }

  test("micro-batch slicing does not change the admitted reply set") {
    val all = Seq(
      conv(1, "user" -> "a", "assistant" -> "x"),
      conv(2, "user" -> "b", "assistant" -> "y"),
      conv(3, "user" -> "c", "assistant" -> "x"))
    val a = runReplies("chat_a", Seq(all)).map(_._2).toSet
    val b = runReplies("chat_b", all.map(Seq(_))).map(_._2).toSet
    assert(a == b && a == Set("x", "y"))
  }
}
