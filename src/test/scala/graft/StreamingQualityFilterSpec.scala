package graft

import graft.streaming.StreamingQualityFilter
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object StreamingQualityFilterSpec {
  case class QDoc(doc_id: Long, source: String, text: String)
}

/** The frozen-model serving claim behind
  * [[StreamingQualityFilter.gate]]: streamed scores and keep
  * decisions are BIT-IDENTICAL to the batch scorer's for every
  * document, under any micro-batch slicing (the gate is a stateless
  * per-row map, so arrival order cannot matter), and the kept count
  * agrees with q158's per-source acceptance report.
  */
class StreamingQualityFilterSpec extends AnyFunSuite with SharedSpark {
  import StreamingQualityFilterSpec.QDoc

  private val dir = "/root/testdata/sf0.001"

  test("streamed quality gate == batch scored table bit-for-bit, " +
      "for two micro-batch slicings") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // train once in batch; freeze the 4 scalars of model state
    val m = graft.queries.TextAnalysis.qcModel(spark, dir).collect().head
    val (b0, b1, b2, thr) = (m.getAs[Double]("b0d"), m.getAs[Double]("b1d"),
      m.getAs[Double]("b2d"), m.getAs[Double]("thr"))

    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => QDoc(r.getLong(0), r.getString(1), r.getString(2))).toSeq

    // batch truth: the memoized scored table, projected to the gate's
    // output schema (same expression strings -> same bits)
    val batch = graft.queries.TextAnalysis.qcScored(spark, dir)
      .select(col("doc_id"), col("source"), col("mu").as("score"),
        (col("mu") >= col("thr")).as("kept"))
      .collect().map(_.toString).toSet

    def runStream(batches: Seq[Seq[QDoc]], name: String): Set[String] = {
      val mem = MemoryStream[QDoc]
      val q = StreamingQualityFilter.gate(mem.toDF(), b0, b1, b2, thr)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect().map(_.toString).toSet
      } finally q.stop()
    }

    val one = runStream(Seq(docs), "qgate_one")
    val sliced = runStream(
      docs.grouped(math.max(1, docs.size / 3)).toSeq, "qgate_sliced")
    assert(one == batch, "streamed scores must equal batch scores bit-for-bit")
    assert(sliced == batch, "micro-batch slicing must not change the output")

    // and the acceptance report derived from the stream agrees with
    // the gated q158 row set
    val streamKept = one.count(_.contains("true"))
    val q158Kept = SparkEntry.queries("q158_quality_classifier")(spark, dir)
      .agg(sum("n_kept")).collect().head.getLong(0)
    assert(streamKept.toLong == q158Kept,
      s"stream kept $streamKept, q158 reports $q158Kept")
  }
}
