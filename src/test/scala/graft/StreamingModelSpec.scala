package graft

import graft.streaming.StreamingModel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable-sufficient-statistics claim behind
  * [[StreamingModel.olsRefresh]]: because the Gram sums accumulate
  * exactly (DECIMAL), the streaming model equals the batch q141 model
  * BIT-FOR-BIT after the same rows, for ANY micro-batch slicing and
  * arrival order — and every intermediate refresh equals batch
  * training on its prefix.
  */
object StreamingModelSpec {
  case class Doc(doc_id: Long, lang: String, n_chars: Long, text: String)
}

class StreamingModelSpec extends AnyFunSuite with SharedSpark {
  import StreamingModelSpec.Doc

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[Doc] = {
    Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars", "text")
      .collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  private def runStream(batches: Seq[Seq[Doc]], name: String): Seq[String] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingModel.olsRefresh(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).orderBy("lang").collect().map(_.toString).toSeq
    } finally q.stop()
  }

  private def batchModel(rows: Seq[Doc]): Seq[String] = {
    import spark.implicits._
    StreamingModel.olsRefresh(rows.toDF())
      .orderBy("lang").collect().map(_.toString).toSeq
  }

  test("streaming OLS refresh == batch q141 bit-for-bit, for two " +
      "different micro-batch slicings AND a shuffled arrival order") {
    val all = docs
    val expected = SparkEntry.queries("q141_ols_grouped")(spark, dir)
      .collect().map(_.toString).toSeq
    // slicing 1: two halves in doc order
    val (a, b) = all.splitAt(all.size / 2)
    assert(runStream(Seq(a, b), "ols_halves") == expected)
    // slicing 2: many tiny batches, deterministically shuffled
    val shuffled = new scala.util.Random(7).shuffle(all)
    val tiny = shuffled.grouped(17).toSeq
    assert(runStream(tiny, "ols_tiny") == expected)
  }

  test("every intermediate refresh equals batch training on its prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs
    val cuts = Seq(all.size / 3, 2 * all.size / 3, all.size)
    val mem = MemoryStream[Doc]
    val q = StreamingModel.olsRefresh(mem.toDF())
      .writeStream.format("memory").queryName("ols_prefix")
      .outputMode("complete").start()
    try {
      var fed = 0
      cuts.foreach { cut =>
        mem.addData(all.slice(fed, cut): _*)
        fed = cut
        q.processAllAvailable()
        val got = spark.table("ols_prefix").orderBy("lang")
          .collect().map(_.toString).toSeq
        assert(got == batchModel(all.take(cut)),
          s"streaming model diverged from batch at prefix $cut")
      }
    } finally q.stop()
  }
}
