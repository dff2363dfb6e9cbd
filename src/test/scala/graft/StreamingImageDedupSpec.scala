package graft

import graft.streaming.StreamingImageDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

object StreamingImageDedupSpec {
  case class Img(doc_id: Long, content_type: String, body: Array[Byte])
}

/** Streaming crawl-image ingest: binary payloads dispatched by
  * content type to the REAL codecs inside the streaming plan, hashed,
  * first-seen-admitted (q197's funnel made continuous). The pixel
  * device is q197's constant-8×8-block corpus, so the lossy JPEG leg
  * round-trips exactly and a PNG mirror of the same picture decodes
  * to the IDENTICAL plane — the cross-codec collapse under test.
  */
class StreamingImageDedupSpec extends AnyFunSuite with SharedSpark {
  import StreamingImageDedupSpec._

  private val (w, h) = (72, 64) // q197's geometry: 9×8 blocks of 8×8

  /** Per-block value formula (q197's device, 9 blocks across). */
  private def pixels(id: Long): Array[Byte] = Array.tabulate(w * h) { i =>
    val b = ((i / w) / 8) * 9 + (i % w) / 8
    (((id + 1) * (b.toLong * b * b + 3 * b + 7)) % 1000003 % 200).toByte
  }

  private def jpeg(docId: Long, imageId: Long): Img =
    Img(docId, "image/jpeg",
      graft.sources.Jpeg.encodeGray(pixels(imageId), w, h))
  private def png(docId: Long, imageId: Long): Img =
    Img(docId, "image/png",
      graft.sources.Png.encodeGray(pixels(imageId), w, h))

  private def run(name: String, waves: Seq[Seq[Img]]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Img]
    val q = StreamingImageDedup.firstSeenImages(mem.toDF(), w, h)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      waves.foreach { wv => mem.addData(wv: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dh0"),
          r.getAs[Long]("dh1"))).toSeq
    } finally q.stop()
  }

  test("cross-codec mirror wave admits only novel images and y_sum " +
      "pins the in-stream decode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Img]
    val q = StreamingImageDedup.firstSeenImages(mem.toDF(), w, h)
      .writeStream.format("memory").queryName("imgstore")
      .outputMode("append").start()
    try {
      mem.addData(jpeg(1, 1), jpeg(2, 2), jpeg(3, 3), jpeg(4, 4))
      q.processAllAvailable()
      assert(spark.table("imgstore").count() == 4)
      // wave 2: PNG mirrors of images 1 and 2 under new doc ids (the
      // commonest crawl duplication) + one genuinely new PNG
      mem.addData(png(11, 1), png(12, 2), png(5, 5))
      q.processAllAvailable()
      val rows = spark.table("imgstore").collect()
      assert(rows.length == 5, s"mirrors must collapse cross-codec, " +
        s"got ${rows.map(_.getAs[Long]("doc_id")).sorted.mkString(",")}")
      assert(!rows.exists(r => Set(11L, 12L)(r.getAs[Long]("doc_id"))),
        "a mirror's hash matched nothing — codec paths diverged")
      // y_sum certifies the decode independently of the hash: every
      // admitted row's luma sum equals the block formula's sum
      rows.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val expected = pixels(id).map(_ & 0xff).map(_.toLong).sum
        assert(r.getAs[Long]("y_sum") == expected,
          s"doc $id decoded wrong: y_sum ${r.getAs[Long]("y_sum")}")
      }
    } finally q.stop()
  }

  test("micro-batch slicing does not change the admitted hash set") {
    val all = Seq(jpeg(1, 1), jpeg(2, 2), png(11, 1), png(5, 5))
    val a = run("img_a", Seq(all)).map(t => (t._2, t._3)).toSet
    val b = run("img_b", Seq(Seq(jpeg(1, 1)), Seq(jpeg(2, 2), png(11, 1)),
      Seq(png(5, 5)))).map(t => (t._2, t._3)).toSet
    assert(a == b && a.size == 3)
  }

  test("unsupported content type fails the query loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Img]
    val q = StreamingImageDedup.firstSeenImages(mem.toDF(), w, h)
      .writeStream.format("memory").queryName("img_bad")
      .outputMode("append").start()
    try {
      mem.addData(Img(7, "image/gif", Array[Byte](1, 2, 3)))
      assertThrows[StreamingQueryException](q.processAllAvailable())
    } finally q.stop()
  }
}
