package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image dedup AT INGEST (SURVEY.md §2.11 applied to
  * q197's crawl-image funnel): as binary image payloads stream in —
  * (doc_id, content_type, body) rows, the shape the WARC response
  * splitter emits — each is dispatched BY CONTENT TYPE to the
  * matching real codec (sources/Jpeg.scala / sources/Png.scala),
  * reduced to its 128-bit perceptual dhash, and only FIRST-SEEN
  * hashes are admitted. This is the write path of a crawl image
  * store: a mirror serving the same picture under another codec or
  * URL costs one decode, never a second stored copy.
  *
  * The dedup state is Structured Streaming's own `dropDuplicates`
  * keyed state on (dh0, dh1) — the engine-managed exactly-once form
  * (at 100 TB that state lives in RocksDB and IS the perceptual
  * index, so its growth with novel content is the point, not a
  * leak). Decode runs INSIDE the streaming plan via a stateless
  * mapPartitions — per-task, no driver round-trip, and a malformed
  * or mis-sized payload refuses loudly (the codecs' require
  * discipline) rather than admitting a corrupt hash.
  *
  * StreamingImageDedupSpec pins: the admitted set equals the batch
  * distinct-hash set regardless of micro-batch slicing, a cross-codec
  * mirror wave admits only novel images, and an unsupported content
  * type fails the query instead of passing garbage downstream.
  */
object StreamingImageDedup {

  /** Decode + hash inside the streaming plan: (doc_id, content_type,
    * body) → (doc_id, content_type, y_sum, dh0, dh1). Declared (w, h)
    * are enforced against the codec's own header — a dimension
    * mismatch is a corrupt payload, not a resize request.
    */
  def decodedHashes(rows: DataFrame, w: Int, h: Int): DataFrame = {
    val s = rows.sparkSession
    graft.functions.ImgFunctions.register(s)
    import s.implicits._
    rows.select(col("doc_id"), col("content_type"), col("body"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, ct, body) =>
          val (dw, dh, plane) = ct match {
            case "image/jpeg" =>
              val d = graft.sources.Jpeg.decode(body)
              (d.width, d.height, d.gray)
            case "image/png" =>
              val d = graft.sources.Png.decode(body)
              (d.width, d.height, d.gray)
            case other => throw new IllegalArgumentException(
              s"unsupported image content type '$other' for doc $id")
          }
          require(dw == w && dh == h,
            s"doc $id decodes to ${dw}x$dh, expected ${w}x$h")
          var sum = 0L
          var k = 0
          while (k < plane.length) { sum += plane(k) & 0xff; k += 1 }
          (id, ct, plane, sum)
        }
      }.toDF("doc_id", "content_type", "plane", "y_sum")
      .selectExpr("doc_id", "content_type", "y_sum",
        s"img_dhash(plane, $w, $h) AS dh")
      .selectExpr("doc_id", "content_type", "y_sum",
        "dh[0] AS dh0", "dh[1] AS dh1")
  }

  /** First-seen admission on the perceptual key (exact, unbounded
    * engine-managed keyed state — the image-store index).
    */
  def firstSeenImages(rows: DataFrame, w: Int, h: Int): DataFrame =
    decodedHashes(rows, w, h).dropDuplicates("dh0", "dh1")
}
