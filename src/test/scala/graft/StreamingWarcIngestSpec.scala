package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** END-TO-END streaming crawl ingest: `.warc.gz` archives landing in
  * a directory flow through Warc.readStreamed / documentsStream —
  * the continuous front door of the curation pipeline. Pins:
  * incremental file pickup (each new archive's records append
  * exactly once), the full projection (gzip members → HTTP split →
  * html_text) running INSIDE a streaming plan, and exactly-once
  * across a forced restart (the file source's checkpoint log must
  * not reprocess archives already ingested).
  */
class StreamingWarcIngestSpec extends AnyFunSuite with SharedSpark {

  private def crlf(lines: Seq[String]): String =
    lines.mkString("", "\r\n", "\r\n")

  private def response(id: String, url: String, body: String): Array[Byte] = {
    val http = (crlf(Seq("HTTP/1.1 200 OK", "Content-Type: text/html",
      s"Content-Length: ${body.getBytes("UTF-8").length}", "")) + body)
      .getBytes("UTF-8")
    (crlf(Seq("WARC/1.0", "WARC-Type: response",
      s"WARC-Record-ID: <urn:uuid:$id>",
      "WARC-Date: 2024-05-01T00:00:00Z",
      s"WARC-Target-URI: $url",
      "Content-Type: application/http; msgtype=response",
      s"Content-Length: ${http.length}", "")).getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1"))
  }

  private def gzMembers(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.toByteArray
  }

  test("streaming WARC ingest: incremental pickup, full projection " +
      "in-stream, exactly-once across restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    val landing = root.resolve("landing")
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    java.nio.file.Files.createDirectory(landing)

    def start() =
      Warc.documentsStream(spark, s"$landing/*.warc.gz")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    def ingested(): Map[String, String] =
      spark.read.parquet(outDir)
        .select("url", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap

    // archive 1 lands
    java.nio.file.Files.write(landing.resolve("seg-00001.warc.gz"),
      gzMembers(Seq(
        response("a1", "http://s.example/1",
          "<html><body><p>alpha page</p><script>x</script></body></html>"),
        response("a2", "http://s.example/2",
          "<html><body>beta&nbsp;page</body></html>"))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val after1 = ingested()
    assert(after1.keySet == Set("http://s.example/1", "http://s.example/2"))
    assert(after1("http://s.example/1") == "alpha page",
      "html_text must run inside the streaming plan")
    assert(after1("http://s.example/2") == "beta page")

    // archive 2 lands while the query is DOWN; restart must pick up
    // ONLY the new file (checkpointed file log), never re-ingest
    java.nio.file.Files.write(landing.resolve("seg-00002.warc.gz"),
      gzMembers(Seq(
        response("b1", "http://s.example/3",
          "<html><body>gamma page</body></html>"))))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(outDir).collect()
    assert(rows.length == 3, s"expected exactly-once append, got " +
      s"${rows.length} rows: duplicates mean the checkpoint replayed " +
      "an already-ingested archive")
    assert(ingested().keySet == Set("http://s.example/1",
      "http://s.example/2", "http://s.example/3"))
    // doc_ids are the stable record-id hashes, distinct across files
    assert(spark.read.parquet(outDir)
      .select("doc_id").distinct().count() == 3)
  }
}
