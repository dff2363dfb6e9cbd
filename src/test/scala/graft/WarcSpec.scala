package graft

import graft.sources.Warc
import org.scalatest.funsuite.AnyFunSuite

/** The WARC reader against spec-conformant synthetic archives (the
  * Jp2Fixture discipline: build the bytes from the public format,
  * prove parse ∘ build is exact): record framing across types,
  * CRLF-containing payloads, the HTTP response split, per-record
  * gzip members (Common Crawl's layout), the crawl→documents
  * projection, and loud refusal on truncation/mis-framing.
  */
class WarcSpec extends AnyFunSuite with SharedSpark {

  private def crlf(lines: Seq[String]): String = lines.mkString("", "\r\n", "\r\n")

  /** One spec-conformant record (version line, headers incl. the
    * mandatory Content-Length, blank line, payload, separator).
    */
  private def record(warcType: String, id: String, uri: String,
      date: String, payload: Array[Byte],
      contentType: String = "application/http; msgtype=response")
      : Array[Byte] = {
    val head = crlf(Seq(
      "WARC/1.0",
      s"WARC-Type: $warcType",
      s"WARC-Record-ID: <urn:uuid:$id>",
      s"WARC-Date: $date") ++
      (if (uri.nonEmpty) Seq(s"WARC-Target-URI: $uri") else Nil) ++ Seq(
      s"Content-Type: $contentType",
      s"Content-Length: ${payload.length}",
      ""))
    head.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def httpResponse(body: String): Array[Byte] =
    (crlf(Seq("HTTP/1.1 200 OK", "Content-Type: text/html",
      s"Content-Length: ${body.getBytes("UTF-8").length}", "")) + body)
      .getBytes("UTF-8")

  private val html1 =
    "<html><head><style>p{}</style><script>var x=1;</script></head>" +
      "<body><p>Hello crawl\r\nworld</p></body></html>"
  private val html2 = "<html><body>second page text</body></html>"

  private def archive: Array[Byte] =
    record("warcinfo", "aaaa", "", "2024-01-01T00:00:00Z",
      "software: graft-test\r\n".getBytes("UTF-8"),
      contentType = "application/warc-fields") ++
      record("request", "bbbb", "http://example.com/a",
        "2024-01-01T00:00:01Z",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("UTF-8")) ++
      record("response", "cccc", "http://example.com/a",
        "2024-01-01T00:00:01Z", httpResponse(html1)) ++
      record("response", "dddd", "http://example.com/b",
        "2024-01-01T00:00:02Z", httpResponse(html2))

  private def gzipPerRecord(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r); gz.finish()
    }
    out.toByteArray
  }

  test("record framing: all types parsed, headers case-insensitive, " +
      "CRLF-bearing payloads framed by Content-Length alone") {
    val recs = Warc.parseRecords(archive)
    assert(recs.map(_.warcType) ==
      Seq("warcinfo", "request", "response", "response"))
    assert(recs(2).targetUri == "http://example.com/a")
    assert(recs(2).header("warc-target-uri").contains("http://example.com/a"))
    // the payload carries \r\n\r\n INSIDE it (HTTP head/body split):
    // only Content-Length may frame the record
    assert(new String(recs(2).payload, "UTF-8").contains("Hello crawl\r\nworld"))
    val http = Warc.httpSplit(recs(2).payload).get
    assert(http._1 == "HTTP/1.1 200 OK")
    assert(http._2("content-type") == "text/html")
    assert(new String(http._3, "UTF-8") == html1)
    // non-HTTP payloads split to None
    assert(Warc.httpSplit(recs(0).payload).isEmpty)
  }

  test("per-record gzip members (Common Crawl layout) inflate to the " +
      "same record sequence as the plain archive") {
    val plain = Warc.parseRecords(archive)
    val gz = gzipPerRecord(Seq(
      record("warcinfo", "aaaa", "", "2024-01-01T00:00:00Z",
        "software: graft-test\r\n".getBytes("UTF-8"),
        contentType = "application/warc-fields"),
      record("request", "bbbb", "http://example.com/a",
        "2024-01-01T00:00:01Z",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes("UTF-8")),
      record("response", "cccc", "http://example.com/a",
        "2024-01-01T00:00:01Z", httpResponse(html1)),
      record("response", "dddd", "http://example.com/b",
        "2024-01-01T00:00:02Z", httpResponse(html2))))
    val inflated = Warc.parseRecords(Warc.maybeGunzip(gz))
    assert(inflated.map(_.recordId) == plain.map(_.recordId))
    assert(inflated(2).payload.toSeq == plain(2).payload.toSeq)
  }

  test("Spark scan + documents projection: response records become " +
      "(doc_id, url, ts, text) rows with tags stripped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    java.nio.file.Files.write(dir.resolve("a.warc"), archive)
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gzipPerRecord(Seq(
      record("response", "eeee", "http://example.com/c",
        "2024-01-01T00:00:03Z", httpResponse(html2)))))
    val df = Warc.read(spark, s"$dir/*")
    assert(df.count() == 5)
    assert(df.filter(org.apache.spark.sql.functions.col("warc_type") ===
      "response").count() == 3)
    val docs = Warc.documents(spark, s"$dir/*")
      .orderBy("url").collect()
    assert(docs.length == 3)
    assert(docs.map(_.getAs[String]("url")).toSeq ==
      Seq("http://example.com/a", "http://example.com/b",
        "http://example.com/c"))
    val textA = docs(0).getAs[String]("text")
    assert(textA.contains("Hello crawl"))
    assert(!textA.contains("<") && !textA.contains("var x"),
      s"tags/scripts leaked: '$textA'")
    // doc_ids are distinct stable hashes; timestamps parsed
    assert(docs.map(_.getAs[Long]("doc_id")).distinct.length == 3)
    assert(docs(0).getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.parse("2024-01-01T00:00:01Z"))
  }

  test("END-TO-END: a crawl archive runs the full curation funnel — " +
      "WARC -> documents -> language-ID -> quality gate -> exact + " +
      "near dedup") {
    import graft.operators.CorpusPipeline
    import org.apache.spark.sql.functions._
    val en1 = ("the data of the crawl and the tokens to keep is in " +
      "this page and the quality of the text is in the words " +
      "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma").trim
    val en2 = en1.replace("alpha", "alpha2") // near-dup of en1
    val en3 = "the report of the day and the numbers to read is in " +
      "this page one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val de = "der hund und die katze ist ein tier und das haus ist " +
      "ein ort der ruhe und die sonne ist ein stern am himmel klar"
    val tiny = "the end"
    val pages = Seq(
      ("p1", "http://a.example/1", en1),
      ("p2", "http://a.example/2", en1), // exact dup of p1
      ("p3", "http://a.example/3", en2), // near dup of p1
      ("p4", "http://b.example/1", en3),
      ("p5", "http://b.example/2", de), // wrong language
      ("p6", "http://b.example/3", tiny)) // below min tokens
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-e2e")
    java.nio.file.Files.write(dir.resolve("crawl.warc.gz"),
      gzipPerRecord(pages.map { case (id, url, body) =>
        record("response", id, url, "2024-02-01T00:00:00Z",
          httpResponse(s"<html><body>$body</body></html>"))
      }))

    // q22's function-word language heuristic supplies the lang column
    // a raw crawl does not carry
    def hits(words: String) =
      s"CAST(size(regexp_extract_all(lower(text), '\\\\b(?:$words)\\\\b', 0)) AS BIGINT)"
    val docs = Warc.documents(spark, s"$dir/*")
      .withColumn("h_en", expr(hits("the|of|and|to|is|in")))
      .withColumn("h_de", expr(hits("der|die|das|und|ist|ein")))
      .withColumn("lang", expr(
        "CASE WHEN h_en >= h_de THEN 'en' ELSE 'de' END"))
      .withColumn("source", expr("parse_url(url, 'HOST')"))
      .select("doc_id", "url", "source", "lang", "text")

    val cfg = CorpusPipeline.Config()
    val gated = CorpusPipeline.qualityGate(
      CorpusPipeline.withFeatures(docs), cfg)
    val deduped = CorpusPipeline.exactDedup(gated)
    val near = CorpusPipeline.nearDedup(deduped, cfg)

    def urls(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("url").collect().map(_.getString(0)).toSet
    // gate: the German page and the tiny page are out, all four
    // English pages survive
    assert(urls(gated) == Set("http://a.example/1", "http://a.example/2",
      "http://a.example/3", "http://b.example/1"))
    // exact dedup: p2 (verbatim re-crawl of p1) collapses onto the
    // lower doc_id of the pair; p3/p4 survive
    val dedupedUrls = urls(deduped)
    assert(dedupedUrls.size == 3 &&
      dedupedUrls.intersect(Set("http://a.example/1", "http://a.example/2"))
        .size == 1 &&
      dedupedUrls.contains("http://a.example/3") &&
      dedupedUrls.contains("http://b.example/1"))
    // near dedup: p3 differs from p1 by one token — the pair's
    // signatures agree on >= 9 of 12 minhashes and one of them drops
    val nearUrls = urls(near)
    assert(nearUrls.size == 2, s"near-dedup kept $nearUrls")
    assert(nearUrls.contains("http://b.example/1"))
    assert(nearUrls.intersect(Set("http://a.example/1",
      "http://a.example/2", "http://a.example/3")).size == 1)
    // and the host-derived source column survived the funnel
    assert(near.select("source").collect().map(_.getString(0)).toSet
      .subsetOf(Set("a.example", "b.example")))
  }

  test("httpSplit without a blank line keeps the whole head (no " +
      "4-byte chop) and yields an empty body") {
    val bare = "HTTP/1.1 304 Not Modified".getBytes("UTF-8")
    val (status, hdrs, body) = Warc.httpSplit(bare).get
    assert(status == "HTTP/1.1 304 Not Modified")
    assert(hdrs.isEmpty && body.isEmpty)
    val headerOnly = "HTTP/1.1 204 No Content\r\nServer: t\r\nX-A: b"
      .getBytes("UTF-8")
    val (s2, h2, b2) = Warc.httpSplit(headerOnly).get
    assert(s2 == "HTTP/1.1 204 No Content")
    assert(h2 == Map("server" -> "t", "x-a" -> "b"), s"head chopped: $h2")
    assert(b2.isEmpty)
  }

  test("headerList preserves original case and repeated headers; " +
      "lookup map is lowercased last-wins") {
    val payload = "x".getBytes("UTF-8")
    val rec = crlf(Seq(
      "WARC/1.0",
      "WARC-Type: metadata",
      "WARC-Concurrent-To: <urn:uuid:one>",
      "WARC-Concurrent-To: <urn:uuid:two>",
      s"Content-Length: ${payload.length}",
      "")).getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val r = Warc.parseRecords(rec).head
    assert(r.headerList.map(_._1).count(_ == "WARC-Concurrent-To") == 2)
    assert(r.headerList.exists(_._1 == "WARC-Type")) // original case kept
    assert(r.headerList.map(_._2).filter(_.startsWith("<urn")) ==
      Seq("<urn:uuid:one>", "<urn:uuid:two>"))
    assert(r.header("warc-concurrent-to").contains("<urn:uuid:two>"))
  }

  test("HTTP Content-Encoding and charset are honored: gzip bodies " +
      "inflate, latin-1 decodes, br/unknown-charset surface as null") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo); g.write(b); g.finish()
      bo.toByteArray
    }
    def resp(headers: Seq[String], body: Array[Byte]): Array[Byte] =
      (crlf(Seq("HTTP/1.1 200 OK") ++ headers ++
        Seq(s"Content-Length: ${body.length}", ""))).getBytes("ISO-8859-1") ++ body
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new Array[Byte](b.length * 2 + 64)
      val n = d.deflate(out); out.take(n)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-enc")
    java.nio.file.Files.write(dir.resolve("enc.warc"),
      record("response", "g1", "http://e.example/gz", "2024-01-01T00:00:00Z",
        resp(Seq("Content-Type: text/html", "Content-Encoding: gzip"),
          gz("<p>unzipped text</p>".getBytes("UTF-8")))) ++
      record("response", "d1", "http://e.example/df", "2024-01-01T00:00:01Z",
        resp(Seq("Content-Type: text/html", "Content-Encoding: deflate"),
          deflate("<p>deflated text</p>".getBytes("UTF-8")))) ++
      record("response", "l1", "http://e.example/l1", "2024-01-01T00:00:02Z",
        resp(Seq("Content-Type: text/html; charset=ISO-8859-1"),
          "café".getBytes("ISO-8859-1"))) ++
      record("response", "b1", "http://e.example/br", "2024-01-01T00:00:03Z",
        resp(Seq("Content-Type: text/html", "Content-Encoding: br"),
          Array[Byte](1, 2, 3))) ++
      record("response", "u1", "http://e.example/uc", "2024-01-01T00:00:04Z",
        resp(Seq("Content-Type: text/html; charset=no-such-cs-9"),
          "abc".getBytes("UTF-8"))))
    val rows = Warc.read(spark, s"$dir/*")
      .select("target_uri", "http_body").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows("http://e.example/gz").get.contains("unzipped text"))
    assert(rows("http://e.example/df").get.contains("deflated text"))
    assert(rows("http://e.example/l1").get == "café")
    assert(rows("http://e.example/br").isEmpty, "br body must surface as null")
    assert(rows("http://e.example/uc").isEmpty, "unknown charset must be null")
  }

  test("CDX index: gzip member spans partition the archive exactly, " +
      "one row per record with its member's byte range") {
    val members = Seq(
      record("warcinfo", "aaaa", "", "2024-01-01T00:00:00Z",
        "software: graft-test\r\n".getBytes("UTF-8"),
        contentType = "application/warc-fields"),
      record("response", "cccc", "http://example.com/a",
        "2024-01-01T00:00:01Z", httpResponse(html1)),
      record("response", "dddd", "http://example.com/b",
        "2024-01-01T00:00:02Z", httpResponse(html2)))
    val gz = gzipPerRecord(members)
    val spans = Warc.gzipMemberSpans(gz)
    assert(spans.length == 3)
    assert(spans.head._1 == 0L)
    // contiguous and exhaustive: each member starts where the
    // previous ended, and the last ends at the file end
    spans.sliding(2).foreach { case Seq((o1, l1), (o2, _)) =>
      assert(o1 + l1 == o2)
    }
    assert(spans.last._1 + spans.last._2 == gz.length)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cdx")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gz)
    // plain .warc: spans are the record spans
    java.nio.file.Files.write(dir.resolve("b.warc"), archive)
    val idx = Warc.cdx(spark, s"$dir/*").orderBy("path", "offset").collect()
    val (gzRows, plainRows) = idx.partition(_.getString(0).endsWith(".gz"))
    assert(gzRows.map(_.getString(3)).toSeq ==
      members.indices.map(i => Seq("<urn:uuid:aaaa>", "<urn:uuid:cccc>",
        "<urn:uuid:dddd>")(i)))
    assert(plainRows.length == 4) // the shared 4-record archive
    // plain spans are increasing and within the file
    val plainSpans = plainRows.map(r => (r.getLong(1), r.getLong(2)))
    assert(plainSpans.head._1 == 0L)
    assert(plainSpans.map(s => s._1 + s._2).max <= archive.length)
  }

  test("CDX-sliced read: reading every slice reproduces the full " +
      "scan; reading ONE slice fetches exactly that record") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-slice")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gzipPerRecord(Seq(
      record("response", "r1", "http://example.com/1",
        "2024-01-01T00:00:01Z", httpResponse(html1)),
      record("response", "r2", "http://example.com/2",
        "2024-01-01T00:00:02Z", httpResponse(html2)),
      record("request", "r3", "http://example.com/2",
        "2024-01-01T00:00:02Z",
        "GET /2 HTTP/1.1\r\n\r\n".getBytes("UTF-8")))))
    java.nio.file.Files.write(dir.resolve("b.warc"), archive)
    val idx = Warc.cdx(spark, s"$dir/*")
    val full = Warc.read(spark, s"$dir/*")
      .orderBy("record_id").collect().toSeq
    val sliced = Warc.readSliced(spark, idx)
      .orderBy("record_id").collect().toSeq
    assert(sliced.map(_.toSeq) == full.map(_.toSeq),
      "sliced scan diverged from the full scan")
    // a single-record selection decodes just that record
    val one = Warc.readSliced(spark,
      idx.filter(org.apache.spark.sql.functions.col("record_id") ===
        "<urn:uuid:r2>")).collect()
    assert(one.length == 1)
    assert(one.head.getAs[String]("target_uri") == "http://example.com/2")
    assert(one.head.getAs[String]("http_body").contains("second page"))
  }

  test("malformed archives refuse loudly: truncation, missing " +
      "Content-Length, junk framing") {
    val full = archive
    intercept[IllegalArgumentException] {
      Warc.parseRecords(full.take(full.length - 40)) // cut mid-payload
    }
    intercept[IllegalArgumentException] {
      Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    }
    val noLen = crlf(Seq("WARC/1.0", "WARC-Type: response", "")) + "x"
    intercept[IllegalArgumentException] {
      Warc.parseRecords(noLen.getBytes("UTF-8"))
    }
  }

  test("truncated deflate body returns null (refuse-don't-corrupt), " +
      "matching the unknown-encoding convention") {
    val text = "the quick brown fox jumps over the lazy dog " * 40
    val raw = text.getBytes("UTF-8")
    // zlib-wrapped stream
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2)
    val n = d.deflate(buf)
    val whole = buf.take(n)
    assert(new String(Warc.inflateDeflate(whole), "UTF-8") == text)
    // a truncated stream must NOT yield silently partial text
    assert(Warc.inflateDeflate(whole.take(whole.length / 2)) == null)
    // and bodyText surfaces that as null, not chopped text
    assert(Warc.bodyText(
      Map("content-encoding" -> "deflate"),
      whole.take(whole.length / 2)) == null)
  }

  test("truncated gzip member header refuses with the descriptive " +
      "cdx error, not ArrayIndexOutOfBounds") {
    // FNAME flag set but the name's zero terminator never arrives
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 8,
      0, 0, 0, 0, 0, 0) ++ "nozero".getBytes("UTF-8")
    val e1 = intercept[IllegalArgumentException] {
      Warc.gzipMemberSpans(hdr)
    }
    assert(e1.getMessage.contains("truncated gzip member header"))
    // FEXTRA length field running past the buffer end
    val hdr2 = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 4,
      0, 0, 0, 0, 0, 0, 0x40, 0)
    val e2 = intercept[IllegalArgumentException] {
      Warc.gzipMemberSpans(hdr2)
    }
    assert(e2.getMessage.contains("truncated gzip member header"))
  }

  test("readSliced resolves paths with spaces and bare paths " +
      "(no URISyntaxException, no authority mis-parse)") {
    val dir = java.nio.file.Files.createTempDirectory("graft warc sp")
    java.nio.file.Files.write(dir.resolve("a.warc"), archive)
    val idx = Warc.cdx(spark, dir.toString + "/*")
    // the binaryFile path column may carry file: URIs; also force a
    // bare-path row through the same resolver
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val bare = idx.withColumn("path",
      regexp_replace(col("path"), "^file:(//)?", ""))
    val viaUri = Warc.readSliced(spark, idx).orderBy("record_id")
      .collect().map(_.toSeq.drop(1)).toSeq
    val viaBare = Warc.readSliced(spark, bare).orderBy("record_id")
      .collect().map(_.toSeq.drop(1)).toSeq
    assert(viaUri.nonEmpty && viaUri == viaBare)
  }
}
