package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) reader — the ingestion format of
  * web-crawl training data (Common Crawl publishes its corpus as
  * `.warc.gz` segments). Zero-dependency, like the repo's other
  * binary codecs: record framing, header parse, and the HTTP
  * response split are implemented from the public spec.
  *
  * Format (ISO 28500 §4): records start with a version line
  * (`WARC/1.0` or `WARC/1.1`), then `Name: Value` header lines, an
  * empty line, exactly `Content-Length` payload bytes, and a
  * `\r\n\r\n` record separator. For `WARC-Type: response` records
  * the payload is an HTTP message; [[httpSplit]] separates status +
  * headers from the body on the first blank line.
  *
  * Gzip: Common Crawl writes ONE gzip member per record,
  * concatenated. `java.util.zip.GZIPInputStream` consumes
  * concatenated members as one stream, so whole-file decompression
  * reads every record. At 100 TB a reader splits work by the CDX
  * index's per-record (offset, length) instead — each task then
  * inflates only its own members; the record parser below is that
  * per-slice kernel, so only the split strategy changes, not the
  * parse.
  *
  * Malformed input refuses loudly (missing version line, short
  * payload, non-numeric Content-Length) — a crawl archive that
  * mis-frames one record would otherwise silently corrupt every
  * record after it.
  */
object Warc {

  /** One parsed record: `headerList` preserves original name case and
    * repeated headers in file order (ISO 28500 permits repeats, e.g.
    * multiple WARC-Concurrent-To); `headers` is the lowercased
    * last-wins lookup map derived from it.
    */
  case class Record(version: String, headers: Map[String, String],
      headerList: Seq[(String, String)], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.get(name.toLowerCase(java.util.Locale.ROOT))
    def warcType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
    def date: String = header("WARC-Date").getOrElse("")
    def recordId: String = header("WARC-Record-ID").getOrElse("")
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse every record of an (uncompressed) WARC byte array. */
  def parseRecords(bytes: Array[Byte]): Seq[Record] =
    parseRecordsWithSpans(bytes).map(_._1)

  /** [[parseRecords]] plus each record's byte span [from, until) in
    * the input (version line through payload end) — the offsets a
    * CDX index of a PLAIN .warc stores.
    */
  private[graft] def parseRecordsWithSpans(bytes: Array[Byte])
      : Seq[(Record, Int, Int)] = {
    val out = Seq.newBuilder[(Record, Int, Int)]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i
    }
    def line(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val raw = ascii(bytes, from, e)
      (raw.stripSuffix("\r"), math.min(e + 1, bytes.length))
    }
    while (pos < bytes.length) {
      // skip inter-record blank lines
      while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val recStart = pos
        val (version, p1) = line(pos)
        require(version.startsWith("WARC/"),
          s"WARC: expected a version line at byte $pos, got " +
            s"'${version.take(40)}'")
        var p = p1
        val hdrList = Seq.newBuilder[(String, String)]
        var blank = false
        while (!blank) {
          require(p < bytes.length, "WARC: headers ran off the file")
          val (l, np) = line(p)
          p = np
          if (l.isEmpty) blank = true
          else {
            val cut = l.indexOf(':')
            require(cut > 0, s"WARC: malformed header line '${l.take(60)}'")
            hdrList += l.take(cut).trim -> l.drop(cut + 1).trim
          }
        }
        val headerList = hdrList.result()
        val headers = headerList.map { case (k, v) =>
          k.toLowerCase(java.util.Locale.ROOT) -> v
        }.toMap
        val len = headers.get("content-length")
          .flatMap(_.toLongOption)
          .getOrElse(throw new IllegalArgumentException(
            "WARC: record without a numeric Content-Length"))
        require(p + len <= bytes.length,
          s"WARC: truncated record (payload $len bytes, " +
            s"${bytes.length - p} left)")
        val payload = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
        out += ((Record(version, headers, headerList, payload),
          recStart, p + len.toInt))
        pos = p + len.toInt
      }
    }
    out.result()
  }

  /** Inflate a (possibly multi-member) gzip buffer; passthrough for
    * plain bytes. Hard 2 GB cap: a JVM byte array tops out at
    * Int.MaxValue, so a task-local inflate cannot hold more — refuse
    * with a message naming the limit (and the CDX-sliced read plan in
    * the header comment) instead of dying in ArrayIndexOutOfBounds /
    * OOM deep inside ByteArrayOutputStream.
    */
  private[graft] def maybeGunzip(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      val cap = Int.MaxValue - (64 << 20) // headroom for BAOS doubling
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 65536)
      val out = new java.io.ByteArrayOutputStream(
        math.min(bytes.length.toLong * 4, 1L << 26).toInt)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        require(out.size().toLong + n <= cap,
          s"WARC: inflated archive exceeds the ${cap / (1 << 20)} MiB " +
            "per-task byte-array limit; split the read by CDX " +
            "(offset, length) slices instead of whole-file inflate " +
            "(see the Warc scaladoc)")
        out.write(buf, 0, n); n = in.read(buf)
      }
      out.toByteArray
    } else bytes

  /** Inflate a raw-deflate (HTTP Content-Encoding: deflate) body;
    * accepts both zlib-wrapped and raw streams (servers ship both).
    * A truncated stream (inflater still wants input at end-of-buffer)
    * returns null — the same refuse-don't-corrupt convention
    * [[bodyText]] applies to unsupported encodings — so a corrupt
    * body never flows into dedup/quality stages as silently chopped
    * text.
    */
  private[graft] def inflateDeflate(bytes: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](65536)
      var stalled = false
      while (!inf.finished() && !inf.needsInput() && !stalled) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) stalled = true // needsDictionary
      }
      if (!inf.finished()) null // truncated / dictionary-requiring stream
      else out.toByteArray
    }
    try run(nowrap = false)
    catch { case _: java.util.zip.DataFormatException => run(nowrap = true) }
  }

  /** Byte spans [offset, offset+length) of every gzip MEMBER in a
    * concatenated-member buffer (RFC 1952: per member a 10-byte
    * fixed header + optional FEXTRA/FNAME/FCOMMENT/FHCRC fields,
    * deflate body, CRC32 + ISIZE trailer). The member walk is what a
    * CDX indexer runs once per archive so that every later read can
    * inflate ONLY its own member.
    */
  private[graft] def gzipMemberSpans(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require(pos + 10 <= bytes.length &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"WARC cdx: not a gzip member header at byte $pos")
      require((bytes(pos + 2) & 0xff) == 8,
        s"WARC cdx: unsupported gzip compression method " +
          s"${bytes(pos + 2) & 0xff} at byte $pos")
      val flg = bytes(pos + 3) & 0xff
      pos += 10
      def truncated() = throw new IllegalArgumentException(
        s"WARC cdx: truncated gzip member header at byte $start")
      if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length
        if (pos + 2 > bytes.length) truncated()
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
        if (pos > bytes.length) truncated()
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        if (pos >= bytes.length) truncated()
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        if (pos >= bytes.length) truncated()
        pos += 1
      }
      if ((flg & 2) != 0) { // FHCRC
        pos += 2
        if (pos > bytes.length) truncated()
      }
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        require(inf.inflate(buf) > 0 || inf.finished(),
          s"WARC cdx: truncated deflate stream in member at byte $start")
      }
      pos += inf.getBytesRead.toInt + 8 // deflate body + CRC32 + ISIZE
      inf.end()
      require(pos <= bytes.length,
        s"WARC cdx: member at byte $start runs past the file end")
      out += ((start.toLong, (pos - start).toLong))
    }
    out.result()
  }

  /** CDX-style record index of WARC archives: one row per record —
    * (path, offset, length, record_id, warc_type, target_uri) where
    * [offset, offset+length) is the byte range a reader must fetch
    * to decode that record alone. For `.warc.gz` in the Common Crawl
    * one-member-per-record layout the range is the record's GZIP
    * MEMBER; for plain `.warc` it is the record's own span. This is
    * the 100 TB read plan from the scaladoc made concrete: build the
    * index once (one sequential pass per archive), then every query
    * fans out by (offset, length) and inflates only what it reads —
    * see [[readSliced]].
    */
  def cdx(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val isGz = raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
          (raw(1) & 0xff) == 0x8b
        if (isGz)
          gzipMemberSpans(raw).flatMap { case (off, len) =>
            val member = java.util.Arrays.copyOfRange(
              raw, off.toInt, (off + len).toInt)
            // Common Crawl writes one record per member; tolerate
            // more — every record in the member maps to its range
            parseRecords(maybeGunzip(member)).map(r =>
              (path, off, len, r.recordId, r.warcType, r.targetUri))
          }
        else
          parseRecordsWithSpans(raw).map { case (r, from, until) =>
            (path, from.toLong, (until - from).toLong,
              r.recordId, r.warcType, r.targetUri)
          }
      }
      .toDF("path", "offset", "length", "record_id", "warc_type",
        "target_uri")
  }

  /** Byte-range record scan: read ONLY the (offset, length) slices a
    * CDX selection names — the cluster-scale counterpart of [[read]]
    * (same output schema). Rows are grouped by path inside each
    * partition so one file handle serves consecutive slices; each
    * task fetches and inflates just its own members, so reading 100
    * records out of a 100 TB archive set costs 100 range reads, not
    * a whole-file inflate. `file:` URIs and bare paths are
    * supported (the test/local transport; an object-store ranged GET
    * drops in at the marked seek+read).
    */
  def readSliced(spark: SparkSession, cdxRows: DataFrame): DataFrame = {
    import spark.implicits._
    cdxRows.select(col("path"), col("offset"), col("length"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (path, slices) =>
          // Only URI-parse strings that are already file: URIs — a
          // bare path with spaces/URI-illegal chars would throw in
          // URI(), and a bare relative path would parse its first
          // segment as the authority and resolve the wrong file.
          val local =
            if (path.startsWith("file:"))
              try new java.io.File(new java.net.URI(path))
              catch { // unencoded spaces etc.: strip the scheme raw
                case _: Exception =>
                  new java.io.File(path.stripPrefix("file:")
                    .replaceFirst("^//(?=/)", ""))
              }
            else new java.io.File(path)
          val raf = new java.io.RandomAccessFile(local, "r")
          try {
            slices.sortBy(_._2).flatMap { case (_, off, len) =>
              // the ranged read — an object store's GET Range goes here
              val buf = new Array[Byte](len.toInt)
              raf.seek(off)
              raf.readFully(buf)
              parseRecords(maybeGunzip(buf)).map { r =>
                val http = httpSplit(r.payload)
                (path, r.version, r.warcType, r.recordId, r.targetUri,
                  r.date, r.header("Content-Type").getOrElse(""),
                  r.payload.length.toLong,
                  http.map(_._1).getOrElse(""),
                  http.map(h => bodyText(h._2, h._3)).getOrElse(""))
              }
            }.iterator
          } finally raf.close()
        }
      }
      .toDF("path", "warc_version", "warc_type", "record_id",
        "target_uri", "warc_date", "content_type", "payload_len",
        "http_status", "http_body")
  }

  /** Split an HTTP message payload into (status line, headers, body
    * bytes) on the first blank line; None when the payload is not an
    * HTTP message.
    */
  def httpSplit(payload: Array[Byte])
      : Option[(String, Map[String, String], Array[Byte])] = {
    if (!ascii(payload, 0, math.min(5, payload.length)).startsWith("HTTP/"))
      return None
    var i = 0
    var bodyAt = -1
    while (bodyAt < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') bodyAt = i + 4
      i += 1
    }
    // no blank line (header-only / truncated message): the whole
    // payload is head — do NOT chop 4 bytes for a separator that was
    // never there — and the body is empty.
    val headEnd = if (bodyAt < 0) payload.length else bodyAt - 4
    if (bodyAt < 0) bodyAt = payload.length
    val head = ascii(payload, 0, headEnd)
    val lines = head.split("\r\n").toSeq
    val hdrs = lines.drop(1).flatMap { l =>
      val cut = l.indexOf(':')
      if (cut <= 0) None
      else Some(l.take(cut).trim.toLowerCase(java.util.Locale.ROOT) ->
        l.drop(cut + 1).trim)
    }.toMap
    Some((lines.head,
      hdrs, java.util.Arrays.copyOfRange(payload, bodyAt, payload.length)))
  }

  /** Decode an HTTP response body to text honoring the message's own
    * Content-Encoding (identity/gzip/deflate — anything else, e.g.
    * `br`, returns null rather than mojibake) and the Content-Type
    * charset parameter (any JVM-supported charset; unknown/illegal
    * charset labels also return null). Absent charset defaults to
    * UTF-8 with replacement decoding — the Common Crawl convention.
    */
  private[graft] def bodyText(httpHeaders: Map[String, String],
      body: Array[Byte]): String = {
    val decoded = httpHeaders.get("content-encoding")
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .getOrElse("identity") match {
      case "" | "identity" => body
      case "gzip" | "x-gzip" => maybeGunzip(body)
      case "deflate" => inflateDeflate(body)
      case _ => null // br/zstd/compress: refuse, don't mojibake
    }
    if (decoded == null) return null
    val charsetRe = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:-]+)\"?".r
    val cs = httpHeaders.get("content-type")
      .flatMap(ct => charsetRe.findFirstMatchIn(ct).map(_.group(1)))
    cs match {
      case None => new String(decoded, java.nio.charset.StandardCharsets.UTF_8)
      case Some(label) =>
        try new String(decoded, java.nio.charset.Charset.forName(label))
        catch { case _: Exception => null } // unknown label: surface as null
    }
  }

  /** S10 — WARC scan: one row per record across every matching file
    * (`.warc` or `.warc.gz`), with the response records' HTTP status
    * and body surfaced as columns. The per-file parse is a
    * `flatMap` over the binaryFile scan — embarrassingly parallel,
    * records never leave their task until the projection.
    */
  /** The per-file record projection shared by the batch scan, the
    * CDX-sliced scan, and the STREAMING scan.
    */
  private def recordRows(path: String, raw: Array[Byte])
      : Seq[(String, String, String, String, String, String, String,
        Long, String, String)] =
    parseRecords(maybeGunzip(raw)).map { r =>
      val http = httpSplit(r.payload)
      (path, r.version, r.warcType, r.recordId, r.targetUri, r.date,
        r.header("Content-Type").getOrElse(""),
        r.payload.length.toLong,
        http.map(_._1).getOrElse(""),
        http.map(h => bodyText(h._2, h._3)).getOrElse(""))
    }

  private val readCols = Seq("path", "warc_version", "warc_type",
    "record_id", "target_uri", "warc_date", "content_type",
    "payload_len", "http_status", "http_body")

  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) => recordRows(path, raw) }
      .toDF(readCols: _*)
  }

  /** STREAMING record scan: new `.warc(.gz)` files landing under
    * `pathGlob` become record rows incrementally — the continuous
    * crawl-ingest front door (a crawler drops finished archives into
    * the landing prefix; Structured Streaming's file source tracks
    * processed files in the checkpoint log, so every archive is
    * parsed exactly once across restarts). Same schema as [[read]];
    * the per-file parse is the same stateless flatMap, so the whole
    * funnel (html_text → language-ID → quality gate → chunk dedup)
    * composes downstream unchanged.
    */
  def readStreamed(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      // the binaryFile schema, spelled out (streaming sources demand
      // an explicit schema; public types only)
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) => recordRows(path, raw) }
      .toDF(readCols: _*)
  }

  /** The [[documents]] projection over [[readStreamed]] — streaming
    * crawl→documents rows.
    */
  def documentsStream(spark: SparkSession, pathGlob: String): DataFrame = {
    graft.functions.HtmlFunctions.register(spark)
    readStreamed(spark, pathGlob)
      .filter(col("warc_type") === "response")
      .select(
        expr("xxhash64(record_id)").as("doc_id"),
        col("target_uri").as("url"),
        expr("to_timestamp(warc_date)").as("ts"),
        expr("html_text(http_body)").as("text"))
  }

  /** The crawl→documents projection: response records become
    * (doc_id, url, ts, text) rows — doc_id a stable 64-bit hash of
    * the record id, text the html_text extraction of the body
    * (functions/HtmlExpressions.scala: raw-text element removal,
    * quote-aware tag strip, entity decode, whitespace normalization —
    * a codegen Expression fused into this projection). Bodies read()
    * surfaced as null (refused Content-Encoding / unknown charset)
    * stay null here.
    */
  def documents(spark: SparkSession, pathGlob: String): DataFrame = {
    graft.functions.HtmlFunctions.register(spark)
    read(spark, pathGlob)
      .filter(col("warc_type") === "response")
      .select(
        expr("xxhash64(record_id)").as("doc_id"),
        col("target_uri").as("url"),
        expr("to_timestamp(warc_date)").as("ts"),
        expr("html_text(http_body)").as("text"))
  }
}
