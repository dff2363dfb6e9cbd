package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{Download, HttpTransport, RasterIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

/** S3 + S6 + S5 composed over a REAL socket — the reference's whole
  * acquisition pipeline (`/root/reference/code/imagery_store.py`:
  * search → token → authenticated redirected download → band scan)
  * against a loopback `com.sun.net.httpserver`:
  *
  *   1. the DSv2 catalog scan GETs the OData endpoint with the
  *      COMPILED `$filter`/`$top` in the query string (server-side
  *      filtering on the wire, not just in the plan description);
  *   2. the returned products' band files download through the OAuth
  *      mint + Bearer + 302-redirect + 8 KiB-chunk path;
  *   3. `RasterIO.readBandFiles` scans the downloaded files and
  *      recovers band/resolution/tile from the filenames.
  */
class ODataHttpIntegrationSpec extends AnyFunSuite with SharedSpark {

  private val lastQuery = new AtomicReference[String]("")

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) x.getResponseBody.write(body)
    x.close()
  }

  private val bandFiles = Seq(
    "T32UPU_20230615T100031_B02_10m.jp2",
    "T32UPU_20230615T100031_B03_10m.jp2",
    "T33UVP_20230715T100029_B8A_20m.jp2")

  /** Real 12-bit JP2 codestreams (Jp2Fixture, 2 tile-parts like real
    * Sentinel-2 products), > 8 KiB so the chunked reader is real.
    */
  private val bandImages: Map[String, (Int, Int, Array[Int])] = {
    val rng = new scala.util.Random(29)
    bandFiles.map { name =>
      val (w, h) = (128, 96)
      name -> ((w, h, Array.fill(w * h)(rng.nextInt(1 << 12))))
    }.toMap
  }
  private val bandPayloads: Map[String, Array[Byte]] =
    bandImages.map { case (name, (w, h, img)) =>
      name -> Jp2Fixture.encode(img, w, h, levels = 3, bitDepth = 12,
        tileParts = 2)
    }

  private def payload(name: String): Array[Byte] = bandPayloads(name)

  private def catalogJson(base: String): String = {
    val products = bandFiles.zipWithIndex.map { case (f, i) =>
      s"""{"Id":"p$i","Name":"$f","S3Path":"$base/data/$f",
         | "OriginDate":"2023-06-15T10:00:00Z","Collection":"SENTINEL-2",
         | "ContentDate":{"Start":"2023-06-15T10:00:00Z","End":"2023-06-15T10:01:00Z"},
         | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         | "Attributes":[{"Name":"productType","Value":"S2MSI2A"}]}"""
        .stripMargin.replace("\n", "")
    }
    s"""{"value":[${products.mkString(",")}]}"""
  }

  private def withServer(test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"

    // the OData search endpoint: records the query string it was
    // asked (the on-the-wire pushdown evidence), serves the envelope —
    // or, for a `$count=true&$top=0` probe, the count envelope with NO
    // product rows (OData v4 §11.2.9: $count is over the filtered set)
    server.createContext("/odata/Products", (x: HttpExchange) => {
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      lastQuery.set(q)
      val body =
        if (q.contains("count=true"))
          s"""{"@odata.count":${bandFiles.size},"value":[]}"""
        else if (q.contains("orderby=")) {
          // the $orderby ... $top=1 & $select extremum probe: answer
          // with the one projected value, like a real OData endpoint
          val dec = java.net.URLDecoder.decode(q, "UTF-8")
          val m = """\$orderby=(\w+) (asc|desc)""".r.findFirstMatchIn(dec)
            .getOrElse(throw new IllegalStateException(s"bad orderby: $dec"))
          val (col, asc) = (m.group(1), m.group(2) == "asc")
          val vals = col match {
            case "Name" => bandFiles
            case "Id" => bandFiles.indices.map(i => s"p$i")
            case "OriginDate" => Seq.fill(bandFiles.size)("2023-06-15T10:00:00Z")
            case other => throw new IllegalStateException(s"col $other")
          }
          val v = if (asc) vals.min else vals.max
          s"""{"value":[{"$col":"$v"}]}"""
        } else catalogJson(base)
      respond(x, 200, body.getBytes(StandardCharsets.UTF_8))
    })
    server.createContext("/token", (x: HttpExchange) => {
      val form = new String(x.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      if (form.contains("grant_type=password"))
        respond(x, 200,
          """{"access_token":"tok-1"}""".getBytes(StandardCharsets.UTF_8))
      else respond(x, 400, Array.empty)
    })
    // auth-gated download: 302 to the blob, like the provider's
    // zipper service
    server.createContext("/data", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("")
      if (!auth.startsWith("Bearer tok-")) respond(x, 401, Array.empty)
      else {
        val name = x.getRequestURI.getPath.stripPrefix("/data/")
        x.getResponseHeaders.add("Location", s"$base/blob/$name")
        respond(x, 302, Array.empty)
      }
    })
    server.createContext("/blob", (x: HttpExchange) => {
      val name = x.getRequestURI.getPath.stripPrefix("/blob/")
      respond(x, 200, payload(name))
    })
    server.start()
    try test(base)
    finally server.stop(0)
  }

  test("a failing catalog endpoint surfaces as an error, never an empty scan") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/odata/Products",
      (x: HttpExchange) => respond(x, 503, "maintenance".getBytes))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val err = intercept[Exception] {
        spark.read.format("graft.sources.ODataCatalogSource")
          .option("url", s"$base/odata").load().count()
      }
      // a 503 must propagate (wrapped by Spark's task retry), not
      // silently yield zero products
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(err).exists(_.getMessage != null) &&
        chain(err).exists(t => Option(t.getMessage).exists(_.contains("503"))),
        chain(err).map(_.toString).mkString("\n"))
    } finally server.stop(0)
  }

  test("COUNT(*) probe reaches the wire as $count=true&$top=0 and " +
      "ships zero products") {
    withServer { base =>
      val n = spark.read.format("graft.sources.ODataCatalogSource")
        .option("url", s"$base/odata").load()
        .filter(col("Collection") === "SENTINEL-2")
        .agg(count(lit(1))).collect().head.getLong(0)
      assert(n == bandFiles.size.toLong)
      val q = lastQuery.get()
      // the decisive on-the-wire evidence: the count flag AND the
      // zero-row page cap AND the compiled filter, in ONE request
      assert(q.contains("count=true"), q)
      assert(q.contains("top=0"), q)
      assert(java.net.URLDecoder.decode(q, "UTF-8")
        .contains("Collection/Name eq 'SENTINEL-2'"), q)
    }
  }

  test("MIN/MAX push as single-row $orderby probes; mixed with COUNT " +
      "in one pushed aggregation") {
    withServer { base =>
      val cat = spark.read.format("graft.sources.ODataCatalogSource")
        .option("url", s"$base/odata").load()
      val row = cat.agg(count(lit(1)), min("Name"), max("Name")).collect().head
      assert(row.getLong(0) == bandFiles.size.toLong)
      assert(row.getString(1) == bandFiles.min)
      assert(row.getString(2) == bandFiles.max)
      // the last wire request was one of the single-row probes (each
      // agg issued its own; the final one is max(Name) desc)
      val q = java.net.URLDecoder.decode(lastQuery.get(), "UTF-8")
      assert(q.contains("$orderby=Name desc") && q.contains("$top=1")
        && q.contains("$select=Name"), q)
    }
  }

  test("catalog scan -> authenticated download -> band scan, end-to-end") {
    withServer { base =>
      // 1. DSv2 catalog scan over HTTP with pushdown on the wire
      val products = spark.read
        .format("graft.sources.ODataCatalogSource")
        .option("url", s"$base/odata").load()
        .filter(col("Collection") === "SENTINEL-2")
        .limit(3)
        .select("Name", "S3Path")
        .collect()
      assert(products.length == 3)
      val q = lastQuery.get()
      assert(q.contains("%24filter=") || q.contains("$filter="), q)
      assert(java.net.URLDecoder.decode(q, "UTF-8")
        .contains("Collection/Name eq 'SENTINEL-2'"), q)
      assert(q.contains("top=3"), q)

      // 2. download every band through mint + Bearer + 302 + chunks
      val clock = new Download.TokenClock(
        () => HttpTransport.mintToken(s"$base/token", "alice", "pw"))
      val urls = products.map(_.getString(1)).toSeq
      val got = HttpTransport.fetchPartition(urls, clock, maxConcurrent = 4)
      assert(got.size == 3)
      val dir = java.nio.file.Files.createTempDirectory("graft-bands")
      got.foreach { case (u, bytes) =>
        val name = u.split('/').last
        assert(bytes.toSeq == payload(name).toSeq, s"$name corrupted in flight")
        java.nio.file.Files.write(dir.resolve(name), bytes)
      }

      // 3. the downloaded files flow into the distributed band scan
      //    AND decode to bit-exact pixels (tier-2 + MQ + EBCOT + DWT)
      val bands = RasterIO.decodeBandPixels(
        RasterIO.readBandFiles(spark, dir.toString))
        .select("file", "band", "resolution_m", "tile", "width", "height",
          "pixels")
        .collect()
        .sortBy(_.getString(0))
      assert(bands.map(_.getString(0)).toSeq == bandFiles.sorted)
      assert(bands.map(r => (r.getString(1), r.getInt(2), r.getString(3)))
        .toSeq == Seq(
        ("B02", 10, "32UPU"), ("B03", 10, "32UPU"), ("B8A", 20, "33UVP")))
      bands.foreach { r =>
        val (w, h, img) = bandImages(r.getString(0))
        assert(r.getInt(4) == w && r.getInt(5) == h)
        assert(r.getSeq[Int](6).toSeq == img.toSeq,
          s"${r.getString(0)}: pixels corrupted in the search->download->" +
            "scan->decode pipeline")
      }

      // 4. and the first raster transform runs on them — the
      //    reference's R1 normalize (tx.py:20-23) on decoded pixels
      val norm = RasterIO.decodeBandPixels(
        RasterIO.readBandFiles(spark, dir.toString))
        .select(col("file"), graft.functions.Raster.normalizeS2(
          expr("transform(pixels, x -> CAST(x AS DOUBLE))")).as("u8"))
        .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      bandImages.foreach { case (name, (_, _, img)) =>
        val expected = img.map(v =>
          graft.functions.Raster.normalizeS2Scalar(v.toDouble)).toSeq
        assert(norm(name).toSeq == expected, s"$name normalize mismatch")
      }
    }
  }
}
