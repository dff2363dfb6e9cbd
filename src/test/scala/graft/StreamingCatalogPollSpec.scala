package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

/** SURVEY §2.11's incremental-catalog flavor COMPOSED end-to-end: the
  * LIVE DSv2 catalog scan (graft.sources.ODataCatalogSource `url`
  * transport, real loopback socket) feeds micro-batches into
  * [[EventStreams.catalogIncremental]] — event-time = OriginDate,
  * keyed dedup on the product uuid — so a product that stays in the
  * catalog across polls is emitted exactly once while newly published
  * products flow through. Until now the live transport
  * (ODataHttpIntegrationSpec) and the incremental dedup primitive
  * (StreamingSpec) were proven separately; this is the composition a
  * real poller runs.
  */
object StreamingCatalogPollSpec {
  case class PolledProduct(Id: String, Name: String, OriginDate: String)
}

class StreamingCatalogPollSpec extends AnyFunSuite with SharedSpark {
  import StreamingCatalogPollSpec.PolledProduct

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) x.getResponseBody.write(body)
    x.close()
  }

  private def catalogJson(products: Seq[(String, String, String)]): String = {
    val rows = products.map { case (id, name, origin) =>
      s"""{"Id":"$id","Name":"$name","S3Path":"/data/$name",
         | "OriginDate":"$origin","Collection":"SENTINEL-2",
         | "ContentDate":{"Start":"$origin","End":"$origin"},
         | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         | "Attributes":[{"Name":"productType","Value":"S2MSI2A"}]}"""
        .stripMargin.replace("\n", "")
    }
    s"""{"value":[${rows.mkString(",")}]}"""
  }

  test("live catalog poll: new products picked up between micro-batches, " +
      "re-served products deduped on uuid") {
    // the mutable "provider side": what the catalog endpoint serves NOW
    val live = new AtomicReference[Seq[(String, String, String)]](Seq(
      ("p0", "A.SAFE", "2023-06-15T10:00:00Z"),
      ("p1", "B.SAFE", "2023-06-15T11:00:00Z")))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/odata/Products", (x: HttpExchange) =>
      respond(x, 200,
        catalogJson(live.get).getBytes(StandardCharsets.UTF_8)))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[PolledProduct]
      val q = EventStreams.catalogIncremental(mem.toDF())
        .select("Id", "Name", "origin_ts")
        .writeStream.format("memory").queryName("catalog_poll")
        .outputMode("append").start()
      // one poll tick = one LIVE DSv2 scan over the socket feeding the
      // next micro-batch (exactly what a scheduled poller does)
      def poll(): Unit = {
        val rows = spark.read.format("graft.sources.ODataCatalogSource")
          .option("url", s"$base/odata").load()
          .select("Id", "Name", "OriginDate")
          .as[PolledProduct].collect()
        mem.addData(rows.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      try {
        poll()
        val first = spark.table("catalog_poll")
        assert(first.select("Id").as[String].collect().toSet ==
          Set("p0", "p1"))

        // between micro-batches the provider publishes p2; p0/p1 are
        // STILL in the catalog and come back in the next poll
        live.set(live.get :+ (("p2", "C.SAFE", "2023-06-15T12:00:00Z")))
        poll()
        val counts = spark.table("catalog_poll").groupBy("Id").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(counts.keySet == Set("p0", "p1", "p2"))
        assert(counts.values.forall(_ == 1L),
          s"uuid must be emitted exactly once: $counts")
        // and the event time really is the product's OriginDate
        val p2ts = spark.table("catalog_poll").filter($"Id" === "p2")
          .select("origin_ts").as[java.sql.Timestamp].head()
        assert(p2ts.toInstant == java.time.Instant.parse("2023-06-15T12:00:00Z"))
      } finally q.stop()
    } finally server.stop(0)
  }
}
