package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{Download, HttpTransport}
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** S6 over a REAL socket: a loopback `com.sun.net.httpserver` stands
  * in for the imagery provider, and the spec drives the full download
  * path — OAuth mint + 600 s refresh, Bearer headers, the manual
  * 30x redirect loop, 8 KiB chunked bodies, the 4-connection quota,
  * and log-and-continue failures (reference behaviors:
  * `/root/reference/code/imagery_store.py:92-163`, `:276-292`).
  */
class HttpTransportSpec extends AnyFunSuite {

  private val mintCount = new AtomicInteger(0)
  private val inFlight = new AtomicInteger(0)
  private val maxInFlight = new AtomicInteger(0)
  private val lastAuth = new java.util.concurrent.atomic.AtomicReference[String]("")

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) x.getResponseBody.write(body)
    x.close()
  }

  private def payload(n: Int): Array[Byte] =
    Array.tabulate(n)(i => (i % 251).toByte)

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"

    // OAuth mint: form-encoded POST -> JSON access_token, token value
    // changes per mint so refresh is observable
    server.createContext("/token", (x: HttpExchange) => {
      val form = new String(x.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      if (x.getRequestMethod == "POST" && form.contains("grant_type=password")
          && form.contains("username=alice")) {
        val n = mintCount.incrementAndGet()
        respond(x, 200,
          s"""{"access_token":"tok-$n","refresh_token":"r"}"""
            .getBytes(StandardCharsets.UTF_8))
      } else respond(x, 400, "bad grant".getBytes)
    })
    // /data/<name>: auth-checked, 302-redirects to /blob/<name>
    server.createContext("/data", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      lastAuth.set(auth)
      if (!auth.startsWith("Bearer tok-")) respond(x, 401, Array.empty)
      else {
        val name = x.getRequestURI.getPath.stripPrefix("/data/")
        x.getResponseHeaders.add("Location", s"$base/blob/$name")
        respond(x, 302, Array.empty)
      }
    })
    // /blob/<name>: the payload; tracks the concurrent-connection
    // high-water mark the 4-socket quota must bound
    server.createContext("/blob", (x: HttpExchange) => {
      val cur = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, cur))
      Thread.sleep(30) // hold the socket so overlap is observable
      val name = x.getRequestURI.getPath.stripPrefix("/blob/")
      val body =
        if (name == "missing") null else payload(20000 + name.hashCode.abs % 100)
      inFlight.decrementAndGet()
      if (body == null) respond(x, 404, Array.empty)
      else respond(x, 200, body)
    })
    // endless redirect chain for the loop bound
    server.createContext("/loop", (x: HttpExchange) => {
      val i = x.getRequestURI.getPath.stripPrefix("/loop/").toInt
      x.getResponseHeaders.add("Location", s"$base/loop/${i + 1}")
      respond(x, 302, Array.empty)
    })
    server.start()
    try test(server, base)
    finally server.stop(0)
  }

  test("mint + redirect + chunked body end-to-end over a real socket") {
    withServer { (_, base) =>
      mintCount.set(0)
      val clock = new Download.TokenClock(
        () => HttpTransport.mintToken(s"$base/token", "alice", "pw"))
      val got = Download.followRedirects(s"$base/data/b02.jp2",
        HttpTransport.getStep(() => clock.get()))
      assert(got.toSeq == payload(20000 + "b02.jp2".hashCode.abs % 100).toSeq)
      assert(mintCount.get() == 1) // one mint serves both requests
      // > 8 KiB payload proves the chunked reader reassembles frames
      assert(got.length > 8192)
    }
  }

  test("token refreshes after 600 s and the new Bearer reaches the wire") {
    withServer { (_, base) =>
      mintCount.set(0)
      var fakeNow = 1000L
      val clock = new Download.TokenClock(
        () => HttpTransport.mintToken(s"$base/token", "alice", "pw"),
        ttlSeconds = 600, now = () => fakeNow)
      HttpTransport.downloadTo(s"$base/data/a.jp2",
        java.nio.file.Files.createTempFile("graft", ".jp2"),
        () => clock.get())
      assert(mintCount.get() == 1 && lastAuth.get() == "Bearer tok-1")
      fakeNow += 599
      Download.followRedirects(s"$base/data/b.jp2",
        HttpTransport.getStep(() => clock.get()))
      assert(mintCount.get() == 1) // inside ttl: same token
      fakeNow += 2
      Download.followRedirects(s"$base/data/c.jp2",
        HttpTransport.getStep(() => clock.get()))
      assert(mintCount.get() == 2, "601 s old token must re-mint")
      assert(lastAuth.get() == "Bearer tok-2")
    }
  }

  test("4-connection quota bounds real-socket concurrency; failures skipped") {
    withServer { (_, base) =>
      mintCount.set(0); inFlight.set(0); maxInFlight.set(0)
      val clock = new Download.TokenClock(
        () => HttpTransport.mintToken(s"$base/token", "alice", "pw"))
      val urls = (1 to 12).map(i => s"$base/data/f$i.jp2") :+
        s"$base/data/missing" // 404 -> logged and skipped
      val got = HttpTransport.fetchPartition(urls, clock, maxConcurrent = 4)
      assert(got.size == 12)
      assert(got.forall { case (u, b) =>
        b.toSeq == payload(20000 +
          u.split('/').last.hashCode.abs % 100).toSeq })
      assert(maxInFlight.get() <= 4,
        s"quota breached: ${maxInFlight.get()} concurrent sockets")
      assert(maxInFlight.get() >= 2, "no overlap at all — cap untested")
    }
  }

  test("endless 302 chain hits the hop bound instead of spinning") {
    withServer { (_, base) =>
      val err = intercept[IllegalStateException] {
        Download.followRedirects(s"$base/loop/0",
          HttpTransport.getStep(() => "tok-1"))
      }
      assert(err.getMessage.contains("redirect loop"))
    }
  }

  test("401 from a bad token surfaces as an IOException") {
    withServer { (_, base) =>
      intercept[java.io.IOException] {
        Download.followRedirects(s"$base/data/x.jp2",
          HttpTransport.getStep(() => "not-a-minted-token"))
      }
    }
  }
}
