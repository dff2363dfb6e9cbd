package graft

import graft.functions.{UrlFunctions, UrlKernel}
import org.scalatest.funsuite.AnyFunSuite

/** The url_normalize kernel against its documented canonical form
  * (UrlExpressions scaladoc) — each rule individually, composed
  * cases, idempotence over random messy URLs, and the registered
  * SQL function through codegen.
  */
class UrlSpec extends AnyFunSuite with SharedSpark {

  private def n(s: String): String = UrlKernel.normalizeStr(s)

  test("scheme and host lowercase; userinfo and path case kept") {
    assert(n("HTTP://Example.COM/Path") == "http://example.com/Path")
    assert(n("https://User@HOST.example/A") == "https://User@host.example/A")
  }

  test("default ports stripped, others kept") {
    assert(n("http://a.example:80/x") == "http://a.example/x")
    assert(n("https://a.example:443/x") == "https://a.example/x")
    assert(n("http://a.example:8080/x") == "http://a.example:8080/x")
    assert(n("https://a.example:80/x") == "https://a.example:80/x")
  }

  test("fragment removed; empty path becomes /") {
    assert(n("http://a.example/x#frag") == "http://a.example/x")
    assert(n("http://a.example#frag") == "http://a.example/")
    assert(n("http://a.example") == "http://a.example/")
    assert(n("http://a.example?q=1#f") == "http://a.example/?q=1")
  }

  test("percent-escapes: unreserved decode, reserved kept uppercase") {
    assert(n("http://a.example/%64%6f%63") == "http://a.example/doc")
    assert(n("http://a.example/%7Ea") == "http://a.example/~a")
    // %2F is NOT a path separator — kept, hex uppercased
    assert(n("http://a.example/a%2fb") == "http://a.example/a%2Fb")
    assert(n("http://a.example/a%3db?x=%41") == "http://a.example/a%3Db?x=A")
    // malformed escapes pass through
    assert(n("http://a.example/a%zz") == "http://a.example/a%zz")
    assert(n("http://a.example/a%4") == "http://a.example/a%4")
  }

  test("dot-segments resolved per RFC 3986 5.2.4") {
    assert(n("http://a.example/a/./b") == "http://a.example/a/b")
    assert(n("http://a.example/a/../b") == "http://a.example/b")
    assert(n("http://a.example/a/b/../../c") == "http://a.example/c")
    assert(n("http://a.example/../a") == "http://a.example/a")
    assert(n("http://a.example/a/.") == "http://a.example/a/")
    assert(n("http://a.example/a/..") == "http://a.example/")
    assert(UrlKernel.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(UrlKernel.removeDotSegments("mid/content=5/../6") == "mid/6")
  }

  test("query: empties dropped, params sorted by byte order, " +
      "? dropped when empty") {
    assert(n("http://a.example/x?b=2&a=1") == "http://a.example/x?a=1&b=2")
    assert(n("http://a.example/x?b=2&&a=1&") == "http://a.example/x?a=1&b=2")
    assert(n("http://a.example/x?") == "http://a.example/x")
    // value-bearing duplicate keys keep both, ordered as text
    assert(n("http://a.example/x?a=2&a=1") == "http://a.example/x?a=1&a=2")
  }

  test("non-URL input passes through unchanged") {
    assert(n("not a url") == "not a url")
    assert(n("mailto:x@y.example") == "mailto:x@y.example")
    assert(n("") == "")
  }

  test("IPv6 literals: port logic does not split inside brackets") {
    assert(n("http://[::1]/x") == "http://[::1]/x")
    assert(n("http://[::1]:80/x") == "http://[::1]/x")
    assert(n("http://[::1]:8080/x") == "http://[::1]:8080/x")
  }

  test("PROPERTY: idempotent, and mess-invariant on seeded random " +
      "URLs (the q176 oracle device)") {
    val rnd = new scala.util.Random(176)
    for (trial <- 0 until 400) {
      val host = s"h${rnd.nextInt(50)}.example.com"
      val seg = s"s${rnd.nextInt(100)}"
      val id = rnd.nextInt(100000)
      val (a, b) = (rnd.nextInt(7), rnd.nextInt(5))
      val clean = s"http://$host/$seg/d$id?a=$a&b=$b"
      // two independent messes of the same resource
      val messy1 = s"HTTP://${host.toUpperCase}:80/$seg/../$seg/./d$id" +
        s"?b=$b&a=$a#frag${rnd.nextInt(10)}"
      val messy2 = s"http://$host/%73${seg.drop(1)}/d$id?a=$a&b=$b"
      assert(n(messy1) == clean, s"trial $trial messy1")
      assert(n(messy2) == clean, s"trial $trial messy2")
      assert(n(clean) == clean, s"trial $trial idempotence")
      assert(n(n(messy1)) == n(messy1), s"trial $trial double-normalize")
    }
  }

  test("registered SQL function url_normalize runs inside the " +
      "codegen stage") {
    UrlFunctions.register(spark)
    val df = spark.range(2).selectExpr(
      "url_normalize(concat('HTTP://A.example:80/x/../y?b=', " +
        "cast(id AS string), '&a=1#f')) AS u")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("http://a.example/y?a=1&b=0", "http://a.example/y?a=1&b=1"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [url_normalize"), plan)
  }
}
