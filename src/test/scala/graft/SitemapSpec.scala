package graft

import graft.operators.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** The sitemap.xml kernel against the sitemaps.org protocol 0.9
  * semantics: per-record parsing that survives missing optional
  * fields, entity escaping in <loc>, the 0.5 priority default and
  * [0,1] clamp, loc-less record rejection, <sitemapindex> fan-out,
  * and the freshness/importance admission filter (date-only AND
  * full W3C datetime lastmod forms).
  */
class SitemapSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>https://a.example/p?x=1&amp;y=2</loc>
      |  <lastmod>2026-03-01</lastmod><priority>0.8</priority></url>
      |<url><loc>https://a.example/q</loc></url>
      |<url><loc>https://a.example/r</loc>
      |  <lastmod>2026-01-05T10:30:00+00:00</lastmod>
      |  <priority>1.7</priority></url>
      |<url><lastmod>2026-04-01</lastmod></url>
      |<url><loc>https://a.example/s</loc><priority>-0.2</priority></url>
      |</urlset>""".stripMargin

  private def entries =
    Sitemap.entries(Seq(("h1", urlset)).toDF("host", "xml"), "xml")
      .orderBy("loc")
      .collect()

  test("per-record parse: one row per <url> with a loc; the loc-less " +
      "record is dropped and cannot misalign its neighbours") {
    val locs = entries.map(_.getAs[String]("loc")).toSeq
    assert(locs == Seq("https://a.example/p?x=1&y=2", "https://a.example/q",
      "https://a.example/r", "https://a.example/s"))
  }

  test("XML entity escapes in loc are decoded by the xpath engine") {
    assert(entries.head.getAs[String]("loc").contains("x=1&y=2"))
  }

  test("missing lastmod yields NULL; both W3C forms carry through") {
    val byLoc = entries.map(r =>
      r.getAs[String]("loc") -> Option(r.getAs[String]("lastmod"))).toMap
    assert(byLoc("https://a.example/q").isEmpty)
    assert(byLoc("https://a.example/p?x=1&y=2").contains("2026-03-01"))
    assert(byLoc("https://a.example/r")
      .contains("2026-01-05T10:30:00+00:00"))
  }

  test("priority: protocol default 0.5 when absent, clamped to [0,1]") {
    val byLoc = entries.map(r =>
      r.getAs[String]("loc") -> r.getAs[Double]("priority")).toMap
    assert(byLoc("https://a.example/q") == 0.5)
    assert(byLoc("https://a.example/p?x=1&y=2") == 0.8)
    assert(byLoc("https://a.example/r") == 1.0) // 1.7 clamped
    assert(byLoc("https://a.example/s") == 0.0) // -0.2 clamped
  }

  test("input columns are carried through the parse") {
    assert(entries.forall(_.getAs[String]("host") == "h1"))
  }

  test("sitemapindex: indexLocs returns the sub-sitemap fan-out") {
    val idx =
      """<?xml version="1.0"?><sitemapindex>
        |<sitemap><loc>https://a.example/sm1.xml</loc>
        |  <lastmod>2026-01-01</lastmod></sitemap>
        |<sitemap><loc>https://a.example/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val locs = Sitemap
      .indexLocs(Seq(("h1", idx)).toDF("host", "xml"), "xml")
      .orderBy("sitemap_loc")
      .collect().map(_.getAs[String]("sitemap_loc")).toSeq
    assert(locs == Seq("https://a.example/sm1.xml",
      "https://a.example/sm2.xml"))
  }

  test("freshImportant: date-only and datetime lastmod both compare; " +
      "no-lastmod entries are NOT fast-pathed; priority gate applies") {
    val df = Sitemap.entries(Seq(("h1", urlset)).toDF("host", "xml"), "xml")
    val admitted = Sitemap.freshImportant(df, "2026-01-05", 0.6)
      .orderBy("loc").collect().map(_.getAs[String]("loc")).toSeq
    // p: 2026-03-01 >= cutoff, prio 0.8 -> in
    // q: no lastmod -> out;  r: datetime 2026-01-05 >= cutoff, prio
    // clamped 1.0 -> in;  s: no lastmod field? s HAS no lastmod -> out
    assert(admitted == Seq("https://a.example/p?x=1&y=2",
      "https://a.example/r"))
  }
}
