package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemap.xml (sitemaps.org protocol 0.9) — the crawl-seed side of
  * the ingestion tier: robots.txt (sources/Robots.scala) says what a
  * crawler may NOT fetch; the sitemap says what the site WANTS
  * fetched, with freshness (`lastmod`) and importance (`priority`)
  * hints the frontier scheduler consumes. Parsed with Spark's
  * built-in `xpath_*` functions (per-row, no driver-side XML
  * library — the operators/Manifest.scala discipline).
  *
  * Parse shape: one sitemap document is split into its `<url>`
  * records first (`</url>` boundaries — the per-record split the
  * WARC reader uses on its framing), then each fragment is parsed
  * INDEPENDENTLY, so a record missing an optional field (`lastmod`,
  * `priority` — both optional per the protocol) cannot misalign its
  * neighbours the way parallel whole-document `xpath` arrays would.
  * Protocol semantics implemented (pinned by SitemapSpec):
  *   - `loc` required; fragments without one are dropped;
  *   - XML entity escapes in `loc` decoded (the five predefined
  *     entities, protocol "Entity escaping" section) by the xpath
  *     engine itself;
  *   - missing `priority` defaults to 0.5 (protocol default);
  *     values are clamped to [0.0, 1.0];
  *   - missing `lastmod` yields NULL (no freshness claim);
  *   - `<sitemapindex>` files are recognised by [[indexLocs]] — the
  *     two-level fan-out (index → sitemaps → urls) is the 100 TB
  *     read path: the index is tiny, each referenced sitemap parses
  *     in its own task.
  */
object Sitemap {

  /** `<url>` entries of sitemap documents in `xmlCol`: one output
    * row per entry with `loc` (string), `lastmod` (string, NULL when
    * absent), `priority` (double, protocol default 0.5, clamped).
    * All other input columns are carried through.
    */
  def entries(df: DataFrame, xmlCol: String): DataFrame =
    df
      .withColumn("__frag", explode(split(col(xmlCol), "</url>")))
      .filter(col("__frag").contains("<url>"))
      .withColumn("__rec",
        concat(regexp_extract(col("__frag"), "(?s)<url>.*", 0), lit("</url>")))
      .withColumn("loc", expr("xpath_string(__rec, '/url/loc')"))
      .filter(col("loc") =!= "")
      .withColumn("lastmod", expr(
        "nullif(xpath_string(__rec, '/url/lastmod'), '')"))
      .withColumn("priority", expr(
        """least(1.0D, greatest(0.0D, coalesce(
          |  CAST(nullif(xpath_string(__rec, '/url/priority'), '')
          |    AS DOUBLE), 0.5D)))""".stripMargin))
      .drop("__frag", "__rec")

  /** Sub-sitemap locations of `<sitemapindex>` documents — the
    * first level of the two-level fan-out. */
  def indexLocs(df: DataFrame, xmlCol: String): DataFrame =
    df
      .withColumn("__frag", explode(split(col(xmlCol), "</sitemap>")))
      .filter(col("__frag").contains("<sitemap>"))
      .withColumn("__rec", concat(
        regexp_extract(col("__frag"), "(?s)<sitemap>.*", 0),
        lit("</sitemap>")))
      .withColumn("sitemap_loc", expr("xpath_string(__rec, '/sitemap/loc')"))
      .filter(col("sitemap_loc") =!= "")
      .drop("__frag", "__rec")

  /** Frontier-admission filter on parsed entries: fresh (lastmod on
    * or after `cutoff`, date-only or full W3C datetime) and important
    * enough (priority ≥ `minPriority`). Entries with no lastmod are
    * NOT admitted — a sitemap that makes no freshness claim gets the
    * recrawl cycle's default treatment, not the fast path.
    */
  def freshImportant(entries: DataFrame, cutoff: String,
      minPriority: Double): DataFrame = {
    // parse the cutoff on the DRIVER, up front: a malformed value
    // must fail here with a clear message, not as a Catalyst parse
    // error deep in the plan — and interpolating an unvalidated
    // string into SQL text is an injection vector besides
    val cutoffDate = java.sql.Date.valueOf(
      try java.time.LocalDate.parse(cutoff)
      catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"sitemap cutoff '$cutoff' is not an ISO-8601 date", e)
      })
    entries
      .filter(expr("to_date(substring(lastmod, 1, 10))") >= lit(cutoffDate))
      .filter(col("priority") >= minPriority)
  }
}
