package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING crawl-frontier admission — the q192 frontier operator
  * as a continuously-running stream: discovered URLs arrive in any
  * spelling, collapse to their canonical dedup key (url_normalize,
  * the q176 kernel), and each canonical key is ADMITTED exactly once
  * across all microbatches (keyed [[GroupState]] — the per-key seen
  * counter survives the microbatch boundary, so a re-discovered URL
  * in a later batch is a duplicate, not a second fetch). Admission
  * additionally requires the host's robots verdict (RFC 9309 kernel,
  * q183/q192's arithmetic-shadow rule set + per-host Crawl-delay),
  * evaluated under a per-executor model-sized rule cache.
  *
  * Batch-vs-stream contract (the repo's streaming discipline): the
  * same `decide` runs as a plain batch Dataset program (state starts
  * empty; within-batch duplicates still collapse, ordered by event
  * time then spelling) and as a structured stream — the spec pins
  * that ONE canonical key is admitted exactly once no matter how
  * arrivals split across microbatches.
  *
  * Scale: state is one counter per canonical key (the production
  * frontier's dedup set, naturally keyed/sharded); everything else
  * is per-row kernel work.
  */
object StreamingFrontier {

  case class UrlEvent(url: String, ts: java.sql.Timestamp)

  case class FrontierDecision(canonical: String, host: String,
      first_seen: Boolean, allowed: Boolean, crawl_delay: Long,
      admitted: Boolean)

  /** Per-executor robots-rule cache (model-sized: one entry per
    * host's source label).
    */
  @transient private lazy val ruleCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (Seq[graft.sources.Robots.Group], Long)]()

  private def rulesFor(src: String)
      : (Seq[graft.sources.Robots.Group], Long) =
    ruleCache.computeIfAbsent(src, _ => {
      val txt = "User-agent: graftbot\nCrawl-delay: " +
        (5 + src.length % 3) + "\n" +
        "Disallow: /c/d*3$\nAllow: /c/d*13$\nDisallow: /c/d9\n\n" +
        "User-agent: *\nDisallow: /\n"
      val gs = graft.sources.Robots.parse(txt)
      (gs, graft.sources.Robots.crawlDelay(gs, "graftbot/1.0")
        .map(_.toLong).getOrElse(0L))
    })

  def decide(ds: Dataset[UrlEvent]): Dataset[FrontierDecision] = {
    val s: SparkSession = ds.sparkSession
    graft.functions.UrlFunctions.register(s)
    import s.implicits._
    ds.toDF()
      .selectExpr("url_normalize(url) AS canonical", "ts")
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          val seenBefore = state.getOption.getOrElse(0L)
          // deterministic within-batch order: event time, then the
          // canonical string (all equal here) — stable across runs
          val rows = it.toVector.sortBy(_._2.getTime)
          state.update(seenBefore + rows.size)
          val afterScheme = key.stripPrefix("http://")
          val host = afterScheme.takeWhile(_ != '/')
          val path = afterScheme.dropWhile(_ != '/')
            .takeWhile(c => c != '?' && c != '#')
          val (groups, delay) = rulesFor(host.stripSuffix(".example.com"))
          val allowed =
            graft.sources.Robots.isAllowed(groups, "graftbot/1.0", path)
          rows.zipWithIndex.iterator.map { case (_, idx) =>
            val firstSeen = seenBefore == 0L && idx == 0
            FrontierDecision(key, host, firstSeen, allowed, delay,
              firstSeen && allowed)
          }
      }
  }
}
