package graft.sources

/** robots.txt (RFC 9309, Robots Exclusion Protocol) — the politeness
  * kernel of the crawl-ingestion tier: before a frontier URL may be
  * fetched (HttpTransport) or admitted into the WARC funnel, the
  * host's robots rules decide. Zero-dependency, implemented from the
  * RFC like the repo's other format kernels.
  *
  * Semantics implemented (and pinned by RobotsSpec):
  *   - Line-oriented `key: value` records, `#` comments stripped,
  *     keys case-insensitive; unknown keys ignored inside groups
  *     (per the RFC's extensibility rule).
  *   - GROUPS: consecutive `User-agent` lines share the rule block
  *     that follows (§2.2.1); a `User-agent` line after rules starts
  *     a new group.
  *   - Group selection for a crawler token: the group whose
  *     user-agent value is the LONGEST case-insensitive prefix of
  *     the crawler's product token wins; the `*` group is the
  *     fallback; no group → everything allowed.
  *   - Rule matching (§2.2.2): a rule's path pattern matches when it
  *     matches a PREFIX of the request path, with `*` matching any
  *     octet run and a trailing `$` anchoring the end. The
  *     most-specific (longest-pattern) rule wins; on a tie, ALLOW
  *     wins (§2.2.2 "least restrictive"). No matching rule → allow.
  *     An empty Disallow value matches nothing (classic "allow
  *     all").
  *   - `Crawl-delay` (the de-facto extension every large crawler
  *     honors) is surfaced per group; non-numeric values are
  *     ignored.
  *
  * Scale shape: robots files are per-HOST and tiny — the production
  * layout is a broadcast host→[[Group]] map compiled once per crawl
  * wave; [[isAllowed]] is then a per-row kernel over the frontier.
  */
object Robots {

  case class Group(agents: Seq[String], rules: Seq[(Boolean, String)],
      crawlDelay: Option[Double])

  def parse(text: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Seq.empty[String]
    var rules = Seq.empty[(Boolean, String)]
    var delay: Option[Double] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Seq.empty; rules = Seq.empty; delay = None
      inRules = false
    }
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val cut = line.indexOf(':')
      if (cut > 0) {
        val key = line.take(cut).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.drop(cut + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents = agents :+ value.toLowerCase(java.util.Locale.ROOT)
          case "allow" if agents.nonEmpty =>
            inRules = true; rules = rules :+ (true, value)
          case "disallow" if agents.nonEmpty =>
            inRules = true; rules = rules :+ (false, value)
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            delay = value.toDoubleOption.orElse(delay)
          case _ => if (agents.nonEmpty) inRules = true // unknown key
        }
      }
    }
    flush()
    groups.result()
  }

  /** `*`-and-`$` pattern match against a PREFIX of `path` (§2.2.2). */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow matches nothing
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val memo = Array.fill((p.length + 1) * (path.length + 1))(0: Byte)
    def go(pi: Int, si: Int): Boolean = {
      val k = pi * (path.length + 1) + si
      if (memo(k) != 0) return memo(k) == 1
      val r =
        if (pi == p.length) !anchored || si == path.length
        else if (p.charAt(pi) == '*')
          (si to path.length).exists(go(pi + 1, _))
        else si < path.length && path.charAt(si) == p.charAt(pi) &&
          go(pi + 1, si + 1)
      memo(k) = if (r) 1 else 2
      r
    }
    go(0, 0)
  }

  /** The COMBINED group governing `agentToken`: the winning match is
    * the longest user-agent value that case-insensitively prefixes
    * the token, and — per RFC 9309 §2.2.1 ("rules from all groups
    * matching the same user-agent MUST be combined") — every group
    * carrying a winning-length match contributes its rules, in file
    * order. Same merge for multiple `*` fallback groups. Crawl-delay:
    * first declared among the merged groups.
    */
  private[graft] def groupFor(groups: Seq[Group], agentToken: String)
      : Option[Group] = {
    val tok = agentToken.toLowerCase(java.util.Locale.ROOT)
    def merge(gs: Seq[Group]): Option[Group] =
      if (gs.isEmpty) None
      else Some(Group(gs.flatMap(_.agents), gs.flatMap(_.rules),
        gs.flatMap(_.crawlDelay).headOption))
    val matchLens = groups.map(g =>
      g.agents.collect { case a if a != "*" && tok.startsWith(a) => a.length }
        .foldLeft(0)(math.max))
    val best = matchLens.foldLeft(0)(math.max)
    if (best > 0)
      merge(groups.zip(matchLens).collect { case (g, l) if l == best => g })
    else merge(groups.filter(_.agents.contains("*")))
  }

  /** RFC 9309 decision for (crawler token, request path). */
  def isAllowed(groups: Seq[Group], agentToken: String,
      path: String): Boolean =
    groupFor(groups, agentToken) match {
      case None => true
      case Some(g) =>
        val applicable = g.rules.filter { case (_, pat) =>
          matches(pat, path)
        }
        if (applicable.isEmpty) true
        else {
          // longest pattern wins; allow beats disallow on ties
          val best = applicable.map { case (allow, pat) =>
            (pat.length, allow)
          }.sortBy { case (len, allow) => (-len, !allow) }.head
          best._2
        }
    }

  /** The group's crawl-delay for a crawler token (politeness
    * scheduling input), when declared.
    */
  def crawlDelay(groups: Seq[Group], agentToken: String): Option[Double] =
    groupFor(groups, agentToken).flatMap(_.crawlDelay)
}
