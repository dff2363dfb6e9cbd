package graft

import graft.sources.Robots
import org.scalatest.funsuite.AnyFunSuite

/** The robots.txt kernel against RFC 9309's own semantics: grouping,
  * group selection, longest-match precedence with allow-on-tie,
  * wildcard/anchor patterns, empty-disallow, crawl-delay, and the
  * default-allow rules.
  */
class RobotsSpec extends AnyFunSuite {

  private val example =
    """# robots.txt for example.com
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/readme.html
      |Disallow: /tmp/
      |
      |User-agent: goodbot
      |User-agent: fairbot
      |Disallow: /members/
      |Crawl-delay: 2.5
      |
      |User-agent: badbot
      |Disallow: /
      |""".stripMargin

  private val g = Robots.parse(example)

  test("grouping: consecutive user-agent lines share one rule block; " +
      "a later user-agent starts a new group") {
    assert(g.length == 3)
    assert(g(0).agents == Seq("*"))
    assert(g(1).agents == Seq("goodbot", "fairbot"))
    assert(g(1).crawlDelay.contains(2.5))
    assert(g(2).agents == Seq("badbot"))
  }

  test("group selection: longest agent prefix wins, * is fallback, " +
      "case-insensitive") {
    // goodbot group governs GoodBot/2.1
    assert(!Robots.isAllowed(g, "GoodBot/2.1", "/members/x"))
    assert(Robots.isAllowed(g, "GoodBot/2.1", "/private/")) // not its rule
    // unmatched crawler falls back to *
    assert(!Robots.isAllowed(g, "otherbot", "/private/x.html"))
    assert(Robots.isAllowed(g, "otherbot", "/public/x.html"))
    // badbot: everything disallowed
    assert(!Robots.isAllowed(g, "badbot/1.0", "/anything"))
  }

  test("longest-match precedence with allow winning ties (RFC 2.2.2)") {
    // /private/readme.html: Allow (20 chars) beats Disallow /private/ (9)
    assert(Robots.isAllowed(g, "otherbot", "/private/readme.html"))
    assert(!Robots.isAllowed(g, "otherbot", "/private/else.html"))
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /page\nAllow: /page\n")
    assert(Robots.isAllowed(tie, "any", "/page")) // equal length: allow
  }

  test("patterns: * wildcard, $ anchor, prefix semantics, empty " +
      "disallow allows everything") {
    val p = Robots.parse(
      """User-agent: *
        |Disallow: /*.php$
        |Disallow: /fish*.html
        |Disallow: /draft
        |""".stripMargin)
    assert(!Robots.isAllowed(p, "bot", "/index.php"))
    assert(Robots.isAllowed(p, "bot", "/index.php?x=1")) // $ anchors end
    assert(!Robots.isAllowed(p, "bot", "/fishheads/catalog.html"))
    assert(!Robots.isAllowed(p, "bot", "/fish.html"))
    assert(Robots.isAllowed(p, "bot", "/fisx.html"))
    // prefix semantics: /draft matches /draft/x and /drafts
    assert(!Robots.isAllowed(p, "bot", "/draft/x"))
    assert(!Robots.isAllowed(p, "bot", "/drafts"))
    val empt = Robots.parse("User-agent: *\nDisallow:\n")
    assert(Robots.isAllowed(empt, "bot", "/anything"))
  }

  test("no groups / no matching rule / missing file semantics: allow") {
    assert(Robots.isAllowed(Seq.empty, "bot", "/x"))
    assert(Robots.isAllowed(Robots.parse("# nothing here"), "bot", "/x"))
    assert(Robots.isAllowed(g, "otherbot", "/open/path"))
  }

  test("crawl-delay surfaces per governing group; junk values ignored") {
    assert(Robots.crawlDelay(g, "fairbot/3").contains(2.5))
    assert(Robots.crawlDelay(g, "otherbot").isEmpty)
    val junk = Robots.parse(
      "User-agent: *\nCrawl-delay: soon\nDisallow: /x\n")
    assert(Robots.crawlDelay(junk, "bot").isEmpty)
    assert(!Robots.isAllowed(junk, "bot", "/x"))
  }

  test("comments and unknown directives are ignored; keys are " +
      "case-insensitive") {
    val p = Robots.parse(
      """USER-AGENT: mybot # inline comment
        |Sitemap: http://e.example/sitemap.xml
        |DISALLOW: /a # trailing
        |Unknown-thing: whatever
        |ALLOW: /a/b
        |""".stripMargin)
    assert(!Robots.isAllowed(p, "mybot", "/a/c"))
    assert(Robots.isAllowed(p, "mybot", "/a/b"))
  }

  test("RFC 9309 2.2.1: rules from ALL groups matching the same " +
      "user-agent are combined, including multiple * groups") {
    // two separate groups for the same agent: the second group's
    // Disallow must still bind
    val p = Robots.parse(
      """User-agent: mybot
        |Disallow: /a
        |
        |User-agent: other
        |Disallow: /zzz
        |
        |User-agent: mybot
        |Disallow: /b
        |Crawl-delay: 7
        |""".stripMargin)
    assert(!Robots.isAllowed(p, "mybot", "/a/x"))
    assert(!Robots.isAllowed(p, "mybot", "/b/x"), // pre-fix this leaked
      "second mybot group's rules were dropped")
    assert(Robots.isAllowed(p, "mybot", "/c"))
    assert(Robots.crawlDelay(p, "mybot").contains(7.0))
    // multiple * groups merge the same way
    val star = Robots.parse(
      "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n")
    assert(!Robots.isAllowed(star, "anybot", "/a"))
    assert(!Robots.isAllowed(star, "anybot", "/b"))
    // merged precedence still honors longest-match-allow across groups
    val cross = Robots.parse(
      "User-agent: mybot\nDisallow: /p\n\nUser-agent: mybot\nAllow: /p/q\n")
    assert(!Robots.isAllowed(cross, "mybot", "/p/r"))
    assert(Robots.isAllowed(cross, "mybot", "/p/q"))
  }

  test("adversarial patterns: runs of * stay polynomial and correct") {
    val p = Robots.parse(
      "User-agent: *\nDisallow: /a*b*c*d$\n")
    assert(!Robots.isAllowed(p, "bot", "/aXbYcZd"))
    assert(Robots.isAllowed(p, "bot", "/aXbYcZdE")) // anchored
    assert(!Robots.isAllowed(p, "bot", "/a" + "x" * 200 + "bcd"))
    val many = Robots.parse(
      "User-agent: *\nDisallow: /" + "*" * 50 + "z$\n")
    assert(!Robots.isAllowed(many, "bot", "/" + "y" * 300 + "z"))
    assert(Robots.isAllowed(many, "bot", "/" + "y" * 300))
  }
}
