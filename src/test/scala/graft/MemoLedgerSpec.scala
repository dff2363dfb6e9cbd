package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The memo-boundary ledger gate (VERDICT r19 next-round #2).
  *
  * Every [[CachedPlans.of]]/[[CachedPlans.valueOf]] tag in the engine
  * must be declared in `MEMOS.md` with a class from the documented
  * taxonomy — the build-vs-serve boundary each memo claims lives in
  * ONE reviewable artifact instead of scattered comments. The spec
  * fails on: a source tag missing from the ledger (an undeclared
  * memo), a ledger row with no surviving call site (a stale entry),
  * a class outside the taxonomy, or a call site whose tag the
  * extractor cannot read (a computed tag would otherwise escape the
  * ledger silently).
  */
class MemoLedgerSpec extends AnyFunSuite {

  private val classes = Set("corpus-model", "index-metadata",
    "tokenizer-application", "decoded-media", "stream-gate-ledger",
    "fixture", "bounded-driver-value", "report")

  /** Tags extracted from a source text: third argument's string
    * literal, with interpolated `$ident` segments wildcarded to `*`
    * (the ledger records the stable prefix form). */
  private val callRe =
    """CachedPlans\.(of|valueOf)\(\s*[^,()]+,\s*[^,()]+,\s*(s?)"([^"]*)"""".r
  private val anyCallRe = """CachedPlans\.(of|valueOf)\(""".r

  private def sourceTags: (Set[String], Int, Int) = {
    val files = Files.walk(Paths.get("src/main/scala")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    var extracted = 0
    var total = 0
    val tags = Set.newBuilder[String]
    files.foreach { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      total += anyCallRe.findAllIn(text).size
      callRe.findAllMatchIn(text).foreach { m =>
        extracted += 1
        val raw = m.group(3)
        val tag =
          if (m.group(2) == "s" && raw.contains("$"))
            raw.replaceAll("""\$\{?[A-Za-z0-9_]+\}?""", "*")
          else raw
        tags += tag
      }
    }
    (tags.result(), extracted, total)
  }

  private def ledgerRows: Seq[(String, String)] = {
    val lines = Files.readAllLines(Paths.get("MEMOS.md")).asScala
    val start = lines.indexWhere(_.startsWith("| tag |"))
    assert(start >= 0, "MEMOS.md ledger table header not found")
    lines.drop(start + 2).takeWhile(_.startsWith("|")).toSeq.map { l =>
      val cells = l.split("""\|""").map(_.trim)
      // cells(0) is the empty prefix before the leading pipe
      val tag = cells(1).stripPrefix("`").stripSuffix("`")
      val klass = cells(3)
      (tag, klass)
    }
  }

  test("every CachedPlans tag is extractable (no computed tags)") {
    val (_, extracted, total) = sourceTags
    assert(extracted == total,
      s"$total CachedPlans call sites but only $extracted extractable " +
        "inline-literal tags — a computed tag would escape the ledger; " +
        "use an inline (possibly interpolated) string literal")
  }

  test("every source tag is declared in MEMOS.md") {
    val (src, _, _) = sourceTags
    val declared = ledgerRows.map(_._1).toSet
    val undeclared = src -- declared
    assert(undeclared.isEmpty,
      s"memo tags with no MEMOS.md row (declare class + serve work): " +
        undeclared.toSeq.sorted.mkString(", "))
  }

  test("every MEMOS.md row has a surviving call site") {
    val (src, _, _) = sourceTags
    val stale = ledgerRows.map(_._1).toSet -- src
    assert(stale.isEmpty,
      s"MEMOS.md rows with no call site left in src/main (delete them): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("every MEMOS.md row's class is in the taxonomy") {
    val bad = ledgerRows.filterNot { case (_, k) => classes(k) }
    assert(bad.isEmpty,
      s"rows with a class outside the documented taxonomy: " +
        bad.map { case (t, k) => s"$t -> $k" }.mkString(", "))
  }

  test("no duplicate ledger rows") {
    val dup = ledgerRows.groupBy(_._1).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate MEMOS.md rows: ${dup.mkString(", ")}")
  }
}
