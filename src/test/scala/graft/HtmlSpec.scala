package graft

import graft.functions.{HtmlFunctions, HtmlKernel}
import org.scalatest.funsuite.AnyFunSuite

/** The html_text extraction kernel against its documented contract
  * (HtmlExpressions scaladoc): raw-text elements, quote-aware tag
  * parse, inline-vs-block word joining, entity decode, whitespace
  * normalization, and the round-trip property the q171 oracle relies
  * on — encode(text) then extract == normalize(text). Properties run
  * as seeded plain loops (GeoSpec's discipline — the scalacheck
  * bridge artifact is not in the offline cache).
  */
class HtmlSpec extends AnyFunSuite with SharedSpark {

  private def x(s: String): String = HtmlKernel.extractStr(s)

  test("tag strip with block separation and whitespace normalization") {
    assert(x("<html><body><p>hello</p><p>world</p></body></html>") ==
      "hello world")
    assert(x("  <div>\n\t a  b </div>\r\n c ") == "a b c")
    assert(x("") == "")
    assert(x("<p></p>") == "")
  }

  test("script/style are raw text: tag-like content inside is skipped " +
      "verbatim, case-insensitively") {
    assert(x("<script>var s = \"<p>not text</p>\";</script>ok") == "ok")
    assert(x("<STYLE>p > q { color: red }</STYLE>ok") == "ok")
    assert(x("a<script type=\"x\">if (1 < 2) {}</SCRIPT >b") == "a b")
    // unterminated raw text swallows the rest (browser behavior)
    assert(x("a<script>var x = 1;") == "a")
    // a </script> with no opener is just a (block) tag
    assert(x("a</script>b") == "a b")
  }

  test("quoted attribute values may contain '>' and '<'") {
    assert(x("<body data-x=\"a>b\">text</body>") == "text")
    assert(x("<a href='q>r'>link</a>") == "link")
    assert(x("<img alt=\"x < y\"/>z") == "z")
    // unterminated tag swallows the rest
    assert(x("a<div class=\"oops") == "a")
  }

  test("inline tags join words; block tags separate them") {
    assert(x("h<b>e</b>llo") == "hello")
    assert(x("h<em>ell</em>o w<span>or</span>ld") == "hello world")
    assert(x("one<div>two</div>three") == "one two three")
    assert(x("a<br/>b") == "a b")
    // unknown tags default to separating (the safe direction)
    assert(x("a<widget>b</widget>c") == "a b c")
  }

  test("comments, doctype, PIs are removed; unterminated comment " +
      "swallows the rest") {
    assert(x("<!DOCTYPE html>a<!-- note > here -->b<?php x ?>c") ==
      "a b c")
    assert(x("a<!-- never closed") == "a")
    // comment containing tag-like material
    assert(x("a<!-- <p>hidden</p> -->b") == "a b")
  }

  test("entity decode: named, decimal, hex; malformed stay literal; " +
      "decoded '<' is text not markup") {
    assert(x("a&amp;b") == "a&b")
    assert(x("&lt;p&gt;") == "<p>")
    assert(x("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(x("a&nbsp;b") == "a b")
    assert(x("&#97;&#98;&#99;") == "abc")
    assert(x("&#x61;&#X62;") == "ab")
    assert(x("&#128077;") == new String(Character.toChars(128077)))
    // malformed / unknown / out-of-range: literal, never dropped
    assert(x("a&zzz;b") == "a&zzz;b")
    assert(x("a&amp b") == "a&amp b")
    assert(x("a&#;b") == "a&#;b")
    assert(x("a&#xD800;b") == "a&#xD800;b") // surrogate refused
    assert(x("a&#9999999;b") == "a&#9999999;b") // > U+10FFFF refused
    assert(x("a&") == "a&")
    // decoded markup is NOT re-parsed
    assert(x("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>")
  }

  test("bare '<' not opening markup is literal text") {
    assert(x("1 < 2") == "1 < 2")
    assert(x("a < b > c") == "a < b > c")
    assert(x("x<3") == "x<3")
  }

  test("whitespace entities participate in normalization") {
    assert(x("a&#32;&#32;b") == "a b")
    assert(x("a&nbsp;&#9;&#10;b") == "a b")
    assert(x("&nbsp;a&nbsp;") == "a")
  }

  test("PROPERTY: for sanitized text, encode-then-extract == " +
      "space-normalized original (the q171 oracle device)") {
    val rnd = new scala.util.Random(171)
    val alphabet = (('a' to 'z') ++ ('0' to '9')).mkString + "    "
    for (trial <- 0 until 300) {
      val len = rnd.nextInt(60)
      val san = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      // the q171 encoding: inline-tag split on 'e', entities for
      // 'a'/'o', nbsp separators, wrapped in head noise + body
      val enc = san
        .replace("e", "<b>e</b>")
        .replace("a", "&#97;")
        .replace("o", "&#x6F;")
        .replace(" ", "&nbsp;")
      val html = "<html><head><title></title>" +
        "<style>p > q { color: \"a>b\"; }</style>" +
        "<script>if (x < 1) document.write(\"<i>no</i>\");</script>" +
        "</head><body data-k=\"v>w\"><!-- c > d --><p>" + enc +
        "</p><br/></body></html>"
      val expected = san.replaceAll(" +", " ").trim
      assert(x(html) == expected, s"trial $trial input '$san'")
    }
  }

  test("registered SQL function html_text works through codegen " +
      "(WholeStageCodegen, no fallback)") {
    HtmlFunctions.register(spark)
    import spark.implicits._
    // build the HTML from range() so the projection cannot fold to a
    // LocalRelation — the extraction must run inside the codegen stage
    val df = spark.range(3).selectExpr(
      "html_text(concat('<p>x', cast(id AS string), '&amp;</p>')) AS t")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("x0&", "x1&", "x2&"))
    // `*(1)` is the WholeStageCodegen marker in the simple plan string;
    // the extraction projection must sit INSIDE the starred stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [html_text"),
      s"extraction fell out of the codegen stage:\n$plan")
    // null-in, null-out through the registered function
    val nulls = Seq((1L, null: String)).toDF("id", "h")
      .selectExpr("html_text(h) AS t").collect()
    assert(nulls.head.isNullAt(0))
  }
}
