package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-text extraction as ONE native expression (the
  * CdcExpressions template — SURVEY.md §7.3 preference ladder, rung
  * (b)): crawl curation needs tag-strip + script/style/comment removal
  * + entity decode + whitespace normalization BEFORE the quality /
  * dedup tiers apply (the reference-side analog is the payload
  * cleanup its curation notebook does before scoring). A regex
  * pipeline can't do this correctly (quoted `>` inside attributes,
  * raw-text elements, numeric entities) and pays multiple UTF8String
  * re-materializations per row; this kernel is a single per-row pass.
  *
  * Extraction contract (pinned by HtmlSpec and the q171 oracle row):
  *   - `<script>`/`<style>` elements are raw text per the WHATWG
  *     parsing spec: content is skipped verbatim until the first
  *     case-insensitive `</script`/`</style`, then to the next `>`.
  *   - Comments `<!-- -->`, doctypes `<!…>`, and PIs `<?…>` are
  *     removed; an unterminated one swallows the rest of the input
  *     (browser behavior).
  *   - Tags are parsed honoring single-/double-quoted attribute
  *     values, so `<body data-x="a>b">` is ONE tag. Inline-level tags
  *     (a/b/i/em/span/…) contribute nothing — `h<b>e</b>llo` reads
  *     "hello"; every other tag is a word separator.
  *   - A `<` not opening markup (not followed by a letter, `/`, `!`,
  *     `?`) is literal text, per the HTML tokenizer.
  *   - Entities: the XML five (amp/lt/gt/quot/apos) + nbsp, and
  *     numeric `&#NN;`/`&#xHH;` decode to their code points
  *     (surrogate-range and out-of-range refused → literal). A
  *     malformed entity is emitted literally, never dropped.
  *     Decoded `<` is TEXT — it is never re-parsed as markup.
  *   - Output whitespace is normalized: runs of [ \t\r\n\f ]
  *     (incl. decoded nbsp / numeric whitespace entities) collapse to
  *     one space; leading/trailing trimmed.
  *
  * Scale shape: pure per-row compute — no state, no shuffle; inlines
  * into whole-stage codegen via `defineCodeGen` like the Vec / CDC /
  * St kernels, so extraction fuses with the scan projection.
  */
object HtmlKernel {

  /** Inline-level (phrasing) tags whose boundaries must not split a
    * word; everything else separates words.
    */
  private val inlineTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("a", "b", "i", "u", "s", "q", "em", "strong", "span", "code",
      "small", "sub", "sup", "abbr", "mark", "time", "wbr", "bdi",
      "bdo", "kbd", "samp", "var", "cite", "dfn", "data", "ins", "del",
      "ruby", "rt", "rp").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == '\u00A0'

  def extract(html: UTF8String): UTF8String =
    UTF8String.fromString(extractStr(html.toString))

  def extractStr(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var pendingWs = false
    def emit(c: Char): Unit =
      if (isWs(c)) pendingWs = true
      else {
        if (pendingWs && out.length > 0) out.append(' ')
        pendingWs = false
        out.append(c)
      }
    // case-insensitive search for `needle` (ASCII, lowercase) at >= from
    def findCi(needle: String, from: Int): Int = {
      var i = from
      val m = needle.length
      while (i + m <= n) {
        if (s.regionMatches(true, i, needle, 0, m)) return i
        i += 1
      }
      -1
    }
    // end of a tag starting at `from` (index AFTER the closing '>'),
    // honoring quoted attribute values; -1 when unterminated
    def tagEnd(from: Int): Int = {
      var i = from
      while (i < n) {
        s.charAt(i) match {
          case '>' => return i + 1
          case '"' =>
            i += 1
            while (i < n && s.charAt(i) != '"') i += 1
            if (i < n) i += 1
          case '\'' =>
            i += 1
            while (i < n && s.charAt(i) != '\'') i += 1
            if (i < n) i += 1
          case _ => i += 1
        }
      }
      -1
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          pendingWs = true
        } else if (i + 1 < n &&
            (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = tagEnd(i + 2)
          i = if (e < 0) n else e
          pendingWs = true
        } else if (i + 1 < n && (s.charAt(i + 1) == '/' ||
            Character.isLetter(s.charAt(i + 1)))) {
          val nameStart = if (s.charAt(i + 1) == '/') i + 2 else i + 1
          var j = nameStart
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          if ((name == "script" || name == "style") &&
              s.charAt(i + 1) != '/') {
            val open = tagEnd(j)
            if (open < 0) i = n
            else {
              // raw text: nothing inside is markup until the first
              // case-insensitive `</name`
              val close = findCi(s"</$name", open)
              if (close < 0) i = n
              else {
                val e = tagEnd(close + 2 + name.length)
                i = if (e < 0) n else e
              }
            }
            pendingWs = true
          } else {
            val e = tagEnd(j)
            i = if (e < 0) n else e
            if (!inlineTags.contains(name)) pendingWs = true
          }
        } else {
          emit('<'); i += 1 // bare '<' is text, per the HTML tokenizer
        }
      } else if (c == '&') {
        var decoded = -2 // -2 = not an entity; >= 0 = code point
        var after = i + 1
        if (i + 1 < n && s.charAt(i + 1) == '#') {
          val hex = i + 2 < n &&
            (s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X')
          val dStart = if (hex) i + 3 else i + 2
          var j = dStart
          var cp = 0L
          while (j < n && j - dStart <= 7 && cp <= 0x10FFFF && {
            val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
            if (d >= 0) { cp = cp * (if (hex) 16 else 10) + d; true }
            else false
          }) j += 1
          if (j > dStart && j < n && s.charAt(j) == ';' &&
              cp >= 1 && cp <= 0x10FFFF &&
              !(cp >= 0xD800 && cp <= 0xDFFF)) {
            decoded = cp.toInt; after = j + 1
          }
        } else {
          var j = i + 1
          while (j < n && j - i <= 8 && Character.isLetter(s.charAt(j))) j += 1
          if (j < n && s.charAt(j) == ';') {
            s.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT) match {
              case "amp" => decoded = '&'; after = j + 1
              case "lt" => decoded = '<'; after = j + 1
              case "gt" => decoded = '>'; after = j + 1
              case "quot" => decoded = '"'; after = j + 1
              case "apos" => decoded = '\''; after = j + 1
              case "nbsp" => decoded = ' '; after = j + 1
              case _ => () // unknown name: literal
            }
          }
        }
        if (decoded >= 0) {
          if (decoded <= 0xFFFF) emit(decoded.toChar)
          else Character.toChars(decoded).foreach(emit)
          i = after
        } else { emit('&'); i += 1 }
      } else {
        emit(c); i += 1
      }
    }
    out.toString
  }
}

/** html_text(html STRING) -> STRING — see [[HtmlKernel]]. */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires STRING, got ${other.sql}")
    }
  override def nullSafeEval(h: Any): Any =
    HtmlKernel.extract(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKernel.extract($h)")
  override protected def withNewChildInternal(c: Expression): HtmlText = copy(c)
  override def prettyName: String = "html_text"
}

object HtmlFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("html_text",
      new ExpressionInfo(classOf[HtmlText].getName, null, "html_text",
        "html_text(html) - visible text of an HTML document: " +
          "script/style/comment removal, tag strip (quote-aware, " +
          "inline tags join words), entity decode, whitespace " +
          "normalization", "", "", "", "", "4.0.0", "", "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(h) => HtmlText(h)
        case other => throw new IllegalArgumentException(
          s"html_text takes 1 argument, got ${other.size}")
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
