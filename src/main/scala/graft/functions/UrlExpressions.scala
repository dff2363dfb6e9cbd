package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as ONE native expression — the key-making
  * step of crawl-frontier dedup: two spellings of the same resource
  * must map to one string BEFORE url-keyed exact dedup (q27's tier)
  * or re-crawl suppression (q170's funnel) can collapse them.
  *
  * Canonical form (RFC 3986 §6 syntax-based normalization, the
  * subset every major crawler applies; pinned by UrlSpec + the q176
  * oracle row):
  *   - scheme and host lowercased;
  *   - default ports stripped (`:80` for http, `:443` for https —
  *     other ports kept);
  *   - the fragment removed;
  *   - percent-escapes of UNRESERVED characters (ALPHA / DIGIT /
  *     `-._~`) decoded; all other escapes kept with UPPERCASE hex
  *     (reserved characters are never decoded — `%2F` is not a path
  *     separator);
  *   - dot-segments resolved per RFC 3986 §5.2.4; an empty path with
  *     an authority becomes `/`;
  *   - query parameters split on `&`, empties dropped, sorted by
  *     byte order of the full `k=v` text (deterministic total
  *     order), re-joined; an empty query drops its `?`.
  *
  * Non-URL inputs (no `://`) are returned unchanged — refusal would
  * poison whole-batch dedup on one malformed frontier line; the
  * unchanged string still dedups exactly against itself.
  */
object UrlKernel {

  private def isUnreserved(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int = Character.digit(c, 16)

  /** Percent-escape normalization of one component: decode
    * unreserved escapes, uppercase the rest, pass everything else
    * through.
    */
  private def normEscapes(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) out.append(v.toChar)
        else out.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[graft] def removeDotSegments(path: String): String = {
    var in = path
    val out = new java.lang.StringBuilder(path.length)
    def dropLastSegment(): Unit = {
      val cut = out.lastIndexOf("/")
      out.setLength(math.max(cut, 0))
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); dropLastSegment() }
      else if (in == "/..") { in = "/"; dropLastSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val end = if (next < 0) in.length else next
        out.append(in, 0, end)
        in = in.substring(end)
      }
    }
    out.toString
  }

  def normalize(u: UTF8String): UTF8String =
    UTF8String.fromString(normalizeStr(u.toString))

  def normalizeStr(url: String): String = {
    val sep = url.indexOf("://")
    if (sep <= 0) return url // not an absolute URL: pass through
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest0 = url.substring(sep + 3)
    // strip the fragment first (it may contain any delimiter)
    val hashAt = rest0.indexOf('#')
    val rest = if (hashAt < 0) rest0 else rest0.substring(0, hashAt)
    // authority ends at the first '/', '?' (or end)
    var aEnd = rest.length
    var i = 0
    while (i < aEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') aEnd = i else i += 1
    }
    var authority = rest.substring(0, aEnd)
    val tail = rest.substring(aEnd)
    // userinfo (if any) is case-sensitive; only the host lowercases
    val atPos = authority.lastIndexOf('@')
    val (userinfo, hostport) =
      if (atPos < 0) ("", authority)
      else (authority.substring(0, atPos + 1), authority.substring(atPos + 1))
    val colonAt = hostport.lastIndexOf(':')
    val (host0, port) =
      if (colonAt < 0 || hostport.indexOf(']') > colonAt)
        (hostport, "") // no port (or IPv6 literal without one)
      else (hostport.substring(0, colonAt), hostport.substring(colonAt + 1))
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443"))
    authority = userinfo + host + (if (keepPort) ":" + port else "")
    // split path from query
    val qAt = tail.indexOf('?')
    val path0 = if (qAt < 0) tail else tail.substring(0, qAt)
    val query0 = if (qAt < 0) "" else tail.substring(qAt + 1)
    val path = {
      val p = removeDotSegments(normEscapes(path0))
      if (p.isEmpty) "/" else p
    }
    val query = {
      val parts = normEscapes(query0).split("&", -1)
        .filter(_.nonEmpty).sorted(math.Ordering.String)
      parts.mkString("&")
    }
    scheme + "://" + authority + path +
      (if (query.nonEmpty) "?" + query else "")
  }
}

/** url_normalize(url STRING) -> STRING — see [[UrlKernel]]. */
case class UrlNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.sql}")
    }
  override def nullSafeEval(u: Any): Any =
    UrlKernel.normalize(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.functions.UrlKernel.normalize($u)")
  override protected def withNewChildInternal(c: Expression): UrlNormalize =
    copy(c)
  override def prettyName: String = "url_normalize"
}

object UrlFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("url_normalize",
      new ExpressionInfo(classOf[UrlNormalize].getName, null,
        "url_normalize",
        "url_normalize(url) - RFC 3986 syntax-based canonical form: " +
          "lowercase scheme/host, default ports stripped, fragment " +
          "dropped, unreserved escapes decoded, dot-segments " +
          "resolved, query params sorted", "", "", "", "", "4.0.0", "",
        "scala_udf"),
      (e: Seq[Expression]) => e match {
        case Seq(u) => UrlNormalize(u)
        case other => throw new IllegalArgumentException(
          s"url_normalize takes 1 argument, got ${other.size}")
      }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
