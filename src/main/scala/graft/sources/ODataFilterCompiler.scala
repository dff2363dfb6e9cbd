package graft.sources

import org.apache.spark.sql.sources._

/** Catalyst → OData `$filter` compiler: the inverse of parsing
  * (SURVEY.md §2.9 F6). The reference hand-assembles these strings
  * with f-strings (`/root/reference/code/imagery_store.py:182-187`,
  * `:216-221`); here the SAME grammar is rendered from pushed-down
  * Catalyst `sources.Filter`s, so `df.filter(...)` declarations reach
  * the catalog server:
  *
  *   Collection           → `Collection/Name eq 'X'`
  *   ContentDate.Start    → `ContentDate/Start gt 2023-01-01`
  *   attribute columns    → `Attributes/OData.CSC.<T>Attribute/any(
  *                            att: att/Name eq 'n' and
  *                            att/OData.CSC.<T>Attribute/Value op v)`
  *
  * Returns the compiled clause per filter; unsupported filters are
  * reported back so Spark keeps them as residuals (the DSv2
  * `pushFilters` contract).
  */
object ODataFilterCompiler {

  /** Attribute-typed columns the OData catalog models inside the
    * `Attributes` array (`code/imagery_store.py:183-186`).
    */
  private val attrType: Map[String, String] = Map(
    "productType" -> "String", "tileId" -> "String",
    "orbitDirection" -> "String", "cloudCover" -> "Double",
    "relativeOrbitNumber" -> "Integer")

  private def lit(v: Any): String = v match {
    case s: String => s"'$s'"
    case ts: java.sql.Timestamp => ts.toInstant.toString
    case other => String.valueOf(other)
  }

  /** Dates in OData are unquoted ISO literals; the reference compares
    * `ContentDate/Start` as such (`code/imagery_store.py:184`).
    */
  private def dateLit(v: Any): String = v match {
    case s: String => s
    case other => lit(other)
  }

  private def field(attribute: String, op: String, value: Any): Option[String] =
    attribute match {
      case "Collection" =>
        Some(s"Collection/Name $op ${lit(value)}")
      case "ContentDate.Start" =>
        Some(s"ContentDate/Start $op ${dateLit(value)}")
      case "ContentDate.End" =>
        Some(s"ContentDate/End $op ${dateLit(value)}")
      case a if attrType.contains(a) =>
        val t = attrType(a)
        Some(s"Attributes/OData.CSC.${t}Attribute/any(att: att/Name eq '$a' " +
          s"and att/OData.CSC.${t}Attribute/Value $op ${lit(value)})")
      case _ => None
    }

  /** Compile one Catalyst source filter to an OData clause. */
  def compile(f: Filter): Option[String] = f match {
    // Spark pairs every comparison with an IsNotNull guard; OData
    // renders it as `ne null`. Accepting it matters beyond fidelity:
    // an unpushed IsNotNull leaves a residual Filter node that blocks
    // LIMIT pushdown, so `$top` would never reach the wire.
    case IsNotNull(a) if a == "Collection" =>
      Some("Collection ne null")
    case IsNotNull(a) if a == "ContentDate.Start" =>
      Some("ContentDate/Start ne null")
    case IsNotNull(a) if a == "ContentDate.End" =>
      Some("ContentDate/End ne null")
    case EqualTo(a, v) => field(a, "eq", v)
    case GreaterThan(a, v) => field(a, "gt", v)
    case GreaterThanOrEqual(a, v) => field(a, "ge", v)
    case LessThan(a, v) => field(a, "lt", v)
    case LessThanOrEqual(a, v) => field(a, "le", v)
    case And(l, r) =>
      for { cl <- compile(l); cr <- compile(r) } yield s"($cl and $cr)"
    case Or(l, r) =>
      for { cl <- compile(l); cr <- compile(r) } yield s"($cl or $cr)"
    case _ => None // Not/In/StartsWith/...: residual, evaluated by Spark
  }

  /** Split filters into (compiled clauses, pushable, residual). */
  def compileAll(filters: Seq[Filter])
      : (String, Seq[Filter], Seq[Filter]) = {
    val (pushed, residual) = filters.partition(f => compile(f).isDefined)
    val clause = pushed.flatMap(compile).mkString(" and ")
    (clause, pushed, residual)
  }

  /** Full query-string assembly, mirroring
    * `code/imagery_store.py:187` (`$expand=Attributes` + `$top`).
    */
  def searchQuery(baseUrl: String, filter: String, top: Int): String =
    s"$baseUrl/Products?$$filter=$filter&$$expand=Attributes&$$top=$top"

  /** Wire-safe form of [[searchQuery]]: the $filter clause is
    * percent-encoded so the result parses as a `java.net.URI` (the
    * reference's requests library encodes implicitly).
    */
  def searchUri(baseUrl: String, filter: String, top: Int): String = {
    val enc = java.net.URLEncoder.encode(filter, "UTF-8").replace("+", "%20")
    s"$baseUrl/Products?$$filter=$enc&$$expand=Attributes&$$top=$top"
  }

  /** The pushed-COUNT(*) probe: `$count=true&$top=0` asks the server
    * for the size of the filtered set WITHOUT shipping any product —
    * OData v4 puts it in the envelope as `@odata.count` ($count is
    * defined over the filtered set, before `$top` paging applies).
    */
  def countUri(baseUrl: String, filter: String): String = {
    val enc = java.net.URLEncoder.encode(filter, "UTF-8").replace("+", "%20")
    s"$baseUrl/Products?$$filter=$enc&$$count=true&$$top=0"
  }

  /** The pushed-MIN/MAX probe: the extremum of a sortable column over
    * the filtered set is its `$orderby=col asc|desc & $top=1`
    * first row, projected to that one column — a single-row answer
    * instead of paging the result set.
    */
  def minMaxUri(baseUrl: String, filter: String, col: String,
      asc: Boolean): String = {
    val enc = java.net.URLEncoder.encode(filter, "UTF-8").replace("+", "%20")
    val dir = if (asc) "asc" else "desc"
    s"$baseUrl/Products?$$filter=$enc&$$orderby=$col%20$dir&$$top=1&$$select=$col"
  }
}
