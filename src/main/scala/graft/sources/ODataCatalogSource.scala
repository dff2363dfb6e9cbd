package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the product catalog (SURVEY.md §2.1 S3): the
  * engine-grade replacement for the reference's driver-side
  * `requests.get(search_query).json()` → DataFrame
  * (`/root/reference/code/imagery_store.py:188-189`).
  *
  * Pushdown: `SupportsPushDownFilters` compiles Catalyst predicates to
  * the OData `$filter` grammar via [[ODataFilterCompiler]] (exactly
  * the clauses the reference bakes by hand), `SupportsPushDownLimit`
  * maps to `$top` (the server's 20-product page cap,
  * `code/imagery_store.py:45`), and `SupportsPushDownRequiredColumns`
  * prunes the projection. Two transports, same plan:
  *
  *   - recorded (option `path` / `records`): serves a captured
  *     catalog response while honoring the pushed filters + limit
  *     the way the server would;
  *   - live (option `url`): the partition reader GETs
  *     [[ODataFilterCompiler.searchUri]] — compiled `$filter` +
  *     `$top` ON THE WIRE — over [[HttpTransport]] from the
  *     executor (ODataHttpIntegrationSpec drives this end-to-end
  *     against a loopback server).
  *
  * Usage: `spark.read.format("graft.sources.ODataCatalogSource")
  *   .option("records", json).load()` (or `.option("url", base)`)
  */
class ODataCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ODataCatalogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ODataCatalogTable(properties)
  override def supportsExternalMetadata(): Boolean = false
}

object ODataCatalogSource {
  /** FIXTURES.md A1 — the effective catalog schema. */
  val schema: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("Name", StringType),
    StructField("S3Path", StringType),
    StructField("OriginDate", StringType),
    StructField("Collection", StringType),
    StructField("ContentDate", StructType(Seq(
      StructField("Start", StringType), StructField("End", StringType)))),
    StructField("footprint_wkt", StringType),
    StructField("Attributes", ArrayType(StructType(Seq(
      StructField("Name", StringType), StructField("Value", StringType)))))))
}

class ODataCatalogTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "odata_catalog"
  override def schema(): StructType = ODataCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(
      Option(options.get("records")).orElse(Option(properties.get("records"))),
      Option(options.get("path")).orElse(Option(properties.get("path"))),
      Option(options.get("url")).orElse(Option(properties.get("url"))))
}

class ODataScanBuilder(records: Option[String], path: Option[String],
    url: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue
  private var required: StructType = ODataCatalogSource.schema
  private var countPushed = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (_, pushable, residual) = ODataFilterCompiler.compileAll(filters.toSeq)
    pushed = pushable.toArray
    residual.toArray
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def pruneColumns(requiredSchema: StructType): Unit =
    // once COUNT is pushed the scan's schema IS the count row;
    // Spark may still call pruneColumns afterwards — ignore it
    if (!countPushed) required = requiredSchema

  // Aggregate pushdown (server-side $count / $orderby probes): a
  // global COUNT(*) / MIN(col) / MAX(col) — the "how many products
  // match, what's the date range" probe every catalog client runs
  // before committing to a download sweep — never needs the rows.
  // OData v4 answers each natively: `$count=true&$top=0` →
  // `@odata.count` in the envelope, and MIN/MAX over a sortable
  // column is `$orderby=col asc|desc&$top=1&$select=col` — one
  // single-row request per extremum. So the scan ships ZERO product
  // pages over the wire where the reference pages the full result
  // set and folds client-side. Complete pushdown: Spark is told the
  // single returned row is the final answer (no re-aggregation), and
  // only attempts it when every filter was pushed (residuals disable
  // it), so every probe runs over exactly the server-filtered set.
  // MIN/MAX limits: TOP-LEVEL string columns only (nested
  // ContentDate/attribute paths stay row-scanned) — their ISO-date /
  // ASCII values order identically under the server's collation,
  // lexicographic DuckDB/Java compare, and UTF8String binary order.
  private var aggOps: Seq[(String, String)] = Nil // (op, col); op ∈ count|min|max

  private def compileAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(Seq[(String, String)], StructType)] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    val topStringCols = ODataCatalogSource.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    def name(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
        topStringCols(nr.fieldNames()(0)) => Some(nr.fieldNames()(0))
      case _ => None
    }
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      None
    else {
      val ops = agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Some(("count", "", StructField("COUNT(*)",
          LongType, nullable = false)))
        case m: Min => name(m.column()).map(c =>
          ("min", c, StructField(s"MIN($c)", StringType)))
        case m: Max => name(m.column()).map(c =>
          ("max", c, StructField(s"MAX($c)", StringType)))
        case _ => None
      }
      if (ops.exists(_.isEmpty)) None
      else Some((ops.flatten.map(o => (o._1, o._2)),
        StructType(ops.flatten.map(_._3))))
    }
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    limit == Int.MaxValue && compileAgg(agg).isDefined
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    if (limit != Int.MaxValue) false
    else compileAgg(agg) match {
      case Some((ops, schema)) =>
        countPushed = true
        aggOps = ops
        required = schema
        true
      case None => false
    }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String = {
      val (clause, _, _) = ODataFilterCompiler.compileAll(pushed.toSeq)
      s"ODataCatalogScan($$filter=$clause, $$top=$limit" +
        (if (!countPushed) ")"
         else aggOps.map {
           case ("count", _) => "$count=true"
           case (op, c) => s"$op($c) via $$orderby"
         }.mkString(", pushed aggs: [", ", ", "])"))
    }
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // The LIVE path: compile the pushed predicates + limit into the
      // OData query string — server-side filtering reaches the wire,
      // exactly the clauses the reference hand-assembles
      // (`code/imagery_store.py:182-187`). The fetch itself happens in
      // the partition READER, i.e. on an executor, not the driver.
      url match {
        case Some(base) =>
          val (clause, _, _) = ODataFilterCompiler.compileAll(pushed.toSeq)
          if (countPushed) {
            // one single-row probe per aggregate, no product pages
            val urls = aggOps.map {
              case ("count", _) => ODataFilterCompiler.countUri(base, clause)
              case ("min", c) => ODataFilterCompiler.minMaxUri(base, clause, c, asc = true)
              case ("max", c) => ODataFilterCompiler.minMaxUri(base, clause, c, asc = false)
              case (op, c) => throw new IllegalStateException(s"agg op $op($c)")
            }
            Array(ODataInputPartition(null, pushed, limit, required,
              queryUrl = Some(base), aggOps = aggOps, aggUrls = urls))
          } else {
            // no pushed limit → the server's 20-product page cap
            // (`code/imagery_store.py:45`)
            val top = if (limit == Int.MaxValue) 20 else limit
            val q = ODataFilterCompiler.searchUri(base, clause, top)
            Array(ODataInputPartition(null, pushed, limit, required, Some(q)))
          }
        case None =>
          val json = records.getOrElse {
            val p = path.getOrElse(throw new IllegalArgumentException(
              "need option records, path, or url"))
            new String(
              java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
              java.nio.charset.StandardCharsets.UTF_8)
          }
          Array(ODataInputPartition(json, pushed, limit, required,
            aggOps = if (countPushed) aggOps else Nil))
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      (p: InputPartition) => {
        val part = p.asInstanceOf[ODataInputPartition]
        new ODataPartitionReader(part)
      }
  }
}

case class ODataInputPartition(json: String, pushed: Array[Filter],
    limit: Int, required: StructType,
    queryUrl: Option[String] = None,
    aggOps: Seq[(String, String)] = Nil,
    aggUrls: Seq[String] = Nil) extends InputPartition {
  def aggMode: Boolean = aggOps.nonEmpty
}

/** Parses the recorded response — or, on the live path, GETs
  * `queryUrl` over [[HttpTransport]] first — and serves it "as the
  * server would": pushed filters and the `$top` limit are applied
  * HERE too (idempotent against a server that already honored
  * `$filter`/`$top`) — rows that a real OData endpoint would never
  * return do not reach Spark.
  */
class ODataPartitionReader(part: ODataInputPartition)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private def fetch(q: String): String =
    new String(HttpTransport.get(q), java.nio.charset.StandardCharsets.UTF_8)

  private def envelopeNodes(body: String): Iterator[JsonNode] = {
    val root = mapper.readTree(body)
    val nodes =
      if (root.isArray) root.elements()
      else if (root.has("value")) root.get("value").elements() // OData envelope
      else util.Collections.singletonList(root).iterator()
    import scala.jdk.CollectionConverters._
    nodes.asScala
  }

  /** Pushed-aggregate mode: ONE row with a value per op. Live: each
    * op is its own single-row probe — count reads `@odata.count`
    * from the `$count=true&$top=0` envelope (or a bare integer, the
    * `/Products/$count` form), min/max read the one projected value
    * of the `$orderby ... $top=1` answer (null on an empty filtered
    * set). Recorded: compute what the server would have — pushed
    * filters apply, `$top` does NOT (both $count and $orderby are
    * defined over the filtered set, before paging).
    */
  private val aggRow: Iterator[Array[Any]] =
    if (!part.aggMode) Iterator.empty
    else part.queryUrl match {
      case Some(_) =>
        Iterator.single(part.aggOps.zip(part.aggUrls).map {
          case (("count", _), u) =>
            val t = fetch(u).trim
            val root = mapper.readTree(t)
            if (root.isNumber) root.asLong()
            else if (root.has("@odata.count")) root.get("@odata.count").asLong()
            else throw new IllegalStateException(
              s"count probe answer has no @odata.count: ${t.take(200)}")
          case ((_, col), u) =>
            val first = envelopeNodes(fetch(u)).toSeq.headOption
            first.map { n =>
              val v = n.get(col)
              if (v == null || v.isNull) null
              else UTF8String.fromString(v.asText())
            }.orNull
        }.toArray[Any])
      case None =>
        val nodes = envelopeNodes(part.json)
          .filter(n => part.pushed.forall(f => ODataPartitionReader.eval(f, n)))
          .toSeq
        Iterator.single(part.aggOps.map {
          case ("count", _) => nodes.size.toLong
          case (op, col) =>
            // Compare as UTF8String (UTF-8 byte order), not java.lang
            // .String (UTF-16 code units): the pushdown is declared
            // complete, so Spark never re-aggregates, and the two
            // orderings diverge on supplementary-plane characters.
            val vals = nodes.flatMap { n =>
              val v = n.get(col)
              if (v == null || v.isNull) None
              else Some(UTF8String.fromString(v.asText()))
            }
            if (vals.isEmpty) null
            else if (op == "min") vals.min else vals.max
        }.toArray[Any])
    }

  private val iter: Iterator[JsonNode] = {
    if (part.aggMode) Iterator.empty
    else {
      val body = part.queryUrl match {
        case Some(q) => fetch(q)
        case None => part.json
      }
      envelopeNodes(body)
        .filter(n => part.pushed.forall(f => ODataPartitionReader.eval(f, n)))
        .take(part.limit)
    }
  }
  private var cur: JsonNode = _
  private var curAgg: Array[Any] = _

  override def next(): Boolean =
    if (part.aggMode) {
      if (aggRow.hasNext) { curAgg = aggRow.next(); true }
      else false
    } else if (iter.hasNext) { cur = iter.next(); true } else false

  override def get(): InternalRow = if (part.aggMode) {
    new GenericInternalRow(curAgg)
  } else {
    val vals = part.required.fields.map { f =>
      f.name match {
        case "ContentDate" =>
          val cd = cur.get("ContentDate")
          if (cd == null) null
          else new GenericInternalRow(Array[Any](
            utf8(cd, "Start"), utf8(cd, "End")))
        case "Attributes" =>
          val at = cur.get("Attributes")
          if (at == null) null
          else {
            import scala.jdk.CollectionConverters._
            new GenericArrayData(at.elements().asScala.map { a =>
              new GenericInternalRow(Array[Any](utf8(a, "Name"), utf8(a, "Value")))
            }.toArray[Any])
          }
        case other => utf8(cur, other)
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  private def utf8(n: JsonNode, field: String): UTF8String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  override def close(): Unit = ()
}

object ODataPartitionReader {
  /** Server-side evaluation of the pushed subset. String fields
    * compare lexicographically (ISO dates — the reference's own
    * comparison semantics, SURVEY §1.2); typed attributes compare
    * numerically per their OData attribute type.
    */
  def eval(f: Filter, n: JsonNode): Boolean = f match {
    case And(l, r) => eval(l, n) && eval(r, n)
    case Or(l, r) => eval(l, n) || eval(r, n)
    case IsNotNull(a) => cmp(a, n).isDefined
    case EqualTo(a, v) => cmp(a, n).exists(_.compareTo(coerce(a, v)) == 0)
    case GreaterThan(a, v) => cmp(a, n).exists(_.compareTo(coerce(a, v)) > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, n).exists(_.compareTo(coerce(a, v)) >= 0)
    case LessThan(a, v) => cmp(a, n).exists(_.compareTo(coerce(a, v)) < 0)
    case LessThanOrEqual(a, v) => cmp(a, n).exists(_.compareTo(coerce(a, v)) <= 0)
    case _ => true
  }

  private val numericAttrs = Set("cloudCover", "relativeOrbitNumber")

  private def coerce(attr: String, v: Any): Comparable[Any] =
    (if (numericAttrs.contains(attr)) java.lang.Double.valueOf(v.toString)
     else v.toString).asInstanceOf[Comparable[Any]]

  /** Resolve a pushable column on the raw record. */
  private def cmp(attr: String, n: JsonNode): Option[Comparable[Any]] = {
    val raw: Option[String] = attr match {
      case "ContentDate.Start" =>
        Option(n.at("/ContentDate/Start")).filterNot(_.isMissingNode).map(_.asText())
      case "ContentDate.End" =>
        Option(n.at("/ContentDate/End")).filterNot(_.isMissingNode).map(_.asText())
      case a if ODataPartitionReader.isAttribute(n, a) =>
        import scala.jdk.CollectionConverters._
        n.get("Attributes").elements().asScala
          .find(x => x.get("Name").asText() == a).map(_.get("Value").asText())
      case top =>
        Option(n.get(top)).filterNot(_.isNull).map(_.asText())
    }
    raw.map(s =>
      (if (numericAttrs.contains(attr)) java.lang.Double.valueOf(s)
       else s).asInstanceOf[Comparable[Any]])
  }

  private def isAttribute(n: JsonNode, a: String): Boolean = {
    val at = n.get("Attributes")
    if (at == null || !at.isArray) false
    else {
      import scala.jdk.CollectionConverters._
      at.elements().asScala.exists(x => x.get("Name").asText() == a)
    }
  }
}
