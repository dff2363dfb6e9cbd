package graft

import graft.sources.ODataFilterCompiler
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** OData catalog DSv2 (SURVEY.md §2.1 S3): $filter compilation matches
  * the grammar the reference hand-assembles
  * (`/root/reference/code/imagery_store.py:182-187`), and pushdown
  * actually reaches the source (plan description + served rows).
  */
class ODataSourceSpec extends AnyFunSuite with SharedSpark {

  test("filter compiler renders the reference's $filter grammar") {
    assert(ODataFilterCompiler.compile(EqualTo("Collection", "SENTINEL-2"))
      .contains("Collection/Name eq 'SENTINEL-2'"))
    assert(ODataFilterCompiler.compile(GreaterThan("ContentDate.Start", "2023-01-01"))
      .contains("ContentDate/Start gt 2023-01-01"))
    assert(ODataFilterCompiler.compile(EqualTo("productType", "S2MSI2A"))
      .contains("Attributes/OData.CSC.StringAttribute/any(att: " +
        "att/Name eq 'productType' and " +
        "att/OData.CSC.StringAttribute/Value eq 'S2MSI2A')"))
    assert(ODataFilterCompiler.compile(LessThanOrEqual("cloudCover", 4.0))
      .contains("Attributes/OData.CSC.DoubleAttribute/any(att: " +
        "att/Name eq 'cloudCover' and " +
        "att/OData.CSC.DoubleAttribute/Value le 4.0)"))
    // unsupported → residual
    assert(ODataFilterCompiler.compile(StringStartsWith("Name", "S2")).isEmpty)
  }

  private val records =
    """[
      |{"Id":"a1","Name":"S2A_1","S3Path":"/e/a1","OriginDate":"2023-06-15T10:00:00Z",
      | "Collection":"SENTINEL-2",
      | "ContentDate":{"Start":"2023-06-15T10:00:00Z","End":"2023-06-15T10:01:00Z"},
      | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      | "Attributes":[{"Name":"cloudCover","Value":"2.5"},{"Name":"productType","Value":"S2MSI2A"}]},
      |{"Id":"b2","Name":"S2B_2","S3Path":"/e/b2","OriginDate":"2023-07-15T10:00:00Z",
      | "Collection":"SENTINEL-2",
      | "ContentDate":{"Start":"2023-07-15T10:00:00Z","End":"2023-07-15T10:01:00Z"},
      | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      | "Attributes":[{"Name":"cloudCover","Value":"80.0"},{"Name":"productType","Value":"S2MSI2A"}]},
      |{"Id":"c3","Name":"S1A_3","S3Path":"/e/c3","OriginDate":"2023-06-20T10:00:00Z",
      | "Collection":"SENTINEL-1",
      | "ContentDate":{"Start":"2023-06-20T10:00:00Z","End":"2023-06-20T10:01:00Z"},
      | "footprint_wkt":"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      | "Attributes":[{"Name":"productType","Value":"GRD"}]}
      |]""".stripMargin

  private def catalog =
    spark.read.format("graft.sources.ODataCatalogSource")
      .option("records", records).load()

  test("reads the recorded catalog page with full schema") {
    val rows = catalog.collect()
    assert(rows.length == 3)
    val a1 = catalog.filter(col("Id") === "a1")
      .select("ContentDate.Start", "Attributes").head()
    assert(a1.getString(0) == "2023-06-15T10:00:00Z")
  }

  test("filters push to the source and are applied server-side") {
    val q = catalog
      .filter(col("Collection") === "SENTINEL-2")
      .filter(col("ContentDate.Start") > "2023-01-01")
    val ids = q.select("Id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids == Seq("a1", "b2"))
    val desc = q.queryExecution.executedPlan.toString()
    assert(desc.contains("PushedFilters") || q.queryExecution.optimizedPlan
      .toString().nonEmpty) // plan renders; the decisive check is below
    // the scan description carries the compiled $filter
    val scanDesc = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString("\n")
    assert(scanDesc.contains("Collection/Name eq 'SENTINEL-2'"))
  }

  test("limit pushes as $top") {
    assert(catalog.limit(2).collect().length == 2)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val q = catalog.select("Id", "S3Path")
    val rows = q.collect()
    assert(rows.length == 3 && rows.head.schema.fieldNames.toSeq == Seq("Id", "S3Path"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString()
    // the DSv2 scan's output carries only the pruned columns
    assert(scan.contains("Id") && !scan.contains("Attributes"), scan)
  }

  test("filter + limit + pruning compose in one scan") {
    val q = catalog.filter(col("Collection") === "SENTINEL-2")
      .select("Id").limit(1)
    val got = q.collect()
    assert(got.length == 1)
    assert(Set("a1", "b2").contains(got.head.getString(0)))
  }

  test("nested-attribute predicates remain residual and still filter") {
    // cloudCover lives inside Attributes post-unpack — Spark evaluates
    // the residual after the map projection (the reference's N1 path)
    val unpacked = graft.operators.ProductSelect.unpackAttributes(catalog)
    val ids = unpacked.filter(col("cloudCover") <= 4.0)
      .select("Id").collect().map(_.getString(0)).toSeq
    assert(ids == Seq("a1"))
  }

  test("COUNT(*) pushes to the source as a $count probe (no rows scanned)") {
    // global count over pushed filters: the scan serves ONE count row
    // instead of materializing products
    val q = catalog.filter(col("Collection") === "SENTINEL-2")
      .agg(count(lit(1)))
    assert(q.collect().head.getLong(0) == 2L)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString("\n")
    assert(scan.contains("$count=true"), scan)
    // unfiltered count too
    val all = catalog.agg(count(lit(1)))
    assert(all.collect().head.getLong(0) == 3L)
    assert(all.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString.contains("$count=true"))
  }

  test("MIN/MAX over top-level strings push (recorded path); nested " +
      "or non-string columns keep the row scan") {
    val q = catalog.filter(col("Collection") === "SENTINEL-2")
      .agg(min("OriginDate"), max("OriginDate"), count(lit(1)))
    val r = q.collect().head
    assert(r.getString(0) == "2023-06-15T10:00:00Z")
    assert(r.getString(1) == "2023-07-15T10:00:00Z")
    assert(r.getLong(2) == 2L)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString
    assert(scan.contains("min(OriginDate) via $orderby"), scan)
    assert(scan.contains("$count=true"), scan)
    // a nested column (ContentDate.Start) is not a pushable extremum:
    // the row scan still answers it
    val nested = catalog.agg(max("ContentDate.Start"))
    assert(nested.collect().head.getString(0) == "2023-07-15T10:00:00Z")
    assert(!nested.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString.contains("$orderby"))
  }

  test("COUNT(*) does NOT push when a residual filter or grouping exists") {
    // StringStartsWith is not compilable to $filter → residual blocks
    // aggregate pushdown; the count still answers correctly from rows
    val resid = catalog.filter(col("Name").startsWith("S2"))
      .agg(count(lit(1)))
    assert(resid.collect().head.getLong(0) == 2L)
    assert(!resid.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString.contains("$count=true"))
    // grouped counts are not a $count probe either
    val grouped = catalog.groupBy("Collection").agg(count(lit(1)).as("n"))
    assert(grouped.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap ==
      Map("SENTINEL-2" -> 2L, "SENTINEL-1" -> 1L))
    assert(!grouped.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString.contains("$count=true"))
    // a limit below the count keeps the row scan (COUNT over $top'd
    // rows is not the server's $count semantics)
    val limited = catalog.limit(2).agg(count(lit(1)))
    assert(limited.collect().head.getLong(0) == 2L)
    assert(!limited.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString.contains("$count=true"))
  }
}
