package graft

import graft.operators.Profile
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** operators.Profile — the one-pass column profiler: null/distinct
  * accounting, stringified extrema, column order, and the
  * single-scan plan shape.
  */
class ProfileSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def sample = Seq(
    (1L, Some("b"), Some(2.5)),
    (2L, None, Some(1.0)),
    (3L, Some("a"), None),
    (4L, Some("a"), Some(9.75))).toDF("k", "s", "v")

  test("counts nulls and exact distincts per column; extrema as strings") {
    val rows = Profile.profile(sample, Seq("k", "s", "v"))
      .orderBy("col_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "s", "v"))
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        r.getString(5))).toMap
    assert(byName("k") == ((4L, 0L, 4L, "1", "4")))
    // countDistinct ignores nulls: {a, b} = 2
    assert(byName("s") == ((4L, 1L, 2L, "a", "b")))
    assert(byName("v") == ((4L, 1L, 3L, "1.0", "9.75")))
  }

  test("pre-cast composition gives engine-stable decimal rendering") {
    val df = sample.withColumn("v",
      org.apache.spark.sql.functions.col("v").cast("decimal(18,2)"))
    val v = Profile.profile(df, Seq("v")).collect().head
    assert(v.getString(4) == "1.00" && v.getString(5) == "9.75")
  }

  test("approx mode keeps the report schema") {
    val rows = Profile.profile(sample, Seq("k", "s"),
      exactDistinct = false).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getLong(3) > 0L)) // HLL estimate, tiny set exact
  }

  test("plan stays linear in column count: two scans, no Expand, " +
      "no per-column jobs") {
    val p = Profile.profile(sample, Seq("k", "s", "v"))
      .queryExecution.explainString(FormattedMode)
    // the k-way multi-distinct Expand rewrite (whose plan cost grows
    // super-linearly in k) must NOT appear; the melt form scans twice
    assert(!p.contains("Expand"), p)
    assert("""\(\d+\) (Scan|LocalTableScan)""".r.findAllIn(p).length == 2, p)
  }

  test("column names containing quotes and backticks are escaped") {
    val hostile = sample
      .withColumnRenamed("s", "we`ird")
      .withColumnRenamed("v", "it's")
    val rows = Profile.profile(hostile, Seq("k", "we`ird", "it's"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows.keySet == Set("k", "we`ird", "it's")) // labels intact
    assert(rows("k") == 4L && rows("we`ird") == 2L && rows("it's") == 3L)
  }

  test("empty input yields zero-row counts, null extrema") {
    val empty = sample.filter("k < 0")
    val r = Profile.profile(empty, Seq("k")).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
