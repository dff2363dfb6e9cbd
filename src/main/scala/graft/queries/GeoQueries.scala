package graft.queries

import graft.{QueryModule, Tables => T}
import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked exercises of the custom operator tier.
  *
  * q38 runs the custom Catalyst geometry expressions (st_area,
  * st_intersection_area, st_intersects) inside the driver's
  * hash-compared gate: footprint boxes are synthesized from part-table
  * integers, so DuckDB can state the expected values in closed-form
  * box arithmetic — integer-valued doubles make both sides exact, and
  * a hash match proves the Sutherland–Hodgman kernel agrees with the
  * closed form on every row.
  *
  * q39 is the N1 attribute pivot in its explode+pivot form (SURVEY.md
  * §2.3 — the alternative to the map_from_entries projection used in
  * ProductSelect.unpackAttributes), with explicit pivot values so the
  * output schema is static.
  */
object GeoQueries extends QueryModule {

  // Axis-aligned AOI, integer coords: (20,20)-(60,60).
  private val aoiWkt = "POLYGON ((20 20, 60 20, 60 60, 20 60, 20 20))"

  // Footprint box derived from part integers (integer-valued doubles).
  private val fx1 = "CAST(p_partkey % 97 AS DOUBLE)"
  private val fy1 = "CAST(p_partkey % 89 AS DOUBLE)"
  private val fx2 = s"$fx1 + 1 + p_size % 7"
  private val fy2 = s"$fy1 + 1 + p_size % 5"

  private def q38(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    T.part(s, dir)
      .withColumn("x1", expr(fx1)).withColumn("y1", expr(fy1))
      .withColumn("x2", expr(fx2)).withColumn("y2", expr(fy2))
      .withColumn("wkt", expr(
        """concat('POLYGON ((', CAST(x1 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y1 AS INT), '))')""".stripMargin))
      .select(col("p_partkey"),
        expr("st_area(wkt)").as("area"),
        expr(s"st_intersection_area(wkt, '$aoiWkt')").as("cov"),
        expr(s"st_intersects(wkt, '$aoiWkt')").as("hits"))
      .orderBy("p_partkey")
  }

  private val q38Sql =
    s"""SELECT p_partkey,
       |  (x2 - x1) * (y2 - y1) AS area,
       |  GREATEST(0, LEAST(x2, 60) - GREATEST(x1, 20))
       |    * GREATEST(0, LEAST(y2, 60) - GREATEST(y1, 20)) AS cov,
       |  GREATEST(0, LEAST(x2, 60) - GREATEST(x1, 20))
       |    * GREATEST(0, LEAST(y2, 60) - GREATEST(y1, 20)) > 0 AS hits
       |FROM (
       |  SELECT p_partkey, $fx1 AS x1, $fy1 AS y1, $fx2 AS x2, $fy2 AS y2
       |  FROM part)
       |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q59 — the grid-bucketed spatial join OPERATOR itself
  // (operators/SpatialJoin.intersectJoin: cell explode → equi-join →
  // reference-cell dedup → exact predicate) against a brute-force
  // DuckDB overlap join. Footprints synthesized from part integers
  // (as q38); AOIs are 25 integer boxes from the nation table. The
  // oracle proves BOTH that no intersecting pair is missed by the
  // bucketing AND that the reference-cell trick emits each pair
  // exactly once — with the declared positive-area intersects
  // semantics on both sides.
  private val aoiX1 = "CAST(n_nationkey * 4 AS DOUBLE)"
  private val aoiY1 = "CAST(n_nationkey * 3 AS DOUBLE)"

  private def footprints(s: SparkSession, dir: String): DataFrame =
    T.part(s, dir)
      .withColumn("x1", expr(fx1)).withColumn("y1", expr(fy1))
      .withColumn("x2", expr(fx2)).withColumn("y2", expr(fy2))
      .withColumn("geom", expr(
        """concat('POLYGON ((', CAST(x1 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y1 AS INT), '))')""".stripMargin))
      .select(col("p_partkey"), col("geom"))

  private def aoiBoxes(s: SparkSession, dir: String): DataFrame =
    T.nation(s, dir)
      .withColumn("ax1", expr(aoiX1)).withColumn("ay1", expr(aoiY1))
      .withColumn("aoi_wkt", expr(
        """concat('POLYGON ((', CAST(ax1 AS INT), ' ', CAST(ay1 AS INT), ', ',
          | CAST(ax1 + 10 AS INT), ' ', CAST(ay1 AS INT), ', ',
          | CAST(ax1 + 10 AS INT), ' ', CAST(ay1 + 8 AS INT), ', ',
          | CAST(ax1 AS INT), ' ', CAST(ay1 + 8 AS INT), ', ',
          | CAST(ax1 AS INT), ' ', CAST(ay1 AS INT), '))')""".stripMargin))
      .select(col("n_nationkey").as("aoi_id"), col("aoi_wkt"))

  private def q59(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpatialJoin
      .intersectJoin(s, footprints(s, dir), aoiBoxes(s, dir),
        "geom", "aoi_wkt", cellSize = 8.0)
      .select(col("aoi_id").cast("long").as("aoi_id"), col("p_partkey"))
      .orderBy("aoi_id", "p_partkey")

  private val q59Sql =
    s"""SELECT CAST(a.aoi_id AS BIGINT) AS aoi_id, f.p_partkey
       |FROM (
       |  SELECT p_partkey, $fx1 AS x1, $fy1 AS y1, $fx2 AS x2, $fy2 AS y2
       |  FROM part) f
       |CROSS JOIN (
       |  SELECT n_nationkey AS aoi_id, $aoiX1 AS ax1, $aoiY1 AS ay1
       |  FROM nation) a
       |WHERE LEAST(f.x2, a.ax1 + 10) > GREATEST(f.x1, a.ax1)
       |  AND LEAST(f.y2, a.ay1 + 8) > GREATEST(f.y1, a.ay1)
       |ORDER BY aoi_id, p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q81 — the OPTIMIZER-RULE path to the same spatial join: the user
  // writes the naive theta-join `join(aois, st_intersects(g, a))` —
  // which Spark alone plans as a nested-loop/cartesian — and
  // plans.SpatialJoinRule rewrites it to q59's grid-bucketed
  // equi-join during optimization. Same inputs, same brute-force
  // DuckDB oracle as q59: certifies the rewrite is semantics-
  // preserving end-to-end (SpatialJoinRuleSpec pins the synthetic
  // plan shape; PlanShapeSpec's q81 case pins THIS query's plan).
  // Built on a CHILD session (`newSession` shares the SparkContext
  // but isolates conf + optimizer registrations) so the rule install
  // and the 8.0 cell pitch never leak into the shared bench/verify
  // session — a later naive st_intersects join there must stay
  // un-rewritten unless its owner opts in.
  private def q81(s: SparkSession, dir: String): DataFrame = {
    // The child session is MEMOIZED per (parent session, dir): a
    // fresh newSession() per serve re-registered the functions,
    // re-installed the rule, AND — because Tables.t memoizes resolved
    // relations per session — re-resolved the part/nation parquet
    // footers on every call (~80 ms apiece even warm; the round-21
    // task census read q81 at 1.0 s/serve vs q59's 0.5 s for the
    // same join). A production rule install is per-session setup, not
    // per-query work; the isolation argument (the rule and the 8.0
    // cell pitch must not leak into the shared session) only needs
    // ONE child session, not one per serve.
    val s2 = graft.CachedPlans.valueOf(s, dir, "q81_session") {
      val child = s.newSession()
      graft.functions.GeoFunctions.register(child)
      graft.plans.SpatialJoinRule.install(child)
      child.conf.set("spark.graft.spatial.cellSize", "8.0")
      child
    }
    footprints(s2, dir)
      .join(aoiBoxes(s2, dir), expr("st_intersects(geom, aoi_wkt)"))
      .select(col("aoi_id").cast("long").as("aoi_id"), col("p_partkey"))
      .orderBy("aoi_id", "p_partkey")
  }

  // ---------------------------------------------------------------
  // q62 — Z-ORDER (Morton) clustering key over footprint envelopes:
  // interleave the bits of the envelope-origin cell coordinates so
  // that sorting/bucketing by the key places spatially-near tiles in
  // the same files — the standard lakehouse layout move that turns a
  // 2-D bbox query into a few contiguous key ranges (partition/file
  // pruning instead of a full scan). Closed-form bit arithmetic,
  // textually identical in both engines; 8 bits per axis covers the
  // synthetic grid.
  private def mortonS(x: String, y: String): String =
    (0 until 8).map(b =>
      s"shiftleft(shiftright($x, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright($y, $b) & 1, ${2 * b + 1})")
      .mkString(" + ")
  private def mortonD(x: String, y: String): String =
    (0 until 8).map(b =>
      s"(((($x) >> $b) & 1) << ${2 * b}) + (((($y) >> $b) & 1) << ${2 * b + 1})")
      .mkString(" + ")

  private def q62(s: SparkSession, dir: String): DataFrame =
    T.part(s, dir)
      .withColumn("cx", expr(s"CAST(p_partkey % 97 AS BIGINT)"))
      .withColumn("cy", expr(s"CAST(p_partkey % 89 AS BIGINT)"))
      .withColumn("zkey", expr(s"CAST(${mortonS("cx", "cy")} AS BIGINT)"))
      .select("p_partkey", "cx", "cy", "zkey")
      .orderBy("zkey", "p_partkey")

  private val q62Sql =
    s"""SELECT p_partkey, cx, cy,
       |  CAST(${mortonD("cx", "cy")} AS BIGINT) AS zkey
       |FROM (
       |  SELECT p_partkey,
       |    CAST(p_partkey % 97 AS BIGINT) AS cx,
       |    CAST(p_partkey % 89 AS BIGINT) AS cy
       |  FROM part)
       |ORDER BY zkey, p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q72 — the reference's WHOLE flagship pipeline (E3: catalog filter →
  // attribute unpack → spatial join → coverage score → per-AOI argmax
  // with recency tie-break) in its BATCH/scale form,
  // ProductSelect.bestPerAoi, under the oracle gate. The catalog is
  // synthesized from part integers (q38/q59's footprint generator +
  // an Attributes array like the reference's OData payload), AOIs from
  // nation (q59's 25 boxes); the DuckDB twin is the brute-force
  // overlay + window argmax. OriginDate is injective in p_partkey so
  // the (area_ratio DESC, origin_date DESC) tie-break is a total
  // order — both engines must pick the same winner. All ratios are
  // integer-valued-double divisions by the constant AOI area (80):
  // IEEE-identical across engines, so the hash compare is exact.
  private def q72(s: SparkSession, dir: String): DataFrame =
    bestPerAoiWinners(s, dir)

  /** q72's winner table (one row per AOI), exposed for the
    * catalog→index composition q137 (SimSearch): the picked products'
    * `uuid`/`tile` seed the document selection of the training-data
    * half of that pipeline. Kept as the full q72 result so the two
    * consumers cannot drift.
    */
  private[queries] def bestPerAoiWinners(s: SparkSession, dir: String)
      : DataFrame = {
    val catalog = T.part(s, dir)
      .withColumn("x1", expr(fx1)).withColumn("y1", expr(fy1))
      .withColumn("x2", expr(fx2)).withColumn("y2", expr(fy2))
      .withColumn("geom", expr(
        """concat('POLYGON ((', CAST(x1 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y1 AS INT), ', ',
          | CAST(x2 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y2 AS INT), ', ',
          | CAST(x1 AS INT), ' ', CAST(y1 AS INT), '))')""".stripMargin))
      .select(
        col("p_partkey").cast("string").as("Id"),
        concat(lit("S2A_MSIL2A_"),
          lpad(col("p_partkey").cast("string"), 7, "0")).as("Name"),
        concat(lit("/eodata/"), col("p_partkey").cast("string")).as("S3Path"),
        lpad(col("p_partkey").cast("string"), 9, "0").as("OriginDate"),
        struct(lit("2024-06-01T00:00:00.000Z").as("Start"),
          lit("2024-06-01T00:10:00.000Z").as("End")).as("ContentDate"),
        lit("SENTINEL-2").as("Collection"),
        col("geom").as("footprint_wkt"),
        array(
          struct(lit("cloudCover").as("Name"),
            (col("p_partkey") % 10).cast("string").as("Value")),
          struct(lit("productType").as("Name"), lit("S2MSI2A").as("Value")),
          struct(lit("tileId").as("Name"),
            concat(lit("T"), (col("p_partkey") % 60).cast("string")).as("Value")),
          struct(lit("relativeOrbitNumber").as("Name"),
            (col("p_partkey") % 143).cast("string").as("Value"))).as("Attributes"))
    val aois = T.nation(s, dir)
      .withColumn("ax1", expr(aoiX1)).withColumn("ay1", expr(aoiY1))
      .withColumn("aoi_wkt", expr(
        """concat('POLYGON ((', CAST(ax1 AS INT), ' ', CAST(ay1 AS INT), ', ',
          | CAST(ax1 + 10 AS INT), ' ', CAST(ay1 AS INT), ', ',
          | CAST(ax1 + 10 AS INT), ' ', CAST(ay1 + 8 AS INT), ', ',
          | CAST(ax1 AS INT), ' ', CAST(ay1 + 8 AS INT), ', ',
          | CAST(ax1 AS INT), ' ', CAST(ay1 AS INT), '))')""".stripMargin))
      .select(col("n_nationkey").as("aoi_id"), col("aoi_wkt"))
    graft.operators.ProductSelect
      .bestPerAoi(s, catalog, aois, cellSize = 8.0)
      .select(col("aoi_id").cast("long").as("aoi_id"), col("uuid"),
        col("area_ratio"), col("name"), col("origin_date"), col("tile"),
        col("cloudcoverage"))
      .orderBy("aoi_id")
  }

  private val q72Sql =
    s"""WITH f AS (
       |  SELECT p_partkey, x1, y1, x2, y2,
       |    CAST(p_partkey AS VARCHAR) AS uuid,
       |    'S2A_MSIL2A_' || lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS name,
       |    lpad(CAST(p_partkey AS VARCHAR), 9, '0') AS origin_date,
       |    'T' || CAST(p_partkey % 60 AS VARCHAR) AS tile,
       |    CAST(p_partkey % 10 AS DOUBLE) AS cloudcoverage
       |  FROM (
       |    SELECT p_partkey, $fx1 AS x1, $fy1 AS y1, $fx2 AS x2, $fy2 AS y2
       |    FROM part WHERE p_partkey % 10 <= 4)),
       |a AS (
       |  SELECT n_nationkey AS aoi_id, $aoiX1 AS ax1, $aoiY1 AS ay1
       |  FROM nation),
       |scored AS (
       |  SELECT a.aoi_id, f.uuid,
       |    GREATEST(0, LEAST(f.x2, a.ax1 + 10) - GREATEST(f.x1, a.ax1))
       |      * GREATEST(0, LEAST(f.y2, a.ay1 + 8) - GREATEST(f.y1, a.ay1))
       |      / 80.0 AS area_ratio,
       |    f.name, f.origin_date, f.tile, f.cloudcoverage
       |  FROM f CROSS JOIN a
       |  WHERE LEAST(f.x2, a.ax1 + 10) > GREATEST(f.x1, a.ax1)
       |    AND LEAST(f.y2, a.ay1 + 8) > GREATEST(f.y1, a.ay1)),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY aoi_id
       |    ORDER BY area_ratio DESC, origin_date DESC) AS rn
       |  FROM scored)
       |SELECT CAST(aoi_id AS BIGINT) AS aoi_id, uuid, area_ratio,
       |  name, origin_date, tile, cloudcoverage
       |FROM ranked WHERE rn = 1
       |ORDER BY aoi_id""".stripMargin

  /** The q72 winners' distinct tile NUMBERS (p_partkey % 60) as a
    * self-contained DuckDB subquery — the oracle-side twin of
    * [[bestPerAoiWinners]] for the catalog→index composition (q137):
    * splice into an `IN (...)` predicate. ONE copy built on q72's
    * exact SQL, so the winner set cannot drift between the flagship
    * gate row and the composition's.
    */
  private[queries] val winnerTilesSql: String =
    s"SELECT DISTINCT CAST(uuid AS BIGINT) % 60 FROM ($q72Sql)"

  // ---------------------------------------------------------------
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val sumVal = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"

  private def q39(s: SparkSession, dir: String): DataFrame =
    T.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(expr(sumVal))
      .orderBy("user_id")

  private val q39Sql = {
    val cols = eventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' " +
        s"THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS $t")
    s"""SELECT user_id, ${cols.mkString(", ")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_geo_coverage" -> (q38 _),
    "q39_pivot" -> (q39 _),
    "q59_spatial_join" -> (q59 _),
    "q62_zorder_key" -> (q62 _),
    "q72_best_per_aoi" -> (q72 _),
    "q81_auto_spatial_join" -> (q81 _))

  override val oracle: Map[String, String] = Map(
    "q38_geo_coverage" -> q38Sql,
    "q39_pivot" -> q39Sql,
    "q59_spatial_join" -> q59Sql,
    "q62_zorder_key" -> q62Sql,
    "q72_best_per_aoi" -> q72Sql,
    // identical semantics through the optimizer-rule path
    "q81_auto_spatial_join" -> q59Sql)
}
