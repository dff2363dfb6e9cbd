package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-data readers (SURVEY.md §2.1 S1/S2): the engine's
  * counterparts of `read_file_as_gdf`
  * (`/root/reference/code/download_imagery.py:14-27`), including the
  * format dispatch by suffix (§2.2 P10) — implemented WITHOUT the
  * reference's latent bug where the CSV branch never returns
  * (`code/download_imagery.py:17-21`, noted in SURVEY §3 E1).
  *
  * Geometry lands as a WKT string column `geometry` in every branch,
  * so downstream st_* expressions are format-agnostic.
  */
object VectorSources {

  /** GeoJSON FeatureCollection → one row per feature: `properties.*`
    * + `geometry` (WKT). The feature unpack is N3 (`explode`); the
    * geometry→WKT render runs entirely in codegen'd array lambdas.
    *
    * Polygon (with interior rings/holes) and MultiPolygon collections
    * are supported; the geometry kind is detected from the inferred
    * nesting depth of `coordinates` (3 = Polygon rings, 4 =
    * MultiPolygon), so a homogeneous file of either kind reads
    * directly. Heterogeneous or other geometry types fail LOUDLY
    * with the offending schema (no silent mis-parse).
    */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val exploded = raw.select(explode(col("features")).as("f"))
    val coordsType = exploded.select(col("f.geometry.coordinates"))
      .schema.head.dataType
    def depth(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case org.apache.spark.sql.types.ArrayType(e, _) => 1 + depth(e)
      case _ => 0
    }
    val pt = "p -> concat(CAST(p[0] AS STRING), ' ', CAST(p[1] AS STRING))"
    val ring = s"r -> concat('(', array_join(transform(r, $pt), ', '), ')')"
    val wkt = depth(coordsType) match {
      case 3 => expr( // Polygon: ring 0 = outer, rings 1.. = holes
        s"""concat('POLYGON (',
           |  array_join(transform(f.geometry.coordinates, $ring), ', '),
           |')')""".stripMargin)
      case 4 => expr(
        s"""concat('MULTIPOLYGON (',
           |  array_join(transform(f.geometry.coordinates,
           |    poly -> concat('(', array_join(transform(poly, $ring), ', '), ')')),
           |    ', '),
           |')')""".stripMargin)
      case d => throw new IllegalArgumentException(
        s"unsupported GeoJSON geometry nesting (depth $d: ${coordsType.sql}) " +
          "— expected a homogeneous Polygon or MultiPolygon FeatureCollection")
    }
    val propCols = exploded.select(col("f.properties.*")).columns.toSeq
    exploded.select(
      propCols.map(c => col(s"f.properties.$c").as(c)) :+ wkt.as("geometry"): _*)
  }

  /** CSV with a WKT `geometry` column (the tile-grid reader — SURVEY
    * S2; schema inferred in FIXTURES.md A3: tile_id, geometry).
    */
  def readCsvWkt(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Suffix dispatch (P10), returning a uniform (…, geometry: WKT)
    * frame for every supported format.
    */
  def readVector(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) readCsvWkt(spark, path)
    else if (lower.endsWith(".geojson") || lower.endsWith(".json"))
      readGeoJson(spark, path)
    else if (lower.endsWith(".shp")) Shapefile.read(spark, path)
    else if (lower.endsWith(".gpkg")) GeoPackage.read(spark, path)
    else throw new IllegalArgumentException(
      s"unsupported vector format: $path")
  }
}
