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
    * Polygon→WKT render runs entirely in codegen'd array lambdas.
    * Only Polygon geometries are supported (the reference's AOIs are
    * bbox polygons, `data/toulouse_bbox_wgs84.geojson:6`).
    */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val exploded = raw.select(explode(col("features")).as("f"))
    val wkt = expr(
      """concat('POLYGON ((',
        |  array_join(transform(f.geometry.coordinates[0],
        |    p -> concat(CAST(p[0] AS STRING), ' ', CAST(p[1] AS STRING))), ', '),
        |'))')""".stripMargin)
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
    else throw new IllegalArgumentException(
      s"unsupported vector format: $path (gpkg/shp need a third-party source)")
  }
}
