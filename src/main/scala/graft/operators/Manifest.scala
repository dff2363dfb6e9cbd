package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XML manifest parsing (SURVEY.md §2.1 S4, §2.5 A3, §2.4 J3,
  * §2.2 P8): the reference's `ET.parse` + tag iteration over
  * MTD_MSIL2A.xml (`/root/reference/code/imagery_store.py:109-132`),
  * re-expressed with Spark's built-in `xpath_*` functions — per-row,
  * codegen-compatible, no driver-side XML library.
  *
  * Input: a DataFrame with a `manifest_xml` string column (one
  * product manifest per row, however it was fetched).
  */
object Manifest {

  /** Band-file rows: every IMAGE_FILE entry, exploded (N4), then
    * regex-matched against the configured band×resolution patterns —
    * the reference's list-comprehension cross-match (J3/P8,
    * `code/imagery_store.py:118`). The band list is a tiny literal
    * array → the "join" is an explode over a per-row array, never a
    * shuffle.
    */
  def bandFiles(manifests: DataFrame, bands: Seq[String], resolution: Int)
      : DataFrame = {
    val bandArr = array(bands.map(lit): _*)
    manifests
      .withColumn("image_file",
        explode(expr("xpath(manifest_xml, '//IMAGE_FILE/text()')")))
      .withColumn("band", explode(bandArr))
      .filter(expr(
        s"image_file rlike concat('.*_', band, '_', '$resolution', 'm')"))
      .withColumn("jp2_path", concat(col("image_file"), lit(".jp2")))
  }

  /** Scalar metadata extraction (A3 first-value semantics):
    * cloud coverage, orbit direction, and the NODATA special value
    * (`code/imagery_store.py:126-129`).
    */
  def metadata(manifests: DataFrame): DataFrame =
    manifests
      .withColumn("cloudcoverage", expr(
        "xpath_double(manifest_xml, '//Cloud_Coverage_Assessment')"))
      .withColumn("orbitdirection", expr(
        "xpath_string(manifest_xml, '//SENSING_ORBIT_DIRECTION')"))
      .withColumn("nodata", expr(
        "xpath_int(manifest_xml, " +
          "'//Special_Values[SPECIAL_VALUE_TEXT=\"NODATA\"]/SPECIAL_VALUE_INDEX')"))
}
