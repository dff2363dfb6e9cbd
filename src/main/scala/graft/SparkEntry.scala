package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full oracle-checked operator inventory, assembled
  * from per-family modules; `oracleSql` carries the matching DuckDB
  * SQL. Column names and value arithmetic are kept cross-engine exact
  * (see graft.QueryModule scaladoc for the rules).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    CoreRelational,
    EventsWindows,
    AdvancedJoins,
    GeoQueries,
    FunctionBreadth,
    TextAnalysis,
    TrainingData,
    Dedup,
    SimSearch,
    CorpusMaintenance,
    PipelineOps,
    Analytics,
    MultimodalQueries,
    ChatData)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's select→score→pick pipeline (SURVEY §3 E3):
    * filter → join → group-score → top-k with tie-break.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_top_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
