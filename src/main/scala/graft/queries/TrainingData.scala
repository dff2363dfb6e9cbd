package graft.queries

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data assembly operators: token-budgeted shard packing and
  * deterministic stratified sampling — the stages after curation
  * (graft.operators.CorpusPipeline) that turn a corpus into training
  * input.
  */
object TrainingData extends QueryModule {

  private val nTokS = "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)"
  private val nTokD = "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)"

  // ---------------------------------------------------------------
  // q48 — shard packing: documents stream into fixed token-budget
  // shards in deterministic doc_id order; a document's shard is the
  // budget bucket its first token lands in (running-sum window).
  // Scale: at 100 TB, pack per (partition key, e.g. lang or domain)
  // — the window then partitions by that key instead of being global;
  // the global form here is the oracle-checkable core.
  private val budget = 4000L

  private def q48(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.documents(s, dir)
      .select(col("doc_id"), expr(nTokS).as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("shard", expr(s"CAST(floor((cum - n_tok) / $budget) AS BIGINT)"))
      .select("doc_id", "n_tok", "shard")
      .orderBy("doc_id")
  }

  private val q48Sql =
    s"""SELECT doc_id, n_tok,
       |  CAST(floor((cum - n_tok) / $budget) AS BIGINT) AS shard
       |FROM (
       |  SELECT doc_id, n_tok,
       |    SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM (SELECT doc_id, $nTokD AS n_tok FROM documents))
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q49 — stratified sampling with per-language quotas, via a
  // DETERMINISTIC hash gate (md5 of the doc id — reproducible across
  // runs/engines, unlike rand()). Shuffle-free row filter + tiny agg.
  private val quota =
    "CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 ELSE 20 END"
  private def gateS =
    s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < $quota"
  private def gateD =
    s"('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < $quota"

  private def q49(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(expr(s"CASE WHEN $gateS THEN 1 ELSE 0 END")).cast("long")
          .as("n_sampled"))
      .orderBy("lang")

  private val q49Sql =
    s"""SELECT lang, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN $gateD THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_shard_pack" -> (q48 _),
    "q49_stratified_sample" -> (q49 _))

  override val oracle: Map[String, String] = Map(
    "q48_shard_pack" -> q48Sql,
    "q49_stratified_sample" -> q49Sql)
}
