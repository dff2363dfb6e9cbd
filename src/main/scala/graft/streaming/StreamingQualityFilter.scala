package graft.streaming

import graft.queries.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-time quality gate (SURVEY.md §2.11 applied to q158's
  * trained classifier): score each document of a stream under a
  * FROZEN trained model and tag it kept/dropped — the deployment
  * mode of a corpus quality filter, where training is a periodic
  * batch job and serving is a stateless per-row map at the ingest
  * edge (no state store, no shuffle; the model rides in the task
  * closure like the index model in [[StreamingIndexIngest]]).
  *
  * The coefficients and threshold arrive as plain doubles collected
  * ONCE from the batch trainer ([[TextAnalysis.qcModel]] — 4 scalars
  * of driver-side model state). Scoring binds the SAME expression
  * strings the batch scorer uses, so a document's streamed score is
  * bit-identical to its batch score — StreamingQualityFilterSpec
  * pins stream == batch for every row, under different micro-batch
  * slicings (order cannot matter: the map is per-row).
  */
object StreamingQualityFilter {

  /** Gate a (doc_id, source, text) stream: emits doc_id, source,
    * score, kept. Empty-token documents are dropped like the batch
    * feature table drops them (no score is defined for them).
    */
  def gate(docs: DataFrame, b0d: Double, b1d: Double, b2d: Double,
      thr: Double): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        expr(s"CAST(size(${TextAnalysis.toksS}) AS BIGINT)").as("n_tok"),
        expr(s"CAST(size(array_distinct(${TextAnalysis.toksS})) AS BIGINT)")
          .as("n_uniq"),
        expr(TextAnalysis.hitS(TextAnalysis.enW)).as("h_en"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("source"),
        expr(TextAnalysis.qcX1).as("x1"), expr(TextAnalysis.qcX2).as("x2"))
      .withColumn("b0d", lit(b0d))
      .withColumn("b1d", lit(b1d))
      .withColumn("b2d", lit(b2d))
      .withColumn("z", expr(TextAnalysis.qcZ))
      .withColumn("mu", expr(TextAnalysis.qcMu))
      .select(col("doc_id"), col("source"), col("mu").as("score"),
        (col("mu") >= lit(thr)).as("kept"))
}
