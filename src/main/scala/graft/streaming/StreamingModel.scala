package graft.streaming

import graft.queries.Analytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous model refresh (SURVEY.md §2.11 applied to §2.12's
  * distributed-OLS kernel): keep q141's per-language size-law model
  * CURRENT as document drops stream in, without ever retraining from
  * scratch.
  *
  * The whole trick is that OLS has mergeable sufficient statistics:
  * the Gram sums are plain decimal SUMs, so Structured Streaming's
  * incremental state update IS the trainer — each micro-batch folds
  * its partial sums into the agg state, and the Cramer solve is a
  * stateless projection on the updated state. No custom state store,
  * no `flatMapGroupsWithState`, no approximation: because the sums
  * accumulate EXACTLY (DECIMAL(38,0) — associative, commutative,
  * wrap-proof), the streaming model after any prefix of the stream is
  * bit-identical to batch-training q141 on the same rows, regardless
  * of micro-batch boundaries or arrival order (StreamingModelSpec
  * proves this for two different batchings against the batch twin).
  *
  * At 100 TB this is the "model keeps up with ingest" shape: state is
  * |langs| × 10 decimals — bytes — while the stream is unbounded.
  * Complete output mode re-emits the tiny model table per trigger,
  * which is exactly what a serving layer wants to swap in atomically.
  */
object StreamingModel {

  /** Per-language OLS over a (doc_id, lang, n_chars, text) stream.
    * Output (complete mode): lang, n_docs, b0, b1, b2, r2 — q141's
    * exact schema and values for the rows seen so far.
    */
  def olsRefresh(docs: DataFrame): DataFrame = {
    val feats = docs.select(
      col("lang"),
      expr("CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)")
        .as("y"),
      col("n_chars").as("x1"),
      expr("CAST(size(array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0))) AS BIGINT)")
        .as("x2"))
    feats
      .groupBy("lang")
      .agg(expr(Analytics.gramSums.head._2).as(Analytics.gramSums.head._1),
        Analytics.gramSums.tail.map { case (a, e) => expr(e).as(a) }: _*)
      // RAW coefficients, in lockstep with q141's batch side (round
      // 18): the shared Cramer strings over exact decimal Gram sums
      // are bit-identical everywhere, so no presentation rounding —
      // the q84/q169 midpoint class has no remaining channel here.
      .select(col("lang"), expr("CAST(n AS BIGINT)").as("n_docs"),
        expr(Analytics.olsB0).as("b0"),
        expr(Analytics.olsB1).as("b1"),
        expr(Analytics.olsB2).as("b2"),
        expr(Analytics.olsR2).as("r2"))
  }
}
