package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE fixed IVF-PQ model convention used by every spec, bench
  * harness, and (via SimSearch's cached twin of [[quantizedCast]])
  * the oracle-certified query family: integer-quantized embeddings
  * double-cast for the vector kernels, centroids = the quantized
  * vectors of fixed `vec_id`s in id order, PQ codebooks = the
  * centroids sliced into m contiguous subspaces. One definition —
  * change the convention HERE (and in SimSearch's `quantS` DuckDB
  * twin) instead of across drifting copies in test/bench code.
  */
object FixedModel {

  /** round(x·1e6) integer quantization, double-cast — the Spark twin
    * of SimSearch's `quantS`/`quantD` fragments.
    */
  val quantCastExpr: String =
    """CAST(transform(embedding,
      | x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
      | AS ARRAY<DOUBLE>)""".stripMargin

  /** (vec_id, embedding: array<double>) corpus under the fixed
    * quantization.
    */
  def quantizedCast(s: SparkSession, dir: String): DataFrame =
    graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantCastExpr).as("embedding"))

  /** Centroids = quantized vectors of `ids`, ordered by vec_id (the
    * cid convention the DuckDB twins replicate with
    * `ROW_NUMBER() OVER (ORDER BY vec_id) - 1`). Model-sized collect.
    */
  def centroids(corpus: DataFrame, ids: Seq[Long]): Seq[Seq[Double]] =
    corpus.filter(col("vec_id").isin(ids.map(Long.box): _*))
      .orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Double](0).toSeq).toSeq

  /** PQ codebooks: each centroid sliced into m contiguous subspaces. */
  def codebooks(cents: Seq[Seq[Double]], m: Int): Seq[Seq[Seq[Double]]] = {
    require(cents.nonEmpty && cents.head.length % m == 0,
      s"FixedModel: dim ${cents.headOption.fold(0)(_.length)} not " +
        s"divisible into $m subspaces")
    val subDim = cents.head.length / m
    (0 until m).map(j => cents.map(v => v.slice(j * subDim, (j + 1) * subDim)))
  }
}
