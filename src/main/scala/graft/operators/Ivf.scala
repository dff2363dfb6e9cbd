package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor index — the scale
  * path for similarity search (q26 models the cell with a precomputed
  * label; this trains the real coarse quantizer).
  *
  * Design for 100 TB: the MODEL (k centroids × d dims) is tiny and
  * lives on the driver / in broadcast literals; everything that
  * touches the corpus is a distributed single-pass DataFrame op built
  * from codegen'd array lambdas (zip_with/aggregate/transform — no
  * UDFs). Training assignment is one scan per Lloyd iteration;
  * centroid update is a (cell, dim)-keyed avg — k·d tiny groups.
  * Search probes nProbe cells: on a corpus PARTITIONED BY cell this
  * prunes the scan to nProbe/k of the data before any arithmetic.
  */
object Ivf {

  /** Squared-L2 distances from `vecCol` to each centroid, as an array
    * column expression. The per-dimension arithmetic runs in the
    * codegen'd `vec_l2_sq` kernel (graft.functions.VecExpressions) —
    * the outer transform only iterates the k centroids.
    */
  private def distsExpr(vecCol: String): String =
    s"transform(__cents, c -> vec_l2_sq(CAST($vecCol AS ARRAY<DOUBLE>), c))"

  private def withCentroids(df: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    graft.functions.VecFunctions.register(df.sparkSession)
    df.withColumn("__cents", typedlit(cents))
  }

  /** Nearest-centroid cell id for every row (0-based). */
  def assign(df: DataFrame, cents: Seq[Seq[Double]], vecCol: String): DataFrame =
    withCentroids(df, cents)
      .withColumn("__d", expr(distsExpr(vecCol)))
      .withColumn("cell",
        expr("CAST(array_position(__d, array_min(__d)) - 1 AS INT)"))
      .drop("__cents", "__d")

  /** Lloyd's k-means: deterministic init (first k rows by `idCol`),
    * distributed assignment + per-(cell,dim) mean, `iters` rounds.
    * Returns the k centroids (driver-side model). Works on any
    * numeric array column (float or double).
    */
  def train(spark: SparkSession, embeddings: DataFrame, k: Int, iters: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): Seq[Seq[Double]] =
    lloyd(embeddings, k, iters, vecCol, idCol, identity)

  /** Shared Lloyd loop: `roundMean` post-processes every updated
    * centroid component (identity for [[train]], lattice rounding for
    * [[trainLattice]]) — ONE loop so init, tie-break, and empty-cell
    * semantics cannot diverge between the two trainers.
    */
  private[operators] def lloyd(embeddings: DataFrame, k: Int, iters: Int,
      vecCol: String, idCol: String, roundMean: Double => Double)
      : Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = embeddings.orderBy(idCol).limit(k)
      .select(vecCol).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue).toSeq).toSeq
    (1 to iters).foreach { _ =>
      val means = assign(embeddings, cents, vecCol)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(rows => rows.sortBy(_.getInt(1))
          .map(r => roundMean(r.getDouble(2))).toSeq)
        .toMap
      // empty cells keep their previous centroid
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** [[train]] with centroids rounded to the INTEGER LATTICE after
    * every mean update (floor(m + 0.5) — one fixed rule, applied to
    * identical doubles everywhere). With integer-valued inputs this
    * makes the whole Lloyd loop REPRODUCIBLE: every distance and
    * every mean numerator is a sum of integer-valued float64 terms
    * below 2^53 — exact in ANY accumulation order — so two runs on
    * different partitionings/cluster topologies (or a re-train months
    * later) produce a bit-identical model, where float means drift by
    * summation order and cascade into different assignments next
    * round. Accuracy cost ≤ 0.5 per dimension — noise against
    * quantized-embedding components (~1e6 quanta). Inputs must be
    * integer-valued (e.g. the 1e6-quantized corpus); the oracle-gated
    * q94 certifies this loop against an engine-independent twin.
    */
  def trainLattice(spark: SparkSession, embeddings: DataFrame, k: Int,
      iters: Int, vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[Seq[Double]] =
    lloyd(embeddings, k, iters, vecCol, idCol, m => math.floor(m + 0.5))

  /** The query-side probe selection shared by [[search]] and the
    * composed IVF-PQ path (q103): per query the `nProbe` nearest
    * centroid cells (distance then cid tie-break), one output row
    * per (query, probed cell) with the raw vector carried along.
    */
  def probeCells(queries: DataFrame, cents: Seq[Seq[Double]], nProbe: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    withCentroids(queries, cents)
      .withColumn("__d", expr(distsExpr(vecCol)))
      .withColumn("probe", explode(expr(
        s"""transform(slice(array_sort(zip_with(__d, sequence(0, size(__d) - 1),
           |  (d, i) -> struct(d AS d, i AS i))), 1, $nProbe), s -> s.i)""".stripMargin)))
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        col("probe").cast("int").as("cell"))

  /** The OPERATING-CURVE form of [[probeCells]]: every (query, cell)
    * pair with the cell's distance RANK for that query (1 = nearest;
    * distance then cid tie-break — the same lexicographic struct sort
    * as [[probeCells]], so `crank <= nProbe` reproduces its probe set
    * exactly). One row per query per cell (k·|Q| rows — model-sized),
    * so a sweep over nProbe values is a filter on ONE table instead
    * of one probe run per setting — the shape a recall-vs-nProbe
    * tuning audit (q136) wants.
    */
  def probeCellsRanked(queries: DataFrame, cents: Seq[Seq[Double]],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    withCentroids(queries, cents)
      .withColumn("__d", expr(distsExpr(vecCol)))
      .withColumn("pr", explode(expr(
        """zip_with(array_sort(zip_with(__d, sequence(0, size(__d) - 1),
          |  (d, i) -> struct(d AS d, i AS i))), sequence(1, size(__d)),
          |  (s, r) -> struct(s.i AS cell, r AS crank))""".stripMargin)))
      .select(col(idCol).as("q_id"), col("pr.cell").cast("int").as("cell"),
        col("pr.crank").cast("int").as("crank"))

  /** Top-k cosine search probing the `nProbe` nearest cells per query.
    * `corpus` must carry the `cell` column from [[assign]]; queries
    * are assigned their probe cells ([[probeCells]]) and broadcast.
    */
  def search(spark: SparkSession, corpus: DataFrame, cents: Seq[Seq[Double]],
      queries: DataFrame, topK: Int, nProbe: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val probed = probeCells(queries, cents, nProbe, vecCol, idCol)
    val dot = "vec_dot_d(CAST(qv AS ARRAY<DOUBLE>), CAST(cv AS ARRAY<DOUBLE>))"
    def norm(c: String) =
      s"sqrt(vec_dot_d(CAST($c AS ARRAY<DOUBLE>), CAST($c AS ARRAY<DOUBLE>)))"
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col("cell"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", expr(s"$dot / (${norm("qv")} * ${norm("cv")})"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "c_id", "cosine")
  }
}
