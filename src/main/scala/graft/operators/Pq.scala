package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-scale path for
  * similarity search. IVF ([[Ivf]]) prunes WHICH vectors a query
  * scans; PQ compresses WHAT each scanned vector costs: a d-dim
  * float vector becomes m small integer codes (one per subspace),
  * and query-time distance is m table lookups (ADC — asymmetric
  * distance computation) instead of d multiply-adds. At the 100 TB
  * design point this is the difference between "embeddings don't fit
  * anywhere" and "codes fit in a fraction of executor memory":
  * 64 float32 dims (256 B) → 4 codes (4-16 B).
  *
  * Division of labor (mirrors [[Ivf]]): the MODEL (m codebooks ×
  * k codewords × d/m dims) is driver/broadcast-sized; everything
  * touching the corpus is a single-pass DataFrame op whose per-row
  * arithmetic runs in codegen'd kernels (`vec_l2_sq` for encode,
  * `vec_pq_adc` for search — graft.functions.VecExpressions).
  * Codebooks ship as `typedlit` literals exactly like trained
  * weights.
  *
  * Determinism: encode breaks distance ties toward the LOWEST
  * codeword id (`array_position` finds the first minimum); search
  * breaks ADC ties by ascending corpus id — both total orders, so
  * results are replay- and engine-stable.
  */
object Pq {

  private def requireModel(codebooks: Seq[Seq[Seq[Double]]]): (Int, Int) = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty,
      "pq: empty codebook model")
    val subDim = codebooks.head.head.size
    require(codebooks.forall(cb => cb.forall(_.size == subDim)),
      "pq: ragged codeword dimensions")
    (codebooks.size, subDim)
  }

  /** Add the `codeCol` (ARRAY<INT>, one code per subspace) to `df`:
    * per subspace j, the id of the L2-nearest codeword to the
    * subvector dims [j·subDim, (j+1)·subDim). One scan, no shuffle.
    */
  def encode(df: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      vecCol: String = "embedding", codeCol: String = "code"): DataFrame = {
    graft.functions.VecFunctions.register(df.sparkSession)
    val (m, subDim) = requireModel(codebooks)
    var out = df
    (0 until m).foreach { j =>
      out = out
        .withColumn(s"__ps$j", expr(
          s"slice(CAST($vecCol AS ARRAY<DOUBLE>), ${j * subDim + 1}, $subDim)"))
        .withColumn(s"__pc$j", typedlit(codebooks(j)))
        // the transform iterates k codewords; the distance itself is
        // the codegen'd kernel
        .withColumn(s"__pd$j",
          expr(s"transform(__pc$j, c -> vec_l2_sq(__ps$j, c))"))
    }
    val codes = (0 until m)
      .map(j => s"CAST(array_position(__pd$j, array_min(__pd$j)) - 1 AS INT)")
    out.withColumn(codeCol, expr(s"array(${codes.mkString(", ")})"))
      .drop((0 until m).flatMap(j =>
        Seq(s"__ps$j", s"__pc$j", s"__pd$j")): _*)
  }

  /** Per-query m×k look-up tables: one `__lut` array column
    * (distance from the query's j-th subvector to every codeword of
    * codebook j), keeping `keepCols` alongside `q_id`. The shared
    * query-side half of [[adcSearch]] and [[adcSearchCells]].
    */
  private def withLuts(queries: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      vecCol: String, idCol: String, keepCols: Seq[String]): DataFrame = {
    val (m, subDim) = requireModel(codebooks)
    var q = queries
    (0 until m).foreach { j =>
      q = q
        .withColumn(s"__ps$j", expr(
          s"slice(CAST($vecCol AS ARRAY<DOUBLE>), ${j * subDim + 1}, $subDim)"))
        .withColumn(s"__pc$j", typedlit(codebooks(j)))
        .withColumn(s"__lut$j",
          expr(s"transform(__pc$j, c -> vec_l2_sq(__ps$j, c))"))
    }
    q.select(col(idCol).as("q_id") +: keepCols.map(col) :+
      expr(s"array(${(0 until m).map(j => s"__lut$j").mkString(", ")})")
        .as("__lut"): _*)
  }

  /** The shared corpus-side tail: ADC per (query, corpus code) pair,
    * optional self-exclusion, and the rank<=topK collapse (tie-break
    * by ascending corpus id; Spark turns the window into a
    * pre-shuffle WindowGroupLimit).
    */
  private def adcTopK(paired: DataFrame, codeCol: String, topK: Int,
      excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("c_id"))
    (if (excludeSelf) paired.filter(col("c_id") =!= col("q_id")) else paired)
      .withColumn("adc", expr(s"vec_pq_adc($codeCol, __lut)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "c_id", "adc")
  }

  /** Top-k ADC search: each query precomputes its m×k look-up table
    * (distance to every codeword, one small array literal's worth of
    * work), the LUTs broadcast onto the encoded corpus, and each
    * corpus row costs m lookups. The rank-1..k collapse is a window
    * over q_id that Spark turns into a pre-shuffle WindowGroupLimit.
    *
    * `corpus` must carry `codeCol` from [[encode]]; queries bring the
    * raw vector.
    *
    * `excludeSelf` (default true) drops corpus rows whose id equals
    * the query id — the right default when queries are drawn FROM the
    * corpus (self is always the trivial distance-0 neighbor). Pass
    * false for an external query set whose id namespace is unrelated
    * to the corpus: there an accidental id collision is a legitimate
    * neighbor, not "self", and must stay in the top-k.
    */
  def adcSearch(corpus: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      queries: DataFrame, topK: Int, vecCol: String = "embedding",
      idCol: String = "vec_id", codeCol: String = "code",
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.VecFunctions.register(corpus.sparkSession)
    val luts = withLuts(queries, codebooks, vecCol, idCol, Nil)
    val paired = corpus.select(col(idCol).as("c_id"), col(codeCol))
      .crossJoin(broadcast(luts)) // query set = model-sized side
    adcTopK(paired, codeCol, topK, excludeSelf)
  }

  /** Cell-pruned ADC search — the composed IVF-PQ index (FAISS's
    * IndexIVFPQ, by_residual=false form): [[Ivf]] routes each query
    * to its probed cells, and within those cells distance is m code
    * lookups against the query's LUT instead of d multiply-adds.
    * The two scale levers compose: the scan touches nProbe/k of the
    * corpus, and what it touches is codes, not vectors.
    *
    * `corpus` carries `cellCol` (from [[Ivf.assign]]) and `codeCol`
    * (from [[encode]]); `probedQueries` is [[Ivf.probeCells]]'s
    * output — (q_id, qv, cell), one row per probe. The LUT side is
    * query-batch-sized and broadcasts; the join is a cell equi-join
    * (never a cross join — the [[adcSearch]] brute shape is the
    * deliberate no-index baseline). A corpus row lives in exactly
    * one cell and probe cells are distinct per query, so no
    * (q_id, c_id) pair can duplicate.
    */
  def adcSearchCells(corpus: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
      probedQueries: DataFrame, topK: Int, idCol: String = "vec_id",
      codeCol: String = "code", cellCol: String = "cell",
      vecCol: String = "qv", excludeSelf: Boolean = true): DataFrame = {
    graft.functions.VecFunctions.register(corpus.sparkSession)
    val luts = withLuts(probedQueries, codebooks, vecCol, "q_id",
      Seq(cellCol))
    val paired = corpus
      .select(col(idCol).as("c_id"), col(cellCol), col(codeCol))
      .join(broadcast(luts), Seq(cellCol))
    adcTopK(paired, codeCol, topK, excludeSelf)
  }

  /** Per-subspace Lloyd's k-means (deterministic init: the first k
    * rows by `idCol`), delegating each subspace to [[Ivf]]'s shared
    * Lloyd loop — one implementation of init/tie-break/empty-cell
    * semantics across the coarse quantizer and the PQ codebooks.
    * m × iters passes over the (sliced) corpus; only k × subDim means
    * ever reach the driver.
    */
  def train(embeddings: DataFrame, m: Int, k: Int, iters: Int,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : Seq[Seq[Seq[Double]]] = {
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    (0 until m).map { j =>
      val sub = embeddings.select(col(idCol).as("id"), expr(
        s"slice(CAST($vecCol AS ARRAY<DOUBLE>), ${j * subDim + 1}, $subDim)")
        .as("v"))
      Ivf.lloyd(sub, k, iters, "v", "id", identity)
    }
  }
}
