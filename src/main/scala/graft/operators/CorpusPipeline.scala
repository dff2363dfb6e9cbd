package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus pipeline — the "switch from the
  * reference" capstone: language filter → quality gate → exact dedup →
  * MinHash near-dup removal → token accounting, as ONE declarative
  * DataFrame program reusing the oracle-checked building blocks
  * (TextAnalysis q21–q23 features, Dedup q27/q29-style keys).
  *
  * Stage economics at 100 TB: the per-row stages (language, quality,
  * fingerprint) are shuffle-free codegen'd scans; the exact-dedup
  * stage shuffles once on the content hash; near-dup removal shuffles
  * the shingle index; every stage only narrows the data, so the
  * expensive stages see the already-filtered minority. Stage order IS
  * the optimization: cheap high-selectivity filters first.
  */
object CorpusPipeline {

  private val toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  case class Config(
      minTokens: Int = 20,
      minScore: Double = 0.4,
      langs: Set[String] = Set("en"),
      minhashBands: Int = 12,
      nearDupMinMatches: Int = 9,
      /** Drop shingles appearing in more than this many documents
        * before MinHashing — the hot-shingle (stopword 3-gram) skew
        * mitigation for the inverted-index shuffle at scale. Stopword
        * shingles carry no near-dup signal, so dropping them is also
        * a precision win. Default: no cutoff (exact r1 semantics).
        */
      maxShingleDf: Long = Long.MaxValue)

  /** Per-row features (no shuffle). */
  def withFeatures(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", expr(toks))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("h_en", expr(
        "CAST(size(regexp_extract_all(lower(text), " +
          "'\\\\b(?:the|of|and|to|is|in)\\\\b', 0)) AS BIGINT)"))
      .withColumn("score", expr(
        """0.4 * least(1.0, CAST(n_tok AS DOUBLE) / 80.0)
          | + 0.3 * (CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE))
          | + 0.3 * least(1.0, 5.0 * CAST(h_en AS DOUBLE) / CAST(n_tok AS DOUBLE))"""
          .stripMargin))
      .withColumn("fp", md5(concat_ws(" ", col("toks"))))

  /** Quality + language gate (per-row, runs first). */
  def qualityGate(featured: DataFrame, cfg: Config): DataFrame =
    featured
      .filter(col("n_tok") >= cfg.minTokens)
      .filter(col("score") >= cfg.minScore)
      .filter(col("lang").isin(cfg.langs.toSeq: _*))

  /** Exact dedup: keep the lowest doc_id per content fingerprint
    * (one shuffle on the hash).
    */
  def exactDedup(gated: DataFrame): DataFrame = {
    val keep = gated.groupBy("fp").agg(min("doc_id").as("doc_id"))
    gated.join(keep, Seq("fp", "doc_id"), "left_semi")
  }

  /** MinHash near-dup removal: among candidate pairs agreeing on ≥
    * `nearDupMinMatches` of the minhashes, drop the larger doc_id.
    * Reuses the Dedup module's signature construction shape.
    */
  def nearDedup(deduped: DataFrame, cfg: Config): DataFrame = {
    val P = 2147483647L
    val params = Seq(
      (0, 1103515245L, 12345L), (1, 1223106847L, 581869302L),
      (2, 1406932606L, 654583775L), (3, 1744325963L, 137228648L),
      (4, 1157023929L, 982906691L), (5, 1291394886L, 341565877L),
      (6, 1625362239L, 762342397L), (7, 1985763245L, 81237563L),
      (8, 1025912127L, 412385243L), (9, 1352662387L, 923118203L),
      (10, 1575655961L, 147663229L), (11, 1925115615L, 582354979L))
      .take(cfg.minhashBands)
    val shAll = deduped.select(col("doc_id"),
        explode(expr(
          """CASE WHEN size(toks) >= 3 THEN
            |  array_distinct(transform(sequence(1, size(toks) - 2),
            |    i -> concat_ws(' ', element_at(toks, i),
            |         element_at(toks, i + 1), element_at(toks, i + 2))))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("sh"))
    // hot-shingle cutoff: the few shingles above the document-
    // frequency bound (a tiny list) broadcast into an anti-join, so
    // the skewed keys never reach the signature shuffle
    val shFiltered =
      if (cfg.maxShingleDf == Long.MaxValue) shAll
      else {
        val hot = shAll.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > cfg.maxShingleDf)
          .select("sh")
        shAll.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val sh = shFiltered
      .withColumn("h",
        expr(s"CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT) % $P"))
    val aggs = params.map { case (i, a, b) =>
      min(expr(s"($a * h + $b) % $P")).as(s"m$i") }
    val stackArgs = params.map { case (i, _, _) => s"$i, m$i" }.mkString(", ")
    val sig = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .selectExpr("doc_id", s"stack(${params.size}, $stackArgs) AS (i, mh)")
    // Threshold applies PER PAIR: a pair must agree on >=
    // nearDupMinMatches of the minhashes; only then is the larger
    // doc_id dropped. (Grouping by b.doc_id alone would pool matches
    // across ALL partners and over-drop docs that match many
    // different docs on different bands.)
    val drop = sig.as("a").join(sig.as("b"),
        col("a.i") === col("b.i") && col("a.mh") === col("b.mh")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("keep_id"), col("b.doc_id").as("doc_id"))
      .agg(countDistinct(col("a.i")).as("n_match"))
      .filter(col("n_match") >= cfg.nearDupMinMatches)
      .select("doc_id")
      .distinct()
    deduped.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Full pipeline: returns the curated corpus + corpus-level stats. */
  def curate(documents: DataFrame, cfg: Config = Config()): DataFrame =
    nearDedup(exactDedup(qualityGate(withFeatures(documents), cfg)), cfg)
      .drop("toks")

  def stats(curated: DataFrame): DataFrame =
    curated.agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("total_tokens"),
      expr("CAST(SUM(CAST(score AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*)")
        .as("mean_score"))
}
