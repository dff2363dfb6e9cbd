package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-
  * construction step a training-data pipeline runs after PMI mining
  * (q98) nominates phrase candidates: iteratively find the most
  * frequent adjacent symbol pair over the (word, count) vocabulary
  * and merge it, Sennrich et al. 2016 semantics (greedy left-to-right
  * non-overlapping application within each word).
  *
  * The relational formulation: words live as (w, n, pos, sym) rows;
  * each round is
  *   1. pair counts — one `lead(sym)` window + one keyed agg, weight
  *      n (the word's corpus frequency);
  *   2. best pair — `orderBy(count desc, a, b).limit(1)`: a
  *      TakeOrderedAndProject whose single row is the ONLY thing the
  *      driver ever holds (the Lloyd-loop discipline of [[Ivf]]);
  *   3. merge application — greedy non-overlap is a per-word
  *      sequential fold, but it is exactly expressible with windows:
  *      adjacent matched positions can only occur when a == b, and
  *      within each maximal RUN of consecutive matches the kept
  *      merges are the odd (1-based) offsets. Runs group by
  *      `pos - count(matches so far)`; a row is consumed iff its
  *      predecessor kept a merge. Window-only — no self-join, no
  *      explode blowup, every window partitions by the word.
  *
  * Scale: the working set is the VOCABULARY (distinct words ×
  * symbols-per-word), not the corpus — the corpus is touched once to
  * build word counts. Each round shuffles on `w` once (all four
  * windows share the partitioning); rounds localCheckpoint to keep
  * the plan flat (the [[Components]] iteration rule). Exactness: all
  * counts are integer sums; ties on the pair count break
  * lexicographically on (a, b) — ASCII tokens, so Spark and DuckDB
  * collate identically.
  */
object Bpe {

  /** One merge: the pair, its weighted count, and the round. */
  case class Merge(step: Int, merge_left: String, merge_right: String,
    cnt: Long)

  private val wWin = Window.partitionBy("w").orderBy("pos")

  /** Initial symbolization: one row per character of each word. */
  private def explodeChars(vocab: DataFrame): DataFrame = vocab
    .select(col("w"), col("n"),
      posexplode(expr("split(w, '')")).as(Seq("pos0", "sym")))
    .withColumn("pos", col("pos0") + 1).drop("pos0")

  /** Symbol rows with the successor symbol alongside. */
  private def paired(rows: DataFrame): DataFrame =
    rows.withColumn("nsym", lead("sym", 1).over(wWin))

  /** Greedy left-to-right non-overlapping application of ONE merge
    * (see the object scaladoc for the run-parity argument).
    */
  private def applyMerge(p: DataFrame, a: String, b: String): DataFrame = p
    .withColumn("m", col("sym") === lit(a) && col("nsym") === lit(b))
    .withColumn("rk", when(col("m"), col("pos") -
      count(when(col("m"), 1))
        .over(wWin.rowsBetween(Window.unboundedPreceding, 0))))
    .withColumn("off", when(col("m"),
      row_number().over(Window.partitionBy("w", "rk").orderBy("pos"))))
    .withColumn("keep", col("m") && col("off") % 2 === 1)
    .withColumn("consumed",
      coalesce(lag("keep", 1).over(wWin), lit(false)))
    .filter(!col("consumed"))
    .select(col("w"), col("n"),
      row_number().over(wWin).as("pos"),
      when(col("keep"), concat(col("sym"), col("nsym")))
        .otherwise(col("sym")).as("sym"))

  /** Train `steps` merges over `vocab` (columns `w`, `n`). Returns
    * the merge table (driver-side, `steps` rows — model-sized) and
    * the final symbolized vocabulary (w, n, pos, sym).
    */
  def train(vocab: DataFrame, steps: Int)
      : (Seq[Merge], DataFrame) = {
    var rows = explodeChars(vocab).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val p = paired(rows)
      // headOption, not (0): a vocabulary of single-symbol words has
      // no adjacent pair left — stop with the merges found so far
      // rather than crash on an empty collect
      p.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("sym"), col("nsym"))
        .limit(1).collect().headOption match {
        case None => exhausted = true
        case Some(bestRow) =>
          val (a, b) = (bestRow.getString(0), bestRow.getString(1))
          rows = applyMerge(p, a, b).localCheckpoint()
          merges += Merge(step, a, b, bestRow.getLong(2))
          step += 1
      }
    }
    (merges.result(), rows)
  }

  /** INFERENCE: segment new words under an already-trained merge
    * table — merges apply in training order, ONCE each, through the
    * same window formulation training used, so serve-time
    * segmentation is exactly THIS trainer's semantics (BpeSpec pins
    * the fold equivalence) and train/serve cannot drift within this
    * engine. Note the deliberate scope: standard BPE inference
    * (re-scan the merge list to fixpoint) can differ on unseen words
    * where a later merge recreates a symbol an earlier merge pairs
    * with (e.g. "aba" via (a,ba) vs (ab,a)) — the single ordered
    * pass is the contract here, not a claim of reference-tokenizer
    * equivalence. No driver data beyond the model itself; new-word
    * streams segment with `steps` window passes over (w, pos, sym)
    * rows. Returns (w, n, pos, sym).
    */
  def segment(vocab: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.step).foldLeft(explodeChars(vocab).localCheckpoint()) {
      (rows, m) =>
        applyMerge(paired(rows), m.merge_left, m.merge_right)
          .localCheckpoint()
    }

  /** SERVE-time fast path: [[segment]] is linear in merge count (one
    * window pass per merge — fine for training's vocabulary-bound
    * loop, wrong for segmenting a stream under a production 32k-merge
    * model). But the trained model already CONTAINS the fold's output
    * for every training word — the symbolized vocabulary IS
    * word→pieces — so known words are answered by ONE broadcast
    * equi-join against it (the lookup is model-sized: it ships with
    * the merge table), and only out-of-vocabulary words pay the
    * per-merge fold. Equivalence is structural for known words (the
    * lookup rows are definitionally the fold applied to those words)
    * and BpeSpec proves lookup + OOV-fold == sequential fold over its
    * exhaustive battery. Returns (w, n, pos, sym) with `n` taken from
    * the SERVE vocab (the model's training counts do not leak out).
    */
  def segmentServe(vocab: DataFrame, merges: Seq[Merge],
      trained: DataFrame): DataFrame = {
    val pieces = trained.select(col("w"), col("pos"), col("sym"))
    val known = vocab.join(broadcast(pieces), Seq("w"))
      .select(col("w"), col("n"), col("pos"), col("sym"))
    val oov = vocab.join(broadcast(pieces.select("w").distinct()),
      Seq("w"), "left_anti")
    known.unionByName(segment(oov, merges))
  }
}
