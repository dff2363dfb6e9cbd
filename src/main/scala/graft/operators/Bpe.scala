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
    * table — merges apply in training order (Sennrich's tokenizer
    * semantics), each through the same window formulation training
    * used, so train-time and serve-time segmentation cannot drift.
    * No driver data beyond the model itself; new-word streams
    * segment with `steps` window passes over (w, pos, sym) rows.
    * Returns (w, n, pos, sym).
    */
  def segment(vocab: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.step).foldLeft(explodeChars(vocab).localCheckpoint()) {
      (rows, m) =>
        applyMerge(paired(rows), m.merge_left, m.merge_right)
          .localCheckpoint()
    }
}
