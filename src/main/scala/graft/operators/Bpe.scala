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
  private def applyMerge(p: DataFrame, a: String, b: String): DataFrame =
    applyMerges(p, Seq((a, b)))

  /** Apply SEVERAL pairwise symbol-disjoint merges in one window
    * pass. Disjointness (no symbol of one pair equals a symbol — or
    * the merged output — of another) means matches of DIFFERENT
    * pairs can never be adjacent: adjacency of a match ending at
    * `pos+1` and one starting at `pos+1` forces `b_i == a_j`, which
    * disjointness forbids. So every run of consecutive matched
    * positions belongs to ONE pair and the single-merge run-parity
    * argument applies verbatim to the OR'd match predicate.
    */
  private def applyMerges(p: DataFrame, pairs: Seq[(String, String)])
      : DataFrame = applyMergesTagged(p, pairs).drop("chg")

  /** [[applyMerges]] plus a per-word `chg` flag (1 iff any merge
    * matched in the word) — computed by one unordered whole-partition
    * window on the same `w` partitioning (no extra exchange), so the
    * incremental trainer can read off WHICH words changed from the
    * same pass that changed them.
    */
  private def applyMergesTagged(p: DataFrame, pairs: Seq[(String, String)])
      : DataFrame = p
    .withColumn("m", pairs.map { case (a, b) =>
      col("sym") === lit(a) && col("nsym") === lit(b)
    }.reduce(_ || _))
    .withColumn("chg",
      max(when(col("m"), 1).otherwise(0)).over(Window.partitionBy("w")))
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
        .otherwise(col("sym")).as("sym"),
      col("chg"))

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

  /** [[train]] with per-round MERGE BATCHING — identical output
    * (merge table INCLUDING counts, and final symbolization), fewer
    * driver round-trips. At realistic merge counts (a production
    * tokenizer is 32k merges) the sequential loop's cost is dominated
    * by per-round fixed job latency, not data (BpeScaleBench), so the
    * scale lever is merges-per-round.
    *
    * Exactness argument — each round commits a PREFIX of what the
    * sequential trainer would do. Candidates are walked in the
    * sequential order (cnt DESC, a, b) and accepted while BOTH:
    *
    *   1. symbol-disjoint from every already-accepted pair's {a, b,
    *      a+b}: applying earlier accepted merges then neither
    *      creates, destroys, nor recounts this pair's adjacencies
    *      (and no cross-pair match adjacency exists — see
    *      [[applyMerges]]);
    *   2. cnt strictly exceeds every already-accepted pair's
    *      NEW-PAIR BOUND — the max weight of any single triple
    *      (x, a_i, b_i) or (a_i, b_i, y), which upper-bounds the
    *      count of any pair the i-th merge can CREATE ((x, a_i b_i)
    *      needs an x-then-merged-occurrence adjacency, one per such
    *      triple at most). Pairs merges DESTROY or shrink can only
    *      rank lower than they did. So at each accepted position the
    *      sequential trainer's argmax is exactly this candidate —
    *      unchanged count, nothing new or changed can beat it
    *      (strictness beats ties regardless of lexicographic order).
    *
    * The first rejection STOPS the batch (a rejected candidate's
    * post-merge count is unknown — it must be recounted next round).
    * Worst case every batch has size 1 and this IS [[train]] with
    * one extra bounded aggregate per round; BpeSpec proves equality
    * on adversarial interleaved batteries and on disjoint-alphabet
    * vocabularies where batches actually widen.
    */
  def trainBatched(vocab: DataFrame, steps: Int, batchK: Int = 32)
      : (Seq[Merge], DataFrame) = {
    var rows = explodeChars(vocab).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var done = 0
    var exhausted = false
    while (done < steps && !exhausted) {
      val p = paired(rows)
      val cands = p.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("sym"), col("nsym"))
        .limit(math.min(batchK, steps - done)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        // new-pair bounds for the candidate set: one bounded
        // aggregate over the triple view, returned per candidate
        val s = p.sparkSession
        import s.implicits._
        val candDf = broadcast(
          cands.toSeq.map { case (a, b, _) => (a, b) }.toDF("ca", "cb"))
        val t = p.withColumn("nnsym", lead("sym", 2).over(wWin))
          .filter(col("nnsym").isNotNull)
          .groupBy("sym", "nsym", "nnsym").agg(sum("n").as("tc"))
        val bounds = t.join(candDf,
            (col("sym") === col("ca") && col("nsym") === col("cb")) ||
              (col("nsym") === col("ca") && col("nnsym") === col("cb")))
          .groupBy("ca", "cb").agg(max("tc").as("bound"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        val accepted = Seq.newBuilder[(String, String, Long)]
        var used = Set.empty[String]
        var maxBound = -1L
        var stop = false
        var nAcc = 0
        cands.foreach { case (a, b, cnt) =>
          if (!stop) {
            val syms = Set(a, b, a + b)
            val ok = nAcc == 0 ||
              (syms.intersect(used).isEmpty && cnt > maxBound)
            if (ok) {
              accepted += ((a, b, cnt))
              used ++= syms
              maxBound = math.max(maxBound,
                bounds.getOrElse((a, b), -1L))
              nAcc += 1
            } else stop = true
          }
        }
        val batch = accepted.result()
        rows = applyMerges(p, batch.map { case (a, b, _) => (a, b) })
          .localCheckpoint()
        batch.foreach { case (a, b, cnt) =>
          done += 1
          merges += Merge(done, a, b, cnt)
        }
      }
    }
    (merges.result(), rows)
  }

  /** [[trainBatched]] with INCREMENTAL PAIR-COUNT MAINTENANCE —
    * identical output (merge table INCLUDING counts, and final
    * symbolization), with the per-round FULL pair recount eliminated.
    * The classic BPE-trainer observation: a merge of (a, b) only
    * changes pair counts in words CONTAINING the pair, so the count
    * table should be updated from those words' neighborhoods, not
    * recounted from the vocabulary.
    *
    * State and why it is model-sized:
    *
    *   - the symbol rows stay DISTRIBUTED, kept in PAIRED form
    *     (w, n, pos, sym, nsym) and checkpointed each round, so
    *     "which words contain pair (a, b)" is a codegen'd filter,
    *     never a window pass;
    *   - the pair-count table lives on the DRIVER: its size is
    *     bounded by the distinct ADJACENT symbol pairs of the
    *     vocabulary — at most |alphabet|² + O(steps · distinct
    *     neighbors) (each merge mints ONE new symbol, and only pairs
    *     touching it can appear), the same "model state on the
    *     driver" discipline as [[Ivf]]'s centroids. It is exactly
    *     the table the sequential trainer's TopK scans, so the
    *     argmax walk costs no Spark job at all.
    *
    * Per round, exactly TWO actions (vs [[trainBatched]]'s three
    * FULL-TABLE passes — TopK pair count, triple bounds, apply):
    *
    *   1. APPLY: one window pass over the full table (the same pass
    *      [[trainBatched]] runs) applies the batch, emits a per-word
    *      changed flag ([[applyMergesTagged]]), re-pairs, and
    *      checkpoints the new state.
    *   2. DELTA: one signed aggregate — changed words' old pairs at
    *      −n, new pairs at +n — collected and folded into the driver
    *      table. Bounded by the distinct pairs of the changed words.
    *
    * The batch-acceptance bound ALSO comes from the driver table, so
    * [[trainBatched]]'s triple-count action disappears: a merge of
    * (a, b) can only CREATE pairs (x, ab) — each instance of which
    * arises from a pre-existing (x, a) adjacency — and (ab, y), from
    * a pre-existing (b, y) adjacency (including merge-meets-merge
    * sites: (ab, cd) arises from (b, c)). So
    * max(maxₓ cnt(x, a), max_y cnt(b, y)) upper-bounds every pair
    * the merge can create. This PAIR-derived bound is weaker than
    * the triple-derived one (cnt(x, a) ≥ any triple count through
    * it), so batches may end earlier than [[trainBatched]]'s — but
    * soundness is all the prefix proof needs, and the bound is free.
    *
    * Every `recountEvery` rounds a full recount cross-checks the
    * maintained table and throws on drift (the checksum) — and ONE
    * final recount always runs after the last accepted batch, so
    * EVERY train ends checksummed regardless of `steps` vs
    * `recountEvery` (a 3-step train under the default 64 would
    * otherwise never be cross-checked).
    *
    * Exactness: the candidate order, the acceptance walk
    * (symbol-disjointness + strict new-pair bound), and the
    * application are [[trainBatched]]'s verbatim; only WHERE counts
    * and bounds come from changes, both bounds are sound, and the
    * checksum + BpeSpec's batteries pin that the maintained table
    * never diverges.
    */
  def trainIncremental(vocab: DataFrame, steps: Int, batchK: Int = 32,
      recountEvery: Int = 64): (Seq[Merge], DataFrame) =
    trainIncrementalImpl(vocab, steps, batchK, recountEvery, (_, _) => ())

  /** [[trainIncremental]] with a TEST SEAM: `tamper(round, counts)`
    * runs after each round's delta fold with mutable access to the
    * maintained pair-count table, so BpeSpec can inject drift and
    * prove the checksum catches corruption at ANY steps value
    * (including trains shorter than `recountEvery`, which only the
    * final recount covers).
    */
  private[graft] def trainIncrementalImpl(vocab: DataFrame, steps: Int,
      batchK: Int, recountEvery: Int,
      tamper: (Int, scala.collection.mutable.Map[(String, String), Long]) => Unit)
      : (Seq[Merge], DataFrame) = {
    val s = vocab.sparkSession
    import s.implicits._
    var rows = paired(explodeChars(vocab)).localCheckpoint()
    def recount(): Map[(String, String), Long] =
      rows.filter(col("nsym").isNotNull)
        .groupBy("sym", "nsym").agg(sum("n").as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    counts ++= recount()
    val merges = Seq.newBuilder[Merge]
    var done = 0
    var sinceRecount = 0
    while (done < steps && counts.nonEmpty) {
      val cands = counts.toSeq
        .map { case ((a, b), c) => (a, b, c) }
        .sortBy { case (a, b, c) => (-c, a, b) }
        .take(math.min(batchK, steps - done))
      // pair-derived new-pair bounds, straight from the driver table:
      // max count of any pair ENDING in a (covers created (x, ab))
      // and any pair STARTING with b (covers created (ab, y))
      val (maxEnd, maxStart) = {
        val e = scala.collection.mutable.HashMap.empty[String, Long]
        val st = scala.collection.mutable.HashMap.empty[String, Long]
        counts.foreach { case ((x, y), c) =>
          if (c > e.getOrElse(y, -1L)) e(y) = c
          if (c > st.getOrElse(x, -1L)) st(x) = c
        }
        (e, st)
      }
      // trainBatched's acceptance walk, with the driver-side bound
      val accepted = Seq.newBuilder[(String, String, Long)]
      var used = Set.empty[String]
      var maxBound = -1L
      var stop = false
      var nAcc = 0
      cands.foreach { case (a, b, cnt) =>
        if (!stop) {
          val syms = Set(a, b, a + b)
          val ok = nAcc == 0 ||
            (syms.intersect(used).isEmpty && cnt > maxBound)
          if (ok) {
            accepted += ((a, b, cnt))
            used ++= syms
            maxBound = math.max(maxBound, math.max(
              maxEnd.getOrElse(a, -1L), maxStart.getOrElse(b, -1L)))
            nAcc += 1
          } else stop = true
        }
      }
      val batch = accepted.result()
      // ONE full window pass: apply the batch, tag changed words,
      // re-pair — the new checkpointed state (flat plan every round,
      // the [[Components]] iteration rule)
      val prev = rows
      rows = paired(applyMergesTagged(prev,
        batch.map { case (a, b, _) => (a, b) })).localCheckpoint()
      // signed delta over the changed words only: old pairs at −n,
      // new pairs at +n; everything untouched cancels by absence
      val changedW = broadcast(
        rows.filter(col("chg") === 1).select("w").distinct())
      prev.join(changedW, Seq("w"), "left_semi")
        .filter(col("nsym").isNotNull)
        .select(col("sym"), col("nsym"), (-col("n")).as("sn"))
        .unionByName(rows.filter(col("chg") === 1)
          .filter(col("nsym").isNotNull)
          .select(col("sym"), col("nsym"), col("n").as("sn")))
        .groupBy("sym", "nsym").agg(sum("sn").as("d"))
        .filter(col("d") =!= 0L)
        .collect()
        .foreach { r =>
          val key = (r.getString(0), r.getString(1))
          val v = counts.getOrElse(key, 0L) + r.getLong(2)
          require(v >= 0L,
            s"trainIncremental: pair count for $key went negative ($v)")
          if (v == 0L) counts.remove(key) else counts(key) = v
        }
      batch.foreach { case (a, b, cnt) =>
        done += 1
        merges += Merge(done, a, b, cnt)
      }
      tamper(done, counts)
      sinceRecount += 1
      val lastRound = done >= steps || counts.isEmpty
      // periodic checksum, plus ALWAYS one after the final accepted
      // batch: every train ends cross-checked, whatever steps is
      if (sinceRecount >= recountEvery || (lastRound && sinceRecount > 0)) {
        val fresh = recount()
        require(fresh == counts.toMap,
          "trainIncremental: maintained pair counts drifted from the " +
            s"full recount (${(fresh.toSet diff counts.toSet).take(3)} vs " +
            s"${(counts.toSet diff fresh.toSet).take(3)})")
        sinceRecount = 0
      }
    }
    (merges.result(), rows.select("w", "n", "pos", "sym"))
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

  /** [[applyMerges]] with a PER-WORD pair carried in columns
    * (`wa`, `wb`) instead of literals: within one word every match is
    * the same pair, so the single-merge run-parity argument applies
    * verbatim. Words whose pair columns are null (no applicable
    * merge) pass through untouched.
    */
  private def applyPerWordMerge(p: DataFrame): DataFrame = p
    .withColumn("m", coalesce(
      col("sym") === col("wa") && col("nsym") === col("wb"), lit(false)))
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

  /** STANDARD-BPE inference (Sennrich et al.'s `apply_bpe`): re-scan
    * the merge list to FIXPOINT — each pass finds, per word, the
    * highest-priority (earliest-trained) pair still present and
    * merges all its occurrences greedily left-to-right, until no
    * trained pair remains anywhere. This differs from [[segment]]
    * (each merge applied ONCE in training order) exactly when a
    * later merge recreates an adjacency an earlier merge pairs on —
    * impossible for a merge list trained by THIS engine on the word
    * in question (priorities replay training evolution; BpeSpec pins
    * segment == segmentFixpoint on trained batteries) but reachable
    * with an IMPORTED tokenizer, e.g. merges [(ab,c), (a,b)] on
    * "abc": segment stops at [ab, c] (the (ab,c) rule ran before
    * "ab" existed), fixpoint reaches [abc]. Use this entry point
    * when the merge table comes from an external trainer and
    * reference-tokenizer equivalence matters.
    *
    * Plan: one model-sized broadcast of the rank table; per pass, a
    * per-word argmin join picks each word's pair and ONE window pass
    * applies every word's own merge simultaneously ([[applyPerWordMerge]]
    * — within a word all matches are the same pair, so run parity
    * holds). Passes are bounded by the longest word's merge count;
    * every word makes progress each pass, so the serve cost is
    * O(max pieces) window passes over the OOV stream, independent of
    * merge-table size — the fixpoint twin of [[segmentServe]]'s
    * OOV fold.
    */
  def segmentFixpoint(vocab: DataFrame, merges: Seq[Merge]): DataFrame = {
    val s = vocab.sparkSession
    import s.implicits._
    // an IMPORTED merge table (this entry point's stated use case)
    // with duplicate step/rank values would make the wrank==mrank
    // join below return several pairs per word and duplicate word
    // rows — refuse loudly at entry instead
    require(merges.map(_.step).distinct.size == merges.size,
      "segmentFixpoint: duplicate step/rank values in the merge table " +
        s"(${merges.groupBy(_.step).filter(_._2.size > 1).keys.take(3)
          .mkString(", ")} ...) — priorities must be unique; dedupe or " +
        "reassign ranks before segmenting")
    var rows = paired(explodeChars(vocab)).localCheckpoint()
    if (merges.isEmpty) return rows.select("w", "n", "pos", "sym")
    val ranks = broadcast(merges
      .map(m => (m.merge_left, m.merge_right, m.step)).toDF("ma", "mb", "mrank"))
    var active = true
    var pass = 0
    while (active) {
      pass += 1
      require(pass <= 100000, "segmentFixpoint: did not converge " +
        "(cyclic merge application cannot happen — plan bug)")
      // per word: the highest-priority (min rank) pair still present
      val best = rows
        .join(ranks, col("sym") === col("ma") && col("nsym") === col("mb"))
        .groupBy("w").agg(min("mrank").as("wrank"))
        .join(ranks, col("wrank") === col("mrank"))
        .select(col("w"), col("ma").as("wa"), col("mb").as("wb"))
        .localCheckpoint()
      if (best.isEmpty) active = false
      else rows = paired(applyPerWordMerge(
        rows.join(broadcast(best), Seq("w"), "left"))).localCheckpoint()
    }
    rows.select("w", "n", "pos", "sym")
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
    *
    * `fixpointOov = true` routes the OOV words through
    * [[segmentFixpoint]] (Sennrich apply-to-fixpoint) instead of the
    * training-order fold — the right setting when the merge table was
    * imported from an external trainer; known words are unaffected
    * (their pieces ARE the trained symbolization either way).
    */
  def segmentServe(vocab: DataFrame, merges: Seq[Merge],
      trained: DataFrame, fixpointOov: Boolean = false): DataFrame = {
    val pieces = trained.select(col("w"), col("pos"), col("sym"))
    val known = vocab.join(broadcast(pieces), Seq("w"))
      .select(col("w"), col("n"), col("pos"), col("sym"))
    val oov = vocab.join(broadcast(pieces.select("w").distinct()),
      Seq("w"), "left_anti")
    known.unionByName(
      if (fixpointOov) segmentFixpoint(oov, merges)
      else segment(oov, merges))
  }
}
