package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training: the window-only relational merge application
  * must equal the textbook sequential fold (greedy left-to-right
  * non-overlapping), and the trainer must reproduce a hand-checked
  * example.
  */
class BpeSpec extends AnyFunSuite with SharedSpark {

  /** Reference semantics: one greedy left-to-right pass. */
  private def foldMerge(syms: List[String], a: String, b: String)
      : List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: foldMerge(rest, a, b)
    case x :: rest => x :: foldMerge(rest, a, b)
    case Nil => Nil
  }

  test("hand-checked example: 'aaab bab' style corpus") {
    implicit val s = spark
    import s.implicits._
    // vocab: aaab x3, ab x2, ba x1 — pairs: aa:6(w1 has 2 per word? no:
    // positions (a,a),(a,a),(a,b) per 'aaab') => aa: 2*3=6, ab: 3+2=5,
    // ba: 1. Best = aa. After merge: aaab -> [aa,a,b] (greedy), pairs:
    // (aa,a):3, (a,b):3+2=5, (b,a):1 -> best ab.
    val vocab = Seq(("aaab", 3L), ("ab", 2L), ("ba", 1L)).toDF("w", "n")
    val (merges, fin) = Bpe.train(vocab, steps = 2)
    assert(merges.map(m => (m.step, m.merge_left, m.merge_right, m.cnt)) ==
      Seq((1, "a", "a", 6L), (2, "a", "b", 5L)))
    val aaab = fin.filter(col("w") === "aaab").orderBy("pos")
      .select("sym").collect().map(_.getString(0)).toSeq
    assert(aaab == Seq("aa", "ab"))
    val ba = fin.filter(col("w") === "ba").orderBy("pos")
      .select("sym").collect().map(_.getString(0)).toSeq
    assert(ba == Seq("b", "a"))
  }

  test("property: relational merge application == sequential fold") {
    implicit val s = spark
    import s.implicits._
    // adversarial alphabet of 2 symbols so overlapping runs (aaaa...)
    // and interleavings (abab...) occur constantly; every length-<=6
    // binary word plus a seeded random batch of longer ones
    val rnd = new scala.util.Random(42)
    val exhaustive = (1 to 6).flatMap(len =>
      (0 until (1 << len)).map(bits =>
        (0 until len).map(i => if ((bits >> i & 1) == 0) "a" else "b")
          .mkString))
    val longer = Seq.fill(40)(
      Seq.fill(7 + rnd.nextInt(10))(if (rnd.nextBoolean()) "a" else "b")
        .mkString)
    val words = (exhaustive ++ longer).distinct
    val vocab = words.map(w => (w, 1L)).toDF("w", "n")
    val (merges, fin) = Bpe.train(vocab, steps = 2)
    // replay the reported merges with the reference fold
    val expected = words.map { w =>
      val after = merges.foldLeft(w.map(_.toString).toList) {
        (syms, m) => foldMerge(syms, m.merge_left, m.merge_right)
      }
      w -> after
    }.toMap
    val got = fin.select("w", "pos", "sym").orderBy("w", "pos")
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toList)
      .toMap
    assert(got == expected)

    // inference: segmenting UNSEEN words under the trained merges
    // equals the fold replay — train-time and serve-time agree
    val unseen = Seq("aabbaabb", "bbbbbbb", "abba", "a", "b")
      .filterNot(words.contains)
    val seg = Bpe.segment(unseen.map(w => (w, 1L)).toDF("w", "n"), merges)
      .select("w", "pos", "sym").orderBy("w", "pos")
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toList)
      .toMap
    unseen.foreach { w =>
      val want = merges.foldLeft(w.map(_.toString).toList) {
        (syms, m) => foldMerge(syms, m.merge_left, m.merge_right)
      }
      assert(seg(w) == want, s"segment($w)")
    }
  }

  test("batched trainer == sequential trainer: merge table (with " +
      "counts) and final symbolization, interacting AND disjoint " +
      "vocabularies, all batch widths") {
    implicit val s = spark
    import s.implicits._
    // battery 1: the adversarial 2-letter battery — top pairs overlap
    // constantly, so batches collapse toward width 1 and the
    // stop-at-first-rejection path is exercised every round
    val rnd = new scala.util.Random(7)
    val binary = ((1 to 6).flatMap(len =>
      (0 until (1 << len)).map(bits =>
        (0 until len).map(i => if ((bits >> i & 1) == 0) "a" else "b")
          .mkString)) ++ Seq.fill(30)(
      Seq.fill(5 + rnd.nextInt(8))(if (rnd.nextBoolean()) "a" else "b")
        .mkString)).distinct.map(w => (w, 1L + (w.length % 3)))
    // battery 2: disjoint letter groups with interleaved ranks — the
    // top pairs (cc, ee, gg, ...) are symbol-disjoint so batches
    // genuinely widen past 1
    val grouped = "cdefghij".toSeq.grouped(2).toSeq.zipWithIndex.flatMap {
      case (Seq(x, y), i) => Seq(
        (s"$x$x$y$y$x", 50L - i), (s"$y$x$y$x", 30L - i),
        (s"$x$y$y", 20L - i), (s"$y$y$x$x", 10L + i))
    }
    Seq("binary" -> binary, "grouped" -> grouped).foreach {
      case (tag, words) =>
        val vocab = words.toDF("w", "n")
        val steps = 8
        val (seqMerges, seqFin) = Bpe.train(vocab, steps)
        def key(df: org.apache.spark.sql.DataFrame) =
          df.select("w", "n", "pos", "sym").collect()
            .map(_.toSeq).sortBy(_.toString).toSeq
        val want = key(seqFin)
        Seq(1, 3, 32).foreach { k =>
          val (batMerges, batFin) = Bpe.trainBatched(vocab, steps, k)
          assert(batMerges == seqMerges, s"$tag batchK=$k merge table")
          assert(key(batFin) == want, s"$tag batchK=$k symbolization")
          // incremental pair-count maintenance: same contract, with a
          // tight recount period so the checksum runs mid-battery
          val (incMerges, incFin) = Bpe.trainIncremental(vocab, steps, k,
            recountEvery = 3)
          assert(incMerges == seqMerges, s"$tag incr batchK=$k merge table")
          assert(key(incFin) == want, s"$tag incr batchK=$k symbolization")
        }
    }
  }

  /** Sennrich apply-to-fixpoint reference: repeatedly merge the
    * lowest-rank pair present in the word (all occurrences, greedy
    * left-to-right) until no trained pair remains.
    */
  private def fixpointFold(w: String, merges: Seq[Bpe.Merge])
      : List[String] = {
    val rank = merges.map(m => (m.merge_left, m.merge_right) -> m.step).toMap
    var syms = w.map(_.toString).toList
    var done = false
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p))
      if (present.isEmpty) done = true
      else {
        val best = present.min
        val (a, b) = merges.find(_.step == best)
          .map(m => (m.merge_left, m.merge_right)).get
        syms = foldMerge(syms, a, b)
      }
    }
    syms
  }

  test("fixpoint inference matches Sennrich semantics, diverges from " +
      "the training-order fold exactly on imported-tokenizer merge " +
      "lists, and agrees with it on self-trained batteries") {
    implicit val s = spark
    import s.implicits._

    def segmentedMap(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "pos", "sym").collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toList)
        .toMap

    // IMPORTED merge list: (ab, c) ranked BEFORE (a, b) — impossible
    // to train (the "ab" symbol postdates its own rule) but exactly
    // what loading an external tokenizer's truncated/reordered table
    // produces. The training-order fold stops at [ab, c]; fixpoint
    // re-scans and reaches [abc].
    val imported = Seq(Bpe.Merge(1, "ab", "c", 0L), Bpe.Merge(2, "a", "b", 0L))
    val words = Seq("abc", "ababc", "cab", "abcabc", "aabbc", "c", "a")
    val vocab = words.map(w => (w, 1L)).toDF("w", "n")
    val fix = segmentedMap(Bpe.segmentFixpoint(vocab, imported))
    val once = segmentedMap(Bpe.segment(vocab, imported))
    words.foreach { w =>
      assert(fix(w) == fixpointFold(w, imported), s"fixpoint($w)")
    }
    assert(once("abc") == List("ab", "c") && fix("abc") == List("abc"))
    assert(once("abcabc") == List("ab", "c", "ab", "c") &&
      fix("abcabc") == List("abc", "abc"))

    // self-trained battery: priorities replay training evolution, so
    // fixpoint and the training-order fold agree on EVERY word —
    // trained or unseen runs/interleaves
    val trainWords = (1 to 5).flatMap(len =>
      (0 until (1 << len)).map(bits =>
        (0 until len).map(i => if ((bits >> i & 1) == 0) "a" else "b")
          .mkString)).distinct
    val (merges, trained) =
      Bpe.train(trainWords.map(w => (w, 1L)).toDF("w", "n"), steps = 4)
    val evalWords = trainWords ++ Seq("aaaaaaaa", "abababab", "bbaabb")
      .filterNot(trainWords.contains)
    val evalVocab = evalWords.map(w => (w, 1L)).toDF("w", "n")
    val fix2 = segmentedMap(Bpe.segmentFixpoint(evalVocab, merges))
    evalWords.foreach { w =>
      val want = merges.foldLeft(w.map(_.toString).toList) {
        (syms, m) => foldMerge(syms, m.merge_left, m.merge_right)
      }
      assert(fix2(w) == want, s"self-trained fixpoint($w)")
      assert(fix2(w) == fixpointFold(w, merges), s"reference fixpoint($w)")
    }

    // segmentServe(fixpointOov = true): known words keep the trained
    // pieces; OOV words get fixpoint semantics under the imported list
    val serveVocab = (trainWords.take(4).map(w => (w, 5L)) ++
      Seq(("abc", 2L))).toDF("w", "n")
    val served = Bpe.segmentServe(serveVocab, imported, trained,
      fixpointOov = true)
    val servedMap = segmentedMap(served)
    assert(servedMap("abc") == List("abc")) // fixpoint, not [ab, c]
    trainWords.take(4).foreach { w =>
      val want = segmentedMap(trained.filter(col("w") === w))(w)
      assert(servedMap(w) == want, s"served known($w)")
    }
  }

  test("serve fast path: broadcast lookup + OOV fold == sequential " +
      "fold on a mixed known/unseen battery") {
    implicit val s = spark
    import s.implicits._
    val trainWords = (1 to 5).flatMap(len =>
      (0 until (1 << len)).map(bits =>
        (0 until len).map(i => if ((bits >> i & 1) == 0) "a" else "b")
          .mkString)).distinct
    val vocab = trainWords.map(w => (w, 1L)).toDF("w", "n")
    val (merges, trained) = Bpe.train(vocab, steps = 3)

    // serve stream: every training word (lookup path, with serve-side
    // counts that differ from training's) plus unseen words including
    // longer run/interleave shapes (OOV fold path)
    val unseen = Seq("aaaaaaa", "abababab", "bbaabbaa", "aabbbbaa",
      "babababa", "c", "cab", "abc").filterNot(trainWords.contains)
    val serveVocab = (trainWords.map(w => (w, 7L)) ++
      unseen.map(w => (w, 2L))).toDF("w", "n")

    val got = Bpe.segmentServe(serveVocab, merges, trained)
      .select("w", "n", "pos", "sym").collect()
      .groupBy(_.getString(0)).view
      .mapValues(rs => (rs.head.getLong(1),
        rs.sortBy(_.getInt(2)).map(_.getString(3)).toList))
      .toMap
    (trainWords.map((_, 7L)) ++ unseen.map((_, 2L))).foreach { case (w, n) =>
      val want = merges.foldLeft(w.map(_.toString).toList) {
        (syms, m) => foldMerge(syms, m.merge_left, m.merge_right)
      }
      assert(got(w) == ((n, want)), s"segmentServe($w)")
    }
    assert(got.size == trainWords.size + unseen.size)
  }

  test("incremental trainer catches injected pair-count drift at ANY " +
      "steps value: the final-round checksum fires even on trains " +
      "shorter than recountEvery") {
    implicit val s = spark
    import s.implicits._
    val vocab = Seq(("aaab", 3L), ("ab", 2L), ("ba", 1L), ("caca", 4L))
      .toDF("w", "n")
    Seq(1, 2, 3).foreach { steps =>
      // recountEvery far above the round count: ONLY the final-round
      // checksum can catch the corruption
      val e = intercept[IllegalArgumentException] {
        Bpe.trainIncrementalImpl(vocab, steps, batchK = 1,
          recountEvery = 64,
          tamper = (round, counts) =>
            if (round == 1) counts(("zz", "zz")) = 99L)
      }
      assert(e.getMessage.contains("drifted"), s"steps=$steps")
      // and an untampered run of the same shape passes
      val (ms, _) = Bpe.trainIncrementalImpl(vocab, steps, batchK = 1,
        recountEvery = 64, tamper = (_, _) => ())
      assert(ms.size == steps)
    }
  }

  test("segmentFixpoint refuses an imported merge table with " +
      "duplicate priorities instead of duplicating word rows") {
    implicit val s = spark
    import s.implicits._
    val vocab = Seq(("abc", 1L)).toDF("w", "n")
    val dup = Seq(Bpe.Merge(1, "a", "b", 5L), Bpe.Merge(1, "b", "c", 4L))
    val e = intercept[IllegalArgumentException] {
      Bpe.segmentFixpoint(vocab, dup)
    }
    assert(e.getMessage.contains("duplicate step/rank"))
  }
}
