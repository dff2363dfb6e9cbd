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
        }
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
}
