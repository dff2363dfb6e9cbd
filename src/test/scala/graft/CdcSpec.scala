package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes content-defined chunking (q144's device)
  * the right sub-document dedup at scale: boundaries depend only on a
  * trailing 4-token window of CONTENT, so an edit re-synchronizes
  * within 4 tokens and the untouched remainder chunks — and
  * fingerprints — identically. A fixed-grid splitter (every k tokens
  * by position) loses every chunk after an insertion.
  */
class CdcSpec extends AnyFunSuite with SharedSpark {

  private def tokDf(docs: Map[Long, Seq[String]]) = {
    import spark.implicits._
    docs.toSeq.flatMap { case (id, ts) =>
      ts.zipWithIndex.map { case (t, i) => (id, i, t) }
    }.toDF("doc_id", "pos", "t")
  }

  private def chunks(docs: Map[Long, Seq[String]]): Map[Long, Seq[(String, Long)]] =
    graft.queries.Dedup.cdcChunks(tokDf(docs), Seq.empty)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("fp"), r.getAs[Long]("n_tok"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  private val rng = new scala.util.Random(41)
  private val base: Seq[String] =
    Seq.fill(400)("w" + rng.nextInt(500)) // realistic vocab reuse

  test("chunking is deterministic and partitions the document") {
    val a = chunks(Map(1L -> base))(1L)
    val b = chunks(Map(1L -> base))(1L)
    assert(a.sorted == b.sorted)
    assert(a.map(_._2).sum == base.size.toLong)
  }

  test("an insertion near the front re-synchronizes: the tail's chunks " +
      "survive byte-identically") {
    val edited = base.take(5) ++ Seq("inserted", "tokens", "here") ++ base.drop(5)
    val got = chunks(Map(1L -> base, 2L -> edited))
    val fpA = got(1L).map(_._1)
    val fpB = got(2L).map(_._1).toSet
    // every chunk of the original except the few spanning the edit
    // point must reappear in the edited doc (boundaries recompute
    // from content, so only chunks overlapping the edit + the <=4
    // token re-sync span can change)
    val lost = fpA.filterNot(fpB)
    assert(lost.size <= 3,
      s"${lost.size} of ${fpA.size} chunks lost after a front insertion")
    // and the shared chunks carry nearly all of the token mass
    val shared = got(1L).filter(c => fpB(c._1)).map(_._2).sum
    assert(shared >= (base.size * 0.85).toLong,
      s"only $shared of ${base.size} tokens in surviving chunks")
    // the contrast: a fixed 16-token grid loses every block at or
    // after the edit (offsets shift by 3)
    val gridA = base.grouped(16).map(_.mkString(" ")).toSet
    val gridB = edited.grouped(16).map(_.mkString(" ")).toSet
    assert((gridA -- gridB).size > fpA.size / 2,
      "fixed grid unexpectedly robust — contrast assertion broken")
  }

  test("the per-row array chunker (production) and the explode+window " +
      "chunker (reference) are row-identical on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
    val tok = docs.select(col("doc_id"), col("source"),
      posexplode(col("toks")).as(Seq("pos", "t")))
    val ref = graft.queries.Dedup.cdcChunks(tok, Seq("source"))
      .select("doc_id", "source", "chunk", "n_tok", "fp")
      .collect().map(_.toString).sorted.toSeq
    val prod = graft.queries.Dedup.cdcChunksArr(docs, Seq("source"))
      .select("doc_id", "source", "chunk", "n_tok", "fp")
      .collect().map(_.toString).sorted.toSeq
    assert(prod.nonEmpty && prod == ref)
  }

  test("property: kernel == window reference on randomized token " +
      "streams (ragged lengths, repeats, empty-adjacent docs)") {
    // randomized cross-check of the native kernel against the
    // independent explode+window formulation — 30 corpora of mixed
    // shapes: tiny docs, single-token docs, heavy repetition (forces
    // adjacent identical windows), long docs
    val r = new scala.util.Random(97)
    (1 to 30).foreach { round =>
      val docs = (1L to (1 + r.nextInt(6)).toLong).map { id =>
        val n = r.nextInt(4) match {
          case 0 => 1 + r.nextInt(3)
          case 1 => 1 + r.nextInt(40)
          case _ => 1 + r.nextInt(300)
        }
        val vocab = 1 + r.nextInt(8) // tiny vocab => repeats/collisions
        id -> Seq.fill(n)("v" + r.nextInt(vocab))
      }.toMap
      import spark.implicits._
      val docsDf = docs.toSeq.map { case (id, ts) => (id, ts) }
        .toDF("doc_id", "toks")
      val tok = docsDf.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "t")))
      val ref = graft.queries.Dedup.cdcChunks(tok, Seq.empty)
        .select("doc_id", "chunk", "n_tok", "fp")
        .collect().map(_.toString).sorted.toSeq
      val prod = graft.queries.Dedup.cdcChunksArr(docsDf, Seq.empty)
        .select("doc_id", "chunk", "n_tok", "fp")
        .collect().map(_.toString).sorted.toSeq
      assert(prod == ref, s"round $round diverged on ${docs.size} docs")
    }
  }

  test("length clamps: no short chunks except doc tails, hard max, " +
      "re-sync survives, unclamped call unchanged") {
    graft.functions.CdcFunctions.register(spark)
    import spark.implicits._
    def clamped(docs: Map[Long, Seq[String]], mn: Int, mx: Int) =
      docs.toSeq.map { case (id, ts) => (id, ts) }.toDF("doc_id", "toks")
        .selectExpr("doc_id", s"explode(cdc_chunks(toks, $mn, $mx)) AS c")
        .select(col("doc_id"), col("c.chunk"), col("c.n_tok"), col("c.fp"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val rows = clamped(Map(1L -> base), 8, 24)
    // every chunk within [8, 24] except possibly the document tail
    val byChunk = rows.sortBy(_._2)
    byChunk.dropRight(1).foreach { case (_, c, n, _) =>
      assert(n >= 8 && n <= 24, s"chunk $c length $n violates clamps")
    }
    assert(byChunk.last._3 <= 24)
    assert(rows.map(_._3).sum == base.size.toLong) // still a partition
    // re-sync: a front insertion still leaves most tail chunks intact
    val edited = base.take(5) ++ Seq("ins", "erted") ++ base.drop(5)
    val a = clamped(Map(1L -> base), 8, 24).map(_._4)
    val b = clamped(Map(2L -> edited), 8, 24).map(_._4).toSet
    val lost = a.filterNot(b)
    assert(lost.size <= a.size / 2,
      s"clamped chunking lost ${lost.size} of ${a.size} chunks")
    // the 1-arg SQL form still equals the pure kernel
    val pure1 = clamped(Map(1L -> base), 1, Int.MaxValue).map(_._4).sorted
    val pure2 = chunks(Map(1L -> base))(1L).map(_._1).sorted
    assert(pure1.toSeq == pure2)
  }

  test("chunks are shift-invariant across documents: a shared tail " +
      "dedups even when prefixes differ completely") {
    val prefix1 = Seq.fill(37)("p" + rng.nextInt(100))
    val prefix2 = Seq.fill(11)("q" + rng.nextInt(100))
    val tail = Seq.fill(200)("s" + rng.nextInt(300))
    val got = chunks(Map(1L -> (prefix1 ++ tail), 2L -> (prefix2 ++ tail)))
    val shared = got(1L).map(_._1).toSet intersect got(2L).map(_._1).toSet
    val sharedMass = got(1L).filter(c => shared(c._1)).map(_._2).sum
    // the shared 200-token tail must dedup at chunk granularity in
    // spite of the different-length, different-content prefixes
    assert(sharedMass >= 150, s"shared chunk mass only $sharedMass of 200")
  }
}
