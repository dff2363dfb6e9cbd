package graft

import graft.operators.{IndexStore, Ivf, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index persistence under versioned manifest commits: save→load→
  * search must be bit-identical to the in-session IVF-PQ path (q103's
  * shape), the model must round-trip exactly, a probed read must
  * touch ONLY the probed cell directories (partition pruning on disk,
  * not just in the plan), maintenance commits must be invisible to a
  * reader pinned to the previous version until vacuum, and vacuum
  * must reduce the physical layout to exactly the live manifest.
  */
class IndexStoreSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = graft.operators.FixedModel.quantizedCast(spark, dir)

  /** The LIVE layout as the current manifest resolves it: cell ->
    * set of "fileName:length".
    */
  private def liveFiles(out: String): Map[Int, Set[String]] =
    IndexStore.loadCodes(spark, out).inputFiles.toSeq
      .map { f =>
        val p = new java.io.File(new java.net.URI(f).getPath)
        val cell = p.getParentFile.getName.drop(5).toInt
        cell -> s"${p.getName}:${p.length}"
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  /** The PHYSICAL layout on disk: cell -> set of "fileName:length".
    * Dot-prefixed files are ChecksumFileSystem's `.crc` sidecars —
    * hidden metadata no Hadoop/Spark reader ever lists as data, and
    * deleted alongside their data file — so they're not part of the
    * layout contract.
    */
  private def diskFiles(out: String): Map[Int, Set[String]] = {
    val root = new java.io.File(s"$out/codes")
    root.listFiles.filter(_.getName.startsWith("cell="))
      .map(d => d.getName.drop(5).toInt ->
        d.listFiles.filter(f => f.isFile && !f.getName.startsWith("."))
          .map(f => s"${f.getName}:${f.length}").toSet)
      .toMap
  }

  test("save -> load -> search is bit-identical to the in-session path") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding")
      val probed = Ivf.probeCells(c.filter(col("vec_id") < 8), cents,
        nProbe = 2)

      val fresh = Pq.adcSearchCells(encoded, codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

      val out = java.nio.file.Files.createTempDirectory("graft-index").toString
      IndexStore.save(encoded, cents, codebooks, out)
      assert(IndexStore.version(spark, out) == 1L)

      // model round-trips exactly
      assert(IndexStore.loadCentroids(spark, out) == cents)
      assert(IndexStore.loadCodebooks(spark, out) == codebooks)

      // search over the LOADED codes reproduces the session results
      val loaded = IndexStore.loadCodes(spark, out)
      val again = Pq.adcSearchCells(loaded, codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(again == fresh)

      // partition pruning: a probed read touches only probed cell dirs
      val probeCells = probed.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      val files = loaded
        .filter(col("cell").isin(probeCells.toSeq.map(Integer.valueOf): _*))
        .inputFiles
      assert(files.nonEmpty)
      assert(files.forall(f => probeCells.exists(c => f.contains(s"cell=$c"))),
        s"scan escaped the probed cells: ${files.mkString("\n")}")
      // and at least one non-probed cell exists that was NOT read
      val allCells = loaded.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      if ((allCells -- probeCells).nonEmpty) {
        val unprobed = (allCells -- probeCells).head
        assert(!files.exists(_.contains(s"cell=$unprobed")))
      }
    } finally c.unpersist()
  }

  test("delete rewrites only the affected cells and matches a filtered " +
      "rebuild; vacuum reduces disk to the manifest; an emptied index " +
      "stays readable and appendable") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding")
      val out = java.nio.file.Files
        .createTempDirectory("graft-index-del").toString
      IndexStore.save(encoded, cents, codebooks, out)

      val before = liveFiles(out)
      assert(before.size >= 2, s"need >=2 cells, got ${before.keySet}")

      // tombstone every resident of ONE cell plus one resident of
      // another — exercises both the full-cell and partial-cell paths
      val byCell = encoded.select("vec_id", "cell").collect()
        .groupBy(_.getInt(1)).map { case (k, rs) =>
          k -> rs.map(_.getLong(0)).sorted.toSeq }
      val emptied = byCell.keys.min
      val partial = byCell.keys.filter(_ != emptied).min
      val tombIds = byCell(emptied) :+ byCell(partial).head
      import spark.implicits._
      IndexStore.delete(spark, out, tombIds.toDF("vec_id"))
      assert(IndexStore.version(spark, out) == 2L)

      val after = liveFiles(out)
      // the fully-tombstoned cell left the live version
      assert(!after.contains(emptied), s"cell=$emptied still live")
      // the partially-tombstoned cell was rewritten
      assert(after(partial) != before(partial))
      // every untouched cell kept its exact live files
      (before.keySet - emptied - partial).foreach { k =>
        assert(after(k) == before(k), s"untouched cell=$k was rewritten")
      }
      // commits never delete: the old version's files are still on
      // disk (readers pinned to v1 keep working) until vacuum
      assert(before(emptied).subsetOf(diskFiles(out)(emptied)))
      assert(before(partial).subsetOf(diskFiles(out)(partial)))

      // post-delete search == search over a filtered rebuild
      val probed = Ivf.probeCells(c.filter(col("vec_id") < 8), cents,
        nProbe = 2)
      val got = Pq.adcSearchCells(IndexStore.loadCodes(spark, out),
          codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      val want = Pq.adcSearchCells(
          encoded.filter(!col("vec_id").isin(tombIds.map(Long.box): _*)),
          codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(got == want)

      // deleting ids absent from the index is a no-op (no new version)
      IndexStore.delete(spark, out, Seq(999999L).toDF("vec_id"))
      assert(IndexStore.version(spark, out) == 2L)
      assert(liveFiles(out) == after)

      // vacuum: disk reduces to exactly the live manifest — the
      // emptied cell's directory is gone, superseded files are gone
      IndexStore.vacuum(spark, out)
      assert(diskFiles(out) == after)

      // delete EVERYTHING: fine under versioning — the manifest
      // carries the schema, so the empty index stays readable...
      val remaining = IndexStore.loadCodes(spark, out)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      IndexStore.delete(spark, out, remaining.toDF("vec_id"))
      val empty = IndexStore.loadCodes(spark, out)
      assert(empty.count() == 0L)
      assert(empty.columns.toSeq == Seq("vec_id", "code", "cell"))
      // ...and appendable: refill one vector and find it again
      val one = encoded.filter(col("vec_id") === remaining.head)
      IndexStore.append(one, out)
      assert(IndexStore.loadCodes(spark, out).count() == 1L)
    } finally c.unpersist()
  }

  test("a reader pinned to version v sees v's exact rows across a " +
      "concurrent delete + compact commit") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding")
      val out = java.nio.file.Files
        .createTempDirectory("graft-index-pin").toString
      IndexStore.save(encoded, cents, codebooks, out)

      // the reader resolves version 1 and PINS its file list
      val readerV1 = IndexStore.loadCodes(spark, out)
      val rowsV1 = readerV1.collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap

      // maintenance commits land underneath it: a delete (v2), an
      // append fragmenting one cell (v3..), then a compact
      import spark.implicits._
      val someIds = encoded.select("vec_id").limit(5)
        .collect().map(_.getLong(0)).toSeq
      IndexStore.delete(spark, out, someIds.toDF("vec_id"))
      val more = encoded.filter(col("vec_id").isin(someIds.map(Long.box): _*))
      someIds.foreach { id =>
        IndexStore.append(more.filter(col("vec_id") === id), out)
      }
      IndexStore.compact(spark, out, maxFilesPerCell = 1)
      assert(IndexStore.version(spark, out) > 2L)

      // the pinned reader still sees version 1's exact multiset —
      // no half-swapped mix, no missing cells (commits never delete)
      val rowsAgain = readerV1.collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(rowsAgain == rowsV1)

      // history: one row per commit, versions contiguous from 1
      val hist = IndexStore.history(spark, out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(hist.map(_._1).toSeq ==
        (1L to IndexStore.version(spark, out)).toSeq)

      // time-travel: an explicit as-of read of version 1 equals the
      // pinned reader; the latest-version read equals loadCodes
      val travel = IndexStore.loadCodesAt(spark, out, 1L)
        .collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(travel == rowsV1)
      intercept[IllegalArgumentException] {
        IndexStore.loadCodesAt(spark, out, 999L)
      }

      // a FRESH reader sees the latest version: delete+re-append is
      // the identity on content here, so the multiset matches v1 too
      val rowsLatest = IndexStore.loadCodes(spark, out)
        .collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(rowsLatest == rowsV1)
    } finally c.unpersist()
  }

  test("compact coalesces only over-budget cells, preserving rows " +
      "and search results; ingest-log markers are pruned") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding").cache()
      val out = java.nio.file.Files
        .createTempDirectory("graft-index-compact").toString
      // seed with one cell's rows, then append the rest one vector at
      // a time — small files pile up in the appended cells
      val cells = encoded.select("cell").distinct()
        .collect().map(_.getInt(0)).sorted
      val keepSmall = cells.head
      IndexStore.save(encoded.filter(col("cell") === keepSmall),
        cents, codebooks, out)
      val rest = encoded.filter(col("cell") =!= keepSmall)
        .select("vec_id").collect().map(_.getLong(0))
      rest.foreach { id =>
        IndexStore.append(encoded.filter(col("vec_id") === id), out)
      }
      // a long-running ingest's marker files, two tokens
      (0 to 11).foreach { b =>
        val p = new org.apache.hadoop.fs.Path(s"$out/_ingest_log/tokA-$b")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .create(p, true).close()
      }
      val pB = new org.apache.hadoop.fs.Path(s"$out/_ingest_log/tokB-0")
      pB.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(pB, true).close()

      val before = liveFiles(out)
      assert(before.exists(_._2.size > 4), s"no over-budget cell: $before")
      val rows = IndexStore.loadCodes(spark, out)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
        .toMap
      val probed = Ivf.probeCells(c.filter(col("vec_id") < 8), cents,
        nProbe = 2)
      val want = Pq.adcSearchCells(IndexStore.loadCodes(spark, out),
          codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq

      IndexStore.compact(spark, out)

      val after = liveFiles(out)
      // every over-budget cell now holds one live file; rest untouched
      before.foreach { case (k, fs) =>
        if (fs.size > 4) assert(after(k).size == 1, s"cell=$k: ${after(k)}")
        else assert(after(k) == fs, s"under-budget cell=$k was rewritten")
      }
      // markers pruned to the newest 8 of tokA; tokB untouched
      val markers = new java.io.File(s"$out/_ingest_log").listFiles
        .map(_.getName).filterNot(_.startsWith(".")).toSet
      assert(markers == ((4 to 11).map(b => s"tokA-$b").toSet + "tokB-0"),
        markers.toSeq.sorted.mkString(", "))
      // multiset row equality and identical search
      val rowsAfter = IndexStore.loadCodes(spark, out)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
        .toMap
      assert(rowsAfter == rows)
      val got = Pq.adcSearchCells(IndexStore.loadCodes(spark, out),
          codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(got == want)

      // idempotent: a second compact commits nothing
      val v = IndexStore.version(spark, out)
      IndexStore.compact(spark, out)
      assert(IndexStore.version(spark, out) == v)
      assert(liveFiles(out) == after)

      // vacuum reduces the physical layout to the live manifest
      IndexStore.vacuum(spark, out)
      assert(diskFiles(out) == after)

      // stats: the DESCRIBE table agrees with the data and the layout
      val st = IndexStore.stats(spark, out).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val wantCounts = IndexStore.loadCodes(spark, out)
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(st.keySet == after.keySet)
      st.foreach { case (cell, (nCodes, nFiles, bytes)) =>
        assert(nCodes == wantCounts(cell), s"cell=$cell codes")
        assert(nFiles == after(cell).size.toLong, s"cell=$cell files")
        assert(bytes ==
          new java.io.File(s"$out/codes/cell=$cell").listFiles
            .filter(f => f.isFile && !f.getName.startsWith("."))
            .map(_.length).sum,
          s"cell=$cell bytes")
      }
      encoded.unpersist()
    } finally c.unpersist()
  }

  test("a racing writer loses loudly: a commit whose version was " +
      "already taken throws and the index stays at the winner's " +
      "version") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding")
      val out = java.nio.file.Files
        .createTempDirectory("graft-index-race").toString
      IndexStore.save(encoded.filter(col("vec_id") < 20), cents,
        codebooks, out)
      // two writers read v1 and both derive successor v2: the first
      // commit wins; the second MUST throw — even on POSIX, where a
      // bare rename would silently overwrite the winner's manifest
      val schema = IndexStore.loadCodes(spark, out).schema
      IndexStore.commitManifest(spark, out, 2L, schema, Seq.empty)
      val rowsBefore = IndexStore.loadCodes(spark, out).count()
      assert(rowsBefore == 0L) // the winner's (empty) commit is live
      intercept[IllegalStateException] {
        IndexStore.commitManifest(spark, out, 2L, schema, Seq.empty)
      }
      // the loser changed nothing visible
      assert(IndexStore.version(spark, out) == 2L)
      assert(IndexStore.loadCodes(spark, out).count() == rowsBefore)
      // and the END-TO-END surface on top of the guard: an append
      // whose read-commit cycle runs AFTER the winner's commit simply
      // builds v3 on the winner's state — versions stay linear
      IndexStore.append(encoded.filter(col("vec_id") >= 20), out)
      assert(IndexStore.version(spark, out) == 3L)
      val n20 = encoded.filter(col("vec_id") >= 20).count()
      assert(IndexStore.loadCodes(spark, out).count() == n20)
      IndexStore.vacuum(spark, out)
      assert(IndexStore.loadCodes(spark, out).count() == n20)
    } finally c.unpersist()
  }

  test("an empty save is readable and appendable (the streaming " +
      "bootstrap path)") {
    val c = corpus.cache()
    try {
      val cents = graft.operators.FixedModel.centroids(c,
        Seq(0L, 10L, 20L, 30L))
      val codebooks = graft.operators.FixedModel.codebooks(cents, m = 4)
      val encoded = Pq.encode(Ivf.assign(c, cents, "embedding"), codebooks,
        "embedding")
      val out = java.nio.file.Files
        .createTempDirectory("graft-index-empty").toString
      IndexStore.save(encoded.limit(0), cents, codebooks, out)
      assert(IndexStore.loadCodes(spark, out).count() == 0L)
      IndexStore.append(encoded, out)
      assert(IndexStore.loadCodes(spark, out).count() == encoded.count())
    } finally c.unpersist()
  }
}
