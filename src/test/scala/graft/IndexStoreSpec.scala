package graft

import graft.operators.{IndexStore, Ivf, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index persistence: save→load→search must be bit-identical to the
  * in-session IVF-PQ path (q103's shape), the model must round-trip
  * exactly, and a probed read must touch ONLY the probed cell
  * directories (partition pruning on disk, not just in the plan).
  */
class IndexStoreSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = graft.operators.FixedModel.quantizedCast(spark, dir)

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
      "rebuild; a fully-tombstoned cell's directory is removed") {
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

      def cellFiles(): Map[Int, Set[String]] = {
        val root = new java.io.File(s"$out/codes")
        root.listFiles.filter(_.getName.startsWith("cell="))
          .map(d => d.getName.drop(5).toInt ->
            d.listFiles.map(f => s"${f.getName}:${f.length}").toSet)
          .toMap
      }
      val before = cellFiles()
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

      val after = cellFiles()
      // the fully-tombstoned cell's directory is gone (not stale)
      assert(!after.contains(emptied), s"cell=$emptied dir survived")
      // the partially-tombstoned cell was rewritten
      assert(after(partial) != before(partial))
      // every untouched cell kept its exact files
      (before.keySet - emptied - partial).foreach { k =>
        assert(after(k) == before(k), s"untouched cell=$k was rewritten")
      }

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

      // deleting ids absent from the index is a no-op
      IndexStore.delete(spark, out, Seq(999999L).toDF("vec_id"))
      assert(cellFiles() == after)

      // a delete that would empty EVERY remaining cell refuses loudly
      // (an empty codes/ layout is unreadable) and changes nothing
      val remaining = IndexStore.loadCodes(spark, out)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val ex = intercept[IllegalArgumentException] {
        IndexStore.delete(spark, out, remaining.toDF("vec_id"))
      }
      assert(ex.getMessage.contains("drop and rebuild"))
      assert(cellFiles() == after)
      assert(IndexStore.loadCodes(spark, out).count() == remaining.length)
    } finally c.unpersist()
  }

  test("compact coalesces only over-budget cells, preserving rows " +
      "and search results") {
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

      def files(): Map[Int, Set[String]] = {
        val root = new java.io.File(s"$out/codes")
        root.listFiles.filter(_.getName.startsWith("cell="))
          .map(d => d.getName.drop(5).toInt ->
            d.listFiles.filter(_.getName.startsWith("part-"))
              .map(f => s"${f.getName}:${f.length}").toSet)
          .toMap
      }
      val before = files()
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

      val after = files()
      // every over-budget cell now holds one file; the rest untouched
      before.foreach { case (k, fs) =>
        if (fs.size > 4) assert(after(k).size == 1, s"cell=$k: ${after(k)}")
        else assert(after(k) == fs, s"under-budget cell=$k was rewritten")
      }
      // multiset row equality and identical search
      val rowsAfter = IndexStore.loadCodes(spark, out)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
        .toMap
      assert(rowsAfter == rows)
      val got = Pq.adcSearchCells(IndexStore.loadCodes(spark, out),
          codebooks, probed, topK = 3)
        .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(got == want)

      // idempotent: a second compact is a no-op on the file layout
      IndexStore.compact(spark, out)
      assert(files() == after)

      // stats: the DESCRIBE table agrees with the data and the disk
      val st = IndexStore.stats(spark, out).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val wantCounts = IndexStore.loadCodes(spark, out)
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(st.keySet == files().keySet)
      st.foreach { case (cell, (nCodes, nFiles, bytes)) =>
        assert(nCodes == wantCounts(cell), s"cell=$cell codes")
        assert(nFiles == files()(cell).size.toLong, s"cell=$cell files")
        assert(bytes ==
          new java.io.File(s"$out/codes/cell=$cell").listFiles
            .filter(_.getName.startsWith("part-")).map(_.length).sum,
          s"cell=$cell bytes")
      }
      encoded.unpersist()
    } finally c.unpersist()
  }
}
