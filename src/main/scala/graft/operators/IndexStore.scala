package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the trained ANN index — the missing step between
  * "q103 composes IVF + PQ in one session" and "a 100 TB embedding
  * lake serves queries tomorrow": the codes land as a CELL-PARTITIONED
  * parquet layout, so a search probing nProbe cells touches exactly
  * nProbe directories (Catalyst partition pruning does the [[Ivf]]
  * scan cut on DISK, not just in the plan), and the model (centroids +
  * codebooks) rides along as two model-sized tables.
  *
  *   out/codes/cell=<c>/part-*.parquet   (vec_id, code ARRAY<INT>)
  *   out/model/centroids/                (cid, dim, v)
  *   out/model/codebooks/                (j, cid, dim, v)
  *
  * Scale: ONE exchange on cell for the codes (file count stays
  * O(cells), the ShardWriter discipline); the model tables are
  * driver-sized by construction (k·d and m·k·d/m doubles).
  * IndexStoreSpec proves save→load→search bit-identical to the
  * in-session q103 path and that a probed read touches only the
  * probed cell directories.
  */
object IndexStore {

  def save(encoded: DataFrame, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String,
      idCol: String = "vec_id", cellCol: String = "cell",
      codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    import s.implicits._
    encoded.select(col(idCol), col(cellCol), col(codeCol))
      .repartition(col(cellCol))
      .write.mode("overwrite").partitionBy(cellCol)
      .parquet(s"$out/codes")
    cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (v, dim) => (cid, dim, v) }
    }.toDF("cid", "dim", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/model/centroids")
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.flatMap { case (cw, cid) =>
        cw.zipWithIndex.map { case (v, dim) => (j, cid, dim, v) }
      }
    }.toDF("j", "cid", "dim", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/model/codebooks")
  }

  /** Append newly encoded vectors to an existing index WITHOUT
    * touching resident codes: the new files land inside their `cell=`
    * directories (parquet append, same one-exchange discipline as
    * [[save]]); the model tables are immutable. Correct because cell
    * assignment and PQ codes are per-vector functions of the SAVED
    * model, so append-then-search is bit-identical to a full rebuild
    * (pinned by q121 against q103's oracle). This is the 100 TB
    * maintenance story: ingest streams INTO the index between
    * retrains, while q106's drift gate and q108's migration audit
    * decide when the model itself has rotted enough to rebuild.
    */
  def append(encoded: DataFrame, out: String, idCol: String = "vec_id",
      cellCol: String = "cell", codeCol: String = "code"): Unit =
    encoded.select(col(idCol), col(cellCol), col(codeCol))
      .repartition(col(cellCol))
      .write.mode("append").partitionBy(cellCol)
      .parquet(s"$out/codes")

  /** Remove tombstoned vectors from the index by rewriting ONLY the
    * cells that contain them — the delete half of the maintenance
    * story ([[append]] is the ingest half): takedowns, TTL expiry,
    * and dedup-decided removals must not force a corpus-wide index
    * rebuild at 100 TB.
    *
    * Mechanics: the tombstone set broadcasts onto a code scan to find
    * the affected cells (a model-sized `cell` collect, ≤ k values);
    * survivors of those cells — and only those cells, so the read is
    * partition-pruned to the affected directories — are written to a
    * staging dir and swapped in with O(affected-cells) driver renames.
    * A cell whose every resident was tombstoned simply has its
    * directory removed (the dynamic-partition-overwrite alternative
    * silently leaves such stale dirs in place, which is why the swap
    * is explicit). Untouched cell directories keep their original
    * files byte-for-byte (pinned by IndexStoreSpec), so a 1-cell
    * delete on a k-cell index rewrites 1/k of the codes.
    *
    * A delete that would empty EVERY cell refuses loudly: a zero-file
    * `codes/` directory is unreadable (parquet schema inference has
    * nothing to read), so "remove everything" is a drop-the-index
    * operation, not a delete.
    */
  def delete(s: SparkSession, out: String, tombstones: DataFrame,
      idCol: String = "vec_id"): Unit = {
    val ids = broadcast(tombstones.select(col(idCol)).distinct())
    val codes = loadCodes(s, out)
    val affected = codes.join(ids, Seq(idCol))
      .select(col("cell")).distinct().collect().map(_.get(0)).toSeq
    if (affected.isEmpty) return
    val survivors = codes
      .filter(col("cell").isin(affected: _*))
      .join(ids, Seq(idCol), "left_anti")
    val staging = s"$out/codes_staging_${java.util.UUID.randomUUID}"
    survivors.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    val root = new org.apache.hadoop.fs.Path(s"$out/codes")
    val rootFs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val allCells = rootFs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.drop(5))
    val stagedCells = {
      val sp = new org.apache.hadoop.fs.Path(staging)
      if (rootFs.exists(sp)) rootFs.listStatus(sp).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .map(_.getPath.getName.drop(5))
      else Seq.empty
    }
    val affectedNames = affected.map(_.toString)
    if (stagedCells.isEmpty && affectedNames.toSet == allCells.toSet) {
      rootFs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw new IllegalArgumentException(
        "IndexStore.delete: tombstones cover every resident vector — " +
          "an empty codes/ layout is unreadable; drop and rebuild the " +
          "index instead")
    }
    val conf = s.sparkContext.hadoopConfiguration
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(conf)
    try affected.foreach { c =>
      val live = new org.apache.hadoop.fs.Path(s"$out/codes/cell=$c")
      val next = new org.apache.hadoop.fs.Path(s"$staging/cell=$c")
      fs.delete(live, true)
      if (fs.exists(next)) require(fs.rename(next, live),
        s"IndexStore.delete: rename $next -> $live failed")
    } finally fs.delete(stagingPath, true)
  }

  /** Coalesce each cell's code files — the small-files counterpart of
    * [[append]]: every streaming micro-batch lands at least one file
    * per touched cell, and a year of ingest turns the probed read's
    * nProbe directory scans into nProbe × thousands of file opens.
    * Compaction rewrites each cell whose file count exceeds
    * `maxFilesPerCell` into ONE file (same staging + per-cell swap
    * as [[delete]], so cells already within budget keep their exact
    * files and readers never see a half-compacted cell). The rewrite
    * is `repartition(col("cell"))` — cells hash across the session's
    * shuffle partitions, so different cells compact in PARALLEL and
    * each writes exactly one file (a single-valued hash key yields
    * one partition per cell). Content is preserved row-for-row —
    * codes are unordered within a cell (search is a full probed-cell
    * scan), so no order contract exists to violate; IndexStoreSpec
    * pins multiset equality and search equality.
    */
  def compact(s: SparkSession, out: String, maxFilesPerCell: Int = 4)
      : Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$out/codes")
    val fs = root.getFileSystem(conf)
    val oversized = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .filter(st => fs.listStatus(st.getPath)
        .count(f => f.isFile && f.getPath.getName.startsWith("part-")) >
        maxFilesPerCell)
      .map(_.getPath.getName.drop(5).toInt) // cell ids are Ivf's Int
    if (oversized.isEmpty) return
    val staging = s"$out/codes_staging_${java.util.UUID.randomUUID}"
    loadCodes(s, out) // Int-typed isin keeps the read partition-pruned
      .filter(col("cell").isin(oversized.map(Integer.valueOf): _*))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    try oversized.foreach { c =>
      val live = new org.apache.hadoop.fs.Path(s"$out/codes/cell=$c")
      val next = new org.apache.hadoop.fs.Path(s"$staging/cell=$c")
      require(fs.exists(next), s"IndexStore.compact: staged cell=$c missing")
      fs.delete(live, true)
      require(fs.rename(next, live),
        s"IndexStore.compact: rename $next -> $live failed")
    } finally fs.delete(stagingPath, true)
  }

  /** Operational DESCRIBE of a persisted index: per-cell code count,
    * file count, and bytes — the health table the maintenance loop
    * reads to decide [[append]]/[[delete]]/[[compact]]/retrain (file
    * fan-out → compact; occupancy skew vs q106's drift gate →
    * retrain). The code counts come from one cell-keyed aggregate
    * over the (column-pruned) code scan; the file/byte columns are a
    * driver listing — O(cells + files) METADATA, never data.
    */
  def stats(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    val counts = loadCodes(s, out)
      .groupBy("cell").agg(count(lit(1)).as("n_codes"))
    val root = new org.apache.hadoop.fs.Path(s"$out/codes")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map { d =>
        val parts = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        (d.getPath.getName.drop(5).toInt, parts.length.toLong,
          parts.map(_.getLen).sum)
      }.toDF("cell", "n_files", "bytes")
    counts.join(files, Seq("cell")).orderBy("cell")
  }

  /** The cell-partitioned code table; filter on `cell` before use so
    * partition pruning cuts the scan to the probed directories.
    */
  def loadCodes(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/codes")

  def loadCentroids(s: SparkSession, out: String): Seq[Seq[Double]] =
    s.read.parquet(s"$out/model/centroids")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

  def loadCodebooks(s: SparkSession, out: String): Seq[Seq[Seq[Double]]] =
    s.read.parquet(s"$out/model/codebooks")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, sub) =>
        sub.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .map { case (_, rows) =>
            rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
          }
      }
}
