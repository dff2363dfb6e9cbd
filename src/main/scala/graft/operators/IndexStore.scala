package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistence for the trained ANN index — the missing step between
  * "q103 composes IVF + PQ in one session" and "a 100 TB embedding
  * lake serves queries tomorrow": the codes land as a CELL-PARTITIONED
  * parquet layout, so a search probing nProbe cells touches exactly
  * nProbe directories (Catalyst partition pruning does the [[Ivf]]
  * scan cut on DISK, not just in the plan), and the model (centroids +
  * codebooks) rides along as two model-sized tables.
  *
  *   out/codes/cell=<c>/<commit>-part-*.parquet  (vec_id, code ARRAY<INT>)
  *   out/codes/_manifests/v<n>.manifest          (version commit log)
  *   out/model/centroids/                        (cid, dim, v)
  *   out/model/codebooks/                        (j, cid, dim, v)
  *
  * VERSIONED COMMITS (the Iceberg-style move): data files are
  * IMMUTABLE — no maintenance operation ever rewrites or deletes a
  * file another version references. Each mutation ([[save]]/
  * [[append]]/[[delete]]/[[compact]]) stages new files, moves them
  * into the cell directories under commit-unique names, and then
  * makes the new version visible by atomically renaming ONE manifest
  * file (`_manifests/v<n>.manifest`: line 1 the row schema as JSON,
  * the rest the live file paths relative to `codes/`). [[loadCodes]]
  * resolves the newest manifest, so:
  *
  *   - a READER is atomic: it either sees version n or version n+1,
  *     never a half-swapped mix, and a DataFrame created at version n
  *     keeps reading n's exact files while later commits land
  *     (file lists are pinned at read time; IndexStoreSpec proves a
  *     reader holding v sees v's rows across a concurrent
  *     delete+compact);
  *   - a WRITER crash at ANY point before the manifest rename leaves
  *     the previous version fully intact — the failure residue is
  *     orphaned (unreferenced) files, never lost live data, and
  *     [[vacuum]] collects them;
  *   - superseded files stay on disk until [[vacuum]], which retains
  *     the newest `keepVersions` manifests and deletes only files no
  *     retained version references.
  *
  * Concurrency contract: any number of concurrent readers; ONE writer
  * at a time (mutations read the current version and commit its
  * successor — two racing writers would fork the version line, and
  * the losing manifest rename fails loudly). Run [[vacuum]] only with
  * no reader older than the retained window.
  *
  * Scale: ONE exchange on cell for the codes (file count stays
  * O(cells), the ShardWriter discipline); the model tables are
  * driver-sized by construction (k·d and m·k·d/m doubles); manifests
  * are O(files) METADATA, and the per-commit driver work is O(new
  * files) renames + one manifest write — never proportional to data.
  * IndexStoreSpec proves save→load→search bit-identical to the
  * in-session q103 path and that a probed read touches only the
  * probed cell directories.
  */
object IndexStore {

  // ----------------------------------------------------------------
  // manifest plumbing

  private case class Manifest(version: Long, schema: StructType,
    files: Seq[String])

  private def codesRoot(out: String) = s"$out/codes"
  private def manifestsDir(out: String) = s"${codesRoot(out)}/_manifests"

  private def hfs(s: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long): String = f"v$v%09d.manifest"

  private def listManifests(fs: FileSystem, dir: Path): Seq[(Long, Path)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.matches("v\\d{9}\\.manifest"))
      .map(p => (p.getName.drop(1).take(9).toLong, p))
      .sortBy(_._1)

  private def readManifest(fs: FileSystem, v: Long, p: Path): Manifest = {
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    Manifest(v, DataType.fromJson(lines.head).asInstanceOf[StructType],
      lines.tail)
  }

  private def currentManifest(s: SparkSession, out: String)
      : Option[Manifest] = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).lastOption.map { case (v, p) =>
      readManifest(fs, v, p)
    }
  }

  private def requireManifest(s: SparkSession, out: String): Manifest =
    currentManifest(s, out).getOrElse(throw new IllegalStateException(
      s"IndexStore: no manifest under ${manifestsDir(out)} — not a " +
        "versioned index (create it with save())"))

  /** Atomically publish version `version`: write to a dot-temp name,
    * then ONE rename. A racing writer that already committed this
    * version makes the commit throw with the winner's version intact:
    * the pre-rename existence check catches it on filesystems whose
    * rename OVERWRITES an existing destination (POSIX — pinned by
    * IndexStoreSpec's race case), and the rename result catches it on
    * those whose rename refuses (HDFS). The residual TOCTOU window is
    * covered by the documented single-writer contract — the check
    * turns a contract violation into a loud failure, not silence.
    */
  private[graft] def commitManifest(s: SparkSession, out: String,
      version: Long, schema: StructType, files: Seq[String]): Unit = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID}")
    val body = (schema.json +: files.sorted).mkString("\n")
    val o = fs.create(tmp, true)
    try o.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
    val dst = new Path(dir, manifestName(version))
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"IndexStore: commit of version $version failed (concurrent " +
          s"writer?) — index remains at the committed version")
    }
  }

  /** The `cell=<c>` path component's value for a manifest-relative
    * file path.
    */
  private def cellOf(rel: String): String =
    rel.takeWhile(_ != '/').stripPrefix("cell=")

  /** Write `df` (columns idCol, codeCol, cellCol) to a staging dir,
    * then move the part files into the live cell directories under
    * commit-unique names. Returns the moved files' manifest-relative
    * paths. Crash-safe: nothing under a `cell=` dir is ever deleted
    * or overwritten here, and the files are invisible to readers
    * until the caller commits a manifest that lists them.
    */
  private def stageIn(df: DataFrame, out: String, idCol: String,
      cellCol: String, codeCol: String): Seq[String] = {
    val s = df.sparkSession
    val commitId = java.util.UUID.randomUUID.toString.take(8)
    val staging = s"${codesRoot(out)}/_staging-$commitId"
    // one exchange on cell; each cell value lands wholly in one task,
    // so each touched cell gains exactly ONE file per commit
    df.select(col(idCol), col(codeCol), col(cellCol))
      .repartition(col(cellCol))
      .write.mode("overwrite").partitionBy(cellCol)
      .parquet(staging)
    val (fs, stagingPath) = hfs(s, staging)
    val moved = Seq.newBuilder[String]
    fs.listStatus(stagingPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .foreach { cellDir =>
        val live = new Path(s"${codesRoot(out)}/${cellDir.getPath.getName}")
        fs.mkdirs(live)
        fs.listStatus(cellDir.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .foreach { f =>
            val name = s"$commitId-${f.getPath.getName}"
            require(fs.rename(f.getPath, new Path(live, name)),
              s"IndexStore: staging move of ${f.getPath} failed")
            moved += s"${cellDir.getPath.getName}/$name"
          }
      }
    fs.delete(stagingPath, true)
    moved.result()
  }

  /** Read exactly the manifest's files (basePath keeps `cell` a
    * partition column, so cell filters still prune the listed files).
    * An empty manifest yields an empty frame with the index's schema —
    * a fully-emptied index stays readable.
    */
  private def readFiles(s: SparkSession, out: String, schema: StructType,
      files: Seq[String]): DataFrame =
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.option("basePath", codesRoot(out))
      .parquet(files.map(f => s"${codesRoot(out)}/$f"): _*)

  // ----------------------------------------------------------------
  // public lifecycle

  def save(encoded: DataFrame, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String,
      idCol: String = "vec_id", cellCol: String = "cell",
      codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    import s.implicits._
    val (fs, root) = hfs(s, codesRoot(out))
    if (fs.exists(root)) fs.delete(root, true) // save = (re)create
    // read-order schema: data columns then the cell partition column
    val schema = encoded.select(col(idCol), col(codeCol), col(cellCol)).schema
    val files = stageIn(encoded, out, idCol, cellCol, codeCol)
    commitManifest(s, out, 1L, schema, files)
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
    * directories and the next manifest version lists old ∪ new (the
    * model tables are immutable). Correct because cell assignment and
    * PQ codes are per-vector functions of the SAVED model, so
    * append-then-search is bit-identical to a full rebuild (pinned by
    * q121 against q103's oracle). This is the 100 TB maintenance
    * story: ingest streams INTO the index between retrains, while
    * q106's drift gate and q108's migration audit decide when the
    * model itself has rotted enough to rebuild.
    */
  def append(encoded: DataFrame, out: String, idCol: String = "vec_id",
      cellCol: String = "cell", codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    val man = requireManifest(s, out)
    val files = stageIn(encoded, out, idCol, cellCol, codeCol)
    commitManifest(s, out, man.version + 1, man.schema, man.files ++ files)
  }

  /** Remove tombstoned vectors from the index by rewriting ONLY the
    * cells that contain them — the delete half of the maintenance
    * story ([[append]] is the ingest half): takedowns, TTL expiry,
    * and dedup-decided removals must not force a corpus-wide index
    * rebuild at 100 TB.
    *
    * Mechanics: the tombstone set broadcasts onto a code scan to find
    * the affected cells (a model-sized `cell` collect, ≤ k values);
    * survivors of those cells — and only those cells, so the read is
    * pruned to the affected files — are staged in as new files, and
    * the next manifest version drops the affected cells' old files
    * and lists the survivors'. Untouched cells keep their exact files
    * (pinned by IndexStoreSpec), so a 1-cell delete on a k-cell index
    * rewrites 1/k of the codes; old files outlive the commit for
    * concurrent readers until [[vacuum]]. A delete that empties every
    * cell is fine under versioning — the manifest carries the schema,
    * so an empty index stays readable (and [[append]] can refill it).
    */
  def delete(s: SparkSession, out: String, tombstones: DataFrame,
      idCol: String = "vec_id"): Unit = {
    val man = requireManifest(s, out)
    val ids = broadcast(tombstones.select(col(idCol)).distinct())
    val codes = readFiles(s, out, man.schema, man.files)
    val affected = codes.join(ids, Seq(idCol))
      .select(col("cell")).distinct().collect().map(_.get(0).toString).toSet
    if (affected.isEmpty) return
    val (affFiles, keptFiles) = man.files.partition(f => affected(cellOf(f)))
    val survivors = readFiles(s, out, man.schema, affFiles)
      .join(ids, Seq(idCol), "left_anti")
    val newFiles = stageIn(survivors, out, idCol, "cell", "code")
    commitManifest(s, out, man.version + 1, man.schema, keptFiles ++ newFiles)
  }

  /** Coalesce each cell's code files — the small-files counterpart of
    * [[append]]: every streaming micro-batch lands at least one file
    * per touched cell, and a year of ingest turns the probed read's
    * nProbe directory scans into nProbe × thousands of file opens.
    * Compaction rewrites each cell whose live file count exceeds
    * `maxFilesPerCell` into ONE file and commits the next manifest
    * version; cells already within budget keep their exact files, and
    * readers on the old version keep its files until [[vacuum]].
    * Content is preserved row-for-row — codes are unordered within a
    * cell (search is a full probed-cell scan), so no order contract
    * exists to violate; IndexStoreSpec pins multiset equality and
    * search equality. Also prunes the streaming ingest's committed-
    * batch markers (see [[pruneIngestLog]]) so the maintenance loop
    * bounds BOTH small-file populations.
    */
  def compact(s: SparkSession, out: String, maxFilesPerCell: Int = 4)
      : Unit = {
    val man = requireManifest(s, out)
    pruneIngestLog(s, out)
    val byCell = man.files.groupBy(cellOf)
    val oversized = byCell.filter(_._2.size > maxFilesPerCell).keySet
    if (oversized.isEmpty) return
    val (bigFiles, keptFiles) = man.files.partition(f => oversized(cellOf(f)))
    val rewritten = stageIn(readFiles(s, out, man.schema, bigFiles), out,
      "vec_id", "cell", "code")
    commitManifest(s, out, man.version + 1, man.schema,
      keptFiles ++ rewritten)
  }

  /** Garbage-collect: retain the newest `keepVersions` manifests and
    * delete every data file no retained version references, empty
    * cell directories, crashed writers' staging residue, and the
    * superseded manifests. Run only when no active reader holds a
    * version older than the retained window (the vacuum half of the
    * reader-atomicity contract — commits never delete, vacuum does).
    */
  def vacuum(s: SparkSession, out: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "IndexStore.vacuum: keepVersions must be >= 1")
    val (fs, root) = hfs(s, codesRoot(out))
    val mans = listManifests(fs, new Path(manifestsDir(out)))
    require(mans.nonEmpty, s"IndexStore.vacuum: no manifest under $out")
    val (old, retained) = mans.splitAt(math.max(0, mans.size - keepVersions))
    val live: Set[String] = retained.flatMap { case (v, p) =>
      readManifest(fs, v, p).files
    }.toSet
    fs.listStatus(root).toSeq.map(_.getPath).foreach { p =>
      if (p.getName.startsWith("_staging-")) fs.delete(p, true)
      else if (p.getName.startsWith("cell=")) {
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(f => !live(s"${p.getName}/${f.getName}"))
          .foreach(f => fs.delete(f, false))
        if (fs.listStatus(p).isEmpty) fs.delete(p, false)
      }
    }
    old.foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Prune the streaming ingest's committed-batch markers
    * (`_ingest_log/<token>-<batchId>`), keeping the newest
    * `keepLast` per stream token: Structured Streaming's restart
    * replays only from the last uncommitted batch of a checkpoint-
    * consistent stream, so markers far below a token's high-water
    * mark can never be consulted again — without pruning, a
    * long-running ingest accumulates one marker file per micro-batch
    * forever (the metadata twin of the small-files problem
    * [[compact]] exists to fix).
    */
  def pruneIngestLog(s: SparkSession, out: String, keepLast: Int = 8)
      : Unit = {
    val (fs, dir) = hfs(s, s"$out/_ingest_log")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.map(_.getPath)
      .flatMap { p =>
        val name = p.getName
        val cut = name.lastIndexOf('-')
        if (cut <= 0) None
        else name.drop(cut + 1).toLongOption.map(b => (name.take(cut), b, p))
      }
      .groupBy(_._1).values
      .foreach { ms =>
        ms.sortBy(-_._2).drop(keepLast).foreach(m => fs.delete(m._3, false))
      }
  }

  /** The index's current committed version. */
  def version(s: SparkSession, out: String): Long =
    requireManifest(s, out).version

  /** The commit history still on disk: one row per retained manifest
    * (version, n_files, n_cells) — METADATA only, newest last. After
    * [[vacuum]] only the retained window remains.
    */
  def history(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).map { case (v, p) =>
      val m = readManifest(fs, v, p)
      (v, m.files.size.toLong, m.files.map(cellOf).distinct.size.toLong)
    }.toDF("version", "n_files", "n_cells").orderBy("version")
  }

  /** Time-travel read: the code table AS OF a specific committed
    * version (must not have been [[vacuum]]ed away). The serve-side
    * use is a search fleet pinning one version across its queries
    * while maintenance commits land; the audit-side use is diffing
    * two versions (q67's snapshot-diff pattern applies directly).
    */
  def loadCodesAt(s: SparkSession, out: String, version: Long): DataFrame = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).find(_._1 == version) match {
      case Some((v, p)) =>
        val m = readManifest(fs, v, p)
        readFiles(s, out, m.schema, m.files)
      case None => throw new IllegalArgumentException(
        s"IndexStore.loadCodesAt: version $version not on disk under " +
          s"$out (vacuumed or never committed); available: " +
          listManifests(fs, dir).map(_._1).mkString(", "))
    }
  }

  /** Operational DESCRIBE of a persisted index: per-cell code count,
    * live file count, and bytes — the health table the maintenance
    * loop reads to decide [[append]]/[[delete]]/[[compact]]/retrain
    * (file fan-out → compact; occupancy skew vs q106's drift gate →
    * retrain). The code counts come from one cell-keyed aggregate
    * over the (column-pruned) code scan; the file/byte columns come
    * from the manifest — O(files) METADATA, never data.
    */
  def stats(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    val man = requireManifest(s, out)
    val counts = readFiles(s, out, man.schema, man.files)
      .groupBy("cell").agg(count(lit(1)).as("n_codes"))
    val (fs, _) = hfs(s, codesRoot(out))
    val files = man.files.groupBy(cellOf).toSeq.map { case (c, fsq) =>
      (c.toInt, fsq.size.toLong,
        fsq.map(f => fs.getFileStatus(
          new Path(s"${codesRoot(out)}/$f")).getLen).sum)
    }.toDF("cell", "n_files", "bytes")
    counts.join(files, Seq("cell")).orderBy("cell")
  }

  /** The cell-partitioned code table at the newest committed version;
    * filter on `cell` before use so partition pruning cuts the scan
    * to the probed files. The returned frame is PINNED to this
    * version's files — later commits don't change what it reads.
    */
  def loadCodes(s: SparkSession, out: String): DataFrame = {
    val man = requireManifest(s, out)
    readFiles(s, out, man.schema, man.files)
  }

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
