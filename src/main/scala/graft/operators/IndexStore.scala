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
  *   out/model/m-<commit>/centroids/             (cid, dim, v)
  *   out/model/m-<commit>/codebooks/             (j, cid, dim, v)
  *
  * VERSIONED COMMITS (the Iceberg-style move): data files are
  * IMMUTABLE — no maintenance operation ever rewrites or deletes a
  * file another version references. Each mutation ([[save]]/
  * [[append]]/[[delete]]/[[compact]]) stages new files, moves them
  * into the cell directories under commit-unique names, and then
  * makes the new version visible by atomically renaming ONE manifest
  * file (`_manifests/v<n>.manifest`: line 1 the row schema as JSON,
  * line 2 the model directory this version searches under, the rest
  * the live file paths relative to `codes/` with their byte lengths —
  * so [[stats]] and [[history]] are pure metadata). [[loadCodes]]
  * resolves the newest manifest, so:
  *
  *   - a READER is atomic: it either sees version n or version n+1,
  *     never a half-swapped mix, and a DataFrame created at version n
  *     keeps reading n's exact files while later commits land
  *     (file lists are pinned at read time; IndexStoreSpec proves a
  *     reader holding v sees v's rows across a concurrent
  *     delete+compact);
  *   - a WRITER crash at ANY point before the manifest rename leaves
  *     the previous version fully intact — including [[save]], which
  *     recreates the index as a FULL-SNAPSHOT commit (version n+1
  *     with a fresh model directory) rather than clearing the layout:
  *     the failure residue is orphaned (unreferenced) files, never
  *     lost live data, and [[vacuum]] collects them;
  *   - superseded files stay on disk until [[vacuum]], which retains
  *     the newest `keepVersions` manifests (plus every version
  *     younger than `minAgeMs` — the expire-snapshots pin window) and
  *     deletes only files no retained version references.
  *
  * CONCURRENCY (optimistic, Iceberg's commit loop): any number of
  * concurrent readers, and RACING MUTATIONS REBASE — a writer whose
  * manifest rename loses re-reads the newest manifest, re-validates
  * that its change still commutes, and re-commits on top. The
  * win-once publish underneath is FILESYSTEM-DEPENDENT — local
  * hard-link EEXIST, HDFS atomic no-overwrite rename, or a
  * marker-file protocol needing only atomic create-no-overwrite on
  * object stores; see [[publishOnce]] for the scheme matrix. A store
  * providing none of the three cannot host CONCURRENT writers
  * (single-writer operation remains safe):
  *
  *   - [[append]] always rebases (file lists union; the staged files
  *     carry commit-unique names, so no rename can collide) — two
  *     concurrent appends BOTH land (IndexStoreSpec, and q133 runs
  *     two appends from racing threads under the cross-engine gate);
  *   - [[compact]] rebases while every file it rewrote is still live
  *     (a file another writer removed first means its rewrite is
  *     stale — conflict);
  *   - [[delete]] rebases while its removed files are live AND no
  *     commit added files to an affected cell (an appended file may
  *     hold a tombstoned id the staged survivors never saw — the
  *     delete-vs-insert write conflict, refused loudly);
  *   - [[save]] always rebases: it is a full-snapshot replace, and
  *     any interleaving is equivalent to the serialization that runs
  *     save last;
  *   - every rebase re-checks the MODEL pointer: a concurrent
  *     [[save]] (retrain) invalidates in-flight codes built under the
  *     old model, so the rebase throws instead of committing stale
  *     codes into the new model's index.
  *
  * After `maxRetries` lost races the mutation throws with the index
  * at the winners' version — no partial state. [[vacuum]] is itself a
  * WRITER under this contract: it must not run concurrently with a
  * mutation (an in-flight writer's staged-but-uncommitted files look
  * unreferenced); `minAgeMs` additionally makes it skip staging
  * residue and unreferenced files younger than the window, so an
  * operator mistake degrades to "missed garbage", not corruption.
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

  /** A lost manifest rename — the optimistic-concurrency signal the
    * commit loop retries on. Subtype of IllegalStateException so
    * callers treating any commit failure as fatal still do.
    */
  final class CommitConflictException(msg: String)
    extends IllegalStateException(msg)

  // ----------------------------------------------------------------
  // manifest plumbing

  private[graft] case class FileEntry(path: String, len: Long)

  private[graft] case class Manifest(version: Long, schema: StructType,
      model: String, files: Seq[FileEntry]) {
    def paths: Set[String] = files.map(_.path).toSet
  }

  private def codesRoot(out: String) = s"$out/codes"
  private def manifestsDir(out: String) = s"${codesRoot(out)}/_manifests"
  private def modelRoot(out: String) = s"$out/model"

  private def hfs(s: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long): String = f"v$v%09d.manifest"

  /** (version, path, mtime) of every manifest on disk, version-sorted.
    * One listStatus — the mtimes feed [[vacuum]]'s retention window.
    */
  private def listManifests(fs: FileSystem, dir: Path)
      : Seq[(Long, Path, Long)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.matches("v\\d{9}\\.manifest"))
      .map(st => (st.getPath.getName.drop(1).take(9).toLong, st.getPath,
        st.getModificationTime))
      .sortBy(_._1)

  private def readManifest(fs: FileSystem, v: Long, p: Path): Manifest = {
    val in = fs.open(p)
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    // format guard: a manifest from an older layout (no model= line,
    // no tab-separated lengths) or a foreign file must fail with a
    // named error, not an IndexOutOfBounds/NumberFormat crash deep in
    // the parse — the operator's fix (rebuild via save()) is stated
    if (lines.size < 2 || !lines(1).startsWith("model=") ||
        lines.drop(2).exists(l => l.lastIndexOf('\t') <= 0))
      throw new IllegalStateException(
        s"IndexStore: unsupported manifest format at $p — expected " +
          "line 1 schema JSON, line 2 'model=<dir>', then one " +
          "'<path>\\t<bytes>' line per file. A manifest written by a " +
          "pre-versioned layout (or by another system) cannot be " +
          "migrated in place; recreate the index with save()")
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val model = lines(1).stripPrefix("model=")
    val files = lines.drop(2).map { l =>
      val cut = l.lastIndexOf('\t')
      val len = l.drop(cut + 1).toLongOption.getOrElse(
        throw new IllegalStateException(
          s"IndexStore: unsupported manifest format at $p — file line " +
            s"'$l' carries a non-numeric length; recreate the index " +
            "with save()"))
      FileEntry(l.take(cut), len)
    }
    Manifest(v, schema, model, files)
  }

  private[graft] def currentManifest(s: SparkSession, out: String)
      : Option[Manifest] = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).lastOption.map { case (v, p, _) =>
      readManifest(fs, v, p)
    }
  }

  private def requireManifest(s: SparkSession, out: String): Manifest =
    currentManifest(s, out).getOrElse(throw new IllegalStateException(
      s"IndexStore: no manifest under ${manifestsDir(out)} — not a " +
        "versioned index (create it with save())"))

  private def manifestAt(s: SparkSession, out: String, version: Long)
      : Manifest = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).find(_._1 == version) match {
      case Some((v, p, _)) => readManifest(fs, v, p)
      case None => throw new IllegalArgumentException(
        s"IndexStore: version $version not on disk under $out " +
          "(vacuumed or never committed); available: " +
          listManifests(fs, dir).map(_._1).mkString(", "))
    }
  }

  /** Atomically publish version `version`: write to a dot-temp name,
    * then ONE atomic create-if-absent publish. A racing writer that
    * already committed this version makes the commit throw
    * [[CommitConflictException]] with the winner's version intact.
    * The publish must be WIN-ONCE — exactly one of two racers may
    * succeed, with no window where both do — so the mechanism is
    * scheme-dependent; see [[publishOnce]] for the scheme matrix
    * (`file` hard-link EEXIST / HDFS atomic no-overwrite rename /
    * object-store marker protocol via [[publishByMarker]]).
    */
  private[graft] def commitManifest(s: SparkSession, out: String,
      version: Long, schema: StructType, model: String,
      files: Seq[FileEntry]): Unit = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID}")
    val body = (schema.json +: s"model=$model" +:
      files.sortBy(_.path).map(f => s"${f.path}\t${f.len}")).mkString("\n")
    val o = fs.create(tmp, true)
    try o.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
    val dst = new Path(dir, manifestName(version))
    val won = publishOnce(fs, tmp, dst)
    fs.delete(tmp, false)
    if (!won) throw new CommitConflictException(
      s"IndexStore: commit of version $version lost to a concurrent " +
        s"writer — index remains at the committed version")
  }

  /** Filesystem schemes whose `rename` atomically REFUSES an existing
    * destination (HDFS semantics — the NameNode rejects the rename in
    * one namespace operation). Everything outside this set and `file`
    * routes through [[publishByMarker]], which assumes only atomic
    * create-no-overwrite.
    */
  private[graft] val atomicRenameSchemes =
    Set("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")

  /** Publish `tmp` at `dst` win-once (see [[commitManifest]]);
    * returns whether THIS caller won. `tmp` is left in place either
    * way (the caller deletes it — after a hard link the data lives
    * on under `dst`). SCHEME MATRIX (the win-once mechanism is
    * scheme-dependent; using a store outside this matrix with
    * concurrent writers is NOT safe):
    *
    *   - `file`: `link(2)` — the kernel fails with EEXIST atomically;
    *   - HDFS-like ([[atomicRenameSchemes]]): rename, which refuses
    *     an existing destination atomically;
    *   - everything else (object stores — s3a/gs/abfs/...): rename
    *     may silently OVERWRITE, so the decision moves to
    *     [[publishByMarker]]: one atomic create-no-overwrite of a
    *     marker file decides the race, and only the winner renames
    *     the staged body into place. Requires the store's
    *     `create(path, overwrite = false)` to be atomic (conditional
    *     put / If-None-Match); a store without even that cannot host
    *     concurrent writers — serialize commits externally.
    */
  private[graft] def publishOnce(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
    val scheme = fs.getUri.getScheme
    if (scheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // no hard links on this volume: fall back to probed rename
          !fs.exists(dst) && fs.rename(tmp, dst)
      }
      // NOT a TOCTOU: the rename is the decision point. The scheme
      // matrix only admits filesystems whose rename REFUSES an
      // existing destination; the exists-probe is an advisory fast
      // path (skip staging churn when the version is visibly taken).
    } else if (atomicRenameSchemes(scheme)) !fs.exists(dst) && fs.rename(tmp, dst)
    else publishByMarker(fs, tmp, dst)
  }

  /** The staged-body name a marker-protocol contender uses: unique
    * per attempt, dot-prefixed so [[listManifests]]'s regex never
    * sees it as a manifest.
    */
  private[graft] def markerDataPath(dst: Path, uuid: String): Path =
    new Path(dst.getParent, s".data-${dst.getName}-$uuid")

  /** The decision file of the marker protocol: ONE per version. */
  private[graft] def markerPath(dst: Path): Path =
    new Path(dst.getParent, s".winner-${dst.getName}")

  /** Win-once publish for stores whose rename OVERWRITES an existing
    * destination (object-store semantics). Uses only atomic
    * create-no-overwrite:
    *
    *   1. stage the full manifest body under a UNIQUE name
    *      (`.data-<dst>-<uuid>` — unique names cannot conflict);
    *   2. DECIDE: atomically create the per-version marker
    *      (`.winner-<dst>`) containing this contender's uuid — the
    *      store's create-if-absent is the one atomic primitive the
    *      protocol needs; whoever creates it won;
    *   3. the WINNER renames its staged body to `dst` — no race: only
    *      the winner ever renames to `dst`, so overwriting rename is
    *      harmless here;
    *   4. a LOSER that observes the marker but no published `dst`
    *      COMPLETES the decided commit (reads the winner's uuid from
    *      the marker and renames the winner's staged body into
    *      place), then reports its own attempt lost. This fires for
    *      a SLOW winner as well as a crashed one, so both renamers
    *      must tolerate the other having landed first: renames of
    *      the same unique source are idempotent — one succeeds, the
    *      rest fail on a gone source and observe the published dst
    *      (the winner's branch checks exactly this). SAFE only under
    *      the store model's rename semantics: copy+delete (S3-class)
    *      never touches `dst` when the source is missing — a store
    *      whose rename deletes the destination before checking the
    *      source could clobber a live manifest here and is OUTSIDE
    *      the model.
    *
    * Readers are never exposed to a partial body: `dst` appears only
    * via rename of a fully-written staged file. Crash residue
    * (`.data-*` of losers/crashed contenders, settled `.winner-*`
    * markers) is collected by [[vacuum]] once the version is settled.
    * The remaining window — a winner that crashed mid-(2) leaving a
    * marker with no readable uuid AND no published `dst` — wedges
    * that version number (every later contender loses to the dead
    * marker); it is not collectable automatically because it is
    * indistinguishable from an in-flight commit, and is the
    * documented cost of having no compare-and-swap beyond
    * create-if-absent. Operators clear it by deleting the marker
    * after quiescing writers.
    */
  private[graft] def publishByMarker(fs: FileSystem, tmp: Path, dst: Path)
      : Boolean = {
    val uuid = java.util.UUID.randomUUID.toString
    val data = markerDataPath(dst, uuid)
    require(fs.rename(tmp, data),
      s"IndexStore: staging move of $tmp to $data failed")
    val marker = markerPath(dst)
    val won =
      try {
        // the ONE decision point: create-if-absent of the marker
        val o = fs.create(marker, false)
        try o.write(uuid.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally o.close()
        true
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(marker)) false // lost the race
          else throw e // genuine IO failure, not a decision
      }
    if (won) {
      // A racing loser that observed the marker but no published dst
      // COMPLETES the winner's publish from the winner's staged body
      // (step 4 below) — and it does so whenever the winner is slow,
      // not only when it crashed. So a failed rename here is NOT
      // necessarily a failure: if the unique-named staged body is
      // gone and dst exists, a completer moved THIS winner's own
      // body into place — the publish succeeded, just not by this
      // thread's hand.
      if (!fs.rename(data, dst))
        require(fs.exists(dst),
          s"IndexStore: winner publish rename of $data to $dst " +
            "failed with no completed publish in place")
      true
    } else {
      if (!fs.exists(dst)) {
        // decided-but-unpublished: the winner crashed after the marker
        // landed — complete its publish from its staged body
        val in = fs.open(marker)
        val winnerUuid =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
            new String(buf.toByteArray,
              java.nio.charset.StandardCharsets.UTF_8).trim
          } finally in.close()
        if (winnerUuid.nonEmpty) {
          val wdata = markerDataPath(dst, winnerUuid)
          if (fs.exists(wdata)) { fs.rename(wdata, dst); () }
        }
      }
      fs.delete(data, false)
      false
    }
  }

  /** What [[recoverWedge]] did per wedged version: `completed` were
    * decided-but-unpublished commits finished from the winner's
    * intact staged body; `cleared` were dead markers deleted
    * (unwedging the version number); `skipped` were younger than
    * `minAgeMs` and left alone (indistinguishable from in-flight).
    */
  case class WedgeRecovery(completed: Seq[Long], cleared: Seq[Long],
      skipped: Seq[Long])

  /** Recover marker-protocol wedges (see [[publishByMarker]]): a
    * winner that crashed between DECIDE and publish leaves a
    * `.winner-` marker with no published manifest, and every later
    * contender for that version loses to the dead marker. For each
    * such marker older than `minAgeMs` (the quiesce bound — a younger
    * marker may be a live commit between its create and its publish
    * rename, so it is reported `skipped`, never touched):
    *
    *   - marker uuid readable AND the winner's staged body intact →
    *     COMPLETE the decided commit (rename body into place — the
    *     same idempotent completion a racing loser performs), then
    *     delete the marker;
    *   - uuid unreadable/empty, or the staged body lost → the commit
    *     can never complete; DELETE the marker so the next contender
    *     for that version number can win it.
    *
    * Safe against a concurrent recoverer: completion renames a
    * unique-named source (one rename wins, the rest fail on a gone
    * source and observe the published dst); marker deletes are
    * idempotent. Returns what happened per version.
    */
  def recoverWedge(s: SparkSession, out: String,
      minAgeMs: Long = 3600000L): WedgeRecovery = {
    val (fs, dir) = hfs(s, manifestsDir(out))
    if (!fs.exists(dir)) return WedgeRecovery(Nil, Nil, Nil)
    val cutoff = System.currentTimeMillis() - minAgeMs
    def aged(m: Long): Boolean = minAgeMs <= 0L || m < cutoff
    val markerRe = "^\\.winner-(v(\\d{9})\\.manifest)$".r
    val completed = Seq.newBuilder[Long]
    val cleared = Seq.newBuilder[Long]
    val skipped = Seq.newBuilder[Long]
    fs.listStatus(dir).toSeq.foreach { st =>
      st.getPath.getName match {
        case markerRe(dstName, vDigits) =>
          val version = vDigits.toLong
          val dst = new Path(dir, dstName)
          if (!fs.exists(dst)) {
            if (!aged(st.getModificationTime)) skipped += version
            else {
              val uuid =
                try {
                  val in = fs.open(st.getPath)
                  try {
                    val buf = new java.io.ByteArrayOutputStream()
                    org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096,
                      false)
                    new String(buf.toByteArray,
                      java.nio.charset.StandardCharsets.UTF_8).trim
                  } finally in.close()
                } catch { case _: java.io.IOException => "" }
              val body = if (uuid.isEmpty) None
                else Some(markerDataPath(dst, uuid)).filter(fs.exists)
              body match {
                case Some(data) =>
                  if (fs.rename(data, dst) || fs.exists(dst)) {
                    fs.delete(st.getPath, false)
                    completed += version
                  } else skipped += version // rename lost, dst gone: retry later
                case None =>
                  fs.delete(st.getPath, false)
                  cleared += version
              }
            }
          } // marker of a published version: settled residue, vacuum's job
        case _ =>
      }
    }
    WedgeRecovery(completed.result(), cleared.result(), skipped.result())
  }

  /** The optimistic commit loop: try to publish on top of `base`; on
    * a lost race re-read the newest manifest, `validate` that this
    * mutation still commutes with what landed (throw if not), and
    * retry on top. `removed`/`added` describe the mutation as a file
    * delta; `fullReplace` ([[save]]) ignores the base file list
    * entirely. Every rebase re-checks the model pointer — a
    * concurrent retrain invalidates codes staged under the old model.
    */
  private[graft] def commitWithRetry(s: SparkSession, out: String, base: Manifest,
      schema: StructType, model: String, removed: Set[String],
      added: Seq[FileEntry], fullReplace: Boolean,
      validate: Manifest => Unit, maxRetries: Int = 10,
      pollBudgetMs: Long = 2000L): Unit = {
    var cur = base
    var attempts = 0
    var committed = false
    while (!committed) {
      val files =
        if (fullReplace) added
        else cur.files.filterNot(f => removed(f.path)) ++ added
      try {
        commitManifest(s, out, cur.version + 1, schema, model, files)
        committed = true
      } catch {
        case e: CommitConflictException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          // A lost race PROVES a writer was deciding this version —
          // but its PUBLISH may still be in flight (marker-protocol
          // stores decide via the marker and rename the manifest
          // body afterwards; a loser can lose, re-read, and find the
          // head not yet moved). Poll briefly for the head to
          // advance before concluding no-progress: giving up
          // instantly here was a REAL flake on a slow host (the
          // loser of two racing appends threw while the winner's
          // rename was scheduled out). A head that never moves is a
          // genuine wedge — recoverWedge's job, so still throw.
          // Early exit when marker inspection already PROVES a wedge
          // (marker-protocol stores only): the per-version marker is
          // decided (readable uuid), the winner's unique staged body
          // is gone, and the published dst is absent. Body-gone means
          // no rename can still land (S3-class copy+delete creates
          // dst BEFORE deleting the source, so a vanished source with
          // no dst is a crash, not an in-flight publish) — polling
          // longer cannot help. An EMPTY marker stays indistinguishable
          // from an in-flight create, so it rides the poll budget.
          def provenWedge: Boolean = {
            val (fs, dir) = hfs(s, manifestsDir(out))
            val dst = new Path(dir, manifestName(cur.version + 1))
            val mk = markerPath(dst)
            try {
              if (!fs.exists(mk)) false
              else {
                val uuid =
                  try {
                    val in = fs.open(mk)
                    try {
                      val buf = new java.io.ByteArrayOutputStream()
                      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096,
                        false)
                      new String(buf.toByteArray,
                        java.nio.charset.StandardCharsets.UTF_8).trim
                    } finally in.close()
                  } catch { case _: java.io.IOException => "" }
                uuid.nonEmpty &&
                  !fs.exists(markerDataPath(dst, uuid)) && !fs.exists(dst)
              }
            } catch { case _: java.io.IOException => false }
          }
          // Poll budget is PER CONFLICT, not total across retries
          // (ADVICE r19 #1): each retry only happens after the head
          // ADVANCED past cur — proof the store is live — so earlier
          // conflicts' waiting must not bankrupt a later one into a
          // spurious 'wedged' throw on a healthy-but-contended store.
          // A genuine wedge still fails within ONE ~pollBudgetMs
          // window (head never moves → throw below), and provenWedge
          // short-circuits marker-protocol wedges in milliseconds.
          var pollRemainingMs = pollBudgetMs
          var newest = requireManifest(s, out)
          var wedged = false
          while (newest.version <= cur.version && pollRemainingMs > 0 &&
              !wedged) {
            wedged = provenWedge
            if (!wedged) {
              Thread.sleep(50L)
              pollRemainingMs -= 50L
              newest = requireManifest(s, out)
            }
          }
          if (newest.version <= cur.version) throw e // wedged: give up
          if (!fullReplace && newest.model != cur.model)
            throw new IllegalStateException(
              "IndexStore: a concurrent save() recreated the index " +
                s"(model ${cur.model} -> ${newest.model}); codes staged " +
                "under the old model cannot be rebased")
          validate(newest)
          cur = newest
      }
    }
  }

  /** The `cell=<c>` path component's value for a manifest-relative
    * file path.
    */
  private def cellOf(rel: String): String =
    rel.takeWhile(_ != '/').stripPrefix("cell=")

  /** Write `df` (columns idCol, codeCol, cellCol) to a staging dir,
    * then move the part files into the live cell directories under
    * commit-unique names. Returns the moved files' manifest entries
    * (relative path + byte length — captured here so commits record
    * lengths and [[stats]] never stats files). Crash-safe: nothing
    * under a `cell=` dir is ever deleted or overwritten here, and the
    * files are invisible to readers until the caller commits a
    * manifest that lists them.
    */
  private[graft] def stageIn(df: DataFrame, out: String, idCol: String,
      cellCol: String, codeCol: String): Seq[FileEntry] = {
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
    val moved = Seq.newBuilder[FileEntry]
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
            moved += FileEntry(s"${cellDir.getPath.getName}/$name", f.getLen)
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
      files: Seq[FileEntry]): DataFrame =
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.option("basePath", codesRoot(out))
      .parquet(files.map(f => s"${codesRoot(out)}/${f.path}"): _*)

  /** Version-pinned resolved reads memoized per (session, out,
    * version) — Tables.t's footer-resolution memo applied to the
    * store: a committed version's file list is IMMUTABLE, so the
    * analyzed relation can be shared across queries (a serve fleet
    * re-reads the same pinned version hundreds of times; re-resolving
    * parquet footers on every read is a measured ~80 ms tax —
    * q131's round-16 drift). [[vacuum]] is the only operation that
    * deletes files belonging to committed versions, so it drops this
    * store's entries for its path; every other lifecycle op commits a
    * NEW version and therefore a new key. Entries for stopped
    * sessions are dropped lazily on lookup.
    */
  private val versionReadMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), (SparkSession, DataFrame)]()

  private def readVersion(s: SparkSession, out: String, version: Long,
      schema: StructType, files: Seq[FileEntry]): DataFrame =
    readMemoized(s, out, version.toString, schema, files)

  /** Memoized [[readFiles]] under an arbitrary immutable key — shared
    * by the version-pinned reads (key = version) and [[diff]]'s
    * changed-file reads (key = "diff±:v1:v2"): both read file SETS
    * that are immutable once the versions are committed, so the
    * resolved relation (the parquet footer resolution — a measured
    * ~80 ms Spark job per call even warm) is paid once per session.
    * Round 21: diff used to call readFiles directly, so every
    * q132-style audit serve re-resolved four footer sets — the bulk
    * of its 0.48 s pin and exactly the dispatch-latency class the
    * degraded-host gate kept flagging (VERDICT r20 next-round #4).
    */
  private def readMemoized(s: SparkSession, out: String, key: String,
      schema: StructType, files: Seq[FileEntry]): DataFrame = {
    versionReadMemo.entrySet()
      .removeIf(e => e.getValue._1.sparkContext.isStopped)
    val k = (graft.Tables.sessionToken(s), out, key)
    val existing = versionReadMemo.get(k)
    if (existing != null) existing._2
    else {
      val built = (s, readFiles(s, out, schema, files))
      val prev = versionReadMemo.putIfAbsent(k, built)
      if (prev != null) prev._2 else built._2
    }
  }

  private def dropVersionMemo(out: String): Unit =
    versionReadMemo.keySet().removeIf(_._2 == out)

  // ----------------------------------------------------------------
  // public lifecycle

  /** (Re)create the index as a FULL-SNAPSHOT commit: a fresh model
    * directory and a complete new file list at version n+1 (or v1 on
    * a fresh path). The previous version's files and model are left
    * in place for pinned readers and [[loadCodesAt]] until [[vacuum]]
    * — save no longer clears the layout, so a crash at any point
    * leaves the old index fully live, and the model swap is atomic
    * WITH the code swap (both ride the one manifest rename; a reader
    * resolving version n always pairs n's codes with n's model).
    */
  def save(encoded: DataFrame, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String,
      idCol: String = "vec_id", cellCol: String = "cell",
      codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    import s.implicits._
    val prev = currentManifest(s, out)
    val commitId = java.util.UUID.randomUUID.toString.take(8)
    val modelDir = s"m-$commitId"
    // model first: the manifest that references it is not yet visible
    cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (v, dim) => (cid, dim, v) }
    }.toDF("cid", "dim", "v")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${modelRoot(out)}/$modelDir/centroids")
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.flatMap { case (cw, cid) =>
        cw.zipWithIndex.map { case (v, dim) => (j, cid, dim, v) }
      }
    }.toDF("j", "cid", "dim", "v")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${modelRoot(out)}/$modelDir/codebooks")
    // read-order schema: data columns then the cell partition column
    val schema = encoded.select(col(idCol), col(codeCol), col(cellCol)).schema
    val files = stageIn(encoded, out, idCol, cellCol, codeCol)
    val base = prev.getOrElse(Manifest(0L, schema, modelDir, Seq.empty))
    // full replace: any interleaving serializes with this save last
    commitWithRetry(s, out, base, schema, modelDir, Set.empty, files,
      fullReplace = true, validate = _ => ())
  }

  /** Append newly encoded vectors to an existing index WITHOUT
    * touching resident codes: the new files land inside their `cell=`
    * directories and the next manifest version lists old ∪ new (the
    * model tables are immutable). Correct because cell assignment and
    * PQ codes are per-vector functions of the SAVED model, so
    * append-then-search is bit-identical to a full rebuild (pinned by
    * q121 against q103's oracle). Appends COMMUTE — file lists union
    * and the staged names are commit-unique — so a lost manifest race
    * rebases and retries, and two racing appends BOTH land (q133 runs
    * the race under the cross-engine gate). This is the 100 TB
    * maintenance story: one ingest stream and one maintenance loop
    * land commits INTO the index between retrains without
    * coordinating, while q106's drift gate and q108's migration audit
    * decide when the model itself has rotted enough to rebuild.
    */
  def append(encoded: DataFrame, out: String, idCol: String = "vec_id",
      cellCol: String = "cell", codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    val man = requireManifest(s, out)
    val files = stageIn(encoded, out, idCol, cellCol, codeCol)
    commitWithRetry(s, out, man, man.schema, man.model, Set.empty, files,
      fullReplace = false, validate = _ => ())
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
    *
    * A lost commit race rebases only while it stays conflict-free:
    * every rewritten file must still be live, and no interleaved
    * commit may have ADDED files to an affected cell (an appended
    * file could hold a tombstoned id the staged survivors never saw —
    * that is a genuine delete-vs-insert write conflict, thrown
    * loudly rather than silently resurrecting the id).
    */
  def delete(s: SparkSession, out: String, tombstones: DataFrame,
      idCol: String = "vec_id"): Unit = {
    val man = requireManifest(s, out)
    val ids = broadcast(tombstones.select(col(idCol)).distinct())
    val codes = readFiles(s, out, man.schema, man.files)
    val affected = codes.join(ids, Seq(idCol))
      .select(col("cell")).distinct().collect().map(_.get(0).toString).toSet
    if (affected.isEmpty) return
    val (affFiles, keptFiles) = man.files.partition(f => affected(cellOf(f.path)))
    val survivors = readFiles(s, out, man.schema, affFiles)
      .join(ids, Seq(idCol), "left_anti")
    val newFiles = stageIn(survivors, out, idCol, "cell", "code")
    val removed = affFiles.map(_.path).toSet
    commitWithRetry(s, out, man, man.schema, man.model, removed, newFiles,
      fullReplace = false, validate = validateDelete(man, affected, removed))
  }

  /** [[delete]]'s rebase validation, factored so the conflict matrix
    * is spec-testable deterministically: the rewritten files must
    * still be live, and no interleaved commit may have ADDED files to
    * an affected cell (an appended file may contain a tombstoned id
    * the staged survivors never scanned — the delete-vs-insert write
    * conflict, refused loudly instead of silently resurrecting ids).
    */
  private[graft] def validateDelete(base: Manifest, affected: Set[String],
      removed: Set[String])(newest: Manifest): Unit = {
    if (!removed.subsetOf(newest.paths))
      throw new IllegalStateException(
        "IndexStore.delete: a concurrent commit removed files this " +
          "delete rewrote — the staged survivors are stale; re-run " +
          "the delete against the current version")
    val grown = newest.paths -- base.paths
    if (grown.exists(p => affected(cellOf(p))))
      throw new IllegalStateException(
        "IndexStore.delete: a concurrent commit appended into an " +
          "affected cell — the new file may contain tombstoned ids " +
          "this delete never scanned; re-run the delete against the " +
          "current version")
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
    *
    * A lost commit race rebases while every rewritten file is still
    * live (rows can't be lost or doubled); a file concurrently
    * removed means the rewrite is stale — conflict. Files a racing
    * append added to a compacted cell simply stay listed: content
    * union is preserved either way.
    */
  def compact(s: SparkSession, out: String, maxFilesPerCell: Int = 4)
      : Unit = {
    val man = requireManifest(s, out)
    pruneIngestLog(s, out)
    val byCell = man.files.groupBy(f => cellOf(f.path))
    val oversized = byCell.filter(_._2.size > maxFilesPerCell).keySet
    if (oversized.isEmpty) return
    val (bigFiles, keptFiles) =
      man.files.partition(f => oversized(cellOf(f.path)))
    val rewritten = stageIn(readFiles(s, out, man.schema, bigFiles), out,
      "vec_id", "cell", "code")
    val removed = bigFiles.map(_.path).toSet
    commitWithRetry(s, out, man, man.schema, man.model, removed, rewritten,
      fullReplace = false, validate = validateCompact(removed))
  }

  /** [[compact]]'s rebase validation: every rewritten file must still
    * be live (else rows could be lost or doubled); files a racing
    * append added to a compacted cell simply stay listed — content
    * union is preserved either way.
    */
  private[graft] def validateCompact(removed: Set[String])
      (newest: Manifest): Unit =
    if (!removed.subsetOf(newest.paths))
      throw new IllegalStateException(
        "IndexStore.compact: a concurrent commit removed files this " +
          "compaction rewrote — re-run against the current version")

  /** Garbage-collect: retain the newest `keepVersions` manifests —
    * plus every manifest younger than `minAgeMs`, the
    * expire-snapshots pin window: a vacuum issued with a retention
    * window covering a reader's pinned version can never collect it —
    * and delete every data file and model directory no retained
    * version references, empty cell directories, crashed writers'
    * staging residue, and the superseded manifests.
    *
    * Vacuum is a WRITER under the single-writer-at-a-time contract:
    * an in-flight mutation's staged files are unreferenced by ANY
    * manifest until its commit, so a concurrent vacuum would collect
    * them and the mutation would publish a manifest pointing at
    * deleted files. Do not run vacuum concurrently with mutations.
    * `minAgeMs` is the defense-in-depth if that rule is broken:
    * staging directories and unreferenced files younger than the
    * window are skipped, so a vacuum racing a mutation that started
    * within the window degrades to "missed garbage", not corruption.
    * The DEFAULT window is one hour (the Iceberg expire-snapshots
    * posture): a vacuum issued with defaults can never collect the
    * staged-but-uncommitted files of any mutation started within the
    * last hour, so an operator mistake needs BOTH a broken writer
    * rule and an explicit `minAgeMs = 0` to corrupt anything. Pass 0
    * only when writers are provably quiesced and space must be
    * reclaimed immediately (tests, decommission).
    */
  def vacuum(s: SparkSession, out: String, keepVersions: Int = 1,
      minAgeMs: Long = 3600000L): Unit = {
    require(keepVersions >= 1, "IndexStore.vacuum: keepVersions must be >= 1")
    // vacuum is the one operation that deletes files of committed
    // versions — memoized resolved reads for this path must not
    // outlive them
    dropVersionMemo(out)
    val (fs, root) = hfs(s, codesRoot(out))
    val cutoff = System.currentTimeMillis() - minAgeMs
    // minAgeMs == 0 means "no pin window": everything unreferenced is
    // collectable NOW, including same-millisecond files
    def aged(mtime: Long): Boolean = minAgeMs <= 0L || mtime < cutoff
    val mans = listManifests(fs, new Path(manifestsDir(out)))
    require(mans.nonEmpty, s"IndexStore.vacuum: no manifest under $out")
    val nRetain =
      math.max(keepVersions, mans.count(m => !aged(m._3)))
    val (old, retained) = mans.splitAt(math.max(0, mans.size - nRetain))
    val live: Set[String] = retained.flatMap { case (v, p, _) =>
      readManifest(fs, v, p).files.map(_.path)
    }.toSet
    val liveModels: Set[String] = retained.map { case (v, p, _) =>
      readManifest(fs, v, p).model
    }.toSet
    fs.listStatus(root).toSeq.foreach { st =>
      val p = st.getPath
      if (p.getName.startsWith("_staging-")) {
        if (aged(st.getModificationTime)) fs.delete(p, true)
      } else if (p.getName.startsWith("cell=")) {
        fs.listStatus(p).toSeq
          .filter(f => !live(s"${p.getName}/${f.getPath.getName}") &&
            aged(f.getModificationTime))
          .foreach(f => fs.delete(f.getPath, false))
        if (fs.listStatus(p).isEmpty) fs.delete(p, false)
      }
    }
    val (mfs, mroot) = hfs(s, modelRoot(out))
    if (mfs.exists(mroot)) mfs.listStatus(mroot).toSeq
      .filter(st => st.getPath.getName.startsWith("m-") &&
        !liveModels(st.getPath.getName) && aged(st.getModificationTime))
      .foreach(st => mfs.delete(st.getPath, true))
    old.foreach { case (_, p, _) => fs.delete(p, false) }
    // marker-protocol residue (see publishByMarker): settled versions'
    // .winner-/.data- files and crashed contenders' .tmp- files. A
    // dot-file for a version AT OR BELOW the committed head is settled
    // (its race was decided and published); one ABOVE the head may be
    // an in-flight commit — never touched.
    val head = mans.last._1
    val mdir = new Path(manifestsDir(out))
    fs.listStatus(mdir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        val versioned = "^\\.(?:winner|data)-v(\\d{9})\\.manifest.*$".r
        n match {
          case _ if !aged(st.getModificationTime) => false
          case versioned(v) => v.toLong <= head
          case _ => n.startsWith(".tmp-")
        }
      }
      .foreach(st => fs.delete(st.getPath, false))
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

  /** ROLL BACK: commit a retained version's exact file list (and its
    * model pointer) as the new head — the bad-batch undo. Nothing is
    * copied or rewritten: version n+1 simply references the same
    * immutable files version `toVersion` did, so rollback is one
    * manifest write regardless of index size, readers pinned to any
    * version are untouched, and the rolled-past versions remain on
    * disk for [[diff]]/audit until [[vacuum]]. Requires `toVersion`
    * not vacuumed.
    *
    * CONCURRENCY: without `expectHead`, rebase semantics are
    * [[save]]'s (full replace — any interleaving serializes with the
    * restore last). That blanket rule has one sharp edge: a restore
    * racing a takedown [[delete]] silently UN-DOES the delete
    * (tombstoned ids resurrect with no signal — a legal-compliance
    * incident class, not a consistency bug). So either QUIESCE
    * takedown pipelines around rollbacks, or pass
    * `expectHead = Some(v)` with the head version the operator
    * decided the rollback against: the restore then commits ONLY on
    * top of exactly that head and throws if ANY commit (including a
    * delete) landed in between — one manifest version compare, the
    * CAS form of the undo.
    */
  def restore(s: SparkSession, out: String, toVersion: Long,
      expectHead: Option[Long] = None): Unit = {
    val target = manifestAt(s, out, toVersion)
    val cur = requireManifest(s, out)
    expectHead.filter(_ != cur.version).foreach { h =>
      throw new IllegalStateException(
        s"IndexStore.restore: head moved (expected version $h, found " +
          s"${cur.version}) — a commit landed after the rollback " +
          "decision was made (possibly a takedown delete this restore " +
          "would silently resurrect); re-examine the history and " +
          "re-issue against the current head")
    }
    if (cur.version == toVersion) return
    commitWithRetry(s, out, cur, target.schema, target.model, Set.empty,
      target.files, fullReplace = true,
      validate = newest => expectHead.foreach { h =>
        // CAS mode: ANY interleaved commit violates the expected head
        throw new IllegalStateException(
          s"IndexStore.restore: head moved (expected version $h, " +
            s"found ${newest.version}) during the commit — a racing " +
            "writer landed; re-examine the history and re-issue " +
            "against the current head")
      })
  }

  /** The commit history still on disk: one row per retained manifest
    * (version, n_files, n_cells, bytes) — METADATA only (file lengths
    * ride in the manifests), newest last. After [[vacuum]] only the
    * retained window remains.
    */
  def history(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    val (fs, dir) = hfs(s, manifestsDir(out))
    listManifests(fs, dir).map { case (v, p, _) =>
      val m = readManifest(fs, v, p)
      (v, m.files.size.toLong,
        m.files.map(f => cellOf(f.path)).distinct.size.toLong,
        m.files.map(_.len).sum)
    }.toDF("version", "n_files", "n_cells", "bytes").orderBy("version")
  }

  /** Time-travel read: the code table AS OF a specific committed
    * version (must not have been [[vacuum]]ed away). The serve-side
    * use is a search fleet pinning one version across its queries
    * while maintenance commits land; the audit-side use is [[diff]].
    */
  def loadCodesAt(s: SparkSession, out: String, version: Long): DataFrame = {
    val m = manifestAt(s, out, version)
    readVersion(s, out, m.version, m.schema, m.files)
  }

  /** Audit diff between two retained versions — what the commits
    * between v1 and v2 did to the index, per cell: files added and
    * removed (pure manifest METADATA — file lists are immutable, so
    * set difference IS the physical change) and code rows added and
    * removed (the data-side ledger a takedown audit or an ingest
    * reconciliation reads). Cells appear when anything changed;
    * zero-filled otherwise. Certified cross-engine by q132: the
    * append (q121) and delete (q122) indexes diffed v1→v2 against an
    * oracle computing the same ledger from the corpus.
    *
    * Scale: the read is pruned to the CHANGED files only — files are
    * immutable and each version's ids are unique (the store's
    * invariant: save/append land distinct vectors, delete removes,
    * compact preserves), so an id is added iff it is in an
    * added-but-no-removed file and vice versa. Two anti-joins over
    * O(change) rows — diffing a week of maintenance on a 100 TB
    * index reads the week's churn, never the index.
    */
  def diff(s: SparkSession, out: String, v1: Long, v2: Long,
      idCol: String = "vec_id"): DataFrame = {
    import s.implicits._
    val m1 = manifestAt(s, out, v1)
    val m2 = manifestAt(s, out, v2)
    val addedPaths = m2.paths -- m1.paths
    val removedPaths = m1.paths -- m2.paths
    def fileCounts(paths: Set[String]): Map[Int, Long] =
      paths.toSeq.map(p => cellOf(p).toInt)
        .groupBy(identity).map { case (c, ps) => (c, ps.size.toLong) }
    val fAdd = fileCounts(addedPaths)
    val fRem = fileCounts(removedPaths)
    // changed-file reads are memoized like version-pinned reads: the
    // two file subsets are immutable once v1/v2 are committed, and an
    // audit serve must not pay 2 fresh footer resolutions per diff
    val cA = readMemoized(s, out, s"diff+:$v1:$v2", m2.schema,
      m2.files.filter(f => addedPaths(f.path))).select(col(idCol), col("cell"))
    val cR = readMemoized(s, out, s"diff-:$v1:$v2", m1.schema,
      m1.files.filter(f => removedPaths(f.path))).select(col(idCol), col("cell"))
    // ONE union + aggregate instead of the old per-measure aggregates
    // stitched with three full_outer joins: semantically identical
    // (a cell appears iff anything changed; absent measures sum to
    // 0), but the join ladder planned 4 extra exchanges that AQE
    // materialized as 4 extra sequential jobs per diff — the round-21
    // task census read q132 (two diffs) at 16 jobs per warm serve,
    // the highest dispatch count in the suite, for a result of a few
    // dozen rows. The file measures ride in as one driver-side
    // literal relation.
    //
    // Round 22 (guide §2.4): the added/removed sides were two
    // ANTI-JOINS of the same two change sets on the same key — two
    // join chains reading each side twice. Ids are unique per side
    // (the store's invariant above), so one union tagged ±1 and one
    // groupBy(id) classifies every id in a single exchange: net +1 =
    // added (in v2's added files only), net -1 = removed, net 0 = in
    // both (rewritten file, e.g. compact) — exactly the pair the
    // anti-joins excluded.
    val codeRows = cA.select(col(idCol), col("cell"), lit(1L).as("tag"))
      .unionByName(cR.select(col(idCol), col("cell"), lit(-1L).as("tag")))
      .groupBy(col(idCol))
      .agg(sum("tag").as("net"),
        max(when(col("tag") === 1L, col("cell"))).as("cell_a"),
        max(when(col("tag") === -1L, col("cell"))).as("cell_r"))
      .filter(col("net") =!= 0L)
      .select(
        when(col("net") === 1L, col("cell_a")).otherwise(col("cell_r"))
          .as("cell"),
        when(col("net") === 1L, lit(1L)).otherwise(lit(0L))
          .as("codes_added"),
        when(col("net") === 1L, lit(0L)).otherwise(lit(1L))
          .as("codes_removed"),
        lit(0L).as("files_added"), lit(0L).as("files_removed"))
    val fileRows = (fAdd.keySet ++ fRem.keySet).toSeq
      .map(c => (c, 0L, 0L, fAdd.getOrElse(c, 0L), fRem.getOrElse(c, 0L)))
      .toDF("cell", "codes_added", "codes_removed",
        "files_added", "files_removed")
    codeRows.unionByName(fileRows)
      .groupBy("cell")
      .agg(sum("files_added").as("files_added"),
        sum("files_removed").as("files_removed"),
        sum("codes_added").as("codes_added"),
        sum("codes_removed").as("codes_removed"))
      .select(col("cell"), col("files_added"), col("files_removed"),
        col("codes_added"), col("codes_removed"))
      .orderBy("cell")
  }

  /** Operational DESCRIBE of a persisted index: per-cell code count,
    * live file count, and bytes — the health table the maintenance
    * loop reads to decide [[append]]/[[delete]]/[[compact]]/retrain
    * (file fan-out → compact; occupancy skew vs q106's drift gate →
    * retrain). The code counts come from one cell-keyed aggregate
    * over the (column-pruned) code scan; the file/byte columns come
    * straight from the manifest, which records each file's length at
    * commit time — NO filesystem call per file, so stats on a
    * million-file index is one manifest read plus the data aggregate.
    */
  def stats(s: SparkSession, out: String): DataFrame = {
    import s.implicits._
    val man = requireManifest(s, out)
    val counts = readFiles(s, out, man.schema, man.files)
      .groupBy("cell").agg(count(lit(1)).as("n_codes"))
    val files = man.files.groupBy(f => cellOf(f.path)).toSeq
      .map { case (c, fsq) => (c.toInt, fsq.size.toLong, fsq.map(_.len).sum) }
      .toDF("cell", "n_files", "bytes")
    counts.join(files, Seq("cell")).orderBy("cell")
  }

  /** The cell-partitioned code table at the newest committed version;
    * filter on `cell` before use so partition pruning cuts the scan
    * to the probed files. The returned frame is PINNED to this
    * version's files — later commits don't change what it reads.
    */
  def loadCodes(s: SparkSession, out: String): DataFrame = {
    val man = requireManifest(s, out)
    readVersion(s, out, man.version, man.schema, man.files)
  }

  /** The model the CURRENT version searches under (the manifest's
    * model pointer — a retrain swaps codes and model in one atomic
    * commit, so a reader never pairs new codes with an old model).
    */
  def loadCentroids(s: SparkSession, out: String): Seq[Seq[Double]] =
    centroidsFrom(s, out, requireManifest(s, out).model)

  def loadCodebooks(s: SparkSession, out: String): Seq[Seq[Seq[Double]]] =
    codebooksFrom(s, out, requireManifest(s, out).model)

  /** The model AS OF a retained version — the other half of
    * [[loadCodesAt]]: a time-travel search across a retrain must pair
    * version v's codes with version v's model (the manifest pins
    * both), or the ADC arithmetic is nonsense.
    */
  def loadCentroidsAt(s: SparkSession, out: String, version: Long)
      : Seq[Seq[Double]] =
    centroidsFrom(s, out, manifestAt(s, out, version).model)

  def loadCodebooksAt(s: SparkSession, out: String, version: Long)
      : Seq[Seq[Seq[Double]]] =
    codebooksFrom(s, out, manifestAt(s, out, version).model)

  private def centroidsFrom(s: SparkSession, out: String, model: String)
      : Seq[Seq[Double]] =
    s.read.parquet(s"${modelRoot(out)}/$model/centroids")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

  private def codebooksFrom(s: SparkSession, out: String, model: String)
      : Seq[Seq[Seq[Double]]] =
    s.read.parquet(s"${modelRoot(out)}/$model/codebooks")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, sub) =>
        sub.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .map { case (_, rows) =>
            rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
          }
      }
}
