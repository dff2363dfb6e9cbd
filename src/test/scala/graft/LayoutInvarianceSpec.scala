package graft

import org.scalatest.funsuite.AnyFunSuite

/** BLANKET output-determinism certificate (round 18): every gated
  * query, executed under two different shuffle layouts, must produce
  * BIT-IDENTICAL rows in IDENTICAL order.
  *
  * What this catches that the oracle gate cannot: the DuckDB compare
  * certifies one Spark execution against one DuckDB execution — a
  * query that is nondeterministic ACROSS Spark layouts (an
  * order-dependent float reduction that survived the round-18
  * integer-routing sweep, a non-total ORDER BY that happens to be
  * stable at 32 partitions, a first()/limit without a deterministic
  * sort) can still flake the gate on the next re-layout (AQE
  * decision, executor count change, driver re-run). Varying
  * `spark.sql.shuffle.partitions` varies the partial-aggregation
  * grouping, the reduction tree, and the merge order — the
  * dimensions a 1000-executor cluster varies per run.
  *
  * Caveats: CachedPlans memos are built once per (session, dir)
  * under whichever layout runs first, so memoized SUB-PLANS are not
  * re-laid-out here (q97's dedicated test re-executes its own
  * builder for that); what this blanket pass certifies is every
  * query's POST-MEMO stages — the joins, aggregations, windows, and
  * presentation sorts that re-execute per invocation. The two passes
  * run on a DEDICATED child session (`newSession()`: own SQLConf,
  * shared context), never mutating the shared test session's conf —
  * sbt runs suites concurrently in the forked JVM, and a shared-conf
  * flip mid-run corrupts PlanShapeSpec's pinned Exchange shapes.
  * They also run against a PRIVATE COPY of the sf0.001 dir: cached
  * plans live in the CONTEXT-wide CacheManager and are matched by
  * logical-plan equality across sessions, so caching the stock dir
  * under this spec's layouts would splice foreign-partitioned
  * InMemoryRelations into concurrently-running suites' plans (seen
  * as PlanShapeSpec exchange-count drift); a distinct path makes
  * every relation here unmatchable elsewhere.
  */
class LayoutInvarianceSpec extends AnyFunSuite with SharedSpark {

  /** Private copy of the sf0.001 fixture, RECURSIVE and
    * staleness-keyed: the copy is fingerprinted on the source tree's
    * (relative path, size, mtime) triples, and a mismatch deletes and
    * re-copies the whole tree. A flat non-recursive copy reusing any
    * existing tmp dir (the round-18 form) would silently certify
    * against stale data after a fixture regeneration, or against
    * EMPTY subdirectories if the fixture ever becomes partitioned
    * parquet directories. */
  private def privateCopy(tag: String): String = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val src = Paths.get("/root/testdata/sf0.001")
    val dst = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-layout-$tag")
    def walk(p: Path): Seq[Path] = {
      val s = Files.walk(p)
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[Path]
        while (it.hasNext) b += it.next()
        b.result()
      } finally s.close()
    }
    def fingerprint(root: Path): String =
      walk(root).filter(Files.isRegularFile(_)).map { p =>
        s"${root.relativize(p)}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"
      }.sorted.mkString("\n")
    val want = fingerprint(src)
    val marker = dst.resolve(".src-fingerprint")
    val fresh = Files.isRegularFile(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == want
    if (!fresh) {
      if (Files.exists(dst))
        walk(dst).sortBy(-_.getNameCount).foreach(Files.delete)
      walk(src).foreach { p =>
        val to = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(to)
        else Files.copy(p, to, StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(marker, want.getBytes("UTF-8"))
    }
    dst.toString
  }

  /** Bit-level canonical form of a collected value: doubles/floats by
    * RAW bits (NaN payloads and -0.0 distinguished), binary by
    * content (Row.toString is identity-based for Array[Byte]),
    * containers recursively. Map entries are sorted — SQL maps are
    * unordered, so entry order is the one layout-varying dimension
    * that is NOT a determinism defect. */
  private def canon(v: Any): String = v match {
    case null => "null"
    case d: Double => "D" + java.lang.Double.doubleToRawLongBits(d)
    case f: Float => "F" + java.lang.Float.floatToRawIntBits(f)
    case b: Array[Byte] =>
      "B" + java.util.Base64.getEncoder.encodeToString(b)
    case a: Array[_] => a.map(canon).mkString("A[", ",", "]")
    case s: scala.collection.Seq[_] =>
      s.map(canon).mkString("S[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "->" + canon(x) }
        .sorted.mkString("M[", ",", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canon).mkString("R[", ",", "]")
    case other => other.getClass.getSimpleName + ":" + other.toString
  }

  private val dir: String = privateCopy("sf0.001")

  test("all gated queries are bit-identical across shuffle layouts") {
    val s = spark.newSession()
    val key = "spark.sql.shuffle.partitions"
    val names = SparkEntry.queries.keys.toSeq.sorted
    s.conf.set(key, "32")
    val at32 = names.map { n =>
      n -> SparkEntry.queries(n)(s, dir).collect()
        .map(canon).toSeq
    }.toMap
    s.conf.set(key, "7")
    val diffs = names.flatMap { n =>
      val at7 = SparkEntry.queries(n)(s, dir).collect()
        .map(canon).toSeq
      if (at7 == at32(n)) None
      else {
        val i = at7.zipAll(at32(n), "<missing>", "<missing>")
          .indexWhere { case (a, b) => a != b }
        Some(s"$n: first diff at row $i:\n  7 : " +
          s"${at7.lift(i).getOrElse("<missing>")}\n  32: " +
          s"${at32(n).lift(i).getOrElse("<missing>")}")
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries diverged across layouts:\n" +
        diffs.mkString("\n"))
  }

  test("memo-heavy queries are bit-identical when their memoized " +
      "builds themselves run under different layouts") {
    // The blanket test re-lays-out only post-memo stages (memos build
    // once per session). Close the gap for a representative sample of
    // the heaviest MEMOIZED builders — shingle/minhash signatures,
    // the BM25 index, the drift ledgers (incl. a streamed gate), the
    // two-phase interleave, the DSIR model — by running each in TWO
    // fresh sessions whose FIRST execution (and therefore every memo
    // build) happens under a different shuffle layout. Each session
    // gets its own private dir copy: identical logical plans over the
    // SAME path would plan-match the other session's cached
    // InMemoryRelations in the context-wide CacheManager and defeat
    // the re-layout (the PlanShapeSpec interference mechanism, pinned
    // above).
    val sample = Seq("q29_minhash_sigs", "q54_bm25", "q104_drift_psi",
      "q115_interleave_rangepart", "q124_dsir_weights")
    def runAll(layout: String, tag: String): Map[String, Seq[String]] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", layout)
      val d = privateCopy(tag)
      sample.map { n =>
        n -> SparkEntry.queries(n)(s, d).collect().map(canon).toSeq
      }.toMap
    }
    val a = runAll("32", "memoA")
    val b = runAll("5", "memoB")
    sample.foreach { n =>
      assert(a(n) == b(n), s"$n diverged when its memo builds ran " +
        "under different layouts")
    }
  }
}
