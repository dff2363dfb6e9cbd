package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata star schema
  * (see /root/repo/TESTDATA.md). All queries take the sf dir as a
  * parameter so the same plan runs at any scale factor — at cluster
  * scale the same code points at a 100 TB lake; nothing below assumes
  * data fits anywhere.
  */
object Tables {
  /** `spark.read.parquet` is NOT free per call: schema resolution
    * lists the path and reads parquet footers — a measured ~80 ms per
    * invocation even warm (the footer read is a Spark job). A bench or
    * service session issues hundreds of queries over the same ten
    * tables, so the resolved DataFrame (the analyzed relation — NOT a
    * materialized cache) is memoized per (session, dir, table),
    * exactly what a metastore catalog does for `spark.table(...)`:
    * resolve the schema once per session, not once per query. The
    * logical plan is immutable, so sharing one instance across
    * queries (including self-joins — the analyzer deduplicates
    * attribute ids) is safe; filters and column pruning still push
    * into the shared relation during each query's own optimization.
    * Entries for stopped sessions are dropped lazily on lookup.
    */
  private val readMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  /** A GUARANTEED-unique live-session token for memo keys.
    * `System.identityHashCode` is not collision-free — two live
    * sessions sharing one SparkContext (`newSession()`) could
    * collide and read a DataFrame resolved under the other session's
    * conf — so classic sessions key by `sessionUUID` (unique per
    * SparkSession instance by construction). The identity-hash form
    * survives only as a fallback for non-classic implementations.
    */
  private val sessionUuidMethod: Option[java.lang.reflect.Method] =
    // Scala-restricted (private[sql]) but public in bytecode
    scala.util.Try(Class
      .forName("org.apache.spark.sql.classic.SparkSession")
      .getMethod("sessionUUID")).toOption

  private[graft] def sessionToken(s: SparkSession): String =
    sessionUuidMethod
      .filter(_.getDeclaringClass.isInstance(s))
      .map(_.invoke(s).asInstanceOf[String])
      .getOrElse(s"idh${System.identityHashCode(s)}")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    readMemo.entrySet().removeIf(e => e.getValue._1.sparkContext.isStopped)
    val key = s"${sessionToken(spark)}:" +
      s"${spark.sparkContext.applicationId}:$dir:$name"
    val existing = readMemo.get(key)
    if (existing != null) existing._2
    else {
      val built = (spark, spark.read.parquet(s"$dir/$name.parquet"))
      val prev = readMemo.putIfAbsent(key, built)
      if (prev != null) prev._2 else built._2
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  /** events.parquet has shipped with two physical `ts` layouts across
    * testdata generations: TIMESTAMP(NANOS) (rejected by Spark's
    * vectorized reader — read as raw int64 nanos via the legacy conf
    * and rebuild, micros-aligned) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Both normalize to one session-UTC TimestampType
    * column so every downstream query sees a single schema. The NTZ
    * branch's cast interprets the naive wall time IN THE SESSION
    * TIME ZONE — the int64-nanos branch is epoch-based and
    * timezone-independent — so the session zone is pinned to UTC
    * here (not just in the entry points): the two physical layouts
    * must yield the same instants for ANY caller, and every oracle
    * twin reads the parquet as naive-UTC.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Memoized cached plans. Query modules cache shared sub-plans
  * (shingle index, MinHash signatures, quantized vectors) because each
  * is referenced 2-3x by self-joins; caching anew on EVERY query
  * invocation would accumulate orphaned cached RDDs in executor
  * storage across repeated runs in one session (bench loops, the
  * driver harness). Memoizing per (session, sf dir, tag) makes the
  * cache build once and be reused — the cluster-scale analog is
  * "materialize the index table once". Entries for stopped sessions
  * are dropped lazily on the next lookup.
  */
object CachedPlans {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  def of(s: SparkSession, dir: String, tag: String)(build: => DataFrame): DataFrame = {
    memo.entrySet().removeIf(e => e.getValue._1.sparkContext.isStopped)
    val key =
      s"${Tables.sessionToken(s)}:${s.sparkContext.applicationId}:$dir:$tag"
    // get-then-putIfAbsent instead of computeIfAbsent: builders nest
    // (the shingle index builds on the cached token table), and a
    // nested computeIfAbsent on one ConcurrentHashMap is a recursive
    // update. The race (two threads building the same plan) is benign:
    // CacheManager keys cached data by canonicalized plan, so the
    // loser's cache() resolves to the winner's entry (no leaked
    // second copy).
    val existing = memo.get(key)
    if (existing != null) existing._2
    else {
      val built = (s, build.cache())
      val prev = memo.putIfAbsent(key, built)
      if (prev != null) prev._2 else built._2
    }
  }

  /** Cap on [[layout]]'s derived partition count — matches the
    * Components loop's bound; a memo near this size should be
    * reconsidered as a memo at all. */
  private val MaxLayoutParts = 1L << 14

  /** rowsPerPart target for `narrow-driver` memos (MEMOS.md layout
    * column): label tables, key-cardinality occupancies — one
    * partition until the memo is genuinely large. */
  val NarrowDriverRows: Long = 1L << 20
  /** rowsPerPart target for `narrow-pair` memos: candidate-edge
    * lists, per-doc signature tables — the Components loop's
    * ~64k-edges-per-partition budget. */
  val NarrowPairRows: Long = 1L << 16

  private[graft] def partsFor(rows: Long, rowsPerPart: Long, minParts: Int): Int =
    math.max(minParts.toLong,
      math.min((rows + rowsPerPart - 1) / rowsPerPart, MaxLayoutParts)).toInt

  /** MEASURED narrow layout for a memo build (VERDICT r20 next-round
    * #2): partitions ∝ memo rows — never `spark.sql.shuffle.partitions`
    * and never a bench-sf literal. Round 20 fixed the cached-plan
    * fan-out class (a cached aggregate keeps its 32 post-shuffle
    * partitions; every serve over a key-cardinality memo then fans
    * into 32 near-empty tasks) with per-site `coalesce(1)/coalesce(4)`
    * literals; those were correct at bench sf and silently wrong at
    * 100× — a forgotten `coalesce(4)` CAP on a grown `cc_edges` would
    * bottleneck the whole graph family into 4 tasks. This helper is
    * the `Components.nParts` precedent applied to memo layout: the
    * build is materialized once (eager localCheckpoint — also
    * truncates lineage, the `Components.pin` device), its row count
    * read from the materialized blocks (cheap), and the partition
    * count derived as ceil(rows / rowsPerPart), floored at `minParts`
    * (a PARALLELISM floor for multi-task serve stages — scale-free,
    * unlike a cap). `coalesce` on the checkpointed plan is a narrow
    * merge (no exchange), and an explicit count is exempt from AQE's
    * cached-plan re-planning, so the layout sticks.
    *
    * Targets are per layout class (MEMOS.md `layout` column):
    * narrow-driver memos (labels, occupancies) use a large
    * rowsPerPart (driver-value-sized → 1 partition until genuinely
    * large); narrow-pair memos (edge lists, signatures) a smaller one
    * with a small minParts floor.
    *
    * Round 22 (ADVICE r21 #2 — EXAMINED AND DECLINED, with
    * measurement): three cache()-based single/dual-copy variants were
    * built and A/B-probed against this form on the same host window,
    * and every one lost, because the eager localCheckpoint's REAL
    * load-bearing property here is LINEAGE TRUNCATION, not just
    * materialization. The checkpointed memo is a leaf: every
    * downstream cache lookup and AQE stage canonicalizes a tiny plan.
    * With `cache()`+count the full build lineage (edges → shingles →
    * tokens → parquet) stays inside every consumer's analyzed tree,
    * and q100's warm serve went 0.40-0.52 s → 2.3 s at IDENTICAL
    * 6-stage dispatch — pure driver-side planning/canonicalization
    * cost, paid per serve forever, against a one-off double-storage
    * saving. Variant (a) (uncached coalesce, `of` skips its cache)
    * additionally re-ran the merge once per consumer REFERENCE
    * (q100/q85/q80 reference the edge memo 2-3× per plan; per-task
    * time tripled); variant (b) (eager unpersist of the build copy)
    * made CacheManager re-cache every dependent plan containing the
    * dropped subtree, losing their materialized data (q100 5.6 s).
    * The advice's remaining hazards are accepted as bounded: the
    * build-race checkpoint leak needs two threads to FIRST-build the
    * same memo in one session (bench/verify build serially; leaked
    * blocks are dropped with the session), and executor loss in
    * local mode is process death.
    */
  def layout(df: DataFrame, rowsPerPart: Long, minParts: Int = 1): DataFrame = {
    require(rowsPerPart > 0, "rowsPerPart must be positive")
    val staged = df.localCheckpoint()
    val n = staged.count()
    staged.coalesce(partsFor(n, rowsPerPart, minParts))
  }

  /** [[layout]]'s serve-side sibling for presentations that scan a
    * deliberately wide cached memo (q31 over the 32-way simhash
    * cache): narrows the near-empty scan by the memo's MEASURED row
    * count, with the count itself memoized per (session, dir, tag) so
    * only the first serve pays the (cached-scan) count job.
    */
  def sizedCoalesce(s: SparkSession, dir: String, tag: String,
      df: DataFrame, rowsPerPart: Long, minParts: Int = 1): DataFrame = {
    val n = CachedPlans.valueOf(s, dir, s"$tag:nrows")(df.count())
    df.coalesce(partsFor(n, rowsPerPart, minParts))
  }

  /** Unique memory-sink name for a stream==batch gate builder. The
    * putIfAbsent race above intentionally tolerates duplicate
    * concurrent builder runs — but two builders racing the SAME
    * gated query would collide on a fixed `.queryName` and throw
    * (active streaming query names must be unique per session). A
    * per-invocation counter keeps the active names disjoint; the
    * memo still dedupes the RESULT, and the loser's memory-sink
    * table is just an unreferenced leftover.
    */
  private val sinkCounter = new java.util.concurrent.atomic.AtomicLong()
  def sinkName(prefix: String, dir: String): String =
    prefix + math.abs(dir.hashCode) + "_" + sinkCounter.incrementAndGet()

  /** [[of]] for DRIVER-SIDE model values (a trained centroid table, a
    * built Bloom filter): same key discipline and benign-race
    * semantics, no cache() — the value is already local. For
    * build-once-per-corpus artifacts whose construction is a Spark
    * ACTION (collect/head), which `of` cannot absorb: without this,
    * every serve pays the build job's dispatch latency again.
    */
  private val valueMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, Any)]()

  def valueOf[T](s: SparkSession, dir: String, tag: String)(build: => T): T = {
    valueMemo.entrySet().removeIf(e => e.getValue._1.sparkContext.isStopped)
    val key =
      s"${Tables.sessionToken(s)}:${s.sparkContext.applicationId}:$dir:$tag"
    val existing = valueMemo.get(key)
    if (existing != null) existing._2.asInstanceOf[T]
    else {
      val built = (s, build: Any)
      val prev = valueMemo.putIfAbsent(key, built)
      (if (prev != null) prev._2 else built._2).asInstanceOf[T]
    }
  }
}

/** ORDER-INDEPENDENT exact summation of per-row bit-identical DOUBLE
  * terms — the device that removed the last `round(·, N>0)` sites
  * from the gated SQL (the q84/q169 midpoint class: Spark rounds the
  * exact shortest-decimal of a double HALF_UP while DuckDB rounds the
  * binary-scaled product, so any value within an ulp of a 0.5·10⁻ᴺ
  * boundary can round differently — and a sum whose reduction order
  * differs between engines can land on either side of that boundary).
  *
  * The replacement: quantize each TERM with a scale-0 `round(t·10^q)`
  * — scale-0 rounding is cross-engine exact (there is no inexact
  * decimal rescaling inside the round: a double strictly below an
  * integer midpoint has a shortest decimal representation strictly
  * below it too, since the representation must round-trip, and at an
  * exact midpoint both engines round away from zero) — then sum the
  * resulting integers exactly in DECIMAL(38,0) (order-independent,
  * 128-bit headroom in both engines), and divide once at the end.
  * The summed terms must each be bit-identical cross-engine (pure
  * IEEE arithmetic over identical inputs); the device makes the SUM
  * deterministic, it cannot repair divergent terms.
  */
object ExactSum {
  /** SQL fragment for the exact integer sum of round(term·10^q):
    * identical text runs in Spark and DuckDB. Spark's SUM(DECIMAL
    * (38,0)) stays DECIMAL(38,0); DuckDB's SUM(DECIMAL(38,0)) too.
    */
  def sumQ(term: String, q: Int): String =
    s"CAST(SUM(CAST(round(($term) * 1e$q) AS DECIMAL(38,0))) AS DECIMAL(38,0))"

  /** Scala lockstep for streaming scorers that must reproduce the
    * gated SQL value exactly: Spark's Round(double, 0) semantics
    * (BigDecimal.valueOf = shortest decimal, HALF_UP, then the
    * integral double truncates to long).
    */
  def quantize(x: Double, q: Int): Long = {
    val scaled = x * s"1e$q".toDouble
    java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** Occurrences of `round(...)` in `sql` whose top-level argument
    * list has more than one argument — i.e. an explicit scale, the
    * q84/q169 cross-engine midpoint class the discipline above bans
    * from every gated twin. Scale-0 rounds (one argument) are the
    * sanctioned quantization device and pass. Shared by the
    * build-time gate (ExactSumSpec scans every oracle twin and every
    * analyzed Spark plan) and the SERVE-time re-attestation absorbed
    * into q84 — so the certificate is re-checked in every
    * CORRECTNESS artifact, not only in sbt runs.
    */
  def scaleNRounds(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    val bad = scala.collection.mutable.Buffer[String]()
    var i = lower.indexOf("round(")
    while (i >= 0) {
      val okStart = i == 0 || {
        val c = lower(i - 1); !Character.isLetterOrDigit(c) && c != '_'
      }
      if (okStart) {
        var depth = 1
        var j = i + "round(".length
        var topComma = false
        while (depth > 0 && j < sql.length) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => topComma = true
            case _ =>
          }
          j += 1
        }
        if (topComma)
          bad += sql.substring(i, math.min(j, i + 120)).replace('\n', ' ')
      }
      i = lower.indexOf("round(", i + 1)
    }
    bad.toSeq
  }
}

/** A named group of oracle-checked queries. Each module contributes
  * `queries` (Spark DataFrame programs) and `oracle` (the equivalent
  * DuckDB SQL the driver hash-compares against).
  *
  * Cross-engine exactness rules used throughout (so hash compare is
  * bit-stable, not "close"):
  *   - double aggregations route through DECIMAL casts (exact,
  *     order-independent) and are cast back to DOUBLE at the end;
  *   - every computed column is explicitly cast to the same type on
  *     both sides (DuckDB SUM(int) is HUGEINT, Spark's is BIGINT...);
  *   - output timestamps are cast to TIMESTAMP_NTZ (parquet
  *     isAdjustedToUTC=false) to match DuckDB's naive timestamps;
  *   - every query ends in a total ORDER BY (unique key set) present
  *     in both engines;
  *   - NO `round(x, N)` with N > 0 anywhere in a gated output (the
  *     q84/q169 midpoint class — Spark rounds the exact
  *     shortest-decimal HALF_UP, DuckDB rounds the binary-scaled
  *     product; ExactSumSpec scans every oracle twin and fails on a
  *     reintroduction). Emit raw doubles when the argument is
  *     bit-identical; route an order-dependent sum of bit-identical
  *     terms through [[ExactSum]]; scale-0 `round(x)` (input
  *     quantizers) is safe and allowed.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
