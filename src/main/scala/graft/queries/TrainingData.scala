package graft.queries

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data assembly operators: token-budgeted shard packing and
  * deterministic stratified sampling — the stages after curation
  * (graft.operators.CorpusPipeline) that turn a corpus into training
  * input.
  */
object TrainingData extends QueryModule {

  private val nTokS = "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)"
  private val nTokD = "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)"

  // ---------------------------------------------------------------
  // Shard packing: documents stream into fixed token-budget shards in
  // deterministic doc_id order; a document's shard is the budget
  // bucket its first token lands in (running-sum window).
  //
  // PRIMARY operator (the 100 TB form): pack per partition key (lang,
  // domain, ...) — the running-sum window partitions by that key, so
  // the exchange is hashpartitioning(key) and every task packs one
  // key group; no data ever funnels through a single task. Shard ids
  // are (key, local shard #) — exactly how a real corpus is laid out
  // (shards don't mix languages/domains anyway).
  //
  // q48 keeps the GLOBAL form (one total order over all docs) purely
  // as the oracle-checkable core; its Window.orderBy with no
  // partitionBy is a deliberate single-task plan and must never be
  // used at scale — q52 is the production shape.
  private val budget = 4000L

  /** Pack `df` into token-budget shards per `keyCols` group, streaming
    * in `orderCol` order within each group. Output adds n_tok, cum
    * (running token count within the group) and shard (0-based shard
    * index within the group).
    */
  def packShards(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tokenBudget: Long = budget): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("n_tok").over(w))
      .withColumn("shard",
        expr(s"CAST(floor((cum - n_tok) / $tokenBudget) AS BIGINT)"))
  }

  // Round 18: the GLOBAL packing now runs in the scale-safe
  // two-phase form (q115/q118's device applied to the last
  // corpus-sized SinglePartition window): doc_id-RANGE buckets are
  // order-contiguous prefixes of the global order, so bucket-local
  // running sums plus driver prefix-summed bucket token offsets
  // reconstruct the EXACT global cumulative sums (integer addition
  // is associative) — certified against the UNCHANGED single-window
  // DuckDB oracle. The only corpus exchange is on bucket; the offset
  // table is ≤64 rows. The id-range bucketing assumes roughly
  // uniform id density for balance (true of ingest-assigned ids; a
  // skewed lake would widen to rank-quantile cut points — same
  // device, the cut points become another model-sized artifact).
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val wLoc = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = graft.CachedPlans.of(s, dir, "q48_bucketed") {
      val docs = T.documents(s, dir)
        .select(col("doc_id"), expr(nTokS).as("n_tok"))
      // 1-row corpus stat, memoized with the bucketed table
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val k = maxId / 64 + 1
      docs.withColumn("bucket",
          expr(s"CAST(doc_id DIV CAST($k AS BIGINT) AS INT)"))
        .withColumn("lcum", sum("n_tok").over(wLoc))
    }
    // the ≤64-row offset table is corpus model state — built once
    // with the bucketed table, served as a broadcast literal
    val offDf = graft.CachedPlans.of(s, dir, "q48_offsets") {
      val totals = bucketed.groupBy("bucket").agg(sum("n_tok").as("tok"))
        .collect().sortBy(_.getInt(0))
      var tokOff = 0L
      val offs = totals.map { r =>
        val o = (r.getInt(0), tokOff); tokOff += r.getLong(1); o
      }.toSeq
      import s.implicits._
      offs.toDF("bucket", "tok_off")
    }
    bucketed.join(broadcast(offDf), "bucket")
      .withColumn("cum", col("lcum") + col("tok_off"))
      .withColumn("shard", expr(s"CAST(floor((cum - n_tok) / $budget) AS BIGINT)"))
      .select("doc_id", "n_tok", "shard")
      .orderBy("doc_id")
  }

  private val q48Sql =
    s"""SELECT doc_id, n_tok,
       |  CAST(floor((cum - n_tok) / $budget) AS BIGINT) AS shard
       |FROM (
       |  SELECT doc_id, n_tok,
       |    SUM(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM (SELECT doc_id, $nTokD AS n_tok FROM documents))
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q52 — PARTITIONED shard packing (the production form of q48):
  // per-language token-budget shards via packShards. The plan's only
  // exchange is hashpartitioning(lang) — verified by PlanShapeSpec to
  // contain no SinglePartition exchange.
  private def q52(s: SparkSession, dir: String): DataFrame =
    packShards(
      T.documents(s, dir)
        .select(col("doc_id"), col("lang"), expr(nTokS).as("n_tok")),
      Seq("lang"), "doc_id")
      .select("lang", "doc_id", "n_tok", "shard")
      .orderBy("lang", "doc_id")

  /** Shared DuckDB CTE body of the per-language packing twins (q52
    * production packing, q105 balance audit): ONE copy of the
    * cum-window + floor((cum - n_tok) / budget) rule, so the audit's
    * oracle cannot drift from the packing it audits. (q48's global
    * form keeps its own single-window ORACLE but its Spark body now
    * runs the two-phase bucket-offset plan — round 18.)
    */
  private val duckPackedByLang =
    s"""SELECT lang, doc_id, n_tok,
       |    CAST(floor((cum - n_tok) / $budget) AS BIGINT) AS shard
       |  FROM (
       |    SELECT lang, doc_id, n_tok,
       |      SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM (SELECT lang, doc_id, $nTokD AS n_tok FROM documents))"""
      .stripMargin

  private val q52Sql =
    s"""$duckPackedByLang
       |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q49 — stratified sampling with per-language quotas, via a
  // DETERMINISTIC hash gate (md5 of the doc id — reproducible across
  // runs/engines, unlike rand()). Shuffle-free row filter + tiny agg.
  private val quota =
    "CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 50 ELSE 20 END"
  private def gateS =
    s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 < $quota"
  private def gateD =
    s"('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < $quota"

  private def q49(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(expr(s"CASE WHEN $gateS THEN 1 ELSE 0 END")).cast("long")
          .as("n_sampled"))
      .orderBy("lang")

  private val q49Sql =
    s"""SELECT lang, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN $gateD THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q55 — training-window chunking: split each document into
  // fixed-size token windows (win=128) with overlap (stride=96) —
  // the LM context-window assembly step after curation. Per-row
  // integer arithmetic + one explode; embarrassingly parallel, no
  // shuffle except the presentation sort. Window count =
  // 1 + ceil((n - win)/stride) (one short window for tiny docs), so
  // every token is covered and consecutive windows overlap by
  // win - stride tokens.
  private val win = 128L
  private val stride = 96L

  private def q55(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .select(col("doc_id"), expr(nTokS).as("n_tok"))
      .withColumn("n_win", expr(
        s"CASE WHEN n_tok <= $win THEN CAST(1 AS BIGINT) " +
          s"ELSE 1 + (n_tok - $win + ${stride - 1}) DIV $stride END"))
      .select(col("doc_id"), col("n_tok"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_win - 1)")).as("window_id"))
      .select(
        col("doc_id"),
        col("window_id").cast("int").as("window_id"),
        expr(s"window_id * $stride + 1").as("start_tok"),
        expr(s"least($win, n_tok - window_id * $stride)").as("len_tok"))
      .orderBy("doc_id", "window_id")

  private val q55Sql =
    s"""SELECT doc_id, CAST(window_id AS INTEGER) AS window_id,
       |  window_id * $stride + 1 AS start_tok,
       |  least($win, n_tok - window_id * $stride) AS len_tok
       |FROM (
       |  SELECT doc_id, n_tok,
       |    unnest(generate_series(CAST(0 AS BIGINT), n_win - 1)) AS window_id
       |  FROM (
       |    SELECT doc_id, n_tok,
       |      CASE WHEN n_tok <= $win THEN CAST(1 AS BIGINT)
       |           ELSE 1 + (n_tok - $win + ${stride - 1}) // $stride END AS n_win
       |    FROM (SELECT doc_id, $nTokD AS n_tok FROM documents)))
       |ORDER BY doc_id, window_id""".stripMargin

  // ---------------------------------------------------------------
  // q92 — deterministic SEEDED SHUFFLE + train/val/test split: every
  // document hashes to a split (90/5/5) and to a training ORDER
  // inside its split, both functions of (doc_id, seed) only — so the
  // assignment is reproducible run-to-run, independent of partition
  // layout or arrival order, and re-seeding re-shuffles without
  // touching the data. This is the training-order stage that follows
  // packing: model training must not see the corpus in crawl order
  // (md5 decorrelates it), and eval splits must be stable across
  // pipeline re-runs (hash-of-id, never random()).
  //
  // Scale: one scan; the split hash is a per-row expression; the
  // per-split position is a window over the 3-way split partition —
  // at lake scale the position would be assigned per (split, shard)
  // group exactly as q52 partitions its window, so nothing funnels
  // through one task (the 3-partition window form here is the
  // oracle-checkable core, as q48 is for q52).
  private val shufSeed = 42
  private val splitKeyS =
    s"md5(concat(CAST(doc_id AS STRING), ':$shufSeed'))"
  private val splitKeyD = s"md5(CAST(doc_id AS VARCHAR) || ':$shufSeed')"

  private def q92(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      s"CAST(conv(substring($splitKeyS, 1, 4), 16, 10) AS BIGINT) % 100"
    val w = Window.partitionBy("split").orderBy("skey", "doc_id")
    T.documents(s, dir)
      .select(col("doc_id"), expr(splitKeyS).as("skey"),
        expr(bucket).as("b"))
      .withColumn("split", expr(
        "CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' " +
          "ELSE 'test' END"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select("split", "pos", "doc_id")
      .orderBy("split", "pos")
  }

  private val q92Sql =
    s"""SELECT split, pos, doc_id FROM (
       |  SELECT split, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY split
       |      ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
       |  FROM (
       |    SELECT doc_id, skey,
       |      CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
       |           ELSE 'test' END AS split
       |    FROM (
       |      SELECT doc_id, $splitKeyD AS skey,
       |        ('0x' || substring($splitKeyD, 1, 4))::BIGINT % 100 AS b
       |      FROM documents)))
       |ORDER BY split, pos""".stripMargin

  // ---------------------------------------------------------------
  // q105 — SHARD-BALANCE audit over q52's production packing: per
  // language the shard count and the min/max/avg shard token fill
  // plus the fill ratio of the worst shard against the budget. The
  // release gate for packed training data — a shard far under
  // budget wastes a whole accelerator step; only the LAST shard of
  // a group may legitimately be short, so max_fill vs min_fill
  // localizes packing bugs. All exact integers; the two ratios
  // divide exact values.
  private def q105(s: SparkSession, dir: String): DataFrame =
    packShards(
      T.documents(s, dir)
        .select(col("doc_id"), col("lang"), expr(nTokS).as("n_tok")),
      Seq("lang"), "doc_id")
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_shards"),
        sum("n_docs").as("n_docs"),
        min("tokens").as("min_fill"),
        max("tokens").as("max_fill"),
        sum("tokens").as("total_tokens"))
      .withColumn("avg_fill",
        expr("CAST(total_tokens AS DOUBLE) / CAST(n_shards AS DOUBLE)"))
      .withColumn("min_fill_ratio",
        expr(s"CAST(min_fill AS DOUBLE) / CAST($budget AS DOUBLE)"))
      .orderBy("lang")

  private val q105Sql =
    s"""WITH packed AS (
       |  $duckPackedByLang),
       |per_shard AS (
       |  SELECT lang, shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS tokens
       |  FROM packed GROUP BY 1, 2)
       |SELECT lang, COUNT(*) AS n_shards,
       |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |  MIN(tokens) AS min_fill, MAX(tokens) AS max_fill,
       |  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_fill,
       |  CAST(MIN(tokens) AS DOUBLE) / CAST($budget AS DOUBLE)
       |    AS min_fill_ratio
       |FROM per_shard GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q107 — deterministic SOURCE-MIXTURE INTERLEAVE at shard-write
  // time: the materialization step between q77 (which only SCORES the
  // temperature mixture) and ShardWriter (which preserves whatever
  // order it is given). Each source's documents are merged into one
  // global training order by weighted-fair-queueing virtual time —
  // the k-th doc of source s goes at vt = k / w_s with w_s = √n_s
  // (temperature α = 0.5, q77's rule; the shared normalizer Σ√n
  // cancels in the ordering) — so every PREFIX of the stream carries
  // the sources in ~√n proportion instead of in crawl-concatenation
  // blocks, and re-running the pipeline reproduces the order exactly
  // (pure function of (doc_id, per-source counts): no RNG, no
  // partition-layout dependence). The interleaved stream then packs
  // into token-budget shards (q48's running-sum rule) and is what
  // ShardWriter materializes (ShardWriterSpec proves the order +
  // per-shard mixture survive the write).
  //
  // Scale: the per-source rank is a hashpartitioning(source) window
  // (q52's shape); the GLOBAL position/packing window is the
  // oracle-checkable core, q48's documented single-task form — the
  // production write range-partitions by vt instead (total order
  // without one task seeing all rows; ShardWriterSpec's mixture
  // check covers per-shard ratios). Exactness: vt = k/√n_s is one
  // IEEE-correctly-rounded sqrt + one divide from exact integers —
  // bit-identical cross-engine, and vt ties break on (source,
  // doc_id), so pos/cum/shard are all exact.
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val docs = T.documents(s, dir)
      .select(col("doc_id"), col("source"), expr(nTokS).as("n_tok"))
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val wSrc = Window.partitionBy("source").orderBy("doc_id")
    val wPos = Window.orderBy("vt", "source", "doc_id")
    val wCum = wPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(ns), "source")
      .withColumn("k", row_number().over(wSrc).cast("long"))
      .withColumn("vt",
        expr("CAST(k AS DOUBLE) / sqrt(CAST(n_src AS DOUBLE))"))
      .withColumn("pos", (row_number().over(wPos) - 1).cast("long"))
      .withColumn("cum", sum("n_tok").over(wCum))
      .withColumn("shard",
        expr(s"CAST(floor((cum - n_tok) / $budget) AS BIGINT)"))
      .select("pos", "source", "doc_id", "n_tok", "shard")
      .orderBy("pos")
  }

  private val q107Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, $nTokD AS n_tok FROM documents),
       |ns AS (SELECT source, COUNT(*) AS n_src FROM d GROUP BY 1),
       |i AS (
       |  SELECT d.doc_id, d.source, d.n_tok,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id)
       |      AS DOUBLE) / sqrt(CAST(n_src AS DOUBLE)) AS vt
       |  FROM d JOIN ns USING (source)),
       |o AS (
       |  SELECT doc_id, source, n_tok,
       |    CAST(ROW_NUMBER() OVER (ORDER BY vt, source, doc_id) - 1
       |      AS BIGINT) AS pos,
       |    SUM(n_tok) OVER (ORDER BY vt, source, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM i)
       |SELECT pos, source, doc_id, n_tok,
       |  CAST(floor((cum - n_tok) / $budget) AS BIGINT) AS shard
       |FROM o ORDER BY pos""".stripMargin

  // ---------------------------------------------------------------
  // q115 — the PRODUCTION mixture interleave: q107's semantics with
  // the global position/packing window REPLACED by the scale-safe
  // two-phase form, certified against the SAME oracle (identical
  // output, hash-matched). This closes the q48/q92/q107 weak family:
  // unlike q107's documented single-task oracle core, no window here
  // sees more than one partition's rows.
  //
  // Shape (the q52 move, one decade up):
  //   1. per-source rank k — hashpartitioning(source) window (as q107);
  //   2. vt = k/√n_src, then a DETERMINISTIC range bucket
  //      b = floor(vt/vtMax · B): bucket boundaries derive from the
  //      model-sized per-source counts (vtMax = √max n_src), NOT from
  //      RangePartitioner sampling — reproducible run-to-run, and
  //      bucket order IS vt order, so concatenating buckets
  //      reconstructs the total order;
  //   3. partition-local rank + running token sum — a window
  //      partitioned by bucket (hashpartitioning(bucket), every task
  //      sums one bucket);
  //   4. per-bucket (row, token) totals — B aggregate rows — collect
  //      to the driver (model-sized, the Ivf-centroid class of
  //      collect), prefix-sum there, and broadcast back as offsets:
  //      pos = local rank + row offset, cum = local sum + token
  //      offset. No SinglePartition exchange anywhere (PlanShapeSpec
  //      pins it); the bucketed frame is memoized so the offsets pass
  //      and the main plan share one computation.
  //
  // Bucket balance: source s contributes √n_s rows per unit vt until
  // exhausted at vt = √n_s, so early buckets are heavier by at most
  // Σ_s√n_s / √max n_s ≤ |sources| — bounded, and at lake scale B
  // scales with the cluster while the bound stays |sources|.
  private val interleaveBuckets = 32

  private def q115(s: SparkSession, dir: String): DataFrame = {
    val wSrc = Window.partitionBy("source").orderBy("doc_id")
    val wLoc = Window.partitionBy("bucket").orderBy("vt", "source", "doc_id")
    val wLocCum = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = graft.CachedPlans.of(s, dir, "q115_bucketed") {
      val docs = T.documents(s, dir)
        .select(col("doc_id"), col("source"), expr(nTokS).as("n_tok"))
      val ns = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
      // vtMax from the per-source counts: |sources| rows, model-sized
      val vtMax = ns.collect().map(r => math.sqrt(r.getLong(1).toDouble)).max
      docs.join(broadcast(ns), "source")
        .withColumn("k", row_number().over(wSrc).cast("long"))
        .withColumn("vt",
          expr("CAST(k AS DOUBLE) / sqrt(CAST(n_src AS DOUBLE))"))
        .withColumn("bucket", least(
          floor(col("vt") / lit(vtMax) * lit(interleaveBuckets)).cast("int"),
          lit(interleaveBuckets - 1)))
        .withColumn("lpos", (row_number().over(wLoc) - 1).cast("long"))
        .withColumn("lcum", sum("n_tok").over(wLocCum))
    }
    // B-row totals -> driver prefix sums -> broadcast offsets
    val totals = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), sum("n_tok").as("tok"))
      .collect().sortBy(_.getInt(0))
    var rowOff = 0L; var tokOff = 0L
    val offs = totals.map { r =>
      val o = (r.getInt(0), rowOff, tokOff)
      rowOff += r.getLong(1); tokOff += r.getLong(2); o
    }.toSeq
    import s.implicits._
    val offDf = offs.toDF("bucket", "row_off", "tok_off")
    bucketed.join(broadcast(offDf), "bucket")
      .withColumn("pos", col("lpos") + col("row_off"))
      .withColumn("cum", col("lcum") + col("tok_off"))
      .withColumn("shard",
        expr(s"CAST(floor((cum - n_tok) / $budget) AS BIGINT)"))
      .select("pos", "source", "doc_id", "n_tok", "shard")
      .orderBy("pos")
  }

  // ---------------------------------------------------------------
  // q118 — the PARTITIONED seeded split (q92's production form,
  // certified against q92's oracle): the per-split position window is
  // partitioned by (split, bucket) where bucket = the first hex char
  // of the order key itself. Because the bucket is a PREFIX of skey,
  // ordering by (bucket, skey) IS ordering by skey — so local ranks
  // plus per-(split, bucket) row offsets (3·16 aggregate rows,
  // driver prefix-summed exactly as q115) reconstruct q92's global
  // per-split positions with no window over more than one task's
  // rows. md5 spreads doc ids uniformly over buckets, so the 16-way
  // (or at scale 16^2/16^3-way — widen the prefix) fan-out is
  // balance-free by construction.
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      s"CAST(conv(substring($splitKeyS, 1, 4), 16, 10) AS BIGINT) % 100"
    val wLoc = Window.partitionBy("split", "bucket").orderBy("skey", "doc_id")
    val split = graft.CachedPlans.of(s, dir, "q118_bucketed") {
      T.documents(s, dir)
        .select(col("doc_id"), expr(splitKeyS).as("skey"),
          expr(bucket).as("b"))
        .withColumn("split", expr(
          "CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' " +
            "ELSE 'test' END"))
        .withColumn("bucket", expr("substring(skey, 1, 1)"))
        .withColumn("lpos", (row_number().over(wLoc) - 1).cast("long"))
    }
    val totals = split.groupBy("split", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val offs = totals
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        var off = 0L
        rows.sortBy(_._2).map { case (sp, b, cnt) =>
          val o = (sp, b, off); off += cnt; o
        }
      }
    import s.implicits._
    val offDf = offs.toDF("split", "bucket", "row_off")
    split.join(broadcast(offDf), Seq("split", "bucket"))
      .withColumn("pos", col("lpos") + col("row_off"))
      .select("split", "pos", "doc_id")
      .orderBy("split", "pos")
  }

  // ---------------------------------------------------------------
  // q142 — DATA-CONSTRAINED mixture allocation (capped waterfill):
  // q110 plans a token budget by temperature weights but lets epochs
  // grow unboundedly; real data-constrained runs cap repetition
  // (≳4 epochs stops helping — Muennighoff et al. 2023, "Scaling
  // Data-Constrained Language Models") and must REDISTRIBUTE the
  // surplus of capped sources to the uncapped ones. That is exactly
  // the classic capped-waterfill: find the level m* with
  // Σ min(m*·w_i, cap_i) = B, allocate min(m*·w_i, cap_i).
  //
  // Closed form, no iteration: sort groups by r_i = cap_i/w_i (the
  // level at which group i saturates). The saturated set at m* is a
  // PREFIX of that order, and for each candidate "first unsaturated
  // row" i, the level is m_i = (B − Σ_{j<i} cap_j)/Σ_{j≥i} w_j; the
  // true m* is the m_i of the FIRST row with m_i < r_i (for any
  // earlier row, m_i ≥ r_i — provable from cap_j = r_j·w_j and the
  // sort order — so the flag flips exactly once). All of it is two
  // window passes over a |langs|-row aggregate: the corpus-sized
  // work is ONE token-count scan; the unpartitioned windows run on
  // key-cardinality rows (q77's reviewed pattern), never on data.
  //
  // Exactness: token sums route through DECIMAL(38,0); the √-weights
  // are quantized at their source (wq = round(√n·1e6), scale-0 —
  // cross-engine exact) so every weight sum is an exact integer sum
  // and m*, the capped flags, and the sort order match bit-for-bit
  // with NO order-dependent float reduction anywhere; epochs is one
  // exact-integer divide, emitted raw (round 18 — the q84/q169
  // midpoint class removed). Budget B = ⌊1.8·N⌋ with a 2-epoch cap —
  // with this corpus's √-weights the small languages cap and the
  // surplus flows to `en` (both branches exercised).
  private val epochCap = 2L

  private def q142(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val ord = Window.orderBy("r", "lang")
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    TextAnalysis.tokenized(s, dir) // shared token memo — no re-tokenize
      .groupBy("lang")
      .agg(expr("CAST(SUM(CAST(size(toks) AS DECIMAL(38,0))) AS BIGINT)")
        .as("n_tokens"))
      .filter(col("n_tokens") > 0)
      // INTEGER-ROUTED √-weights (round 18, graft.ExactSum's device):
      // the weight is quantized ONCE at its source — wq = round(√n ·
      // 1e6), scale-0 round, cross-engine exact — and every weight
      // sum (the unordered total and the ordered prefix) runs on the
      // exact integers, so the waterfall's m_i < r comparisons can
      // never flip on a reduction-order half-ulp (previously tot_w
      // was an UNORDERED float window sum — the q84/q169 class one
      // comparison away from the row set).
      .withColumn("wq",
        expr("CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) " +
          "AS DECIMAL(38,0))"))
      .withColumn("w", expr("CAST(wq AS DOUBLE) / 1e6"))
      .withColumn("cap_tokens", expr(s"$epochCap * n_tokens"))
      .withColumn("r", expr("CAST(cap_tokens AS DOUBLE) / w"))
      .withColumn("tot_tokens", sum("n_tokens").over(wAll))
      .withColumn("tot_wq", sum("wq").over(wAll))
      .withColumn("budget",
        expr("CAST(FLOOR(1.8 * CAST(tot_tokens AS DOUBLE)) AS BIGINT)"))
      .withColumn("cap_pre", coalesce(sum("cap_tokens").over(pre), lit(0L)))
      .withColumn("wq_pre",
        coalesce(sum("wq").over(pre), expr("CAST(0 AS DECIMAL(38,0))")))
      .withColumn("rn", row_number().over(ord))
      .withColumn("m_i",
        expr("(CAST(budget AS DOUBLE) - CAST(cap_pre AS DOUBLE)) " +
          "/ (CAST(tot_wq - wq_pre AS DOUBLE) / 1e6)"))
      .withColumn("sel_rn",
        min(when(col("m_i") < col("r"), col("rn"))).over(wAll))
      .withColumn("m_star",
        max(when(col("rn") === col("sel_rn"), col("m_i"))).over(wAll))
      .withColumn("target_tokens", expr(
        """CASE WHEN m_star IS NULL THEN cap_tokens
          |ELSE CAST(FLOOR(LEAST(CAST(cap_tokens AS DOUBLE), m_star * w)) AS BIGINT)
          |END""".stripMargin))
      .withColumn("epochs", expr(
        "CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("capped", expr(
        "CASE WHEN m_star IS NULL OR m_star * w >= CAST(cap_tokens AS DOUBLE) THEN 1 ELSE 0 END"))
      .select("lang", "n_tokens", "cap_tokens", "target_tokens", "epochs",
        "capped")
      .orderBy("lang")
  }

  private val q142Sql =
    s"""WITH c AS (
       |  SELECT lang,
       |    CAST(SUM(CAST($nTokD AS DECIMAL(38,0))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang),
       |d AS (
       |  SELECT lang, n_tokens,
       |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
       |      AS DECIMAL(38,0)) AS wq,
       |    CAST(CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
       |      AS DECIMAL(38,0)) AS DOUBLE) / 1e6 AS w,
       |    $epochCap * n_tokens AS cap_tokens,
       |    CAST($epochCap * n_tokens AS DOUBLE)
       |      / (CAST(CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
       |           AS DECIMAL(38,0)) AS DOUBLE) / 1e6) AS r,
       |    SUM(n_tokens) OVER () AS tot_tokens,
       |    SUM(CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6)
       |      AS DECIMAL(38,0))) OVER () AS tot_wq
       |  FROM c WHERE n_tokens > 0),
       |e AS (
       |  SELECT *,
       |    CAST(FLOOR(1.8 * CAST(tot_tokens AS DOUBLE)) AS BIGINT) AS budget,
       |    COALESCE(SUM(cap_tokens) OVER pre, 0) AS cap_pre,
       |    COALESCE(SUM(wq) OVER pre, 0) AS wq_pre,
       |    ROW_NUMBER() OVER (ORDER BY r, lang) AS rn
       |  FROM d
       |  WINDOW pre AS (ORDER BY r, lang ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |g AS (
       |  SELECT *,
       |    (CAST(budget AS DOUBLE) - CAST(cap_pre AS DOUBLE))
       |      / (CAST(tot_wq - wq_pre AS DOUBLE) / 1e6) AS m_i
       |  FROM e),
       |h AS (SELECT *, MIN(CASE WHEN m_i < r THEN rn END) OVER () AS sel_rn FROM g),
       |i AS (SELECT *, MAX(CASE WHEN rn = sel_rn THEN m_i END) OVER () AS m_star FROM h),
       |fin AS (
       |  SELECT lang, n_tokens, cap_tokens,
       |    CASE WHEN m_star IS NULL THEN cap_tokens
       |    ELSE CAST(FLOOR(LEAST(CAST(cap_tokens AS DOUBLE), m_star * w)) AS BIGINT)
       |    END AS target_tokens,
       |    CASE WHEN m_star IS NULL OR m_star * w >= CAST(cap_tokens AS DOUBLE)
       |      THEN 1 ELSE 0 END AS capped
       |  FROM i)
       |SELECT lang, n_tokens, cap_tokens, target_tokens,
       |  CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs,
       |  capped
       |FROM fin ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q155 — DEDUP-INDUCED MIXTURE SHIFT: temperature weights (q77's
  // √-token rule) computed BEFORE and AFTER chunk-grain dedup, with
  // the per-language delta — the planning gotcha this row quantifies
  // is that dedup is never language-neutral (a language whose crawl
  // repeats more boilerplate loses more mass), so a mixture tuned on
  // the raw corpus silently shifts after curation; the release plan
  // must use post-dedup weights. Dedup runs at the CDC chunk grain
  // (q144's device — this corpus has ZERO exact-duplicate documents
  // but 7.3% duplicated chunk tokens, so document-grain dedup would
  // make this row a no-op): each distinct chunk fingerprint counts
  // ONCE, attributed to its first owner's language (min (doc_id,
  // chunk) — deterministic). Both weight sets are |langs|-row
  // aggregates; exactness is integer token sums + source-quantized
  // √-weights with exact integer normalizers (q142's device), and
  // the shift subtracts two identically-computed doubles — raw, no
  // round-6 anywhere.
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val tok = TextAnalysis.tokenized(s, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST(size(toks) AS BIGINT)").as("n_tok"), col("toks"))
    // chunking is ingest-time work, memoized once per corpus (round
    // 21; the first-seen attribution and both weight sets stay live)
    val chunks = Dedup.cdcChunks(s, dir)
      .select("doc_id", "lang", "chunk", "n_tok", "fp")
    val wFp = Window.partitionBy("fp").orderBy("doc_id", "chunk")
    val firstSeen = chunks
      .withColumn("rk", row_number().over(wFp))
      .filter(col("rk") === 1)
    // INTEGER-ROUTED √-weights (round 18, q142's device): the weight
    // is quantized once (scale-0 round — cross-engine exact), the
    // normalizer is an exact integer window sum, and the shares are
    // emitted raw — no order-dependent float reduction, no round-6
    // (the q84/q169 midpoint class removed).
    def weights(df: DataFrame, tag: String) =
      df.groupBy("lang")
        .agg(expr("CAST(SUM(CAST(n_tok AS DECIMAL(38,0))) AS BIGINT)")
          .as(s"${tag}_tokens"))
        .withColumn(s"${tag}_wq",
          expr(s"CAST(round(sqrt(CAST(${tag}_tokens AS DOUBLE)) * 1e6) " +
            "AS DECIMAL(38,0))"))
        .withColumn(s"${tag}_weight",
          expr(s"CAST(${tag}_wq AS DOUBLE)") /
            expr(s"CAST(SUM(${tag}_wq) OVER () AS DOUBLE)"))
        .drop(s"${tag}_wq")
    weights(tok, "pre")
      .join(weights(firstSeen, "post"), "lang")
      .select(col("lang"), col("pre_tokens"), col("post_tokens"),
        col("pre_weight"),
        col("post_weight"),
        expr("post_weight - pre_weight").as("weight_shift"))
      .orderBy("lang")
  }

  private val q155Sql =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, lang, generate_subscripts(l, 1) - 1 AS pos,
       |    unnest(l) AS tk FROM t),
       |h AS (SELECT *, ('0x' || substring(md5(tk), 1, 8))::BIGINT AS t32
       |  FROM tok),
       |b AS (
       |  SELECT *,
       |    (LAG(t32, 3, 0) OVER w * 1095912791 + LAG(t32, 2, 0) OVER w * 1062961
       |     + LAG(t32, 1, 0) OVER w * 1031 + t32) % 16 = 0 AS bdy
       |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |c AS (
       |  SELECT *, COALESCE(SUM(CASE WHEN bdy THEN 1 ELSE 0 END) OVER (
       |    PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
       |  FROM b),
       |ch AS (
       |  SELECT doc_id, lang, chunk, COUNT(*) AS n_tok,
       |    md5(STRING_AGG(tk, ' ' ORDER BY pos)) AS fp
       |  FROM c GROUP BY doc_id, lang, chunk),
       |fs AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
       |      ORDER BY doc_id, chunk) AS rk
       |    FROM ch) WHERE rk = 1),
       |pre AS (
       |  SELECT lang,
       |    CAST(SUM(CAST(len(l) AS DECIMAL(38,0))) AS BIGINT) AS pre_tokens
       |  FROM t GROUP BY lang),
       |post AS (
       |  SELECT lang,
       |    CAST(SUM(CAST(n_tok AS DECIMAL(38,0))) AS BIGINT) AS post_tokens
       |  FROM fs GROUP BY lang),
       |pw AS (
       |  SELECT lang, pre_tokens,
       |    CAST(CAST(round(sqrt(CAST(pre_tokens AS DOUBLE)) * 1e6)
       |        AS DECIMAL(38,0)) AS DOUBLE)
       |      / CAST(SUM(CAST(round(sqrt(CAST(pre_tokens AS DOUBLE)) * 1e6)
       |          AS DECIMAL(38,0))) OVER () AS DOUBLE) AS pre_weight
       |  FROM pre),
       |qw AS (
       |  SELECT lang, post_tokens,
       |    CAST(CAST(round(sqrt(CAST(post_tokens AS DOUBLE)) * 1e6)
       |        AS DECIMAL(38,0)) AS DOUBLE)
       |      / CAST(SUM(CAST(round(sqrt(CAST(post_tokens AS DOUBLE)) * 1e6)
       |          AS DECIMAL(38,0))) OVER () AS DOUBLE) AS post_weight
       |  FROM post)
       |SELECT lang, pre_tokens, post_tokens,
       |  pre_weight,
       |  post_weight,
       |  post_weight - pre_weight AS weight_shift
       |FROM pw JOIN qw USING (lang)
       |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q221 — EPOCH RESHUFFLE audit: every training run reshuffles its
  // data per epoch, and at 100 TB that shuffle must be a pure
  // function of (epoch, doc) — no RNG state to checkpoint, identical
  // on every re-run, shuffle-FREE to compute (each row knows its
  // shard: q49's md5-gate discipline with the epoch salted into the
  // key). Three epochs × 8 shards; per epoch the ledger shows
  // (a) BALANCE — max/min shard load of a hash assignment,
  // (b) DETERMINISM — an md5 fingerprint over the shard-count
  // vector (the oracle recomputes it from scratch), and
  // (c) DECORRELATION — how many docs stay in the same shard as the
  // previous epoch (≈ n/8 for independent assignments; a broken
  // salt that ignores the epoch would show n and ruin epoch
  // diversity silently). One scan per epoch + 8-row rollups.
  private def q221(s: SparkSession, dir: String): DataFrame =
    graft.CachedPlans.of(s, dir, "epoch_shuffle") {
      val base = T.documents(s, dir).select("doc_id")
      val assigned = Seq(0, 1, 2).map { e =>
        base.select(col("doc_id"), lit(e).as("epoch"),
          expr(s"CAST(conv(substring(md5(concat('$e', ':', " +
            "CAST(doc_id AS STRING))), 1, 8), 16, 10) % 8 AS INT)")
            .as("shard"))
      }.reduce(_ unionByName _)
      val perEpoch = assigned.groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n"))
        .groupBy("epoch")
        .agg(max("n").as("max_shard"), min("n").as("min_shard"),
          expr("md5(array_join(transform(sort_array(collect_list(" +
            "struct(shard, n))), x -> CAST(x.n AS STRING)), ','))")
            .as("load_fp"))
      val same = assigned.as("a")
        .join(assigned.as("b"),
          col("a.doc_id") === col("b.doc_id")
            && col("a.epoch") === col("b.epoch") + 1
            && col("a.shard") === col("b.shard"))
        .groupBy(col("a.epoch").as("epoch"))
        .agg(count(lit(1)).as("n_same_as_prev"))
      perEpoch.join(same, Seq("epoch"), "left")
        .select(col("epoch"), col("max_shard"), col("min_shard"),
          col("load_fp"), col("n_same_as_prev"))
    }.orderBy("epoch")

  private val q221Sql =
    """WITH a AS (
      |  SELECT doc_id, e.e AS epoch,
      |    CAST(('0x' || substring(md5(CAST(e.e AS VARCHAR) || ':'
      |      || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS INTEGER)
      |      AS shard
      |  FROM documents CROSS JOIN (VALUES (0), (1), (2)) e(e)),
      |loads AS (
      |  SELECT epoch, shard, COUNT(*) AS n FROM a GROUP BY 1, 2),
      |per AS (
      |  SELECT epoch, MAX(n) AS max_shard, MIN(n) AS min_shard,
      |    md5(STRING_AGG(CAST(n AS VARCHAR), ',' ORDER BY shard))
      |      AS load_fp
      |  FROM loads GROUP BY 1),
      |same AS (
      |  SELECT x.epoch AS epoch, COUNT(*) AS n_same_as_prev
      |  FROM a x JOIN a p ON p.doc_id = x.doc_id
      |    AND p.epoch = x.epoch - 1 AND p.shard = x.shard
      |  GROUP BY 1)
      |SELECT per.epoch, per.max_shard, per.min_shard, per.load_fp,
      |  same.n_same_as_prev
      |FROM per LEFT JOIN same USING (epoch)
      |ORDER BY epoch""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_dedup_mixture_shift" -> (q155 _),
    "q142_epoch_waterfill" -> (q142 _),
    "q48_shard_pack" -> (q48 _),
    "q221_epoch_shuffle" -> (q221 _),
    "q49_stratified_sample" -> (q49 _),
    "q52_shard_pack_by_lang" -> (q52 _),
    "q55_chunk_windows" -> (q55 _),
    "q92_seeded_split" -> (q92 _),
    "q105_shard_balance" -> (q105 _),
    "q107_mixture_interleave" -> (q107 _),
    "q115_interleave_rangepart" -> (q115 _),
    "q118_split_partitioned" -> (q118 _))

  override val oracle: Map[String, String] = Map(
    "q155_dedup_mixture_shift" -> q155Sql,
    "q142_epoch_waterfill" -> q142Sql,
    "q48_shard_pack" -> q48Sql,
    "q221_epoch_shuffle" -> q221Sql,
    "q49_stratified_sample" -> q49Sql,
    "q52_shard_pack_by_lang" -> q52Sql,
    "q55_chunk_windows" -> q55Sql,
    "q92_seeded_split" -> q92Sql,
    "q105_shard_balance" -> q105Sql,
    "q107_mixture_interleave" -> q107Sql,
    // q115/q118 are the PRODUCTION twins of q107/q92: identical
    // output, scale-safe plan — certified against the same oracle.
    "q115_interleave_rangepart" -> q107Sql,
    "q118_split_partitioned" -> q92Sql)
}
