package graft.queries

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conversation / SFT-data operators: the chat-transcript leg of the
  * training-data pipeline. Instruction-tuning corpora arrive as JSONL
  * conversations (role/content turn arrays); the operators a curation
  * run needs are (1) the parse funnel — real `from_json` ingestion
  * with malformed-record accounting — and (2) turn-level dedup, the
  * "templated assistant response" problem (a model trained on one
  * reply pasted under a thousand prompts memorizes it).
  *
  * Cross-engine design: conversations are GENERATED deterministically
  * from `documents` (turn contents are 5-token slices of the doc's
  * own token stream, so dedup collisions mirror the corpus's real
  * near-dup structure), serialized with Spark's `to_json`, and parsed
  * back with `from_json` — the REAL ingestion path, including
  * PERMISSIVE null-out of malformed rows (every 13th conversation is
  * truncated mid-JSON). The DuckDB oracle REGENERATES the expected
  * tables from doc_id arithmetic and list slicing alone — no JSON
  * library on the oracle side (the q216 sitemap recipe), so the hash
  * gate certifies generate → serialize → parse → ops end to end.
  *
  * Scale: the parse is a per-row projection (one scan); the ledgers
  * are source-keyed rollups; the dedup is one hash-groupBy on the
  * turn content — the q27 exact-dedup shape on the turn table.
  */
/** One JSONL chat line as a streaming ingest event. Top-level (not
  * nested/private) so the MemoryStream encoder's generated code can
  * reach the constructor — a private nested case class compiles to a
  * shape Janino's codegen cannot instantiate and silently falls back
  * to the interpreted path.
  */
case class ChatLine(conv_id: Long, json: String)

object ChatData extends QueryModule {

  import TextAnalysis.toksD

  /** Parsed turn table, memoized: (doc_id, source, json, parsed) with
    * parsed = ARRAY<STRUCT<role, content>> (NULL when the JSON is
    * malformed). Turn i's content is tokens [5i+1, 5i+5] of the doc,
    * roles alternate user/assistant, 1 + doc_id % 3 pairs per doc.
    */
  private def chatConvs(s: SparkSession, dir: String): DataFrame =
    graft.CachedPlans.of(s, dir, "chat_convs") {
      TextAnalysis.tokenized(s, dir)
        .select(col("doc_id"), col("source"), col("toks"))
        .withColumn("n_pairs", expr("1 + CAST(doc_id % 3 AS INT)"))
        .withColumn("turns", expr(
          """transform(sequence(0, 2 * n_pairs - 1), i -> struct(
            |  CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
            |    AS role,
            |  array_join(slice(toks, i * 5 + 1, 5), ' ') AS content))"""
            .stripMargin))
        .withColumn("json", expr("to_json(turns)"))
        .withColumn("json", expr(
          "CASE WHEN doc_id % 13 = 0 " +
            "THEN substring(json, 1, length(json) - 5) ELSE json END"))
        .withColumn("parsed", expr(
          "from_json(json, 'ARRAY<STRUCT<role: STRING, content: STRING>>')"))
        .select("doc_id", "source", "json", "parsed")
    }

  /** STREAMED twin of the parse funnel: the same serialized
    * conversations fed through [[graft.streaming.StreamingChat]]'s
    * `parsedTurns` plan as a MemoryStream in three micro-batches
    * (accumulated via the memory sink), memoized per (session, sf).
    * The driver-side feed is the MemoryStream contract — bounded by
    * the corpus's JSON payload, the stream-fixture analog of the
    * q190 landing device; the PLAN under test (PERMISSIVE parse +
    * inline dead-letter + turn explode) is the production streaming
    * plan verbatim. q219 joins the ledger computed from THIS table
    * against the batch ledger, so the oracle hash gates
    * stream == batch end to end.
    */
  private def chatTurnsStreamed(s: SparkSession, dir: String): DataFrame =
    graft.CachedPlans.of(s, dir, "chat_turns_streamed") {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val lines = chatConvs(s, dir)
        .select(col("doc_id"), col("json"))
        .as[(Long, String)].collect()
        .map { case (id, j) => ChatLine(id, j) }
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[ChatLine]
      val qn = graft.CachedPlans.sinkName("chat_stream_sink_", dir)
      val q = graft.streaming.StreamingChat.parsedTurns(mem.toDF())
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val waves = lines.grouped(math.max(1, (lines.length + 2) / 3))
        waves.foreach { wv =>
          mem.addData(wv.toIndexedSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(qn)
    }

  /** Exploded valid turns: (doc_id, source, idx, role, content). */
  private def chatTurns(s: SparkSession, dir: String): DataFrame =
    graft.CachedPlans.of(s, dir, "chat_turns") {
      chatConvs(s, dir)
        .filter(col("parsed").isNotNull)
        .select(col("doc_id"), col("source"),
          posexplode(col("parsed")).as(Seq("idx", "turn")))
        .select(col("doc_id"), col("source"), col("idx"),
          col("turn.role").as("role"), col("turn.content").as("content"))
    }

  // ---------------------------------------------------------------
  // q219 — CHAT-TRANSCRIPT PARSE FUNNEL: the JSONL ingestion ledger —
  // per source: conversations, malformed (truncated JSON nulled out
  // by PERMISSIVE from_json, never crashing the scan), turns, user
  // turns, and the total content tokens that survive parsing. The
  // oracle regenerates every number from doc_id arithmetic + token
  // lengths (turn i carries LEAST(5, GREATEST(0, len - 5i)) words),
  // so a divergence anywhere in the serialize→parse chain flips the
  // hash. Per-row projection + one source rollup at any scale.
  //
  // STREAM == BATCH under the same gate: the identical ledger is
  // computed a second time from the STREAMED turn table (the
  // production streaming plan run over the same conversations in
  // three micro-batches, [[chatTurnsStreamed]]) and inner-joined on
  // ALL SIX columns. When the streaming path agrees, the join is the
  // identity and the output matches the unchanged oracle; any
  // divergence (a lost dead letter, a dropped turn, a miscounted
  // token) deletes that source's row and the row-count/hash gate
  // fails. One oracle row certifies both execution modes.
  private def q219(s: SparkSession, dir: String): DataFrame = {
    def ledger(malformedSrc: DataFrame, turnsSrc: DataFrame): DataFrame = {
      val malformed = malformedSrc.groupBy("source")
        .agg(count(lit(1)).as("n_convs"),
          sum(when(col("malformed"), 1L).otherwise(0L))
            .cast("long").as("n_malformed"))
      val turns = turnsSrc.groupBy("source")
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("role") === "user", 1L).otherwise(0L))
            .cast("long").as("n_user_turns"),
          sum(expr("CASE WHEN content = '' THEN 0 " +
            "ELSE size(split(content, ' ')) END"))
            .cast("long").as("content_tokens"))
      malformed.join(turns, Seq("source"), "left")
        .select(col("source"), col("n_convs"), col("n_malformed"),
          coalesce(col("n_turns"), lit(0L)).as("n_turns"),
          coalesce(col("n_user_turns"), lit(0L)).as("n_user_turns"),
          coalesce(col("content_tokens"), lit(0L)).as("content_tokens"))
    }
    val batch = ledger(
      chatConvs(s, dir).select(col("source"),
        col("parsed").isNull.as("malformed")),
      chatTurns(s, dir))
    // the streamed ledger is a one-time artifact (the stream ran
    // once) — memoized like the stream itself, so a serve pass pays
    // only the six-column equality join of two |sources|-row tables
    val streamed = graft.CachedPlans.of(s, dir, "chat_stream_ledger") {
      val src = T.documents(s, dir)
        .select(col("doc_id").as("conv_id"), col("source"))
      val streamedRows = chatTurnsStreamed(s, dir).join(src, "conv_id")
      ledger(
        streamedRows.groupBy("conv_id", "source")
          .agg(max(when(!col("ok"), true).otherwise(false)).as("malformed")),
        // idx >= 0 excludes the valid-but-EMPTY conversation sentinel
        // (ok = true, idx = -1): it must count as a conversation
        // above, never as a turn here
        streamedRows.filter(col("ok") && col("idx") >= 0))
    }
    batch.join(streamed, Seq("source", "n_convs", "n_malformed",
      "n_turns", "n_user_turns", "content_tokens"), "inner")
      .orderBy("source")
  }

  private val q219Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source, len($toksD) AS L FROM documents),
       |t AS (
       |  SELECT d.doc_id, d.source, gs.i AS idx,
       |    LEAST(5, GREATEST(0, L - 5 * gs.i)) AS words
       |  FROM d CROSS JOIN generate_series(0, 7) gs(i)
       |  WHERE d.doc_id % 13 <> 0
       |    AND gs.i < 2 * (1 + d.doc_id % 3))
       |SELECT m.source, m.n_convs, m.n_malformed,
       |  CAST(COALESCE(t.n_turns, 0) AS BIGINT) AS n_turns,
       |  CAST(COALESCE(t.n_user_turns, 0) AS BIGINT) AS n_user_turns,
       |  CAST(COALESCE(t.content_tokens, 0) AS BIGINT) AS content_tokens
       |FROM (
       |  SELECT source, COUNT(*) AS n_convs,
       |    CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_malformed
       |  FROM d GROUP BY 1) m
       |LEFT JOIN (
       |  SELECT source, COUNT(*) AS n_turns,
       |    SUM(CASE WHEN idx % 2 = 0 THEN 1 ELSE 0 END) AS n_user_turns,
       |    SUM(words) AS content_tokens
       |  FROM t GROUP BY 1) t USING (source)
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // q220 — ASSISTANT-TURN exact dedup (the templated-response
  // problem): across ALL parsed conversations, which non-empty
  // assistant replies repeat, how often, across how many
  // conversations, and who said them first. One hash-groupBy on the
  // turn content (the q27 shape on the turn table); because turn
  // contents are slices of the docs' own token streams, the
  // collisions are the corpus's REAL duplicated passages, not a
  // planted toy. Report: every reply occurring ≥ 2 times.
  private def q220(s: SparkSession, dir: String): DataFrame =
    chatTurns(s, dir)
      .filter(col("role") === "assistant" && col("content") =!= "")
      .groupBy("content")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_convs"),
        min("doc_id").as("first_conv"))
      .filter(col("n_occurrences") >= 2)
      .select(expr("md5(content)").as("content_fp"),
        expr("CAST(size(split(content, ' ')) AS BIGINT)").as("n_words"),
        col("n_occurrences"), col("n_convs"), col("first_conv"))
      .orderBy(desc("n_occurrences"), col("content_fp"))

  private val q220Sql =
    s"""WITH d AS (
       |  SELECT doc_id, $toksD AS l FROM documents),
       |t AS (
       |  SELECT d.doc_id,
       |    array_to_string(l[5 * gs.i + 1 : 5 * gs.i + 5], ' ') AS content
       |  FROM d CROSS JOIN generate_series(0, 7) gs(i)
       |  WHERE d.doc_id % 13 <> 0
       |    AND gs.i < 2 * (1 + d.doc_id % 3)
       |    AND gs.i % 2 = 1)
       |SELECT md5(content) AS content_fp,
       |  CAST(len(string_split(content, ' ')) AS BIGINT) AS n_words,
       |  COUNT(*) AS n_occurrences,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_convs,
       |  MIN(doc_id) AS first_conv
       |FROM t
       |WHERE content <> ''
       |GROUP BY content
       |HAVING COUNT(*) >= 2
       |ORDER BY n_occurrences DESC, content_fp""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q219_chat_parse" -> (q219 _),
      "q220_assistant_dedup" -> (q220 _))

  override val oracle: Map[String, String] = Map(
    "q219_chat_parse" -> q219Sql,
    "q220_assistant_dedup" -> q220Sql)
}
