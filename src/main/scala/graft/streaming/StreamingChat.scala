package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chat-transcript ingest AT STREAM TIME (SURVEY.md §2.11 applied to
  * the q219/q220 chat tier): JSONL conversations arrive as
  * (conv_id, json) lines — the shape a feedback/SFT collection
  * endpoint emits — are parsed INSIDE the streaming plan with
  * PERMISSIVE `from_json` (a malformed line becomes an inline
  * dead-letter row, never a crashed query and never a silent drop),
  * exploded to turns, and novel assistant replies are admitted
  * first-seen (the q220 templated-response dedup made continuous).
  *
  * The dedup state is Structured Streaming's own `dropDuplicates`
  * keyed state on the reply content — engine-managed exactly-once
  * (at scale that RocksDB state IS the reply store; its growth with
  * novel replies is the point). The dead-letter rows ride the SAME
  * stream with `ok = false` so the production sink can route them by
  * filter — one plan, no second pass over the source.
  *
  * StreamingChatSpec pins: malformed lines land in the dead letter
  * and nowhere else, repeated replies are admitted exactly once
  * across micro-batches, and slicing does not change the admitted
  * set.
  */
object StreamingChat {

  private val turnSchema = "ARRAY<STRUCT<role: STRING, content: STRING>>"

  /** Parse + explode: (conv_id, json) → (conv_id, ok, idx, role,
    * content). A malformed conversation yields exactly one row with
    * ok = false and idx = -1 (the inline dead letter). A VALID
    * conversation whose turn array is EMPTY (`[]`) yields exactly one
    * row with ok = true and idx = -1: posexplode alone would emit
    * zero rows, silently deleting the conversation from any
    * downstream per-conversation ledger — the sentinel keeps the
    * stream's conversation count equal to the batch count, so a
    * stream-vs-batch gate failure points at a real divergence
    * instead of the empty-array case. Turn consumers filter
    * `idx >= 0`.
    */
  def parsedTurns(rows: DataFrame): DataFrame = {
    val parsed = rows
      .withColumn("parsed", expr(s"from_json(json, '$turnSchema')"))
    val turns = parsed
      .filter(col("parsed").isNotNull && size(col("parsed")) > 0)
      .select(col("conv_id"), posexplode(col("parsed")).as(Seq("idx", "t")))
      .select(col("conv_id"), lit(true).as("ok"),
        col("idx"), col("t.role").as("role"), col("t.content").as("content"))
    val empty = parsed
      .filter(col("parsed").isNotNull && size(col("parsed")) === 0)
      .select(col("conv_id"), lit(true).as("ok"),
        lit(-1).as("idx"), lit(null).cast("string").as("role"),
        lit(null).cast("string").as("content"))
    val dead = parsed
      .filter(col("parsed").isNull)
      .select(col("conv_id"), lit(false).as("ok"),
        lit(-1).as("idx"), lit(null).cast("string").as("role"),
        lit(null).cast("string").as("content"))
    turns.unionByName(empty).unionByName(dead)
  }

  /** First-seen admission of non-empty assistant replies (exact,
    * unbounded engine-managed keyed state — the reply store).
    */
  def firstSeenReplies(rows: DataFrame): DataFrame =
    parsedTurns(rows)
      .filter(col("ok") && col("role") === "assistant"
        && col("content") =!= "")
      .dropDuplicates("content")
}
