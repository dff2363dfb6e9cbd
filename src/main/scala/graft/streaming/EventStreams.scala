package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's incremental semantics
  * (SURVEY.md §2.11). The reference's only incremental behaviors are a
  * date-windowed catalog poll + uuid-keyed dedup
  * (`/root/reference/code/imagery_store.py:184`, `code/dataset.py:54`);
  * these generalize here to the standard event-time toolkit. Each
  * transform takes any streaming DataFrame with the `events` schema
  * (ts TIMESTAMP, event_id, user_id, event_type, value) and returns a
  * streaming DataFrame — source/sink wiring stays with the caller, so
  * the same code runs against Kafka, files, or MemoryStream in tests.
  *
  * The batch twins of these computations are oracle-checked in
  * graft.queries.EventsWindows (q16/q19/q20): identical aggregation
  * logic, so streaming output (in append/complete mode at watermark
  * close) converges to the batch answer.
  *
  * Scale: all state is keyed by user_id / window — high cardinality,
  * even spread; watermarks bound state size; no global ordering is
  * ever required.
  */
object EventStreams {

  /** Tumbling event-time window counts/sums with a watermark
    * (streaming twin of q16_tumbling_window).
    */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))

  /** Session windows with a 30-minute gap (streaming twin of
    * q19_sessionize) — Spark's native session_window keeps per-key
    * state and merges adjacent windows, the engine-managed version of
    * the lag+cumsum batch form.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Keyed dedup with bounded state (streaming twin of the reference's
    * uuid-keyed cache, and of q20's keep-one-per-key): first event per
    * event_id wins; watermark expires state.
    */
  def dedupByKey(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental catalog poll (SURVEY §2.11): new products appear with
    * event-time = OriginDate; keep first occurrence per product uuid.
    * Same dedup primitive applied to the catalog schema.
    */
  def catalogIncremental(catalog: DataFrame, watermark: String = "7 days"): DataFrame =
    catalog
      .withColumn("origin_ts", to_timestamp(col("OriginDate")))
      .withWatermark("origin_ts", watermark)
      .dropDuplicatesWithinWatermark("Id")

  /** Stream-stream event-time interval join: attribute each `click`
    * to the same user's `view` that happened at most `horizon` before
    * it (the streaming twin of q36's as-of attribution). Watermarks on
    * BOTH sides plus the time-range predicate bound the join state:
    * views are dropped once no in-horizon click can still arrive —
    * Spark's canonical state-bounded stream-stream join shape.
    */
  def clickViewJoin(views: DataFrame, clicks: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"), col("value"))
      .withWatermark("c_ts", watermark)
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"), col("value"))
  }
}
