package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level dedup AT INGEST (SURVEY.md §2.11 applied to q144's
  * CDC device): as documents stream in, split each into
  * content-defined chunks and let only FIRST-SEEN chunk fingerprints
  * through — the write path of a dedup chunk store, where a
  * re-crawled page or a boilerplate-sharing document costs only its
  * novel chunks.
  *
  * The dedup state is Structured Streaming's own `dropDuplicates`
  * keyed state on the fingerprint — the engine-managed exactly-once
  * form. Two variants, the standard state tradeoff:
  *
  *   - [[firstSeenChunks]]: exact global dedup; state = one entry
  *     per DISTINCT chunk, growing with the corpus' novel content
  *     (at 100 TB that state lives in RocksDB and is itself the
  *     chunk-store index, so "growing" is the point, not a leak);
  *   - [[firstSeenChunksWithin]]: `dropDuplicatesWithinWatermark`
  *     bounds state by the event-time horizon — the re-crawl window
  *     form (a duplicate later than the horizon re-admits, exactly
  *     like q99's windowed ledger documents).
  *
  * StreamingChunkDedupSpec pins: the admitted set equals the batch
  * distinct-fingerprint set regardless of micro-batch slicing, a
  * duplicate-heavy second wave admits only novel chunks, and the
  * admitted token mass matches q144's corpus-wide accounting.
  */
object StreamingChunkDedup {

  /** (doc_id, chunk, n_tok, fp) rows of first-seen chunks (exact,
    * unbounded keyed state). Input: streaming docs with a `toks`
    * ARRAY<STRING> column.
    */
  def firstSeenChunks(docs: DataFrame): DataFrame = {
    graft.functions.CdcFunctions.register(docs.sparkSession)
    docs
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(expr("cdc_chunks(toks)")).as("c"))
      .select(col("doc_id"), col("c.chunk").as("chunk"),
        col("c.n_tok").as("n_tok"), col("c.fp").as("fp"))
      .dropDuplicates("fp")
  }

  /** Watermark-bounded variant: dedup within the `delay` event-time
    * horizon over the `ts` column (state expires with the watermark).
    */
  def firstSeenChunksWithin(docs: DataFrame, delay: String): DataFrame = {
    graft.functions.CdcFunctions.register(docs.sparkSession)
    docs
      .filter(size(col("toks")) > 0)
      .withWatermark("ts", delay)
      .select(col("ts"), col("doc_id"), explode(expr("cdc_chunks(toks)")).as("c"))
      .select(col("ts"), col("doc_id"), col("c.chunk").as("chunk"),
        col("c.n_tok").as("n_tok"), col("c.fp").as("fp"))
      .dropDuplicatesWithinWatermark("fp")
  }
}
