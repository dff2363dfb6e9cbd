package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest INTO the persisted ANN index — the continuous
  * form of q121's batch append: vectors arriving on a stream are
  * assigned + PQ-encoded under the SAVED (immutable) model and
  * appended to the cell-partitioned code layout, micro-batch by
  * micro-batch. Because cell assignment and codes are per-vector
  * functions of the model, a search after any prefix of batches is
  * bit-identical to a batch rebuild over the vectors ingested so far
  * (StreamingIndexIngestSpec pins this against the q103 composition).
  *
  * Idempotence: `foreachBatch` is at-least-once — after a restart
  * Spark replays the last uncommitted batch. A replayed append would
  * duplicate codes (and silently skew ADC top-k), so each batch
  * commits through a marker log written AFTER the append; a batch
  * whose marker exists is skipped. Markers are keyed by
  * (stream token, batchId), where the token derives from the
  * CHECKPOINT location: a restart of the same stream (same
  * checkpoint, where Spark resumes batch numbering) hits the same
  * token and replays are skipped, while a NEW stream into the same
  * index (fresh checkpoint — Structured Streaming restarts batchIds
  * at 0) gets a fresh token and its early batches are NOT mistaken
  * for the old stream's. Keying by batchId alone would turn
  * checkpoint loss into silent data loss. The residual crash window
  * between append and marker needs a transactional table format,
  * which plain parquet does not offer — callers needing that
  * guarantee should ingest into a staging table and compact. Scale:
  * per batch, one exchange on cell (the
  * [[graft.operators.IndexStore.append]] discipline) and one marker
  * touch; the model stays a broadcast-sized closure.
  */
object StreamingIndexIngest {

  /** Stable per-stream token: same checkpoint → same token across
    * restarts; different checkpoint → different token.
    */
  def streamToken(checkpoint: String): String =
    java.util.UUID.nameUUIDFromBytes(
      checkpoint.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  /** Encode + append one micro-batch, skipping (token, batchId)
    * pairs already in the commit log. Factored out of [[start]] so
    * replay semantics are testable without crashing a real stream.
    */
  def ingestBatch(batch: DataFrame, batchId: Long, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String, token: String,
      vecCol: String = "embedding"): Boolean = {
    val s = batch.sparkSession
    val log = new org.apache.hadoop.fs.Path(s"$out/_ingest_log/$token-$batchId")
    val fs = log.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(log)) {
      // SKIP the append but still RUN the batch: when the upstream
      // plan holds a stateful operator (the chunk-dedup pipeline),
      // its state commits happen during batch evaluation, and Spark
      // validates that every partition of a replayed micro-batch was
      // processed — an early return would fail the replay with
      // STATE_STORE_COMMIT_VALIDATION_FAILED instead of recovering.
      batch.foreach(_ => ())
      false
    } else {
      graft.operators.IndexStore.append(
        graft.operators.Pq.encode(
          graft.operators.Ivf.assign(batch, cents, vecCol),
          codebooks, vecCol),
        out)
      fs.create(log, true).close()
      true
    }
  }

  /** Start the ingest stream: `vectors` must carry (`vec_id`,
    * `vecCol`: array<double>); the index at `out` must already hold
    * the model tables (from [[graft.operators.IndexStore.save]]).
    */
  def start(vectors: DataFrame, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String, checkpoint: String,
      vecCol: String = "embedding"): StreamingQuery = {
    val token = streamToken(checkpoint)
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, cents, codebooks, out, token, vecCol); ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
