package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** STREAMING near-duplicate candidate detection — the incremental
  * form of the batch MinHash/LSH pipeline (graft.queries.Dedup
  * q29/q30): as documents arrive, each is flagged against everything
  * seen so far, without ever re-scanning the corpus.
  *
  * Shape: per-row MinHash band values (band j = min over the doc's
  * token hashes of a_j·h+b_j mod p — row-local, no aggregation), one
  * explode to (band, band_val) bucket keys, then
  * `flatMapGroupsWithState` keyed by bucket: the state is the FIRST
  * doc_id that produced this bucket, and every later arrival is
  * emitted as a candidate against it. A doc agreeing with a previous
  * doc on >= 2 of 4 bands is a near-dup candidate — exactly the
  * batch q30 threshold, evaluated incrementally.
  *
  * Scale: state is one Long per DISTINCT (band, band_val) bucket —
  * high-cardinality keys, even spread, ~32 bytes/bucket; at lake
  * scale buckets are bounded by corpus size × bands, and a
  * processing-time timeout (production) or snapshot compaction
  * bounds retention. The batch path (same code on a non-streaming
  * Dataset) is what the spec cross-checks against q30 semantics.
  */
object StreamingNearDup {

  case class DocEvent(doc_id: Long, ts: Timestamp, text: String)
  /** One bucket hit: `seen_before` = some earlier doc (or an earlier
    * doc of the same batch, in doc_id order) already occupied the
    * bucket; `first_doc` = that occupant (self for the first).
    */
  case class BandHit(doc_id: Long, band: Int, band_val: Long,
      first_doc: Long, seen_before: Boolean)

  private val P = 2147483647L
  // first 4 rows of the batch MinHash parameter table (Dedup q29)
  private val params: Seq[(Int, Long, Long)] = Seq(
    (0, 1103515245L, 12345L), (1, 1223106847L, 581869302L),
    (2, 1406932606L, 654583775L), (3, 1744325963L, 137228648L))

  def bandCandidates(docs: Dataset[DocEvent])(implicit s: SparkSession)
      : Dataset[BandHit] = {
    import s.implicits._
    // Stage the token-hash array ONCE per document: the regex
    // tokenize + per-token md5 dominate the per-row cost, and inlining
    // them into each band struct re-evaluates them per band (Spark
    // does not CSE across array elements) — measured 2.4x slower on
    // the batch twin. Each band then costs one arithmetic transform
    // + array_min over the staged array.
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    val hashes =
      s"transform($toks, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % $P)"
    val bandStructs = params.map { case (i, a, b) =>
      s"""struct(CAST($i AS INT) AS band,
         |  CASE WHEN size(hs) = 0 THEN CAST(-1 AS BIGINT)
         |       ELSE array_min(transform(hs, x -> ($a * x + $b) % $P))
         |  END AS band_val)""".stripMargin
    }.mkString(", ")
    docs
      .select(col("doc_id"), expr(hashes).as("hs"))
      .select(col("doc_id"),
        explode(expr(s"array($bandStructs)")).as("bv"))
      .select(col("doc_id"), col("bv.band"), col("bv.band_val"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, v) => (band, v) }
      .flatMapGroupsWithState[Long, BandHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), it: Iterator[(Long, Int, Long)],
            state: GroupState[Long]) =>
          val (band, v) = key
          // doc_id order makes same-batch arrivals deterministic
          val arrivals = it.map(_._1).toSeq.sorted
          val first = state.getOption.getOrElse(arrivals.head)
          if (!state.exists) state.update(first)
          arrivals.iterator.map(d =>
            BandHit(d, band, v, first, seen_before = d != first))
      }
  }
}
