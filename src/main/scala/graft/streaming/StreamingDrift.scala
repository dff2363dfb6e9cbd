package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming DISTRIBUTION-DRIFT gate — the stream analog of the batch
  * release gates q104 (length PSI) / q106 (embedding-cell PSI): score
  * each source's per-window document-length histogram against a
  * REFERENCE distribution (the accepted corpus) with the population
  * stability index, emitting one row per (window, source) when the
  * window closes. This is the operator that pages a data-ops rotation
  * the hour a source starts drifting, instead of at the next batch
  * audit.
  *
  * Scale design: state per (source, window) key is the bucket-count
  * map — O(#buckets) (~hundreds of longs), NOT the events (the naive
  * windowed `collect_list` buffers every event; Spark's single-
  * aggregation limit for streams rules out the two-level groupBy, so
  * keyed state with in-place counting is the right shape). Keys
  * expire on timeout, so state is bounded by
  * |sources| × |open windows|. The reference histogram is a
  * driver-side map broadcast into the closure — model-sized, like the
  * IVF centroids.
  *
  * The batch path (same function on a batch Dataset) emits every
  * window at group end; StreamingDriftSpec proves it equal to the
  * oracle-certified q104 when the reference IS the corpus
  * distribution, and certifies the timeout branch via TestGroupState
  * (the StatefulSessions/StreamingFunnel discipline — a
  * ProcessingTimeTimeout spun through MemoryStream flakes, see
  * StatefulSessions).
  */
object StreamingDrift {

  case class DocEvent(ts: Timestamp, source: String, n_chars: Long)
  case class DriftOut(window_start: Timestamp, source: String,
      n_docs: Long, n_buckets: Int, psi: Double)
  /** The QUANTIZED-UNITS form ([[psiQ32]]) — the monitor's output in
    * the same ≈46.166·ln units as the gated q104/q106 rows.
    */
  case class DriftOutQ32(window_start: Timestamp, source: String,
      n_docs: Long, n_buckets: Int, psi_q32: Double)

  val windowMs: Long = 3600L * 1000
  val bucketChars: Long = 100L
  /** Floor for reference buckets the accepted corpus never saw —
    * keeps ln finite; a drifting source hitting unseen buckets is
    * exactly what must score HIGH.
    */
  val refFloor: Double = 1e-6

  /** The per-group transition, exposed for direct spec testing.
    * `twoSided` switches the emitted score to [[psiTwoSided]].
    */
  def transition(reference: Map[Int, Double], streaming: Boolean,
      twoSided: Boolean = false)(
      key: (String, Long), it: Iterator[DocEvent],
      state: GroupState[Map[Int, Long]]): Iterator[DriftOut] = {
    val (source, winStart) = key
    if (state.hasTimedOut) {
      val counts = state.getOption.getOrElse(Map.empty[Int, Long])
      state.remove()
      Iterator.single(toOut(source, winStart, counts, reference, twoSided))
    } else {
      var counts = state.getOption.getOrElse(Map.empty[Int, Long])
      it.foreach { d =>
        val b = (d.n_chars / bucketChars).toInt
        counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
      }
      state.update(counts)
      if (streaming) {
        state.setTimeoutDuration(windowMs)
        Iterator.empty
      } else Iterator.single(toOut(source, winStart, counts, reference,
        twoSided))
    }
  }

  def driftPsi(docs: Dataset[DocEvent], reference: Map[Int, Double],
      twoSided: Boolean = false)(
      implicit s: SparkSession): Dataset[DriftOut] = {
    import s.implicits._
    val streaming = docs.isStreaming
    docs
      .groupByKey(d =>
        (d.source, Math.floorDiv(d.ts.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[Map[Int, Long], DriftOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        transition(reference, streaming, twoSided))
  }

  /** The QUANTIZED-UNITS drift gate (round 17): the same windowed
    * counting transition, scored with [[psiQ32]] — the reference
    * arrives as exact BUCKET COUNTS (not float shares), and the
    * emitted psi_q32 is textually the gated q104 row's term algebra
    * ((c/n − ct/nn) · (ql32(c·nn) − ql32(ct·n)), bucket order,
    * round-6), so the batch-mode execution of THIS function is
    * hash-gated inside q104 itself — the monitor's scoring path
    * certifies cross-engine, not just spec-side. The streamed form's
    * window EMISSION stays timer-bound (ProcessingTimeTimeout —
    * TestGroupState-certified; a timer spun through MemoryStream
    * flakes, see the object scaladoc).
    */
  def driftPsiQ32(docs: Dataset[DocEvent], refCounts: Map[Int, Long])(
      implicit s: SparkSession): Dataset[DriftOutQ32] = {
    import s.implicits._
    val streaming = docs.isStreaming
    docs
      .groupByKey(d =>
        (d.source, Math.floorDiv(d.ts.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[Map[Int, Long], DriftOutQ32](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: (String, Long), it: Iterator[DocEvent],
            state: GroupState[Map[Int, Long]]) =>
          val (source, winStart) = key
          if (state.hasTimedOut) {
            val counts = state.getOption.getOrElse(Map.empty[Int, Long])
            state.remove()
            Iterator.single(toOutQ32(source, winStart, counts, refCounts))
          } else {
            var counts = state.getOption.getOrElse(Map.empty[Int, Long])
            it.foreach { d =>
              val b = (d.n_chars / bucketChars).toInt
              counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
            }
            state.update(counts)
            if (streaming) {
              state.setTimeoutDuration(windowMs)
              Iterator.empty
            } else Iterator.single(
              toOutQ32(source, winStart, counts, refCounts))
          }
      }
  }

  /** PSI in ql32 units over exact integer counts — term for term the
    * gated q104 algebra: (c/n − ct/nn) · (ql32(c·nn) − ql32(ct·n)),
    * observed buckets only. INTEGER-ROUTED like the gated SQL (round
    * 18, graft.ExactSum): each term — bit-identical to the SQL term,
    * pure IEEE ops on exact integers — quantizes at 1e-9 via Spark's
    * exact Round semantics, the quantized terms sum exactly in Long
    * (ORDER-INDEPENDENT, so this scorer's iteration order can never
    * diverge from either engine's reduction order — the divergence
    * channel the old round-6 had to absorb), and one division
    * recovers the value, join-comparable with the gated row by
    * construction. Term bound |t|·1e9 ≤ ~2e12 and ≤ ~4e6 buckets
    * leave the worst-case Long sum only ~13% under wrap, so the sum
    * is overflow-CHECKED (addExact), not assumed safe. The reference
    * must cover the
    * observed support (true by construction when the reference is
    * the accepted corpus, q104's contract) — an uncovered bucket
    * refuses loudly rather than inventing a floor (the refFloor
    * generalization lives in [[psiTwoSided]]'s ln form).
    */
  def psiQ32(counts: Map[Int, Long], refCounts: Map[Int, Long]): Double = {
    val n = counts.values.sum
    val nn = refCounts.values.sum
    val sumQ = counts.toSeq.sortBy(_._1).map { case (b, c) =>
      val ct = refCounts.getOrElse(b, 0L)
      require(ct >= 1,
        s"psiQ32: observed bucket $b missing from the reference support")
      // multiplyExact: the cross products must stay in Long (their
      // documented bound) — an overflowing corpus refuses loudly
      // here rather than silently wrapping into a wrong ql32.
      val term = (c.toDouble / n - ct.toDouble / nn) *
        (graft.operators.Unigram.ql32(Math.multiplyExact(c, nn)) -
          graft.operators.Unigram.ql32(Math.multiplyExact(ct, n))).toDouble
      graft.ExactSum.quantize(term, 9)
      // addExact: at the documented bounds (|t|·1e9 ≤ ~2e12 over
      // ≤ ~4e6 buckets) the worst case is ~8e18 — only ~13% under
      // Long.MAX_VALUE, close enough that an out-of-bound corpus
      // must refuse loudly (matching the multiplyExact discipline
      // above) rather than wrap silently into a wrong PSI.
    }.foldLeft(0L)(Math.addExact)
    sumQ.toDouble / 1e9
  }

  private def toOutQ32(source: String, winStart: Long,
      counts: Map[Int, Long], refCounts: Map[Int, Long]): DriftOutQ32 =
    DriftOutQ32(new Timestamp(winStart), source, counts.values.sum,
      counts.size, psiQ32(counts, refCounts))

  /** PSI of the observed counts against the reference; terms summed
    * in bucket order for run-to-run determinism.
    *
    * ONE-SIDED by design: only buckets observed in the window
    * contribute — a reference bucket whose mass VANISHES from the
    * source adds nothing (matching the q104 batch oracle semantics,
    * pinned by StreamingDriftSpec). Threshold guidance: this gate
    * pages on shifted/new mass, not on missing mass; if "source
    * stopped producing a length class entirely" must page too, opt
    * into [[psiTwoSided]] (the `twoSided` flag on [[driftPsi]]),
    * which adds the symmetric term for reference-only buckets with
    * the observed share floored at refFloor — the two-sided
    * STRUCTURE (observed + floored missing terms) is certified
    * cross-engine by the q130 batch twin (which computes it in
    * quantized ql32 log units under its hash gate; this in-stream
    * monitor keeps natural-log units — no hash gate applies here).
    * The default stays one-sided to match the q104 batch oracle
    * semantics.
    */
  def psi(counts: Map[Int, Long], reference: Map[Int, Double]): Double = {
    val n = counts.values.sum.toDouble
    counts.toSeq.sortBy(_._1).map { case (b, c) =>
      val p = c / n
      val q = math.max(reference.getOrElse(b, 0.0), refFloor)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** TWO-SIDED variant: [[psi]] plus the symmetric term for reference
    * buckets the window never observed — their observed share is
    * floored at [[refFloor]], so vanished mass contributes
    * (refFloor - q)·ln(refFloor/q) ≈ q·ln(q/refFloor) > 0 and a
    * source that silently stops producing a length class pages too
    * (the one-sidedness caveat on [[psi]], closed as an opt-in; the
    * batch twin q130 certifies the term cross-engine). Terms sum in
    * bucket order, missing-bucket terms after observed ones — fixed
    * order, deterministic across runs.
    */
  def psiTwoSided(counts: Map[Int, Long], reference: Map[Int, Double])
      : Double =
    psi(counts, reference) +
      reference.toSeq.sortBy(_._1).collect {
        case (b, q) if !counts.contains(b) && q > 0.0 =>
          (refFloor - q) * math.log(refFloor / q)
      }.sum

  private def toOut(source: String, winStart: Long, counts: Map[Int, Long],
      reference: Map[Int, Double], twoSided: Boolean): DriftOut =
    DriftOut(new Timestamp(winStart), source, counts.values.sum,
      counts.size,
      if (twoSided) psiTwoSided(counts, reference)
      else psi(counts, reference))
}
