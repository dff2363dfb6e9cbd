package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming conversion funnel — the stream twin of the certified
  * batch funnel (q73, `queries/PipelineOps.scala`): per user the
  * FIRST time of each stage, a stage counting only if it happens
  * strictly after the previous stage's first time
  * (view → click → signup → purchase).
  *
  * Emission contract: one `StageOut` row per NEW stage a user
  * reaches, as soon as the evidence arrives (stage transitions are
  * the thing downstream alerting consumes — emitting per-user
  * snapshots every batch would be Update-mode semantics and
  * re-deliver unchanged rows). Late data can in principle REGRESS a
  * stage (an earlier click arriving below the first view breaks the
  * strict chain); the emitted stream is therefore the running MAX
  * stage — monotone, append-safe — while the batch path (every
  * group sees all its events in one call) computes the exact final
  * stage, bit-equal to q73's per-user logic. StreamingFunnelSpec
  * asserts that equality.
  *
  * State per user is four Longs + the emitted watermark — tiny and
  * high-cardinality keyed. It is NOT expired by default: funnels
  * exist to catch long-lag conversions, and expiry would both drop
  * them and re-emit climbed stages for returning users (see the
  * `stateTtl` param doc for the opt-in trade).
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  /** First-seen epoch-MICROS per stage (q73 compares full-precision
    * timestamps; millisecond truncation would flip strict '>' to a
    * tie on sub-ms data); Long.MaxValue = unseen. */
  case class FunnelState(view: Long, click: Long, signup: Long,
      purchase: Long, emitted: Int)
  case class StageOut(user_id: Long, stage: Int, reached_us: Long)

  private val unseen =
    FunnelState(Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue, 0)

  /** q73's strict-order stage, from the per-stage first times. */
  def stageOf(st: FunnelState): Int =
    if (st.view == Long.MaxValue) 0
    else if (!(st.click > st.view && st.click != Long.MaxValue)) 1
    else if (!(st.signup > st.click && st.signup != Long.MaxValue)) 2
    else if (!(st.purchase > st.signup && st.purchase != Long.MaxValue)) 3
    else 4

  private def reachedAt(st: FunnelState, stage: Int): Long = stage match {
    case 1 => st.view
    case 2 => st.click
    case 3 => st.signup
    case _ => st.purchase
  }

  /** @param stateTtl optional processing-time TTL after which an idle
    *        user's state is dropped. Default None: state is NEVER
    *        expired — a funnel's whole point is long-lag conversions
    *        (q102 measures lags of days), and expiry trades
    *        correctness for memory in two visible ways: a conversion
    *        arriving after expiry under-counts (the earlier stages'
    *        first times are gone), and a returning user RE-emits the
    *        stages it climbs again, double-counting transitions.
    *        Pass a TTL only when the key space is unbounded and the
    *        consumer tolerates both effects past the horizon.
    */
  def stages(events: Dataset[FunnelEvent], stateTtl: Option[String] = None)
      (implicit s: SparkSession): Dataset[StageOut] = {
    import s.implicits._
    val streaming = events.isStreaming // don't capture the Dataset in the closure
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageOut](
        OutputMode.Append(), timeoutConf)(processGroup(stateTtl, streaming))
  }

  /** The per-group state transition, exposed so the timeout branch is
    * unit-testable with Spark's public `TestGroupState` — a real
    * ProcessingTimeTimeout MemoryStream test spins no-data timer
    * batches (see StatefulSessions' testing discipline).
    */
  private[graft] def processGroup(stateTtl: Option[String], streaming: Boolean)(
      user: Long, it: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(unseen)
      it.foreach { e =>
        // floorDiv: plain / truncates toward zero and mis-orders
        // pre-1970 timestamps against their sub-second nanos
        val t = Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
          e.ts.getNanos / 1000
        e.event_type match {
          case "view" => st = st.copy(view = math.min(st.view, t))
          case "click" => st = st.copy(click = math.min(st.click, t))
          case "signup" => st = st.copy(signup = math.min(st.signup, t))
          case "purchase" =>
            st = st.copy(purchase = math.min(st.purchase, t))
          case _ => ()
        }
      }
      val stage = stageOf(st)
      val out = ((st.emitted + 1) to stage)
        .map(k => StageOut(user, k, reachedAt(st, k)))
      st = st.copy(emitted = math.max(st.emitted, stage))
      state.update(st)
      stateTtl.foreach(ttl =>
        if (streaming) state.setTimeoutDuration(ttl))
      out.iterator
    }
}
