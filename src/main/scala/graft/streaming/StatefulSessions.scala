package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY.md §2.11's
  * engine-managed-state tier): an explicit sessionizer that emits a
  * summary row when a session CLOSES (gap > timeout), carrying
  * arbitrary per-session state the built-in `session_window`
  * aggregation cannot (here: first/last event ids and a value sum;
  * in the catalog pipeline, e.g. per-tile download bookkeeping).
  *
  * State is per user_id — high cardinality, even spread; processing-
  * time timeout expires idle sessions so state is bounded. Works on a
  * streaming Dataset (append mode) and, unchanged, on a batch Dataset
  * (each group processed once, all sessions emitted) — the batch path
  * is what the spec asserts.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double)
  case class SessionState(start: Long, lastTs: Long, firstId: Long,
      lastId: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, first_id: Long, last_id: Long, n_events: Int,
      sum_value: Double)

  val gapMs: Long = 30 * 60 * 1000

  def sessionize(events: Dataset[SessionEvent])(implicit s: SparkSession)
      : Dataset[SessionOut] = {
    import s.implicits._
    val streaming = events.isStreaming // don't capture the Dataset in the closure
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent],
            state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map(toOut(user, _))
            state.remove()
            out.iterator
          } else {
            // fold this batch's events (in event-time order) into the
            // open session; closed sessions accumulate for emission
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption.getOrElse(Nil).headOption
            var closed = List.empty[SessionState]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(st) if t - st.lastTs <= gapMs =>
                  open = Some(st.copy(lastTs = t, lastId = e.event_id,
                    n = st.n + 1, sum = st.sum + e.value))
                case cur =>
                  cur.foreach(st => closed ::= st)
                  open = Some(SessionState(t, t, e.event_id, e.event_id, 1,
                    e.value))
              }
            }
            state.update(open.toList)
            state.setTimeoutDuration(gapMs)
            // batch path: the final open session is emitted too (the
            // group is seen exactly once); streaming emits it on
            // timeout instead
            val tail = if (streaming) Nil else open.toList
            (closed.reverse ++ tail).map(toOut(user, _)).iterator
          }
      }
  }

  private def toOut(user: Long, st: SessionState): SessionOut =
    SessionOut(user, new Timestamp(st.start), new Timestamp(st.lastTs),
      st.firstId, st.lastId, st.n, st.sum)
}
