package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state Structured Streaming form of [[graft.events.EventOps
  * .sessions]] (which is the batch window-function form).
  *
  * State per user = (current session ordinal, events so far, session start,
  * last event time). An event-time timeout of `gapMinutes` past the
  * watermark closes and EMITS a session exactly when no further event can
  * legally extend it (later events would be dropped as late data), so
  * emitted spans match the batch gap rule.
  *
  * Scale notes: state is O(active users), partitioned by the group key —
  * the standard production shape for billions of events; nothing driver-side.
  */
object SessionizeStream {

  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(seq: Long, n: Long, start: Timestamp, last: Timestamp)
  case class Session(
      user_id: Long, session_seq: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** sessionize a watermarked stream of (user_id, ts) events. Input MUST
    * carry a watermark on a TIMESTAMP `ts` (enforced by Spark at analysis);
    * the projection must not transform `ts` — a cast would produce a fresh
    * column without the watermark tag. */
  def sessions(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // no event within the gap of the watermark: close + emit
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.seq, s.n, s.start, s.last))
          } else {
            // micro-batch events arrive unordered within the batch: sort
            // locally (bounded by per-user-per-batch volume)
            val evs = it.toArray.sortBy(_.ts.getTime)
            var out = List.empty[Session]
            var st = state.getOption.orNull
            for (e <- evs) {
              st match {
                case null =>
                  st = SessionState(1L, 1L, e.ts, e.ts)
                case s if e.ts.getTime - s.last.getTime > gapMs =>
                  out = Session(uid, s.seq, s.n, s.start, s.last) :: out
                  st = SessionState(s.seq + 1, 1L, e.ts, e.ts)
                case s =>
                  st = s.copy(n = s.n + 1, last = e.ts)
              }
            }
            // close the open session once the watermark passes last + gap;
            // if this batch's watermark already passed it (coarse micro-
            // batches can advance event time by more than the gap), a
            // timeout in the past is illegal — emit and drop state now.
            // STRICTLY past: an event at exactly last+gap belongs to the
            // same session under the strict-> batch gap rule and is not yet
            // late when watermark == last+gap, matching EventTimeTimeout's
            // own strictly-greater firing semantics
            if (st.last.getTime + gapMs < state.getCurrentWatermarkMs()) {
              out = Session(uid, st.seq, st.n, st.start, st.last) :: out
              state.remove()
            } else {
              state.update(st)
              state.setTimeoutTimestamp(st.last.getTime + gapMs)
            }
            out.reverseIterator
          }
      }
  }
}
