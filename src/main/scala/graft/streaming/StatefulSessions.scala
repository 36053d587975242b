package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** §2.12 custom-state path: sessionization as explicit keyed state via
  * flatMapGroupsWithState — for session semantics `session_window` cannot
  * express (e.g. carrying arbitrary per-session accumulators, emitting
  * per-leg derived records, or the Clipper transfer-attribute carry).
  * State per key is one open session; an event-time timeout closes it when
  * the watermark passes last-event + gap, so state is bounded and late
  * data beyond the watermark cannot reopen a closed session.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
      n_events: Long, sum_value: Double)

  private def close(key: Long, s: OpenSession): SessionOut =
    SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sum)

  def update(gapMs: Long)(
      key: Long, events: Iterator[Ev], state: GroupState[OpenSession])
      : Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(close(key, s))
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.lastMs < gapMs =>
            // out-of-order (but not late) events must EXTEND the session
            // bounds, never rewind them — lastMs going backwards would
            // emit end_ts earlier than contained events and fire the
            // event-time timeout early
            Some(s.copy(startMs = math.min(s.startMs, t),
              lastMs = math.max(s.lastMs, t),
              n = s.n + 1, sum = s.sum + e.value))
          case Some(s) =>
            closed ::= close(key, s)
            Some(OpenSession(t, t, 1, e.value))
          case None => Some(OpenSession(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.reverse.iterator
    }
  }

  /** Wire over a (watermarked, streaming) Dataset[Ev]. */
  def sessions(ds: Dataset[Ev], gapMinutes: Double): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update((gapMinutes * 60000).toLong))
  }
}
