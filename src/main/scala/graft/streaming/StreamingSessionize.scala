package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One clickstream event for [[StreamingSessionize]]. */
final case class SessionEvent(event_id: Long, ts: Timestamp, user_id: Long)

/** Mutable-across-batches session state (one per live user). */
final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

/** A closed session. */
final case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long)

/** Streaming sessionization — the custom-state streaming op the batch
  * `q_sessionize` query mirrors (same rule: a gap strictly greater than
  * `gapMs` between consecutive events of a user starts a new session).
  *
  * This is the canonical `flatMapGroupsWithState` shape: key = user, state =
  * the user's open session, output = sessions closed either by a
  * larger-than-gap successor event or by the event-time watermark passing
  * `lastEvent + gap` (EventTimeTimeout — no processing-time flakiness, and
  * late events within the watermark still extend the right session because
  * each micro-batch's group slice is processed in (ts, event_id) order).
  *
  * 100 TB shape: state is one small record per live user, hash-partitioned
  * by user across executors by the groupByKey shuffle; eviction is the
  * timeout, so state size tracks concurrently-active users, not history.
  */
object StreamingSessionize {

  val DefaultGapMs: Long = 30L * 60 * 1000 // the batch query's 30-minute rule

  def sessions(events: Dataset[SessionEvent], gapMs: Long = DefaultGapMs,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def close(s: OpenSession): Unit =
            out += SessionOut(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
          if (state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
          } else {
            var cur = state.getOption.orNull
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            evs.foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = OpenSession(t, t, 1)
              else if (t - cur.lastMs > gapMs) { close(cur); cur = OpenSession(t, t, 1) }
              else cur = OpenSession(cur.startMs, math.max(cur.lastMs, t), cur.n + 1)
            }
            if (cur != null) {
              // the watermark may already be past this session's horizon
              // (e.g. these events arrived almost-late): close it now, since
              // setTimeoutTimestamp would reject a timestamp <= watermark
              val wm = state.getCurrentWatermarkMs()
              if (cur.lastMs + gapMs <= wm) { close(cur); state.remove() }
              else { state.update(cur); state.setTimeoutTimestamp(cur.lastMs + gapMs) }
            }
          }
          out.iterator
        })
  }
}
