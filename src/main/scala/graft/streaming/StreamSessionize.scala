package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming sessionization with
  * `flatMapGroupsWithState` — the custom-state surface of Structured
  * Streaming (SURVEY.md §7.3): per-key session state lives in the state
  * store, sessions close when the event-time gap exceeds `gapSeconds`
  * (decided on watermark progress via event-time timeout, so the state
  * size is bounded by the number of OPEN sessions, not history).
  */
object StreamSessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(
      start: Timestamp, last: Timestamp, n: Long, sum: Double)
  final case class Session(
      user_id: Long, s_start: Timestamp, s_end: Timestamp,
      n_events: Long, sum_value: Double)

  def sessionFn(gapSeconds: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val gapMs = gapSeconds * 1000L
    var out = List.empty[Session]
    var cur = state.getOption

    if (state.hasTimedOut) {
      // watermark passed the open session's close boundary → emit final
      cur.foreach { s =>
        out ::= Session(userId, s.start, s.last, s.n, s.sum)
      }
      state.remove()
      cur = None
    } else {
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur match {
          case Some(s) if e.ts.getTime - s.last.getTime <= gapMs =>
            cur = Some(s.copy(last = e.ts, n = s.n + 1,
              sum = s.sum + e.value))
          case Some(s) => // gap exceeded: close previous, open new
            out ::= Session(userId, s.start, s.last, s.n, s.sum)
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes last-event + gap
        state.setTimeoutTimestamp(s.last.getTime + gapMs)
      }
    }
    out.reverseIterator
  }

  /** events stream → closed sessions (append mode). */
  def sessions(spark: SparkSession, events: Dataset[Event],
               gapSeconds: Long, watermark: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapSeconds))
  }
}
