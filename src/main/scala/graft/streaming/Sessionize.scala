package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond windowed aggregation: inactivity
  * sessionization via `flatMapGroupsWithState` — the Spark-native
  * answer where the reference would need hand-rolled state in its
  * window loop.
  *
  * A session = consecutive events of one key with gaps < `gapSec`;
  * it closes when the event-time watermark passes last_event + gap.
  * State per key is O(1) (bounds, count, sum), so state-store size is
  * #active-keys, not #events — the property that matters at 100 TB:
  * a billion-key stream holds a billion tiny structs, never raw rows.
  */
object Sessionize {

  /** `ts` must be the watermarked event-time column — event-time
    * timeout requires the watermark column to survive into the
    * grouped Dataset.
    */
  final case class Event(key: String, ts: java.sql.Timestamp, value: Double) {
    def tsSec: Long = ts.getTime / 1000L
  }

  final case class SessionState(
      start: Long, lastTs: Long, n: Long, sum: Double)

  final case class Session(
      key: String, start: Long, end: Long, n: Long, sum: Double,
      durationSec: Long)

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  /** Core transition function, exposed for unit tests. */
  def update(gapSec: Long)(
      key: String, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(key, s.start, s.lastTs, s.n, s.sum, s.lastTs - s.start))
    } else {
      val sorted = events.toSeq.sortBy(_.tsSec)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.tsSec - s.lastTs < gapSec =>
            cur = Some(s.copy(lastTs = math.max(s.lastTs, e.tsSec),
              n = s.n + 1, sum = s.sum + e.value))
          case Some(s) => // gap exceeded inside the batch: close, start anew
            closed ::= Session(key, s.start, s.lastTs, s.n, s.sum, s.lastTs - s.start)
            cur = Some(SessionState(e.tsSec, e.tsSec, 1L, e.value))
          case None =>
            cur = Some(SessionState(e.tsSec, e.tsSec, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes lastTs + gap
        state.setTimeoutTimestamp((s.lastTs + gapSec) * 1000L)
      }
      closed.reverseIterator
    }
  }

  /** Streaming entry point: `events` must carry an event-time
    * watermark on a timestamp column from which `tsSec` was derived.
    */
  def sessions(events: Dataset[Event], gapSec: Long): Dataset[Session] =
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update(gapSec) _)
}
