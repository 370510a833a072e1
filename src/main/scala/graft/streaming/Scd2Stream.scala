package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q34 SCD Type-2 build — live CDC dimension
  * versioning: each emitted row is a CLOSED version, bit-equal to the
  * corresponding `effective_to IS NOT NULL` row of
  * [[graft.operators.Windows.scd2]] over the key's closed-event
  * prefix. The OPEN version (batch's `is_current` row) lives in state
  * — a version only becomes Append-final when the next change closes
  * it, so the stream never emits a row it would have to retract.
  *
  * State per key is O(1) + the watermark-lag pending buffer: events
  * the watermark has closed fold in (us, tie) order through the same
  * collapse rule the batch lag applies (a repeat of the open state is
  * a no-op); a state CHANGE closes the open version (emits) and opens
  * the next.
  */
object Scd2Stream {

  /** One change event. `tie` is the deterministic tiebreak under
    * equal timestamps (the batch event_id). */
  final case class ScdEvent(key: Long, state: String,
                            ts: java.sql.Timestamp, tie: Long) {
    def us: Long = ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
  }

  /** pending: buffered (us, tie, state) the watermark hasn't closed;
    * openState/openFrom/version: the live version (version 0 = none
    * yet). */
  final case class ScdState(pending: List[(Long, Long, String)],
                            openState: String, openFrom: Long, version: Long)

  final case class ScdRow(key: Long, state: String, effective_from: Long,
                          effective_to: Long, version: Long)

  implicit val scdEvEnc: Encoder[ScdEvent] = Encoders.product[ScdEvent]
  implicit val scdStEnc: Encoder[ScdState] = Encoders.product[ScdState]
  implicit val scdRowEnc: Encoder[ScdRow] = Encoders.product[ScdRow]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Transition, exposed for unit tests. */
  def scdUpdate(key: Long, events: Iterator[ScdEvent],
                state: GroupState[ScdState]): Iterator[ScdRow] = {
    val st0 = state.getOption.getOrElse(ScdState(Nil, "", Long.MinValue, 0L))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val pending0 = st0.pending ++ events.map(e => (e.us, e.tie, e.state))
    val (closing, pending) = pending0.partition(_._1 < wmUs)
    var open = st0.version > 0L
    var openState = st0.openState
    var openFrom = st0.openFrom
    var version = st0.version
    val out = List.newBuilder[ScdRow]
    closing.sortBy(c => (c._1, c._2)).foreach { case (us, _, s) =>
      if (!open) {
        open = true; openState = s; openFrom = us; version = 1L
      } else if (s != openState) {
        // the batch lead: the open version closes AT the change
        out += ScdRow(key, openState, openFrom, us, version)
        openState = s; openFrom = us; version += 1L
      } // same state collapses — the batch lag filter
    }
    if (pending.isEmpty && !open) state.remove()
    else {
      state.update(ScdState(pending, openState, openFrom, version))
      pending.map(_._1).minOption
        .foreach(p => state.setTimeoutTimestamp(p / 1000L + 1L))
    }
    out.result().iterator
  }

  /** Streaming entry: Append-final CLOSED versions per key. `events`
    * must carry an event-time watermark on the column `ts` derives
    * from. The live open version per key is state, not output — read
    * it from the batch operator or a state-store query.
    */
  def scd2Versions(events: Dataset[ScdEvent]): Dataset[ScdRow] =
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[ScdState, ScdRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        scdUpdate _)
}
