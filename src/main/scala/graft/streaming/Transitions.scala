package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch transition miner (the lag step of
  * `operators.LogMining.rareTransitions`): emit each key's adjacent
  * (src, dst) template edges as the WATERMARK finalizes their order —
  * the live feed the r24 rarity scorer (an ordinary streaming
  * aggregation over these edges) consumes.
  *
  * Parity with the batch lag: events buffer per key until the
  * watermark passes their timestamp; finalization sorts the ripe
  * prefix by (tsUs, id) — the batch window's exact order, µs-accurate
  * via toInstant — and emits its adjacent pairs, chaining through the
  * key's last finalized event so batch boundaries never lose an edge.
  * Any arrival within the watermark allowance therefore lands in its
  * sorted position BEFORE the events around it finalize, and the
  * emitted edge multiset equals the batch lag's exactly (spec-pinned
  * across out-of-order, cross-batch arrivals). The one divergence is
  * the repo-wide watermark contract: an event later than the
  * allowance is outside the guarantee — it may be dropped upstream,
  * or finalize out of order here if it slips through.
  *
  * State per key: the unripe tail (bounded by rate x allowance) plus
  * ONE finalized boundary event — after a flush, O(1) forever, the
  * AlertEdges precedent. Timeouts drive idle-key flushes: the buffer
  * sets an event-time timeout just past its newest event, so a key
  * that goes quiet still finalizes once the watermark passes it.
  */
object Transitions {

  final case class Ev(key: String, ts: java.sql.Timestamp, id: Long,
                      tpl: String) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }

  final case class BufEv(tsUs: Long, id: Long, tpl: String)

  final case class TState(last: Option[BufEv], buf: List[BufEv])

  final case class Edge(key: String, src_template: String,
                        dst_template: String)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val stEnc: Encoder[TState] = Encoders.product[TState]
  implicit val edgeEnc: Encoder[Edge] = Encoders.product[Edge]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Core transition, exposed for unit tests. */
  def update(key: String, events: Iterator[Ev],
             state: GroupState[TState]): Iterator[Edge] = {
    val prev = state.getOption.getOrElse(TState(None, Nil))
    val buf = prev.buf ++ events.map(e => BufEv(e.tsUs, e.id, e.tpl))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val sorted = buf.sortBy(b => (b.tsUs, b.id))
    val (ripe, tail) = sorted.partition(_.tsUs <= wmUs)
    val chain = prev.last.toList ++ ripe
    val edges = chain.sliding(2).collect {
      case a :: b :: Nil => Edge(key, a.tpl, b.tpl)
    }.toList
    val last = if (ripe.nonEmpty) Some(ripe.last) else prev.last
    if (tail.isEmpty && last.isEmpty) state.remove()
    else {
      state.update(TState(last, tail))
      // flush the tail once the watermark passes its newest event;
      // an empty tail keeps the O(1) boundary state with no timeout
      if (tail.nonEmpty)
        state.setTimeoutTimestamp(tail.map(_.tsUs).max / 1000L + 1L)
    }
    edges.iterator
  }

  /** Streaming entry point: `events` must carry an event-time
    * watermark on the column `ts` derives from; `tpl` is the
    * row-local r18 template (LogMining.template), computed upstream.
    */
  def edges(events: Dataset[Ev]): Dataset[Edge] =
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[TState, Edge](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
}
