package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q33 interval-union COVERAGE sweep — live
  * per-user active time with overlaps counted once (billing meters,
  * uptime, session activity), each emitted row bit-equal to
  * [[graft.operators.Windows.intervalCoverage]] run over the key's
  * prefix of events at or below the row's anchor.
  *
  * Mechanics: each event opens [ts, ts+dur); events the watermark has
  * CLOSED merge into the key's disjoint open-interval list; an
  * interval whose end the watermark has passed can never gain overlap
  * (new events arrive at or above the watermark), so it folds into a
  * running covered sum and leaves state — state is O(pending +
  * unfoldable intervals), bounded by the watermark lag and the
  * interval length, NEVER by history. Events still inside the
  * watermark stay buffered: a frame never reads an event that batch
  * arithmetic over its anchor's prefix would not.
  */
object CoverageStream {

  /** One keyed event (reuses the SloMonitor shape). */
  type KeyEvent = SloMonitor.KeyEvent

  /** pending: buffered event micros the watermark hasn't closed;
    * open: merged disjoint [s, e) intervals still near the watermark;
    * coveredClosed: folded covered micros; n/s0/e1: exact stats over
    * merged events; anchor: last emitted frame's anchor micros. */
  final case class CovState(pending: List[Long], open: List[(Long, Long)],
                            coveredClosed: Long, n: Long, s0: Long, e1: Long,
                            anchor: Long)

  final case class CovRow(key: String, as_of: Long, n_intervals: Long,
                          covered_micros: Long, span_micros: Long,
                          utilization: Double)

  implicit val covStEnc: Encoder[CovState] = Encoders.product[CovState]
  implicit val covEnc: Encoder[CovRow] = Encoders.product[CovRow]

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Merge one [s, e) into a sorted disjoint list (half-open:
    * back-to-back intervals fuse, the q33 rule). */
  private[streaming] def merge(ivs: List[(Long, Long)],
                               s: Long, e: Long): List[(Long, Long)] = {
    val (before, rest) = ivs.span(_._2 < s)  // strictly before, no touch
    val (overlap, after) = rest.span(_._1 <= e) // touches or overlaps
    val ms = if (overlap.isEmpty) s else s min overlap.head._1
    val me = if (overlap.isEmpty) e else e max overlap.map(_._2).max
    before ::: (ms, me) :: after
  }

  /** Transition, exposed for unit tests. */
  def covUpdate(durSec: Long)(
      key: String, events: Iterator[KeyEvent],
      state: GroupState[CovState]): Iterator[CovRow] = {
    val durUs = durSec * 1000000L
    val st0 = state.getOption
      .getOrElse(CovState(Nil, Nil, 0L, 0L, Long.MaxValue, Long.MinValue,
        Long.MinValue))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // exact event micros: getTime truncates to millis, the sub-milli
    // remainder rides getNanos — batch unix_micros sees both
    val pending0 = st0.pending ++ events.map(e =>
      e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L)
    val (closing, pending) = pending0.partition(_ < wmUs)
    var open = st0.open
    var n = st0.n; var s0 = st0.s0; var e1 = st0.e1
    closing.sorted.foreach { us =>
      open = merge(open, us, us + durUs)
      n += 1L
      if (us < s0) s0 = us
      if (us + durUs > e1) e1 = us + durUs
    }
    val anchor = if (closing.nonEmpty) closing.max max st0.anchor else st0.anchor
    // fold intervals the watermark has passed: nothing arriving at or
    // above wm can extend them
    var covered = st0.coveredClosed
    val (dead, live) = open.partition(_._2 <= wmUs)
    dead.foreach { case (s, e) => covered += e - s }
    open = live
    val rows =
      if (anchor > st0.anchor) {
        val total = covered + open.map { case (s, e) => e - s }.sum
        val span = e1 - s0
        List(CovRow(key, anchor, n, total, span,
          rd6(total.toDouble / span.toDouble)))
      } else Nil
    if (pending.isEmpty && open.isEmpty && n == 0L) state.remove()
    else {
      state.update(CovState(pending, open, covered, n, s0, e1, anchor))
      // wake when the watermark can close the next pending event
      pending.minOption
        .foreach(p => state.setTimeoutTimestamp(p / 1000L + 1L))
    }
    rows.iterator
  }

  /** Streaming entry: per-key coverage frames, one per advanced
    * per-key anchor (the key's latest watermark-closed event),
    * Append-final. `events` must carry an event-time watermark on the
    * column `ts` derives from.
    */
  def coverageFrames(events: Dataset[KeyEvent],
                     durSec: Long): Dataset[CovRow] = {
    require(durSec >= 1, s"coverageFrames: durSec $durSec must be >= 1")
    import SloMonitor.{keyEvEnc, strEnc}
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CovState, CovRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        covUpdate(durSec) _)
  }
}
