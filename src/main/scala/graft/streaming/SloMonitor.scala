package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the r26/r27/r28 batch SRE frames — the last
  * three rungs of the monitoring ladder live: an on-call deployment
  * reads burn rate, seasonal deviation, and incident MTTR off the
  * stream, not a nightly batch. Each twin maintains the SAME hourly
  * histogram the batch operator aggregates and applies the SAME
  * arithmetic (exact long sums → the identical rounded IEEE
  * divisions), so every emitted frame is bit-equal to the batch
  * operator run over the stream prefix it summarizes — pinned by
  * SloMonitorSpec across micro-batch boundaries.
  *
  * Emission model (shared): a frame is anchored at the latest
  * watermark-CLOSED event hour, exactly like the batch anchor
  * `max(_hr)`; it emits when that anchor advances, tagged `as_of`
  * (Append-mode safe — one frame per anchor, never a retraction).
  * Hours still inside the watermark stay pending: a frame never
  * reads an hour that could still grow.
  *
  * State bounds: burn keeps ≤ maxWindow + pending (hour → (n, e))
  * pairs in ONE group; seasonal keeps |keys|·168 fold-in sums plus
  * |keys|·(168 + pending) recent hours in ONE group (the monitored
  * population is bounded by construction — the AlertEdges contract);
  * incidents keeps O(1) per alert key.
  */
object SloMonitor {

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------ r26 burn

  /** One raw event: timestamp + error flag. */
  final case class ErrEvent(ts: java.sql.Timestamp, isError: Boolean) {
    def hr: Long = ts.getTime / 1000L / 3600L
  }

  /** hours: hour → (events, errors); anchor: latest emitted frame's
    * anchor hour (Long.MinValue before the first frame). */
  final case class BurnState(hours: Map[Long, (Long, Long)], anchor: Long)

  final case class BurnFrame(
      as_of: Long, window_hours: Int, n_total: Long, n_errors: Long,
      err_rate: Double, burn_rate: Double, page: Boolean)

  implicit val errEnc: Encoder[ErrEvent] = Encoders.product[ErrEvent]
  implicit val burnStEnc: Encoder[BurnState] = Encoders.product[BurnState]
  implicit val burnEnc: Encoder[BurnFrame] = Encoders.product[BurnFrame]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Transition, exposed for unit tests. */
  def burnUpdate(slo: Double, windowsHours: Seq[Int], pageAt: Double)(
      key: String, events: Iterator[ErrEvent],
      state: GroupState[BurnState]): Iterator[BurnFrame] = {
    val maxW = windowsHours.max
    val budget = 1.0 - slo
    val st0 = state.getOption.getOrElse(BurnState(Map.empty, Long.MinValue))
    val hours = events.foldLeft(st0.hours) { (m, e) =>
      val (n, er) = m.getOrElse(e.hr, (0L, 0L))
      m.updated(e.hr, (n + 1L, er + (if (e.isError) 1L else 0L)))
    }
    val wmHr = state.getCurrentWatermarkMs() / 1000L / 3600L
    val closed = hours.keys.filter(_ < wmHr)
    val anchor = if (closed.nonEmpty) closed.max max st0.anchor else st0.anchor
    val frames =
      if (anchor > st0.anchor) windowsHours.sorted.map { w =>
        // the batch filter verbatim: _hr > anchor - w (and closed)
        val in = hours.view.filter { case (h, _) => h > anchor - w && h <= anchor }
        val nT = in.map(_._2._1).sum
        val nE = in.map(_._2._2).sum
        val rate = nE.toDouble / nT.toDouble
        val burn = rd6(rate / budget)
        BurnFrame(anchor * 3600L, w, nT, nE, rd6(rate), burn, burn >= pageAt)
      } else Nil
    // hours at or below every future anchor's deepest window evict;
    // future anchors are >= wmHr, so wmHr - maxW is the safe floor
    val kept = hours.filter { case (h, _) => h > (anchor max (wmHr - 1)) - maxW }
    if (kept.isEmpty) state.remove()
    else {
      state.update(BurnState(kept, anchor))
      val pending = kept.keys.filter(_ >= wmHr)
      val wakeHr = pending.minOption.map(_ + 1)
        .getOrElse(kept.keys.max + maxW + 1)
      state.setTimeoutTimestamp(wakeHr * 3600L * 1000L)
    }
    frames.iterator
  }

  /** Streaming entry: `events` must carry an event-time watermark on
    * the column `ts` derives from. Emits one multiwindow frame per
    * advanced anchor hour — each frame bit-equal to
    * [[graft.operators.Windows.burnRate]] over the prefix of events
    * in hours ≤ as_of/3600.
    */
  def burnFrames(events: Dataset[ErrEvent], slo: Double = 0.995,
                 windowsHours: Seq[Int] = Seq(1, 6, 24, 72),
                 pageAt: Double = 14.4): Dataset[BurnFrame] = {
    require(slo > 0 && slo < 1, s"burnFrames: slo $slo must be in (0,1)")
    require(windowsHours.nonEmpty && windowsHours.forall(_ > 0),
      s"burnFrames: bad windows $windowsHours")
    events
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[BurnState, BurnFrame](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        burnUpdate(slo, windowsHours, pageAt) _)
  }

  // ----------------------------------------------------- r31 budget status

  /** hours: trailing-period histogram hour → (events, errors); h0:
    * first event hour ever seen (the batch op's corpus `min(_hr)` —
    * a Long, kept after its hour evicts); anchor: latest emitted
    * frame's anchor. */
  final case class BudgetState(hours: Map[Long, (Long, Long)], h0: Long,
                               anchor: Long)

  final case class BudgetFrame(
      as_of: Long, period_hours: Long, elapsed_hours: Long, n_total: Long,
      n_errors: Long, err_rate: Double, budget_used_frac: Double,
      recent_burn: Double, hours_to_exhaustion: Option[Double],
      exhausted: Boolean)

  implicit val budgetStEnc: Encoder[BudgetState] = Encoders.product[BudgetState]
  implicit val budgetEnc: Encoder[BudgetFrame] = Encoders.product[BudgetFrame]

  /** Transition, exposed for unit tests. The arithmetic is the batch
    * [[graft.operators.Windows.budgetStatus]] chain verbatim — the
    * same exact long sums, the same IEEE divisions in the same
    * association order — so each frame is bit-equal to the batch row
    * over the frame's prefix. */
  def budgetUpdate(slo: Double, periodHours: Int, recentHours: Int)(
      key: String, events: Iterator[ErrEvent],
      state: GroupState[BudgetState]): Iterator[BudgetFrame] = {
    val budget = 1.0 - slo
    val st0 = state.getOption
      .getOrElse(BudgetState(Map.empty, Long.MaxValue, Long.MinValue))
    var h0 = st0.h0
    val hours = events.foldLeft(st0.hours) { (m, e) =>
      val h = e.hr
      if (h < h0) h0 = h
      val (n, er) = m.getOrElse(h, (0L, 0L))
      m.updated(h, (n + 1L, er + (if (e.isError) 1L else 0L)))
    }
    val wmHr = state.getCurrentWatermarkMs() / 1000L / 3600L
    val closed = hours.keys.filter(_ < wmHr)
    val anchor = if (closed.nonEmpty) closed.max max st0.anchor else st0.anchor
    val frames =
      if (anchor > st0.anchor) {
        // the batch filter verbatim: _hr > anchor - period (and closed)
        val in = hours.view
          .filter { case (h, _) => h > anchor - periodHours && h <= anchor }
        val nT = in.map(_._2._1).sum
        val nE = in.map(_._2._2).sum
        val rn = in.filter(_._1 > anchor - recentHours).map(_._2._1).sum
        val re = in.filter(_._1 > anchor - recentHours).map(_._2._2).sum
        val elapsed = (anchor - h0 + 1L) min periodHours.toLong
        val rate = nE.toDouble / nT.toDouble
        val used = rate / budget * elapsed.toDouble / periodHours.toDouble
        val recentBurn = re.toDouble / rn.toDouble / budget
        val proj = if (re == 0L) None
          else Some(rd6(((1.0 - used) * periodHours.toDouble / recentBurn) max 0.0))
        List(BudgetFrame(anchor * 3600L, periodHours.toLong, elapsed,
          nT, nE, rd6(rate), rd6(used), rd6(recentBurn), proj, used >= 1.0))
      } else Nil
    // hours at or below every future anchor's period window evict; h0
    // survives as a Long (the batch min is corpus-global)
    val kept = hours.filter { case (h, _) =>
      h > (anchor max (wmHr - 1)) - periodHours }
    if (kept.isEmpty && h0 == Long.MaxValue) state.remove()
    else {
      state.update(BudgetState(kept, h0, anchor))
      val pending = kept.keys.filter(_ >= wmHr)
      pending.minOption
        .foreach(p => state.setTimeoutTimestamp((p + 1) * 3600L * 1000L))
    }
    frames.iterator
  }

  /** Streaming twin of the r31 batch budget-status report: one frame
    * per advanced anchor hour, each bit-equal to
    * [[graft.operators.Windows.budgetStatus]] over the prefix of
    * events in hours ≤ as_of/3600. State is ≤ periodHours + pending
    * histogram pairs plus two longs, in ONE group.
    */
  def budgetFrames(events: Dataset[ErrEvent], slo: Double = 0.995,
                   periodHours: Int = 720,
                   recentHours: Int = 168): Dataset[BudgetFrame] = {
    require(slo > 0 && slo < 1, s"budgetFrames: slo $slo must be in (0,1)")
    require(periodHours >= 1 && recentHours >= 1 && recentHours <= periodHours,
      s"budgetFrames: bad periodHours=$periodHours recentHours=$recentHours")
    events
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[BudgetState, BudgetFrame](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        budgetUpdate(slo, periodHours, recentHours) _)
  }

  // ------------------------------------------------------------ r32 canary

  /** hours: "key hr" → count over the trailing before+after windows
    * (bounded by |keys|·(b+a) + pending — the bounded-population
    * contract); anchor: latest emitted frame's anchor. */
  final case class CanaryState(hours: Map[String, Long], anchor: Long)

  final case class CanaryRow(
      as_of: Long, key: String, n_before: Long, n_after: Long,
      rate_before: Double, rate_after: Double, rate_ratio: Option[Double],
      share_before: Double, share_after: Double, z_score: Option[Double])

  implicit val canaryStEnc: Encoder[CanaryState] = Encoders.product[CanaryState]
  implicit val canaryEnc: Encoder[CanaryRow] = Encoders.product[CanaryRow]

  /** Transition, exposed for unit tests. The batch
    * [[graft.operators.Windows.canaryCompare]] arithmetic verbatim —
    * exact long window sums, the same IEEE division order — so each
    * per-key row is bit-equal to the batch row over the frame's
    * prefix. */
  def canaryUpdate(beforeHours: Int, afterHours: Int)(
      key: String, events: Iterator[KeyEvent],
      state: GroupState[CanaryState]): Iterator[CanaryRow] = {
    val st0 = state.getOption.getOrElse(CanaryState(Map.empty, Long.MinValue))
    val hours = events.foldLeft(st0.hours) { (m, e) =>
      val k = e.key + Sep + e.hr
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    }
    def hrOf(k: String): Long = k.substring(k.lastIndexOf(Sep) + 1).toLong
    def keyOf(k: String): String = k.substring(0, k.lastIndexOf(Sep))
    val wmHr = state.getCurrentWatermarkMs() / 1000L / 3600L
    val closed = hours.keys.map(hrOf).filter(_ < wmHr)
    val anchor = if (closed.nonEmpty) closed.max max st0.anchor else st0.anchor
    val rows =
      if (anchor > st0.anchor) {
        // the batch filter verbatim: hr > anchor - (b+a), closed only
        val in = hours.toSeq.filter { case (k, _) =>
          val h = hrOf(k)
          h > anchor - (beforeHours + afterHours) && h <= anchor
        }
        val byKey = in.groupMapReduce(kv => keyOf(kv._1))(kv =>
          if (hrOf(kv._1) > anchor - afterHours) (0L, kv._2) else (kv._2, 0L)
        )((x, y) => (x._1 + y._1, x._2 + y._2))
        val tb = byKey.values.map(_._1).sum
        val ta = byKey.values.map(_._2).sum
        byKey.toSeq.sortBy(_._1).map { case (k, (nb, na)) =>
          val pb = nb.toDouble / tb.toDouble
          val pa = na.toDouble / ta.toDouble
          val pooled = (nb + na).toDouble / (tb + ta).toDouble
          val ratio = if (nb == 0L) None
            else Some(rd6((na.toDouble / afterHours.toDouble) /
              (nb.toDouble / beforeHours.toDouble)))
          val z = if (tb == 0L || ta == 0L || pooled == 0.0 || pooled == 1.0) None
            else Some(rd6((pa - pb) /
              math.sqrt(pooled * (1.0 - pooled) *
                (1.0 / tb.toDouble + 1.0 / ta.toDouble))))
          CanaryRow(anchor * 3600L, k, nb, na,
            rd6(nb.toDouble / beforeHours.toDouble),
            rd6(na.toDouble / afterHours.toDouble), ratio, rd6(pb), rd6(pa), z)
        }
      } else Nil
    val kept = hours.filter { case (k, _) =>
      hrOf(k) > (anchor max (wmHr - 1)) - (beforeHours + afterHours) }
    if (kept.isEmpty) state.remove()
    else {
      state.update(CanaryState(kept, anchor))
      kept.keys.map(hrOf).filter(_ >= wmHr).minOption
        .foreach(p => state.setTimeoutTimestamp((p + 1) * 3600L * 1000L))
    }
    rows.iterator
  }

  /** Streaming twin of the r32 batch canary comparison: one full
    * per-key frame per advanced anchor hour, each row bit-equal to
    * [[graft.operators.Windows.canaryCompare]] over the prefix of
    * events in hours ≤ as_of/3600. Single-group state ≤
    * |keys|·(before+after) + pending counts.
    */
  def canaryFrames(events: Dataset[KeyEvent], beforeHours: Int,
                   afterHours: Int): Dataset[CanaryRow] = {
    require(beforeHours >= 1 && afterHours >= 1,
      s"canaryFrames: bad beforeHours=$beforeHours afterHours=$afterHours")
    events
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[CanaryState, CanaryRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        canaryUpdate(beforeHours, afterHours) _)
  }

  // -------------------------------------------------------- r27 seasonal

  /** One keyed event (the Anomaly.Event shape). */
  final case class KeyEvent(key: String, ts: java.sql.Timestamp) {
    def hr: Long = ts.getTime / 1000L / 3600L
  }

  /** h0: first event hour ever seen; anchor: latest emitted frame's
    * anchor; hist: "key\u0000how" → historical count (hours already
    * folded below the last-week boundary — permanent, ≤ |keys|·168
    * entries); recent: "key\u0000hr" → count for hours at or above
    * the boundary (incl. pending).
    *
    * State-key schema v2 (separator " " -> NUL): a checkpoint written
    * by the earlier space-separated version cannot be resumed --
    * restart such a query with a fresh checkpoint directory (the same
    * contract as [[graft.operators.Dedup.streamingNearDupCandidates]]
    * state schema v2). Old-format keys are detected loudly on first
    * read rather than mis-parsed.
    */
  final case class SeasonState(h0: Long, anchor: Long,
                               hist: Map[String, Long], recent: Map[String, Long])

  final case class SeasonRow(
      as_of: Long, key: String, how: Long, n_hist: Long, slots_hist: Long,
      baseline_mean: Option[Double], n_last: Long, ratio: Option[Double])

  implicit val keyEvEnc: Encoder[KeyEvent] = Encoders.product[KeyEvent]
  implicit val seasonStEnc: Encoder[SeasonState] = Encoders.product[SeasonState]
  implicit val seasonEnc: Encoder[SeasonRow] = Encoders.product[SeasonRow]

  private val Sep = "\u0000"
  private def pm(a: Long, m: Long): Long = ((a % m) + m) % m

  /** Transition, exposed for unit tests. */
  def seasonUpdate(key: String, events: Iterator[KeyEvent],
                   state: GroupState[SeasonState]): Iterator[SeasonRow] = {
    val st0 = state.getOption
      .getOrElse(SeasonState(Long.MaxValue, Long.MinValue, Map.empty, Map.empty))
    var h0 = st0.h0
    val recent0 = events.foldLeft(st0.recent) { (m, e) =>
      val h = e.hr
      if (h < h0) h0 = h
      val k = e.key + Sep + h
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    }
    val wmHr = state.getCurrentWatermarkMs() / 1000L / 3600L
    def sepAt(k: String): Int = {
      val i = k.lastIndexOf(Sep)
      require(i >= 0,
        s"seasonal-monitor state key '$k' predates the v2 NUL-separated " +
          "key schema; resume is not supported — restart the query with " +
          "a fresh checkpoint directory")
      i
    }
    def hrOf(k: String): Long = k.substring(sepAt(k) + 1).toLong
    def keyOf(k: String): String = k.substring(0, sepAt(k))
    val closed = recent0.keys.map(hrOf).filter(_ < wmHr)
    val anchor = if (closed.nonEmpty) closed.max max st0.anchor else st0.anchor
    var hist = st0.hist
    var recent = recent0
    val rows =
      if (anchor > st0.anchor) {
        // the batch boundary verbatim: hb clamps to h0 so a sub-week
        // corpus has an EMPTY history window, never a negative one
        val hb = h0 max (anchor - 167L)
        // fold hours now strictly below the boundary into history
        recent0.foreach { case (k, c) =>
          val h = hrOf(k)
          if (h < hb) {
            val hk = keyOf(k) + Sep + pm(h, 168L)
            hist = hist.updated(hk, hist.getOrElse(hk, 0L) + c)
            recent = recent.removed(k)
          }
        }
        val last = recent.toSeq
          .filter { case (k, _) => val h = hrOf(k); h >= hb && h <= anchor }
          .groupMapReduce { case (k, _) => keyOf(k) + Sep + pm(hrOf(k), 168L) }(_._2)(_ + _)
        val weeks = (hb - h0) / 168L
        val rem = pm(hb - h0, 168L)
        (hist.keySet ++ last.keySet).toSeq.sorted.map { hk =>
          val k = keyOf(hk); val how = hrOf(hk)
          val nHist = hist.getOrElse(hk, 0L)
          val nLast = last.getOrElse(hk, 0L)
          val slots = weeks +
            (if (pm(how - pm(h0, 168L) + 168L, 168L) < rem) 1L else 0L)
          val base = if (slots > 0L) Some(rd6(nHist.toDouble / slots.toDouble))
                     else None
          val ratio = base.map(b => rd6((nLast.toDouble + 1.0) / (b + 1.0)))
          SeasonRow(anchor * 3600L, k, how, nHist, slots, base, nLast, ratio)
        }
      } else Nil
    if (h0 == Long.MaxValue && recent.isEmpty && hist.isEmpty) state.remove()
    else {
      state.update(SeasonState(h0, anchor, hist, recent))
      // flush pending closed-hour frames even with no further events;
      // history is permanent (the bounded-population contract), so no
      // self-destruct wake — idle state is |keys|*168 longs, not events
      recent.keys.map(hrOf).filter(_ >= wmHr).minOption
        .foreach(p => state.setTimeoutTimestamp((p + 1) * 3600L * 1000L))
    }
    rows.iterator
  }

  /** Streaming entry: one full (key, hour-of-week) seasonal frame per
    * advanced anchor hour, each bit-equal to
    * [[graft.operators.Windows.seasonalBaseline]] over the prefix of
    * events in hours ≤ as_of/3600.
    */
  def seasonalFrames(events: Dataset[KeyEvent]): Dataset[SeasonRow] =
    events
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[SeasonState, SeasonRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        seasonUpdate _)

  // ------------------------------------------------------- r28 incidents

  /** nIncidents: fires seen; openFireSec: fire hr_start of the open
    * incident (None when resolved); sumDur/nClosed: exact closed
    * duration sums; maxDur: longest closed duration; lastEdgeSec:
    * stale-replay floor (the AlertEdges rule).
    */
  final case class IncidentState(
      nIncidents: Long, openFireSec: Option[Long], sumDur: Long,
      nClosed: Long, maxDur: Option[Long], lastEdgeSec: Long)

  final case class IncidentSummary(
      key: String, as_of: Long, n_incidents: Long, n_open: Long,
      mttr_hours: Option[Double], max_hours: Option[Long])

  implicit val incStEnc: Encoder[IncidentState] = Encoders.product[IncidentState]
  implicit val incEnc: Encoder[IncidentSummary] = Encoders.product[IncidentSummary]

  /** Transition, exposed for unit tests. Consumes the r23 edge stream
    * ([[AlertEdges.edges]] output): fire opens, resolve closes and
    * banks the duration — the batch lead-pairing replayed as O(1)
    * running state. One summary row emits per processed edge,
    * tagged as_of = the edge's hr_start; the latest row per key IS
    * the batch [[graft.operators.Windows.incidents]] row over the
    * same edges.
    */
  def incidentUpdate(key: String, edges: Iterator[AlertEdges.Edge],
                     state: GroupState[IncidentState]): Iterator[IncidentSummary] = {
    var st = state.getOption
      .getOrElse(IncidentState(0L, None, 0L, 0L, None, Long.MinValue))
    val out = List.newBuilder[IncidentSummary]
    edges.toSeq.sortBy(_.hrStart).foreach { e =>
      if (e.hrStart > st.lastEdgeSec) {
        st = e.edge match {
          case "fire" if st.openFireSec.isEmpty =>
            st.copy(nIncidents = st.nIncidents + 1L,
              openFireSec = Some(e.hrStart), lastEdgeSec = e.hrStart)
          case "resolve" if st.openFireSec.isDefined =>
            val dur = (e.hrStart - st.openFireSec.get) / 3600L
            st.copy(openFireSec = None, sumDur = st.sumDur + dur,
              nClosed = st.nClosed + 1L,
              maxDur = Some(st.maxDur.fold(dur)(_ max dur)),
              lastEdgeSec = e.hrStart)
          // a fire while open / resolve while closed cannot come out
          // of the alternating edge stream; ignore rather than corrupt
          case _ => st.copy(lastEdgeSec = e.hrStart)
        }
        if (st.nIncidents > 0L)
          out += IncidentSummary(key, e.hrStart, st.nIncidents,
            if (st.openFireSec.isDefined) 1L else 0L,
            if (st.nClosed > 0L) Some(rd6(st.sumDur.toDouble / st.nClosed.toDouble))
            else None,
            // batch max_hours is max over CLOSED durations; an open
            // incident contributes null there and nothing here
            st.maxDur)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming entry over the live edge stream. State is O(1) per
    * alert key with no timeout (the AlertEdges bounded-population
    * contract). */
  def incidents(edges: Dataset[AlertEdges.Edge]): Dataset[IncidentSummary] =
    edges
      .groupByKey(_.key)
      .flatMapGroupsWithState[IncidentState, IncidentSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(incidentUpdate _)

  // ---------------------------------------------------------- r29 storms

  /** One fire edge with the watermarked event time (the column must
    * reach the stateful operator for event-time timeout to engage). */
  final case class FireEdge(key: String, ts: java.sql.Timestamp) {
    def sec: Long = ts.getTime / 1000L
  }

  /** The open storm: start/last fire (seconds), fire count, distinct
    * keys so far. Bounded by the storm's own key population. */
  final case class StormAgg(start: Long, last: Long, n: Long, keys: Seq[String])

  final case class StormRow(
      storm_start: Long, storm_end: Long, n_fires: Long, n_keys: Long,
      span_hours: Long, keys: String)

  implicit val fireEnc: Encoder[FireEdge] = Encoders.product[FireEdge]
  implicit val stormStEnc: Encoder[StormAgg] = Encoders.product[StormAgg]
  implicit val stormEnc: Encoder[StormRow] = Encoders.product[StormRow]

  /** Transition, exposed for unit tests. Fires arrive globally
    * hour-monotone ACROSS batches (an hour's edges emit when the
    * upstream watermark passes it, and the watermark is global), so
    * one sorted fold per batch replays the batch op's (hr, key)
    * order. A storm closes either when a later fire trails it by
    * more than the gap, or when the watermark passes last + gap —
    * the emitted row is final (Append-safe). */
  def stormUpdate(gapHours: Int)(
      key: String, fires: Iterator[FireEdge],
      state: GroupState[StormAgg]): Iterator[StormRow] = {
    val gapSec = gapHours * 3600L
    var open = state.getOption
    val out = List.newBuilder[StormRow]
    def closed(a: StormAgg): StormRow = {
      val ks = a.keys.sorted
      StormRow(a.start, a.last, a.n, ks.length.toLong,
        (a.last - a.start) / 3600L, ks.mkString(","))
    }
    fires.toSeq.sortBy(f => (f.sec, f.key)).foreach { f =>
      open = open match {
        case Some(a) if f.sec - a.last > gapSec =>
          out += closed(a)
          Some(StormAgg(f.sec, f.sec, 1L, Seq(f.key)))
        case Some(a) =>
          Some(StormAgg(a.start, a.last max f.sec, a.n + 1L,
            if (a.keys.contains(f.key)) a.keys else a.keys :+ f.key))
        case None => Some(StormAgg(f.sec, f.sec, 1L, Seq(f.key)))
      }
    }
    val wmSec = state.getCurrentWatermarkMs() / 1000L
    open match {
      case Some(a) if wmSec > a.last + gapSec =>
        out += closed(a)
        if (state.exists) state.remove() else ()
      case Some(a) =>
        state.update(a)
        // wake when the watermark can close this storm
        state.setTimeoutTimestamp((a.last + gapSec) * 1000L + 1000L)
      case None => if (state.exists) state.remove()
    }
    out.result().iterator
  }

  // ----------------------------------------------------------- r30 cusum

  /** h0: first event hour (final once the watermark passes it — later
    * arrivals below the watermark are dropped upstream); base: present
    * warmup hours (hour → count, ≤ warmupHours entries, permanent);
    * pending: hours the watermark hasn't closed; p/pminClamped: the
    * closed-form chart state (prefix sum and min(0, min P_j), exact
    * micros) over scored closed hours processed in hour order.
    */
  final case class CusumState(h0: Long, base: Map[Long, Long],
                              pending: Map[Long, Long],
                              p: Long, pminClamped: Long)

  final case class CusumRow(key: String, hr_start: Long, n_events: Long,
                            baseline_micros: Long, cusum_micros: Long,
                            is_change: Boolean)

  implicit val cusumStEnc: Encoder[CusumState] = Encoders.product[CusumState]
  implicit val cusumEnc: Encoder[CusumRow] = Encoders.product[CusumRow]

  /** Transition, exposed for unit tests. Hours close in ascending
    * order as the watermark advances; each closed hour either folds
    * into the warmup window (hr < h0 + warmup, all such hours are
    * closed before any scored hour closes) or scores one chart row.
    * The recursion state is O(1): S_t = P_t − min(0, min_j P_j) needs
    * only the running prefix sum and clamped running min — the same
    * closed form the batch operator's windows compute.
    */
  def cusumUpdate(warmupHours: Int, slackDen: Int, hFactor: Int)(
      key: String, events: Iterator[KeyEvent],
      state: GroupState[CusumState]): Iterator[CusumRow] = {
    val st0 = state.getOption
      .getOrElse(CusumState(Long.MaxValue, Map.empty, Map.empty, 0L, 0L))
    var h0 = st0.h0
    val pending0 = events.foldLeft(st0.pending) { (m, e) =>
      val h = e.hr
      if (h < h0) h0 = h
      m.updated(h, m.getOrElse(h, 0L) + 1L)
    }
    val wmHr = state.getCurrentWatermarkMs() / 1000L / 3600L
    var base = st0.base
    var p = st0.p
    var pmin = st0.pminClamped
    val out = List.newBuilder[CusumRow]
    val (closing, pending) = pending0.partition(_._1 < wmHr)
    closing.toSeq.sortBy(_._1).foreach { case (h, c) =>
      if (h < h0 + warmupHours) base = base.updated(h, c)
      else {
        // every warmup hour is < h and closed: the baseline is final
        val bm = base.values.sum * 1000000L / base.size
        val dev = c * 1000000L - (bm + bm / slackDen)
        p += dev
        pmin = pmin min p
        val s = p - pmin
        out += CusumRow(key, h * 3600L, c, bm, s, s > bm * hFactor)
      }
    }
    if (h0 == Long.MaxValue && pending.isEmpty) state.remove()
    else {
      state.update(CusumState(h0, base, pending, p, pmin))
      // flush pending closed hours even if the key goes quiet
      pending.keys.minOption
        .foreach(h => state.setTimeoutTimestamp((h + 1) * 3600L * 1000L))
    }
    out.result().iterator
  }

  /** Streaming twin of the r30 batch CUSUM chart: emits one final row
    * per scored closed hour per key, each bit-equal to the
    * [[graft.operators.Windows.cusumChangepoint]] row over the prefix
    * of events in hours ≤ that row's hour (integer-micro arithmetic
    * shared verbatim). State is ≤ warmupHours + pending hour counts
    * plus two longs per key.
    */
  def cusumFrames(events: Dataset[KeyEvent], warmupHours: Int = 24,
                  slackDen: Int = 4, hFactor: Int = 5): Dataset[CusumRow] = {
    require(warmupHours >= 1, s"cusumFrames: warmupHours $warmupHours must be >= 1")
    require(slackDen >= 1 && hFactor >= 1,
      s"cusumFrames: slackDen $slackDen / hFactor $hFactor must be >= 1")
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        cusumUpdate(warmupHours, slackDen, hFactor) _)
  }

  /** Streaming twin of the r29 batch storm grouping: consumes the
    * [[AlertEdges.edges]] stream (fires gate storms; resolves pass
    * through only to advance the watermark), emits one final row per
    * closed storm — each equal to the batch
    * [[graft.operators.Windows.alertStorms]] row over the same
    * fires. Single-group state = ONE open storm. */
  def storms(edges: Dataset[AlertEdges.Edge],
             gapHours: Int = 2): Dataset[StormRow] = {
    require(gapHours >= 1, s"storms: gapHours $gapHours must be >= 1")
    val spark = edges.sparkSession
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    edges.toDF()
      .withColumn("_ts", timestamp_seconds(col("hrStart")))
      .withWatermark("_ts", "0 seconds")
      .filter(col("edge") === "fire")
      .select(col("key"), col("_ts").as("ts")).as[FireEdge]
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[StormAgg, StormRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        stormUpdate(gapHours) _)
  }
}
