package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling/sliding window helpers — the reference's window stage
  * (squeryer.go:178-210) on Spark's built-in `window()` expression.
  *
  * Batch form: rows are assigned to their window(s) map-side (a
  * sliding row is replicated size/slide ways), then the aggregation
  * shuffles once on (window, keys) — the minimal shuffle for the
  * semantics. Streaming form lives in graft.streaming.TailStream with
  * watermarks bounding state.
  */
object Windows {

  /** Assign tumbling windows of `sizeSec` seconds on `ts`. Adds
    * `window_start`/`window_end` as epoch seconds (bigint) so results
    * are engine- and timezone-neutral.
    */
  def tumbling(df: DataFrame, ts: String, sizeSec: Long): DataFrame =
    df.withColumn("_w", window(col(ts), s"$sizeSec seconds"))
      .withColumn("window_start", unix_timestamp(col("_w.start")))
      .withColumn("window_end", unix_timestamp(col("_w.end")))
      .drop("_w")

  /** Assign sliding windows (size, slide). Each row lands in
    * size/slide windows.
    */
  def sliding(df: DataFrame, ts: String, sizeSec: Long, slideSec: Long): DataFrame =
    df.withColumn("_w", window(col(ts), s"$sizeSec seconds", s"$slideSec seconds"))
      .withColumn("window_start", unix_timestamp(col("_w.start")))
      .withColumn("window_end", unix_timestamp(col("_w.end")))
      .drop("_w")

  /** Windowed aggregation in one call: tumbling when slide == size. */
  def aggregate(df: DataFrame, ts: String, sizeSec: Long, slideSec: Long,
                keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val windowed =
      if (slideSec == sizeSec) tumbling(df, ts, sizeSec)
      else sliding(df, ts, sizeSec, slideSec)
    windowed
      .groupBy((Seq("window_start", "window_end") ++ keys).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling z-score anomaly detection — the statistical upgrade of
    * the fixed-threshold rate alert (r14): bucket events into
    * per-(key, hour) counts, compare each hour's count against the
    * mean and population-stddev of the TRAILING `trailingHours` hours
    * (a RANGE frame on the hour index: silent hours simply don't
    * appear, they are not zero-filled), and flag hours whose z-score
    * crosses `zThreshold`. Hours with fewer than `minHistory` trailing
    * observations emit no score (cold start — no evidence, no alert).
    *
    * Shape at scale: the raw event stream collapses to (key, hour)
    * counts in one aggregation (map-side partials do the heavy
    * lifting); the rolling window runs over the HOURLY frame — 8760
    * rows per key-year, not the event stream — partitioned by key.
    * The sum of squares accumulates in DECIMAL: hourly counts of 10⁹
    * square to 10¹⁸ and a long sum overflows within a day at 100 TB
    * rates; decimal keeps the arithmetic exact on both engines.
    * Variance uses the E[X²] − mean² form on those exact sums, so
    * mean/z are identical IEEE64 on both sides.
    * Output: (key, hr_start, n_events, mean_trailing, z_score,
    * is_anomaly) for every scored hour.
    */
  /** INCIDENTS + MTTR from the alert-edge stream — the SRE summary
    * the r23 fire/resolve edges exist to feed: each fire pairs with
    * its key's NEXT resolve (edges alternate by construction, so one
    * lead over the tiny edge frame is the pairing), closed incidents
    * get a duration, a trailing fire with no resolve is an OPEN
    * incident (surfaced, not guessed closed), and the per-key
    * summary reports incident count, open count, MTTR (mean hours to
    * resolve over CLOSED incidents — null when nothing closed), and
    * the longest incident.
    *
    * Shape at scale: everything downstream of [[rateAnomaly]] runs
    * on the scored-hours frame (hour grain, never the event stream);
    * the edge filter + lead + summary touch only edge rows.
    * Output: (key, n_incidents, n_open, mttr_hours, max_hours).
    */
  def incidents(df: DataFrame, ts: String, keyCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byKey = W.partitionBy(col("key")).orderBy(col("hr_start"))
    val edges = rateAnomaly(df, ts, keyCol)
      .withColumn("_prev", lag(col("is_anomaly"), 1).over(byKey))
      .filter(col("is_anomaly") =!= coalesce(col("_prev"), lit(false)))
      .select(col("key"), col("hr_start"), col("is_anomaly"))
    val fires = edges
      .withColumn("_next", lead(col("hr_start"), 1).over(byKey))
      .filter(col("is_anomaly"))
      .withColumn("dur_hours",
        ((col("_next") - col("hr_start")) / lit(3600L)).cast("long"))
    fires.groupBy(col("key"))
      .agg(count(lit(1)).cast("long").as("n_incidents"),
        sum(when(col("_next").isNull, 1L).otherwise(0L)).cast("long").as("n_open"),
        round(avg(col("dur_hours").cast("double")), 6).as("mttr_hours"),
        max(col("dur_hours")).as("max_hours"))
  }

  /** ALERT-STORM correlation — the incident-grouping rung above r23's
    * per-key edges (the Alertmanager `group_by`/PagerDuty incident-
    * merge behavior): one root cause pages 50 services inside a few
    * hours, and the on-call wants ONE storm row, not 50 incident
    * rows. A storm is a maximal run of FIRE edges (any key) where
    * consecutive fires are at most `gapHours` apart; the summary
    * reports its span, fire count, distinct keys, and the sorted key
    * list — n_keys >> 1 inside a tight span is the shared-root-cause
    * signal.
    *
    * Shape at scale: everything upstream is the r16→r23 hour-grain
    * machinery; the storm grouping itself runs over the EDGE frame —
    * state-change rows only, orders of magnitude below even the
    * hourly frame — so the one global-order window here scans alert
    * edges, never events or hours (the same tiny-frame contract as
    * [[incidents]]' lead).
    * Output: (storm_start, storm_end, n_fires, n_keys, span_hours,
    * keys), one row per storm.
    */
  def alertStorms(df: DataFrame, ts: String, keyCol: String,
                  gapHours: Int = 2): DataFrame = {
    require(gapHours >= 1, s"alertStorms: gapHours $gapHours must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val byKey = W.partitionBy(col("key")).orderBy(col("hr_start"))
    val fires = rateAnomaly(df, ts, keyCol)
      .withColumn("_prev", lag(col("is_anomaly"), 1).over(byKey))
      .filter(col("is_anomaly") =!= coalesce(col("_prev"), lit(false)))
      .filter(col("is_anomaly"))
      .select(col("key"), col("hr_start"))
    // global order over the edge frame (tiny by contract): a fire
    // starts a new storm iff it trails the previous fire by > gap
    val ord = W.orderBy(col("hr_start"), col("key"))
    val sid = sum(
        when(col("hr_start") - lag(col("hr_start"), 1).over(ord)
          > lit(gapHours * 3600L), 1L)
          .when(lag(col("hr_start"), 1).over(ord).isNull, 1L)
          .otherwise(0L))
      .over(ord.rowsBetween(W.unboundedPreceding, W.currentRow))
    fires.withColumn("_sid", sid)
      .groupBy(col("_sid"))
      .agg(min(col("hr_start")).as("storm_start"),
        max(col("hr_start")).as("storm_end"),
        count(lit(1)).as("n_fires"),
        countDistinct(col("key")).as("n_keys"),
        ((max(col("hr_start")) - min(col("hr_start"))) / lit(3600L))
          .cast("long").as("span_hours"),
        array_join(array_sort(collect_set(col("key"))), ",").as("keys"))
      .drop("_sid")
  }

  /** Multi-window error-budget BURN RATE (the Google SRE workbook's
    * multiwindow multi-burn-rate alert, the shape production SLO
    * paging actually uses): for each trailing window ending at the
    * stream's last hour, the error rate as a multiple of the SLO's
    * error budget — burn 1.0 spends the budget exactly at period
    * end, the canonical fast-page threshold is 14.4 (2% of a 30-day
    * budget in one hour). Short windows catch fast burns, long
    * windows keep slow leaks from hiding between spikes; paging on
    * BOTH (a short and a long window over threshold) is the
    * workbook's flap guard, and this frame is exactly the input that
    * rule reads.
    *
    * Shape at scale: ONE shuffle collapses the corpus to the hourly
    * (total, error) histogram; the trailing-window sums aggregate
    * the ≤|hours| histogram against the broadcast window list, and
    * the last-hour anchor is one (max) aggregate — the corpus never
    * windows. Rates are IEEE divisions of exact longs, rounded 6.
    * Output: (window_hours, n_total, n_errors, err_rate, burn_rate,
    * page) per requested window.
    */
  def burnRate(df: DataFrame, ts: String, isError: Column,
               slo: Double, windowsHours: Seq[Int],
               pageAt: Double = 14.4): DataFrame = {
    require(slo > 0 && slo < 1, s"burnRate: slo $slo must be in (0,1)")
    require(windowsHours.nonEmpty && windowsHours.forall(_ > 0),
      s"burnRate: bad windows $windowsHours")
    val spark = df.sparkSession
    import spark.implicits._
    val budget = 1.0 - slo
    // persisted: the histogram feeds BOTH the anchor aggregate and
    // the window sums — unpersisted, the corpus pass would run twice
    val hourly = df
      .groupBy((unix_micros(col(ts)) / lit(3600000000L)).cast("long").as("_hr"))
      .agg(count(lit(1)).as("_n"),
        sum(when(isError, 1L).otherwise(0L)).as("_e"))
      .persist()
    val anchor = hourly.agg(max(col("_hr")).as("_mx"))
    val wins = windowsHours.toDF("window_hours")
    Caching.sealOver(
      hourly.crossJoin(broadcast(anchor)).crossJoin(broadcast(wins))
        .filter(col("_hr") > col("_mx") - col("window_hours"))
        .groupBy(col("window_hours"))
        .agg(sum(col("_n")).as("n_total"), sum(col("_e")).as("n_errors"))
        .withColumn("err_rate", round(
          col("n_errors").cast("double") / col("n_total").cast("double"), 6))
        .withColumn("burn_rate", round(
          (col("n_errors").cast("double") / col("n_total").cast("double"))
            / lit(budget), 6))
        .withColumn("page", col("burn_rate") >= lit(pageAt)),
      hourly)
  }

  /** SCD TYPE-2 dimension build from a change stream (the warehouse
    * versioning pattern): per key, consecutive duplicate states
    * collapse via lag, each surviving change opens a half-open
    * [effective_from, effective_to) version by lead, the last version
    * open-ended (null) and flagged current, versions numbered from 1.
    * `ts` must already be exact epoch micros; `tieCol` makes the
    * collapse and both windows deterministic under equal timestamps.
    * ONE key shuffle feeds all three windows.
    * Output: (key, state, effective_from, effective_to, version,
    * is_current).
    */
  def scd2(df: DataFrame, keyCol: String, stateCol: String,
           usCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(usCol), col(tieCol))
    df.select(col(keyCol).as("key"), col(stateCol).as("state"),
        col(usCol).as("_us"), col(tieCol).as("_tie"))
      .withColumn("_prev", lag(col("state"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("_us"), col("_tie"))))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .withColumn("effective_from", col("_us"))
      .withColumn("effective_to", lead(col("_us"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("_us"), col("_tie"))))
      .withColumn("version", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("_us"), col("_tie")))
        .cast("long"))
      .select(col("key"), col("state"), col("effective_from"),
        col("effective_to"), col("version"),
        col("effective_to").isNull.as("is_current"))
  }

  /** CANARY / before-after DEPLOY comparison (the release-validation
    * question: did the traffic mix or per-type volume shift after the
    * cut point?): per key, the trailing `afterHours` window against
    * the `beforeHours` window preceding it — exact counts, events/hour
    * rates, the rate ratio (null when the before window is empty — no
    * evidence, no ratio), each window's traffic SHARE, and the
    * two-proportion z-score on the share shift (the canary-analysis
    * statistic: pooled p, z = (pa − pb) / √(p(1−p)(1/Nb + 1/Na)),
    * null when the pooled share is degenerate 0/1 or a window is
    * empty). |z| ≳ 3 on real volumes = the mix moved.
    *
    * Shape at scale: ONE (key, hour) histogram shuffle off the
    * corpus; the anchor is a broadcast 1-row max; per-key window sums
    * are conditional aggregates of the ≤ |keys|·(before+after)
    * histogram; totals are a broadcast 1-row aggregate OF that tiny
    * frame. Rates are IEEE divisions of exact longs in pinned
    * association order, rounded 6 — oracle-exact.
    * Output: (key, n_before, n_after, rate_before, rate_after,
    * rate_ratio, share_before, share_after, z_score).
    */
  def canaryCompare(df: DataFrame, ts: String, key: String,
                    beforeHours: Int, afterHours: Int): DataFrame = {
    require(beforeHours >= 1 && afterHours >= 1,
      s"canaryCompare: bad beforeHours=$beforeHours afterHours=$afterHours")
    val hourly = df
      .groupBy(col(key).as("key"),
        (unix_micros(col(ts)) / lit(3600000000L)).cast("long").as("_hr"))
      .agg(count(lit(1)).as("_n"))
      .persist()
    val anchor = hourly.agg(max(col("_hr")).as("_mx"))
    val byKey = hourly.crossJoin(broadcast(anchor))
      .filter(col("_hr") > col("_mx") - (beforeHours + afterHours))
      .groupBy(col("key"))
      .agg(sum(when(col("_hr") <= col("_mx") - afterHours, col("_n"))
          .otherwise(0L)).as("n_before"),
        sum(when(col("_hr") > col("_mx") - afterHours, col("_n"))
          .otherwise(0L)).as("n_after"))
    val totals = byKey.agg(sum(col("n_before")).as("_tb"),
      sum(col("n_after")).as("_ta"))
    val nb = col("n_before").cast("double")
    val na = col("n_after").cast("double")
    val tb = col("_tb").cast("double")
    val ta = col("_ta").cast("double")
    val pb = nb / tb
    val pa = na / ta
    val pooled = (col("n_before") + col("n_after")).cast("double") /
      (col("_tb") + col("_ta")).cast("double")
    Caching.sealOver(
      byKey.crossJoin(broadcast(totals))
        .withColumn("rate_before", round(nb / lit(beforeHours.toDouble), 6))
        .withColumn("rate_after", round(na / lit(afterHours.toDouble), 6))
        .withColumn("rate_ratio",
          when(col("n_before") === 0L, lit(null).cast("double"))
            .otherwise(round((na / lit(afterHours.toDouble)) /
              (nb / lit(beforeHours.toDouble)), 6)))
        .withColumn("share_before", round(pb, 6))
        .withColumn("share_after", round(pa, 6))
        .withColumn("z_score",
          when(col("_tb") === 0L || col("_ta") === 0L ||
               pooled === 0.0 || pooled === 1.0, lit(null).cast("double"))
            .otherwise(round((pa - pb) /
              sqrt(pooled * (lit(1.0) - pooled) *
                (lit(1.0) / tb + lit(1.0) / ta)), 6)))
        .select(col("key"), col("n_before"), col("n_after"),
          col("rate_before"), col("rate_after"), col("rate_ratio"),
          col("share_before"), col("share_after"), col("z_score")),
      hourly)
  }

  /** SLO error-BUDGET STATUS report (the dashboard row above r26's
    * alert frame — the question an SRE review actually asks: "how
    * much of this period's budget is gone, and at the recent pace,
    * when does it run out?"): over the trailing `periodHours` ending
    * at the stream's last hour — elapsed calendar hours, exact
    * total/error counts, the period error rate, budget consumption
    * as average-burn × elapsed/period (the workbook's time-linear
    * budget model: burn 1.0 for the whole period spends exactly
    * 100%), the trailing-`recentHours` burn rate, and the projected
    * hours to exhaustion at that recent pace (null when the recent
    * window is error-free — no evidence, no projection; 0 when the
    * budget is already blown).
    *
    * Shape at scale: the same ONE hourly-histogram shuffle as
    * [[burnRate]]; both period and recent sums are conditional
    * aggregates of the histogram against the broadcast anchor — the
    * corpus never windows. All rates are IEEE divisions of exact
    * longs, rounded 6 — oracle-exact.
    * Output: one row (period_hours, elapsed_hours, n_total,
    * n_errors, err_rate, budget_used_frac, recent_burn,
    * hours_to_exhaustion, exhausted).
    */
  def budgetStatus(df: DataFrame, ts: String, isError: Column,
                   slo: Double, periodHours: Int = 720,
                   recentHours: Int = 168): DataFrame = {
    require(slo > 0 && slo < 1, s"budgetStatus: slo $slo must be in (0,1)")
    require(periodHours >= 1 && recentHours >= 1 && recentHours <= periodHours,
      s"budgetStatus: bad periodHours=$periodHours recentHours=$recentHours")
    val budget = 1.0 - slo
    val hourly = df
      .groupBy(expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .agg(count(lit(1)).as("_n"),
        sum(when(isError, 1L).otherwise(0L)).as("_e"))
      .persist()
    val anchor = hourly.agg(max(col("_hr")).as("_mx"), min(col("_hr")).as("_mn"))
    val joined = hourly.crossJoin(broadcast(anchor))
      .filter(col("_hr") > col("_mx") - periodHours)
    val agg = joined.groupBy(col("_mx"), col("_mn"))
      .agg(sum(col("_n")).as("n_total"), sum(col("_e")).as("n_errors"),
        sum(when(col("_hr") > col("_mx") - recentHours, col("_n"))
          .otherwise(0L)).as("_rn"),
        sum(when(col("_hr") > col("_mx") - recentHours, col("_e"))
          .otherwise(0L)).as("_re"))
    val elapsed = least(col("_mx") - col("_mn") + 1L, lit(periodHours.toLong))
    val rate = col("n_errors").cast("double") / col("n_total").cast("double")
    val used = rate / lit(budget) * elapsed.cast("double") / lit(periodHours.toDouble)
    val recentBurn = col("_re").cast("double") / col("_rn").cast("double") / lit(budget)
    Caching.sealOver(
      agg
        .withColumn("period_hours", lit(periodHours.toLong))
        .withColumn("elapsed_hours", elapsed)
        .withColumn("err_rate", round(rate, 6))
        .withColumn("budget_used_frac", round(used, 6))
        .withColumn("recent_burn", round(recentBurn, 6))
        .withColumn("hours_to_exhaustion",
          when(col("_re") === 0L, lit(null).cast("double"))
            .otherwise(round(greatest(
              (lit(1.0) - used) * lit(periodHours.toDouble) / recentBurn,
              lit(0.0)), 6)))
        .withColumn("exhausted", used >= 1.0)
        .select(col("period_hours"), col("elapsed_hours"), col("n_total"),
          col("n_errors"), col("err_rate"), col("budget_used_frac"),
          col("recent_burn"), col("hours_to_exhaustion"), col("exhausted")),
      hourly)
  }

  /** Hour-of-week SEASONAL baseline + deviation (the seasonal-naive
    * forecasting rung the r16 z-score skips: traffic has a weekly
    * shape, so "is this hour odd" must compare Tuesday-9am to
    * Tuesday-9ams, not to a flat trailing mean that pages every
    * Monday morning): per (key, hour-of-week), the historical mean
    * hourly count over every PRIOR occurrence of that slot —
    * including calendar slots with zero events, counted by exact
    * integer arithmetic, not by distinct observed hours — against
    * the LAST full week's count, as an add-1 ratio. Hour-of-week is
    * epoch-aligned (hr mod 168), timezone-free and engine-portable.
    *
    * Shape at scale: ONE shuffle to the hourly histogram; bounds are
    * one (min, max) aggregate broadcast back; history and last-week
    * sides aggregate the histogram to ≤|keys|·168 rows and full-outer
    * join — a slot absent from the last week is a DROP candidate
    * (n_last 0), absent history is no-evidence (null baseline/ratio).
    * Output: (key, how, n_hist, slots_hist, baseline_mean, n_last,
    * ratio).
    */
  def seasonalBaseline(df: DataFrame, ts: String,
                       keyCol: String): DataFrame = {
    val hr = (unix_micros(col(ts)) / lit(3600000000L)).cast("long")
    // persisted: the histogram feeds the bounds aggregate AND both
    // window sides
    val hourly = df.groupBy(col(keyCol).as("key"), hr.as("_hr"))
      .agg(count(lit(1)).as("_c")).persist()
    // hb clamps to h0: a corpus shorter than a week has an EMPTY
    // history window, not a negative one (negative div/mod would
    // fabricate a phantom slot)
    val bounds = hourly.agg(min(col("_hr")).as("_h0"), max(col("_hr")).as("_hx"))
      .select(col("_h0"), greatest(col("_h0"), col("_hx") - lit(167L)).as("_hb"))
    val withB = hourly.crossJoin(broadcast(bounds))
    val how = pmod(col("_hr"), lit(168L))
    val hist = withB.filter(col("_hr") < col("_hb"))
      .groupBy(col("key"), how.as("how"))
      .agg(sum(col("_c")).as("n_hist"))
    val last = withB.filter(col("_hr") >= col("_hb"))
      .groupBy(col("key"), how.as("how"))
      .agg(sum(col("_c")).as("n_last"))
    // calendar slots of `how` in [h0, hb): full weeks + the partial
    // remainder, exact BIGINT arithmetic shared with the oracle — a
    // slot with zero HISTORICAL events still has slots, so its
    // baseline is an honest 0.0, not a null
    val slots = expr("((_hb - _h0) div 168)") +
      when(pmod(col("how") - pmod(col("_h0"), lit(168L)) + lit(168L), lit(168L))
        < pmod(col("_hb") - col("_h0"), lit(168L)), 1L).otherwise(0L)
    val out = hist
      .join(last, Seq("key", "how"), "full_outer")
      .crossJoin(broadcast(bounds))
      .withColumn("n_hist", coalesce(col("n_hist"), lit(0L)))
      .withColumn("n_last", coalesce(col("n_last"), lit(0L)))
      .withColumn("slots_hist", slots)
      .withColumn("baseline_mean", when(col("slots_hist") > 0,
        round(col("n_hist").cast("double") / col("slots_hist").cast("double"), 6)))
      .withColumn("ratio", when(col("baseline_mean").isNotNull,
        round((col("n_last").cast("double") + lit(1.0)) /
          (col("baseline_mean") + lit(1.0)), 6)))
      .select(col("key"), col("how"), col("n_hist"), col("slots_hist"),
        col("baseline_mean"), col("n_last"), col("ratio"))
    Caching.sealOver(out, hourly)
  }

  /** Interval-union COVERAGE by sweep line (the classic interval
    * algebra every session/uptime/billing pipeline eventually needs:
    * each event opens a fixed-length activity interval, overlapping
    * intervals must count ONCE — naive Σ durations double-counts, and
    * pairwise overlap joins go quadratic): per key, the union length
    * of [ts, ts + durSec) intervals, via endpoint deltas (+1 open,
    * −1 close), a per-key cumulative active count over DISTINCT
    * positions, and the sum of gaps where active > 0. Half-open
    * intervals make back-to-back [s,e)+[e,f) merge exactly (the net
    * delta at e is 0), and grouping deltas per position first makes
    * the sweep tie-free and deterministic. All positions are exact
    * epoch micros; only the final utilization ratio is IEEE.
    *
    * Shape at scale: interval expansion is row-local (2 endpoint rows
    * per event), then ONE (key, pos) aggregation with map-side
    * partials collapses ties; the sweep windows are key-partitioned
    * over the per-key endpoint frame — sequential per key as the
    * semantics demand, parallel across keys, no global order anywhere.
    * Output: (key, n_intervals, covered_micros, span_micros,
    * utilization) per key.
    */
  def intervalCoverage(df: DataFrame, ts: String, keyCol: String,
                       durSec: Long): DataFrame = {
    require(durSec >= 1, s"intervalCoverage: durSec $durSec must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val iv = df.select(col(keyCol).as("key"),
      unix_micros(col(ts)).as("_s"),
      (unix_micros(col(ts)) + durSec * 1000000L).as("_e"))
    val pts = iv.select(col("key"), explode(array(
        struct(col("_s").as("pos"), lit(1L).as("d")),
        struct(col("_e").as("pos"), lit(-1L).as("d")))).as("_p"))
      .select(col("key"), col("_p.pos").as("pos"), col("_p.d").as("d"))
      .groupBy(col("key"), col("pos")).agg(sum(col("d")).as("d"))
    val byKey = W.partitionBy(col("key")).orderBy(col("pos"))
    val covered = pts
      .withColumn("_act", sum(col("d")).over(
        byKey.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("_nxt", lead(col("pos"), 1).over(byKey))
      .groupBy(col("key"))
      .agg(sum(when(col("_act") > 0, col("_nxt") - col("pos"))
        .otherwise(0L)).as("covered_micros"))
    val spans = iv.groupBy(col("key"))
      .agg(count(lit(1)).as("n_intervals"),
        min(col("_s")).as("_s0"), max(col("_e")).as("_e1"))
    spans.join(covered, Seq("key"))
      .select(col("key"), col("n_intervals"), col("covered_micros"),
        (col("_e1") - col("_s0")).as("span_micros"),
        round(col("covered_micros").cast("double")
          / (col("_e1") - col("_s0")).cast("double"), 6).as("utilization"))
  }

  /** CUSUM changepoint detection (Page 1954's cumulative-sum chart —
    * the sustained-LEVEL-SHIFT detector that z-score and EWMA charts
    * miss: a 30% rate creep spread over days never crosses a 3-sigma
    * hourly threshold, but its deviations ACCUMULATE): per key, the
    * first `warmupHours` present hours establish a baseline mean
    * rate; each later hour adds its deviation from an allowance
    * k = baseline·(1 + 1/slackDen) to a one-sided cumulative sum
    * clamped at zero, and the chart signals when the sum crosses
    * h = baseline·hFactor. Small persistent drifts integrate up to
    * the threshold; noise around the allowance keeps resetting to 0.
    *
    * Cross-engine exactness with NO sequential recurrence: the
    * textbook recursion S_t = max(0, S_{t-1} + x_t − k) has the
    * closed form S_t = P_t − min(0, min_{j≤t} P_j) over the prefix
    * sums P_t = Σ(x_i − k) — so the whole chart is ONE cumulative
    * sum and ONE running min, both plain window functions the oracle
    * replays verbatim. Rates are exact integer micros (counts ×10⁶,
    * integer-DIV baseline) — bit-equal across engines, overflow-safe
    * to ~1.8·10¹² events/hour.
    *
    * Shape at scale: the corpus collapses to the hourly histogram in
    * ONE aggregation with map-side partials; the baseline stats and
    * the cumulative windows all run key-partitioned over that hourly
    * frame (8760 rows per key-year), never the event stream. Silent
    * hours don't appear and don't decay the sum (the r16 rule): the
    * chart integrates per ACTIVE hour.
    * Output: (key, hr_start, n_events, baseline_micros, cusum_micros,
    * is_change) for every post-warmup hour.
    */
  def cusumChangepoint(df: DataFrame, ts: String, keyCol: String,
                       warmupHours: Int = 24, slackDen: Int = 4,
                       hFactor: Int = 5): DataFrame = {
    require(warmupHours >= 1, s"cusumChangepoint: warmupHours $warmupHours must be >= 1")
    require(slackDen >= 1, s"cusumChangepoint: slackDen $slackDen must be >= 1")
    require(hFactor >= 1, s"cusumChangepoint: hFactor $hFactor must be >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
    val byKey = W.partitionBy(col("key"))
    val cum = W.partitionBy(col("key")).orderBy(col("_hr"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val scored = hourly
      .withColumn("_h0", min(col("_hr")).over(byKey))
      .withColumn("_nb", sum(when(col("_hr") < col("_h0") + warmupHours, 1L)
        .otherwise(0L)).over(byKey))
      .withColumn("_bs", sum(when(col("_hr") < col("_h0") + warmupHours, col("_c"))
        .otherwise(0L)).over(byKey))
      .filter(col("_hr") >= col("_h0") + warmupHours)
      // present warmup hours all have _c >= 1, so _bm >= 10^6 and the
      // h threshold is never zero
      .withColumn("_bm", expr("(_bs * 1000000) div _nb"))
      .withColumn("_p", sum(col("_c") * lit(1000000L)
        - (col("_bm") + expr(s"_bm div $slackDen"))).over(cum))
      .withColumn("_pmin", min(col("_p")).over(cum))
      .withColumn("_s", col("_p") - least(col("_pmin"), lit(0L)))
    scored.select(col("key"),
      (col("_hr") * 3600L).as("hr_start"),
      col("_c").cast("long").as("n_events"),
      col("_bm").as("baseline_micros"),
      col("_s").as("cusum_micros"),
      (col("_s") > col("_bm") * hFactor).as("is_change"))
  }

  def rateAnomaly(df: DataFrame, ts: String, keyCol: String,
                  trailingHours: Int = 24, minHistory: Int = 12,
                  zThreshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("key")).orderBy(col("_hr"))
      .rangeBetween(-trailingHours, -1)
    val nd = col("_tn").cast("double")
    val mean = col("_ts").cast("double") / nd
    val variance = col("_tss").cast("double") / nd - mean * mean
    hourly
      .withColumn("_tn", count(lit(1)).over(w))
      .withColumn("_ts", sum(col("_c")).over(w))
      // square IN decimal, not before the cast: a long*long square
      // overflows first at c > ~3.04e9 events/hour
      .withColumn("_tss", sum(col("_c").cast("decimal(19,0)")
        * col("_c").cast("decimal(19,0)")).over(w))
      .filter(col("_tn") >= minHistory)
      .withColumn("_mean", mean)
      // zero-variance history: any deviation from the constant rate
      // is an anomaly BY DEFINITION (z is undefined — left null — but
      // the flag must not go false: constant-10/hour then a spike is
      // the textbook alert), and matching the mean exactly scores 0
      .withColumn("_z", when(variance > 0.0,
        (col("_c").cast("double") - col("_mean")) / sqrt(variance))
        .when(col("_c").cast("double") === col("_mean"), lit(0.0)))
      .select(col("key"),
        // epoch seconds, engine- and timezone-neutral (the r14 rule)
        (col("_hr") * 3600L).as("hr_start"),
        col("_c").cast("long").as("n_events"),
        round(col("_mean"), 6).as("mean_trailing"),
        round(col("_z"), 6).as("z_score"),
        (coalesce(abs(col("_z")) >= zThreshold, lit(false)) ||
          col("_z").isNull).as("is_anomaly"))
  }

  /** SPIKE ATTRIBUTION — the on-call question right after "the total
    * rate is anomalous" (r16): WHICH segment drives it? The r16
    * z-chain runs on the GLOBAL hourly rate (one constant-key pass,
    * the chain verbatim); hours with a verdict partition into
    * anomalous vs normal, and each segment's traffic SHARE is
    * compared across the two sides — lift = share_anom/share_norm
    * (null for segments absent from normal hours — new traffic, by
    * definition suspicious), excess = its events above the
    * normal-mix expectation, and the r32 two-proportion z on the
    * share shift. High-lift/high-z segments ARE the attribution.
    *
    * Shape at scale: ONE (key, hour) histogram shuffle + ONE hourly
    * histogram for the global chain; verdicts join the per-key
    * histogram at HOUR grain (broadcast — ≤|hours| rows); per-key
    * conditional sums, totals a broadcast 1-row aggregate. All
    * divisions IEEE over exact longs in pinned order — hash-exact.
    * Output: (key, n_anom, n_norm, share_anom, share_norm, lift,
    * excess, z_score), segments present only in verdict-covered
    * hours.
    */
  def spikeAttribution(df: DataFrame, ts: String, keyCol: String,
                       trailingHours: Int = 24, minHistory: Int = 12,
                       zThreshold: Double = 3.0): DataFrame = {
    val verdicts = rateAnomaly(df.withColumn("_all", lit("all")), ts, "_all",
        trailingHours, minHistory, zThreshold)
      .select((col("hr_start") / 3600L).cast("long").as("_hr"),
        col("is_anomaly"))
    val byKey = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .join(broadcast(verdicts), Seq("_hr"))
      .groupBy(col("key"))
      .agg(sum(when(col("is_anomaly"), col("_c")).otherwise(0L)).as("n_anom"),
        sum(when(!col("is_anomaly"), col("_c")).otherwise(0L)).as("n_norm"))
    val totals = byKey.agg(sum(col("n_anom")).as("_ta"),
      sum(col("n_norm")).as("_tn"))
    val na = col("n_anom").cast("double")
    val nn = col("n_norm").cast("double")
    val ta = col("_ta").cast("double")
    val tn = col("_tn").cast("double")
    val sa = na / ta
    val sn = nn / tn
    val pooled = (col("n_anom") + col("n_norm")).cast("double") /
      (col("_ta") + col("_tn")).cast("double")
    byKey.crossJoin(broadcast(totals))
      .filter(col("_ta") > 0L)
      .withColumn("share_anom", round(sa, 6))
      .withColumn("share_norm", round(sn, 6))
      .withColumn("lift",
        when(col("n_norm") === 0L, lit(null).cast("double"))
          .otherwise(round(sa / sn, 6)))
      .withColumn("excess", round(na - ta * sn, 6))
      .withColumn("z_score",
        when(col("_tn") === 0L || pooled === 0.0 || pooled === 1.0,
          lit(null).cast("double"))
          .otherwise(round((sa - sn) /
            sqrt(pooled * (lit(1.0) - pooled) *
              (lit(1.0) / ta + lit(1.0) / tn)), 6)))
      .select(col("key"), col("n_anom"), col("n_norm"),
        col("share_anom"), col("share_norm"), col("lift"),
        col("excess"), col("z_score"))
  }

  /** Trailing EWMA rate forecast (the exponentially-weighted moving
    * average of Roberts 1959's EWMA control chart, as monitoring
    * pipelines deploy it): forecast hour t's count from the trailing
    * `trailingHours` hourly counts with weight (1/2)^(d-1) for the
    * count d hours back — recent behavior dominates, where
    * [[rateAnomaly]] weights its window uniformly — then flag hours
    * `spikeFactor`× above the forecast (spike) or below 1/spikeFactor
    * of it (drop).
    *
    * Cross-engine exactness with NO smoothing recurrence: α=1/2 makes
    * every weight an exact power of two, so forecast numerator
    * Σ c_d·2^(W−d) and denominator Σ 2^(W−d) are plain BIGINT sums
    * (max weight 2^(W−1); overflow needs ~5.5e11 events/hour at W=24
    * — documented bound, far past the r16 decimal guard's own
    * ~3e9²·24 regime) and the forecast is ONE IEEE division of the
    * same two longs in both engines — no pow(), no float accumulation
    * order, no sequential state. Missing trailing hours renormalize
    * away: the denominator sums only PRESENT hours' weights, so a gap
    * concentrates weight on the hours that exist instead of dragging
    * the forecast toward zero.
    *
    * Shape at scale: the event stream aggregates ONCE to the hourly
    * histogram (keys × hours rows — orders of magnitude below the
    * corpus, the r16 rule); the trailing window is then a self-join
    * of that histogram bounded at `trailingHours` rows per scored
    * hour. The histogram persists across its two join sides and the
    * (histogram-sized) result seals over it.
    */
  def ewmaForecast(df: DataFrame, ts: String, keyCol: String,
                   trailingHours: Int = 24, minHistory: Int = 12,
                   spikeFactor: Double = 3.0): DataFrame = {
    require(trailingHours >= 1 && trailingHours <= 62,
      s"ewmaForecast: trailingHours=$trailingHours must be in [1, 62] " +
        "(weights are 2^(trailingHours-d) longs)")
    require(minHistory >= 1 && spikeFactor > 1.0,
      s"ewmaForecast: minHistory=$minHistory must be >= 1, " +
        s"spikeFactor=$spikeFactor > 1")
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .persist()
    val b = hourly.select(col("key").as("_bkey"), col("_hr").as("_bhr"),
      col("_c").as("_bc"))
    val w = expr(
      s"shiftleft(CAST(1 AS BIGINT), CAST($trailingHours - (_hr - _bhr) AS INT))")
    val fc = col("_num").cast("double") / col("_den").cast("double")
    val out = hourly.join(b,
        col("_bkey") === col("key") &&
          col("_bhr") >= col("_hr") - trailingHours &&
          col("_bhr") <= col("_hr") - 1)
      .groupBy(col("key"), col("_hr"), col("_c"))
      .agg(sum(col("_bc") * w).as("_num"), sum(w).as("_den"),
        count(lit(1)).as("_tn"))
      .filter(col("_tn") >= minHistory)
      .select(col("key"),
        (col("_hr") * 3600L).as("hr_start"),
        col("_c").cast("long").as("n_events"),
        round(fc, 6).as("ewma_forecast"),
        (col("_c").cast("double") >= lit(spikeFactor) * fc).as("is_spike"),
        (col("_c").cast("double") <= fc / lit(spikeFactor)).as("is_drop"))
    Caching.sealOver(out, hourly)
  }

  /** FIFO LOT ALLOCATION (the inventory/cost-basis classic: match
    * each demand unit against supply lots first-in-first-out and
    * price it at the lot it consumed — COGS, tax-lot matching, queue
    * attribution). The sequential "walk both lists" algorithm
    * restates declaratively: each lot/demand row owns a UNIT INTERVAL
    * [prefix−qty, prefix) on its key's cumulative-quantity axis, and
    * FIFO matches are EXACTLY the interval overlaps — one range join
    * instead of per-key sequential state.
    *
    * Exactness: quantities and prefix sums fold as DECIMAL; overlap =
    * least(hi) − greatest(lo) is pure decimal arithmetic; and the
    * cost allocation c·ov/q is INTEGER arithmetic end to end — scaled
    * to microdollars and divided with an explicit half-up integer
    * rule ((2a+b) div 2b), because round(double, 6) is NOT
    * cross-engine-stable exactly where this operator lands most
    * often: a fully consumed lot's ov·(c/q) is its cost to the cent,
    * and the two engines round the ±1-ulp IEEE product to different
    * 6dp neighbors. Terms sum as exact integers; ONE division by 10⁶
    * at the very end.
    *
    * Shape at scale: prefix sums are per-key windows over the LOT
    * frames (rows = lots per key — the data-model-bounded grain, not
    * the corpus; a key with millions of lots needs the packSequences
    * prefix instead, by contract). The overlap join is an equi-join
    * on key + range predicate; FIFO monotonicity keeps true matches
    * at |supply|+|demand|−1 per key. Output keys appear when both
    * sides are present (the first unit always overlaps).
    *
    * Output: (keyCol, n_matches, matched_qty, unmatched_demand,
    * fifo_cogs).
    */
  def fifoAllocate(supply: DataFrame, demand: DataFrame, keyCol: String,
                   qtyCol: String, costCol: String,
                   orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "fifoAllocate: orderCols must total-order each key's lots")
    // Non-positive quantities are DROPPED, by contract (r15 ADVICE):
    // a zero-qty lot's degenerate interval [x, x) strictly inside a
    // demand interval would pass the overlap filter and divide by
    // zero in the cost term; a negative qty breaks the monotonicity
    // of the prefix axis the whole construction relies on. A zero or
    // negative lot has no FIFO meaning — it neither supplies nor
    // demands units — so the drop is semantic, not a silent skip.
    def base(df: DataFrame, cols: Column*): DataFrame =
      df.select((col(keyCol).as("_k") +: col(qtyCol).cast("decimal(18,2)")
        .as("_q") +: orderCols.map(col)) ++ cols: _*)
        .filter(col("_q") > lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("_k"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val sup = base(supply, col(costCol).cast("decimal(18,2)").as("_c"))
      .withColumn("_hi", sum(col("_q")).over(w))
      .select(col("_k"), (col("_hi") - col("_q")).as("_slo"),
        col("_hi").as("_shi"),
        (col("_c") * lit(100)).cast("long").as("_ci"),
        (col("_q") * lit(100)).cast("long").as("_qi"))
    val dem = base(demand)
      .withColumn("_hi", sum(col("_q")).over(w))
      .select(col("_k"), (col("_hi") - col("_q")).as("_dlo"),
        col("_hi").as("_dhi"))
    val m = sup.join(dem, Seq("_k"))
      .filter(col("_slo") < col("_dhi") && col("_dlo") < col("_shi"))
      .withColumn("_ov",
        least(col("_shi"), col("_dhi")) - greatest(col("_slo"), col("_dlo")))
      .withColumn("_vi", (col("_ov") * lit(100)).cast("long"))
      // microdollar term = round_half_up(ci·vi·10⁴ / qi), all BIGINT
      .withColumn("_tm",
        expr("(2 * _ci * _vi * 10000 + _qi) div (2 * _qi)"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("n_matches"),
        sum(col("_ov")).cast("double").as("matched_qty"),
        (sum(col("_tm").cast("decimal(38,0)")).cast("double")
          / lit(1000000.0)).as("fifo_cogs"))
    val totS = base(supply).groupBy(col("_k")).agg(sum(col("_q")).as("_ts"))
    val totD = base(demand).groupBy(col("_k")).agg(sum(col("_q")).as("_td"))
    m.join(totS, Seq("_k")).join(totD, Seq("_k"))
      .select(col("_k").as(keyCol), col("n_matches"), col("matched_qty"),
        greatest(col("_td") - col("_ts"),
          lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))
          .cast("double").as("unmatched_demand"),
        col("fifo_cogs"))
      .orderBy(keyCol)
  }

  /** Exact dyadic HOLT filter coefficients: with α = β = 1/2 and the
    * pinned init (l₀ = y₀, b₀ = 0), `window` recurrence steps of
    * Holt's linear-trend smoothing — lₜ = (yₜ + lₜ₋₁ + bₜ₋₁)/2,
    * bₜ = (lₜ − lₜ₋₁ + bₜ₋₁)/2 — collapse to a FINITE LINEAR FILTER
    * over the trailing `window` points whose coefficients are exact
    * dyadic rationals. Returned as integer numerators over the common
    * denominator 2^shift (shift = 2·(window−1)): (levelCoeffs,
    * trendCoeffs, shift), oldest point first. Level weights sum to
    * 2^shift (a constant series forecasts itself), trend weights to
    * 0. Shared by the operator and the oracle generator so both
    * engines fold the IDENTICAL integer literals.
    */
  def holtCoeffs(window: Int): (Array[BigInt], Array[BigInt], Int) = {
    require(window >= 2 && window <= 24,
      s"holtCoeffs: window=$window not in [2, 24] (coefficients are " +
        "2^(2·window−2)-scaled longs)")
    var s = 0
    var l = Array.fill(window)(BigInt(0)); l(0) = BigInt(1)
    var b = Array.fill(window)(BigInt(0))
    for (t <- 1 until window) {
      val yD = BigInt(1) << s
      // lₜ over 2^(s+1), then both rescale to the common 2^(s+2)
      val l1 = Array.tabulate(window)(i =>
        (if (i == t) yD else BigInt(0)) + l(i) + b(i))
      val b2 = Array.tabulate(window)(i => l1(i) - 2 * l(i) + 2 * b(i))
      l = l1.map(_ * 2); b = b2; s += 2
    }
    (l, b, s)
  }

  /** HOLT linear-trend forecast (the rung r20's EWMA misses: a
    * steadily RAMPING rate is always above a level-only forecast, so
    * r20 either false-alarms on growth or, tuned not to, misses real
    * spikes on top of it — Holt carries an explicit trend term).
    * Forecast = level + trend off the trailing `window` hourly
    * counts; hours flag when `spikeFactor`× above a positive
    * forecast (spike) or below 1/spikeFactor of it (drop).
    *
    * Cross-engine exactness with NO smoothing recurrence: the
    * recurrence is precomputed into [[holtCoeffs]]' exact dyadic
    * filter, so each scored hour is two plain integer dot products
    * (terms fit longs up to ~2^32 events/hour; sums fold as DECIMAL)
    * and ONE IEEE division by the power-of-two denominator —
    * identical bits in both engines, no pow(), no sequential state.
    *
    * An ABSENT trailing hour is a ZERO count, not missing data (this
    * is a rate series) — and a zero contributes nothing to a dot
    * product, so the join over PRESENT hours already computes the
    * zero-filled filter exactly; nothing materializes. Scoring
    * requires the key's history to span the window (hr ≥ first hr +
    * window), so the filter never reads implicit zeros from before
    * the key existed, and a scored hour needs ≥1 present trailing
    * hour (inner join; an all-zero window forecasts 0 and flags
    * nothing anyway).
    *
    * Shape at scale: the r16/r20 contract — events aggregate ONCE to
    * the (key, hour) histogram; the trailing window is a self-join of
    * that histogram bounded at `window` rows per scored hour.
    */
  def holtForecast(df: DataFrame, ts: String, keyCol: String,
                   window: Int = 16, spikeFactor: Double = 3.0): DataFrame = {
    require(spikeFactor > 1.0, s"holtForecast: spikeFactor=$spikeFactor > 1")
    val (lc, bc, s) = holtCoeffs(window)
    val den = math.pow(2.0, s)
    val fcArr = array((0 until window).map(i => lit((lc(i) + bc(i)).toLong)): _*)
    val bcArr = array(bc.map(c => lit(c.toLong)).toSeq: _*)
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .persist()
    val b = hourly.select(col("key").as("_bkey"), col("_hr").as("_bhr"),
      col("_c").as("_bc"))
    // lag d = hr − bhr ∈ [1, window] ⇒ series index window − d
    // (oldest first); element_at is 1-based
    val idx = (lit(window + 1) - (col("_hr") - col("_bhr"))).cast("int")
    val f = col("_num").cast("double") / lit(den)
    val sl = col("_bnum").cast("double") / lit(den)
    val keyStart = hourly.groupBy(col("key")).agg(min(col("_hr")).as("_h0"))
    val out = hourly.join(b,
        col("_bkey") === col("key") &&
          col("_bhr") >= col("_hr") - window &&
          col("_bhr") <= col("_hr") - 1)
      .groupBy(col("key"), col("_hr"), col("_c"))
      .agg(sum((col("_bc") * element_at(fcArr, idx)).cast("decimal(38,0)"))
          .as("_num"),
        sum((col("_bc") * element_at(bcArr, idx)).cast("decimal(38,0)"))
          .as("_bnum"))
      .join(broadcast(keyStart), Seq("key"))
      .filter(col("_hr") >= col("_h0") + window)
      .select(col("key"),
        (col("_hr") * 3600L).as("hr_start"),
        col("_c").cast("long").as("n_events"),
        round(f, 6).as("holt_forecast"),
        round(sl, 6).as("holt_slope"),
        (f > 0.0 && col("_c").cast("double") >= lit(spikeFactor) * f)
          .as("is_spike"),
        (f > 0.0 && col("_c").cast("double") <= f / lit(spikeFactor))
          .as("is_drop"))
    Caching.sealOver(out, hourly)
  }

  /** MAD / Hampel ROBUST outlier detection (the rung r16's mean-based
    * z misses: ONE massive spike inflates the trailing mean AND
    * stddev enough to hide itself and mask real anomalies — median
    * and median-absolute-deviation have a 50% breakdown point, so a
    * few extreme hours cannot move the baseline): per key, hourly
    * counts score against the key's FULL-history median; an hour
    * flags when |count − median| > k·MAD.
    *
    * Exactness: counts are integers, so the interpolated median is an
    * exact x.0/x.5 double, deviations exact halves, the MAD an exact
    * quarter — every derived double is exactly representable and the
    * k·MAD comparison is engine-neutral (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation
    * definition, the q11-proven pair).
    *
    * Shape at scale: ONE (key, hour) histogram shuffle — everything
    * downstream (two |keys|-row percentile aggregates broadcast back
    * onto the hourly frame) runs at hour grain, never the event
    * stream (the r16 contract).
    *
    * MAD = 0 (a majority-constant series) degenerates on purpose: any
    * deviation from the constant rate flags, the r16 zero-variance
    * rule.
    */
  def madOutliers(df: DataFrame, ts: String, keyCol: String,
                  k: Double = 5.0): DataFrame = {
    val (out, hourly) = madOutliersPlan(df, ts, keyCol, k)
    Caching.sealOver(out, hourly)
  }

  /** Unsealed core, exposed so PlanSpec can pin the shape (the sealed
    * result is a checkpoint scan, not inspectable post-hoc — the d33
    * precedent). The hourly histogram persists because THREE branches
    * consume it (median agg, deviation frame, output) — unsealed and
    * unpersisted, Catalyst would re-scan the event stream once per
    * branch. Returns (result, the persisted frame to seal over).
    */
  private[graft] def madOutliersPlan(df: DataFrame, ts: String,
      keyCol: String, k: Double): (DataFrame, DataFrame) = {
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .persist()
    val med = hourly.groupBy(col("key"))
      .agg(expr("percentile(_c, 0.5)").as("_med"))
    val withMed = hourly.join(broadcast(med), Seq("key"))
      .withColumn("_adev", abs(col("_c").cast("double") - col("_med")))
    val mad = withMed.groupBy(col("key"))
      .agg(expr("percentile(_adev, 0.5)").as("_mad"))
    val out = withMed.join(broadcast(mad), Seq("key"))
      .select(col("key"),
        (col("_hr") * 3600L).as("hr_start"),
        col("_c").cast("long").as("n_events"),
        round(col("_med"), 6).as("median_rate"),
        round(col("_mad"), 6).as("mad"),
        (col("_adev") > lit(k) * col("_mad")).as("is_outlier"))
    (out, hourly)
  }

  /** HAMPEL FILTER — moving-window median/MAD outliers (the LOCAL
    * robust detector beside r35's global one: a diurnal pattern makes
    * every night hour a "global outlier"; the Hampel window compares
    * each hour to its NEIGHBORHOOD): per key and hour, the median and
    * MAD of the ±`halfWindow` surrounding hours; the hour flags when
    * |count − med| > 3·1.4826·MAD (the textbook k·σ-consistent
    * threshold; 4.4478 is the folded literal, bit-shared with the
    * oracle).
    *
    * The window MAD depends on the window's own median, so no single
    * window expression can compute it — the standard two-pass shape:
    * one neighborhood self-join for the median, a second for the
    * deviations (both at HOUR grain on the persisted histogram, the
    * ewmaForecast precedent). Integer counts make med exact halves
    * and MAD exact quarters — the r35 exactness argument, locally.
    * MAD = 0 degenerates to the r16 rule: any deviation flags.
    */
  def hampel(df: DataFrame, ts: String, keyCol: String,
             halfWindow: Int = 3): DataFrame = {
    require(halfWindow >= 1 && halfWindow <= 168,
      s"hampel: halfWindow=$halfWindow hours must be in [1, 168]")
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .persist()
    val b = hourly.select(col("key").as("_bk"), col("_hr").as("_bhr"),
      col("_c").as("_bc"))
    def near(df0: DataFrame): DataFrame = df0.join(b,
      col("_bk") === col("key") &&
        col("_bhr") >= col("_hr") - halfWindow &&
        col("_bhr") <= col("_hr") + halfWindow)
    val med = near(hourly)
      .groupBy(col("key"), col("_hr"), col("_c"))
      .agg(expr("percentile(_bc, 0.5)").as("_med"))
    val out = near(med)
      .groupBy(col("key"), col("_hr"), col("_c"), col("_med"))
      .agg(expr("percentile(abs(CAST(_bc AS DOUBLE) - _med), 0.5)")
        .as("_mad"))
      .select(col("key"),
        (col("_hr") * 3600L).as("hr_start"),
        col("_c").cast("long").as("n_events"),
        round(col("_med"), 6).as("window_median"),
        round(col("_mad"), 6).as("window_mad"),
        (abs(col("_c").cast("double") - col("_med"))
          > lit(4.4478) * col("_mad")).as("is_outlier"))
    Caching.sealOver(out, hourly)
  }

  /** CHANGEPOINT LOCALIZATION — one binary-segmentation step (the
    * question right after r30's CUSUM fires: WHEN did the level
    * shift?): per key, the split hour t* maximizing the standard
    * gain G(t) = (n_l·n_r/n)·(mean_l − mean_r)² over the hourly
    * counts — the single-changepoint least-squares optimum.
    *
    * Exactness: prefix sums and counts are exact longs from one
    * cumulative window; every candidate's gain is ONE pinned IEEE
    * chain of those longs, identical in both engines, so the argmax
    * (ties broken to the EARLIEST hour) is engine-neutral without
    * any float accumulation.
    *
    * Shape at scale: ONE (key, hour) histogram shuffle; the
    * candidate scan is a per-key cumulative window + rank over the
    * HOURLY frame (the r16 rule) — the corpus never windows.
    */
  def changepoint(df: DataFrame, ts: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(col("key")).orderBy(col("_hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("key"))
    val nl = col("_i").cast("double")
    val nr = (col("_n") - col("_i")).cast("double")
    val meanL = col("_s").cast("double") / nl
    val meanR = (col("_t") - col("_s")).cast("double") / nr
    val gain = nl * nr / col("_n").cast("double") *
      ((meanL - meanR) * (meanL - meanR))
    val scored = hourly
      .withColumn("_i", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("_hr"))))
      .withColumn("_s", sum(col("_c")).over(wCum))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_t", sum(col("_c")).over(wAll))
      .filter(col("_i") < col("_n"))
      .withColumn("_gain", gain)
    scored
      .withColumn("_rk", row_number().over(Window.partitionBy(col("key"))
        .orderBy(col("_gain").desc, col("_hr"))))
      .filter(col("_rk") === 1)
      .select(col("key"),
        (col("_hr") * 3600L).as("split_after"),
        col("_i").cast("long").as("n_left"),
        (col("_n") - col("_i")).cast("long").as("n_right"),
        round(meanL, 6).as("mean_left"),
        round(meanR, 6).as("mean_right"),
        round(col("_gain"), 6).as("gain"))
  }

  /** MANN–KENDALL trend + THEIL–SEN slope (the "is the rate TRENDING,
    * not just spiking" question the r16/r35 point detectors don't
    * answer — and the robust pair to a least-squares fit, immune to
    * the spikes those detectors flag): per key over the hourly
    * counts, S = Σ_{i<j} sign(c_j − c_i) with the tie-corrected
    * normal approximation and continuity correction, plus the
    * Theil–Sen slope (median of all pairwise slopes, events/hour²).
    *
    * Exactness: S, the tie term Σt(t−1)(2t+5), and n(n−1)(2n+5) fold
    * as exact longs (overflow needs ~10⁶ scored hours — documented
    * bound); each pairwise slope is ONE IEEE division of exact longs;
    * the median is the q11 percentile pair; z is one pinned chain.
    * S = 0 scores z = 0; zero variance (all-tied, n < 2 pairs) gives
    * NULL z.
    *
    * Shape at scale: ONE (key, hour) histogram shuffle; the pair
    * self-join runs per key over the HOURLY frame — |hours|²/2 pairs
    * per key at hour grain (720 h ≈ 260k pairs), never the event
    * stream (the r16 rule). The histogram persists across its three
    * consumers (pairs ×2 sides, ties) and the |keys|-row result
    * seals over it.
    */
  def trendTest(df: DataFrame, ts: String, keyCol: String): DataFrame = {
    val (out, hourly) = trendTestPlan(df, ts, keyCol)
    Caching.sealOver(out, hourly)
  }

  /** Unsealed core for PlanSpec (the d33/r35 precedent). */
  private[graft] def trendTestPlan(df: DataFrame, ts: String,
      keyCol: String): (DataFrame, DataFrame) = {
    val hourly = df
      .select(col(keyCol).as("key"),
        expr(s"unix_timestamp(`$ts`) div 3600").as("_hr"))
      .groupBy(col("key"), col("_hr")).agg(count(lit(1)).as("_c"))
      .persist()
    val b = hourly.select(col("key").as("_bk"), col("_hr").as("_bhr"),
      col("_c").as("_bc"))
    val pairs = hourly.join(b,
        col("_bk") === col("key") && col("_bhr") > col("_hr"))
      .groupBy(col("key"))
      .agg(sum(signum(col("_bc") - col("_c")).cast("long")).as("_s"),
        count(lit(1)).as("_np"),
        expr("percentile(CAST(_bc - _c AS DOUBLE)" +
          " / CAST(_bhr - _hr AS DOUBLE), 0.5)").as("_slope"))
    val nAndTies = hourly.groupBy(col("key"), col("_c"))
      .agg(count(lit(1)).as("_t"))
      .groupBy(col("key"))
      .agg(sum(col("_t")).as("_n"),
        sum(col("_t") * (col("_t") - 1L) * (lit(2L) * col("_t") + 5L))
          .as("_tt"))
    val varS = (col("_n") * (col("_n") - 1L) * (lit(2L) * col("_n") + 5L)
      - col("_tt")).cast("double") / lit(18.0)
    val zNum = when(col("_s") > 0L, (col("_s") - 1L).cast("double"))
      .when(col("_s") < 0L, (col("_s") + 1L).cast("double"))
      .otherwise(lit(0.0))
    val out = pairs.join(nAndTies, Seq("key"))
      .select(col("key"), col("_n").cast("long").as("n_hours"),
        col("_s").as("s_stat"),
        when(varS > 0.0, round(zNum / sqrt(varS), 6)).as("z_score"),
        round(col("_slope"), 6).as("sen_slope"))
      .orderBy("key")
    (out, hourly)
  }

  /** ALERT SUPPRESSION (the alert-fatigue gate every paging pipeline
    * ships): per key, keep an alert only if at least `suppressSec`
    * has passed since the LAST KEPT alert — the decision feeds back
    * into itself, so no window/lag expression can compute it (lag
    * sees the previous EVENT, not the previous SURVIVOR); this is the
    * sequential-per-key family the streaming twins handle with state,
    * done in batch. The q42/DuckDB oracle replays it as a recursive
    * CTE stepping one row at a time, so the kept set is hash-exact.
    *
    * Shape at scale: one groupByKey(key) shuffle, then a per-key
    * in-memory sort + single pass — per-key alert counts are bounded
    * by construction (the AlertEdges bounded-population contract:
    * these are ALERTS, not raw events; a key whose alert stream does
    * not fit one task's memory has a worse problem than suppression).
    * Ties on (ts, id) order deterministically.
    *
    * Output: the kept rows (key, ts_us, id).
    */
  def suppressAlerts(df: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, suppressSec: Long): DataFrame = {
    require(suppressSec > 0, s"suppressAlerts: suppressSec $suppressSec must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val gapUs = suppressSec * 1000000L
    df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("long").as("ts_us"), col(idCol).cast("long").as("id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortInPlaceBy(r => (r._2, r._3))
        var lastKept = Long.MinValue
        rows.iterator.filter { case (_, ts, _) =>
          val keep = lastKept == Long.MinValue || ts >= lastKept + gapUs
          if (keep) lastKept = ts
          keep
        }
      }
      .toDF("key", "ts_us", "id")
  }
}
