package graft

/** DuckDB oracle SQL for the log-stream-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesR {
  import OracleHelpers._

  val sql: Map[String, String] = Map(
    "r11_hash_sample" ->
      """SELECT event_id, event_type AS etype, value FROM events
         WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
         ORDER BY event_id""",

    "r12_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                    FROM events),
            g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
                  FROM g)
         SELECT user_id, CAST(session AS BIGINT) AS session,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "r21_session_paths" ->
      // r12's session CTE + ordered string_agg of each session's
      // first-8 event types; same (count desc, path) top-20
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
                    FROM events),
            g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
                  FROM g),
            x AS (SELECT *, row_number() OVER (PARTITION BY user_id, session
                    ORDER BY ts_us, event_id) AS rn FROM s),
            p AS (SELECT user_id, session,
                    string_agg(event_type, '>' ORDER BY rn) AS path
                  FROM x WHERE rn <= 8 GROUP BY 1, 2),
            c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
                  FROM p GROUP BY 1)
         SELECT path, n_sessions FROM (
           SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
           FROM c)
         WHERE rk <= 20 ORDER BY n_sessions DESC, path""",

    "r13_stratified" ->
      """SELECT doc_id, source FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE WHEN source = 'src0' THEN '40' ELSE '1a' END
         ORDER BY doc_id""",

    "r27_seasonal_baseline" ->
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            b AS (SELECT min(hr) AS h0,
                         greatest(min(hr), max(hr) - 167) AS hb FROM h),
            hi AS (SELECT key, hr % 168 AS how, CAST(sum(c) AS BIGINT) AS n_hist
                   FROM h, b WHERE hr < hb GROUP BY 1, 2),
            la AS (SELECT key, hr % 168 AS how, CAST(sum(c) AS BIGINT) AS n_last
                   FROM h, b WHERE hr >= hb GROUP BY 1, 2),
            j AS (SELECT coalesce(hi.key, la.key) AS key,
                         coalesce(hi.how, la.how) AS how,
                         coalesce(n_hist, 0) AS n_hist,
                         coalesce(n_last, 0) AS n_last
                  FROM hi FULL OUTER JOIN la
                    ON la.key = hi.key AND la.how = hi.how),
            sl AS (SELECT j.*, ((b.hb - b.h0) // 168) +
                     (CASE WHEN ((j.how - (b.h0 % 168) + 168) % 168)
                                < ((b.hb - b.h0) % 168)
                           THEN 1 ELSE 0 END) AS slots_hist
                   FROM j, b)
         SELECT key AS event_type, how, n_hist, CAST(slots_hist AS BIGINT) AS slots_hist,
                CASE WHEN slots_hist > 0
                     THEN round(CAST(n_hist AS DOUBLE) / CAST(slots_hist AS DOUBLE), 6)
                END AS baseline_mean,
                n_last,
                CASE WHEN slots_hist > 0
                     THEN round((CAST(n_last AS DOUBLE) + 1.0) /
                            (round(CAST(n_hist AS DOUBLE) / CAST(slots_hist AS DOUBLE), 6)
                             + 1.0), 6)
                END AS ratio
         FROM sl ORDER BY event_type, how""",

    "r26_burn_rate" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
                    FROM events GROUP BY 1),
            mx AS (SELECT max(hr) AS mx FROM h),
            w(window_hours) AS (VALUES (1), (6), (24), (72)),
            a AS (SELECT w.window_hours,
                         CAST(sum(h.n) AS BIGINT) AS n_total,
                         CAST(sum(h.e) AS BIGINT) AS n_errors
                  FROM h CROSS JOIN mx CROSS JOIN w
                  WHERE h.hr > mx.mx - w.window_hours
                  GROUP BY 1)
         SELECT CAST(window_hours AS INTEGER) AS window_hours, n_total, n_errors,
                round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS err_rate,
                round((CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                      / 0.0050000000000000044, 6) AS burn_rate,
                round((CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE))
                      / 0.0050000000000000044, 6) >= 14.4 AS page
         FROM a ORDER BY window_hours""",

    "r14_rate_alert" ->
      """SELECT * FROM (
           SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE) AS error_rate
           FROM events GROUP BY 1)
         WHERE CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE) > 0.25
         ORDER BY window_start""",

    "r33_spike_attribution" ->
      // the r16 chain verbatim on the constant-key global rate, then
      // the r32 share/z formulas between the two hour classes
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                    FROM events GROUP BY 1),
            r AS (SELECT hr, c, count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT hr, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT hr,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            vd AS (SELECT hr, (coalesce(abs(zs) >= 3.0, false)
                               OR zs IS NULL) AS an FROM z),
            kh AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                     CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1, 2),
            k AS (SELECT kh.key,
                    CAST(sum(CASE WHEN vd.an THEN kh.c ELSE 0 END) AS BIGINT)
                      AS n_anom,
                    CAST(sum(CASE WHEN NOT vd.an THEN kh.c ELSE 0 END) AS BIGINT)
                      AS n_norm
                  FROM kh JOIN vd USING (hr) GROUP BY 1),
            t AS (SELECT CAST(sum(n_anom) AS BIGINT) AS ta,
                         CAST(sum(n_norm) AS BIGINT) AS tn2 FROM k),
            x AS (SELECT k.*, t.ta, t.tn2,
                    CAST(n_anom AS DOUBLE) / CAST(ta AS DOUBLE) AS sa,
                    CAST(n_norm AS DOUBLE) / CAST(tn2 AS DOUBLE) AS sn,
                    CAST(n_anom + n_norm AS DOUBLE)
                      / CAST(ta + tn2 AS DOUBLE) AS p
                  FROM k CROSS JOIN t WHERE t.ta > 0)
         SELECT key AS event_type, n_anom, n_norm,
                round(sa, 6) AS share_anom, round(sn, 6) AS share_norm,
                CASE WHEN n_norm = 0 THEN NULL
                     ELSE round(sa / sn, 6) END AS lift,
                round(CAST(n_anom AS DOUBLE) - CAST(ta AS DOUBLE) * sn, 6)
                  AS excess,
                CASE WHEN tn2 = 0 OR p = 0.0 OR p = 1.0 THEN NULL
                     ELSE round((sa - sn) / sqrt(p * (1.0 - p)
                       * (1.0 / CAST(ta AS DOUBLE) + 1.0 / CAST(tn2 AS DOUBLE))), 6)
                END AS z_score
         FROM x ORDER BY event_type""",

    "r32_canary_compare" ->
      // the same (key, hour) histogram + conditional window sums;
      // every division replayed in the identical association order
      """WITH h AS (SELECT event_type AS key,
                           epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
            a AS (SELECT max(hr) AS mx FROM h),
            k AS (SELECT h.key,
                    CAST(sum(CASE WHEN h.hr <= a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS n_before,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS n_after
                  FROM h CROSS JOIN a WHERE h.hr > a.mx - 672
                  GROUP BY 1),
            t AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb,
                         CAST(sum(n_after) AS BIGINT) AS ta FROM k),
            x AS (SELECT k.*, t.tb, t.ta,
                    CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE) AS pb,
                    CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE) AS pa,
                    CAST(n_before + n_after AS DOUBLE)
                      / CAST(tb + ta AS DOUBLE) AS p
                  FROM k CROSS JOIN t)
         SELECT key AS event_type, n_before, n_after,
                round(CAST(n_before AS DOUBLE) / 504.0, 6) AS rate_before,
                round(CAST(n_after AS DOUBLE) / 168.0, 6) AS rate_after,
                CASE WHEN n_before = 0 THEN NULL
                     ELSE round((CAST(n_after AS DOUBLE) / 168.0)
                                / (CAST(n_before AS DOUBLE) / 504.0), 6)
                END AS rate_ratio,
                round(pb, 6) AS share_before,
                round(pa, 6) AS share_after,
                CASE WHEN tb = 0 OR ta = 0 OR p = 0.0 OR p = 1.0 THEN NULL
                     ELSE round((pa - pb) / sqrt(p * (1.0 - p)
                       * (1.0 / CAST(tb AS DOUBLE) + 1.0 / CAST(ta AS DOUBLE))), 6)
                END AS z_score
         FROM x ORDER BY event_type""",

    "r31_budget_status" ->
      // same histogram + conditional aggregates; rate expressions in
      // the identical association order, budget literal bit-shared
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                             AS BIGINT) AS e
                    FROM events GROUP BY 1),
            a AS (SELECT max(hr) AS mx, min(hr) AS mn FROM h),
            g AS (SELECT a.mx, a.mn,
                    CAST(sum(h.n) AS BIGINT) AS n_total,
                    CAST(sum(h.e) AS BIGINT) AS n_errors,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.n ELSE 0 END)
                      AS BIGINT) AS rn,
                    CAST(sum(CASE WHEN h.hr > a.mx - 168 THEN h.e ELSE 0 END)
                      AS BIGINT) AS re
                  FROM h CROSS JOIN a WHERE h.hr > a.mx - 720
                  GROUP BY 1, 2),
            x AS (SELECT *, least(mx - mn + 1, 720) AS elapsed,
                    CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE) AS rate,
                    CAST(re AS DOUBLE) / CAST(rn AS DOUBLE)
                      / 0.0050000000000000044 AS rb
                  FROM g),
            y AS (SELECT *, rate / 0.0050000000000000044
                    * CAST(elapsed AS DOUBLE) / 720.0 AS used
                  FROM x)
         SELECT CAST(720 AS BIGINT) AS period_hours,
                CAST(elapsed AS BIGINT) AS elapsed_hours,
                n_total, n_errors, round(rate, 6) AS err_rate,
                round(used, 6) AS budget_used_frac,
                round(rb, 6) AS recent_burn,
                CASE WHEN re = 0 THEN NULL
                     ELSE round(greatest((1.0 - used) * 720.0 / rb, 0.0), 6)
                END AS hours_to_exhaustion,
                used >= 1.0 AS exhausted
         FROM y""",

    "r30_cusum" ->
      // same closed-form chart: baseline integer micros over the
      // first 24 present hours, prefix sums of (count - allowance),
      // running min, S = P - min(0, Pmin); all-integer until output
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            b AS (SELECT key, hr, c, min(hr) OVER (PARTITION BY key) AS h0 FROM h),
            b2 AS (SELECT key, hr, c, h0,
                     sum(CASE WHEN hr < h0 + 24 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY key) AS nb,
                     sum(CASE WHEN hr < h0 + 24 THEN c ELSE 0 END)
                       OVER (PARTITION BY key) AS bs
                   FROM b),
            s AS (SELECT key, hr, c, (bs * 1000000) // nb AS bm
                  FROM b2 WHERE hr >= h0 + 24),
            p AS (SELECT key, hr, c, bm,
                    sum(c * 1000000 - (bm + bm // 4)) OVER (
                      PARTITION BY key ORDER BY hr ROWS UNBOUNDED PRECEDING) AS pp
                  FROM s),
            q AS (SELECT key, hr, c, bm, pp,
                    min(pp) OVER (PARTITION BY key ORDER BY hr
                      ROWS UNBOUNDED PRECEDING) AS pmin
                  FROM p)
         SELECT key AS event_type, hr * 3600 AS hr_start,
                c AS n_events, CAST(bm AS BIGINT) AS baseline_micros,
                CAST(pp - least(pmin, 0) AS BIGINT) AS cusum_micros,
                (pp - least(pmin, 0)) > bm * 5 AS is_change
         FROM q ORDER BY event_type, hr_start""",

    "r16_rate_anomaly" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc)
         SELECT event_type, hr_start, CAST(c AS BIGINT) AS n_events,
                round(m, 6) AS mean_trailing,
                round(zs, 6) AS z_score,
                (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS is_anomaly
         FROM z ORDER BY event_type, hr_start""",

    "r24_rare_transitions" ->
      // per-user lag over the identically-masked lines, transition
      // counts, share of the source's outgoing edges, the same flag
      """WITH lines AS (
           SELECT user_id, ts, event_id,
                  'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT user_id, ts, event_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                     '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                     '<UUID>', 'g'),
                     '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                     '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS tpl
                 FROM lines),
           tr AS (SELECT prev AS src_template, tpl AS dst_template,
                         CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT tpl, lag(tpl) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) AS prev
                        FROM t)
                  WHERE prev IS NOT NULL GROUP BY 1, 2),
           sh AS (SELECT src_template, dst_template, n,
                         round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                           PARTITION BY src_template) AS DOUBLE), 6) AS share
                  FROM tr)
         SELECT src_template, dst_template, n, share,
                (n <= 2 OR share < 0.05) AS rare
         FROM sh ORDER BY src_template, dst_template""",

    "r28_incidents" ->
      // the r23 edge chain + one lead pairing fires with their next
      // resolve; per-key MTTR over closed incidents only
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a),
            ed AS (SELECT event_type, hr_start, an FROM e
                   WHERE an <> coalesce(prev, false)),
            fr AS (SELECT event_type, hr_start, an,
                     lead(hr_start) OVER (PARTITION BY event_type
                       ORDER BY hr_start) AS nxt
                   FROM ed),
            fi AS (SELECT event_type, (nxt - hr_start) // 3600 AS dur, nxt
                   FROM fr WHERE an)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_incidents,
                CAST(sum(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                round(avg(CAST(dur AS DOUBLE)), 6) AS mttr_hours,
                CAST(max(dur) AS BIGINT) AS max_hours
         FROM fi GROUP BY 1 ORDER BY event_type""",

    "r23_alert_edges" ->
      // the r16 CTE + one lag over the scored hourly frame; same
      // rising/falling edge rule
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c, m,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start, c, zs,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a)
         SELECT event_type, hr_start, CAST(c AS BIGINT) AS n_events,
                round(zs, 6) AS z_score,
                CASE WHEN an THEN 'fire' ELSE 'resolve' END AS edge
         FROM e WHERE an <> coalesce(prev, false)
         ORDER BY event_type, hr_start""",

    "r29_alert_storms" ->
      // the r23 chain's fire edges, gap-split in global (hr, key)
      // order, grouped per storm — identical cumsum storm ids
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, hr, c,
                    count(*) OVER w AS tn,
                    sum(c) OVER w AS tsum,
                    sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                  FROM h
                  WINDOW w AS (PARTITION BY event_type ORDER BY hr
                               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
            sc AS (SELECT event_type, hr * 3600 AS hr_start, c,
                     CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                     CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                       - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                         * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                   FROM r WHERE tn >= 12),
            z AS (SELECT event_type, hr_start, c,
                    CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                         WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                  FROM sc),
            a AS (SELECT event_type, hr_start,
                    (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS an
                  FROM z),
            e AS (SELECT *, lag(an) OVER (PARTITION BY event_type
                    ORDER BY hr_start) AS prev FROM a),
            f AS (SELECT event_type AS key, hr_start FROM e
                  WHERE an <> coalesce(prev, false) AND an),
            g AS (SELECT key, hr_start,
                    CASE WHEN lag(hr_start) OVER o IS NULL
                           OR hr_start - lag(hr_start) OVER o > 7200 THEN 1
                         ELSE 0 END AS ns
                  FROM f WINDOW o AS (ORDER BY hr_start, key)),
            st AS (SELECT key, hr_start, sum(ns) OVER (
                     ORDER BY hr_start, key ROWS UNBOUNDED PRECEDING) AS sid
                   FROM g)
         SELECT CAST(min(hr_start) AS BIGINT) AS storm_start,
                CAST(max(hr_start) AS BIGINT) AS storm_end,
                CAST(count(*) AS BIGINT) AS n_fires,
                CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
                CAST((max(hr_start) - min(hr_start)) // 3600 AS BIGINT) AS span_hours,
                string_agg(DISTINCT key, ',' ORDER BY key) AS keys
         FROM st GROUP BY sid ORDER BY storm_start""",

    "r38_hampel" ->
      // same two neighborhood self-joins at hour grain; 4.4478 =
      // 3 * 1.4826 folded, bit-shared with the op
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
            m AS (SELECT a.event_type, a.hr, a.c,
                         quantile_cont(b.c, 0.5) AS med
                  FROM h a JOIN h b ON b.event_type = a.event_type
                                   AND b.hr BETWEEN a.hr - 3 AND a.hr + 3
                  GROUP BY 1, 2, 3),
            d AS (SELECT m.event_type, m.hr, m.c, m.med,
                         quantile_cont(abs(CAST(b.c AS DOUBLE) - m.med), 0.5)
                           AS mad
                  FROM m JOIN h b ON b.event_type = m.event_type
                                 AND b.hr BETWEEN m.hr - 3 AND m.hr + 3
                  GROUP BY 1, 2, 3, 4)
         SELECT event_type, CAST(hr * 3600 AS BIGINT) AS hr_start,
                CAST(c AS BIGINT) AS n_events,
                round(med, 6) AS window_median, round(mad, 6) AS window_mad,
                abs(CAST(c AS DOUBLE) - med) > 4.4478 * mad AS is_outlier
         FROM d ORDER BY event_type, hr_start""",

    "r37_changepoint" ->
      // identical pinned gain chain per candidate; argmax ties to the
      // earliest hour
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
            w AS (SELECT event_type, hr,
                    row_number() OVER pk AS i,
                    sum(c) OVER pk AS s,
                    count(*) OVER (PARTITION BY event_type) AS n,
                    sum(c) OVER (PARTITION BY event_type) AS t
                  FROM h
                  WINDOW pk AS (PARTITION BY event_type ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            g AS (SELECT event_type, hr, i, n,
                    CAST(s AS DOUBLE) / CAST(i AS DOUBLE) AS ml,
                    CAST(t - s AS DOUBLE) / CAST(n - i AS DOUBLE) AS mr,
                    CAST(i AS DOUBLE) * CAST(n - i AS DOUBLE)
                      / CAST(n AS DOUBLE)
                      * ((CAST(s AS DOUBLE) / CAST(i AS DOUBLE)
                          - CAST(t - s AS DOUBLE) / CAST(n - i AS DOUBLE))
                        * (CAST(s AS DOUBLE) / CAST(i AS DOUBLE)
                          - CAST(t - s AS DOUBLE) / CAST(n - i AS DOUBLE)))
                      AS gain
                  FROM w WHERE i < n),
            r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                    ORDER BY gain DESC, hr) AS rk
                  FROM g)
         SELECT event_type, CAST(hr * 3600 AS BIGINT) AS split_after,
                CAST(i AS BIGINT) AS n_left, CAST(n - i AS BIGINT) AS n_right,
                round(ml, 6) AS mean_left, round(mr, 6) AS mean_right,
                round(gain, 6) AS gain
         FROM r WHERE rk = 1 ORDER BY event_type""",

    "r36_trend" ->
      // same exact-long S/tie/var folds, one pinned z chain, and the
      // quantile_cont median of pairwise slopes
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type,
                    CAST(sum(CASE WHEN b.c > a.c THEN 1
                                  WHEN b.c < a.c THEN -1 ELSE 0 END)
                      AS BIGINT) AS s,
                    quantile_cont(CAST(b.c - a.c AS DOUBLE)
                      / CAST(b.hr - a.hr AS DOUBLE), 0.5) AS slope
                  FROM h a JOIN h b ON b.event_type = a.event_type
                                   AND b.hr > a.hr
                  GROUP BY 1),
            g AS (SELECT event_type, c, count(*) AS t FROM h GROUP BY 1, 2),
            nt AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
                     CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
                   FROM g GROUP BY 1),
            j AS (SELECT p.event_type, nt.n, p.s, p.slope,
                    CAST(nt.n * (nt.n - 1) * (2 * nt.n + 5) - nt.tt
                      AS DOUBLE) / 18.0 AS v
                  FROM p JOIN nt USING (event_type))
         SELECT event_type, n AS n_hours, s AS s_stat,
                CASE WHEN v > 0.0 THEN
                  round((CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                              WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                              ELSE 0.0 END) / sqrt(v), 6)
                END AS z_score,
                round(slope, 6) AS sen_slope
         FROM j ORDER BY event_type""",

    "r35_mad_outliers" ->
      // quantile_cont shares percentile's linear-interpolation
      // definition (the q11 pair); every derived double is an exact
      // multiple of 0.25, so the k*MAD comparison is engine-neutral
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
            m AS (SELECT event_type, quantile_cont(c, 0.5) AS med
                  FROM h GROUP BY 1),
            a AS (SELECT h.event_type, h.hr, h.c, m.med,
                         abs(CAST(h.c AS DOUBLE) - m.med) AS adev
                  FROM h JOIN m USING (event_type)),
            d AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                  FROM a GROUP BY 1)
         SELECT a.event_type, CAST(a.hr * 3600 AS BIGINT) AS hr_start,
                CAST(a.c AS BIGINT) AS n_events,
                round(a.med, 6) AS median_rate, round(d.mad, 6) AS mad,
                a.adev > 5.0 * d.mad AS is_outlier
         FROM a JOIN d USING (event_type)
         ORDER BY event_type, hr_start""",

    "r34_alert_suppression" ->
      // the sequential keep-decision replayed one row at a time: rn
      // orders each user's alerts, the recursion carries last_kept
      // forward and flags survivors
      """WITH RECURSIVE e AS (
              SELECT user_id, epoch_us(ts) AS us, event_id,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rn
              FROM events WHERE event_type = 'error'),
            k AS (
              SELECT user_id, us, event_id, rn, us AS last_kept, TRUE AS kept
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.user_id, e.us, e.event_id, e.rn,
                     CASE WHEN e.us >= k.last_kept + 3600000000
                          THEN e.us ELSE k.last_kept END,
                     e.us >= k.last_kept + 3600000000
              FROM k JOIN e ON e.user_id = k.user_id AND e.rn = k.rn + 1)
         SELECT user_id, us AS ts_us, event_id
         FROM k WHERE kept ORDER BY user_id, ts_us, event_id""",

    "r25_template_drift" ->
      """WITH lines AS (SELECT ts, 'user=' || user_id || ' type=' || event_type
                || ' value=' || CAST(value AS VARCHAR) AS l FROM events),
            t AS (SELECT epoch_us(ts) AS us,
                    regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                      '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                      '<UUID>', 'g'),
                      '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                      '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
                  FROM lines),
            b AS (SELECT min(us) + ((max(us) - min(us)) // 2) AS bnd FROM t),
            c AS (SELECT template,
                    CAST(sum(CASE WHEN us < bnd THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
                    CAST(sum(CASE WHEN us >= bnd THEN 1 ELSE 0 END) AS BIGINT) AS n_after
                  FROM t, b GROUP BY 1),
            sc AS (SELECT template, n_before, n_after,
                     round(ln(CAST(n_after + 1 AS DOUBLE)
                              / CAST(n_before + 1 AS DOUBLE)), 6) AS log_ratio,
                     CASE WHEN n_before = 0 THEN 'new'
                          WHEN n_after = 0 THEN 'vanished'
                          ELSE 'shifted' END AS status
                   FROM c)
         SELECT template, n_before, n_after, log_ratio, status FROM (
           SELECT *, row_number() OVER (
             ORDER BY abs(log_ratio) DESC, template) AS rk FROM sc)
         WHERE rk <= 20 ORDER BY abs(log_ratio) DESC, template""",

    "r22_template_anomaly" ->
      // the r18 masking CTE keys the r16 anomaly CTE — same regexes,
      // same trailing-24 z-score arithmetic, template-keyed
      """WITH lines AS (
           SELECT ts, 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT ts, regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
              FROM lines),
           h AS (SELECT template, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
                 FROM t GROUP BY 1, 2),
           r AS (SELECT template, hr, c,
                   count(*) OVER w AS tn,
                   sum(c) OVER w AS tsum,
                   sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w AS tss
                 FROM h
                 WINDOW w AS (PARTITION BY template ORDER BY hr
                              RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
           sc AS (SELECT template, hr * 3600 AS hr_start, c,
                    CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE) AS m,
                    CAST(tss AS DOUBLE) / CAST(tn AS DOUBLE)
                      - (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
                        * (CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)) AS v
                  FROM r WHERE tn >= 12),
           z AS (SELECT template, hr_start, c, m,
                   CASE WHEN v > 0.0 THEN (CAST(c AS DOUBLE) - m) / sqrt(v)
                        WHEN CAST(c AS DOUBLE) = m THEN 0.0 END AS zs
                 FROM sc)
         SELECT template, hr_start, CAST(c AS BIGINT) AS n_events,
                round(m, 6) AS mean_trailing,
                round(zs, 6) AS z_score,
                (coalesce(abs(zs) >= 3.0, false) OR zs IS NULL) AS is_anomaly
         FROM z ORDER BY template, hr_start""",

    "r39_holt_forecast" -> OracleHelpers.holtOracleSql(window = 16),

    "r41_jsonl" ->
      // the JSON escape round trip is exact, so the oracle aggregates
      // the source table directly; the injected malformed line is the
      // literal '(corrupt)' row
      """WITH agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len(list_filter(
                          string_split_regex(lower(text), '\s+'),
                          t -> len(t) > 0))) AS BIGINT) AS n_tokens
                      FROM documents GROUP BY 1)
         SELECT * FROM (
             SELECT source, n_docs, n_tokens FROM agg
             UNION ALL
             SELECT '(corrupt)', CAST(1 AS BIGINT), CAST(0 AS BIGINT))
         ORDER BY source""",

    "r42_jsonl_gz" ->
      // the gzip shards hold exactly toJsonl(documents) + one corrupt
      // member, and the JSON escape round trip is exact, so the
      // oracle is r41's: aggregate the source table directly, the
      // malformed gzip member is the literal '(corrupt)' row
      """WITH agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len(list_filter(
                          string_split_regex(lower(text), '\s+'),
                          t -> len(t) > 0))) AS BIGINT) AS n_tokens
                      FROM documents GROUP BY 1)
         SELECT * FROM (
             SELECT source, n_docs, n_tokens FROM agg
             UNION ALL
             SELECT '(corrupt)', CAST(1 AS BIGINT), CAST(0 AS BIGINT))
         ORDER BY source""",

    "r43_warc" ->
      // the WARC round trip is exact (payload = UTF-8 text bytes,
      // host = the source written into the Target-URI), so the
      // oracle aggregates the source table directly; the malformed
      // archive is the literal '(corrupt)' row with 0 tokens
      """WITH agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_records,
                        CAST(sum(len(list_filter(
                          string_split_regex(lower(text), '\s+'),
                          t -> len(t) > 0))) AS BIGINT) AS n_tokens
                      FROM documents GROUP BY 1)
         SELECT * FROM (
             SELECT source, n_records, n_tokens FROM agg
             UNION ALL
             SELECT '(corrupt)', CAST(1 AS BIGINT), CAST(0 AS BIGINT))
         ORDER BY source""",

    "r44_crawl_intake" ->
      // the whole intake chain replayed: the t50 page build (host =
      // the source written into the Target-URI), the t50 extraction
      // chain per page, then the per-host aggregate — HUGEINT-safe
      // casts on the sums
      """WITH h AS (SELECT doc_id, source,
              '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
              || ' &amp; co</title><style>body { color: #fff; }</style>'
              || '<script type="text/javascript">if (1 < 2 && x > 0) { alert("hi"); }</script></head>'
              || '<body><!-- nav --><h1>' || source || '</h1><p>'
              || replace(replace(replace(text, '&', '&amp;'),
                   '<', '&lt;'), '>', '&gt;')
              || '</p><div id="foot">Contact&nbsp;&quot;us&quot; &#39;now&#39;</div></body></html>'
                AS html
            FROM documents),
          x AS (SELECT doc_id, source,
              trim(regexp_replace(
                replace(replace(replace(replace(replace(replace(replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(html,
                          '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                        '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                      '(?s)<!--.*?-->', ' ', 'g'),
                    '<[^>]*>', ' ', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                  '&amp;', '&'),
                '[ \t\n\r]+', ' ', 'g')) AS t
            FROM h)
         SELECT source AS host, CAST(count(*) AS BIGINT) AS n_pages,
                CAST(sum(len(list_filter(string_split(t, ' '),
                  s -> len(s) > 0))) AS BIGINT) AS n_tokens,
                CAST(sum(length(t)) AS BIGINT) AS n_chars
         FROM x GROUP BY 1 ORDER BY host""",

    "r45_http_frame" ->
      // the HTTP framing replayed from the page build: status by the
      // same doc_id rule the fixture writes, Content-Type the literal
      // header value, and BOTH byte counts from strlen(html) — the
      // fixture's Content-Length header is written as octet_length of
      // the same page, and the split body is the page verbatim, so a
      // framing off-by-one on the Spark side diverges from this
      """WITH h AS (SELECT doc_id, source,
              '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
              || ' &amp; co</title><style>body { color: #fff; }</style>'
              || '<script type="text/javascript">if (1 < 2 && x > 0) { alert("hi"); }</script></head>'
              || '<body><!-- nav --><h1>' || source || '</h1><p>'
              || replace(replace(replace(text, '&', '&amp;'),
                   '<', '&lt;'), '>', '&gt;')
              || '</p><div id="foot">Contact&nbsp;&quot;us&quot; &#39;now&#39;</div></body></html>'
                AS html
            FROM documents),
          m AS (SELECT source,
              CASE WHEN doc_id % 97 = 0 THEN 404
                   WHEN doc_id % 89 = 0 THEN 301
                   ELSE 200 END AS status,
              strlen(html) AS blen
            FROM h)
         SELECT source AS host, CAST(status AS INTEGER) AS status,
                'text/html; charset=utf-8' AS content_type,
                CAST(count(*) AS BIGINT) AS n_responses,
                CAST(sum(blen) AS BIGINT) AS declared_bytes,
                CAST(sum(blen) AS BIGINT) AS body_bytes
         FROM m GROUP BY 1, 2 ORDER BY host, status""",

    "r46_redirect_edges" ->
      // the redirect edge list replayed from the fixture rule: 301s
      // are doc_id % 89 = 0 minus the 404 override (% 97 = 0, the
      // CASE order in the builder), Location = same host, doc_id + 1
      """SELECT source AS host, doc_id AS from_doc,
                doc_id + 1 AS to_doc
         FROM documents
         WHERE doc_id % 89 = 0 AND doc_id % 97 <> 0
         ORDER BY from_doc""",

    "r47_robots_filter" ->
      // the robots build + parse + prefix match replayed: same
      // line-split / Disallow-keep / trim / drop-empty chain, the
      // match as len(list_filter) > 0 (DuckDB's EXISTS over a list)
      """WITH d AS (SELECT doc_id, source,
              '/doc/' || CAST(doc_id AS VARCHAR) AS path
            FROM documents),
          r AS (SELECT DISTINCT source,
              CASE WHEN length(source) % 2 = 0
                THEN 'User-agent: *' || chr(10) || 'Disallow: /doc/1'
                     || chr(10) || 'Disallow: /admin' || chr(10)
                ELSE 'User-agent: *' || chr(10) || 'Disallow:' || chr(10)
              END AS robots
            FROM documents),
          p AS (SELECT source,
              list_filter(list_transform(string_split(robots, chr(10)),
                l -> CASE WHEN starts_with(l, 'Disallow:')
                          THEN trim(substr(l, 10)) ELSE '' END),
                x -> len(x) > 0) AS dis
            FROM r)
         SELECT d.source AS host, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN len(list_filter(p.dis,
                  x -> starts_with(d.path, x))) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
         FROM d JOIN p ON p.source = d.source
         GROUP BY 1 ORDER BY host""",

    "r48_wet_export" ->
      // the r44 replay (page build + extraction chain) with the WET
      // record type as a pinned literal — the export round trip must
      // reproduce the intake report exactly
      """WITH h AS (SELECT doc_id, source,
              '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
              || ' &amp; co</title><style>body { color: #fff; }</style>'
              || '<script type="text/javascript">if (1 < 2 && x > 0) { alert("hi"); }</script></head>'
              || '<body><!-- nav --><h1>' || source || '</h1><p>'
              || replace(replace(replace(text, '&', '&amp;'),
                   '<', '&lt;'), '>', '&gt;')
              || '</p><div id="foot">Contact&nbsp;&quot;us&quot; &#39;now&#39;</div></body></html>'
                AS html
            FROM documents),
          x AS (SELECT doc_id, source,
              trim(regexp_replace(
                replace(replace(replace(replace(replace(replace(replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(html,
                          '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                        '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                      '(?s)<!--.*?-->', ' ', 'g'),
                    '<[^>]*>', ' ', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' '),
                  '&amp;', '&'),
                '[ \t\n\r]+', ' ', 'g')) AS t
            FROM h)
         SELECT source AS host, 'conversion' AS warc_type,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(list_filter(string_split(t, ' '),
                  s -> len(s) > 0))) AS BIGINT) AS n_tokens,
                CAST(sum(length(t)) AS BIGINT) AS n_chars
         FROM x GROUP BY 1, 2 ORDER BY host""",

    "r49_revisit_classify" ->
      // the change rule replayed: generation B appends ' v2' to every
      // 7th doc's text, so changed = doc_id % 7 = 0 — appending
      // always changes the payload bytes, and sha2-256 equality on
      // unchanged bytes is exact
      """SELECT source AS host, CAST(count(*) AS BIGINT) AS n_pages,
                CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_unchanged,
                CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_changed
         FROM documents GROUP BY 1 ORDER BY host""",

    "r50_frontier" ->
      // the frontier replayed from the fixture rules: candidate uris
      // = next-doc anchors (every doc) ∪ hub anchors (every 3rd) ∪
      // redirect Locations (% 89 minus the % 97 override — a subset
      // of the next-doc targets, collapsed by DISTINCT), then the
      // r47 robots parse per candidate host and the crawled
      // anti-join on (host, doc_id)
      """WITH cand AS (SELECT DISTINCT uri FROM (
              SELECT 'http://' || source || '/doc/'
                     || CAST(doc_id + 1 AS VARCHAR) AS uri
              FROM documents
              UNION ALL
              SELECT 'http://hub.example/doc/0' FROM documents
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'http://' || source || '/doc/'
                     || CAST(doc_id + 1 AS VARCHAR)
              FROM documents
              WHERE doc_id % 89 = 0 AND doc_id % 97 <> 0)),
          c2 AS (SELECT regexp_extract(uri, '^http://([^/]+)/', 1) AS host,
                        CAST(regexp_extract(uri, '/doc/([0-9]+)$', 1)
                          AS BIGINT) AS tid
                 FROM cand),
          p AS (SELECT host,
              list_filter(list_transform(string_split(
                CASE WHEN length(host) % 2 = 0
                  THEN 'User-agent: *' || chr(10) || 'Disallow: /doc/1'
                       || chr(10) || 'Disallow: /admin' || chr(10)
                  ELSE 'User-agent: *' || chr(10) || 'Disallow:' || chr(10)
                END, chr(10)),
                l -> CASE WHEN starts_with(l, 'Disallow:')
                          THEN trim(substr(l, 10)) ELSE '' END),
                x -> len(x) > 0) AS dis
            FROM (SELECT DISTINCT host FROM c2)),
          j AS (SELECT c2.host, c2.tid,
                  len(list_filter(p.dis, x -> starts_with(
                    '/doc/' || CAST(c2.tid AS VARCHAR), x))) > 0 AS blocked,
                  d.crawled
                FROM c2 JOIN p ON p.host = c2.host
                LEFT JOIN (SELECT source AS host, doc_id AS tid,
                             TRUE AS crawled FROM documents) d
                  ON d.host = c2.host AND d.tid = c2.tid)
         SELECT host, CAST(count(*) AS BIGINT) AS n_candidates,
                CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_blocked,
                CAST(sum(CASE WHEN NOT blocked AND crawled IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         FROM j GROUP BY 1 ORDER BY host""",

    "r51_politeness_schedule" ->
      // the r50 frontier CTEs + the schedule replay: allowed new
      // targets serialize per host under delay = 1 + len(host) % 3,
      // fetch i at i*delay, bucketed into 60 s slots — `//` on
      // nonnegative operands matches Spark's `div`
      """WITH cand AS (SELECT DISTINCT uri FROM (
              SELECT 'http://' || source || '/doc/'
                     || CAST(doc_id + 1 AS VARCHAR) AS uri
              FROM documents
              UNION ALL
              SELECT 'http://hub.example/doc/0' FROM documents
              WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'http://' || source || '/doc/'
                     || CAST(doc_id + 1 AS VARCHAR)
              FROM documents
              WHERE doc_id % 89 = 0 AND doc_id % 97 <> 0)),
          c2 AS (SELECT regexp_extract(uri, '^http://([^/]+)/', 1) AS host,
                        CAST(regexp_extract(uri, '/doc/([0-9]+)$', 1)
                          AS BIGINT) AS tid
                 FROM cand),
          p AS (SELECT host,
              list_filter(list_transform(string_split(
                CASE WHEN length(host) % 2 = 0
                  THEN 'User-agent: *' || chr(10) || 'Disallow: /doc/1'
                       || chr(10) || 'Disallow: /admin' || chr(10)
                  ELSE 'User-agent: *' || chr(10) || 'Disallow:' || chr(10)
                END, chr(10)),
                l -> CASE WHEN starts_with(l, 'Disallow:')
                          THEN trim(substr(l, 10)) ELSE '' END),
                x -> len(x) > 0) AS dis
            FROM (SELECT DISTINCT host FROM c2)),
          j AS (SELECT c2.host, c2.tid,
                  len(list_filter(p.dis, x -> starts_with(
                    '/doc/' || CAST(c2.tid AS VARCHAR), x))) > 0 AS blocked,
                  d.crawled
                FROM c2 JOIN p ON p.host = c2.host
                LEFT JOIN (SELECT source AS host, doc_id AS tid,
                             TRUE AS crawled FROM documents) d
                  ON d.host = c2.host AND d.tid = c2.tid),
          f AS (SELECT host,
                  CAST(length(host) % 3 + 1 AS BIGINT) AS delay,
                  CAST(row_number() OVER (PARTITION BY host
                    ORDER BY tid) - 1 AS BIGINT) AS seq
                FROM j WHERE NOT blocked AND crawled IS NULL)
         SELECT CAST((seq * delay) // 60 AS BIGINT) AS slot,
                CAST(count(*) AS BIGINT) AS n_fetches,
                CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
         FROM f GROUP BY 1 ORDER BY slot""",

    "r52_sitemap" ->
      // the sitemap build + parse replayed end to end: same per-doc
      // entry string, same lexicographic entry sort into one per-host
      // XML, same regexp group pulls (RE2-safe on both engines),
      // positional zip, and the freshness report off the PARSED
      // lastmod values
      """WITH e AS (SELECT source AS host,
              '<url><loc>http://' || source || '/doc/'
              || CAST(doc_id AS VARCHAR) || '</loc><lastmod>2024-01-'
              || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
              || '</lastmod></url>' AS entry
            FROM documents),
          x AS (SELECT host,
              '<?xml version="1.0"?><urlset>'
              || string_agg(entry, '' ORDER BY entry) || '</urlset>' AS xml
            FROM e GROUP BY 1),
          p AS (SELECT host,
              regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1) AS locs,
              regexp_extract_all(xml,
                '<lastmod>([^<]+)</lastmod>', 1) AS mods
            FROM x),
          u AS (SELECT host, locs[i] AS loc, mods[i] AS mod
                FROM (SELECT host, locs, mods,
                        unnest(range(1, len(locs) + 1)) AS i
                      FROM p))
         SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
                CAST(sum(CASE WHEN mod <= '2024-01-14' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_stale,
                max(mod) AS latest_mod
         FROM u GROUP BY 1 ORDER BY host""",

    "r53_fetch_savings" ->
      // the conditional-GET ledger replayed from the generation-B
      // rule: changed = doc_id % 7 = 0 (' v2' appended), downloaded
      // bytes = B payload size (strlen = BYTES, the r45 convention;
      // +3 for the ascii suffix), saved = unchanged payload bytes
      """SELECT source AS host, CAST(count(*) AS BIGINT) AS n_requests,
                CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_downloads,
                CAST(sum(CASE WHEN doc_id % 7 = 0 THEN strlen(text) + 3
                  ELSE 0 END) AS BIGINT) AS bytes_downloaded,
                CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0
                  ELSE strlen(text) END) AS BIGINT) AS bytes_saved
         FROM documents GROUP BY 1 ORDER BY host""",

    "r40_rate_correlation" ->
      // same zero-filled full-axis grid and q43 moment chain
      """WITH h AS (SELECT event_type AS k, epoch_us(ts) // 3600000000 AS hr,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            sp AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
            ax AS (SELECT unnest(range(lo, hi + 1)) AS hr FROM sp),
            ks AS (SELECT DISTINCT k FROM h),
            g AS (SELECT ax.hr, ks.k, coalesce(h.c, 0) AS c
                  FROM ax CROSS JOIN ks
                  LEFT JOIN h ON h.k = ks.k AND h.hr = ax.hr),
            p AS (SELECT a.k AS key_a, b.k AS key_b,
                    CAST(count(*) AS BIGINT) AS n_hours,
                    CAST(sum(CAST(a.c AS DECIMAL(28,0))) AS DOUBLE) AS sx,
                    CAST(sum(CAST(b.c AS DECIMAL(28,0))) AS DOUBLE) AS sy,
                    CAST(sum(CAST(a.c * a.c AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
                    CAST(sum(CAST(b.c * b.c AS DECIMAL(28,0))) AS DOUBLE) AS syy,
                    CAST(sum(CAST(a.c * b.c AS DECIMAL(28,0))) AS DOUBLE) AS sxy
                  FROM g a JOIN g b ON b.hr = a.hr AND a.k < b.k
                  GROUP BY 1, 2)
         SELECT key_a, key_b, n_hours,
                round((CAST(n_hours AS DOUBLE) * sxy - sx * sy)
                  / (sqrt(CAST(n_hours AS DOUBLE) * sxx - sx * sx)
                     * sqrt(CAST(n_hours AS DOUBLE) * syy - sy * sy)), 6)
                  AS corr
         FROM p ORDER BY key_a, key_b""",

    "r20_ewma_forecast" ->
      // dyadic weights: both engines sum c·2^(24−d) and 2^(24−d) as
      // exact integers, then perform the SAME single IEEE division
      """WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              j AS (SELECT a.key, a.hr, a.c,
                      CAST(sum(b.c * (CAST(1 AS BIGINT)
                        << CAST(24 - (a.hr - b.hr) AS INTEGER))) AS BIGINT) AS num,
                      CAST(sum(CAST(1 AS BIGINT)
                        << CAST(24 - (a.hr - b.hr) AS INTEGER)) AS BIGINT) AS den,
                      count(*) AS tn
                    FROM h a JOIN h b
                      ON b.key = a.key AND b.hr BETWEEN a.hr - 24 AND a.hr - 1
                    GROUP BY 1, 2, 3),
              f AS (SELECT key, hr, c, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS fc
                    FROM j WHERE tn >= 12)
         SELECT key AS event_type, hr * 3600 AS hr_start,
                CAST(c AS BIGINT) AS n_events,
                round(fc, 6) AS ewma_forecast,
                (CAST(c AS DOUBLE) >= 3.0 * fc) AS is_spike,
                (CAST(c AS DOUBLE) <= fc / 3.0) AS is_drop
         FROM f ORDER BY event_type, hr_start""",

    "r17_parse_rate" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                count(*) AS n_lines,
                sum(CASE WHEN event_id % 13 <> 0 THEN 1 ELSE 0 END) AS n_parsed
             FROM events GROUP BY 1)
         SELECT hr * 3600 AS hr_start, CAST(n_lines AS BIGINT) AS n_lines,
                CAST(n_parsed AS BIGINT) AS n_parsed,
                CAST(n_parsed AS DOUBLE) / CAST(n_lines AS DOUBLE) AS parse_rate,
                (CAST(n_parsed AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.95) AS alert
         FROM h ORDER BY hr_start""",

    "r18_log_templates" ->
      """WITH lines AS (
           SELECT 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events
           UNION ALL
           SELECT 'user=' || c_custkey || ' name=' || c_name
               || ' segment=' || c_mktsegment FROM customer),
           t AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template
              FROM lines)
         SELECT template, CAST(count(*) AS BIGINT) AS n
         FROM t GROUP BY 1 ORDER BY template""",

    "r19_template_latency" ->
      """WITH lines AS (
           SELECT 'id=' || event_id || ' ts=' || strftime(ts, '%Y-%m-%d %H:%M:%S')
               || ' user=' || user_id || ' type=' || event_type
               || ' value=' || CAST(value AS VARCHAR) AS l
           FROM events),
           t AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(l,
                 '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
                 '<UUID>', 'g'),
                 '0x[0-9a-fA-F]+', '<HEX>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
                 '-?[0-9]+(\.[0-9]+)?([Ee][+-]?[0-9]+)?', '<N>', 'g') AS template,
                 CAST(regexp_extract(l, ' value=(.+)$', 1) AS DOUBLE) AS v
              FROM lines)
         SELECT template, CAST(count(*) AS BIGINT) AS n,
                round(quantile_cont(v, 0.5), 6) AS p50,
                round(quantile_cont(v, 0.95), 6) AS p95,
                round(max(v), 6) AS max_v
         FROM t GROUP BY 1 ORDER BY template""",

    "r15_multiline" ->
      """WITH lines AS (
           SELECT user_id, event_id * 2 AS line_no,
                  'id=' || event_id || ' type=' || event_type AS line,
                  1 AS is_header
           FROM events
           UNION ALL
           SELECT user_id, event_id * 2 + 1, '  at trace#' || event_id, 0
           FROM events WHERE event_type = 'error'),
            r AS (
           SELECT user_id, line_no, line,
                  CAST(sum(is_header) OVER (PARTITION BY user_id ORDER BY line_no) AS BIGINT) AS rec_no
           FROM lines)
         SELECT user_id, rec_no, CAST(count(*) AS BIGINT) AS n_lines,
                string_agg(line, ' | ' ORDER BY line_no) AS record
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    "r01_regex_parse" ->
      """SELECT event_id, epoch_us(date_trunc('second', ts)) // 1000000 AS ts_s,
                user_id, event_type AS etype, value
         FROM events ORDER BY event_id""",

    "r02_date_parse" ->
      """SELECT event_id, CASE
           WHEN event_id % 9 = 5 THEN epoch_us(date_trunc('minute', ts)) // 1000000
           WHEN event_id % 9 = 7 THEN epoch_us(date_trunc('day', ts)) // 1000000
           ELSE epoch_us(date_trunc('second', ts)) // 1000000
         END AS ts_s
         FROM events ORDER BY event_id""",

    "r03_filter" ->
      """SELECT event_id, event_type AS etype, value FROM events
         WHERE event_type = 'error' AND value > 50.0 ORDER BY event_id""",

    "r05_throttle" ->
      """SELECT event_id FROM (
           SELECT event_id, row_number() OVER (
             PARTITION BY epoch_us(ts) // 60000000
             ORDER BY epoch_us(ts), event_id) AS rn
           FROM events) WHERE rn <= 5 ORDER BY event_id""",

    "r06_window_tumbling" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS window_start, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "r07_window_sliding" ->
      """SELECT ws AS window_start, event_type,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM (SELECT unnest([(epoch_us(ts) // 300000000) * 300 - 300,
                              (epoch_us(ts) // 300000000) * 300]) AS ws,
                      event_type, value
               FROM events)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "r08_multitable_join" ->
      """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "r09_sql_per_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                event_type AS etype, CAST(count(*) AS BIGINT) AS n, max(value) AS max_v
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "r10_bool_parse" ->
      """SELECT value > 50.0 AS big, CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
