package graft

/** DuckDB oracle SQL for the query-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesQ {
  import OracleHelpers._

  val sql: Map[String, String] = Map(
    "q37_reachability" ->
      // full recursive path enumeration capped at 4 hops, min() per
      // node — proves the engine's first-visit BFS labels every node
      // with its TRUE shortest hop count
      """WITH RECURSIVE e AS (
              SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
              UNION ALL
              SELECT l_partkey * 2 + 1, l_orderkey * 2 FROM lineitem),
            r AS (
              SELECT CAST(p_partkey * 2 + 1 AS BIGINT) AS id, 0 AS hops
              FROM part WHERE p_partkey < 3
              UNION ALL
              SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.id
              WHERE r.hops < 4)
         SELECT CASE WHEN id % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
                CAST(id // 2 AS BIGINT) AS node_id,
                CAST(min(hops) AS BIGINT) AS hops
         FROM r GROUP BY 1, 2 ORDER BY kind, node_id""",

    "q38_pagerank" -> pageRankOracle(d = "0.85", iters = 3),

    "q38b_pagerank_big" -> pageRankBigOracle(d = "0.85", iters = 3),

    "q40_communities" -> lpaOracle(iters = 3),

    "q40b_communities_big" -> lpaBigOracle(iters = 3),

    "q41_pit_join" ->
      // q34's SCD2 chain over non-purchase changes, then for each
      // purchase fact the version with the greatest effective_from at
      // or before it (ties to the highest version — the as-of
      // tie-break); facts before any version keep NULLs via the left
      // join
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                    FROM events WHERE event_type <> 'purchase'),
            ch AS (SELECT user_id, event_type, us, event_id FROM (
                     SELECT *, lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS prev FROM e)
                   WHERE prev IS NULL OR prev <> event_type),
            v AS (SELECT user_id, event_type AS state, us AS effective_from,
                    CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS BIGINT) AS version
                  FROM ch),
            f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT f.event_id, v.state, v.version,
                    row_number() OVER (PARTITION BY f.event_id
                      ORDER BY v.effective_from DESC, v.version DESC) AS rn
                  FROM f JOIN v ON v.user_id = f.user_id
                              AND v.effective_from <= f.ts_us)
         SELECT f.event_id, f.user_id, f.ts_us,
                j.state AS state_at, j.version AS version_at
         FROM f LEFT JOIN j ON j.event_id = f.event_id AND j.rn = 1
         ORDER BY f.event_id""",

    "q45_activity_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
                      CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
                    FROM events),
            g AS (SELECT user_id, day,
                    day - row_number() OVER (PARTITION BY user_id
                      ORDER BY day) AS grp
                  FROM d)
         SELECT user_id, CAST(min(day) AS BIGINT) AS start_day,
                CAST(max(day) AS BIGINT) AS end_day,
                CAST(count(*) AS BIGINT) AS n_days
         FROM g GROUP BY user_id, grp
         ORDER BY user_id, start_day""",

    "q46_user_growth" ->
      """WITH f AS (SELECT user_id,
                      CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS day
                    FROM events GROUP BY 1),
            p AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new
                  FROM f GROUP BY 1)
         SELECT day, n_new,
                CAST(sum(n_new) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS n_total
         FROM p ORDER BY day""",

    "q62_new_vs_returning" ->
      """WITH a AS (SELECT DISTINCT user_id,
                      CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
                    FROM events),
            f AS (SELECT user_id, min(week) AS fw FROM a GROUP BY 1),
            j AS (SELECT a.week, a.user_id, f.fw
                  FROM a JOIN f USING (user_id))
         SELECT week, CAST(count(*) AS BIGINT) AS n_active,
                CAST(sum(CASE WHEN week = fw THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_new,
                CAST(count(*) - sum(CASE WHEN week = fw THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returning,
                round(CAST(count(*) - sum(CASE WHEN week = fw THEN 1 ELSE 0
                  END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS pct_returning
         FROM j GROUP BY 1 ORDER BY week""",

    "q61_session_kpis" ->
      // the r12 session chain + one aggregate of the session frame
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                    FROM events),
            g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS brk
                  FROM e
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            sn AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session
                   FROM g),
            s AS (SELECT user_id, session, count(*) AS n,
                    max(ts_us) - min(ts_us) AS dur
                  FROM sn GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_sessions,
                round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
                round(CAST(sum(CAST(n AS DECIMAL(19,0))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS avg_events,
                round(quantile_cont(n, 0.5), 6) AS p50_events,
                round(quantile_cont(dur, 0.5), 6) AS p50_duration_us,
                round(quantile_cont(dur, 0.9), 6) AS p90_duration_us
         FROM s""",

    "q60_ltv_curve" ->
      """WITH f AS (SELECT user_id,
                      min(epoch_us(ts) // 604800000000) AS cohort
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
            sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n
                   FROM f GROUP BY 1),
            r AS (SELECT f.cohort,
                    CAST(epoch_us(e.ts) // 604800000000 - f.cohort
                      AS BIGINT) AS age_weeks,
                    sum(CAST(e.value AS DECIMAL(18,6))) AS rev
                  FROM events e JOIN f USING (user_id)
                  WHERE e.event_type = 'purchase'
                  GROUP BY 1, 2),
            c AS (SELECT r.cohort, r.age_weeks, sz.n, r.rev,
                    sum(r.rev) OVER (PARTITION BY r.cohort
                      ORDER BY r.age_weeks
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum
                  FROM r JOIN sz USING (cohort))
         SELECT CAST(cohort AS BIGINT) AS cohort_week, age_weeks,
                n AS n_users, round(CAST(rev AS DOUBLE), 6) AS revenue,
                round(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS cum_ltv_per_user
         FROM c ORDER BY cohort_week, age_weeks""",

    "q59_rfm" ->
      // same quintile boundaries (1-based list index) and pinned <=
      // assignment chain
      """WITH cust AS (SELECT o_custkey,
                 max(epoch_us(o_orderdate) // 86400000000) AS lastd,
                 CAST(count(*) AS BIGINT) AS f,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
               FROM orders GROUP BY 1),
            a AS (SELECT max(lastd) AS anchor FROM cust),
            rfm AS (SELECT c.f, c.m,
                      CAST(a.anchor - c.lastd AS BIGINT) AS r
                    FROM cust c, a),
            q AS (SELECT
                quantile_cont(CAST(r AS DOUBLE), [0.2,0.4,0.6,0.8]) AS qr,
                quantile_cont(CAST(f AS DOUBLE), [0.2,0.4,0.6,0.8]) AS qf,
                quantile_cont(CAST(m AS DOUBLE), [0.2,0.4,0.6,0.8]) AS qm
              FROM rfm),
            seg AS (SELECT
                CASE WHEN CAST(r AS DOUBLE) <= qr[1] THEN 1
                     WHEN CAST(r AS DOUBLE) <= qr[2] THEN 2
                     WHEN CAST(r AS DOUBLE) <= qr[3] THEN 3
                     WHEN CAST(r AS DOUBLE) <= qr[4] THEN 4
                     ELSE 5 END AS r_q,
                CASE WHEN CAST(f AS DOUBLE) <= qf[1] THEN 1
                     WHEN CAST(f AS DOUBLE) <= qf[2] THEN 2
                     WHEN CAST(f AS DOUBLE) <= qf[3] THEN 3
                     WHEN CAST(f AS DOUBLE) <= qf[4] THEN 4
                     ELSE 5 END AS f_q,
                CASE WHEN CAST(m AS DOUBLE) <= qm[1] THEN 1
                     WHEN CAST(m AS DOUBLE) <= qm[2] THEN 2
                     WHEN CAST(m AS DOUBLE) <= qm[3] THEN 3
                     WHEN CAST(m AS DOUBLE) <= qm[4] THEN 4
                     ELSE 5 END AS m_q,
                m
              FROM rfm, q)
         SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
                CAST(m_q AS BIGINT) AS m_q,
                CAST(count(*) AS BIGINT) AS n_customers,
                round(CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS avg_monetary
         FROM seg GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""",

    "q58_conversion_lag" ->
      """WITH tv AS (SELECT user_id, min(epoch_us(ts)) AS tv
                     FROM events WHERE event_type = 'view' GROUP BY 1),
            tp AS (SELECT user_id, epoch_us(ts) AS tp
                   FROM events WHERE event_type = 'purchase'),
            lag AS (SELECT tp.user_id, min(tp.tp - tv.tv) AS lag
                    FROM tp JOIN tv USING (user_id)
                    WHERE tp.tp >= tv.tv GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
                round(quantile_cont(lag, 0.5), 6) AS p50_lag_us,
                round(quantile_cont(lag, 0.9), 6) AS p90_lag_us,
                round(CAST(sum(CAST(lag AS DECIMAL(19,0))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS mean_lag_us
         FROM lag""",

    "q57_weighted_median" ->
      // same crossing rule (2*cum >= total), exact decimal weights
      """WITH b AS (SELECT l_returnflag AS k,
                      CAST(l_extendedprice AS DOUBLE) AS x,
                      CAST(l_quantity AS DECIMAL(18,6)) AS w
                    FROM lineitem),
            c AS (SELECT k, x, w,
                    sum(w) OVER (PARTITION BY k ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum,
                    sum(w) OVER (PARTITION BY k) AS tot
                  FROM b)
         SELECT k AS l_returnflag, min(x) AS w_median,
                CAST(max(tot) AS DOUBLE) AS total_weight
         FROM c WHERE cum * 2 >= tot
         GROUP BY 1 ORDER BY l_returnflag""",

    "q65_histogram" ->
      // same integer-quantized bin rule ((xi-lo)*B // (hi-lo), clamp
      // B-1) and the same pinned edge-render chain over exact ints
      """WITH xi AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS xi
                     FROM orders WHERE o_totalprice IS NOT NULL),
            mm AS (SELECT min(xi) AS lo, max(xi) AS hi,
                     CAST(count(*) AS BIGINT) AS nt FROM xi),
            b AS (SELECT CASE WHEN hi = lo THEN 0
                              ELSE least(19, ((xi - lo) * 20) // (hi - lo))
                         END AS bin
                  FROM xi, mm),
            c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n
                  FROM b GROUP BY 1),
            ax AS (SELECT unnest(range(20)) AS bin)
         SELECT CAST(ax.bin AS BIGINT) AS bin,
                round((CAST(mm.lo AS DOUBLE) + CAST(ax.bin AS DOUBLE)
                  * (CAST(mm.hi AS DOUBLE) - CAST(mm.lo AS DOUBLE)) / 20.0)
                  / 100.0, 6) AS lo_edge,
                round((CAST(mm.lo AS DOUBLE) + CAST(ax.bin + 1 AS DOUBLE)
                  * (CAST(mm.hi AS DOUBLE) - CAST(mm.lo AS DOUBLE)) / 20.0)
                  / 100.0, 6) AS hi_edge,
                CAST(coalesce(c.n, 0) AS BIGINT) AS n,
                round(CAST(coalesce(c.n, 0) AS DOUBLE)
                  / CAST(mm.nt AS DOUBLE), 6) AS share
         FROM ax CROSS JOIN mm LEFT JOIN c ON c.bin = ax.bin
         ORDER BY bin""",

    "q75_skyline" ->
      // same exact-arithmetic dominance (DECIMAL revenue, integer
      // cross-multiplied return rates), NOT EXISTS form
      """WITH sup AS (SELECT l_suppkey,
                        sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                          AS BIGINT) AS r
                      FROM lineitem GROUP BY 1)
         SELECT s.l_suppkey, CAST(s.rev AS DOUBLE) AS revenue,
                s.n AS n_lines,
                round(CAST(s.r AS DOUBLE) / CAST(s.n AS DOUBLE), 6)
                  AS return_rate
         FROM sup s
         WHERE NOT EXISTS (
           SELECT 1 FROM sup o
           WHERE o.rev >= s.rev AND o.r * s.n <= s.r * o.n
             AND (o.rev > s.rev OR o.r * s.n < s.r * o.n))
         ORDER BY s.l_suppkey""",

    "q74_traffic_heatmap" ->
      // Spark dayofweek is 1-7 Sunday=1; DuckDB's is 0-6 Sunday=0
      """WITH e AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                      CAST(hour(ts) AS BIGINT) AS hr
                    FROM events),
            t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM e)
         SELECT dow, hr, CAST(count(*) AS BIGINT) AS n_events,
                round(CAST(count(*) AS DOUBLE) / CAST(max(t.nn) AS DOUBLE), 6)
                  AS share
         FROM e CROSS JOIN t GROUP BY dow, hr
         ORDER BY dow, hr""",

    "q73_purchase_intervals" ->
      // same customer-grain lag, exact epoch-day gaps, q11 pair
      """WITH o AS (SELECT o_custkey,
                      epoch_us(o_orderdate) // 86400000000 AS d,
                      o_orderkey
                    FROM orders),
            g AS (SELECT o_custkey,
                    d - lag(d) OVER (PARTITION BY o_custkey
                      ORDER BY d, o_orderkey) AS gap
                  FROM o)
         SELECT CAST(count(*) AS BIGINT) AS n_gaps,
                CAST(count(DISTINCT o_custkey) AS BIGINT)
                  AS n_repeat_customers,
                round(quantile_cont(gap, 0.5), 6) AS p50_days,
                round(quantile_cont(gap, 0.9), 6) AS p90_days,
                round(CAST(sum(CAST(gap AS DECIMAL(19,0))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS mean_days,
                CAST(sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_same_day
         FROM g WHERE gap IS NOT NULL""",

    "q72_ri_audit" ->
      // same per-relationship left joins against distinct parent keys
      """WITH r1 AS (SELECT 'lineitem.orderkey->orders' AS relationship,
                       CAST(count(*) AS BIGINT) AS n_child,
                       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
                     FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                       ON o.o_orderkey = l.l_orderkey),
            r2 AS (SELECT 'lineitem.partkey->part',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
                       ON p.p_partkey = l.l_partkey),
            r3 AS (SELECT 'lineitem.suppkey->supplier',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
                       ON s.s_suppkey = l.l_suppkey),
            r4 AS (SELECT 'orders.custkey->customer',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                       ON c.c_custkey = o.o_custkey),
            r5 AS (SELECT 'customer.nationkey->nation',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
                       ON n.n_nationkey = c.c_nationkey),
            r6 AS (SELECT 'supplier.nationkey->nation',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM supplier s LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
                       ON n.n_nationkey = s.s_nationkey),
            r7 AS (SELECT 'nation.regionkey->region',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     FROM nation n LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
                       ON r.r_regionkey = n.n_regionkey),
            u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
                  UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
                  UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
                  UNION ALL SELECT * FROM r7)
         SELECT relationship, n_child, n_orphans,
                round(CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE), 6)
                  AS orphan_rate
         FROM u ORDER BY relationship""",

    "q71_pvm_bridge" ->
      // same midpoint split; effect terms as all-integer microdollars
      // with the sign-split half-away division (Spark div truncates,
      // DuckDB // floors — they agree only on nonnegative operands)
      """WITH li AS (SELECT l_partkey AS pk,
                       epoch_us(l_shipdate) // 604800000000 AS wk,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS r,
                       CAST(l_quantity AS DECIMAL(18,2)) AS v
                     FROM lineitem),
            mid AS (SELECT (min(wk) + max(wk) + 1) // 2 AS mid FROM li),
            per0 AS (SELECT pk,
                      sum(CASE WHEN wk < mid THEN r END) AS ra,
                      sum(CASE WHEN wk < mid THEN v END) AS va,
                      sum(CASE WHEN wk >= mid THEN r END) AS rb,
                      sum(CASE WHEN wk >= mid THEN v END) AS vb
                    FROM li CROSS JOIN mid GROUP BY 1),
            per AS (SELECT *,
                      CAST(ra * 100 AS HUGEINT) AS rai,
                      CAST(va * 100 AS HUGEINT) AS vai,
                      CAST(rb * 100 AS HUGEINT) AS rbi,
                      CAST(vb * 100 AS HUGEINT) AS vbi,
                      (CAST(vb * 100 AS HUGEINT) - CAST(va * 100 AS HUGEINT))
                        * CAST(ra * 100 AS HUGEINT) * 10000 AS voln
                    FROM per0),
            m AS (SELECT *,
                    CASE WHEN voln < 0
                         THEN -((-2 * voln + vai) // (2 * vai))
                         ELSE (2 * voln + vai) // (2 * vai) END AS volm,
                    rbi * 10000
                      - (2 * rai * vbi * 10000 + vai) // (2 * vai) AS prim
                  FROM per),
            a AS (SELECT
                    CAST(sum(rai) * 10000 AS BIGINT) AS tota_u,
                    CAST(sum(rbi) * 10000 AS BIGINT) AS totb_u,
                    CAST(sum(volm) AS BIGINT) AS volu,
                    CAST(sum(prim) AS BIGINT) AS priu,
                    CAST(coalesce(
                      sum(CASE WHEN ra IS NULL THEN rbi END) * 10000, 0)
                      AS BIGINT) AS new_u,
                    CAST(coalesce(
                      sum(CASE WHEN rb IS NULL THEN rai END) * 10000, 0)
                      AS BIGINT) AS lost_u
                  FROM m),
            b AS (SELECT *,
                    totb_u - tota_u - volu - priu - new_u + lost_u
                      AS resid_u
                  FROM a)
         SELECT component, value_micros FROM (
             SELECT '1_revenue_a' AS component, tota_u AS value_micros
               FROM b
             UNION ALL SELECT '2_volume_effect', volu FROM b
             UNION ALL SELECT '3_price_effect', priu FROM b
             UNION ALL SELECT '4_new_parts', new_u FROM b
             UNION ALL SELECT '5_lost_parts', -lost_u FROM b
             UNION ALL SELECT '6_residual', resid_u FROM b
             UNION ALL SELECT '7_revenue_b', totb_u FROM b)
         ORDER BY component""",

    "q70_ols_fit" ->
      // same raw-sum folds and parenthesization as the op (and q43)
      """WITH g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                CAST(sum(CAST(l_discount AS DECIMAL(18,4))
                       * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                CAST(sum(CAST(l_discount AS DECIMAL(18,4))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
                round((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
                round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                  / CAST(n AS DOUBLE), 6) AS intercept,
                round(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                     * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)))
                  * ((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                     * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))), 6) AS r2
         FROM g ORDER BY l_returnflag""",

    "q69_wow_growth" ->
      // same DECIMAL weekly fold, exact decimal subtraction, one
      // pinned division
      """WITH wk AS (SELECT epoch_us(o_orderdate) // 604800000000 AS week,
                       CAST(count(*) AS BIGINT) AS n_orders,
                       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                     FROM orders GROUP BY 1),
            l AS (SELECT week, n_orders, rev,
                    lag(rev) OVER (ORDER BY week) AS prev
                  FROM wk)
         SELECT week, n_orders,
                CAST(rev AS DOUBLE) AS revenue,
                CAST(prev AS DOUBLE) AS prev_revenue,
                CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
                  round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
                END AS wow_growth
         FROM l ORDER BY week""",

    "q68_window_funnel" ->
      // same exists-chain semantics: 24h from the chain's own start
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
            v AS (SELECT user_id, us AS tv FROM e WHERE event_type = 'view'),
            c AS (SELECT user_id, us AS tc FROM e WHERE event_type = 'click'),
            p AS (SELECT user_id, us AS tp FROM e WHERE event_type = 'purchase'),
            l2 AS (SELECT v.user_id, tv, tc FROM v JOIN c USING (user_id)
                   WHERE tc > tv AND tc <= tv + 86400000000),
            l3u AS (SELECT DISTINCT l2.user_id FROM l2 JOIN p USING (user_id)
                    WHERE tp > tc AND tp <= tv + 86400000000),
            l2u AS (SELECT DISTINCT user_id FROM l2),
            l1u AS (SELECT DISTINCT user_id FROM v),
            lv AS (SELECT CASE WHEN l3u.user_id IS NOT NULL THEN 3
                               WHEN l2u.user_id IS NOT NULL THEN 2
                               ELSE 1 END AS level
                   FROM l1u
                   LEFT JOIN l2u ON l2u.user_id = l1u.user_id
                   LEFT JOIN l3u ON l3u.user_id = l1u.user_id)
         SELECT CAST(level AS BIGINT) AS level,
                CAST(count(*) AS BIGINT) AS n_users
         FROM lv GROUP BY 1 ORDER BY level""",

    "q67_stickiness" ->
      // same (user, day) grain and trailing-window expansion
      """WITH ud AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS d FROM events),
            days AS (SELECT DISTINCT d AS day FROM ud),
            dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
                    FROM ud GROUP BY 1),
            wau AS (SELECT days.day,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS wau
                    FROM days JOIN ud
                      ON ud.d <= days.day AND ud.d >= days.day - 6
                    GROUP BY 1),
            mau AS (SELECT days.day,
                      CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                    FROM days JOIN ud
                      ON ud.d <= days.day AND ud.d >= days.day - 27
                    GROUP BY 1)
         SELECT day, dau, wau, mau,
                round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6)
                  AS stickiness
         FROM dau JOIN wau USING (day) JOIN mau USING (day)
         ORDER BY day""",

    "q66_fifo_allocation" ->
      // same unit-interval overlap rule, decimal prefixes, and the
      // all-integer microdollar cost terms ((2a+b) // 2b half-up)
      """WITH s0 AS (SELECT l_partkey AS k,
                       CAST(l_quantity AS DECIMAL(18,2)) AS q,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS c,
                       l_shipdate, l_orderkey, l_linenumber
                     FROM lineitem WHERE l_returnflag = 'N'),
            d0 AS (SELECT l_partkey AS k,
                     CAST(l_quantity AS DECIMAL(18,2)) AS q,
                     l_shipdate, l_orderkey, l_linenumber
                   FROM lineitem WHERE l_returnflag = 'R'),
            s2 AS (SELECT k, hi - q AS slo, hi AS shi,
                     CAST(c * 100 AS BIGINT) AS ci,
                     CAST(q * 100 AS BIGINT) AS qi
                   FROM (SELECT k, q, c, sum(q) OVER (PARTITION BY k
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS hi FROM s0)),
            d2 AS (SELECT k, hi - q AS dlo, hi AS dhi
                   FROM (SELECT k, q, sum(q) OVER (PARTITION BY k
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS hi FROM d0)),
            m AS (SELECT s2.k,
                    least(shi, dhi) - greatest(slo, dlo) AS ov, ci, qi
                  FROM s2 JOIN d2 ON d2.k = s2.k
                  WHERE slo < dhi AND dlo < shi),
            m2 AS (SELECT k, ov,
                     (2 * ci * CAST(ov * 100 AS BIGINT) * 10000 + qi)
                       // (2 * qi) AS tm
                   FROM m),
            a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_matches,
                    CAST(sum(ov) AS DOUBLE) AS matched_qty,
                    CAST(sum(CAST(tm AS DECIMAL(38,0))) AS DOUBLE)
                      / 1000000.0 AS fifo_cogs
                  FROM m2 GROUP BY 1),
            ts AS (SELECT k, sum(q) AS t FROM s0 GROUP BY 1),
            td AS (SELECT k, sum(q) AS t FROM d0 GROUP BY 1)
         SELECT a.k AS l_partkey, n_matches, matched_qty,
                CAST(greatest(td.t - ts.t, CAST(0 AS DECIMAL(18,2)))
                  AS DOUBLE) AS unmatched_demand,
                fifo_cogs
         FROM a JOIN ts ON ts.k = a.k JOIN td ON td.k = a.k
         ORDER BY l_partkey""",

    "q64_spearman" ->
      // doubled average rank = 2*min_rank + tie_count - 1 (exact
      // integers); same DECIMAL moment folds and q43 parenthesization
      """WITH b AS (SELECT l_returnflag AS k,
                      CAST(l_quantity AS DOUBLE) AS x,
                      CAST(l_extendedprice AS DOUBLE) AS y
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL
                      AND l_extendedprice IS NOT NULL),
            r AS (SELECT k,
                    2 * rank() OVER (PARTITION BY k ORDER BY x)
                      + count(*) OVER (PARTITION BY k, x) - 1 AS dx,
                    2 * rank() OVER (PARTITION BY k ORDER BY y)
                      + count(*) OVER (PARTITION BY k, y) - 1 AS dy
                  FROM b),
            g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(dx AS DECIMAL(38,0))) AS DOUBLE) AS sa,
                    CAST(sum(CAST(dy AS DECIMAL(38,0))) AS DOUBLE) AS sb,
                    CAST(sum(CAST(dx * dx AS DECIMAL(38,0))) AS DOUBLE) AS saa,
                    CAST(sum(CAST(dy * dy AS DECIMAL(38,0))) AS DOUBLE) AS sbb,
                    CAST(sum(CAST(dx * dy AS DECIMAL(38,0))) AS DOUBLE) AS sab
                  FROM r GROUP BY 1)
         SELECT k AS l_returnflag, n,
                round((CAST(n AS DOUBLE) * sab - sa * sb)
                  / (sqrt(CAST(n AS DOUBLE) * saa - sa * sa)
                     * sqrt(CAST(n AS DOUBLE) * sbb - sb * sb)), 6) AS rho
         FROM g ORDER BY l_returnflag""",

    "q63_abc_analysis" ->
      // same exact integer-scaled cuts (cum*5 <= T*4, cum*20 <= T*19)
      """WITH rev AS (SELECT l_partkey,
                        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DECIMAL(18,6)) AS x
                      FROM lineitem GROUP BY 1),
            c AS (SELECT l_partkey, x,
                    sum(x) OVER (ORDER BY x DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum,
                    sum(x) OVER () AS t
                  FROM rev),
            k AS (SELECT x, t,
                    CASE WHEN cum * 5 <= t * 4 THEN 'A'
                         WHEN cum * 20 <= t * 19 THEN 'B'
                         ELSE 'C' END AS abc_class
                  FROM c)
         SELECT abc_class, CAST(count(*) AS BIGINT) AS n_items,
                round(CAST(sum(x) AS DOUBLE), 6) AS value,
                round(CAST(sum(x) AS DOUBLE) / CAST(max(t) AS DOUBLE), 6)
                  AS value_share
         FROM k GROUP BY 1 ORDER BY abc_class""",

    "q56_topk_others" ->
      """WITH rev AS (SELECT n_name, s_suppkey,
                        sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
                      FROM lineitem
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation ON n_nationkey = s_nationkey
                      GROUP BY 1, 2),
            r AS (SELECT n_name, s_suppkey, rev,
                    row_number() OVER (PARTITION BY n_name
                      ORDER BY rev DESC, s_suppkey) AS rk
                  FROM rev),
            l AS (SELECT n_name,
                    CASE WHEN rk <= 3 THEN CAST(s_suppkey AS STRING)
                         ELSE '(other)' END AS supplier, rev
                  FROM r)
         SELECT n_name, supplier,
                round(CAST(sum(rev) AS DOUBLE), 2) AS revenue,
                CAST(count(*) AS BIGINT) AS n_suppliers
         FROM l GROUP BY 1, 2
         ORDER BY n_name, revenue DESC, supplier""",

    "q55_lorenz_gini" ->
      // same exact DECIMAL rank*x fold; gini = two pinned divisions
      """WITH rev AS (SELECT o_custkey,
                        sum(CAST(o_totalprice AS DECIMAL(18,6))) AS x
                      FROM orders GROUP BY 1),
            r AS (SELECT o_custkey, x,
                    row_number() OVER (ORDER BY x, o_custkey) AS rk
                  FROM rev),
            t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS tt,
                         sum(CAST(rk AS DECIMAL(19,0)) * x) AS rx
                  FROM r),
            d AS (SELECT CAST((rk * 10 - 1) // n + 1 AS BIGINT) AS decile,
                         CAST(count(*) AS BIGINT) AS n_members,
                         sum(x) AS dx
                  FROM r, t GROUP BY 1),
            c AS (SELECT decile, n_members,
                    sum(dx) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum
                  FROM d)
         SELECT c.decile, c.n_members,
                round(CAST(c.cum AS DOUBLE) / CAST(t.tt AS DOUBLE), 6)
                  AS cum_share,
                round(2.0 * CAST(t.rx AS DOUBLE)
                  / (CAST(t.n AS DOUBLE) * CAST(t.tt AS DOUBLE))
                  - CAST(t.n + 1 AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
                  AS gini
         FROM c, t ORDER BY decile""",

    "q54_benford" ->
      // decimal->string is the one cross-engine-stable numeric render;
      // the log10(1+1/d) literals are bit-shared with the Spark op
      """WITH d AS (SELECT regexp_extract(
                      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING),
                      '([1-9])', 1) AS digit
                    FROM orders),
            c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                  FROM d WHERE digit <> '' GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
            p AS (SELECT digit, n,
                    CASE digit WHEN '1' THEN 0.301029995664
                      WHEN '2' THEN 0.176091259056
                      WHEN '3' THEN 0.124938736608
                      WHEN '4' THEN 0.096910013008
                      WHEN '5' THEN 0.079181246048
                      WHEN '6' THEN 0.066946789631
                      WHEN '7' THEN 0.057991946978
                      WHEN '8' THEN 0.051152522447
                      WHEN '9' THEN 0.045757490561 END AS bp,
                    CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS sh
                  FROM c, t)
         SELECT digit, n, round(sh, 6) AS share, bp AS benford_p,
                round(abs(sh - bp), 6) AS abs_dev
         FROM p ORDER BY digit""",

    "q53_chi2_independence" ->
      // Spark dayofweek is 1-7 Sunday=1; DuckDB's is 0-6 Sunday=0.
      // cell terms quantize to DECIMAL(28,9) before the cumulative
      // fold so no window fold order can move a bit
      """WITH obs AS (SELECT event_type,
                        CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                        CAST(count(*) AS BIGINT) AS obs
                      FROM events GROUP BY 1, 2),
            grid AS (SELECT e.event_type, d.dow, coalesce(o.obs, 0) AS obs
                     FROM (SELECT DISTINCT event_type FROM obs) e
                     CROSS JOIN (SELECT DISTINCT dow FROM obs) d
                     LEFT JOIN obs o USING (event_type, dow)),
            x AS (SELECT event_type, dow, obs,
                    CAST(sum(obs) OVER (PARTITION BY event_type) AS DOUBLE)
                      * CAST(sum(obs) OVER (PARTITION BY dow) AS DOUBLE)
                      / CAST(sum(obs) OVER () AS DOUBLE) AS e
                  FROM grid),
            y AS (SELECT event_type, dow, obs, e,
                    (CAST(obs AS DOUBLE) - e) / sqrt(e) AS res
                  FROM x),
            t AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
                         CAST(count(DISTINCT dow) AS BIGINT) AS nc
                  FROM obs)
         SELECT event_type, dow, obs, round(e, 6) AS expected,
                round(res, 6) AS residual,
                round(CAST(sum(CAST(round(res * res, 9) AS DECIMAL(28,9)))
                  OVER (ORDER BY event_type, dow
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 6) AS cum_chi2,
                (nr - 1) * (nc - 1) AS df
         FROM y, t ORDER BY event_type, dow""",

    "q52_mannwhitney" ->
      graft.operators.Stats.mwOracleSql("events", "event_type", "value",
        Seq("click", "error", "purchase", "signup", "view")),

    "q51_ks_drift" ->
      // generated from the same division/critical-value text as the
      // op; the key domain is the literal sorted event-type set
      graft.operators.Stats.ksOracleSql("events", "event_type", "value",
        Seq("click", "error", "purchase", "signup", "view")),

    "q50_bootstrap_ci" ->
      // generated from the SAME weight/threshold text the Spark op
      // uses (Bootstrap.weightSql), so the engines cannot drift
      graft.operators.Bootstrap.oracleSql(
        "events", "event_type", "event_id", "value", b = 64),

    "q49_basket_lift" ->
      // lift divides in the same pinned order (n_ab/n_a/n_b*N)
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM lineitem),
            p AS (SELECT a.pk AS pa, b.pk AS pb,
                         CAST(count(*) AS BIGINT) AS n_ab
                  FROM items a JOIN items b USING (ok)
                  WHERE a.pk < b.pk GROUP BY 1, 2 HAVING count(*) >= 2),
            s AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item
                  FROM items GROUP BY 1),
            t AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items)
         SELECT p.pa, p.pb, p.n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
                round(CAST(p.n_ab AS DOUBLE) / CAST(sa.n_item AS DOUBLE)
                  / CAST(sb.n_item AS DOUBLE) * CAST(t.n AS DOUBLE), 6)
                  AS lift
         FROM p JOIN s sa ON sa.pk = p.pa
                JOIN s sb ON sb.pk = p.pb, t
         ORDER BY pa, pb""",

    "q48_dq_profile" ->
      // every metric is invariant to the engine's string formatter
      // (null-ness / blank-ness / distinct counts survive any
      // injective cast), so the VARCHAR funnel is safe cross-engine
      """WITH s AS (
           SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS v FROM events
           UNION ALL SELECT 'ts', CAST(ts AS VARCHAR) FROM events
           UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
           UNION ALL SELECT 'event_type', CAST(event_type AS VARCHAR) FROM events
           UNION ALL SELECT 'value', CAST(value AS VARCHAR) FROM events
           UNION ALL SELECT 'props', CAST(props AS VARCHAR) FROM events)
         SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null,
                CAST(sum(CASE WHEN trim(v) = '' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_blank,
                CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                round(CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS null_rate
         FROM s GROUP BY 1 ORDER BY 1""",

    "q47_daily_balance" ->
      // same shape: daily decimal totals, running balance + lead fill
      // range per user, one generate_series unnest per observed day
      """WITH daily AS (
              SELECT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     sum(CAST(value AS DECIMAL(18,6))) AS total
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
            w AS (SELECT user_id, day,
                    sum(total) OVER (PARTITION BY user_id ORDER BY day) AS bal,
                    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
                  FROM daily)
         SELECT user_id, d AS day, CAST(bal AS DOUBLE) AS balance,
                d = obs AS is_active
         FROM (SELECT user_id, day AS obs, bal,
                 unnest(generate_series(day, coalesce(nxt - 1, day))) AS d
               FROM w)
         ORDER BY user_id, day""",

    "q43_stats_moments" ->
      // the same exact-decimal raw sums cast to double, then the same
      // fixed parenthesization for every derived statistic
      """WITH g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
                round(sx / CAST(n AS DOUBLE), 6) AS avg_qty,
                round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))), 6) AS std_qty,
                round(sy / CAST(n AS DOUBLE), 6) AS avg_price,
                round(sqrt((syy - sy * sy / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))), 6) AS std_price,
                round((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                     * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
                  AS corr_qty_price
         FROM g ORDER BY l_returnflag""",

    "q44_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                      event_id, value FROM events),
            t AS (SELECT *, last_value(CASE WHEN event_type <> 'purchase'
                      THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS touch0
                  FROM e)
         SELECT coalesce(touch0, '(direct)') AS touch,
                CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  AS attributed_value
         FROM t WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    "q42_bitemporal" ->
      // q41's PIT shape against two transaction-time snapshots of the
      // SCD2 chain: v1 builds only from changes the warehouse had
      // ingested by T1 (tx = valid + (event_id % 7) hours), v2 from
      // everything; per fact, the greatest effective_from at or
      // before it wins in each snapshot (ties to highest version),
      // and restated flags audit drift null-safely
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                      epoch_us(ts) + (event_id % 7) * 3600000000 AS tx_us
                    FROM events WHERE event_type <> 'purchase'),
            ch1 AS (SELECT user_id, event_type, us, event_id FROM (
                      SELECT *, lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS prev
                      FROM e WHERE tx_us <= 1705363200000000)
                    WHERE prev IS NULL OR prev <> event_type),
            v1 AS (SELECT user_id, event_type AS state, us AS effective_from,
                     CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS BIGINT) AS version
                   FROM ch1),
            ch2 AS (SELECT user_id, event_type, us, event_id FROM (
                      SELECT *, lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS prev FROM e)
                    WHERE prev IS NULL OR prev <> event_type),
            v2 AS (SELECT user_id, event_type AS state, us AS effective_from,
                     CAST(row_number() OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS BIGINT) AS version
                   FROM ch2),
            f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'purchase'),
            j1 AS (SELECT f.event_id, v.state, v.version,
                     row_number() OVER (PARTITION BY f.event_id
                       ORDER BY v.effective_from DESC, v.version DESC) AS rn
                   FROM f JOIN v1 v ON v.user_id = f.user_id
                                   AND v.effective_from <= f.ts_us),
            j2 AS (SELECT f.event_id, v.state, v.version,
                     row_number() OVER (PARTITION BY f.event_id
                       ORDER BY v.effective_from DESC, v.version DESC) AS rn
                   FROM f JOIN v2 v ON v.user_id = f.user_id
                                   AND v.effective_from <= f.ts_us)
         SELECT f.event_id, f.user_id, f.ts_us,
                j1.state AS state_t1, j1.version AS version_t1,
                j2.state AS state_now, j2.version AS version_now,
                (j1.state IS DISTINCT FROM j2.state)
                  OR (j1.version IS DISTINCT FROM j2.version) AS restated
         FROM f LEFT JOIN j1 ON j1.event_id = f.event_id AND j1.rn = 1
                LEFT JOIN j2 ON j2.event_id = f.event_id AND j2.rn = 1
         ORDER BY f.event_id""",

    "q39_shortest_path" ->
      // full <=4-edge weighted path enumeration, min(total) per node —
      // proves the engine's bounded Bellman-Ford relaxation exactly
      """WITH RECURSIVE e AS (
              SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst,
                     CAST(l_quantity AS BIGINT) AS w FROM lineitem
              UNION ALL
              SELECT l_partkey * 2 + 1, l_orderkey * 2,
                     CAST(l_quantity AS BIGINT) FROM lineitem),
            r AS (
              SELECT CAST(p_partkey * 2 + 1 AS BIGINT) AS id,
                     CAST(0 AS BIGINT) AS d, 0 AS hops
              FROM part WHERE p_partkey < 3
              UNION ALL
              SELECT e.dst, r.d + e.w, r.hops + 1
              FROM r JOIN e ON e.src = r.id WHERE r.hops < 4)
         SELECT CASE WHEN id % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
                CAST(id // 2 AS BIGINT) AS node_id,
                CAST(min(d) AS BIGINT) AS dist
         FROM r GROUP BY 1, 2 ORDER BY kind, node_id""",

    "q31_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 604800000000 AS wk FROM events),
            fw AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1)
         SELECT CAST(f.cohort AS BIGINT) AS cohort_week,
                CAST(u.wk - f.cohort AS BIGINT) AS week_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM uw u JOIN fw f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q36_listagg" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
                string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",

    "q35_pareto" ->
      // same decimal revenue sums; rank/cumsum windows with the
      // (rev desc, custkey) tiebreak
      """WITH r AS (SELECT o_custkey,
                      sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
                    FROM orders GROUP BY 1),
            t AS (SELECT sum(rev) AS tot FROM r)
         SELECT o_custkey,
                CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
                  AS rank,
                CAST(rev AS DOUBLE) AS revenue,
                round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
                round(CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  / CAST(tot AS DOUBLE), 6) AS cum_share
         FROM r CROSS JOIN t ORDER BY rank""",

    "q34_scd2" ->
      // identical lag-collapse then lead/row_number over the change
      // rows; (us, event_id) tiebreak makes both windows deterministic
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                    FROM events),
            ch AS (SELECT user_id, event_type, us, event_id FROM (
                     SELECT *, lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS prev FROM e)
                   WHERE prev IS NULL OR prev <> event_type),
            v AS (SELECT user_id, event_type AS state, us AS effective_from,
                    lead(us) OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS effective_to,
                    CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY us, event_id) AS BIGINT) AS version
                  FROM ch)
         SELECT user_id, state, effective_from, effective_to, version,
                effective_to IS NULL AS is_current
         FROM v ORDER BY user_id, version""",

    "q29_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                  JOIN v ON e.user_id = v.user_id AND e.ts > v.t
                        AND e.ts <= v.t + INTERVAL 24 HOUR
                  WHERE e.event_type = 'click' GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                  JOIN c ON e.user_id = c.user_id AND e.ts > c.t
                        AND e.ts <= c.t + INTERVAL 24 HOUR
                  WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT '1_view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS users
         UNION ALL
         SELECT '2_click', CAST((SELECT count(*) FROM c) AS BIGINT)
         UNION ALL
         SELECT '3_purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
         ORDER BY step""",

    "q24_setops" ->
      """SELECT id, src FROM (
           SELECT id, 'both' AS src FROM (
             SELECT DISTINCT user_id AS id FROM events
             INTERSECT
             SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer)
           UNION ALL
           SELECT id, 'cust_only' AS src FROM (
             SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer
             EXCEPT
             SELECT DISTINCT user_id AS id FROM events))
         ORDER BY src, id""",

    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_join_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",

    "q03_multijoin" ->
      """SELECT r_name, n_name,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                CAST(count(*) AS BIGINT) AS n
         FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q03b_multijoin_cbo" ->
      // identical spec to q03: the CBO/statistics planning regime is a
      // performance choice and must be answer-invariant
      """SELECT r_name, n_name,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                CAST(count(*) AS BIGINT) AS n
         FROM region
           JOIN nation ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q04_topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
           FROM orders) WHERE rnk <= 3
         ORDER BY o_orderpriority, rnk""",

    "q05_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",

    "q07_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY 1, 2""",

    "q08_case_agg" ->
      """SELECT o_orderpriority,
                CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
                CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q09_strings" ->
      """SELECT p_partkey, upper(substr(p_name, 1, 8)) AS pfx,
                p_brand || '-' || p_type AS brand_type,
                CAST(length(p_name) AS BIGINT) AS name_len,
                CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word
         FROM part ORDER BY p_partkey""",

    "q10_time_extract" ->
      """SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS d,
                CAST(hour(ts) AS BIGINT) AS hr,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q11_percentile" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 6) AS p50,
                round(quantile_cont(l_quantity, 0.9), 6) AS p90
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q12_having" ->
      """SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY o_custkey
         HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) * 2.0 FROM orders)
         ORDER BY o_custkey""",

    "q13_union" ->
      """SELECT id, CAST(count(*) AS BIGINT) AS n_sources FROM (
           SELECT DISTINCT user_id AS id FROM events
           UNION ALL
           SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id FROM customer)
         GROUP BY id ORDER BY id""",

    "q14_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "q15_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                lag(o_totalprice, 1) OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_total,
                CAST(row_number() OVER w AS BIGINT) AS order_seq
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, order_seq""",

    "q16_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
         ORDER BY c_custkey""",

    "q17_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY 1, 2""",

    "q33_interval_coverage" ->
      // identical sweep: endpoint deltas, per-position net, per-key
      // cumulative active count, gaps where active > 0; all-integer
      // epoch micros until the final rounded ratio
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                            epoch_us(ts) + 1800000000 AS e
                     FROM events),
            pts AS (SELECT user_id, s AS pos, 1 AS d FROM iv
                    UNION ALL
                    SELECT user_id, e AS pos, -1 AS d FROM iv),
            g AS (SELECT user_id, pos, CAST(sum(d) AS BIGINT) AS d
                  FROM pts GROUP BY 1, 2),
            c AS (SELECT user_id, pos,
                    sum(d) OVER (PARTITION BY user_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS act,
                    lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS nxt
                  FROM g),
            cov AS (SELECT user_id,
                      CAST(sum(CASE WHEN act > 0 THEN nxt - pos ELSE 0 END)
                        AS BIGINT) AS covered_micros
                    FROM c GROUP BY 1),
            sp AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
                          min(s) AS s0, max(e) AS e1
                   FROM iv GROUP BY 1)
         SELECT sp.user_id, n_intervals, covered_micros,
                (e1 - s0) AS span_micros,
                round(CAST(covered_micros AS DOUBLE)
                      / CAST(e1 - s0 AS DOUBLE), 6) AS utilization
         FROM sp JOIN cov ON sp.user_id = cov.user_id
         ORDER BY sp.user_id""",

    "q18_corr_subquery" ->
      """SELECT p_partkey, p_type, p_retailprice FROM (
           SELECT p_partkey, p_type, p_retailprice,
                  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                       OVER (PARTITION BY p_type) AS DOUBLE)
                    / CAST(count(*) OVER (PARTITION BY p_type) AS DOUBLE) AS avg_price
           FROM part)
         WHERE p_retailprice > avg_price ORDER BY p_partkey""",

    "q32_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc,
               CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS tax
             FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'qty' AS measure, qty AS total FROM w
         UNION ALL SELECT l_returnflag, 'price', price FROM w
         UNION ALL SELECT l_returnflag, 'disc', disc FROM w
         UNION ALL SELECT l_returnflag, 'tax', tax FROM w
         ORDER BY l_returnflag, measure""",

    "q19_pivot" ->
      """SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS d,
                CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
                CAST(SUM(CASE WHEN event_type = 'error'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
                CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
                CAST(SUM(CASE WHEN event_type = 'signup'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
                CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "q20_asof_join" ->
      """WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, c.click_id,
                epoch_us(date_trunc('second', c.ts)) // 1000000 AS click_ts_s
         FROM events e ASOF LEFT JOIN c
           ON e.user_id = c.user_id AND c.ts <= e.ts
         WHERE e.event_type = 'error' ORDER BY e.event_id""",

    "q21_range_join" ->
      """SELECT i AS bucket, CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events e JOIN (SELECT unnest(range(50)) AS i) b
           ON e.value >= i * 10.0 AND e.value < (i + 1) * 10.0
         GROUP BY 1 ORDER BY 1""",

    "q27_rolling_window" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS rolling_sum
         FROM events ORDER BY user_id, ts_us, event_id""",

    "q28_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
                CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                round(percent_rank() OVER w, 6) AS prnk,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderpriority, drnk, o_orderkey""",

    "q26_full_outer" ->
      """SELECT coalesce(e.user_id, c.cust_id) AS id,
                coalesce(e.n_events, 0) AS n_events,
                coalesce(c.c_mktsegment, 'NONE') AS segment
         FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1) e
         FULL OUTER JOIN (SELECT CAST(c_custkey AS BIGINT) AS cust_id, c_mktsegment
                          FROM customer) c
           ON e.user_id = c.cust_id
         ORDER BY id""",

    "q23_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(count(*) AS BIGINT) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))
         ORDER BY 1, 2""",

    "q22_approx_distinct" ->
      // the HLL estimate itself is engine-specific; the ORACLE-checked
      // surface is the exact distinct + count and the 5% error gate
      // pinned to literal true — Spark's estimator drifting past 5%
      // (≈5σ at rsd=0.01) breaks the hash loudly
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                CAST(count(*) AS BIGINT) AS n,
                true AS within_5pct
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q25_percentile_approx" ->
      // same pattern: exact percentiles hash-check (class P — integer
      // data, dyadic midpoints), the sketch's rank-tolerance gates
      // pin to literal true
      """SELECT l_returnflag,
                round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6)
                  AS p50_exact,
                round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6)
                  AS p90_exact,
                true AS p50_in_rank_tol,
                true AS p90_in_rank_tol
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q30_distinct_kmv" ->
      """WITH d AS (SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS h
                    FROM lineitem GROUP BY 1, 2),
            rk AS (SELECT l_returnflag, h,
                          row_number() OVER (PARTITION BY l_returnflag
                                             ORDER BY h) AS r
                   FROM d),
            sk AS (SELECT l_returnflag, count(*) AS n_sketch, max(h) AS hk
                   FROM rk WHERE r <= 256 GROUP BY 1)
         SELECT l_returnflag, CAST(n_sketch AS BIGINT) AS n_sketch,
                CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
                     ELSE round(255.0 * 1152921504606846976.0 /
                            CAST(CAST(('0x' || substr(hk, 1, 15)) AS BIGINT)
                                 AS DOUBLE), 4)
                END AS distinct_est
         FROM sk ORDER BY l_returnflag"""
  )
}
