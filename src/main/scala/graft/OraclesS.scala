package graft

/** DuckDB oracle SQL for the similarity-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesS {
  import OracleHelpers._

  private val base: Map[String, String] = Map(
    "s01_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                    FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s33_lsh_portable" ->
      // the full multi-probe LSH mechanism replayed in SQL: md5-parity
      // sign projections (the s08 matrix, j = table*6 + plane) in the
      // SAME ordered list fold as the engine's VecDot — identical IEEE
      // double, identical sign, identical signature — then bucket
      // equality per table, the RADIUS-2 probe masks (all 22 of
      // probeMasks(6, 2), popcount-major then numeric, pinned by
      // spec), candidate dedup, exact cosine, top-k with the id
      // tie-break
      """WITH tp AS (SELECT t, p, t * 6 + p AS j
                     FROM (SELECT unnest(range(4)) AS t),
                          (SELECT unnest(range(6)) AS p)),
              pr AS (SELECT vec_id, t, p,
                       list_aggregate(list_transform(range(len(embedding)), i ->
                         CAST(embedding[i + 1] AS DOUBLE) *
                         (CASE WHEN (strpos('0123456789abcdef',
                             substr(md5(CAST(i AS VARCHAR) || ':' ||
                               CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                           THEN 1 ELSE -1 END)), 'sum') AS proj
                     FROM embeddings CROSS JOIN tp),
              sig AS (SELECT vec_id, t,
                        CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END)
                          AS BIGINT) AS sg
                      FROM pr GROUP BY 1, 2),
              qp AS (SELECT s.vec_id AS qid, s.t, xor(s.sg, m.m) AS sg
                     FROM sig s, (SELECT unnest([0, 1, 2, 4, 8, 16, 32,
                            3, 5, 6, 9, 10, 12, 17, 18, 20, 24,
                            33, 34, 36, 40, 48]) AS m) m
                     WHERE s.vec_id < 5),
              cand AS (SELECT DISTINCT qp.qid, c.vec_id AS cid
                       FROM qp JOIN sig c ON c.t = qp.t AND c.sg = qp.sg),
              q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT cand.qid, cand.cid,
                           CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM cand
                    JOIN q ON q.qid = cand.qid
                    JOIN c ON c.cid = cand.cid),
              s2 AS (SELECT qid, cid,
                            sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                     FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                    FROM s2)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s34_cosine_pairs_portable" ->
      // the s33 signature machinery driving PAIR mining: same
      // md5-parity ordered-fold projections and (table, signature)
      // buckets, self-joined id1 < id2 (no probe expansion — pair
      // mining meets in the exact bucket), degenerate buckets over
      // 10k dropped via the windowed count (the maxBucket cap),
      // candidates deduped, exact cosine at 0.45
      """WITH tp AS (SELECT t, p, t * 6 + p AS j
                     FROM (SELECT unnest(range(4)) AS t),
                          (SELECT unnest(range(6)) AS p)),
              pr AS (SELECT vec_id, t, p,
                       list_aggregate(list_transform(range(len(embedding)), i ->
                         CAST(embedding[i + 1] AS DOUBLE) *
                         (CASE WHEN (strpos('0123456789abcdef',
                             substr(md5(CAST(i AS VARCHAR) || ':' ||
                               CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                           THEN 1 ELSE -1 END)), 'sum') AS proj
                     FROM embeddings CROSS JOIN tp),
              sig0 AS (SELECT vec_id, t,
                        CAST(sum(CASE WHEN proj >= 0 THEN 1 << p ELSE 0 END)
                          AS BIGINT) AS sg
                      FROM pr GROUP BY 1, 2),
              sig AS (SELECT vec_id, t, sg FROM sig0
                      QUALIFY count(*) OVER (PARTITION BY t, sg) <= 10000),
              cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
                       FROM sig a JOIN sig b
                         ON a.t = b.t AND a.sg = b.sg AND a.vec_id < b.vec_id),
              c1 AS (SELECT vec_id AS id1, embedding AS e1 FROM embeddings),
              c2 AS (SELECT vec_id AS id2, embedding AS e2 FROM embeddings),
              u AS (SELECT cand.id1, cand.id2,
                           CAST(unnest(e1) AS DOUBLE) AS x,
                           CAST(unnest(e2) AS DOUBLE) AS y
                    FROM cand JOIN c1 USING (id1) JOIN c2 USING (id2)),
              s2 AS (SELECT id1, id2,
                            sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                     FROM u GROUP BY 1, 2)
         SELECT id1, id2, round(cos, 6) AS cos
         FROM s2 WHERE cos >= 0.45 ORDER BY id1, id2""",

    "s19_mmr_rerank" -> mmrOracle(k = 5, prefetch = 20, lam = 0.7),

    "s18_postfiltered_ann" ->
      // unfiltered top-20, label=1 survivors re-ranked to 10 — the
      // post-filter strategy's exact answer, short lists included
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
                    FROM s),
              f AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY rnk) AS BIGINT) AS rnk2
                    FROM r
                    JOIN (SELECT vec_id FROM embeddings WHERE label = 1) lf
                      ON lf.vec_id = r.cid
                    WHERE rnk <= 20)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos,
                rnk2 AS rank
         FROM f WHERE rnk2 <= 10 ORDER BY query_id, rank""",

    "s17_filtered_ann" ->
      // s01's brute spec restricted to the label=1 survivors — the
      // pre-filter strategy's exact answer
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE label = 1),
              u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                           CAST(unnest(qe) AS DOUBLE) AS y
                    FROM (SELECT qid, cid, qe, ce FROM q, c)),
              s AS (SELECT qid, cid,
                           sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                    FROM u GROUP BY 1, 2),
              r AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                      PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                    FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s21_top_pc" -> s21Oracle,

    "s22_pc_project" -> s22Oracle,

    "s24_pca_topk" -> s24Oracle,

    "s25_pc_whiten" -> s25Oracle,

    "s20_int8_ann" ->
      // both sides re-quantized with s07's floor codes; the three
      // sums are exact integer arithmetic (order-insensitive), so the
      // quantized cosine reproduces Spark's bit-for-bit
      """WITH e AS (SELECT vec_id, embedding,
                      list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                    FROM embeddings),
            cd AS (SELECT vec_id AS id,
                     CASE WHEN scale = 0
                          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                          ELSE list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) / scale) AS BIGINT))
                     END AS codes
                   FROM e),
            u AS (SELECT q.id AS qid, c.id AS cid,
                         unnest(q.codes) AS qx, unnest(c.codes) AS cx
                  FROM cd c, (SELECT * FROM cd WHERE id < 5) q),
            s AS (SELECT qid, cid,
                         CAST(sum(qx*cx) AS BIGINT) AS dot,
                         CAST(sum(cx*cx) AS BIGINT) AS cn2,
                         CAST(sum(qx*qx) AS BIGINT) AS qn2
                  FROM u GROUP BY 1, 2),
            r AS (SELECT qid, cid,
                         round(CAST(dot AS DOUBLE) /
                           (sqrt(CAST(cn2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))), 6)
                           AS qcos
                  FROM s WHERE cn2 > 0 AND qn2 > 0),
            k AS (SELECT qid, cid, qcos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY qcos DESC, cid) AS BIGINT) AS rnk
                  FROM r)
         SELECT qid AS query_id, cid AS neighbor_id, qcos, rnk AS rank
         FROM k WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s07_quantize_int8" ->
      """WITH e AS (SELECT vec_id, embedding,
                      list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                    FROM embeddings),
              u AS (SELECT vec_id, scale, unnest(embedding) AS x,
                           unnest(range(len(embedding))) AS pos FROM e)
         SELECT vec_id, CAST(pos AS BIGINT) AS pos,
                CASE WHEN scale = 0 THEN 0
                     ELSE CAST(floor(CAST(x AS DOUBLE) / scale) AS BIGINT) END AS code,
                scale
         FROM u ORDER BY vec_id, pos""",

    "s04_centroids" ->
      """SELECT label, CAST(pos AS BIGINT) AS pos,
                round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS c
         FROM (SELECT label, unnest(embedding) AS x,
                      unnest(range(len(embedding))) AS pos
               FROM embeddings)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "s23_centroid_sim" ->
      """WITH ce AS (SELECT label, pos,
               round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS c
             FROM (SELECT label, unnest(embedding) AS x,
                          unnest(range(len(embedding))) AS pos
                   FROM embeddings)
             GROUP BY 1, 2),
            nm AS (SELECT label,
                     CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                   FROM ce GROUP BY 1),
            dt AS (SELECT a.label AS label1, b.label AS label2,
                     CAST(sum(CAST(round(a.c * b.c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS dot
                   FROM ce a JOIN ce b ON b.pos = a.pos AND a.label < b.label
                   GROUP BY 1, 2)
         SELECT label1, label2,
                round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos
         FROM dt JOIN nm na ON na.label = dt.label1
                 JOIN nm nb ON nb.label = dt.label2
         WHERE na.n2 > 0 AND nb.n2 > 0
         ORDER BY label1, label2""",

    "s29_kmeans_train" -> s29Oracle(k = 8, iters = 3, dims = 64),

    "s43_ivf_balance" -> s43Oracle(k = 8, iters = 3, dims = 64),

    "s36_silhouette" -> s36Oracle(k = 8, iters = 3, dims = 64),

    "s30_kmeans_prune" ->
      s30Oracle(k = 8, iters = 3, dims = 64, pruneNum = 3, pruneDen = 10),

    "s32_ivf_exact" ->
      s32Oracle(k = 8, iters = 3, dims = 64, nprobe = 2, topK = 10,
        queryMax = 5L),

    "s44_store_adc" ->
      s44Oracle(k = 8, iters = 3, dims = 64, m = 8, cbMax = 16L,
        nprobe = 2, topK = 10, queryMax = 5L),

    "s31_centroid_drift" ->
      // two s04 centroid chains (even/odd snapshot split), the s23
      // round-6/DECIMAL dot, counts per side
      """WITH eo AS (SELECT label, unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS pos
                     FROM embeddings WHERE vec_id % 2 = 0),
            en AS (SELECT label, unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS pos
                   FROM embeddings WHERE vec_id % 2 = 1),
            co AS (SELECT label, pos,
                     round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE), 6) AS c
                   FROM eo GROUP BY 1, 2),
            cn AS (SELECT label, pos,
                     round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE), 6) AS c
                   FROM en GROUP BY 1, 2),
            n2o AS (SELECT label,
                      CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                    FROM co GROUP BY 1 HAVING n2 > 0),
            n2n AS (SELECT label,
                      CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS n2
                    FROM cn GROUP BY 1 HAVING n2 > 0),
            no AS (SELECT label, CAST(count(*) AS BIGINT) AS n_old
                   FROM embeddings WHERE vec_id % 2 = 0 GROUP BY 1),
            nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n_new
                   FROM embeddings WHERE vec_id % 2 = 1 GROUP BY 1),
            dt AS (SELECT co.label,
                     CAST(sum(CAST(round(co.c * cn.c, 6) AS DECIMAL(24,8))) AS DOUBLE)
                       AS dot
                   FROM co JOIN cn ON cn.label = co.label AND cn.pos = co.pos
                   GROUP BY 1)
         SELECT dt.label, no.n_old, nn.n_new,
                round(dot / (sqrt(n2o.n2) * sqrt(n2n.n2)), 6) AS cos_drift,
                round(sqrt(n2n.n2) / sqrt(n2o.n2), 6) AS norm_ratio
         FROM dt JOIN n2o ON n2o.label = dt.label
                 JOIN n2n ON n2n.label = dt.label
                 JOIN no ON no.label = dt.label
                 JOIN nn ON nn.label = dt.label
         ORDER BY dt.label""",

    "s28_proto_prune" ->
      // the s04 centroid chain rounded 6, per-term round-6 products
      // DECIMAL-folded (the s23 discipline), rank/count windows, and
      // the exact-integer prune cut n*3//10
      """WITH ce AS (SELECT label, CAST(pos AS BIGINT) AS pos,
               round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS c
             FROM (SELECT label, unnest(embedding) AS x,
                          unnest(range(len(embedding))) AS pos
                   FROM embeddings)
             GROUP BY 1, 2),
            cn AS (SELECT label,
                     CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS cn2
                   FROM ce GROUP BY 1),
            nv AS (SELECT vec_id, sqrt(list_aggregate(
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     'sum')) AS vn
                   FROM embeddings),
            dt AS (SELECT e.vec_id, e.label,
                     CAST(sum(CAST(round(ce.c * CAST(e.x AS DOUBLE), 6)
                       AS DECIMAL(24,8))) AS DOUBLE) AS dot
                   FROM (SELECT vec_id, label, unnest(embedding) AS x,
                                unnest(range(len(embedding))) AS pos
                         FROM embeddings) e
                   JOIN ce ON ce.label = e.label AND ce.pos = e.pos
                   GROUP BY 1, 2),
            sc AS (SELECT dt.vec_id, dt.label,
                     round(dot / (sqrt(cn.cn2) * nv.vn), 6) AS proto_score
                   FROM dt JOIN cn ON cn.label = dt.label AND cn.cn2 > 0
                           JOIN nv ON nv.vec_id = dt.vec_id AND nv.vn > 0),
            rk AS (SELECT *,
                     CAST(row_number() OVER (PARTITION BY label
                       ORDER BY proto_score DESC, vec_id) AS BIGINT) AS rank_in_label,
                     CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS n_label
                   FROM sc)
         SELECT vec_id, label, proto_score, rank_in_label, n_label,
                rank_in_label > n_label * 3 // 10 AS kept
         FROM rk ORDER BY label, rank_in_label""",

    "s05_vec_norm" ->
      """SELECT vec_id, round(sqrt(list_aggregate(
                list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                'sum')), 6) AS l2
         FROM embeddings ORDER BY vec_id""",

    "s14_hamming_topk" ->
      """WITH pj AS (SELECT vec_id, j,
                round(list_aggregate(list_transform(range(len(embedding)),
                  i -> CAST(embedding[i + 1] AS DOUBLE) *
                       (CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(CAST(i AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                         THEN 1 ELSE -1 END)), 'sum'), 6) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(16)) AS j)),
            code AS (SELECT vec_id,
                       sum(CASE WHEN proj > 0
                           THEN CAST(power(2, 15 - j) AS BIGINT) ELSE 0 END) AS code
                     FROM pj GROUP BY 1),
            qc AS (SELECT vec_id AS qid, code AS qcode FROM code WHERE vec_id < 10),
            hm AS (SELECT qid, c.vec_id AS cid, bit_count(xor(c.code, qcode)) AS ham
                   FROM code c CROSS JOIN qc),
            sl AS (SELECT qid, cid, ham FROM (
                     SELECT qid, cid, ham, row_number() OVER (
                       PARTITION BY qid ORDER BY ham, cid) AS srnk FROM hm)
                   WHERE srnk <= 50),
            u AS (SELECT qid, cid, ham, CAST(unnest(ce.embedding) AS DOUBLE) AS x,
                         CAST(unnest(qe.embedding) AS DOUBLE) AS y
                  FROM sl JOIN embeddings ce ON ce.vec_id = sl.cid
                          JOIN embeddings qe ON qe.vec_id = sl.qid),
            s AS (SELECT qid, cid, ham,
                         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                  FROM u GROUP BY 1, 2, 3),
            r AS (SELECT qid, cid, ham, cos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                  FROM s)
         SELECT qid AS query_id, cid AS neighbor_id, CAST(ham AS BIGINT) AS hamming,
                round(cos, 6) AS cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s15_matryoshka" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                    WHERE vec_id < 10),
            c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
            pu AS (SELECT qid, cid, CAST(unnest(ce[1:16]) AS DOUBLE) AS x,
                          CAST(unnest(qe[1:16]) AS DOUBLE) AS y
                   FROM (SELECT qid, cid, qe, ce FROM q, c)),
            ps AS (SELECT qid, cid,
                          round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                            AS pcos
                   FROM pu GROUP BY 1, 2),
            sl AS (SELECT qid, cid, pcos FROM (
                     SELECT qid, cid, pcos, row_number() OVER (
                       PARTITION BY qid ORDER BY pcos DESC, cid) AS srnk FROM ps)
                   WHERE srnk <= 50),
            fu AS (SELECT qid, cid, pcos, CAST(unnest(ce.embedding) AS DOUBLE) AS x,
                          CAST(unnest(qe.embedding) AS DOUBLE) AS y
                   FROM sl JOIN embeddings ce ON ce.vec_id = sl.cid
                           JOIN embeddings qe ON qe.vec_id = sl.qid),
            fs AS (SELECT qid, cid, pcos,
                          round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                            AS cos
                   FROM fu GROUP BY 1, 2, 3),
            r AS (SELECT qid, cid, pcos, cos, CAST(row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                  FROM fs)
         SELECT qid AS query_id, cid AS neighbor_id, pcos AS prefix_cos,
                cos, rnk AS rank
         FROM r WHERE rnk <= 10 ORDER BY query_id, rank""",

    "s08_random_projection" ->
      """WITH sj AS (SELECT vec_id, j, embedding FROM embeddings
                     CROSS JOIN (SELECT unnest(range(16)) AS j))
         SELECT vec_id, CAST(j AS BIGINT) AS j,
                round(list_aggregate(list_transform(range(len(embedding)),
                  i -> CAST(embedding[i + 1] AS DOUBLE) *
                       (CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(CAST(i AS VARCHAR) || ':' ||
                             CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                         THEN 1 ELSE -1 END)), 'sum'), 6) AS proj
         FROM sj ORDER BY vec_id, j""",

    "s37_pq_error" ->
      // the s10 assignment chain verbatim, then the true squared
      // error to the assigned codeword: terms in pinned i-order
      // (list_aggregate folds sequentially, matching Spark's
      // left-assoc reduce), quantized to DECIMAL before the mean
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              sj AS (SELECT vec_id, ev, code, cv, j FROM e
                     CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              d AS (SELECT vec_id, j, code, ev, cv,
                      round(list_aggregate(list_transform(range(8), i ->
                          CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                        - 2 * list_aggregate(list_transform(range(8), i ->
                          CAST(ev[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                        6) AS dist
                    FROM sj),
              r AS (SELECT vec_id, j, code, ev, cv, row_number() OVER (
                      PARTITION BY vec_id, j ORDER BY dist, code) AS rn FROM d),
              se AS (SELECT j AS sub,
                       CAST(round(list_aggregate(list_transform(range(8), i ->
                           (CAST(ev[j*8 + i + 1] AS DOUBLE)
                              - CAST(cv[j*8 + i + 1] AS DOUBLE))
                           * (CAST(ev[j*8 + i + 1] AS DOUBLE)
                              - CAST(cv[j*8 + i + 1] AS DOUBLE))), 'sum'), 6)
                         AS DECIMAL(24,8)) AS sev
                     FROM r WHERE rn = 1)
         SELECT CAST(sub AS BIGINT) AS sub,
                CAST(count(*) AS BIGINT) AS n_vectors,
                round(CAST(sum(sev) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS mse
         FROM se GROUP BY 1 ORDER BY sub""",

    "s10_pq" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              sj AS (SELECT vec_id, ev, code, cv, j FROM e
                     CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              d AS (SELECT vec_id, j, code,
                      round(list_aggregate(list_transform(range(8), i ->
                          CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                        - 2 * list_aggregate(list_transform(range(8), i ->
                          CAST(ev[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                        6) AS dist
                    FROM sj),
              r AS (SELECT vec_id, j, code, row_number() OVER (
                      PARTITION BY vec_id, j ORDER BY dist, code) AS rn FROM d)
         SELECT vec_id, CAST(j AS BIGINT) AS sub, code
         FROM r WHERE rn = 1 ORDER BY vec_id, sub""",

    "s11_pq_adc" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings WHERE vec_id < 16),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              sj AS (SELECT vec_id, ev, code, cv, j FROM e
                     CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              dmat AS (SELECT vec_id, j, code,
                         round(list_aggregate(list_transform(range(8), i ->
                             CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                           - 2 * list_aggregate(list_transform(range(8), i ->
                             CAST(ev[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                           6) AS dist
                       FROM sj),
              codes AS (SELECT vec_id, j, code FROM (
                          SELECT vec_id, j, code, row_number() OVER (
                            PARTITION BY vec_id, j ORDER BY dist, code) AS rn FROM dmat)
                        WHERE rn = 1),
              q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
              dt AS (SELECT qid, j, code,
                       round(list_aggregate(list_transform(range(8), i ->
                           CAST(cv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum')
                         - 2 * list_aggregate(list_transform(range(8), i ->
                           CAST(qv[j*8 + i + 1] AS DOUBLE) * CAST(cv[j*8 + i + 1] AS DOUBLE)), 'sum'),
                         6) AS dist
                     FROM q CROSS JOIN cb CROSS JOIN (SELECT unnest(range(8)) AS j)),
              s AS (SELECT dt.qid, c.vec_id AS nid,
                           round(CAST(sum(CAST(dt.dist AS DECIMAL(24,8))) AS DOUBLE), 6) AS adc_dist
                    FROM codes c JOIN dt ON dt.j = c.j AND dt.code = c.code
                    GROUP BY 1, 2),
              r2 AS (SELECT qid, nid, adc_dist, CAST(row_number() OVER (
                       PARTITION BY qid ORDER BY adc_dist, nid) AS BIGINT) AS rank FROM s)
         SELECT qid AS query_id, nid AS neighbor_id, adc_dist, rank
         FROM r2 WHERE rank <= 10 ORDER BY query_id, rank""",

    "s09_semdedup" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
              e AS (SELECT vec_id, embedding AS ev FROM embeddings),
              u AS (SELECT vec_id, cid, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS ne, sqrt(sum(y*y)) AS nc
                    FROM (SELECT vec_id, cid, CAST(unnest(ev) AS DOUBLE) AS x,
                                 CAST(unnest(ce) AS DOUBLE) AS y FROM e, c)
                    GROUP BY 1, 2),
              a AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                      ORDER BY round(dot/(ne*nc), 6) DESC, cid) AS rn FROM u),
              asg AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
              pe AS (SELECT a1.vec_id AS id1, a2.vec_id AS id2, e1.ev AS v1, e2.ev AS v2
                     FROM asg a1 JOIN asg a2
                       ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
                     JOIN e e1 ON e1.vec_id = a1.vec_id
                     JOIN e e2 ON e2.vec_id = a2.vec_id),
              pu AS (SELECT id1, id2, sum(x*y) AS dot,
                            sqrt(sum(x*x)) AS n1, sqrt(sum(y*y)) AS n2
                     FROM (SELECT id1, id2, CAST(unnest(v1) AS DOUBLE) AS x,
                                  CAST(unnest(v2) AS DOUBLE) AS y FROM pe)
                     GROUP BY 1, 2),
              dups AS (SELECT DISTINCT id2 FROM pu WHERE dot/(n1*n2) >= 0.35)
         SELECT asg.vec_id, asg.cluster FROM asg
         LEFT JOIN dups ON asg.vec_id = dups.id2
         WHERE dups.id2 IS NULL ORDER BY vec_id""",

    "s38_knn_classify" ->
      // same rounded-6dp cosine, (cos DESC, sid) neighbor rank, and
      // (votes DESC, label) vote argmax as the op
      """WITH sd AS (SELECT vec_id AS sid, embedding,
                       CAST(label AS BIGINT) AS sl
                     FROM embeddings WHERE vec_id < 200),
            q AS (SELECT vec_id AS qid, embedding,
                    CAST(label AS BIGINT) AS tl
                  FROM embeddings WHERE vec_id >= 200 AND vec_id < 400),
            u AS (SELECT qid, sid, sl, CAST(unnest(qe) AS DOUBLE) AS x,
                         CAST(unnest(se) AS DOUBLE) AS y
                  FROM (SELECT q.qid, sd.sid, sd.sl, q.embedding AS qe,
                               sd.embedding AS se
                        FROM q, sd WHERE q.qid <> sd.sid)),
            s AS (SELECT qid, sid, sl,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2, 3),
            r AS (SELECT qid, sl, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, sid) AS rk
                  FROM s),
            v AS (SELECT qid, sl, CAST(count(*) AS BIGINT) AS votes
                  FROM r WHERE rk <= 5 GROUP BY 1, 2),
            p AS (SELECT qid, sl, votes, row_number() OVER (
                    PARTITION BY qid ORDER BY votes DESC, sl) AS vr
                  FROM v)
         SELECT p.qid AS vec_id, p.sl AS pred_label, p.votes AS votes,
                (p.sl = q.tl) AS is_correct
         FROM p JOIN q ON q.qid = p.qid WHERE vr = 1 ORDER BY vec_id""",

    "s16_knn_graph" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            u AS (SELECT src, dst, CAST(unnest(se) AS DOUBLE) AS x,
                         CAST(unnest(de) AS DOUBLE) AS y
                  FROM (SELECT a.vec_id AS src, b.vec_id AS dst,
                               a.embedding AS se, b.embedding AS de
                        FROM v a, v b WHERE a.vec_id <> b.vec_id)),
            s AS (SELECT src, dst,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2),
            r AS (SELECT src, dst, cos, CAST(row_number() OVER (
                    PARTITION BY src ORDER BY cos DESC, dst) AS BIGINT) AS rank
                  FROM s)
         SELECT src, dst, cos, rank FROM r WHERE rank <= 5
         ORDER BY src, rank"""
  )

  /** s35: the recall@10 gate composed from the two rungs it compares —
    * the EXACT brute-force chain and the portable multi-probe LSH
    * chain run as CTEs verbatim, then one join counts per-query hits.
    * Denominator is the exact side's row count at k.
    */
  /** r17 seeded-ANN gate oracle (the q22/q25 pinned-boolean pattern):
    * the seeded ranking is not SQL-expressible, so the oracle carries
    * the oracle-expressible half — per-query exact-neighbor counts
    * from the brute-force CTE — and pins the recall gate to LITERAL
    * true; the Spark side computes the gate from the live ranking, so
    * any estimator drift past the margin breaks the hash loudly.
    */
  private def annGateSql(nCol: String, gateCol: String): String =
    s"""WITH ex AS (${base("s01_ann_brute")})
       SELECT query_id, CAST(count(*) AS BIGINT) AS $nCol,
              TRUE AS $gateCol
       FROM ex GROUP BY query_id ORDER BY query_id"""

  val sql: Map[String, String] = base ++ Map(
    "s02_ann_lsh" -> annGateSql("n_exact", "recall_ge_080"),
    "s03_ann_ivf" -> annGateSql("n_exact", "recall_ge_090"),
    "s12_ivf_pq" -> annGateSql("n_exact", "recall_ge_080"),
    "s13_ivf_pq_residual" -> annGateSql("n_exact", "recall_ge_050"),
    "s26_ann_index" -> annGateSql("n_served", "store_equals_e2e"),

    "s06_cosine_pairs_lsh" ->
      // coverage gate over the bounded audit slice: the exact pair
      // set is d05's quadratic chain verbatim (vec_id < 1000), the
      // LSH found-share >= 0.40 gate pins to literal true
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
              p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                           a.embedding AS ea, b.embedding AS eb
                    FROM e a JOIN e b ON a.vec_id < b.vec_id),
              u AS (SELECT id1, id2, CAST(unnest(ea) AS DOUBLE) AS x,
                           CAST(unnest(eb) AS DOUBLE) AS y FROM p),
              s AS (SELECT id1, id2, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                    FROM u GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_exact_slice,
                TRUE AS coverage_ge_040
         FROM s WHERE dot / (na * nb) >= 0.45""",

    "s39_recall_curve" ->
      // the same chains, expanded over k = {1, 5, 10} via a k axis;
      // micro = pooled hits/exact, macro = mean of per-query recalls
      // quantized to DECIMAL(18,6) first (the op's fold)
      s"""WITH ex0 AS (${base("s01_ann_brute")}),
            ap0 AS (${base("s33_lsh_portable")}),
            kk AS (SELECT unnest([1, 5, 10]) AS k),
            exk AS (SELECT kk.k, e.query_id, e.neighbor_id
                    FROM ex0 e JOIN kk ON e.rank <= kk.k),
            apk AS (SELECT DISTINCT kk.k, a.query_id, a.neighbor_id
                    FROM ap0 a JOIN kk ON a.rank <= kk.k),
            exn AS (SELECT k, query_id, CAST(count(*) AS BIGINT) AS n_exact
                    FROM exk GROUP BY 1, 2),
            hits AS (SELECT e.k, e.query_id,
                       CAST(count(*) AS BIGINT) AS n_hits
                     FROM exk e JOIN apk a ON a.k = e.k
                       AND a.query_id = e.query_id
                       AND a.neighbor_id = e.neighbor_id
                     GROUP BY 1, 2),
            r AS (SELECT x.k, x.query_id, x.n_exact,
                    coalesce(h.n_hits, 0) AS n_hits,
                    round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
                      / CAST(x.n_exact AS DOUBLE), 6) AS recall
                  FROM exn x LEFT JOIN hits h
                    ON h.k = x.k AND h.query_id = x.query_id)
         SELECT CAST(k AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n_queries,
                CAST(sum(n_exact) AS BIGINT) AS total_exact,
                CAST(sum(n_hits) AS BIGINT) AS total_hits,
                round(CAST(sum(n_hits) AS DOUBLE)
                  / CAST(sum(n_exact) AS DOUBLE), 6) AS micro_recall,
                round(CAST(sum(CAST(recall AS DECIMAL(18,6))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS macro_recall
         FROM r GROUP BY 1 ORDER BY k""",

    "s41_knn_homophily" ->
      // the s16 graph chain verbatim + label joins, exact counts,
      // pinned share/chance divisions
      """WITH v AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS l
                    FROM embeddings WHERE vec_id < 200),
            u AS (SELECT src, dst, CAST(unnest(se) AS DOUBLE) AS x,
                         CAST(unnest(de) AS DOUBLE) AS y
                  FROM (SELECT a.vec_id AS src, b.vec_id AS dst,
                               a.embedding AS se, b.embedding AS de
                        FROM v a, v b WHERE a.vec_id <> b.vec_id)),
            s AS (SELECT src, dst,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2),
            r AS (SELECT src, dst, CAST(row_number() OVER (
                    PARTITION BY src ORDER BY cos DESC, dst) AS BIGINT) AS rank
                  FROM s),
            e AS (SELECT a.l AS label, (a.l = b.l) AS same
                  FROM r JOIN v a ON a.vec_id = r.src
                         JOIN v b ON b.vec_id = r.dst
                  WHERE r.rank <= 5),
            sz AS (SELECT l AS label, CAST(count(*) AS BIGINT) AS n_nodes
                   FROM v GROUP BY 1),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM v),
            g AS (SELECT label, CAST(count(*) AS BIGINT) AS n_edges,
                    CAST(sum(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_same
                  FROM e GROUP BY 1)
         SELECT g.label, sz.n_nodes, g.n_edges, g.n_same,
                round(CAST(n_same AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
                  AS same_share,
                round((CAST(n_same AS DOUBLE) / CAST(n_edges AS DOUBLE))
                  / (CAST(sz.n_nodes - 1 AS DOUBLE)
                     / CAST(nt.nn - 1 AS DOUBLE)), 6) AS lift
         FROM g JOIN sz ON sz.label = g.label CROSS JOIN nt
         ORDER BY g.label""",

    "s40_dim_profile" ->
      // same DECIMAL(28,12)-quantized x/x² folds, q43 parenthesization,
      // and the bit-shared 1e-6 dead threshold
      """WITH u AS (SELECT CAST(pos AS BIGINT) AS pos, CAST(x AS DOUBLE) AS x
                    FROM (SELECT unnest(embedding) AS x,
                                 unnest(range(len(embedding))) AS pos
                          FROM embeddings)),
            g AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                    CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
                    min(x) AS mn, max(x) AS mx
                  FROM u GROUP BY 1)
         SELECT pos, n,
                round(sx / CAST(n AS DOUBLE), 6) AS mean,
                round((sxx - sx * sx / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE), 6) AS variance,
                round(mn, 6) AS min_x, round(mx, 6) AS max_x,
                ((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                  <= 0.000001) AS is_dead
         FROM g ORDER BY pos""",

    "s42_mrr" ->
      // exact top-1 into the portable ranking, same 1/rank chain
      s"""WITH ex AS (${base("s01_ann_brute")}),
            ap AS (${base("s33_lsh_portable")}),
            e1 AS (SELECT query_id, neighbor_id FROM ex WHERE rank = 1),
            j AS (SELECT e1.query_id,
                    min(CAST(ap.rank AS BIGINT)) AS rank_of_true
                  FROM e1 LEFT JOIN ap
                    ON ap.query_id = e1.query_id
                   AND ap.neighbor_id = e1.neighbor_id
                  GROUP BY 1)
         SELECT query_id, rank_of_true,
                coalesce(round(1.0 / CAST(rank_of_true AS DOUBLE), 6), 0.0)
                  AS reciprocal_rank
         FROM j ORDER BY query_id""",

    "s35_recall_eval" ->
      s"""WITH ex AS (${base("s01_ann_brute")}),
            ap AS (SELECT DISTINCT query_id, neighbor_id
                   FROM (${base("s33_lsh_portable")})),
            exn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
                    FROM ex GROUP BY 1),
            hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
                     FROM ex e JOIN ap a ON a.query_id = e.query_id
                                        AND a.neighbor_id = e.neighbor_id
                     GROUP BY 1)
         SELECT x.query_id, x.n_exact, coalesce(h.n_hits, 0) AS n_hits,
                round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
                  / CAST(x.n_exact AS DOUBLE), 6) AS recall
         FROM exn x LEFT JOIN hits h ON h.query_id = x.query_id
         ORDER BY x.query_id"""
  )
}
