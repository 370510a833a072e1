package graft

/** DuckDB oracle SQL for the dedup-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesD {
  import OracleHelpers._

  private val base: Map[String, String] = Map(
    "d12_simhash_portable" -> d12Oracle,

    "d07_keep_best" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      s""",
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         q AS ($qualitySubSql),
         lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, q.quality
                 FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                 LEFT JOIN comp c ON c.id = d.doc_id
                 JOIN q ON q.doc_id = d.doc_id)
         SELECT doc_id, component, quality FROM (
           SELECT doc_id, component, quality,
                  row_number() OVER (PARTITION BY component
                    ORDER BY quality DESC, doc_id) AS rk
           FROM lab) WHERE rk = 1
         ORDER BY doc_id"""),

    "d21_semantic_decontaminate" ->
      """WITH q AS (SELECT vec_id AS eid, embedding AS qe FROM embeddings
                    WHERE vec_id < 20),
            c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                  WHERE vec_id >= 20),
            u AS (SELECT cid, eid, CAST(unnest(ce) AS DOUBLE) AS x,
                         CAST(unnest(qe) AS DOUBLE) AS y
                  FROM (SELECT cid, eid, ce, qe FROM c, q)),
            s AS (SELECT cid, eid,
                         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6)
                           AS cos
                  FROM u GROUP BY 1, 2),
            best AS (SELECT cid, eid, cos FROM (
                       SELECT cid, eid, cos, row_number() OVER (
                         PARTITION BY cid ORDER BY cos DESC, eid) AS rn FROM s)
                     WHERE rn = 1)
         SELECT cid AS vec_id, eid AS eval_id, cos FROM best
         WHERE cos >= 0.35 ORDER BY vec_id""",

    "d08_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            hit AS (SELECT a.doc_id AS tid, b.doc_id AS bid, count(*) AS ov
                    FROM sh a JOIN sh b ON a.shingle = b.shingle
                    WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
                    GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT tid AS doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
                CAST(max(ov) AS BIGINT) AS max_overlap
         FROM hit GROUP BY 1 ORDER BY 1""",

    "d22_source_overlap" ->
      """WITH t AS (SELECT source, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT source,
                     md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS h
                   FROM (SELECT source, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            bk AS (SELECT source, h FROM (
                     SELECT source, h,
                            row_number() OVER (PARTITION BY source ORDER BY h) AS r
                     FROM sh) WHERE r <= 128),
            srcs AS (SELECT DISTINCT source FROM bk),
            m AS (SELECT least(bk.source, s.source) AS s1,
                         greatest(bk.source, s.source) AS s2, bk.h,
                         max(bk.source < s.source) AS in1,
                         max(bk.source > s.source) AS in2
                  FROM bk, srcs s WHERE bk.source <> s.source
                  GROUP BY 1, 2, 3),
            rk AS (SELECT s1, s2, in1, in2,
                          row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS r
                   FROM m)
         SELECT s1, s2, CAST(count(*) AS BIGINT) AS k_eff,
                CAST(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_common,
                round(sum(CASE WHEN in1 AND in2 THEN 1 ELSE 0 END)::DOUBLE
                      / count(*), 6) AS jaccard_est
         FROM rk WHERE r <= 128 GROUP BY 1, 2 ORDER BY 1, 2""",

    "d09_blocklist" ->
      """SELECT doc_id, source FROM documents
         WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 97 = 0)
         ORDER BY doc_id""",

    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
         FROM documents GROUP BY text ORDER BY keep_id""",

    "d29_normalized_dedup" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
         FROM documents
         GROUP BY trim(regexp_replace(regexp_replace(
           lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g'))
         ORDER BY keep_id""",

    "d30_edit_verify" ->
      // the d11 candidate chain verbatim; verify = levenshtein over
      // substr(text, 1, 256) with the max(len, 1) guard
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
            cl AS (SELECT doc_id, substr(text, 1, 256) AS t FROM documents
                   WHERE doc_id < 500),
            v AS (SELECT c.id1, c.id2,
                    CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev,
                    round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
                      / CAST(greatest(length(a.t), length(b.t), 1) AS DOUBLE), 6)
                      AS edit_sim
                  FROM cand c JOIN cl a ON a.doc_id = c.id1
                              JOIN cl b ON b.doc_id = c.id2)
         SELECT id1, id2, lev, edit_sim FROM v
         WHERE edit_sim >= 0.5 ORDER BY id1, id2""",

    "d11_minhash_portable" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.id1, c.id2, count(*) AS n
                      FROM cand c
                      JOIN sh a ON a.doc_id = c.id1
                      JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
                      GROUP BY 1, 2)
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2""",

    "d24_allpairs_exact" ->
      // brute-force quadratic oracle: every doc pair sharing >= 1
      // word token, exact jaccard on distinct-token sets — the
      // algorithm-free spec the prefix-filtered join must reproduce
      """WITH t AS (SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents WHERE doc_id < 500)),
            sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY 1),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n
                      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2""",

    "d04_ngram_jaccard" -> (ngramShingleCte +
      """
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY id1, id2"""),

    "d38_lsh_plan" -> (ngramShingleCte +
      // S-curve planner: powers as LEFT-ASSOCIATIVE repeated
      // multiplication (the operator's pinned IEEE chain — no libm
      // pow), tau cut on scaled integers, round-6 terms DECIMAL-folded
      """,
         pj AS (SELECT CAST(n AS DOUBLE)
                         / CAST(s1.sz + s2.sz - n AS DOUBLE) AS s,
                       n * 2 >= (s1.sz + s2.sz - n) * 1 AS istrue
                FROM inter JOIN sz s1 ON s1.doc_id = id1
                           JOIN sz s2 ON s2.doc_id = id2),
         br(bands, rows_per_band) AS (VALUES (8, 1), (4, 2), (2, 4), (1, 8)),
         pq AS (SELECT bands, rows_per_band, istrue,
                  1.0 - CASE rows_per_band
                          WHEN 1 THEN s
                          WHEN 2 THEN s*s
                          WHEN 4 THEN s*s*s*s
                          WHEN 8 THEN s*s*s*s*s*s*s*s END AS q
                FROM pj CROSS JOIN br),
         pp AS (SELECT bands, rows_per_band, istrue,
                  round(1.0 - CASE bands
                                WHEN 1 THEN q
                                WHEN 2 THEN q*q
                                WHEN 4 THEN q*q*q*q
                                WHEN 8 THEN q*q*q*q*q*q*q*q END, 6) AS p6
                FROM pq)
         SELECT CAST(bands AS BIGINT) AS bands,
                CAST(rows_per_band AS BIGINT) AS rows_per_band,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN istrue THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_true,
                round(CAST(sum(CAST(p6 AS DECIMAL(24,8))) AS DOUBLE), 6)
                  AS exp_candidates,
                CASE WHEN sum(CASE WHEN istrue THEN 1 ELSE 0 END) > 0 THEN
                  round(CAST(sum(CASE WHEN istrue
                                      THEN CAST(p6 AS DECIMAL(24,8)) END)
                          AS DOUBLE)
                    / CAST(sum(CASE WHEN istrue THEN 1 ELSE 0 END)
                          AS DOUBLE), 6) END AS exp_recall_at_tau,
                round(coalesce(CAST(sum(CASE WHEN NOT istrue
                                            THEN CAST(p6 AS DECIMAL(24,8)) END)
                  AS DOUBLE), 0.0), 6) AS exp_fp
         FROM pp GROUP BY 1, 2 ORDER BY rows_per_band"""),

    "d28_dedup_report" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, d.source,
                         coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id, source FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id),
         csz AS (SELECT component, count(*) AS csz FROM allc GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
                round(CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
                CAST(count(DISTINCT CASE WHEN csz > 1 THEN component END) AS BIGINT)
                  AS n_clusters,
                CAST(max(csz) AS BIGINT) AS max_cluster
         FROM allc JOIN csz USING (component)
         GROUP BY 1 ORDER BY source"""),

    "d27_incremental_cc" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      // the ONE-SHOT d06 components over ALL docs and ALL pairs: the
      // hash match proves the contracted incremental fold exact
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
         SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
         LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY d.doc_id"""),

    "d26_kmv_store_merge" ->
      // the ONE-SHOT whole-corpus bottom-64 per source: matching the
      // Spark side's two-run merge proves store mergeability exactly
      """WITH tk AS (SELECT source, md5(tok) AS h FROM (
                SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0 GROUP BY 1, 2),
            rk AS (SELECT source, h, row_number() OVER (
                     PARTITION BY source ORDER BY h) AS r FROM tk),
            sk AS (SELECT source, count(*) AS n_sketch, max(h) AS hk
                   FROM rk WHERE r <= 64 GROUP BY 1)
         SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
                CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                     ELSE round(63.0 * 1152921504606846976.0 /
                            CAST(CAST(('0x' || substr(hk, 1, 15)) AS BIGINT)
                                 AS DOUBLE), 4)
                END AS distinct_tokens_est
         FROM sk ORDER BY source""",

    "d25_sig_store_dedup" ->
      // the d11 portable chain split at doc_id 250: signatures + bands
      // for both halves, candidates only where a bucket holds one NEW
      // and one STORED doc, then component-match counting — no old
      // text below the sig CTE, mirroring the store contract
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS matched_id
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey
                     WHERE a.doc_id >= 250 AND b.doc_id < 250),
            m AS (SELECT c.doc_id, c.matched_id,
                         sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS matches
                  FROM cand c
                  JOIN sigs sa ON sa.doc_id = c.doc_id
                  JOIN sigs sb ON sb.doc_id = c.matched_id AND sb.i = sa.i
                  GROUP BY 1, 2)
         SELECT doc_id, matched_id, CAST(matches AS BIGINT) AS matches,
                round(CAST(matches AS DOUBLE) / 8.0, 6) AS est_jaccard
         FROM m WHERE matches >= 4 ORDER BY doc_id, matched_id""",

    "d24b_allpairs_3gram" -> (ngramShingleCte +
      // brute-force quadratic 3-gram oracle at tau=0.8: every shared-
      // shingle pair, exact jaccard — algorithm-free, so the prefix
      // filter's hash-match proves it dropped nothing at this tau
      """
         SELECT id1, id2,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.8
         ORDER BY id1, id2"""),

    "d06_dedup_resolve" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
         SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
         LEFT JOIN comp c ON c.id = d.doc_id
         ORDER BY d.doc_id"""),

    "d39_cluster_audit" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2,
                     round(CAST(n AS DOUBLE)
                       / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS j
                   FROM inter JOIN sz s1 ON s1.doc_id = id1
                              JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE)
                     / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r
                               JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component
                  FROM reach GROUP BY a),
         cs AS (SELECT component, CAST(count(*) AS BIGINT) AS n_docs
                FROM comp GROUP BY 1 HAVING count(*) >= 2),
         pc AS (SELECT c.component, CAST(count(*) AS BIGINT) AS n_pairs,
                  min(p.j) AS min_jaccard,
                  round(CAST(sum(CAST(p.j AS DECIMAL(24,8))) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE), 6) AS mean_jaccard
                FROM pairs p JOIN comp c ON c.id = p.id1 GROUP BY 1)
         SELECT cs.component, cs.n_docs, pc.n_pairs, pc.min_jaccard,
                pc.mean_jaccard,
                round(CAST(pc.n_pairs * 2 AS DOUBLE)
                  / CAST(cs.n_docs * (cs.n_docs - 1) AS DOUBLE), 6)
                  AS pair_coverage
         FROM cs JOIN pc ON pc.component = cs.component
         ORDER BY cs.component"""),

    "d37_savings_curve" -> {
      // four per-tau component chains off the shared shingle CTE
      // (DuckDB allows multiple recursive CTEs in one WITH RECURSIVE)
      val taus = Seq("0.5" -> "t05", "0.6" -> "t06",
        "0.7" -> "t07", "0.8" -> "t08")
      val chains = taus.map { case (tau, x) =>
        s"""pairs$x AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= $tau),
         edges$x AS (SELECT id1 AS a, id2 AS b FROM pairs$x
                   UNION SELECT id2, id1 FROM pairs$x),
         reach$x(a, b) AS (SELECT a, b FROM edges$x
                   UNION SELECT r.a, e.b FROM reach$x r JOIN edges$x e ON r.b = e.a),
         comp$x AS (SELECT a AS id, least(a, min(b)) AS component
                   FROM reach$x GROUP BY a),
         agg$x AS (SELECT CAST($tau AS DOUBLE) AS tau,
                   CAST(count(*) AS BIGINT) AS n_removed,
                   CAST(coalesce(sum(sx.toks), 0) AS BIGINT) AS tokens_removed,
                   CAST(coalesce(sum(sx.bytes), 0) AS BIGINT) AS bytes_removed
                   FROM comp$x c JOIN szx sx ON sx.doc_id = c.id
                   WHERE c.id <> c.component)"""
      }.mkString(",\n         ")
      val union = taus.map { case (_, x) => s"SELECT * FROM agg$x" }
        .mkString("\n              UNION ALL ")
      ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
        s""",
         szx AS (SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> len(t) > 0)) AS BIGINT) AS toks,
                   CAST(strlen(text) AS BIGINT) AS bytes
                 FROM documents WHERE doc_id < 500),
         tot AS (SELECT sum(toks) AS tt FROM szx),
         $chains,
         u AS ($union)
         SELECT tau, n_removed, tokens_removed, bytes_removed,
                round(CAST(tokens_removed AS DOUBLE) / CAST(tot.tt AS DOUBLE), 6)
                  AS token_share
         FROM u CROSS JOIN tot ORDER BY tau"""
    },

    "d36_dup_by_source" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, d.source,
                         coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id, source FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN doc_id <> component THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dups,
                round(CAST(sum(CASE WHEN doc_id <> component THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
         FROM allc GROUP BY 1 ORDER BY source"""),

    "d20_soft_dedup" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      """,
         pairs AS (SELECT id1, id2 FROM inter
                   JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
                   WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5),
         edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                   UNION SELECT id2, id1 FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
         allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
                  FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                  LEFT JOIN comp c ON c.id = d.doc_id),
         csz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                 FROM allc GROUP BY 1)
         SELECT f.doc_id, f.component, s.cluster_size,
                round(CAST(1 AS DOUBLE) / CAST(s.cluster_size AS DOUBLE), 6) AS weight
         FROM allc f JOIN csz s USING (component)
         ORDER BY f.doc_id"""),

    "d10_containment" -> (ngramShingleCte +
      """
         SELECT id1, id2,
                round(greatest(CAST(n AS DOUBLE) / CAST(s1.sz AS DOUBLE),
                               CAST(n AS DOUBLE) / CAST(s2.sz AS DOUBLE)), 6) AS containment
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE greatest(CAST(n AS DOUBLE) / CAST(s1.sz AS DOUBLE),
                        CAST(n AS DOUBLE) / CAST(s2.sz AS DOUBLE)) >= 0.8
         ORDER BY id1, id2"""),

    "d05_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
              p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                           a.embedding AS ea, b.embedding AS eb
                    FROM e a JOIN e b ON a.vec_id < b.vec_id),
              u AS (SELECT id1, id2, CAST(unnest(ea) AS DOUBLE) AS x,
                           CAST(unnest(eb) AS DOUBLE) AS y FROM p),
              s AS (SELECT id1, id2, sum(x*y) AS dot,
                           sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                    FROM u GROUP BY 1, 2)
         SELECT id1, id2, round(dot / (na * nb), 6) AS cos
         FROM s WHERE dot / (na * nb) >= 0.45 ORDER BY id1, id2""",

    "d13_url_canon" ->
      """WITH u AS (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'HTTP://WWW.Example.COM:80/articles/item-' || (doc_id % 100) || '/'
                    ELSE 'http://example.com/articles/item-' || (doc_id % 100) END ||
               CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=home'
                    ELSE '?ref=home' END ||
               CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
             FROM documents),
            c AS (SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS rawhost,
               regexp_replace(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
               regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
             FROM u),
            c2 AS (SELECT doc_id, scheme,
               CASE WHEN scheme = 'http'
                    THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':80$', '')
                    WHEN scheme = 'https'
                    THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':443$', '')
                    ELSE regexp_replace(rawhost, '^www\.', '') END AS host,
               path,
               array_to_string(list_filter(string_split(q, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                   '^(utm_[^=]*|fbclid|gclid)(=|$)')), '&') AS qs
             FROM c)
         SELECT scheme || '://' || host || path ||
                CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canon_url,
                min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_variants
         FROM c2 GROUP BY 1 ORDER BY 1""",

    "d31_corpus_diff" ->
      """WITH o AS (SELECT doc_id AS id, md5(text) AS ho, source AS so,
                           TRUE AS po
                    FROM documents WHERE doc_id < 600),
            n AS (SELECT doc_id AS id,
                    md5(CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END) AS hn,
                    source AS sn, TRUE AS pn
                  FROM documents WHERE doc_id >= 300 AND doc_id < 900),
            j AS (SELECT coalesce(o.id, n.id) AS id, ho, hn, po, pn,
                         coalesce(sn, so) AS source
                  FROM o FULL OUTER JOIN n ON o.id = n.id),
            st AS (SELECT source,
                     CASE WHEN po IS NULL THEN 'added'
                          WHEN pn IS NULL THEN 'removed'
                          WHEN ho IS DISTINCT FROM hn THEN 'changed'
                          ELSE 'unchanged' END AS status
                   FROM j),
            g AS (SELECT source,
                    CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
                    CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                    CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
                    CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
                    CAST(count(*) AS BIGINT) AS nn
                  FROM st GROUP BY 1)
         SELECT source, n_added, n_removed, n_changed, n_unchanged,
                round(CAST(n_added + n_removed + n_changed AS DOUBLE)
                  / CAST(nn AS DOUBLE), 6) AS churn_rate
         FROM g ORDER BY source""",

    "d14_cross_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey
                     WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.id1, c.id2, count(*) AS n
                      FROM cand c
                      JOIN sh a ON a.doc_id = c.id1
                      JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
                      GROUP BY 1, 2)
         SELECT id1 AS doc_id, id2 AS matched_id,
                round(CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE), 6) AS jaccard
         FROM inter JOIN sz s1 ON s1.doc_id = id1 JOIN sz s2 ON s2.doc_id = id2
         WHERE CAST(n AS DOUBLE) / CAST(s1.sz + s2.sz - n AS DOUBLE) >= 0.5
         ORDER BY doc_id, matched_id""",

    "d15_para_dedup" ->
      """WITH framed AS (SELECT doc_id,
               'about us' || chr(10) || chr(10) || text || chr(10) || chr(10) ||
               CASE WHEN doc_id % 2 = 0 THEN 'contact us at example.com'
                    ELSE 'follow us on social media' END ||
               chr(10) || chr(10) || 'para ' || doc_id AS text
             FROM documents),
            ps AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS a
                   FROM framed),
            paras AS (SELECT doc_id, a[i] AS para, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ps)),
            kept AS (SELECT doc_id, para, i FROM (
                       SELECT doc_id, para, i, row_number() OVER (
                         PARTITION BY md5(para) ORDER BY doc_id, i) AS rn
                       FROM paras) WHERE rn = 1),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM paras GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.para, chr(10) || chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "d16_dup_substrings" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates ' || text ||
               CASE WHEN doc_id % 7 = 0 THEN ' ' || text ELSE '' END AS text
             FROM documents),
            t AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(text), '\s+'),
                    t -> len(t) > 0) AS toks
                  FROM framed),
            grams AS (SELECT doc_id, i - 1 AS start,
                             md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                 toks[i+2] || ' ' || toks[i+3]) AS h
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks) - 2)) AS i FROM t)),
            dup AS (SELECT h FROM (
                      SELECT h, count(*) AS c FROM grams GROUP BY 1) WHERE c > 1),
            m AS (SELECT g.doc_id, g.start FROM grams g JOIN dup USING (h)),
            cov AS (SELECT doc_id, count(DISTINCT start + j) AS nd
                    FROM m CROSS JOIN (SELECT unnest(range(4)) AS j) GROUP BY 1),
            tot AS (SELECT doc_id, len(toks) AS n FROM t)
         SELECT t.doc_id, CAST(n AS BIGINT) AS n_toks,
                CAST(coalesce(nd, 0) AS BIGINT) AS n_dup_toks,
                round(CAST(coalesce(nd, 0) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dup_frac
         FROM tot t LEFT JOIN cov USING (doc_id) ORDER BY doc_id""",

    "d17_winnowing" -> d17Oracle,

    "d19_bloom_decontaminate" -> d19Oracle,

    "d23_span_dedup" ->
      """WITH framed AS (SELECT doc_id,
               'welcome to the archive. this copy is mirrored nightly. enjoy your stay. ' ||
               text || '.' ||
               CASE WHEN doc_id % 2 = 0
                    THEN ' thanks for visiting. see you next time. goodbye.'
                    ELSE ' closing note ' || CAST(doc_id AS VARCHAR) || '.' END AS text
             FROM documents),
            s0 AS (SELECT doc_id, list_filter(list_transform(
                     regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+'),
                     x -> trim(x)), x -> len(x) > 0) AS sents FROM framed),
            base AS (SELECT doc_id, sents, len(sents) AS n FROM s0),
            spans AS (SELECT doc_id, s AS start,
                        md5(array_to_string(list_slice(sents, s + 1, s + 3), chr(1))) AS h
                      FROM (SELECT doc_id, sents, n, unnest(range(0, n - 2)) AS s
                            FROM base WHERE n >= 3)),
            winners AS (SELECT h, doc_id, start FROM (
                          SELECT h, doc_id, start,
                            row_number() OVER (PARTITION BY h
                              ORDER BY doc_id, start) AS rn
                          FROM spans) WHERE rn = 1),
            removals AS (SELECT DISTINCT sp.doc_id, sp.start + d.d AS pos
                         FROM spans sp
                         LEFT JOIN winners w ON sp.h = w.h
                           AND sp.doc_id = w.doc_id AND sp.start = w.start
                         CROSS JOIN (SELECT unnest(range(0, 3)) AS d) d
                         WHERE w.h IS NULL),
            sent AS (SELECT doc_id, i - 1 AS pos, sents[i] AS sent
                     FROM (SELECT doc_id, sents, unnest(range(1, n + 1)) AS i
                           FROM base)),
            kept AS (SELECT s.doc_id, s.pos, s.sent FROM sent s
                     LEFT JOIN removals r ON s.doc_id = r.doc_id AND s.pos = r.pos
                     WHERE r.doc_id IS NULL),
            agg AS (SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text_clean,
                      count(*) AS n_kept FROM kept GROUP BY 1)
         SELECT b.doc_id,
                coalesce(a.text_clean, '') AS text_clean,
                CAST(b.n AS BIGINT) AS n_sents,
                CAST(b.n - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
         FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY b.doc_id""",

    "d18_dup_substring_cut" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates ' || text ||
               CASE WHEN doc_id % 7 = 0 THEN ' ' || text ELSE '' END AS text
             FROM documents),
            t AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(text), '\s+'),
                    t -> len(t) > 0) AS toks
                  FROM framed),
            grams AS (SELECT doc_id, i - 1 AS start,
                             md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                                 toks[i+2] || ' ' || toks[i+3]) AS h
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks) - 2)) AS i FROM t)),
            dup AS (SELECT h FROM (
                      SELECT h, count(*) AS c FROM grams GROUP BY 1) WHERE c > 1),
            m AS (SELECT g.doc_id, g.start FROM grams g JOIN dup USING (h)),
            cov AS (SELECT DISTINCT doc_id, start + j AS pos
                    FROM m CROSS JOIN (SELECT unnest(range(4)) AS j)),
            tk AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) + 1)) AS i FROM t)),
            kept AS (SELECT k.doc_id,
                       string_agg(k.tok, ' ' ORDER BY k.pos) AS clean,
                       count(*) AS nk
                     FROM tk k LEFT JOIN cov c
                       ON c.doc_id = k.doc_id AND c.pos = k.pos
                     WHERE c.pos IS NULL GROUP BY 1),
            tot AS (SELECT doc_id, len(toks) AS n FROM t)
         SELECT t.doc_id, coalesce(clean, '') AS text_clean,
                CAST(n AS BIGINT) AS n_toks,
                CAST(n - coalesce(nk, 0) AS BIGINT) AS n_dup_toks
         FROM tot t LEFT JOIN kept USING (doc_id) ORDER BY doc_id"""
  )

  private val d33Sql: (String, String) = "d33_sparse_cosine" ->
    // multiset 3-gram tf, rational df damping, DECIMAL(38,18) dot and
    // norm folds — the identical arithmetic shape the engine runs, so
    // the cosine replays bit for bit
    """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                  FROM documents WHERE doc_id < 500),
          sh AS (SELECT doc_id,
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                 FROM (SELECT doc_id, toks,
                         unnest(range(1, len(toks) - 1)) AS i FROM t)),
          tf AS (SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS tf
                 FROM sh GROUP BY 1, 2),
          dfq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
                  FROM tf GROUP BY 1),
          w AS (SELECT doc_id, shingle,
                  CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS w
                FROM tf JOIN dfq USING (shingle)),
          nrm AS (SELECT doc_id,
                    sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
                  FROM w GROUP BY 1),
          dots AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                     CAST(sum(CAST(a.w * b.w AS DECIMAL(38,18))) AS DOUBLE) AS dot
                   FROM w a JOIN w b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
       SELECT id1, id2, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
       FROM dots JOIN nrm n1 ON n1.doc_id = id1 JOIN nrm n2 ON n2.doc_id = id2
       WHERE dot / (n1.nrm * n2.nrm) >= 0.5
       ORDER BY id1, id2"""

  /** d32: banding-recovery report composed from the two pair chains it
    * compares — the exhaustive shared-shingle truth (d04) and the
    * banded MinHash + verify finder (d11) as CTEs verbatim, then one
    * join counts recovered pairs. The finder verifies at the truth
    * threshold, so precision is 1.0 by construction and recall is the
    * banding miss rate.
    */
  val sql: Map[String, String] = base + d33Sql ++ Map(
    "d34_threshold_curve" ->
      // the d11 signature/banding CTEs verbatim (no verify filter),
      // raw signature agreement per candidate, full join against the
      // d04 truth so banding misses count as FN at every threshold
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                    FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sigs AS (SELECT doc_id, i,
                            min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS sig
                     FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) GROUP BY 1, 2),
            bands AS (SELECT doc_id, i // 2 AS band,
                             md5(min(CASE WHEN i % 2 = 0 THEN sig END)
                                 || min(CASE WHEN i % 2 = 1 THEN sig END)) AS bkey
                      FROM sigs GROUP BY 1, 2),
            cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                     FROM bands a JOIN bands b
                       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
            m AS (SELECT c.id1, c.id2,
                    CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                      AS BIGINT) AS mm
                  FROM cand c
                  JOIN sigs sa ON sa.doc_id = c.id1
                  JOIN sigs sb ON sb.doc_id = c.id2 AND sb.i = sa.i
                  GROUP BY 1, 2),
            truth AS (SELECT id1, id2 FROM (${base("d04_ngram_jaccard")})),
            lab AS (SELECT coalesce(m.mm, 0) AS mm,
                           CASE WHEN t2.id1 IS NULL THEN 0 ELSE 1 END AS ist
                    FROM m FULL JOIN truth t2
                      ON t2.id1 = m.id1 AND t2.id2 = m.id2),
            th AS (SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS min_matches),
            agg AS (SELECT th.min_matches,
                CAST(sum(CASE WHEN mm >= min_matches AND ist = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN mm >= min_matches AND ist = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN mm < min_matches AND ist = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn
              FROM th, lab GROUP BY 1)
         SELECT min_matches, tp, fp, fn,
                CASE WHEN tp + fp > 0 THEN round(
                  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END
                  AS p_precision,
                CASE WHEN tp + fn > 0 THEN round(
                  CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END
                  AS p_recall,
                CASE WHEN tp + fp > 0 AND tp + fn > 0
                      AND CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                        + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) > 0.0
                  THEN round(2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
                    * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
                    / (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                       + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)), 6) END
                  AS f1
         FROM agg ORDER BY min_matches""",

    "d32_dedup_effectiveness" ->
      s"""WITH truth AS (${base("d04_ngram_jaccard")}),
            found AS (${base("d11_minhash_portable")}),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
            nf AS (SELECT CAST(count(*) AS BIGINT) AS n_found FROM found),
            h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
                  FROM truth t JOIN found f ON f.id1 = t.id1 AND f.id2 = t.id2)
         SELECT n_truth, n_found, n_hits,
                CASE WHEN n_found > 0 THEN round(
                  CAST(n_hits AS DOUBLE) / CAST(n_found AS DOUBLE), 6) END
                  AS pair_precision,
                CASE WHEN n_truth > 0 THEN round(
                  CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) END
                  AS pair_recall
         FROM nt, nf, h"""
  )
}
