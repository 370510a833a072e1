package graft

/** DuckDB oracle SQL for the packing-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesP {
  import OracleHelpers._

  val sql: Map[String, String] = Map(
    "p16_token_waterfill" ->
      // the identical integer waterfill: totals -> boundary row
      // T_{i-1} <= lvl < T_i with lvl = (B - P_{i-1}) // (n-i+1) ->
      // per-source md5-ordered cumsum <= lvl. All BIGINT arithmetic.
      """WITH n AS (SELECT doc_id, source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
            tot AS (SELECT source, sum(n_toks) AS t FROM n GROUP BY 1),
            lvc AS (SELECT * FROM (
                      SELECT source, t,
                             (26000 - (p - t)) // (ns - i + 1) AS lvl,
                             coalesce(lag(t) OVER (ORDER BY t, source), 0) AS prevt
                      FROM (SELECT source, t,
                              row_number() OVER (ORDER BY t, source) AS i,
                              sum(t) OVER (ORDER BY t, source) AS p,
                              count(*) OVER () AS ns
                            FROM tot))
                    WHERE prevt <= lvl AND lvl < t),
            lv AS (SELECT coalesce(min(lvl), 9223372036854775807) AS lvl FROM lvc),
            c AS (SELECT doc_id, source, n_toks,
                    sum(n_toks) OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                  FROM n)
         SELECT doc_id, source, n_toks FROM c, lv WHERE cum <= lvl
         ORDER BY doc_id""",

    "p17_effective_tokens" -> {
      // the identical arithmetic, Horner chain generated from the
      // same coefficient table (operators.Training.expNegHornerSql)
      val x = "greatest(0.0, (2000.0 / CAST(unique_tokens AS DOUBLE)) - 1.0) / 5.3"
      val horner = graft.operators.Training.expNegHornerSql(x)
      s"""WITH n AS (SELECT source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_toks
             FROM documents WHERE source IS NOT NULL),
            tot AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS unique_tokens
                    FROM n GROUP BY 1)
         SELECT source, unique_tokens,
                round(2000.0 / CAST(unique_tokens AS DOUBLE), 6) AS epochs,
                round(CAST(unique_tokens AS DOUBLE)
                      + (CAST(unique_tokens AS DOUBLE) * 5.3)
                        * (1.0 - $horner), 6) AS effective_tokens
         FROM tot ORDER BY source"""
    },

    "p19_interleave" ->
      """SELECT doc_id, source,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS round,
                md5('o:' || CAST(doc_id AS VARCHAR)) AS ord
         FROM documents ORDER BY round, ord""",

    "p18_leakage_split" -> (ngramShingleCte.replaceFirst("WITH", "WITH RECURSIVE") +
      // d06's component resolution, then the p05 hash-range CASE on
      // the COMPONENT key: thr(0.2) = 0x33333, thr(0.4) = 0x66666
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
                  LEFT JOIN comp c ON c.id = d.doc_id)
         SELECT doc_id, component, CASE
           WHEN substring(md5(CAST(component AS VARCHAR)), 1, 5) < '33333' THEN 'val'
           WHEN substring(md5(CAST(component AS VARCHAR)), 1, 5) < '66666' THEN 'test'
           ELSE 'train' END AS split
         FROM allc ORDER BY doc_id"""),

    "p04_source_quota" ->
      """WITH r AS (SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qr
             FROM documents)
         SELECT doc_id, source FROM r WHERE qr <= 30 ORDER BY doc_id""",

    "p22_fim_split" ->
      // same md5 channels: gate on the 5-hex prefix, cuts from two
      // 15-hex channels mod n+1 (order-normalized), PSM/SPM on a bit
      """WITH n AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+')) END
                        AS BIGINT) AS n_toks,
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '80000' AS is_fim,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c1'), 1, 15))
                        AS BIGINT) AS h1,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':c2'), 1, 15))
                        AS BIGINT) AS h2,
                      substr(md5(CAST(doc_id AS VARCHAR) || ':o'), 1, 1) < '8' AS psm
                    FROM documents),
            c AS (SELECT doc_id, n_toks, is_fim, psm,
                    least(h1 % (n_toks + 1), h2 % (n_toks + 1)) AS lo,
                    greatest(h1 % (n_toks + 1), h2 % (n_toks + 1)) AS hi
                  FROM n)
         SELECT doc_id, n_toks, is_fim,
                CASE WHEN is_fim THEN lo ELSE n_toks END AS n_prefix,
                CASE WHEN is_fim THEN hi - lo ELSE 0 END AS n_middle,
                CASE WHEN is_fim THEN n_toks - hi ELSE 0 END AS n_suffix,
                CASE WHEN NOT is_fim THEN 'none'
                     WHEN psm THEN 'psm' ELSE 'spm' END AS fim_order
         FROM c ORDER BY doc_id""",

    "p05_split" ->
      """SELECT doc_id, CASE
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '19999' THEN 'val'
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) < '33333' THEN 'test'
           ELSE 'train' END AS split
         FROM documents ORDER BY doc_id""",

    "p06_token_budget" ->
      """WITH n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
            c AS (SELECT doc_id, n_toks,
                    sum(n_toks) OVER (
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                  FROM n)
         SELECT doc_id, n_toks FROM c WHERE cum <= 20000 ORDER BY doc_id""",

    "p10_chunk_windows" ->
      """WITH tk AS (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           t -> len(t) > 0) AS toks
             FROM documents),
            nz AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
            st AS (SELECT doc_id, toks, n, s FROM
                     (SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS s FROM nz)
                   WHERE s = 0 OR s - 24 + 32 < n)
         SELECT doc_id,
                CAST(s // 24 AS BIGINT) AS chunk_idx,
                array_to_string(list_slice(toks, s + 1, s + 32), ' ') AS chunk_text,
                CAST(least(32, n - s) AS BIGINT) AS n_toks
         FROM st ORDER BY doc_id, chunk_idx""",

    "p07_dsir" -> p07Oracle,

    "p08_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
              r AS (SELECT source, n,
                      CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT) AS rs
                    FROM c),
              tot AS (SELECT CAST(sum(n) AS HUGEINT) AS total, sum(rs) AS s FROM r),
              k AS (SELECT source,
                      least(CAST(n AS HUGEINT),
                            ((SELECT total FROM tot) * 1 // 2) * rs // (SELECT s FROM tot))
                        AS cap
                    FROM r),
              ranked AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                         FROM documents)
         SELECT doc_id, source FROM ranked JOIN k USING (source)
         WHERE rn <= cap ORDER BY doc_id""",

    "p09_curriculum" -> (
      s"""WITH q AS ($qualitySubSql),
             h AS (SELECT quality, count(*) AS c FROM q GROUP BY 1),
             b AS (SELECT quality,
                     coalesce(sum(c) OVER (ORDER BY quality DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS bef,
                     sum(c) OVER () AS n
                   FROM h),
             st AS (SELECT quality,
                      CAST((bef * 4) // n + 1 AS BIGINT) AS stage FROM b)
         SELECT q.doc_id, q.quality, st.stage
         FROM q JOIN st USING (quality) ORDER BY q.doc_id"""),

    "p11_diverse_sample" ->
      // assignment = the s09 CTE (rounded cosine, lowest-cid tie);
      // selection = md5-order row_number per cluster, quota 50
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
              r AS (SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick FROM asg)
         SELECT vec_id, cluster, CAST(pick AS BIGINT) AS pick
         FROM r WHERE pick <= 50 ORDER BY vec_id""",

    "p12_pack_greedy" -> (p12PackCte +
      """
         SELECT doc_id, shard, pack FROM g ORDER BY doc_id"""),

    "p20_pack_efficiency" -> (p12PackCte +
      // the Krell efficiency report over the same packs: padding vs
      // capacity, with an oversized pack contributing its own fill as
      // capacity (a lone over-cap doc pads nothing)
      """,
           pk AS (SELECT shard, pack, CAST(sum(n_toks) AS BIGINT) AS fl
                  FROM g GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_packs,
                CAST(sum(fl) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN fl > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
                round(CAST(sum(greatest(0, 512 - fl)) AS DOUBLE)
                      / CAST(sum(greatest(512, fl)) AS DOUBLE), 6) AS waste_frac,
                round(quantile_cont(fl, 0.5), 6) AS p50_fill
         FROM pk"""),

    "p21_seq_profile" ->
      """WITH n AS (SELECT source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                round(quantile_cont(n_toks, 0.5), 6) AS p50_toks,
                round(quantile_cont(n_toks, 0.95), 6) AS p95_toks,
                CAST(max(n_toks) AS BIGINT) AS max_toks,
                CAST(sum(n_toks) AS BIGINT) AS total_toks
         FROM n GROUP BY 1 ORDER BY source""",

    "p13_epoch_repeat" ->
      // identical IEEE64 fraction math on both sides; the extra-copy
      // draw is the mixtureSample 5-hex-digit md5 prefix compare
      """WITH w AS (SELECT doc_id,
               CASE WHEN source IN ('src0','src1','src2','src3','src4')
                    THEN CAST(2.45 AS DOUBLE) ELSE CAST(0.7 AS DOUBLE) END AS ep
             FROM documents),
           c AS (SELECT doc_id, CAST(floor(ep) AS BIGINT)
                   + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 5) <
                       printf('%05x', CAST(least(floor((ep - floor(ep)) * 1048576.0),
                                                 1048575.0) AS BIGINT))
                     THEN 1 ELSE 0 END AS copies
                 FROM w)
         SELECT doc_id, CAST(unnest(range(0, copies)) AS BIGINT) AS epoch
         FROM c WHERE copies > 0 ORDER BY doc_id, epoch""",

    "p14_weighted_sample" -> p14Oracle,

    "p15_pack_bestfit" ->
      // the BFD fold replayed per shard: LIST-of-fills state in the
      // recursive CTE, best fit = first position of the max feasible
      // fill (equal fills are interchangeable, so this IS the
      // lowest-index best fit — the operator's identical rule)
      """WITH RECURSIVE n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
           r AS (SELECT doc_id, doc_id // 128 AS shard, n_toks,
                   row_number() OVER (PARTITION BY doc_id // 128
                     ORDER BY n_toks DESC, doc_id) AS rn
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
           g AS (
             SELECT shard, rn, doc_id, n_toks,
                    CAST(0 AS BIGINT) AS pack, [n_toks] AS fills
             FROM r WHERE rn = 1
             UNION ALL
             SELECT r.shard, r.rn, r.doc_id, r.n_toks,
               CAST(CASE WHEN list_max(list_filter(g.fills, f -> f + r.n_toks <= 512)) IS NULL
                    THEN len(g.fills)
                    ELSE list_position(g.fills, list_max(list_filter(g.fills,
                           f -> f + r.n_toks <= 512))) - 1 END AS BIGINT),
               CASE WHEN list_max(list_filter(g.fills, f -> f + r.n_toks <= 512)) IS NULL
                    THEN list_append(g.fills, r.n_toks)
                    ELSE list_transform(range(1, len(g.fills) + 1), i ->
                      CASE WHEN i = list_position(g.fills, list_max(list_filter(g.fills,
                             f -> f + r.n_toks <= 512)))
                           THEN g.fills[i] + r.n_toks ELSE g.fills[i] END) END
             FROM g JOIN r ON r.shard = g.shard AND r.rn = g.rn + 1)
         SELECT doc_id, shard, pack FROM g ORDER BY doc_id""",

    // t35's per-doc BPE counts flowing through p06's md5-order
    // cumulative-sum budget: identical training CTEs, identical
    // count chain, then the p06 window
    "p06b_token_budget_bpe" -> (bpeCtes(8) +
      s""",
            tk AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents WHERE doc_id IS NOT NULL),
            seg AS (SELECT doc_id,
                      ${(1 to 8).foldLeft("s0")((e, k) =>
                        s"replace($e, ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ')")} AS s
                    FROM (SELECT doc_id,
                            ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s0
                          FROM tk WHERE w <> '') ${(1 to 8).map(k => s", m$k").mkString}),
            perdoc AS (SELECT doc_id, sum(len(string_split(trim(s), ' '))) AS n
                       FROM seg GROUP BY 1),
            nn AS (SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_bpe
                   FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
                   LEFT JOIN perdoc p ON p.doc_id = d.doc_id),
            cc AS (SELECT doc_id, n_bpe,
                     sum(n_bpe) OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum
                   FROM nn)
         SELECT doc_id, n_bpe FROM cc WHERE cum <= 80000 ORDER BY doc_id"""),

    "p24_cap_sweep" ->
      // same t03 whitespace token convention; integer sums, one
      // pinned division per cap
      """WITH n AS (SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                      END AS BIGINT) AS nt
                    FROM documents),
            c AS (SELECT CAST(unnest([32, 128, 256, 512, 1024]) AS BIGINT)
                    AS cap)
         SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN nt > cap THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_truncated,
                CAST(sum(greatest(nt - cap, 0)) AS BIGINT) AS tokens_lost,
                CAST(sum(cap - least(nt, cap)) AS BIGINT) AS pad_tokens,
                round(CAST(sum(least(nt, cap)) AS DOUBLE)
                  / CAST(count(*) * cap AS DOUBLE), 6) AS utilization
         FROM c, n GROUP BY 1 ORDER BY cap""",

    "p23_length_batches" ->
      // plain per-bucket rank window single-node; the Spark side is
      // the distributed prefix count
      """WITH tk AS (SELECT doc_id,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END
                         AS BIGINT) AS n
                     FROM documents),
            b AS (SELECT doc_id, n,
                    CAST(CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                         WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                         WHEN n <= 1024 THEN 1024 ELSE 2048 END AS BIGINT) AS cap,
                    md5('b:' || CAST(doc_id AS VARCHAR)) AS h
                  FROM tk),
            r AS (SELECT *, CAST(row_number() OVER (PARTITION BY cap
                    ORDER BY h, doc_id) AS BIGINT) AS rank_in_bucket FROM b)
         SELECT doc_id, n AS n_toks, cap AS bucket_cap, rank_in_bucket,
                (rank_in_bucket - 1) // 16 AS batch_idx,
                cap - least(n, cap) AS pad_tokens
         FROM r ORDER BY doc_id""",

    "p01_pack" ->
      // the oracle computes the same packing with a plain global
      // cumsum — fine single-node; the Spark side is the distributed
      // prefix sum
      """WITH tk AS (SELECT doc_id,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END
                         AS BIGINT) AS n_toks
                     FROM documents),
              c AS (SELECT doc_id, n_toks,
                       coalesce(sum(n_toks) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                    FROM tk)
         SELECT doc_id, n_toks,
                CAST(cb // 2048 AS BIGINT) AS seq_start,
                CAST((cb + n_toks - 1) // 2048 AS BIGINT) AS seq_end,
                CAST(cb % 2048 AS BIGINT) AS seq_off
         FROM c WHERE n_toks > 0 ORDER BY doc_id""",

    "p02_mixture" ->
      // identical IEEE64 rate math on both sides: w * (total*0.5) / n,
      // floored once into a 5-hex-digit md5 prefix threshold
      """WITH w AS (SELECT doc_id, source,
                      CASE WHEN source IN ('src0','src1','src2','src3','src4')
                           THEN CAST(0.08 AS DOUBLE)
                           ELSE CAST(0.6 AS DOUBLE) / CAST(15.0 AS DOUBLE) END AS w
                    FROM documents),
            cs AS (SELECT source, CAST(count(*) AS BIGINT) AS n, min(w) AS w
                   FROM w GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM cs),
           thr AS (SELECT source,
                      printf('%05x', CAST(least(floor(least(
                        w * (CAST(total AS DOUBLE) * 0.5) / CAST(n AS DOUBLE),
                        1.0) * 1048576.0), 1048575.0) AS BIGINT)) AS t
                   FROM cs CROSS JOIN tt)
         SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
         FROM documents d JOIN thr ON d.source = thr.source
         WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5) < thr.t
         GROUP BY 1 ORDER BY 1""",

    "p26_shard_entropy" ->
      // p03's shard digit, t14's quantized log folds, pinned balance
      """WITH a AS (SELECT CAST(strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                      AS BIGINT) AS shard, source
                    FROM documents),
            c AS (SELECT shard, source, CAST(count(*) AS BIGINT) AS c
                  FROM a GROUP BY 1, 2),
            n AS (SELECT shard, sum(c) AS n FROM c GROUP BY 1),
            st AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS s
                   FROM documents),
            h AS (SELECT c.shard, any_value(n.n) AS n,
                    CAST(count(*) AS BIGINT) AS n_sources,
                    sum(CAST(round((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE))
                      * ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
                      AS DECIMAL(24,8))) AS hs
                  FROM c JOIN n ON n.shard = c.shard GROUP BY 1)
         SELECT shard, CAST(n AS BIGINT) AS n_docs, n_sources,
                round(CAST(-hs AS DOUBLE), 6) AS entropy,
                round(CAST(-hs AS DOUBLE) / ln(CAST(st.s AS DOUBLE)), 6)
                  AS balance
         FROM h CROSS JOIN st ORDER BY shard""",

    "p25_mix_report" ->
      // p02's keep chain verbatim, then the audit aggregates with the
      // same pinned divisions
      """WITH w AS (SELECT doc_id, source,
                      CASE WHEN source IN ('src0','src1','src2','src3','src4')
                           THEN CAST(0.08 AS DOUBLE)
                           ELSE CAST(0.6 AS DOUBLE) / CAST(15.0 AS DOUBLE) END AS w
                    FROM documents),
            cs AS (SELECT source, CAST(count(*) AS BIGINT) AS n, min(w) AS w
                   FROM w GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM cs),
           thr AS (SELECT source,
                      printf('%05x', CAST(least(floor(least(
                        w * (CAST(total AS DOUBLE) * 0.5) / CAST(n AS DOUBLE),
                        1.0) * 1048576.0), 1048575.0) AS BIGINT)) AS t
                   FROM cs CROSS JOIN tt),
            kept AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
                     FROM documents d JOIN thr ON d.source = thr.source
                     WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5) < thr.t
                     GROUP BY 1),
            tk AS (SELECT sum(n_kept) AS tk FROM kept),
            r AS (SELECT cs.source, cs.n AS n_in,
                    CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
                    cs.w FROM cs LEFT JOIN kept ON kept.source = cs.source)
         SELECT source, n_in, n_kept,
                round(w, 6) AS target_share,
                round(CAST(n_kept AS DOUBLE) / CAST(tk AS DOUBLE), 6)
                  AS achieved_share,
                round((CAST(n_kept AS DOUBLE) / CAST(tk AS DOUBLE) - w) / w, 6)
                  AS rel_error
         FROM r CROSS JOIN tk ORDER BY source""",

    "p03_shard" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
                    FROM documents)
         SELECT doc_id,
                CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)
                  AS shard,
                CAST(row_number() OVER (
                  PARTITION BY strpos('0123456789abcdef', substr(h, 1, 1))
                  ORDER BY substr(h, 2), doc_id) AS BIGINT) AS pos
         FROM h ORDER BY doc_id"""
  )
}
