package graft

import graft.functions.TextFunctions

/** Shared CTE builders and fixtures behind the per-family oracle
  * maps (OraclesD/M/P/Q/R/S/T) — split from SparkEntry verbatim.
  * Everything here exists to keep each oracle a single SQL string
  * whose shape mirrors the Spark plan it checks.
  */
private[graft] object OracleHelpers {

  val bm25Queries: Seq[(String, String)] = Seq(
    "q1" -> "hash", "q1" -> "join", "q1" -> "merge",
    "q2" -> "window", "q2" -> "stream", "q2" -> "batch",
    "q3" -> "spark", "q3" -> "vector", "q3" -> "scan")

  def langIdOver(rel: String, keyCols: String): String = {
    val scoreCols = TextFunctions.StopwordSets.map { case (l, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      if (TextFunctions.UnsegmentedLangs(l))
        // unsegmented scripts: substring containment on the raw text,
        // mirroring TextFunctions.langScoreUnsegmented
        s"len(list_filter($arr, m -> contains(txt, m))) AS s_$l"
      else
        s"len(list_intersect(toks, $arr)) AS s_$l"
    }.mkString(", ")
    val best = TextFunctions.StopwordSets.map { case (l, _) => s"s_$l" }
      .mkString("greatest(", ", ", ")")
    val cases = TextFunctions.StopwordSets.map { case (l, _) =>
      s"WHEN best > 0 AND s_$l = best THEN '$l'"
    }.mkString(" ")
    s"""SELECT $keyCols, CASE $cases ELSE 'und' END AS lang_pred FROM (
          SELECT $keyCols, $best AS best, s_${TextFunctions.StopwordSets.map(_._1).mkString(", s_")} FROM (
            SELECT $keyCols, $scoreCols FROM $rel))"""
  }

  val langIdOracle: String =
    langIdOver(
      """(SELECT doc_id, lower(text) AS txt,
                 string_split_regex(lower(text), '\s+') AS toks
          FROM documents)""", "doc_id") + " ORDER BY doc_id"

  /** Chained-CTE replay of [[graft.operators.TextStats.bpeTrain]]'s 8
    * merge rounds: v0 = the space-joined char symbolization of the
    * vocabulary; round k picks argmax pair (freq desc, pair asc) from
    * v(k-1) and rewrites v(k-1) with the same padded replace. Built
    * programmatically — the rounds are mechanical.
    */
  def bpeCtes(nMerges: Int): String = {
    val head =
      """WITH words AS (SELECT w, count(*) AS cnt FROM (
              SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) WHERE w <> '' GROUP BY 1),
            v0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS syms, cnt
                   FROM words)"""
    val rounds = (1 to nMerges).map { k =>
      s""",
            p$k AS (SELECT l[i] || ' ' || l[i+1] AS pair, sum(cnt) AS f
                    FROM (SELECT l, cnt, unnest(range(1, len(l))) AS i
                          FROM (SELECT string_split(trim(syms), ' ') AS l, cnt
                                FROM v${k - 1}))
                    GROUP BY 1),
            m$k AS (SELECT pair, f FROM p$k ORDER BY f DESC, pair LIMIT 1),
            v$k AS (SELECT replace(syms, ' ' || pair || ' ',
                             ' ' || replace(pair, ' ', '') || ' ') AS syms, cnt
                    FROM v${k - 1}, m$k)"""
    }.mkString
    head + rounds
  }

  /** Chained-CTE replay of [[graft.operators.Similarity.mmrTopK]]'s
    * greedy rounds: round i scores every unselected candidate as
    * λ·rel − (1−λ)·max(sim to a1..a(i−1)) and takes the window-rank-1
    * row. λ and 1−λ interpolate as the Scala-computed doubles so both
    * engines fold the SAME IEEE constants over the SAME rounded-6
    * rel/sim inputs.
    */
  def mmrOracle(k: Int, prefetch: Int, lam: Double): String = {
    val l = lam.toString
    val oml = (1.0 - lam).toString
    val head =
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
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
              cand AS (SELECT qid, cid, round(cos, 6) AS rel FROM r WHERE rnk <= $prefetch),
              su AS (SELECT a.qid, a.cid AS c1, b.cid AS c2,
                            CAST(unnest(ea.embedding) AS DOUBLE) AS x,
                            CAST(unnest(eb.embedding) AS DOUBLE) AS y
                     FROM cand a JOIN cand b ON a.qid = b.qid
                     JOIN embeddings ea ON ea.vec_id = a.cid
                     JOIN embeddings eb ON eb.vec_id = b.cid),
              sims AS (SELECT qid, c1, c2,
                              round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS sim
                       FROM su GROUP BY 1, 2, 3),
              a1 AS (SELECT qid, cid, 1 AS mmr_rank FROM (
                       SELECT qid, cid, row_number() OVER (
                         PARTITION BY qid ORDER BY rel DESC, cid) AS rk FROM cand)
                     WHERE rk = 1)"""
    val rounds = (2 to k).map { i =>
      s""",
              a$i AS (SELECT qid, cid, $i AS mmr_rank FROM (
                        SELECT c.qid, c.cid, row_number() OVER (
                          PARTITION BY c.qid
                          ORDER BY $l * c.rel - $oml * ms.m DESC, c.cid) AS rk
                        FROM cand c
                        JOIN (SELECT s2.qid, s2.c1 AS cid, max(s2.sim) AS m
                              FROM sims s2
                              JOIN (${(1 until i).map(j => s"SELECT qid, cid FROM a$j").mkString(" UNION ALL ")}) p
                                ON p.qid = s2.qid AND p.cid = s2.c2
                              GROUP BY 1, 2) ms
                          ON ms.qid = c.qid AND ms.cid = c.cid
                        WHERE NOT EXISTS (
                          SELECT 1 FROM (${(1 until i).map(j => s"SELECT qid, cid FROM a$j").mkString(" UNION ALL ")}) p2
                          WHERE p2.qid = c.qid AND p2.cid = c.cid))
                      WHERE rk = 1)"""
    }.mkString
    val all = (1 to k).map(j => s"SELECT qid, cid, mmr_rank FROM a$j")
      .mkString(" UNION ALL ")
    head + rounds +
      s"""
         SELECT f.qid AS query_id, f.cid AS neighbor_id, cand.rel AS rel,
                CAST(f.mmr_rank AS BIGINT) AS mmr_rank
         FROM ($all) f JOIN cand ON cand.qid = f.qid AND cand.cid = f.cid
         ORDER BY query_id, mmr_rank"""
  }

  val ngramShingleCte =
    // shingle start positions unnest per row from range(1, len(toks)-1)
    // (1-based, stop-exclusive => i+2 <= len), so the bound derives
    // from each document's own token count — no silent cap on long docs
    """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                  FROM documents WHERE doc_id < 500),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)"""

  /** DuckDB twin of TextFunctions.qualityScore over documents —
    * shared by t02 and d07 so the two oracles cannot drift. */
  val qualitySubSql =
    """SELECT doc_id, round(
           (CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1 ELSE 0 END) * 0.3
           + (CASE WHEN mwl >= 3.0 AND mwl <= 12.0 THEN 1 ELSE 0 END) * 0.3
           + ar * 0.4, 4) AS quality
         FROM (
           SELECT doc_id, text,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                    / CAST(greatest(length(text), 1) AS DOUBLE) AS ar,
                  CAST(length(text) AS DOUBLE) / CAST(greatest(
                    CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS DOUBLE) AS mwl
           FROM documents)"""

  /** d12's DuckDB twin, generated: the 64 per-bit conditional sums
    * mirror the Spark aggregate column for column (same instr-based hex
    * digit parse, same floor-div bit extraction), so both engines
    * evaluate the identical hash family and banding.
    */
  /** BM25 oracle: identical arithmetic association as
    * Retrieval.bm25TopK — idf * ((tf*(k1+1)) / (tf + k1*((1-b) + (b*dl)/avgdl)))
    * with per-term contributions rounded to 6 then DECIMAL-summed, so
    * both engines produce identical IEEE64 scores and therefore
    * identical ranks (ties broken by doc_id).
    */
  /** s29 oracle: the FULL Lloyd trajectory replayed in SQL — micro
    * vectors, md5-seeded init, per-iteration exact-integer argmin +
    * sign-split HALF_UP micro means with the empty-cluster COALESCE,
    * then the final assignment. Exact integers end-to-end make the
    * whole trajectory engine-independent.
    */
  def s29Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)}
       SELECT id AS vec_id, CAST(j AS BIGINT) AS cluster,
              CAST(dist AS BIGINT) AS dist_sq
       FROM asg ORDER BY vec_id"""

  /** The shared Lloyd-trajectory CTE chain (ends at `asg`:
    * (id, j, dist) — the final assignment under the final centroids).
    * s29 selects it directly; s30 stacks the prototypicality chain on
    * top, so the two oracles cannot drift.
    */
  def lloydCtes(k: Int, iters: Int, dims: Int): String = {
    val iterCtes = (1 to iters).map { t =>
      s"""d$t AS (SELECT e.id, c.j, sum((e.x6 - c.c6) * (e.x6 - c.c6)) AS dist
               FROM ex e JOIN c${t - 1} c USING (pos) GROUP BY 1, 2),
          a$t AS (SELECT id, j FROM (
                    SELECT id, j, row_number() OVER (PARTITION BY id
                      ORDER BY dist, j) AS rk FROM d$t) WHERE rk = 1),
          m$t AS (SELECT a.j, e.pos,
                    CASE WHEN sum(e.x6) >= 0
                         THEN (2 * sum(e.x6) + count(*)) // (2 * count(*))
                         ELSE -((2 * -sum(e.x6) + count(*)) // (2 * count(*)))
                    END AS c6
                  FROM ex e JOIN a$t a USING (id) GROUP BY a.j, e.pos),
          c$t AS (SELECT p.j, p.pos, CAST(COALESCE(m.c6, p.c6) AS BIGINT) AS c6
                  FROM c${t - 1} p LEFT JOIN m$t m ON m.j = p.j AND m.pos = p.pos)"""
    }.mkString(",\n")
    s"""ex AS (SELECT vec_id AS id, CAST(pos AS BIGINT) AS pos,
                CAST(round(round(CAST(x AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS x6
              FROM (SELECT vec_id, unnest(embedding) AS x,
                           unnest(range(len(embedding))) AS pos
                    FROM embeddings WHERE len(embedding) = $dims)),
         sd AS (SELECT vec_id,
                  row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                    - 1 AS j
                FROM embeddings WHERE len(embedding) = $dims
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
         c0 AS (SELECT sd.j, ex.pos, ex.x6 AS c6 FROM sd JOIN ex ON ex.id = sd.vec_id),
         $iterCtes,
         fin AS (SELECT e.id, c.j, sum((e.x6 - c.c6) * (e.x6 - c.c6)) AS dist
                 FROM ex e JOIN c$iters c USING (pos) GROUP BY 1, 2),
         asg AS (SELECT id, j, dist FROM (
                   SELECT id, j, dist, row_number() OVER (PARTITION BY id
                     ORDER BY dist, j) AS rk FROM fin) WHERE rk = 1)"""
  }

  /** s43 oracle: list sizes off the Lloyd chain's final assignment,
    * empty lists from the range axis, pinned share/imbalance.
    */
  def s43Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         cnts AS (SELECT j AS cluster, CAST(count(*) AS BIGINT) AS n_points
                  FROM asg GROUP BY 1),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM asg),
         ax AS (SELECT unnest(range($k)) AS cluster)
       SELECT CAST(ax.cluster AS BIGINT) AS cluster,
              CAST(coalesce(c.n_points, 0) AS BIGINT) AS n_points,
              round(CAST(coalesce(c.n_points, 0) AS DOUBLE)
                / CAST(nt.nn AS DOUBLE), 6) AS share,
              round(CAST(coalesce(c.n_points, 0) AS DOUBLE) * $k.0
                / CAST(nt.nn AS DOUBLE), 6) AS imbalance
       FROM ax LEFT JOIN cnts c ON c.cluster = ax.cluster CROSS JOIN nt
       ORDER BY cluster"""

  /** s36 oracle: the Lloyd chain's `fin` frame already holds every
    * (point, centroid) distance — top-2 per point gives d1/d2, the
    * same pinned sqrt chain scores s, and the per-cluster mean folds
    * DECIMAL-quantized terms (the q53 rule).
    */
  def s36Oracle(k: Int, iters: Int, dims: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         t2 AS (SELECT id, j, dist, row_number() OVER (PARTITION BY id
                  ORDER BY dist, j) AS rk FROM fin),
         p AS (SELECT a.id, a.j AS cluster, a.dist AS d1, b.dist AS d2
               FROM (SELECT id, j, dist FROM t2 WHERE rk = 1) a
               JOIN (SELECT id, dist FROM t2 WHERE rk = 2) b USING (id)),
         s AS (SELECT cluster,
                 CASE WHEN d2 = 0 THEN 0.0
                      ELSE (sqrt(CAST(d2 AS DOUBLE)) - sqrt(CAST(d1 AS DOUBLE)))
                        / sqrt(CAST(d2 AS DOUBLE)) END AS sil
               FROM p)
       SELECT CAST(cluster AS BIGINT) AS cluster,
              CAST(count(*) AS BIGINT) AS n_points,
              round(CAST(sum(CAST(round(sil, 9) AS DECIMAL(28,9))) AS DOUBLE)
                / CAST(count(*) AS DOUBLE), 6) AS mean_silhouette
       FROM s GROUP BY 1 ORDER BY cluster"""

  /** s32 oracle: the Lloyd chain trains the quantizer, queries probe
    * their `nprobe` nearest final centroids by the same exact-integer
    * metric, candidates are the probed clusters' members, the s01
    * cosine chain ranks them.
    */
  def s32Oracle(k: Int, iters: Int, dims: Int, nprobe: Int,
                        topK: Int, queryMax: Long): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         qd AS (SELECT q.id AS qid, c.j,
                  sum((q.x6 - c.c6) * (q.x6 - c.c6)) AS dist
                FROM (SELECT id, pos, x6 FROM ex WHERE id < $queryMax) q
                JOIN c$iters c USING (pos) GROUP BY 1, 2),
         pr AS (SELECT qid, j FROM (
                  SELECT qid, j, row_number() OVER (PARTITION BY qid
                    ORDER BY dist, j) AS rk FROM qd) WHERE rk <= $nprobe),
         cand AS (SELECT pr.qid, a.id AS cid FROM pr JOIN asg a ON a.j = pr.j),
         u AS (SELECT qid, cid, CAST(unnest(ce) AS DOUBLE) AS x,
                      CAST(unnest(qe) AS DOUBLE) AS y
               FROM (SELECT cand.qid, cand.cid, ce.embedding AS ce,
                            qe.embedding AS qe
                     FROM cand JOIN embeddings ce ON ce.vec_id = cand.cid
                               JOIN embeddings qe ON qe.vec_id = cand.qid)),
         sc AS (SELECT qid, cid,
                  sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cos
                FROM u GROUP BY 1, 2
                HAVING sum(x*x) > 0 AND sum(y*y) > 0),
         rr AS (SELECT qid, cid, cos, CAST(row_number() OVER (
                  PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rnk
                FROM sc)
       SELECT qid AS query_id, cid AS neighbor_id, round(cos, 6) AS cos,
              rnk AS rank
       FROM rr WHERE rnk <= $topK ORDER BY query_id, rank"""

  /** s44 oracle: the portable store-served ADC path — the Lloyd chain
    * trains the quantizer and assigns the lists (`asg` IS the store's
    * cent_id column), the s10 code CTE fills the postings, queries
    * probe their `nprobe` nearest final centroids by the exact-integer
    * metric (the s32 probe), and the s11 ADC chain ranks the probed
    * lists' codes. Composes the three proven chains verbatim so the
    * oracle cannot drift from its components.
    */
  def s44Oracle(k: Int, iters: Int, dims: Int, m: Int, cbMax: Long,
                nprobe: Int, topK: Int, queryMax: Long): String = {
    val sub = dims / m
    s"""WITH ${lloydCtes(k, iters, dims)},
         qd AS (SELECT q.id AS qid, c.j,
                  sum((q.x6 - c.c6) * (q.x6 - c.c6)) AS dist
                FROM (SELECT id, pos, x6 FROM ex WHERE id < $queryMax) q
                JOIN c$iters c USING (pos) GROUP BY 1, 2),
         pr AS (SELECT qid, j AS cl FROM (
                  SELECT qid, j, row_number() OVER (PARTITION BY qid
                    ORDER BY dist, j) AS rk FROM qd) WHERE rk <= $nprobe),
         cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings
                WHERE vec_id < $cbMax),
         e AS (SELECT vec_id, embedding AS ev FROM embeddings
               WHERE len(embedding) = $dims),
         dmat AS (SELECT vec_id, j, code,
                    round(list_aggregate(list_transform(range($sub), i ->
                        CAST(cv[j*$sub + i + 1] AS DOUBLE)
                          * CAST(cv[j*$sub + i + 1] AS DOUBLE)), 'sum')
                      - 2 * list_aggregate(list_transform(range($sub), i ->
                        CAST(ev[j*$sub + i + 1] AS DOUBLE)
                          * CAST(cv[j*$sub + i + 1] AS DOUBLE)), 'sum'),
                      6) AS dist
                  FROM e CROSS JOIN cb
                       CROSS JOIN (SELECT unnest(range($m)) AS j)),
         codes AS (SELECT vec_id, j, code FROM (
                     SELECT vec_id, j, code, row_number() OVER (
                       PARTITION BY vec_id, j ORDER BY dist, code) AS rn
                     FROM dmat) WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < $queryMax),
         dt AS (SELECT qid, j, code,
                  round(list_aggregate(list_transform(range($sub), i ->
                      CAST(cv[j*$sub + i + 1] AS DOUBLE)
                        * CAST(cv[j*$sub + i + 1] AS DOUBLE)), 'sum')
                    - 2 * list_aggregate(list_transform(range($sub), i ->
                      CAST(qv[j*$sub + i + 1] AS DOUBLE)
                        * CAST(cv[j*$sub + i + 1] AS DOUBLE)), 'sum'),
                    6) AS dist
                FROM q CROSS JOIN cb
                     CROSS JOIN (SELECT unnest(range($m)) AS j)),
         cand AS (SELECT pr.qid, a.id AS cid FROM pr
                  JOIN asg a ON a.j = pr.cl),
         sums AS (SELECT cand.qid, cand.cid,
                    round(CAST(sum(CAST(dt.dist AS DECIMAL(24,8)))
                      AS DOUBLE), 6) AS adc_dist
                  FROM cand JOIN codes c ON c.vec_id = cand.cid
                       JOIN dt ON dt.qid = cand.qid AND dt.j = c.j
                              AND dt.code = c.code
                  GROUP BY 1, 2),
         r2 AS (SELECT qid, cid, adc_dist, CAST(row_number() OVER (
                  PARTITION BY qid ORDER BY adc_dist, cid) AS BIGINT)
                  AS rank FROM sums)
       SELECT qid AS query_id, cid AS neighbor_id, adc_dist, rank
       FROM r2 WHERE rank <= $topK ORDER BY query_id, rank"""
  }

  /** s30 oracle: the Lloyd chain's `asg` assignment becomes the label
    * for the s28 prototypicality chain — unsupervised SSL prototypes
    * (Sorscher et al. 2022), both halves shared verbatim with their
    * standalone oracles.
    */
  def s30Oracle(k: Int, iters: Int, dims: Int,
                        pruneNum: Int, pruneDen: Int): String =
    s"""WITH ${lloydCtes(k, iters, dims)},
         ex2 AS (SELECT e.vec_id, a.j AS cluster, unnest(e.embedding) AS x,
                        unnest(range(len(e.embedding))) AS pos
                 FROM embeddings e JOIN asg a ON a.id = e.vec_id),
         ce AS (SELECT cluster, CAST(pos AS BIGINT) AS pos,
                  round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE), 6) AS c
                FROM ex2 GROUP BY 1, 2),
         cn AS (SELECT cluster,
                  CAST(sum(CAST(round(c * c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS cn2
                FROM ce GROUP BY 1),
         nv AS (SELECT vec_id, sqrt(list_aggregate(
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  'sum')) AS vn
                FROM embeddings),
         dt AS (SELECT e.vec_id, e.cluster,
                  CAST(sum(CAST(round(ce.c * CAST(e.x AS DOUBLE), 6)
                    AS DECIMAL(24,8))) AS DOUBLE) AS dot
                FROM ex2 e JOIN ce ON ce.cluster = e.cluster
                  AND ce.pos = e.pos
                GROUP BY 1, 2),
         sc AS (SELECT dt.vec_id, CAST(dt.cluster AS BIGINT) AS cluster,
                  round(dot / (sqrt(cn.cn2) * nv.vn), 6) AS proto_score
                FROM dt JOIN cn ON cn.cluster = dt.cluster AND cn.cn2 > 0
                        JOIN nv ON nv.vec_id = dt.vec_id AND nv.vn > 0),
         rk AS (SELECT *,
                  CAST(row_number() OVER (PARTITION BY cluster
                    ORDER BY proto_score DESC, vec_id) AS BIGINT) AS rank_in_cluster,
                  CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_cluster
                FROM sc)
       SELECT vec_id, cluster, proto_score, rank_in_cluster, n_cluster,
              rank_in_cluster > n_cluster * $pruneNum // $pruneDen AS kept
       FROM rk ORDER BY cluster, rank_in_cluster"""

  lazy val t17Oracle: String = {
    val values = bm25Queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    s"""WITH tk AS (SELECT doc_id, tok AS term FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
            st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
            q(qid, term) AS (VALUES $values),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
                   JOIN (SELECT DISTINCT term FROM q) USING (term) GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            ct AS (SELECT qid, doc_id,
                     round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                                    / (CAST(df AS DOUBLE) + 0.5))
                           * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
                              / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
                                 + (0.75 * CAST(dl AS DOUBLE))
                                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 6) AS c
                   FROM tf JOIN q USING (term) JOIN dfq USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN st),
            sc AS (SELECT qid, doc_id,
                     round(CAST(sum(CAST(c AS DECIMAL(24,8))) AS DOUBLE), 6) AS bm25
                   FROM ct GROUP BY 1, 2)
         SELECT qid, doc_id, bm25, CAST(rk AS BIGINT) AS rank FROM (
           SELECT qid, doc_id, bm25,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY bm25 DESC, doc_id) AS rk FROM sc)
         WHERE rk <= 10 ORDER BY qid, rk"""
  }

  /** DSIR oracle: identical feature stream (unigrams + space-joined
    * adjacent bigrams), identical 3-hex-digit md5 bucketing, identical
    * smoothed-ratio association ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)),
    * rounded to 6 then DECIMAL-summed per doc.
    */
  lazy val p07Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val bucket = s"((${dg(1)} * 16 + ${dg(2)}) * 16 + ${dg(3)})"
    s"""WITH tk AS (SELECT doc_id, (lang = 'en') AS tgt, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            uni AS (SELECT doc_id, tgt, unnest(toks) AS f FROM tk),
            bi AS (SELECT doc_id, tgt, toks[i] || ' ' || toks[i+1] AS f
                   FROM (SELECT doc_id, tgt, toks,
                           unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            feats AS (SELECT doc_id, tgt, $bucket AS b
                      FROM (SELECT doc_id, tgt, md5(f) AS h
                            FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi))),
            counts AS (SELECT b, count(*) AS cr,
                              count(CASE WHEN tgt THEN 1 END) AS ct
                       FROM feats GROUP BY 1),
            tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM counts),
            lr AS (SELECT b, round(ln(
                     (CAST(ct + 1 AS DOUBLE) / CAST(nt + 4096 AS DOUBLE))
                     / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 4096 AS DOUBLE))), 6) AS lr
                   FROM counts CROSS JOIN tot),
            sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                     round(CAST(sum(CAST(lr AS DECIMAL(24,8))) AS DOUBLE), 6) AS log_weight
                   FROM feats JOIN lr USING (b) GROUP BY 1)
         SELECT doc_id, n_feats, log_weight FROM (
           SELECT *, row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rk
           FROM sc)
         WHERE rk <= 100 ORDER BY doc_id"""
  }

  /** A-ES weighted-sample oracle: identical 8-hex-digit md5 uniform
    * (instr-based hex parse → the same integer h, u = (h+1)/2^32 one
    * exact IEEE division), identical ln(u)/w key rounded to 6 before
    * ranking, same top-100 with id tiebreak. Token count is the
    * tokenCountWs twin (the p12 expression).
    */
  lazy val p14Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex8 = (1 to 8).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_toks
             FROM documents),
          hx AS (SELECT doc_id, n_toks, md5(CAST(doc_id AS VARCHAR)) AS h
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
          ky AS (SELECT doc_id, n_toks,
                   round(ln((CAST($hex8 AS DOUBLE) + 1) / 4294967296.0)
                         / CAST(n_toks AS DOUBLE), 6) AS wkey
                 FROM hx)
       SELECT doc_id, n_toks, wkey FROM (
         SELECT *, row_number() OVER (ORDER BY wkey DESC, doc_id) AS rk FROM ky)
       WHERE rk <= 100 ORDER BY doc_id"""
  }

  /** Stupid Backoff oracle: identical pair/token streams, identical
    * branch arithmetic — seen bigrams score ln(nb/np), unseen ones
    * ln(0.4 · (nu+1)/(N+V)) with the same multiplication association —
    * each rounded to 6 then DECIMAL-summed per doc.
    */
  /** The p12 next-fit fold as a per-shard recursive CTE (depth ≤
    * shardSize=128), shared by the p12 gate and the p20 efficiency
    * report so the packs they describe cannot drift. */
  lazy val p12PackCte: String =
    """WITH RECURSIVE n AS (SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_toks
             FROM documents),
           r AS (SELECT doc_id, doc_id // 128 AS shard, n_toks,
                   row_number() OVER (PARTITION BY doc_id // 128
                     ORDER BY doc_id) AS rn
                 FROM n WHERE n_toks > 0 AND doc_id IS NOT NULL),
           g AS (
             SELECT shard, rn, doc_id, n_toks,
                    CAST(0 AS BIGINT) AS pack, n_toks AS fill
             FROM r WHERE rn = 1
             UNION ALL
             SELECT r.shard, r.rn, r.doc_id, r.n_toks,
               CASE WHEN g.fill + r.n_toks > 512 THEN g.pack + 1 ELSE g.pack END,
               CASE WHEN g.fill + r.n_toks > 512 THEN r.n_toks
                    ELSE g.fill + r.n_toks END
             FROM g JOIN r ON r.shard = g.shard AND r.rn = g.rn + 1)"""

  /** s21 oracle: the identical moment pass and the identical 12
    * power-iteration rounds as chained CTEs — every sum a round-6 →
    * DECIMAL(24,8) fold, every round's normalize re-rounded, so the
    * loadings/eigenvalue/explained fraction replay Spark's driver
    * loop bit-for-bit. */
  /** One component's 12 power-iteration rounds as chained CTEs —
    * every iteration MATERIALIZED (inlined, v_t references w_t twice,
    * directly and via n_t, so the plan re-expands exponentially in
    * the iteration count). `covName` is the matrix the component
    * iterates on; `p` prefixes the CTE names so s24's deflation chain
    * can stack k of these ("" reproduces s21's historical names).
    */
  def pcIterCtes(covName: String, p: String, iters: Int): String =
    (1 to iters).map { t =>
      val pv = if (t == 1) "v0" else s"${p}v${t - 1}"
      s"""${p}w$t AS MATERIALIZED (SELECT c.i, CAST(sum(CAST(round(c.c * p.v, 6) AS DECIMAL(24,8))) AS DOUBLE) AS w
                  FROM $covName c JOIN $pv p ON p.i = c.j GROUP BY 1),
          ${p}n$t AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(24,8))) AS DOUBLE)) AS nm FROM ${p}w$t),
          ${p}v$t AS MATERIALIZED (SELECT i, round(w / nm, 6) AS v FROM ${p}w$t, ${p}n$t)"""
    }.mkString(",\n")

  lazy val s21Cte: String = {
    val iterCtes = pcIterCtes("cov", "", 12)
    s"""WITH x AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                 t -> CAST(round(round(CAST(t AS DOUBLE), 6) * 1000000.0, 0) AS BIGINT)) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
          nn AS (SELECT count(*) AS n FROM x),
          e1 AS (SELECT vec_id, unnest(v) AS xi, unnest(range(len(v))) AS i, v FROM x),
          pp AS (SELECT i, xi, unnest(v) AS xj, unnest(range(len(v))) AS j FROM e1),
          s AS (SELECT i, j, sum(xi * xj) AS s6 FROM pp GROUP BY 1, 2),
          mu AS (SELECT i, sum(xi) AS m6 FROM e1 GROUP BY 1),
          cov AS MATERIALIZED (SELECT s.i, s.j,
                  ((CAST(s.s6 AS DOUBLE) / 1.0e12) / nn.n)
                  - (((CAST(m1.m6 AS DOUBLE) / 1000000.0) / nn.n)
                     * ((CAST(m2.m6 AS DOUBLE) / 1000000.0) / nn.n)) AS c
                  FROM s JOIN mu m1 ON m1.i = s.i JOIN mu m2 ON m2.i = s.j CROSS JOIN nn),
          dd AS (SELECT count(*) AS d FROM mu),
          v0 AS (SELECT i, round(1.0 / sqrt(CAST(d AS DOUBLE)), 6) AS v FROM mu, dd),
          $iterCtes"""
  }

  lazy val s21Oracle: String = s21Cte +
    """,
          tr AS (SELECT CAST(sum(CAST(round(c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS tr
                 FROM cov WHERE i = j)
       SELECT i AS pos, v AS loading, round(nm, 6) AS eigenvalue,
              round(round(nm, 6) / tr, 6) AS explained_frac
       FROM v12, n12, tr ORDER BY pos"""

  /** s22: the s21 chain's v12 loadings applied back to every vector —
    * centered by the same mu/n mean, per-term round-6 products
    * DECIMAL-summed per row, the identical arithmetic the Spark side
    * embeds as literals. */
  lazy val s22Oracle: String = s21Cte +
    """,
          mm AS (SELECT mu.i, (CAST(mu.m6 AS DOUBLE) / 1000000.0) / nn.n AS m
                 FROM mu CROSS JOIN nn),
          pt AS (SELECT e.vec_id,
                   CAST(sum(CAST(round(round(CAST(e.xi AS DOUBLE) / 1000000.0 - m.m, 6) * v.v, 6)
                     AS DECIMAL(24,8))) AS DOUBLE) AS sc
                 FROM e1 e JOIN mm m ON m.i = e.i JOIN v12 v ON v.i = e.i
                 GROUP BY 1)
       SELECT vec_id, round(sc, 6) AS pc_score FROM pt ORDER BY vec_id"""

  /** s24/s25 shared chain: the s21 moment/covariance head, then k
    * components of 12 power-iteration rounds with Hotelling deflation
    * between them — cov_{c+1} = cov_c − (λ·v_i)·v_j, the association
    * written verbatim as the Spark driver computes it. */
  def sPcKCte(k: Int): String = {
    def covName(c: Int) = if (c == 1) "cov" else s"cov$c"
    val compCtes = (1 to k).map { c =>
      val iters = pcIterCtes(covName(c), s"k$c", 12)
      val lam = s"k${c}lam AS (SELECT round(nm, 6) AS lam FROM k${c}n12)"
      val deflate =
        if (c == k) ""
        else s""",
          ${covName(c + 1)} AS MATERIALIZED (SELECT c.i, c.j,
                  c.c - (l.lam * a.v) * b.v AS c
                  FROM ${covName(c)} c
                  JOIN k${c}v12 a ON a.i = c.i
                  JOIN k${c}v12 b ON b.i = c.j
                  CROSS JOIN k${c}lam l)"""
      s"$iters,\n          $lam$deflate"
    }.mkString(",\n")
    s21Cte.replace(s"\n          ${pcIterCtes("cov", "", 12)}",
      s"\n          $compCtes") match {
      case same if same == s21Cte =>
        sys.error("sPcKCte: iteration-chain splice failed")
      case ok => ok
    }
  }

  /** s24: the k-component chain's loadings/eigenvalues, explained
    * against the ORIGINAL trace. */
  lazy val s24Oracle: String = sPcKCte(3) +
    s""",
          tr AS (SELECT CAST(sum(CAST(round(c, 6) AS DECIMAL(24,8))) AS DOUBLE) AS tr
                 FROM cov WHERE i = j)
       ${(1 to 3).map(c =>
        s"""SELECT CAST($c AS BIGINT) AS component, i AS pos, v AS loading,
               l.lam AS eigenvalue, round(l.lam / tr, 6) AS explained_frac
             FROM k${c}v12, k${c}lam l, tr""").mkString("\nUNION ALL\n")}
       ORDER BY component, pos"""

  /** s25: each component's centered projection + the √λ-normalized
    * whitened coordinate — the s21 integer-micro discipline end to
    * end: coordinate/mean/loading as ×10⁶ BIGINTs, exact pico term
    * sums, HALF_UP at the pico→micro boundary by integer division
    * (sum(BIGINT) is HUGEINT in DuckDB — exact — cast back down). */
  lazy val s25Oracle: String = sPcKCte(3) +
    s""",
          mm AS (SELECT mu.i,
                   CAST(round(round((CAST(mu.m6 AS DOUBLE) / 1000000.0) / nn.n, 6)
                     * 1000000.0, 0) AS BIGINT) AS m6
                 FROM mu CROSS JOIN nn)
       ${(1 to 3).map(c =>
        s"""SELECT vec_id, CAST($c AS BIGINT) AS component,
               CAST(micro AS DOUBLE) / 1000000.0 AS score,
               round((CAST(micro AS DOUBLE) / 1000000.0) / sqrt(l.lam), 6) AS white
             FROM (SELECT vec_id,
                     CASE WHEN pico >= 0 THEN (pico + 500000) // 1000000
                          ELSE -((-pico + 500000) // 1000000) END AS micro
                   FROM (SELECT e.vec_id,
                           CAST(sum((e.xi - m.m6)
                             * CAST(round(v.v * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS pico
                         FROM e1 e JOIN mm m ON m.i = e.i JOIN k${c}v12 v ON v.i = e.i
                         GROUP BY 1)), k${c}lam l""").mkString("\nUNION ALL\n")}
       ORDER BY vec_id, component"""

  lazy val t30Oracle: String = t30ScoreCte +
    """
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              round(CAST(sum(CAST(lp AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6)
                AS mean_logprob
       FROM sc GROUP BY 1 ORDER BY 1"""

  /** t36: t30's per-doc backoff scores fed through the t18 tercile
    * cut — per-language head/middle/tail on the cross-slice LM. */
  lazy val t36Oracle: String = t30ScoreCte +
    """,
          pd AS (SELECT doc_id,
                   round(CAST(sum(CAST(lp AS DECIMAL(24,8))) AS DOUBLE)
                         / count(*), 6) AS mean_logprob
                 FROM sc GROUP BY 1),
          sl AS (SELECT d.doc_id, d.lang, p.mean_logprob
                 FROM pd p JOIN documents d ON d.doc_id = p.doc_id),
          hist AS (SELECT lang, mean_logprob, count(*) AS c
                   FROM sl GROUP BY 1, 2),
          cut AS (SELECT lang, mean_logprob,
                    CASE WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                             ORDER BY mean_logprob DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                           / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                           < (1.0 / 3.0) THEN 'head'
                         WHEN CAST(coalesce(sum(c) OVER (PARTITION BY lang
                             ORDER BY mean_logprob DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                           / CAST(sum(c) OVER (PARTITION BY lang) AS DOUBLE)
                           < (2.0 / 3.0) THEN 'middle'
                         ELSE 'tail' END AS bucket
                  FROM hist)
       SELECT doc_id, lang, mean_logprob, bucket
       FROM sl JOIN cut USING (lang, mean_logprob)
       ORDER BY doc_id"""

  lazy val t30ScoreCte: String =
    """WITH tk AS (SELECT doc_id, lang = 'en' AS lm,
               list_filter(string_split_regex(lower(text), '\s+'),
                 t -> len(t) > 0) AS toks FROM documents),
          pr AS (SELECT doc_id, lm, toks[i] AS w1, toks[i+1] AS w2
                 FROM (SELECT doc_id, lm, toks,
                         unnest(range(1, len(toks))) AS i FROM tk)
                 WHERE len(toks) >= 2),
          bc AS (SELECT w1, w2, count(*) AS nb FROM pr WHERE lm GROUP BY 1, 2),
          pc AS (SELECT w1, count(*) AS np FROM pr WHERE lm GROUP BY 1),
          un AS (SELECT w2, count(*) AS nu FROM (
                   SELECT unnest(toks) AS w2 FROM tk WHERE lm) GROUP BY 1),
          tot AS (SELECT sum(nu) AS n, count(*) AS v FROM un),
          sc AS (SELECT p.doc_id,
                   CASE WHEN b.nb IS NOT NULL
                     THEN round(ln(CAST(b.nb AS DOUBLE) / CAST(c.np AS DOUBLE)), 6)
                     ELSE round(ln(0.4 *
                       (CAST(coalesce(u.nu, 0) + 1 AS DOUBLE)
                        / CAST(t.n + t.v AS DOUBLE))), 6) END AS lp
                 FROM pr p
                 LEFT JOIN bc b ON b.w1 = p.w1 AND b.w2 = p.w2
                 LEFT JOIN pc c ON c.w1 = p.w1
                 LEFT JOIN un u ON u.w2 = p.w2
                 CROSS JOIN tot t)"""

  /** CMS oracle: rebuilds the Count-Min grid in SQL with the same
    * portable row hashes ((first 4 md5 hex digits of "r:item") mod w)
    * and takes the same min-over-rows estimate — bit-for-bit against
    * the JVM aggregate.
    */
  lazy val t20Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex4 = (1 to 4).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH tk AS (SELECT tok FROM (
                SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            rb AS (SELECT r, $hex4 % 1024 AS bkt FROM (
                     SELECT r, md5(CAST(r AS VARCHAR) || ':' || tok) AS h
                     FROM tk CROSS JOIN (SELECT unnest(range(4)) AS r))),
            bc AS (SELECT r, bkt, count(*) AS c FROM rb GROUP BY 1, 2),
            probe(term) AS (VALUES ('hash'), ('join'), ('batch'), ('the'),
                                   ('nosuchtoken')),
            pb AS (SELECT term, r, $hex4 % 1024 AS bkt FROM (
                     SELECT term, r, md5(CAST(r AS VARCHAR) || ':' || term) AS h
                     FROM probe CROSS JOIN (SELECT unnest(range(4)) AS r))),
            est AS (SELECT term, min(coalesce(c, 0)) AS est
                    FROM pb LEFT JOIN bc USING (r, bkt) GROUP BY 1),
            ex AS (SELECT tok AS term, count(*) AS exact FROM tk GROUP BY 1)
         SELECT term, CAST(est AS BIGINT) AS est,
                CAST(coalesce(exact, 0) AS BIGINT) AS exact
         FROM est LEFT JOIN ex USING (term) ORDER BY term"""
  }

  /** Quality-classifier oracle: the p07 feature/bucket SQL with a
    * seed-vs-rest contrast — per-bucket naive-Bayes log-odds, doc
    * prior, DECIMAL-summed per-doc scores, keep = score > 0.
    */
  lazy val t21Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val bucket = s"((${dg(1)} * 16 + ${dg(2)}) * 16 + ${dg(3)})"
    s"""WITH tk AS (SELECT doc_id, (doc_id % 50 = 0) AS pos, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            uni AS (SELECT doc_id, pos, unnest(toks) AS f FROM tk),
            bi AS (SELECT doc_id, pos, toks[i] || ' ' || toks[i+1] AS f
                   FROM (SELECT doc_id, pos, toks,
                           unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            feats AS (SELECT doc_id, pos, $bucket AS b
                      FROM (SELECT doc_id, pos, md5(f) AS h
                            FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi))),
            counts AS (SELECT b, count(CASE WHEN pos THEN 1 END) AS cp,
                              count(CASE WHEN NOT pos THEN 1 END) AS cn
                       FROM feats GROUP BY 1),
            tot AS (SELECT sum(cp) AS np, sum(cn) AS nn FROM counts),
            w AS (SELECT b, round(ln(
                     (CAST(cp + 1 AS DOUBLE) / CAST(np + 4096 AS DOUBLE))
                     / (CAST(cn + 1 AS DOUBLE) / CAST(nn + 4096 AS DOUBLE))), 6) AS w
                  FROM counts CROSS JOIN tot),
            prior AS (SELECT round(ln(
                     CAST(count(CASE WHEN pos THEN 1 END) + 1 AS DOUBLE)
                     / CAST(count(CASE WHEN NOT pos THEN 1 END) + 1 AS DOUBLE)), 6) AS pw
                  FROM tk),
            sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                     round(CAST(sum(CAST(w AS DECIMAL(24,8)))
                                + CAST(pw AS DECIMAL(24,8)) AS DOUBLE), 6) AS score
                   FROM feats JOIN w USING (b) CROSS JOIN prior
                   GROUP BY doc_id, pw)
         SELECT doc_id, n_feats, score, score > 0 AS keep
         FROM sc ORDER BY doc_id"""
  }

  /** Gopher-repetition oracle: same framing, same line/char/n-gram
    * conventions (occurrence-sum duplicates, top ties to the
    * lexicographically first gram), same rounded thresholds.
    */
  lazy val t22Oracle: String = {
    val topFracs = Seq(2, 3, 4).map(n =>
      s"round(CAST(coalesce(t$n, 0) AS DOUBLE) / tc, 6) AS top_${n}gram_char_frac")
    val dupFracs = (5 to 10).map(n =>
      s"round(CAST(coalesce(d$n, 0) AS DOUBLE) / tc, 6) AS dup_${n}gram_char_frac")
    val pivTop = Seq(2, 3, 4).map(n => s"max(CASE WHEN n = $n THEN topc END) AS t$n")
    val pivDup = (5 to 10).map(n => s"max(CASE WHEN n = $n THEN dupc END) AS d$n")
    val dupThr = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    val passDup = (5 to 10).map(n =>
      s"round(CAST(coalesce(d$n, 0) AS DOUBLE) / tc, 6) <= ${dupThr(n)}").mkString(" AND ")
    s"""WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter today for free updates' || chr(10) ||
               text ||
               CASE WHEN doc_id % 7 = 0 THEN chr(10) || text ELSE '' END AS text
             FROM documents),
            ln AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
                     CAST(greatest(len(text), 1) AS DOUBLE) AS tc,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> len(t) > 0) AS toks
                   FROM framed),
            lstat AS (SELECT doc_id, tc, toks,
                     round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                       / greatest(len(lines), 1), 6) AS dlf,
                     round(CAST(list_aggregate(list_transform(lines, l -> len(l)), 'sum')
                         - list_aggregate(list_transform(list_distinct(lines), l -> len(l)), 'sum')
                         AS DOUBLE)
                       / greatest(list_aggregate(list_transform(lines, l -> len(l)), 'sum'), 1),
                       6) AS dlcf
                   FROM ln),
            grams AS (SELECT doc_id, n,
                     array_to_string(toks[i:i+n-1], ' ') AS g
                   FROM (SELECT doc_id, toks, n, unnest(range(1, len(toks) - n + 2)) AS i
                         FROM lstat CROSS JOIN (SELECT unnest(range(2, 11)) AS n)
                         WHERE len(toks) >= n)),
            cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3),
            ranked AS (SELECT doc_id, n, c * len(g) AS topc,
                     row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, g) AS rn
                   FROM cnt),
            dup AS (SELECT doc_id, n,
                     sum(CASE WHEN c >= 2 THEN c * len(g) END) AS dupc
                   FROM cnt GROUP BY 1, 2),
            pern AS (SELECT r.doc_id, r.n, r.topc, d.dupc
                   FROM ranked r JOIN dup d USING (doc_id, n) WHERE r.rn = 1),
            piv AS (SELECT doc_id, ${(pivTop ++ pivDup).mkString(", ")}
                   FROM pern GROUP BY 1)
         SELECT doc_id, dlf AS dup_line_frac, dlcf AS dup_line_char_frac,
                ${(topFracs ++ dupFracs).mkString(", ")},
                (dlf <= 0.30 AND dlcf <= 0.20
                 AND round(CAST(coalesce(t2, 0) AS DOUBLE) / tc, 6) <= 0.20
                 AND round(CAST(coalesce(t3, 0) AS DOUBLE) / tc, 6) <= 0.18
                 AND round(CAST(coalesce(t4, 0) AS DOUBLE) / tc, 6) <= 0.16
                 AND $passDup) AS pass
         FROM lstat JOIN piv USING (doc_id) ORDER BY doc_id"""
  }

  /** Bloom-decontamination oracle: rebuilds the IDENTICAL portable
    * bitmap — the same 3 bit positions per shingle (first 5 md5 hex
    * digits of "r:shingle" = 20 bits, the full 2^20 range) — as a
    * distinct (r, pos) set, then declares a training shingle
    * bloom-positive iff all 3 of its positions are in the set. False
    * positives reproduce exactly, so the sweep hash-matches.
    */
  lazy val d19Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val hex5 = (1 to 5).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                   FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            bits AS (SELECT DISTINCT r, $hex5 AS pos FROM (
                       SELECT r, md5(CAST(r AS VARCHAR) || ':' || shingle) AS h
                       FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
                       CROSS JOIN (SELECT unnest(range(3)) AS r))),
            pr AS (SELECT doc_id, shingle, r, $hex5 AS pos FROM (
                     SELECT doc_id, shingle, r,
                            md5(CAST(r AS VARCHAR) || ':' || shingle) AS h
                     FROM sh CROSS JOIN (SELECT unnest(range(3)) AS r)
                     WHERE doc_id % 50 <> 0)),
            hitsh AS (SELECT doc_id, shingle FROM pr JOIN bits USING (r, pos)
                      GROUP BY 1, 2 HAVING count(*) = 3)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS bloom_hits
         FROM hitsh GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1"""
  }

  /** Winnowing oracle: identical 32-bit md5-prefix gram hash, the
    * same h·2³¹ + (2³¹−1−pos) pack (so MIN = min hash, rightmost
    * position), a w-row window frame, and the same distinct-hash
    * pair count.
    */
  lazy val d17Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    val h32 = (1 to 8).map(dg).reduce((a, b) => s"($a * 16 + $b)")
    s"""WITH t AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\\s+'),
                t -> len(t) > 0) AS toks
              FROM documents WHERE doc_id < 500),
            g AS (SELECT doc_id, i - 1 AS start,
                         md5(toks[i] || ' ' || toks[i+1] || ' ' ||
                             toks[i+2] || ' ' || toks[i+3]) AS h
                  FROM (SELECT doc_id, toks,
                          unnest(range(1, len(toks) - 2)) AS i FROM t)
                  WHERE len(toks) >= 4),
            e AS (SELECT doc_id, start,
                         $h32 * 2147483648 + (2147483647 - start) AS enc
                  FROM g),
            win AS (SELECT doc_id,
                      min(enc) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
                      count(*) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
                    FROM e),
            fp AS (SELECT DISTINCT doc_id, wmin // 2147483648 AS fh
                   FROM win WHERE wn = 4)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                CAST(count(*) AS BIGINT) AS n_shared
         FROM fp a JOIN fp b ON a.fh = b.fh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY id1, id2"""
  }

  lazy val d12Oracle: String = {
    def dg(p: Int) = s"(instr('0123456789abcdef', substr(h, $p, 1)) - 1)"
    def chunk(k: Int) =
      s"((((${dg(4 * k + 1)}) * 16 + ${dg(4 * k + 2)}) * 16 + ${dg(4 * k + 3)}) * 16 + ${dg(4 * k + 4)})"
    val sumCols = (for (k <- 0 to 3; j <- 0 to 15) yield
      s"sum(cnt * ((CAST(floor(c$k / ${1 << (15 - j)}) AS INT) % 2) * 2 - 1)) AS s${k}_$j")
      .mkString(", ")
    val fCols = (0 to 3).map { k =>
      (0 to 15).map(j => s"CASE WHEN s${k}_$j > 0 THEN ${1 << (15 - j)} ELSE 0 END")
        .mkString("(", " + ", s") AS f$k")
    }.mkString(", ")
    val ham = "bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) " +
      "+ bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))"
    raw"""WITH toks AS (SELECT doc_id, tok, count(*) AS cnt
                    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                          FROM documents WHERE doc_id < 500)
                    GROUP BY 1, 2),
         hx AS (SELECT doc_id, cnt, md5(tok) AS h FROM toks),
         ch AS (SELECT doc_id, cnt, ${chunk(0)} AS c0, ${chunk(1)} AS c1,
                       ${chunk(2)} AS c2, ${chunk(3)} AS c3 FROM hx),
         sums AS (SELECT doc_id, $sumCols FROM ch GROUP BY doc_id),
         fps AS (SELECT doc_id, $fCols FROM sums),
         bands AS (SELECT doc_id, f0, f1, f2, f3, k,
                          CASE k WHEN 0 THEN f0 WHEN 1 THEN f1 WHEN 2 THEN f2 ELSE f3 END AS bh
                   FROM fps CROSS JOIN (SELECT unnest(range(4)) AS k)),
         cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                         a.f0 AS a0, a.f1 AS a1, a.f2 AS a2, a.f3 AS a3,
                         b.f0 AS b0, b.f1 AS b1, b.f2 AS b2, b.f3 AS b3
                  FROM bands a JOIN bands b
                    ON a.k = b.k AND a.bh = b.bh AND a.doc_id < b.doc_id)
     SELECT id1, id2, CAST($ham AS BIGINT) AS hamming
     FROM cand WHERE $ham <= 3
     ORDER BY id1, id2"""
  }

  /** The q40 label-propagation oracle: the same transition-graph CTEs
    * as [[pageRankOracle]] (symmetrized), then `iters` synchronous
    * rounds replayed exactly — BIGINT weight sums, argmax via
    * row_number ordered (m DESC, label), previous-label fallback for
    * nodes with no incoming edge. Deterministic end to end, so the
    * final labeling hash-matches.
    */
  def lpaOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val prev = s"l${k - 1}"
      s"""s$k AS (SELECT e.dst AS id, l.label, CAST(sum(e.w) AS BIGINT) AS m
              FROM $prev l JOIN eu e ON e.src = l.id GROUP BY 1, 2),
         b$k AS (SELECT id, label FROM s$k
              QUALIFY row_number() OVER (PARTITION BY id ORDER BY m DESC, label) = 1),
         l$k AS (SELECT n.id, coalesce(b.label, p.label) AS label
              FROM nodes n LEFT JOIN b$k b ON b.id = n.id
              JOIN $prev p ON p.id = n.id)"""
    }.mkString(",\n         ")
    s"""WITH tr AS (SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS w
                FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS src_type,
                      event_type AS dst_type FROM events)
                WHERE src_type IS NOT NULL GROUP BY 1, 2),
         dict AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT) - 1 AS nid
                FROM (SELECT DISTINCT src_type AS t FROM tr
                      UNION SELECT DISTINCT dst_type FROM tr)),
         e AS (SELECT ds.nid AS src, dd2.nid AS dst, w
               FROM tr JOIN dict ds ON ds.t = tr.src_type
                       JOIN dict dd2 ON dd2.t = tr.dst_type),
         eu AS (SELECT src, dst, w FROM e
                UNION ALL SELECT dst, src, w FROM e),
         nodes AS (SELECT DISTINCT nid AS id
                FROM (SELECT src AS nid FROM eu UNION ALL SELECT dst FROM eu)),
         l0 AS (SELECT id, id AS label FROM nodes),
         $rounds
     SELECT d1.t AS event_type, d2.t AS community
     FROM l$iters f
     JOIN dict d1 ON d1.nid = f.id
     JOIN dict d2 ON d2.nid = f.label
     ORDER BY event_type"""
  }

  /** The q38 PageRank oracle: the event-type transition graph built
    * exactly like the Spark side (per-user lag in (epoch_us, id)
    * order, count-weighted edges, alphabetical dense node ids), then
    * `iters` FIXED iterations replayed with the identical arithmetic
    * shape — decimal(38,18) contribution sums cast back to double,
    * the (1−d)/N base and d·(in + dm/N) combine in the same
    * parenthesization, every constant CAST to DOUBLE so DuckDB's
    * decimal literals can't change a bit. Bit-equal ranks after 3
    * iterations are the §5 float discipline extended to an ITERATIVE
    * algorithm.
    */
  /** The shared PageRank iteration CTE chain (r0 → r`iters`): one
    * contribution aggregate + one dangling-mass fold + one combine
    * per round, each with the exact arithmetic shape the Spark side
    * executes. Callers supply the CTEs `sh` (src, dst, sh), `nodes`
    * (id), `nn` (n), `dang` (id) and `r0` (id, rank).
    */
  private def pageRankIterCtes(d: String, iters: Int): String = {
    val one = "CAST(1 AS DOUBLE)"
    val dd = s"CAST($d AS DOUBLE)"
    val nD = "CAST(nn.n AS DOUBLE)"
    (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS (SELECT sh.dst AS id,
                CAST(sum(CAST(r.rank * sh.sh AS DECIMAL(38,18))) AS DOUBLE) AS inx
              FROM $prev r JOIN sh ON sh.src = r.id GROUP BY 1),
         d$k AS (SELECT CAST(coalesce(sum(CAST(rank AS DECIMAL(38,18))), 0) AS DOUBLE) AS dm
              FROM $prev WHERE id IN (SELECT id FROM dang)),
         r$k AS (SELECT nodes.id,
                ($one - $dd) / $nD
                  + $dd * (coalesce(c.inx, CAST(0 AS DOUBLE)) + d$k.dm / $nD) AS rank
              FROM nodes CROSS JOIN nn CROSS JOIN d$k
              LEFT JOIN c$k c ON c.id = nodes.id)"""
    }.mkString(",\n         ")
  }

  /** The t45 TextRank oracle: tokenize → top-`vocab` dictionary →
    * adjacent-pair edges symmetrized → the SAME PageRank iteration
    * CTE chain as q38 ([[pageRankIterCtes]]) → top-`topK` cut with
    * the op's (rank DESC, token) total order.
    */
  def textrankOracle(d: String, iters: Int, vocab: Int,
                     topK: Int): String = {
    val iterCtes = pageRankIterCtes(d, iters)
    s"""WITH tk AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                      t -> len(t) > 0) AS toks FROM documents),
         alltok AS (SELECT unnest(toks) AS tok FROM tk),
         freq AS (SELECT tok, count(*) AS f FROM alltok GROUP BY 1),
         dict AS (SELECT tok, CAST(row_number()
                    OVER (ORDER BY f DESC, tok) AS BIGINT) - 1 AS nid
                  FROM freq ORDER BY f DESC, tok LIMIT $vocab),
         pairs AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                   FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
         e0 AS (SELECT d1.nid AS src, d2.nid AS dst FROM pairs
                JOIN dict d1 ON d1.tok = pairs.w1
                JOIN dict d2 ON d2.tok = pairs.w2
                WHERE d1.nid <> d2.nid),
         e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM
               (SELECT src, dst FROM e0
                UNION ALL SELECT dst, src FROM e0) GROUP BY 1, 2),
         nodes AS (SELECT DISTINCT nid AS id
                FROM (SELECT src AS nid FROM e UNION ALL SELECT dst FROM e)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
         sh AS (SELECT src, dst, CAST(w AS DOUBLE) / CAST(ow AS DOUBLE) AS sh
                FROM e JOIN ow USING (src)),
         dang AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
         r0 AS (SELECT id, CAST(1 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS rank
                FROM nodes CROSS JOIN nn),
         $iterCtes,
         ranked AS (SELECT dict.tok, round(r.rank, 9) AS score
                    FROM r$iters r JOIN dict ON dict.nid = r.id),
         top AS (SELECT CAST(row_number()
                   OVER (ORDER BY score DESC, tok) AS BIGINT) AS pos,
                   tok, score FROM ranked)
     SELECT pos, tok AS token, score FROM top
     WHERE pos <= $topK ORDER BY pos"""
  }

  /** The r39 Holt oracle: the SAME integer filter coefficients as the
    * op (both sides call [[operators.Windows.holtCoeffs]]), folded as
    * DECIMAL over the trailing-window self-join, one IEEE division by
    * the power-of-two denominator.
    */
  def holtOracleSql(window: Int): String = {
    val (lc, bc, s) = operators.Windows.holtCoeffs(window)
    val den = java.math.BigDecimal.valueOf(math.pow(2.0, s)).toPlainString
    val fCase = s"CASE CAST(a.hr - b.hr AS INTEGER) " + (1 to window).map(d =>
      s"WHEN $d THEN CAST(${lc(window - d) + bc(window - d)} AS BIGINT)")
      .mkString(" ") + " END"
    val bCase = s"CASE CAST(a.hr - b.hr AS INTEGER) " + (1 to window).map(d =>
      s"WHEN $d THEN CAST(${bc(window - d)} AS BIGINT)")
      .mkString(" ") + " END"
    s"""WITH h AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hr,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              m AS (SELECT key, min(hr) AS h0 FROM h GROUP BY 1),
              j AS (SELECT a.key, a.hr, a.c,
                      sum(CAST(b.c * ($fCase) AS DECIMAL(38,0))) AS num,
                      sum(CAST(b.c * ($bCase) AS DECIMAL(38,0))) AS bnum
                    FROM h a JOIN h b
                      ON b.key = a.key AND b.hr BETWEEN a.hr - $window AND a.hr - 1
                    GROUP BY 1, 2, 3),
              f AS (SELECT j.key, hr, c, CAST(num AS DOUBLE) / $den AS fc,
                           CAST(bnum AS DOUBLE) / $den AS sl
                    FROM j JOIN m ON m.key = j.key
                    WHERE j.hr >= m.h0 + $window)
         SELECT key AS event_type, hr * 3600 AS hr_start,
                CAST(c AS BIGINT) AS n_events,
                round(fc, 6) AS holt_forecast,
                round(sl, 6) AS holt_slope,
                (fc > 0.0 AND CAST(c AS DOUBLE) >= 3.0 * fc) AS is_spike,
                (fc > 0.0 AND CAST(c AS DOUBLE) <= fc / 3.0) AS is_drop
         FROM f ORDER BY event_type, hr_start"""
  }

  def pageRankOracle(d: String, iters: Int): String = {
    val one = "CAST(1 AS DOUBLE)"
    val nD = "CAST(nn.n AS DOUBLE)"
    val iterCtes = pageRankIterCtes(d, iters)
    s"""WITH tr AS (SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS w
                FROM (SELECT lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS src_type,
                      event_type AS dst_type FROM events)
                WHERE src_type IS NOT NULL GROUP BY 1, 2),
         dict AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT) - 1 AS nid
                FROM (SELECT DISTINCT src_type AS t FROM tr
                      UNION SELECT DISTINCT dst_type FROM tr)),
         e AS (SELECT ds.nid AS src, dd2.nid AS dst, w
               FROM tr JOIN dict ds ON ds.t = tr.src_type
                       JOIN dict dd2 ON dd2.t = tr.dst_type),
         nodes AS (SELECT DISTINCT nid AS id
                FROM (SELECT src AS nid FROM e UNION ALL SELECT dst FROM e)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
         sh AS (SELECT src, dst, CAST(w AS DOUBLE) / CAST(ow AS DOUBLE) AS sh
                FROM e JOIN ow USING (src)),
         dang AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
         r0 AS (SELECT id, $one / $nD AS rank FROM nodes CROSS JOIN nn),
         $iterCtes
     SELECT dict.t AS event_type, round(r.rank, 9) AS rank
     FROM r$iters r JOIN dict ON dict.nid = r.id
     ORDER BY event_type"""
  }

  /** The q38b PageRank oracle at REAL graph scale: the DIRECTED
    * bipartite order→part co-purchase graph (order node 2k, part node
    * 2k+1 — q37/q39's encoding), quantity-weighted. Every part node is
    * dangling (no out-edges), so the dangling-mass redistribution —
    * trivial on q38's 5-node type graph — carries half the graph's
    * rank mass every iteration here. Same iteration arithmetic as
    * [[pageRankOracle]] via the shared CTE chain.
    */
  def pageRankBigOracle(d: String, iters: Int): String = {
    val one = "CAST(1 AS DOUBLE)"
    val nD = "CAST(nn.n AS DOUBLE)"
    val iterCtes = pageRankIterCtes(d, iters)
    s"""WITH e AS (SELECT CAST(l_orderkey * 2 AS BIGINT) AS src,
                      CAST(l_partkey * 2 + 1 AS BIGINT) AS dst,
                      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
               FROM lineitem GROUP BY 1, 2),
         nodes AS (SELECT DISTINCT id
                FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
         sh AS (SELECT src, dst, CAST(w AS DOUBLE) / CAST(ow AS DOUBLE) AS sh
                FROM e JOIN ow USING (src)),
         dang AS (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),
         r0 AS (SELECT id, $one / $nD AS rank FROM nodes CROSS JOIN nn),
         $iterCtes
     SELECT CASE WHEN r.id % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
            CAST(r.id // 2 AS BIGINT) AS node_id, round(r.rank, 9) AS rank
     FROM r$iters r
     ORDER BY kind, node_id"""
  }

  /** The q40b label-propagation oracle at real graph scale: the
    * SYMMETRIZED quantity-weighted co-purchase graph, `iters`
    * synchronous rounds replayed exactly as in [[lpaOracle]] — BIGINT
    * weight sums, (m DESC, label) argmax, previous-label fallback.
    */
  def lpaBigOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val prev = s"l${k - 1}"
      s"""s$k AS (SELECT e.dst AS id, l.label, CAST(sum(e.w) AS BIGINT) AS m
              FROM $prev l JOIN eu e ON e.src = l.id GROUP BY 1, 2),
         b$k AS (SELECT id, label FROM s$k
              QUALIFY row_number() OVER (PARTITION BY id ORDER BY m DESC, label) = 1),
         l$k AS (SELECT n.id, coalesce(b.label, p.label) AS label
              FROM nodes n LEFT JOIN b$k b ON b.id = n.id
              JOIN $prev p ON p.id = n.id)"""
    }.mkString(",\n         ")
    s"""WITH e AS (SELECT CAST(l_orderkey * 2 AS BIGINT) AS src,
                      CAST(l_partkey * 2 + 1 AS BIGINT) AS dst,
                      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
               FROM lineitem GROUP BY 1, 2),
         eu AS (SELECT src, dst, w FROM e
                UNION ALL SELECT dst, src, w FROM e),
         nodes AS (SELECT DISTINCT id
                FROM (SELECT src AS id FROM eu UNION ALL SELECT dst FROM eu)),
         l0 AS (SELECT id, id AS label FROM nodes),
         $rounds
     SELECT CASE WHEN f.id % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
            CAST(f.id // 2 AS BIGINT) AS node_id,
            CASE WHEN f.label % 2 = 0 THEN 'order' ELSE 'part' END AS label_kind,
            CAST(f.label // 2 AS BIGINT) AS label_id
     FROM l$iters f
     ORDER BY kind, node_id"""
  }

}
