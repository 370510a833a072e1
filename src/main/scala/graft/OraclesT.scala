package graft

/** DuckDB oracle SQL for the text-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesT {
  import OracleHelpers._

  private val t19GopherSql: String =
    """WITH b AS (SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0) AS toks,
               string_split(text, chr(10)) AS lines
             FROM documents),
            sig AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS n_words,
              CAST(greatest(len(toks), 1) AS DOUBLE) AS nws,
              len(regexp_replace(text, '\s', '', 'g')) AS chars_in,
              len(text) - len(replace(text, '#', '')) AS nhash,
              (len(text) - len(replace(text, '...', ''))) / 3 AS nell,
              CAST(greatest(len(lines), 1) AS DOUBLE) AS nlines,
              len(list_filter(lines, l -> starts_with(ltrim(l), '-')
                  OR starts_with(ltrim(l), '*')
                  OR starts_with(ltrim(l), '•'))) AS bl,
              len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS el,
              len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS aw,
              CAST(len(list_filter(toks, t -> list_contains(
                ['the','be','to','of','and','that','have','with'], lower(t))))
                AS BIGINT) AS n_stop
            FROM b),
            o AS (SELECT doc_id, n_words,
              round(CAST(chars_in AS DOUBLE) / nws, 6) AS mean_word_len,
              round(CAST(nhash + nell AS DOUBLE) / nws, 6) AS symbol_ratio,
              round(CAST(bl AS DOUBLE) / nlines, 6) AS bullet_frac,
              round(CAST(el AS DOUBLE) / nlines, 6) AS ellipsis_frac,
              round(CAST(aw AS DOUBLE) / nws, 6) AS alpha_frac,
              n_stop FROM sig)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
                ellipsis_frac, alpha_frac, n_stop,
                (n_words >= 50 AND n_words <= 100000
                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND symbol_ratio <= 0.1
                 AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
                 AND alpha_frac >= 0.8 AND n_stop >= 2) AS pass
         FROM o ORDER BY doc_id"""

  val sql: Map[String, String] = Map(
    "t50_html_extract" ->
      // the page build and the whole extraction chain replayed
      // verbatim: literal replace() for escape/decode (decode &amp;
      // LAST — the HTML double-escape rule), RE2 regexes with 'g'
      // and inline (?is) for the block drops, explicit [ \t\n\r]
      // whitespace class
      """WITH h AS (SELECT doc_id,
              '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
              || ' &amp; co</title><style>body { color: #fff; }</style>'
              || '<script type="text/javascript">if (1 < 2 && x > 0) { alert("hi"); }</script></head>'
              || '<body><!-- nav --><h1>' || source || '</h1><p>'
              || replace(replace(replace(text, '&', '&amp;'),
                   '<', '&lt;'), '>', '&gt;')
              || '</p><div id="foot">Contact&nbsp;&quot;us&quot; &#39;now&#39;</div></body></html>'
                AS html
            FROM documents),
          x AS (SELECT doc_id,
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
         SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
                CAST(len(list_filter(string_split(t, ' '),
                  s -> len(s) > 0)) AS BIGINT) AS n_tokens,
                substr(t, 1, 24) AS lead
         FROM x ORDER BY doc_id""",

    "t51_link_extract" ->
      // the page-with-anchors build and the href pull replayed: same
      // anchor rule (next-doc always, hub on every 3rd), same RE2
      // group extraction, host parsed off each href
      """WITH h AS (SELECT doc_id, source,
              '<html><body><p>' || text || '</p>'
              || '<a href="http://' || source || '/doc/'
              || CAST(doc_id + 1 AS VARCHAR) || '">next</a>'
              || CASE WHEN doc_id % 3 = 0
                   THEN '<a href="http://hub.example/doc/0">hub</a>'
                   ELSE '' END
              || '</body></html>' AS html
            FROM documents),
          l AS (SELECT source AS host,
              unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS href
            FROM h)
         SELECT host,
                regexp_extract(href, '^http://([^/]+)/', 1) AS target_host,
                CAST(count(*) AS BIGINT) AS n_links
         FROM l GROUP BY 1, 2 ORDER BY host, target_host""",

    "t08_repetition" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                       FROM documents),
            u AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
            us AS (SELECT doc_id,
                          CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS tf,
                          CAST(sum(c) AS BIGINT) AS n_toks
                   FROM u GROUP BY 1),
            tl AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                   FROM documents),
            bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS big
                   FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tl)),
            b AS (SELECT doc_id, big, count(*) AS c FROM bg GROUP BY 1, 2),
            bs AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS bf
                   FROM b GROUP BY 1)
         SELECT us.doc_id, n_toks, round(tf, 6) AS top_tok_frac,
                round(coalesce(bs.bf, 0.0), 6) AS top_bigram_frac
         FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
         ORDER BY us.doc_id""",

    "t49_vocab_coverage" ->
      """WITH tk AS (SELECT tok FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            c AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
            rk AS (SELECT tok, c, CAST(row_number() OVER (
                     ORDER BY c DESC, tok) AS BIGINT) AS rk FROM c),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM c),
            ks(vocab_k) AS (VALUES (CAST(100 AS BIGINT)), (1000),
                                   (4000), (16000)),
            cov AS (SELECT vocab_k, CAST(count(*) AS BIGINT) AS n_terms,
                      CAST(sum(c) AS BIGINT) AS covered_tokens
                    FROM rk CROSS JOIN ks WHERE rk <= vocab_k GROUP BY 1)
         SELECT vocab_k, n_terms, covered_tokens, tot AS total_tokens,
                round(CAST(covered_tokens AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                  AS coverage
         FROM cov CROSS JOIN tot ORDER BY vocab_k""",

    "t09_top_ngrams" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t))
         SELECT shingle, CAST(count(*) AS BIGINT) AS n
         FROM sh GROUP BY 1 ORDER BY n DESC, shingle LIMIT 20""",

    "t10_heavy_hitters_by_key" ->
      """SELECT user_id % 10 AS seg, event_type AS item,
                CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY seg, cnt DESC, item""",

    "t29_corpus_card" -> (
      // per-doc metrics = the t02 quality twin + the p12 token-count
      // twin, joined on doc_id; same decimal-sum mean, same ROLLUP
      s"""WITH q AS ($qualitySubSql),
             d AS (SELECT doc_id, source, lang,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS nt
                   FROM documents),
             j AS (SELECT d.source, d.lang, d.nt, q.quality
                   FROM d JOIN q USING (doc_id))
         SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL'
                     ELSE coalesce(source, '(null)') END AS source,
                CASE WHEN GROUPING(lang) = 1 THEN 'ALL'
                     ELSE coalesce(lang, '(null)') END AS lang,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nt) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN nt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                round(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS mean_quality
         FROM j GROUP BY ROLLUP(source, lang) ORDER BY 1, 2"""),

    "t30_stupid_backoff" -> t30Oracle,

    "t36_backoff_buckets" -> t36Oracle,

    "t33_heaps" ->
      // same prefix construction (first-doc vocab trick), same moment
      // discipline as the t24 oracle, beta un-negated
      """WITH mx AS (SELECT max(doc_id) + 1 AS span FROM documents),
            tk AS (SELECT doc_id, tok FROM (
                     SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                     FROM documents WHERE doc_id IS NOT NULL)
                   WHERE len(tok) > 0),
            fi AS (SELECT tok, min(doc_id) AS mid FROM tk GROUP BY 1),
            ks AS (SELECT unnest(range(1, 9)) AS k),
            np AS (SELECT k, count(*) AS nn FROM ks, tk, mx
                   WHERE doc_id < (span * k) // 8 GROUP BY k),
            vp AS (SELECT k, count(*) AS vv FROM ks, fi, mx
                   WHERE mid < (span * k) // 8 GROUP BY k),
            pts AS (SELECT nn, vv FROM np JOIN vp USING (k)
                    WHERE nn > 0 AND vv > 0),
            t AS (SELECT
                CAST(round(ln(CAST(nn AS DOUBLE)), 6) AS DECIMAL(24,8)) AS x,
                CAST(round(ln(CAST(vv AS DOUBLE)), 6) AS DECIMAL(24,8)) AS y,
                CAST(round(ln(CAST(nn AS DOUBLE)) * ln(CAST(vv AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xy,
                CAST(round(ln(CAST(nn AS DOUBLE)) * ln(CAST(nn AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xx,
                CAST(round(ln(CAST(vv AS DOUBLE)) * ln(CAST(vv AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS yy
              FROM pts),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx,
                         sum(yy) AS syy FROM t)
         SELECT n AS n_points,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
                round((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS ln_k,
                round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM s""",

    "t34_bpe_train" -> (bpeCtes(8) + "\n" +
      (1 to 8).map(k =>
          s"SELECT CAST($k AS BIGINT) AS rank, pair, CAST(f AS BIGINT) AS freq FROM m$k")
        .mkString("", "\nUNION ALL ", "\nORDER BY rank")),

    "t37_bpe_fertility" -> (bpeCtes(8) +
      s""",
            tk AS (SELECT lang,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
                   FROM documents WHERE lang IS NOT NULL),
            seg AS (SELECT lang, len(w) AS ch,
                      ${(1 to 8).foldLeft("s0")((e, k) =>
                        s"replace($e, ' ' || m$k.pair || ' ', ' ' || replace(m$k.pair, ' ', '') || ' ')")} AS s
                    FROM (SELECT lang, w,
                            ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s0
                          FROM tk WHERE w <> '') ${(1 to 8).map(k => s", m$k").mkString}),
            agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
                           CAST(sum(ch) AS BIGINT) AS n_chars,
                           CAST(sum(len(string_split(trim(s), ' '))) AS BIGINT) AS n_bpe
                    FROM seg GROUP BY 1)
         SELECT lang, n_words, n_chars, n_bpe,
                round(CAST(n_bpe AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS fertility,
                round(CAST(n_chars AS DOUBLE) / CAST(n_bpe AS DOUBLE), 6) AS chars_per_token
         FROM agg ORDER BY lang"""),

    "t35_bpe_tokens" -> (bpeCtes(8) +
      // apply the learned table in rank order: the same padded
      // replaces, chained m1..m8 (cross joins of the 1-row argmax
      // CTEs; 8 merges always exist on these corpora — a vocabulary
      // too small to yield them would empty the chain in BOTH engines
      // asymmetrically, so keep merges <= the guaranteed supply)
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
                       FROM seg GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_bpe
         FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
         LEFT JOIN perdoc p ON p.doc_id = d.doc_id
         ORDER BY d.doc_id"""),

    "t32_pmi" ->
      // identical pair/token streams and the identical
      // division-association in the PMI expression, rounded to 6
      """WITH tk AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                       t -> len(t) > 0) AS toks FROM documents),
            pr AS (SELECT toks[i] AS w1, toks[i+1] AS w2
                   FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk)
                   WHERE len(toks) >= 2),
            bc AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY 1, 2),
            m AS (SELECT sum(n_pair) AS m FROM bc),
            un AS (SELECT w, count(*) AS c FROM (
                     SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
            n AS (SELECT sum(c) AS n FROM un),
            sc AS (SELECT b.w1, b.w2, b.n_pair,
                     round(ln((CAST(b.n_pair AS DOUBLE) / CAST(m.m AS DOUBLE)) /
                       ((CAST(ua.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                        (CAST(ub.c AS DOUBLE) / CAST(n.n AS DOUBLE)))), 6) AS pmi
                   FROM bc b JOIN un ua ON ua.w = b.w1
                             JOIN un ub ON ub.w = b.w2
                   CROSS JOIN m CROSS JOIN n
                   WHERE b.n_pair >= 20)
         SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, pmi FROM (
           SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk FROM sc)
         WHERE rk <= 30 ORDER BY pmi DESC, w1, w2""",

    "t31_novelty" ->
      // identical tokenization/shingle unit as the d04 CTE, full
      // corpus (the df join is linear, unlike the pair joins)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                    FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                   FROM (SELECT doc_id, toks,
                           unnest(range(1, len(toks) - 1)) AS i FROM t)),
            dfq AS (SELECT g, count(*) AS dfc FROM sh GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                round(CAST(sum(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*), 6) AS novelty
         FROM sh JOIN dfq USING (g) GROUP BY 1 ORDER BY doc_id""",

    "t07_redact" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                                 '<EMAIL>', 'g'),
                  '[0-9]{9,}', '<NUM>', 'g') AS redacted
         FROM documents ORDER BY doc_id""",

    "t06_heavy_hitters" ->
      """SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1 ORDER BY cnt DESC, item""",

    "t01_lang_id" -> langIdOracle,

    "t40_code_switch" -> {
      // sentence explode (the d23 segmentation) -> the shared langId
      // chain -> per-doc histogram + dominant pick with the same
      // (count desc, lang asc) tie-break
      val perSentence = langIdOver(
        """(SELECT doc_id, lower(sent) AS txt,
                   string_split_regex(lower(sent), '\s+') AS toks
            FROM (SELECT doc_id, trim(s) AS sent FROM (
                    SELECT doc_id, unnest(regexp_extract_all(text,
                      '[^.!?]+[.!?]+|[^.!?]+')) AS s
                    FROM documents))
            WHERE sent <> '')""", "doc_id")
      s"""WITH lp AS ($perSentence),
            lc AS (SELECT doc_id, lang_pred, CAST(count(*) AS BIGINT) AS c
                   FROM lp GROUP BY 1, 2),
            rk AS (SELECT doc_id, lang_pred, c,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, lang_pred) AS rn,
                     sum(c) OVER (PARTITION BY doc_id) AS tot,
                     count(*) OVER (PARTITION BY doc_id) AS nl
                   FROM lc)
         SELECT doc_id, CAST(tot AS BIGINT) AS n_sents,
                CAST(nl AS BIGINT) AS n_langs,
                lang_pred AS dominant_lang,
                round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS dominant_share,
                (nl > 1 AND round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) < 0.9)
                  AS is_mixed
         FROM rk WHERE rn = 1 ORDER BY doc_id"""
    },

    "t05_lang_eval" ->
      s"""WITH pred AS ($langIdOracle)
          SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
          FROM documents d JOIN pred p ON d.doc_id = p.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "t02_quality" -> (s"SELECT doc_id, quality FROM ($qualitySubSql)" +
      " ORDER BY doc_id"),

    "t03_tokens" ->
      """SELECT doc_id,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",

    "t04_fingerprint" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY text ORDER BY keep_id""",

    "t11_normalize" ->
      """WITH n AS (SELECT doc_id, text,
                      trim(regexp_replace(regexp_replace(text,
                        '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
                    FROM documents)
         SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
                CAST(length(norm) AS BIGINT) AS n_norm,
                CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS BIGINT) AS changed,
                norm AS norm_text
         FROM n ORDER BY doc_id""",

    "t12_boilerplate" ->
      """WITH framed AS (SELECT doc_id,
               'subscribe to our newsletter' || chr(10) || text || chr(10) ||
               CASE WHEN doc_id % 2 = 0 THEN 'all rights reserved'
                    ELSE 'thanks for reading' END ||
               chr(10) || 'ref ' || doc_id AS text
             FROM documents),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM framed),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            freq AS (SELECT line FROM (
                       SELECT line, count(DISTINCT doc_id) AS nd
                       FROM lines GROUP BY 1)
                     WHERE nd >= 100 AND len(line) > 0),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1),
            kept AS (SELECT doc_id, line, i FROM lines
                     WHERE line NOT IN (SELECT line FROM freq))
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "t15_collapse_runs" ->
      """WITH framed AS (SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'loading...' || chr(10) ELSE '' END ||
               'loading...' || chr(10) || text || chr(10) || text || chr(10) || 'done' AS text
             FROM documents),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM framed),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            marked AS (SELECT doc_id, line, i,
                         lag(line) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                       FROM lines),
            kept AS (SELECT doc_id, line, i FROM marked
                     WHERE prev IS NULL OR prev <> line),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id ORDER BY k.doc_id""",

    "t27_c4_line_filter" ->
      """WITH framed AS (SELECT doc_id,
               'home | about | contact' || chr(10) ||
               'this page is archived for reference.' || chr(10) ||
               text || '.' || chr(10) ||
               'comments are closed on this article.' || chr(10) ||
               'please enable javascript to continue.' || chr(10) ||
               'read our privacy policy.' ||
               CASE WHEN doc_id % 97 = 0
                    THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END ||
               CASE WHEN doc_id % 89 = 0
                    THEN chr(10) || 'function() { return; }' ELSE '' END AS text
             FROM documents),
            pages AS (SELECT doc_id, text FROM framed
                      WHERE NOT contains(lower(text), 'lorem ipsum')
                        AND NOT contains(text, '{')),
            ls AS (SELECT doc_id, string_split_regex(text, '\r?\n') AS a FROM pages),
            lines AS (SELECT doc_id, a[i] AS line, i
                      FROM (SELECT doc_id, a, unnest(range(1, len(a) + 1)) AS i
                            FROM ls)),
            kept AS (SELECT doc_id, line, i FROM lines
                     WHERE regexp_matches(trim(line), '[.!?"]$')
                       AND len(string_split_regex(trim(line), '\s+')) >= 3
                       AND NOT contains(lower(trim(line)), 'javascript')
                       AND NOT contains(lower(trim(line)), 'privacy policy')
                       AND NOT contains(lower(trim(line)), 'terms of use')
                       AND NOT contains(lower(trim(line)), 'cookie policy')
                       AND NOT contains(lower(trim(line)), 'uses cookies')
                       AND NOT contains(lower(trim(line)), 'use of cookies')
                       AND NOT contains(lower(trim(line)), 'use cookies')),
            tot AS (SELECT doc_id, count(*) AS n_tot FROM lines GROUP BY 1)
         SELECT k.doc_id,
                string_agg(k.line, chr(10) ORDER BY k.i) AS text_clean,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(any_value(t.n_tot) - count(*) AS BIGINT) AS n_dropped
         FROM kept k JOIN tot t ON k.doc_id = t.doc_id
         GROUP BY k.doc_id HAVING count(*) >= 3 ORDER BY k.doc_id""",

    "t28_readability" ->
      """WITH framed AS (SELECT doc_id,
               'a short opening line. ' || text || '. the closing line ends here.' AS text
             FROM documents),
            s0 AS (SELECT doc_id,
                     len(list_filter(list_transform(
                       regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+'),
                       x -> trim(x)), x -> len(x) > 0)) AS n_sents,
                     list_filter(string_split_regex(lower(text), '\s+'),
                       t -> len(t) > 0) AS ws
                   FROM framed),
            s1 AS (SELECT doc_id, n_sents, len(ws) AS n_words,
                     list_sum(list_transform(ws,
                       w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS n_syllables
                   FROM s0)
         SELECT doc_id,
                CAST(n_sents AS BIGINT) AS n_sents,
                CAST(n_words AS BIGINT) AS n_words,
                CAST(n_syllables AS BIGINT) AS n_syllables,
                round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)) +
                      11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
                      15.59, 6) AS fk_grade
         FROM s1 WHERE n_words > 0 AND n_sents > 0 ORDER BY doc_id""",

    "t17_bm25" -> t17Oracle,

    "t39_sentence_stats" ->
      // same terminal-punctuation split, trim, empty drop, word count
      """WITH s AS (SELECT doc_id, trim(x) AS sent FROM (
                SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS x
                FROM documents)
              WHERE length(trim(x)) > 0),
            w AS (SELECT doc_id,
                    CAST(len(string_split_regex(sent, '\s+')) AS BIGINT) AS w
                  FROM s)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
                round(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                  AS mean_words,
                CAST(max(w) AS BIGINT) AS max_words
         FROM w GROUP BY 1 ORDER BY 1""",

    "t38_tfidf_terms" ->
      // the t17 token chain verbatim; (tf/dl)*ln(N/df) in pinned
      // order; post-round ties rank by term
      """WITH tk AS (SELECT doc_id, tok AS term FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                   FROM tk GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
            dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM dl),
            sc AS (SELECT doc_id, term,
                     round((CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE))
                           * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)
                       AS tfidf
                   FROM tf JOIN dl USING (doc_id) JOIN dft USING (term)
                   CROSS JOIN n)
         SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rank FROM (
           SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term) AS rk FROM sc)
         WHERE rk <= 3 ORDER BY doc_id, rank""",

    "t18_ppl_buckets" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            vocab AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM vocab),
            sc AS (SELECT doc_id,
                     round(CAST(sum(CAST(round(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                             AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
                   FROM tk JOIN vocab USING (tok) CROSS JOIN tt
                   GROUP BY doc_id),
            sl AS (SELECT sc.doc_id, d.lang, sc.mean_logprob
                   FROM sc JOIN documents d USING (doc_id)),
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
         ORDER BY doc_id""",

    "t42_kn_buckets" ->
      // t41's KN chain verbatim feeding t18's tercile CTE verbatim
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
                   FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS np,
                          CAST(count(*) AS BIGINT) AS t1
                   FROM bg GROUP BY 1),
            ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                   FROM bg GROUP BY 1),
            bbt AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg),
            lp AS (SELECT doc_id,
                     CAST(CAST(round(ln(
                         (CAST(nb AS DOUBLE) - 0.75) / CAST(np AS DOUBLE)
                         + 0.75 * CAST(t1 AS DOUBLE) / CAST(np AS DOUBLE)
                           * (CAST(cont AS DOUBLE) / CAST(bb AS DOUBLE))), 6)
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT) AS lpm
                   FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
                        JOIN ct USING (w2) CROSS JOIN bbt),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(lpm) AS BIGINT) AS s
                    FROM lp GROUP BY doc_id),
            sl AS (SELECT a.doc_id, d.lang,
                          CAST(-(((-s) * 2 + n) // (2 * n)) AS DOUBLE)
                            / 1000000.0 AS mean_logprob
                   FROM agg a JOIN documents d USING (doc_id)),
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
         ORDER BY doc_id""",

    "t41_kneser_ney" ->
      // identical KN chain: bigram types derive prefix totals +
      // continuation fan-in + the type-count scalar; the per-pair
      // double expression is written in the same association order
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS nb
                   FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS np,
                          CAST(count(*) AS BIGINT) AS t1
                   FROM bg GROUP BY 1),
            ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                   FROM bg GROUP BY 1),
            bbt AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg),
            lp AS (SELECT doc_id,
                     CAST(CAST(round(ln(
                         (CAST(nb AS DOUBLE) - 0.75) / CAST(np AS DOUBLE)
                         + 0.75 * CAST(t1 AS DOUBLE) / CAST(np AS DOUBLE)
                           * (CAST(cont AS DOUBLE) / CAST(bb AS DOUBLE))), 6)
                       AS DECIMAL(24,6)) * 1000000 AS BIGINT) AS lpm
                   FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
                        JOIN ct USING (w2) CROSS JOIN bbt),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                           CAST(sum(lpm) AS BIGINT) AS s
                    FROM lp GROUP BY doc_id)
         SELECT doc_id, n_bigrams,
                CAST(-(((-s) * 2 + n_bigrams) // (2 * n_bigrams)) AS DOUBLE)
                  / 1000000.0 AS mean_logprob
         FROM agg ORDER BY doc_id""",

    "t16_bigram_logprob" ->
      """WITH tk AS (SELECT doc_id, list_filter(
                string_split_regex(lower(text), '\s+'),
                t -> len(t) > 0) AS toks FROM documents),
            pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                      FROM (SELECT doc_id, toks,
                              unnest(range(1, len(toks))) AS i FROM tk)
                      WHERE len(toks) >= 2),
            bg AS (SELECT w1, w2, count(*) AS nb FROM pairs GROUP BY 1, 2),
            pf AS (SELECT w1, count(*) AS np FROM pairs GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                round(CAST(sum(CAST(round(ln(CAST(nb AS DOUBLE) / CAST(np AS DOUBLE)), 6)
                        AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
         FROM pairs JOIN bg USING (w1, w2) JOIN pf USING (w1)
         GROUP BY doc_id ORDER BY doc_id""",

    "t13_unigram_logprob" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            vocab AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
            tt AS (SELECT sum(n) AS total FROM vocab)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
                round(CAST(sum(CAST(round(ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                        AS DECIMAL(24,8))) AS DOUBLE) / count(*), 6) AS mean_logprob
         FROM tk JOIN vocab USING (tok) CROSS JOIN tt
         GROUP BY doc_id ORDER BY doc_id""",

    "t14_token_entropy" ->
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
            n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1)
         SELECT c.doc_id, CAST(any_value(n.n) AS BIGINT) AS n_toks,
                round(CAST(-sum(CAST(round(
                    (CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                    ln(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)), 6)
                  AS DECIMAL(24,8))) AS DOUBLE), 6) AS token_entropy
         FROM c JOIN n ON c.doc_id = n.doc_id
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    "t20_cms" -> t20Oracle,

    "t21_quality_classifier" -> t21Oracle,

    "t44_calibration" ->
      // same composed chains; identical bucket chain and folds
      (s"""WITH s AS ($t21Oracle),
            l AS ($t19GopherSql),
            j AS (SELECT s.score, l.pass FROM s JOIN l USING (doc_id)),
            mm AS (SELECT min(score) AS mn, max(score) AS mx FROM j),
            b AS (SELECT CASE WHEN mm.mx = mm.mn THEN 0
                    ELSE CAST(least(floor((score - mm.mn) / (mm.mx - mm.mn)
                      * 10.0), 9.0) AS BIGINT) END AS bucket,
                    score, pass
                  FROM j, mm)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS mean_score,
                round(CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 6) AS pass_rate
         FROM b GROUP BY 1 ORDER BY bucket"""),

    "t43_classifier_auc" ->
      // the t21 and t19 oracle chains compose verbatim as subqueries;
      // the MW machinery is the generated q52 text over the joined
      // (verdict, score) frame
      graft.operators.Stats.mwOracleSql(
        "(SELECT CASE WHEN l.pass THEN 'b_pass' ELSE 'a_fail' END AS k, " +
          s"s.score AS x FROM ($t21Oracle) s " +
          "JOIN (" + t19GopherSql + ") l USING (doc_id)) j",
        "k", "x", Seq("a_fail", "b_pass")),

    "t22_gopher_repetition" -> t22Oracle,

    "t23_divergence" ->
      """WITH tk AS (SELECT source, tok FROM (
                SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
            vocab AS (SELECT tok, sum(c) AS ct FROM c GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS v,
                           CAST(sum(ct) AS BIGINT) AS n FROM vocab),
            lnq AS (SELECT tok, CAST(round(ln(
                      CAST(ct + 1 AS DOUBLE) /
                      CAST((SELECT n FROM tot) + (SELECT v FROM tot) AS DOUBLE)), 6)
                    AS DECIMAL(24,8)) AS lnq FROM vocab),
            lnqall AS (SELECT sum(lnq) AS lnq_all FROM lnq),
            g AS (SELECT source, CAST(sum(c) AS BIGINT) AS ng,
                         CAST(count(*) AS BIGINT) AS vg FROM c GROUP BY 1),
            terms AS (SELECT c.source,
                CAST(round((CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                    (ln(CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE))
                     - CAST(l.lnq AS DOUBLE)), 6) AS DECIMAL(24,8)) AS kl_t,
                CAST(round(-(CAST(c.c + 1 AS DOUBLE) /
                      CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                    CAST(l.lnq AS DOUBLE), 6) AS DECIMAL(24,8)) AS ce_t,
                l.lnq AS lnq
              FROM c JOIN lnq l USING (tok) JOIN g USING (source)),
            s AS (SELECT source, sum(kl_t) AS s_kl, sum(ce_t) AS s_ce,
                         sum(lnq) AS lnq_g FROM terms GROUP BY 1)
         SELECT s.source, g.ng AS n_toks, g.vg AS n_types,
                round(CAST(s_kl AS DOUBLE) +
                  (CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                  (CAST((SELECT v FROM tot) - g.vg AS DOUBLE) *
                     ln(CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE))
                   - CAST(lnq_all - lnq_g AS DOUBLE)), 6) AS kl,
                round(CAST(s_ce AS DOUBLE) -
                  (CAST(1 AS DOUBLE) / CAST(g.ng + (SELECT v FROM tot) AS DOUBLE)) *
                  CAST(lnq_all - lnq_g AS DOUBLE), 6) AS ce
         FROM s JOIN g USING (source) CROSS JOIN lnqall
         ORDER BY source""",

    "t26_lexical_diversity" ->
      """WITH t AS (SELECT doc_id,
                list_filter(string_split_regex(lower(text), '\s+'),
                            x -> len(x) > 0) AS toks
              FROM documents),
            c AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                         CAST(len(list_distinct(toks)) AS BIGINT) AS n_types
                  FROM t)
         SELECT doc_id, n_tokens, n_types,
                CASE WHEN n_tokens > 0 THEN round(
                  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) END AS ttr,
                CASE WHEN n_tokens > 0 THEN round(
                  CAST(n_types AS DOUBLE) / sqrt(CAST(n_tokens AS DOUBLE)), 6)
                  END AS root_ttr,
                CASE WHEN n_tokens > 1 THEN round(
                  ln(CAST(n_types AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6)
                  END AS herdan_c
         FROM c ORDER BY doc_id""",

    "t25_bpe_pairs" ->
      """WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                       FROM documents),
            words AS (SELECT w, count(*) AS wc FROM toks
                      WHERE length(w) > 1 GROUP BY 1),
            pairs AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, wc
                      FROM (SELECT w, wc, unnest(range(1, length(w))) AS i
                            FROM words)),
            agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
                    FROM pairs GROUP BY 1)
         SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 30""",

    "t47_mattr" ->
      // same windows (1-based inclusive slices), same single pinned
      // division, same short-doc TTR fallback
      """WITH b AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text), '\s+'),
                        t -> len(t) > 0) AS t
                    FROM documents),
            s AS (SELECT doc_id, len(t) AS n,
                    CASE WHEN len(t) >= 50 THEN
                      list_sum(list_transform(range(1, len(t) - 48),
                        p -> len(list_distinct(t[p:p+49]))))
                    END AS sd,
                    len(list_distinct(t)) AS d
                  FROM b)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                CASE WHEN n = 0 THEN NULL
                     WHEN n >= 50 THEN round(CAST(sd AS DOUBLE)
                       / (CAST(n - 49 AS DOUBLE) * 50.0), 6)
                     ELSE round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6)
                END AS mattr
         FROM s ORDER BY doc_id""",

    "t48_vocab_overlap" ->
      // same (source, token) distinct grain and pinned division
      """WITH st AS (SELECT DISTINCT source, tok FROM (
                SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                   FROM st GROUP BY 1),
            i AS (SELECT a.source AS src_a, b.source AS src_b,
                    CAST(count(*) AS BIGINT) AS nab
                  FROM st a JOIN st b
                    ON b.tok = a.tok AND a.source < b.source
                  GROUP BY 1, 2)
         SELECT src_a, src_b, nab AS n_shared,
                round(CAST(nab AS DOUBLE)
                  / CAST(sa.n + sb.n - nab AS DOUBLE), 6) AS vocab_jaccard
         FROM i JOIN sz sa ON sa.source = i.src_a
                JOIN sz sb ON sb.source = i.src_b
         ORDER BY src_a, src_b""",

    "t46_burstiness" ->
      // same per-doc count folds, implicit zeros, pinned Fano chain
      """WITH tk AS (SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            dc AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
                   FROM tk GROUP BY 1, 2),
            per AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(c) AS BIGINT) AS n_occurrences,
                      CAST(sum(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE) AS ssq
                    FROM dc GROUP BY 1
                    ORDER BY n_occurrences DESC, tok LIMIT 50),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents)
         SELECT tok, n_docs, n_occurrences,
                round(CAST(n_occurrences AS DOUBLE) / CAST(nn AS DOUBLE), 6)
                  AS mean_per_doc,
                round((ssq / CAST(nn AS DOUBLE)
                  - (CAST(n_occurrences AS DOUBLE) / CAST(nn AS DOUBLE))
                    * (CAST(n_occurrences AS DOUBLE) / CAST(nn AS DOUBLE)))
                  / (CAST(n_occurrences AS DOUBLE) / CAST(nn AS DOUBLE)), 6)
                  AS fano
         FROM per CROSS JOIN nt
         ORDER BY n_occurrences DESC, tok""",

    "t45_textrank" ->
      textrankOracle(d = "0.85", iters = 3, vocab = 500, topK = 20),

    "t24_zipf" ->
      """WITH tk AS (SELECT tok FROM (
                SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
                FROM documents) WHERE len(tok) > 0),
            top AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1
                    ORDER BY c DESC, tok LIMIT 500),
            ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
                       FROM top),
            t AS (SELECT
                CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(24,8)) AS x,
                CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(24,8)) AS y,
                CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xy,
                CAST(round(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS xx,
                CAST(round(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 6)
                  AS DECIMAL(24,8)) AS yy
              FROM ranked),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx,
                         sum(yy) AS syy FROM t)
         SELECT n AS n_ranks,
                round(-((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))), 6) AS alpha,
                round((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
                round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM s""",

    "t19_gopher_rules" -> t19GopherSql
  )
}
