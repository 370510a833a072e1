package graft

/** DuckDB oracle SQL for the multimodal-family query keys — split from
  * SparkEntry so the per-round growth lands in family files.
  * Entries are verbatim; the shared CTE builders live in
  * [[OracleHelpers]]. The oracle contract (identical aliases to
  * the Spark side, total-order ORDER BY, BIGINT/DOUBLE casts) is
  * documented on [[SparkEntry.oracleSql]].
  */
private[graft] object OraclesM {
  import OracleHelpers._

  val sql: Map[String, String] = Map(
    "m01_multimodal" ->
      // byte-level, not codepoint-level: hex(encode(text)) is the UTF-8
      // byte sequence, each byte decoded from its two hex digits — so
      // the equivalence with fakeDecode's byte stats is structural and
      // holds for multi-byte text, not just ASCII
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
              b AS (SELECT doc_id, n,
                      list_transform(range(1, n + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bytes
                    FROM h)
         SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
                CAST(coalesce(bytes[1], 0) AS INT) AS head_byte,
                round(CASE WHEN n = 0 THEN 0.0
                      ELSE CAST(list_aggregate(bytes, 'sum') AS DOUBLE)
                           / CAST(n AS DOUBLE) END, 6) AS byte_mean,
                CAST(8 AS BIGINT) AS feat_dim
         FROM b ORDER BY doc_id""",

    "m06_alignment" ->
      // image tower = the m01 byte-fold replay (8 cells); text tower
      // = the s08 projection expr at 8 dims; same cosine + keep CASE
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 8 AS k,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            f0 AS (SELECT doc_id, k, sum(v) AS fv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 8)) AS k FROM h),
            feat AS (SELECT g.doc_id, g.k, CAST(coalesce(f0.fv, 0) AS DOUBLE) AS f
                     FROM grid g LEFT JOIN f0
                       ON f0.doc_id = g.doc_id AND f0.k = g.k),
            tp AS (SELECT vec_id, j,
                     round(list_aggregate(list_transform(range(len(embedding)),
                       i -> CAST(embedding[i + 1] AS DOUBLE) *
                            (CASE WHEN (strpos('0123456789abcdef',
                                substr(md5(CAST(i AS VARCHAR) || ':' ||
                                  CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                              THEN 1 ELSE -1 END)), 'sum'), 6) AS p
                   FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS j)),
            d AS (SELECT f.doc_id,
                    sum(f.f * t.p) AS dot,
                    sqrt(sum(f.f * f.f)) AS nf,
                    sqrt(sum(t.p * t.p)) AS nt
                  FROM feat f JOIN tp t ON t.vec_id = f.doc_id AND t.j = f.k
                  GROUP BY 1)
         SELECT doc_id,
                CASE WHEN nf > 0 AND nt > 0 THEN round(dot / (nf * nt), 6) END AS align_cos,
                CASE WHEN nf > 0 AND nt > 0 THEN round(dot / (nf * nt), 6) >= 0.0 END AS keep
         FROM d ORDER BY doc_id""",

    "m10_phash_resolve" ->
      // the m05 pHash pair chain verbatim, then the d06 recursive-CTE
      // component resolution with min-id canonicals
      """WITH RECURSIVE h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 64 AS j,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            cellv AS (SELECT doc_id, j, sum(v) AS cv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 64)) AS j FROM h),
            cells AS (SELECT g.doc_id, g.j, coalesce(c.cv, 0) AS cv
                      FROM grid g LEFT JOIN cellv c
                        ON c.doc_id = g.doc_id AND c.j = g.j),
            bits AS (SELECT a.doc_id, a.j,
                       CASE WHEN a.cv > b.cv THEN 1 ELSE 0 END AS bit
                     FROM cells a JOIN cells b
                       ON b.doc_id = a.doc_id AND b.j = (a.j + 1) % 64),
            chunks AS (SELECT doc_id,
                         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f0,
                         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f1,
                         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f2,
                         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f3
                       FROM bits GROUP BY 1),
            prs AS (SELECT id1, id2 FROM (
                      SELECT a.doc_id AS id1, b.doc_id AS id2,
                             bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1))
                           + bit_count(xor(a.f2, b.f2)) + bit_count(xor(a.f3, b.f3)) AS hm
                      FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id)
                    WHERE hm <= 3),
            edges AS (SELECT id1 AS a, id2 AS b FROM prs
                      UNION SELECT id2, id1 FROM prs),
            reach(a, b) AS (SELECT a, b FROM edges
                            UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
            allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
                     FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
                     LEFT JOIN comp c ON c.id = d.doc_id)
         SELECT doc_id, component,
                CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members,
                doc_id = component AS is_canonical
         FROM allc ORDER BY doc_id""",

    "m14_wav_clipping" ->
      // the m12 rule: replay the DECODED amplitudes from the text
      // bytes alone ((b-128)*256), never parse WAV — a drop, scale,
      // or reorder in the javax.sound path breaks the hash
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE strlen(text) > 0),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            amp AS (SELECT doc_id,
                      ((strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)
                       - 128) * 256 AS a
                    FROM pos),
            st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
                     CAST(sum(CASE WHEN abs(a) >= 24000 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_clipped,
                     CAST(max(abs(a)) AS BIGINT) AS peak
                   FROM amp GROUP BY 1)
         SELECT doc_id, n_samples, n_clipped, peak,
                round(CAST(n_clipped AS DOUBLE) / CAST(n_samples AS DOUBLE), 6)
                  AS clip_rate,
                (n_clipped * 100 > n_samples * 18) AS is_clipped
         FROM st ORDER BY doc_id""",

    "m13_cell_stats" ->
      // the m05 byte-fold cell replay (full corpus — linear, unlike
      // m05's quadratic pairs), then exact integer stats and the
      // pure-integer flat rule
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 64 AS j,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            cellv AS (SELECT doc_id, j, sum(v) AS cv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 64)) AS j FROM h),
            cells AS (SELECT g.doc_id, g.j, coalesce(c.cv, 0) AS cv
                      FROM grid g LEFT JOIN cellv c
                        ON c.doc_id = g.doc_id AND c.j = g.j),
            st AS (SELECT doc_id, sum(cv) AS s, min(cv) AS mn, max(cv) AS mx
                   FROM cells GROUP BY 1)
         SELECT doc_id, round(CAST(s AS DOUBLE) / 64.0, 6) AS cell_mean,
                CAST(mx - mn AS BIGINT) AS contrast,
                ((mx - mn) * 20 * 64 < s) AS is_flat
         FROM st ORDER BY doc_id""",

    "m05_phash_pairs" ->
      // byte-level dHash replay (the m01 hex-parse rule): cell[j] =
      // sum of bytes at positions ≡ j (mod 64), bit j compares
      // neighbor cells, chunks pack 16 bits each; pairs are the FULL
      // quadratic cross join at hamming <= 3 — banding completeness
      // is part of what the hash-match proves
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500),
            pos AS (SELECT doc_id, hx, unnest(range(1, n + 1)) AS i FROM h),
            byt AS (SELECT doc_id, (i - 1) % 64 AS j,
                      (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
                      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS v
                    FROM pos),
            cellv AS (SELECT doc_id, j, sum(v) AS cv FROM byt GROUP BY 1, 2),
            grid AS (SELECT doc_id, unnest(range(0, 64)) AS j FROM h),
            cells AS (SELECT g.doc_id, g.j, coalesce(c.cv, 0) AS cv
                      FROM grid g LEFT JOIN cellv c
                        ON c.doc_id = g.doc_id AND c.j = g.j),
            bits AS (SELECT a.doc_id, a.j,
                       CASE WHEN a.cv > b.cv THEN 1 ELSE 0 END AS bit
                     FROM cells a JOIN cells b
                       ON b.doc_id = a.doc_id AND b.j = (a.j + 1) % 64),
            chunks AS (SELECT doc_id,
                         CAST(sum(CASE WHEN j // 16 = 0 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f0,
                         CAST(sum(CASE WHEN j // 16 = 1 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f1,
                         CAST(sum(CASE WHEN j // 16 = 2 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f2,
                         CAST(sum(CASE WHEN j // 16 = 3 THEN bit * (1 << (15 - j % 16)) ELSE 0 END) AS BIGINT) AS f3
                       FROM bits GROUP BY 1)
         SELECT id1, id2, hamming FROM (
           SELECT a.doc_id AS id1, b.doc_id AS id2,
                  CAST(bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1))
                     + bit_count(xor(a.f2, b.f2)) + bit_count(xor(a.f3, b.f3)) AS BIGINT) AS hamming
           FROM chunks a JOIN chunks b ON a.doc_id < b.doc_id)
         WHERE hamming <= 3 ORDER BY id1, id2""",

    "m07_audio_overlap" ->
      // chunk contents joined RAW (hex-slice equality) — md5 is only
      // Spark's shuffle-key compression, so byte equality is the same
      // relation and the pair counts hash-match
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents WHERE doc_id < 500 AND strlen(text) > 0),
            c AS (SELECT doc_id, substr(hx, 2 * chunk_idx * 100 + 1, 200) AS ck
                  FROM (SELECT doc_id, hx,
                          unnest(range(0, (n + 99) // 100)) AS chunk_idx
                        FROM h)),
            d AS (SELECT DISTINCT doc_id, ck FROM c),
            p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                         CAST(count(*) AS BIGINT) AS n_shared
                  FROM d a JOIN d b ON a.ck = b.ck AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT id1, id2, n_shared FROM p ORDER BY id1, id2""",

    "m11_silence_segments" ->
      // the m04 hex chunk grid with exact byte SUMS, the integer
      // threshold cross-multiplication, then row_number islands
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            c AS (SELECT doc_id, hx, n,
                    unnest(range(0, greatest((n + 99) // 100, 1))) AS chunk_idx
                  FROM h),
            s AS (SELECT doc_id, chunk_idx, chunk_idx * 100 AS off,
                         least(n, chunk_idx * 100 + 100) - chunk_idx * 100 AS nb, hx
                  FROM c),
            e AS (SELECT doc_id, chunk_idx,
                    CASE WHEN nb = 0 THEN 0 ELSE
                      CAST(list_aggregate(list_transform(range(1, nb + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*(off + i) - 1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*(off + i), 1)) - 1)),
                        'sum') AS BIGINT) END AS e
                  FROM s),
            t AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS tot,
                         CAST(count(*) AS BIGINT) AS nc
                  FROM e GROUP BY 1),
            a AS (SELECT e.doc_id, e.chunk_idx FROM e JOIN t USING (doc_id)
                  WHERE e.e * 4 * t.nc > 3 * t.tot),
            i AS (SELECT doc_id, chunk_idx,
                    chunk_idx - row_number() OVER (PARTITION BY doc_id
                      ORDER BY chunk_idx) AS isl
                  FROM a),
            g AS (SELECT doc_id, isl,
                    CAST(min(chunk_idx) AS BIGINT) AS start_chunk,
                    CAST(max(chunk_idx) AS BIGINT) AS end_chunk,
                    CAST(count(*) AS BIGINT) AS n_chunks
                  FROM i GROUP BY 1, 2)
         SELECT doc_id,
                CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY start_chunk) AS BIGINT) AS seg_idx,
                start_chunk, end_chunk, n_chunks
         FROM g ORDER BY doc_id, seg_idx""",

    "m12_wav_vad" ->
      // the m11 segmentation replayed on DECODED sample energies: the
      // engine synthesizes a real WAV per doc (sample f = byte f − 128,
      // shifted to 16 bits) and decodes it with javax.sound; the
      // oracle never touches WAV — it recomputes the identical
      // amplitude stream straight from the text bytes (|b − 128|·256
      // per sample, 50-frame chunks), so hash equality proves the
      // decode round-trip is sample-exact
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            c AS (SELECT doc_id, hx, n,
                    unnest(range(0, greatest((n + 49) // 50, 1))) AS chunk_idx
                  FROM h),
            s AS (SELECT doc_id, chunk_idx, chunk_idx * 50 AS off,
                         least(n, chunk_idx * 50 + 50) - chunk_idx * 50 AS nb, hx
                  FROM c),
            e AS (SELECT doc_id, chunk_idx,
                    CASE WHEN nb = 0 THEN 0 ELSE
                      CAST(list_aggregate(list_transform(range(1, nb + 1),
                        i -> abs((strpos('0123456789ABCDEF', substr(hx, 2*(off + i) - 1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*(off + i), 1)) - 1)
                             - 128) * 256),
                        'sum') AS BIGINT) END AS e
                  FROM s),
            t AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS tot,
                         CAST(count(*) AS BIGINT) AS nc
                  FROM e GROUP BY 1),
            a AS (SELECT e.doc_id, e.chunk_idx FROM e JOIN t USING (doc_id)
                  WHERE e.e * 4 * t.nc > 3 * t.tot),
            i AS (SELECT doc_id, chunk_idx,
                    chunk_idx - row_number() OVER (PARTITION BY doc_id
                      ORDER BY chunk_idx) AS isl
                  FROM a),
            g AS (SELECT doc_id, isl,
                    CAST(min(chunk_idx) AS BIGINT) AS start_chunk,
                    CAST(max(chunk_idx) AS BIGINT) AS end_chunk,
                    CAST(count(*) AS BIGINT) AS n_chunks
                  FROM i GROUP BY 1, 2)
         SELECT doc_id,
                CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY start_chunk) AS BIGINT) AS seg_idx,
                start_chunk, end_chunk, n_chunks
         FROM g ORDER BY doc_id, seg_idx""",

    "m04_audio_chunks" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS n
                    FROM documents),
            c AS (SELECT doc_id, hx, n,
                    unnest(range(0, greatest((n + 99) // 100, 1))) AS chunk_idx
                  FROM h),
            s AS (SELECT doc_id, chunk_idx, chunk_idx * 100 AS off,
                         least(n, chunk_idx * 100 + 100) - chunk_idx * 100 AS nb, hx
                  FROM c),
            b AS (SELECT doc_id, chunk_idx, off, nb,
                    CASE WHEN nb = 0 THEN 0.0 ELSE
                      CAST(list_aggregate(list_transform(range(1, nb + 1),
                        i -> (strpos('0123456789ABCDEF', substr(hx, 2*(off + i) - 1, 1)) - 1) * 16
                             + (strpos('0123456789ABCDEF', substr(hx, 2*(off + i), 1)) - 1)),
                        'sum') AS DOUBLE) / nb END AS bm
                  FROM s)
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(off AS BIGINT) AS offset, CAST(nb AS BIGINT) AS n_bytes,
                round(bm, 6) AS byte_mean
         FROM b ORDER BY doc_id, chunk_idx""",

    "m02_frames" ->
      """WITH d AS (SELECT doc_id, strlen(text) AS len FROM documents),
              f AS (SELECT doc_id, len, greatest(1, len // 4) AS step,
                           unnest(range(least(4, greatest(1, len)))) AS frame_idx
                    FROM d)
         SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                CAST(least(len, frame_idx * step + step) - frame_idx * step AS BIGINT)
                  AS frame_bytes
         FROM f ORDER BY doc_id, frame_idx""",

    "m08_scene_changes" ->
      // the m02 frame grid + the m04 hex byte parse: per-frame 8-bin
      // byte folds are exact integers, so dist2 is pure BIGINT math
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len
                    FROM documents),
            f AS (SELECT doc_id, hx, len, greatest(1, len // 4) AS step,
                         unnest(range(least(4, greatest(1, len)))) AS fi
                  FROM h),
            w AS (SELECT doc_id, fi, hx, fi * step AS frm,
                         least(len, fi * step + step) AS til
                  FROM f),
            b AS (SELECT doc_id, fi, (i - frm) % 8 AS j,
                    (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS byte
                  FROM (SELECT doc_id, fi, hx, frm, til,
                          unnest(range(frm, til)) AS i FROM w)),
            ft AS (SELECT doc_id, fi, j, CAST(sum(byte) AS BIGINT) AS v
                   FROM b GROUP BY 1, 2, 3),
            grid AS (SELECT doc_id, fi, unnest(range(8)) AS j
                     FROM (SELECT DISTINCT doc_id, fi FROM f)),
            fv AS (SELECT g.doc_id, g.fi, g.j, coalesce(ft.v, 0) AS v
                   FROM grid g LEFT JOIN ft
                     ON ft.doc_id = g.doc_id AND ft.fi = g.fi AND ft.j = g.j),
            d2 AS (SELECT a.doc_id, a.fi,
                     CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist2
                   FROM fv a JOIN fv b
                     ON b.doc_id = a.doc_id AND b.fi = a.fi - 1 AND b.j = a.j
                   GROUP BY 1, 2)
         SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, dist2,
                dist2 > 150000 AS is_boundary
         FROM d2 ORDER BY doc_id, frame_idx""",

    "m09_keyframes" ->
      // m08's feature chain + per-frame energy, boundary-count scene
      // ids, and a (energy DESC, fi) row_number argmax per scene
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, strlen(text) AS len
                    FROM documents),
            f AS (SELECT doc_id, hx, len, greatest(1, len // 4) AS step,
                         unnest(range(least(4, greatest(1, len)))) AS fi
                  FROM h),
            w AS (SELECT doc_id, fi, hx, fi * step AS frm,
                         least(len, fi * step + step) AS til
                  FROM f),
            b AS (SELECT doc_id, fi, (i - frm) % 8 AS j,
                    (strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS byte
                  FROM (SELECT doc_id, fi, hx, frm, til,
                          unnest(range(frm, til)) AS i FROM w)),
            ft AS (SELECT doc_id, fi, j, CAST(sum(byte) AS BIGINT) AS v
                   FROM b GROUP BY 1, 2, 3),
            grid AS (SELECT doc_id, fi, unnest(range(8)) AS j
                     FROM (SELECT DISTINCT doc_id, fi FROM f)),
            fv AS (SELECT g.doc_id, g.fi, g.j, coalesce(ft.v, 0) AS v
                   FROM grid g LEFT JOIN ft
                     ON ft.doc_id = g.doc_id AND ft.fi = g.fi AND ft.j = g.j),
            en AS (SELECT doc_id, fi, CAST(sum(v * v) AS BIGINT) AS energy
                   FROM fv GROUP BY 1, 2),
            d2 AS (SELECT a.doc_id, a.fi,
                     CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist2
                   FROM fv a JOIN fv b
                     ON b.doc_id = a.doc_id AND b.fi = a.fi - 1 AND b.j = a.j
                   GROUP BY 1, 2),
            sc AS (SELECT en.doc_id, en.fi, en.energy,
                     sum(CASE WHEN d2.dist2 > 150000 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY en.doc_id ORDER BY en.fi
                       ROWS UNBOUNDED PRECEDING) AS scene
                   FROM en LEFT JOIN d2
                     ON d2.doc_id = en.doc_id AND d2.fi = en.fi),
            r AS (SELECT doc_id, scene, fi, energy,
                    row_number() OVER (PARTITION BY doc_id, scene
                      ORDER BY energy DESC, fi) AS rn,
                    count(*) OVER (PARTITION BY doc_id, scene) AS nf
                  FROM sc)
         SELECT doc_id, CAST(scene AS BIGINT) AS scene,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(fi AS BIGINT) AS keyframe_idx, energy
         FROM r WHERE rn = 1 ORDER BY doc_id, scene""",

    "m03_resize" ->
      """SELECT doc_id, CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
                CAST(strlen(text) AS BIGINT) AS in_bytes,
                CAST(least(strlen(text), 1024) AS BIGINT) AS out_bytes
         FROM documents ORDER BY doc_id"""
  )
}
