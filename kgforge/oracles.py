"""DuckDB oracle SQL for every entry in ``kgforge.queries.QUERIES``.

Each statement is ANSI-flavored SQL executable by DuckDB against the same
parquet tables (pre-registered views: region nation customer supplier part
orders lineitem events documents embeddings). Column aliases, rounding, and
tie-breaks match the Spark implementations exactly (driver compare is
row-count + schema + order-insensitive value hash over name-sorted columns).

Type discipline (round-1 lesson, VERDICT.md "What's wrong" #1): DuckDB
``sum()`` over integer columns returns HUGEINT (Arrow decimal128) while
Spark returns int64, so every unrounded integer aggregate here is wrapped
in ``CAST(... AS BIGINT)`` — the driver's hash compare is typed.
"""

ORACLES: dict[str, str] = {}

ORACLES["scan_dropna"] = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE text IS NOT NULL AND length(trim(text)) > 0
GROUP BY lang
"""

ORACLES["even_line_sampling"] = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
WHERE (event_id - (SELECT min(event_id) FROM events)) % 2 = 0
GROUP BY event_type
"""

ORACLES["anti_join"] = """
SELECT count(*) AS n_customers, min(c_custkey) AS min_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

ORACLES["deterministic_split"] = """
SELECT CASE WHEN ((o_orderkey * 2654435761) % 4294967296) % 10 < 8
            THEN 'train' ELSE 'val' END AS split,
       count(*) AS n
FROM orders
GROUP BY 1
"""

ORACLES["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["revenue_topk"] = """
SELECT c_custkey, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY c_custkey, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["distinct_dense_ids"] = """
SELECT event_type,
       row_number() OVER (ORDER BY event_type) - 1 AS tag_id
FROM (SELECT DISTINCT event_type FROM events)
"""

ORACLES["class_weights"] = """
WITH counts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
), tot AS (
  SELECT sum(cnt) AS n, count(*) AS k FROM counts
)
SELECT event_type, cnt,
       round(CASE WHEN ln(n / (k * cnt)) < 1.0 THEN 1.0
                  ELSE ln(n / (k * cnt)) END, 4) AS weight
FROM counts, tot
"""

ORACLES["confusion_report"] = """
WITH preds AS (
  SELECT event_type AS label,
         CASE WHEN event_id % 7 = 0 THEN 'click' ELSE event_type END AS pred
  FROM events
), cm AS (
  SELECT label, pred, count(*) AS n FROM preds GROUP BY label, pred
), tp AS (
  SELECT label AS cls, n AS tp FROM cm WHERE label = pred
), pred_tot AS (
  SELECT pred, sum(n) AS pred_n FROM cm GROUP BY pred
), label_tot AS (
  SELECT label, sum(n) AS label_n FROM cm GROUP BY label
)
SELECT cls,
       round(tp / pred_n, 4) AS precision,
       round(tp / label_n, 4) AS recall
FROM tp JOIN pred_tot ON cls = pred JOIN label_tot ON cls = label
"""

ORACLES["interleave_sources"] = """
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank
  FROM documents WHERE source IN ('src0', 'src1')
)
SELECT rank, source, doc_id FROM ranked
ORDER BY rank, source LIMIT 100
"""

ORACLES["word_frequency"] = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents
)
SELECT token, count(*) AS cnt
FROM toks WHERE length(token) > 0
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 50
"""

ORACLES["quality_filter_stats"] = """
WITH d AS (
  SELECT lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) > 0) AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_symbols
  FROM documents
  WHERE text IS NOT NULL
), m AS (
  SELECT lang,
         len(toks) AS n_words,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
           AS word_chars,
         n_chars, n_symbols,
         len(list_filter(toks,
             x -> list_contains(['the','and','of','to','a'], x))) AS n_stop
  FROM d
), f AS (
  SELECT lang,
         CASE WHEN n_words < 10 OR n_words > 100000 THEN 1 ELSE 0 END
           AS fail_len,
         CASE WHEN word_chars < 3 * n_words OR word_chars > 10 * n_words
              THEN 1 ELSE 0 END AS fail_wordlen,
         CASE WHEN 10 * n_symbols > n_chars THEN 1 ELSE 0 END AS fail_symbol,
         CASE WHEN lang = 'en' AND n_stop < 1 THEN 1 ELSE 0 END
           AS fail_stopword
  FROM m
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(fail_len) AS BIGINT) AS fail_len,
       CAST(sum(fail_wordlen) AS BIGINT) AS fail_wordlen,
       CAST(sum(fail_symbol) AS BIGINT) AS fail_symbol,
       CAST(sum(fail_stopword) AS BIGINT) AS fail_stopword,
       CAST(sum(CASE WHEN fail_len + fail_wordlen + fail_symbol
                          + fail_stopword = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS pass_all
FROM f GROUP BY lang
"""

ORACLES["tfidf_top_terms"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tok WHERE length(token) > 0
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT token, round(sum(tf * ln(n_docs * 1.0 / df)), 4) AS total_tfidf
  FROM tf JOIN dfreq USING (token), n
  GROUP BY token
)
SELECT token, total_tfidf, df
FROM scored JOIN dfreq USING (token)
ORDER BY total_tfidf DESC, token ASC
LIMIT 30
"""

ORACLES["mask_chain"] = """
WITH masked AS (
  SELECT lang,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z0-9-.]+', '<EMAIL>', 'g'),
             'https?:\\/\\/[!-~]+', '<URL>', 'g'),
           '[0-9]*[.]?[0-9]+[%]?', '<NUM>', 'g') AS m
  FROM documents
)
SELECT lang, count(*) AS n, CAST(sum(length(m)) AS BIGINT) AS sum_len
FROM masked GROUP BY lang
"""

ORACLES["text_quality"] = """
WITH stats AS (
  SELECT lang, source,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> length(x) > 0)) AS n_tok,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> list_contains(['the','a','an','and','or','of'], x)))
           AS n_stop,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(text) AS n_char
  FROM documents
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       round(avg(n_tok), 4) AS avg_tokens,
       round(sum(n_stop) * 1.0 / sum(n_tok), 6) AS stopword_ratio,
       round(sum(n_digit) * 1.0 / sum(n_char), 6) AS digit_ratio
FROM stats GROUP BY lang, source
"""

ORACLES["top_docs_per_source"] = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS INT) AS rn
  FROM documents
)
SELECT source, doc_id, n_chars, rn FROM r WHERE rn <= 3
"""

ORACLES["repetition_bigrams"] = """
WITH t AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents WHERE text IS NOT NULL
), b AS (
  SELECT source,
         len(toks) - 1 AS n_bg,
         len(list_distinct(list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])))
           AS n_uniq
  FROM t WHERE len(toks) >= 2
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_bg) AS BIGINT) AS sum_bigrams,
       round((sum(n_bg) - sum(n_uniq)) * 1.0 / sum(n_bg), 6) AS dup_ratio,
       CAST(sum(CASE WHEN (n_bg - n_uniq) * 5 > n_bg THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
FROM b GROUP BY source
"""

ORACLES["langid_heuristic"] = """
WITH g AS (
  SELECT lang,
         CASE WHEN
           length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) * 1.0
             / greatest(length(text), 1) > 0.99
           AND len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> list_contains(['the','and','of','to','a'], x))) >= 1
         THEN 'en' ELSE 'other' END AS guess
  FROM documents
)
SELECT lang, guess, count(*) AS n FROM g GROUP BY lang, guess
"""

ORACLES["token_count_bpeish"] = """
WITH t AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
           AS n_tok
  FROM documents
)
SELECT source, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 4) AS avg_tokens
FROM t GROUP BY source
"""

ORACLES["doc_fingerprint"] = """
WITH fp AS (
  SELECT md5(array_to_string(list_sort(list_distinct(
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> length(x) > 0))), ' ')) AS fingerprint
  FROM documents
), grouped AS (
  SELECT fingerprint, count(*) AS n FROM fp GROUP BY fingerprint HAVING count(*) > 1
)
SELECT count(*) AS dup_fingerprints,
       CAST(coalesce(sum(n), 0) AS BIGINT) AS docs_in_dups
FROM grouped
"""

ORACLES["dedup_exact"] = """
WITH g AS (
  SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS survivor
  FROM documents GROUP BY md5(text)
)
SELECT count(*) AS n_unique, CAST(sum(n - 1) AS BIGINT) AS n_removed FROM g
"""

_SHINGLES_CTE = """
  toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM documents WHERE doc_id < 500
  ), idx AS (
    SELECT doc_id, t, unnest(range(greatest(len(t) - 2, 0))) AS i FROM toks
  ), sh_all AS (
    SELECT DISTINCT doc_id,
           t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS shingle
    FROM idx
  ), hot AS (
    -- hot-shingle document-frequency cap (mirrors queries.HOT_SHINGLE_DF_CAP)
    SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) >= 100
  ), sh AS (
    SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)
  )
"""

ORACLES["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLES_CTE},
sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
), ranked AS (
  -- prefix filtering (lossless for J >= 0.6): global order (df, shingle);
  -- prefix_len = sz - ceil(0.6*sz) + 1, integer-exact as (3*sz+4)//5
  SELECT sh.doc_id, sh.shingle,
         row_number() OVER (PARTITION BY sh.doc_id
                            ORDER BY dfreq.df, sh.shingle) AS rn,
         sizes.sz - ((3 * sizes.sz + 4) // 5) + 1 AS prefix_len
  FROM sh JOIN dfreq USING (shingle) JOIN sizes USING (doc_id)
), prefix AS (
  SELECT doc_id, shingle FROM ranked WHERE rn <= prefix_len
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM prefix a JOIN prefix b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), inter AS (
  SELECT d1, d2, count(*) AS inter
  FROM cand
  JOIN sh sa ON sa.doc_id = d1
  JOIN sh sb ON sb.doc_id = d2 AND sb.shingle = sa.shingle
  GROUP BY d1, d2
), jac AS (
  SELECT d1, d2,
         round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) AS jaccard
  FROM inter
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
)
SELECT count(*) AS n_pairs,
       round(coalesce(avg(jaccard), 0.0), 6) AS avg_jaccard
FROM jac WHERE jaccard >= 0.6
"""

ORACLES["near_dup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES_CTE},
sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
), ranked AS (
  SELECT sh.doc_id, sh.shingle,
         row_number() OVER (PARTITION BY sh.doc_id
                            ORDER BY dfreq.df, sh.shingle) AS rn,
         sizes.sz - ((3 * sizes.sz + 4) // 5) + 1 AS prefix_len
  FROM sh JOIN dfreq USING (shingle) JOIN sizes USING (doc_id)
), prefix AS (
  SELECT doc_id, shingle FROM ranked WHERE rn <= prefix_len
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM prefix a JOIN prefix b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), inter AS (
  SELECT d1, d2, count(*) AS inter
  FROM cand
  JOIN sh sa ON sa.doc_id = d1
  JOIN sh sb ON sb.doc_id = d2 AND sb.shingle = sa.shingle
  GROUP BY d1, d2
), pairs AS (
  SELECT d1, d2
  FROM inter
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
  WHERE round(inter * 1.0 / (s1.sz + s2.sz - inter), 6) >= 0.6
), nodes AS (
  SELECT d1 AS node FROM pairs UNION SELECT d2 FROM pairs
), edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs
), reach(node, x) AS (
  -- transitive closure + min label = connected components (tiny pair set
  -- at oracle scale; the Spark side runs kgforge.graph.cc)
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.x = e.a
), comp AS (
  SELECT node, min(x) AS comp FROM reach GROUP BY node
), cl AS (
  SELECT comp AS survivor, count(*) AS n_members FROM comp GROUP BY comp
)
SELECT survivor, n_members, n_members - 1 AS n_removed
FROM cl ORDER BY n_members DESC, survivor ASC LIMIT 20
"""

ORACLES["minhash_lsh_candidates"] = f"""
WITH {_SHINGLES_CTE},
sigparts AS (
  -- b=8 bands x r=3 minhashes (queries.MINHASH_BANDS/MINHASH_ROWS)
  SELECT doc_id, band, hx,
         min(md5(band::VARCHAR || ':' || hx::VARCHAR || '|' || shingle)) AS mh
  FROM sh,
       (SELECT unnest(range(8)) AS band),
       (SELECT unnest(range(3)) AS hx)
  GROUP BY doc_id, band, hx
), sig AS (
  SELECT doc_id, band, string_agg(mh, '|' ORDER BY hx) AS sig
  FROM sigparts GROUP BY doc_id, band
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT count(*) AS n_candidate_pairs,
       coalesce(min(d1), -1) AS min_d1
FROM cand
"""

ORACLES["simhash_buckets"] = """
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '\\s+'),
           x -> length(x) > 0))) AS token
  FROM documents
), votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (strpos('0123456789abcdef',
                               substr(md5(token), bit + 1, 1)) - 1) % 2 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM tok, (SELECT unnest(range(16)) AS bit)
  GROUP BY doc_id, bit
), sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT simhash, count(*) AS n FROM sim
GROUP BY simhash HAVING count(*) > 0
ORDER BY n DESC, simhash ASC
LIMIT 30
"""

ORACLES["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_emb
  FROM embeddings WHERE vec_id >= 5
), pairs AS (
  SELECT q_id, c_id,
         round(list_cosine_similarity(q_emb, c_emb), 4) AS cos
  FROM c CROSS JOIN q
), ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id ASC) AS rn
  FROM pairs
)
SELECT q_id, c_id, cos FROM ranked WHERE rn <= 10
"""

ORACLES["knn_label_vote"] = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_emb, label
  FROM embeddings WHERE vec_id >= 5
), pairs AS (
  SELECT q_id, c_id, label,
         round(list_cosine_similarity(q_emb, c_emb), 4) AS cos
  FROM c CROSS JOIN q
), ranked AS (
  SELECT q_id, c_id, label,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id ASC) AS rn
  FROM pairs
), votes AS (
  SELECT q_id, label, count(*) AS n FROM ranked WHERE rn <= 10
  GROUP BY q_id, label
), best AS (
  SELECT q_id, label, n,
         row_number() OVER (PARTITION BY q_id ORDER BY n DESC, label ASC)
           AS rn
  FROM votes
)
SELECT q_id, label AS pred_label, n AS votes FROM best WHERE rn = 1
"""

ORACLES["lsh_bucketed_ann"] = """
WITH planes AS (
  SELECT p.plane, d.d,
         CASE WHEN (strpos('0123456789abcdef',
                 substr(md5(p.plane::VARCHAR || ',' || d.d::VARCHAR), 1, 1))
                 - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(range(8)) AS plane) p,
       (SELECT unnest(range(64)) AS d) d
), comp AS (
  SELECT vec_id, d, embedding[d + 1]::DOUBLE AS x
  FROM embeddings, (SELECT unnest(range(64)) AS d)
), dots AS (
  SELECT vec_id, plane, sum(x * w) AS dot
  FROM comp JOIN planes USING (d)
  GROUP BY vec_id, plane
), sig AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(pow(2, plane) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
)
SELECT bucket, count(*) AS n FROM sig
GROUP BY bucket ORDER BY n DESC, bucket ASC LIMIT 30
"""

ORACLES["tumbling_window_counts"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY n DESC, window_start ASC, event_type ASC
LIMIT 50
"""

ORACLES["sessionize"] = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
         count(*) AS n_events
  FROM gaps GROUP BY user_id
)
SELECT n_sessions, count(*) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS sum_events
FROM sess GROUP BY n_sessions
"""

ORACLES["union_distinct"] = """
WITH u AS (
  SELECT DISTINCT v FROM (
    SELECT event_type AS v FROM events
    UNION ALL
    SELECT lang AS v FROM documents
  )
)
SELECT count(*) AS n_distinct, min(v) AS min_v FROM u
"""

ORACLES["token_accuracy"] = """
SELECT round(avg(CASE WHEN
         (CASE WHEN event_id % 7 = 0 THEN 'click' ELSE event_type END)
           = event_type THEN 1 ELSE 0 END), 6) AS accuracy,
       count(*) AS n
FROM events
"""

ORACLES["max_seq_len"] = """
WITH t AS (
  SELECT lang,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> length(x) > 0)) AS n_tok
  FROM documents
)
SELECT lang, max(n_tok) AS max_len, round(avg(n_tok), 4) AS avg_len
FROM t GROUP BY lang
"""

ORACLES["embedding_near_dup"] = """
WITH planes AS (
  SELECT p.plane, d.d,
         CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('nd,' || p.plane::VARCHAR || ',' || d.d::VARCHAR),
                        1, 1)) - 1) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(range(32)) AS plane) p,
       (SELECT unnest(range(64)) AS d) d
), comp AS (
  SELECT vec_id, d, embedding[d + 1]::DOUBLE AS x
  FROM embeddings, (SELECT unnest(range(64)) AS d)
), dots AS (
  SELECT vec_id, plane, sum(x * w) AS dot
  FROM comp JOIN planes USING (d)
  GROUP BY vec_id, plane
), sig AS (
  SELECT vec_id, plane // 8 AS band,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(pow(2, plane % 8) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, plane // 8
), ok_buckets AS (
  SELECT band, bucket FROM sig GROUP BY band, bucket HAVING count(*) < 1000
), sigf AS (
  SELECT sig.* FROM sig JOIN ok_buckets USING (band, bucket)
), cand AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM sigf a JOIN sigf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), verified AS (
  SELECT id1, id2, round(list_cosine_similarity(e1.emb, e2.emb), 4) AS cos
  FROM cand JOIN e e1 ON e1.vec_id = id1 JOIN e e2 ON e2.vec_id = id2
)
SELECT count(*) AS n_pairs, coalesce(min(id1), -1) AS first_id
FROM verified WHERE cos >= 0.95
"""

ORACLES["ivf_ann_topk"] = """
WITH cents AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS c_emb
  FROM embeddings WHERE vec_id < 16
), q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id >= 16 AND vec_id < 21
), cands AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id >= 21
), assigned AS (
  SELECT c_id, e, cent_id AS cell FROM (
    SELECT c_id, e, cent_id,
           row_number() OVER (PARTITION BY c_id
             ORDER BY round(list_cosine_similarity(e, c_emb), 4) DESC,
                      cent_id ASC) AS rn
    FROM cands CROSS JOIN cents
  ) WHERE rn = 1
), probes AS (
  SELECT q_id, q_emb, cent_id AS cell FROM (
    SELECT q_id, q_emb, cent_id,
           row_number() OVER (PARTITION BY q_id
             ORDER BY round(list_cosine_similarity(q_emb, c_emb), 4) DESC,
                      cent_id ASC) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= 4
), scored AS (
  SELECT q_id, c_id,
         round(list_cosine_similarity(q_emb, e), 4) AS cos
  FROM probes JOIN assigned USING (cell)
)
SELECT q_id, c_id, cos FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
"""

ORACLES["daily_retention"] = """
WITH days AS (
  -- duckdb's date_trunc('day') yields DATE; cast to TIMESTAMP to match Spark
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
), nxt AS (
  SELECT user_id AS u2, day - INTERVAL 1 DAY AS prev_day FROM days
), joined AS (
  SELECT d.day, d.user_id, n.u2
  FROM days d LEFT JOIN nxt n
    ON d.user_id = n.u2 AND d.day = n.prev_day
)
SELECT day,
       count(*) AS active_users,
       count(u2) AS retained_next_day,
       round(count(u2) * 1.0 / count(*), 6) AS retention_rate
FROM joined GROUP BY day
ORDER BY active_users DESC, day ASC
LIMIT 40
"""

ORACLES["multimodal_meta"] = """
WITH meta AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) > 0 AND ascii(substr(text, 1, 1)) < 128
              THEN ascii(substr(text, 1, 1)) ELSE -1 END AS first_byte
  FROM documents
)
SELECT first_byte, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM meta GROUP BY first_byte
"""


# ---------------------------------------------------------------------------
# Round-5 consolidated family oracles. The driver records at most the
# first 50 registered queries, so 18 per-operator contract queries were
# folded into 6 tagged family queries (kgforge.queries round-5 section);
# each family oracle is the UNION ALL of the constituent oracles above,
# wrapped to the family's common tagged schema with explicit casts so the
# type-strict driver compare sees identical (type, value) pairs. The
# constituent SQL stays registered-name-free: it is popped out of ORACLES
# below and only reachable through its family entry.
# ---------------------------------------------------------------------------

_NULL_S = "CAST(NULL AS VARCHAR)"
_NULL_L = "CAST(NULL AS BIGINT)"
_NULL_D = "CAST(NULL AS DOUBLE)"


def _wrap(inner_sql: str, select_list: str) -> str:
    return f"SELECT {select_list} FROM (\n{inner_sql}\n)"


_FOLDED = {
    name: ORACLES.pop(name)
    for name in [
        "text_quality", "repetition_bigrams",
        "langid_heuristic", "token_count_bpeish", "doc_fingerprint",
        "dedup_exact", "near_dup_clusters", "simhash_buckets",
        "tumbling_window_counts", "sessionize", "daily_retention",
        "ann_cosine_topk", "lsh_bucketed_ann", "knn_label_vote",
        "ivf_ann_topk", "embedding_near_dup",
        "union_distinct", "token_accuracy", "max_seq_len",
    ]
}

ORACLES["ann_suite"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["ann_cosine_topk"],
        "'cosine' AS method, CAST(q_id AS BIGINT) AS q_id,"
        " CAST(c_id AS BIGINT) AS c_id, CAST(cos AS DOUBLE) AS score,"
        f" {_NULL_S} AS label, {_NULL_L} AS n",
    ),
    _wrap(
        _FOLDED["ivf_ann_topk"],
        "'ivf' AS method, CAST(q_id AS BIGINT) AS q_id,"
        " CAST(c_id AS BIGINT) AS c_id, CAST(cos AS DOUBLE) AS score,"
        f" {_NULL_S} AS label, {_NULL_L} AS n",
    ),
    _wrap(
        _FOLDED["lsh_bucketed_ann"],
        f"'lsh_bucket' AS method, {_NULL_L} AS q_id,"
        " CAST(bucket AS BIGINT) AS c_id,"
        f" {_NULL_D} AS score, {_NULL_S} AS label, CAST(n AS BIGINT) AS n",
    ),
    _wrap(
        _FOLDED["knn_label_vote"],
        "'knn_vote' AS method, CAST(q_id AS BIGINT) AS q_id,"
        f" {_NULL_L} AS c_id, {_NULL_D} AS score,"
        " CAST(pred_label AS VARCHAR) AS label, CAST(votes AS BIGINT) AS n",
    ),
    _wrap(
        _FOLDED["embedding_near_dup"],
        "'near_dup' AS method, CAST(first_id AS BIGINT) AS q_id,"
        f" {_NULL_L} AS c_id, {_NULL_D} AS score, {_NULL_S} AS label,"
        " CAST(n_pairs AS BIGINT) AS n",
    ),
])

ORACLES["scalar_metrics"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["union_distinct"],
        "'union_distinct' AS metric, min_v AS key,"
        f" CAST(n_distinct AS BIGINT) AS ival, {_NULL_D} AS dval",
    ),
    _wrap(
        _FOLDED["token_accuracy"],
        f"'token_accuracy' AS metric, {_NULL_S} AS key,"
        " CAST(n AS BIGINT) AS ival, CAST(accuracy AS DOUBLE) AS dval",
    ),
    _wrap(
        _FOLDED["max_seq_len"],
        "'max_seq_len' AS metric, lang AS key,"
        " CAST(max_len AS BIGINT) AS ival, CAST(avg_len AS DOUBLE) AS dval",
    ),
])

ORACLES["text_signals"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["langid_heuristic"],
        "'langid' AS family, lang AS k1, guess AS k2,"
        f" CAST(n AS BIGINT) AS n1, {_NULL_L} AS n2, {_NULL_D} AS d1",
    ),
    _wrap(
        _FOLDED["token_count_bpeish"],
        f"'token_count' AS family, source AS k1, {_NULL_S} AS k2,"
        f" CAST(total_tokens AS BIGINT) AS n1, {_NULL_L} AS n2,"
        " CAST(avg_tokens AS DOUBLE) AS d1",
    ),
    _wrap(
        _FOLDED["doc_fingerprint"],
        f"'fingerprint' AS family, {_NULL_S} AS k1, {_NULL_S} AS k2,"
        " CAST(dup_fingerprints AS BIGINT) AS n1,"
        f" CAST(docs_in_dups AS BIGINT) AS n2, {_NULL_D} AS d1",
    ),
])

ORACLES["quality_signals"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["text_quality"],
        "'quality' AS family, lang AS k1, source AS k2,"
        " CAST(n_docs AS BIGINT) AS n1, CAST(sum_tokens AS BIGINT) AS n2,"
        f" {_NULL_L} AS n3, CAST(avg_tokens AS DOUBLE) AS d1,"
        " CAST(stopword_ratio AS DOUBLE) AS d2,"
        " CAST(digit_ratio AS DOUBLE) AS d3",
    ),
    _wrap(
        _FOLDED["repetition_bigrams"],
        f"'repetition' AS family, source AS k1, {_NULL_S} AS k2,"
        " CAST(n_docs AS BIGINT) AS n1, CAST(sum_bigrams AS BIGINT) AS n2,"
        " CAST(n_flagged AS BIGINT) AS n3, CAST(dup_ratio AS DOUBLE) AS d1,"
        f" {_NULL_D} AS d2, {_NULL_D} AS d3",
    ),
])

ORACLES["event_suite"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["tumbling_window_counts"],
        "'tumbling' AS family,"
        " strftime(window_start, '%Y-%m-%d %H:%M:%S') AS k1,"
        " event_type AS k2, CAST(n AS BIGINT) AS n1,"
        f" {_NULL_L} AS n2, CAST(sum_value AS DOUBLE) AS d1",
    ),
    _wrap(
        _FOLDED["daily_retention"],
        "'retention' AS family,"
        " strftime(day, '%Y-%m-%d %H:%M:%S') AS k1,"
        f" {_NULL_S} AS k2, CAST(active_users AS BIGINT) AS n1,"
        " CAST(retained_next_day AS BIGINT) AS n2,"
        " CAST(retention_rate AS DOUBLE) AS d1",
    ),
    _wrap(
        _FOLDED["sessionize"],
        "'sessionize' AS family, CAST(n_sessions AS VARCHAR) AS k1,"
        f" {_NULL_S} AS k2, CAST(n_users AS BIGINT) AS n1,"
        f" CAST(sum_events AS BIGINT) AS n2, {_NULL_D} AS d1",
    ),
])

ORACLES["dedup_stats"] = "\nUNION ALL\n".join([
    _wrap(
        _FOLDED["dedup_exact"],
        f"'exact' AS family, {_NULL_L} AS survivor,"
        " CAST(n_unique AS BIGINT) AS n1, CAST(n_removed AS BIGINT) AS n2",
    ),
    _wrap(
        _FOLDED["near_dup_clusters"],
        "'near' AS family, CAST(survivor AS BIGINT) AS survivor,"
        " CAST(n_members AS BIGINT) AS n1, CAST(n_removed AS BIGINT) AS n2",
    ),
    _wrap(
        _FOLDED["simhash_buckets"],
        "'simhash' AS family, CAST(simhash AS BIGINT) AS survivor,"
        f" CAST(n AS BIGINT) AS n1, {_NULL_L} AS n2",
    ),
])
