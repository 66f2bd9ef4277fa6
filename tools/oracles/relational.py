"""Relational/window/join family oracle SQL (top-k, rollup,
cube, grouping sets, as-of/interval joins, set ops, sketches,
multimodal).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""


_TOPK_SQL = """
SELECT user_id, event_id, value, CAST(rk AS INT) AS rk FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3
"""

_MULTIMODAL_FRAMES_SQL = """
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), m AS (
  SELECT doc_id, text, n, greatest(n // 16, 1) AS nf FROM b
)
SELECT doc_id,
       CAST((nf + 3) // 4 AS BIGINT) AS n_frames,
       CAST(CASE WHEN n < 16 THEN n ELSE ((nf + 3) // 4) * 16 END AS BIGINT) AS frame_bytes,
       CAST(n AS BIGINT) AS n_bytes,
       CASE WHEN substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'WAVE'
              THEN 'wav'
            WHEN substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'AVI '
              THEN 'avi'
            WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
            WHEN substr(text, 1, 2) = 'BM' THEN 'bmp'
            ELSE 'unknown' END AS format
FROM m
"""

def _multimodal_real_sql() -> str:
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return (
        "SELECT doc_id, format, CAST(n_bytes AS BIGINT) AS n_bytes, "
        f"f0, f1, f2, f3 FROM read_parquet('{p}/multimodal_real_sf0.01.parquet')"
    )

def _image_dedup_sql() -> str:
    """Oracle for image_dedup: an ALL-PAIRS bit_count(xor) scan over the
    kernel-golden perceptual hashes (computed from pre-encode pixels by
    tools/make_golden.py) — equality proves both the PNG decode round
    trip AND that the banded Hamming join misses no pair inside the
    threshold (the pigeonhole losslessness claim, checked exhaustively)."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"""
WITH g AS (
  SELECT doc_id, ahash FROM read_parquet('{p}/image_ahash_sf0.01.parquet')
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
"""

def _audio_dedup_sql() -> str:
    """Oracle for audio_dedup: an ALL-PAIRS bit_count(xor) scan over
    the kernel-golden frame-energy fingerprints (computed from
    pre-encode int16 samples by tools/make_golden.py) — equality
    proves the WAV codec round trip AND the banded join's pigeonhole
    losslessness, same contract as _image_dedup_sql."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"""
WITH g AS (
  SELECT doc_id, afp FROM read_parquet('{p}/audio_afp_sf0.01.parquet')
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 3
"""


def _gif_dedup_sql() -> str:
    """Oracle for gif_dedup: rebuild the per-id-pair frame-match
    aggregate exhaustively from the kernel-golden PER-FRAME hashes —
    same-frame-index all-pairs bit_count scan, per-pair match count,
    fraction over the larger animation's frame count, >= 0.5 filter.
    Proves the GIF codec round trip and the packed-key banded join at
    once."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"""
WITH g AS (
  SELECT doc_id, frame_idx, ahash
  FROM read_parquet('{p}/gif_frame_ahash_sf0.01.parquet')
), nf AS (
  SELECT doc_id, COUNT(*) AS n_frames FROM g GROUP BY doc_id
), m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_matched
  FROM g a JOIN g b
    ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_matched,
       ROUND(CAST(n_matched AS DOUBLE)
             / greatest(na.n_frames, nb.n_frames), 6) AS match_frac
FROM m
JOIN nf na ON na.doc_id = id_a
JOIN nf nb ON nb.doc_id = id_b
WHERE CAST(n_matched AS DOUBLE) / greatest(na.n_frames, nb.n_frames) >= 0.5
"""


#: oracle for warc_documents: rebuild every projected value from the
#: documents table directly — the md5-derived 60-bit doc_id is the
#: engine-portable _md5_long (same construction as the dedup oracles);
#: the CASE chain mirrors the fixture builder's branch chain
#: (tools/registry/base._warc_fixture_dir) line for line, INCLUDING
#: its encodability guards (latin-1-encodable == no code point above
#: U+00FF, ASCII == none above U+007F — ADVICE r12) and its r13
#: crawl-head branches: the XHTML wrap (application/xhtml+xml
#: acceptance), the GBK <meta charset> page and the ISO-8859-1
#: http-equiv page (header-less charset sniff), and the 404 filter.
#: Round-tripping the meta pages' markup VERBATIM is the point: if the
#: engine's sniff picked the wrong codec, the non-ASCII suffixes would
#: come back as mojibake and the value hash would diverge.
_WARC_DOCUMENTS_SQL = r"""
SELECT ('0x' || substr(md5('urn:uuid:w-' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         AS doc_id,
       body AS text,
       CAST(NULL AS VARCHAR) AS lang,
       'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS source,
       CAST(length(body) AS BIGINT) AS n_chars
FROM (
  SELECT doc_id,
         CASE
           WHEN doc_id % 3 = 1 AND NOT regexp_matches(t, '[^\x00-\xff]')
             THEN t || ' café crème'
           WHEN doc_id % 7 = 3
             THEN '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
                  || t || '</body></html>'
           WHEN doc_id % 5 = 2 AND NOT regexp_matches(t, '[^\x00-\x7f]')
             THEN '<meta charset="gbk"/><p>' || t || ' 你好世界</p>'
           WHEN doc_id % 5 = 4 AND NOT regexp_matches(t, '[^\x00-\xff]')
             THEN '<meta http-equiv="Content-Type" content="text/html;'
                  || ' charset=ISO-8859-1"/>' || t || ' voilà'
           ELSE t
         END AS body
  FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
  WHERE doc_id % 11 != 7
)
"""


_SALTED_ROLLUP_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       COUNT(l_orderkey) AS n,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
"""

_PERCENTILES_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

_ASOF_JOIN_SQL = """
WITH v AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS view_ts_us, value AS view_value
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us, v.view_ts_us, v.view_value
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
"""

_JSON_EXTRACT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(25,6))) AS DOUBLE) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
GROUP BY event_type
"""

_WINDOW_RANKS_SQL = """
SELECT event_id, user_id,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist,
       ntile(4) OVER wt AS quartile
FROM events
WHERE CAST(value AS DOUBLE) IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE) DESC),
       wt AS (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE) DESC, event_id)
"""

_RANGE_WINDOW_SQL = """
SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
       CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) OVER w AS DOUBLE)
           / count(CAST(value AS DOUBLE)) OVER w AS trailing_mean
FROM events
WHERE CAST(value AS DOUBLE) IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(value AS DOUBLE)
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
"""

_CUBE_EVENTS_SQL = """
SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(user_id % 10) AS INT) AS g_bucket
FROM events
GROUP BY CUBE (event_type, user_id % 10)
"""

_INTERVAL_JOIN_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
), w AS (
  SELECT user_id, MIN(ts_us) AS lo, MIN(ts_us) + 604800000000 AS hi
  FROM ev GROUP BY user_id
)
SELECT e.user_id, COUNT(*) AS n_first_week,
       CAST(SUM(CAST(CAST(e.value AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE) AS first_week_value
FROM ev e JOIN w ON e.user_id = w.user_id AND e.ts_us >= w.lo AND e.ts_us <= w.hi
GROUP BY e.user_id
"""

_GROUPING_SETS_SQL = """
SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(user_id % 10) AS INT) AS g_bucket
FROM events
GROUP BY GROUPING SETS ((event_type, user_id % 10), (event_type), (user_id % 10))
"""

_FULL_OUTER_SQL = """
WITH c AS (
  SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey
), j AS (
  SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
         COALESCE(n_customers, 0) AS n_customers,
         COALESCE(n_suppliers, 0) AS n_suppliers
  FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
)
SELECT j.nationkey, n.n_name, j.n_customers, j.n_suppliers
FROM j LEFT JOIN nation n ON j.nationkey = n.n_nationkey
"""

_SET_OPS_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
GROUP BY user_id HAVING COUNT(*) >= 15
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view'
GROUP BY user_id HAVING COUNT(*) >= 15
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND CAST(value AS DOUBLE) > 240
"""

_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""

_SKETCH_ACCURACY_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct_texts,
       TRUE AS hll_ok,
       TRUE AS p50_ok,
       TRUE AS p90_ok
FROM documents
GROUP BY source
"""

