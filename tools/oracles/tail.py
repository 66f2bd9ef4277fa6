"""Training-data pipeline tail oracle SQL (BPE goldens, packing,
mixtures, sampling, sharding, the end-to-end training_dataset row).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""

from tools.oracles.params import (
    _MIX_TARGETS,
    _SAMPLE_RATES,
    _SEQ_LEN,
    _SPLIT_FRACTIONS,
    _TD_SEED,
    _TD_SEQ_LEN,
    _TD_SHARDS,
    _TD_TARGETS,
)
from tools.oracles.dedup import _minhash_sql

def _bpe_token_sql() -> str:
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return rf"""
SELECT d.doc_id,
       len(regexp_split_to_array(trim(d.text), '\s+')) AS ws_tokens,
       g.bpe_tokens
FROM documents d
JOIN read_parquet('{p}/bpe_token_count_sf0.01.parquet') g USING (doc_id)
"""

def _bpe_train_sql() -> str:
    """Oracle for the ``bpe_train`` driver row (VERDICT r9 item 2): the
    golden merge table written by tools/make_golden.py make_bpe_train —
    the SERIAL reference trainer (pure-Python Counter counting pass +
    the same capped (freq desc, word) top-N + the shared merge loop)
    over the same sf0.01 documents.  Equality value-checks the
    distributed counting + TakeOrdered top-N pass end to end."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"""
SELECT rank, lhs, rhs
FROM read_parquet('{p}/bpe_train_sf0.01.parquet')
"""


def _tokenizer_stats_sql() -> str:
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return rf"""
WITH j AS (
  SELECT d.source,
         len(regexp_split_to_array(trim(d.text), '\s+')) AS ws,
         length(d.text) AS chars,
         g.bpe_tokens
  FROM documents d
  JOIN read_parquet('{p}/bpe_token_count_sf0.01.parquet') g USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
       CAST(SUM(chars) AS BIGINT) AS chars,
       ROUND(CAST(SUM(bpe_tokens) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6)
         AS fertility,
       ROUND(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe_tokens) AS DOUBLE), 6)
         AS chars_per_token
FROM j GROUP BY source
"""


def _pack_sequences_sql() -> str:
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"""
WITH g AS (
  SELECT doc_id, source, token_ids
  FROM read_parquet('{p}/bpe_token_ids_sf0.01.parquet')
  WHERE len(token_ids) > 0
), tok AS (
  SELECT doc_id, source, unnest(token_ids) AS tid,
         unnest(range(1, len(token_ids) + 1)) AS lpos
  FROM g
), pos AS (
  SELECT source, doc_id, tid, lpos,
         row_number() OVER (PARTITION BY source ORDER BY doc_id, lpos) - 1 AS gpos
  FROM tok
), seqd AS (
  SELECT source, doc_id, tid, lpos,
         CAST(gpos // {_SEQ_LEN} AS INT) AS seq_id,
         gpos % {_SEQ_LEN} AS spos
  FROM pos
)
SELECT source, seq_id,
       CAST(COUNT(*) AS INT) AS n_tokens,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_id,
       CAST(SUM((spos + 1) * tid) AS BIGINT) AS checksum,
       CAST(COUNT(*) FILTER (lpos = 1) AS INT) AS n_boundaries,
       CAST(COALESCE(SUM(spos) FILTER (lpos = 1), 0) AS BIGINT) AS boundary_sum
FROM seqd
GROUP BY source, seq_id
HAVING COUNT(*) = {_SEQ_LEN}
"""

def _stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN event_type = '{v}' THEN {r!r}"
        for v, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT event_id, user_id, event_type
FROM events
WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
      < (CASE {cases} ELSE 0.5 END)
"""

_PACK_GREEDY_SQL = r"""
WITH RECURSIVE t AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), g(source, doc_id, n_tokens, rn, fill, pack_id) AS (
  SELECT source, doc_id, n_tokens, rn, n_tokens, CAST(0 AS BIGINT)
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN g.fill + t.n_tokens > 128 THEN t.n_tokens
              ELSE g.fill + t.n_tokens END,
         CASE WHEN g.fill + t.n_tokens > 128 THEN g.pack_id + 1
              ELSE g.pack_id END
  FROM g JOIN t ON t.source = g.source AND t.rn = g.rn + 1
)
SELECT source, doc_id, n_tokens, pack_id FROM g
"""

def _domain_mix_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {t!r}" for s, t in sorted(_MIX_TARGETS.items())
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), rated AS (
  -- CASE without ELSE yields NULL for unlisted domains; keep it NULL
  -- (u < NULL is false -> dropped) instead of feeding least(), which
  -- ignores NULLs and would resurrect them at rate 1.0
  SELECT source,
         CASE WHEN (CASE {cases} END) IS NOT NULL
              THEN least(1.0, (CASE {cases} END) / CAST(n AS DOUBLE)) END AS rate
  FROM counts
)
SELECT d.doc_id, d.source
FROM documents d JOIN rated r USING (source)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
      < r.rate
"""

_DOMAIN_MIX_TEMP_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), p AS (
  SELECT lang, n, POWER(n::DOUBLE, 0.5) AS w FROM counts
), z AS (
  SELECT SUM(w) AS z FROM p
), rated AS (
  SELECT lang, least(1.0, 250.0 * (w / z.z) / n::DOUBLE) AS rate FROM p, z
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rated r USING (lang)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
      < r.rate
"""

_QUANTILE_FILTER_SQL = """
WITH b AS (
  SELECT source,
         quantile_cont(n_chars::DOUBLE, 0.1) AS lo,
         quantile_cont(n_chars::DOUBLE, 0.9) AS hi
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN b USING (source)
WHERE d.n_chars::DOUBLE >= b.lo AND d.n_chars::DOUBLE <= b.hi
"""

_EXACT_SAMPLE_SQL = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id) AS rn
  FROM documents
)
SELECT doc_id, source FROM ranked WHERE rn <= 10
"""

_SHARD_DOCUMENTS_SQL = """
WITH u AS (
  SELECT doc_id,
         ('0x' || substr(md5('r8|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id,
       CAST(floor(u * 8) AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY CAST(floor(u * 8) AS INT)
         ORDER BY u, doc_id) AS INT) AS shuffle_rank
FROM u
"""

_PACK_DOCUMENTS_SQL = r"""
SELECT source, doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       -- windowed SUM widens to HUGEINT in DuckDB; pin the quotient to
       -- BIGINT so the value hash matches Spark's bigint pack_id
       CAST(COALESCE(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                     OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 2048 AS BIGINT) AS pack_id
FROM documents
"""

def _training_dataset_sql() -> str:
    """The composed oracle: each stage is the SAME DuckDB formulation its
    standalone row uses — gopher keep predicate (_GOPHER_SQL), minhash
    pairs + recursive-CTE connected components (_dedup_clusters_sql),
    md5-keyed mixture rates (_domain_mix_sql), kernel-golden BPE id
    arrays (the bpe_token_count / pack_sequences golden parquet), the
    unnest-repack sequence build (_pack_sequences_sql), and the
    md5-uniform shard bins (_SHARD_DOCUMENTS_SQL) — re-rooted on the
    previous stage's CTE instead of the raw documents table."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    cases = " ".join(
        f"WHEN source = '{s}' THEN {t!r}" for s, t in sorted(_TD_TARGETS.items())
    )
    # train band on the sorted-name cumulative boundaries — must track
    # leakage_safe_split's when-chain exactly
    names = sorted(_SPLIT_FRACTIONS)
    acc, lo, hi = 0.0, 0.0, 1.0
    for n in names[:-1]:
        nxt = acc + _SPLIT_FRACTIONS[n]
        if n == "train":
            lo, hi = acc, nxt
        acc = nxt
    if names[-1] == "train":
        lo, hi = acc, 1.0
    train_lo, train_hi = lo, hi
    return f"""
WITH RECURSIVE kept AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           len(lt) AS n,
           CAST(list_aggregate(list_transform(lt, w -> length(w)), 'sum') AS DOUBLE) AS wlen,
           CAST(length(text) - length(replace(text, '#', ''))
                + len(string_split_regex(text, '\\.\\.\\.')) - 1 AS DOUBLE) AS symbols,
           CAST(len(list_filter(lt, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) AS alpha_words,
           len(list_filter(lt, w -> list_contains(['the','a','of','and','to','in','is','for','that','it'], w))) AS stop_hits
    FROM (
      SELECT doc_id, source, text,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS lt
      FROM documents
    )
  )
  WHERE n >= 50 AND n <= 100000 AND wlen / n >= 3.0 AND wlen / n <= 10.0
    AND symbols / n <= 0.1 AND alpha_words / n >= 0.8 AND stop_hits >= 2
), pairs AS (
{_minhash_sql(threshold=0.5, table="kept")}
), sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
), comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
), keepers AS (
  SELECT k.doc_id, k.source
  FROM kept k LEFT JOIN comp c ON c.doc_id = k.doc_id
  WHERE COALESCE(c.cluster_id, k.doc_id) = k.doc_id
), train AS (
  -- leakage-safe split, TRAIN band: the split hashes the cluster id,
  -- and a keeper IS its cluster's minimum (cluster_id == doc_id), so
  -- the keeper-set split key reduces to the keeper's own id
  SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ('0x' || substr(md5('{_TD_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0 AS u
    FROM keepers
  ) WHERE u >= {train_lo!r} AND u < {train_hi!r}
), counts AS (
  SELECT source, COUNT(*) AS n FROM train GROUP BY source
), rated AS (
  SELECT source,
         CASE WHEN (CASE {cases} END) IS NOT NULL
              THEN least(1.0, (CASE {cases} END) / CAST(n AS DOUBLE)) END AS rate
  FROM counts
), mixed AS (
  SELECT k.doc_id, k.source
  FROM train k JOIN rated r USING (source)
  WHERE ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
        < r.rate
), g AS (
  SELECT m.doc_id, m.source, t.token_ids
  FROM mixed m
  JOIN read_parquet('{p}/bpe_token_ids_sf0.01.parquet') t USING (doc_id)
  WHERE len(t.token_ids) > 0
), tok AS (
  SELECT doc_id, source, unnest(token_ids) AS tid,
         unnest(range(1, len(token_ids) + 1)) AS lpos
  FROM g
), pos AS (
  SELECT source, doc_id, tid, lpos,
         row_number() OVER (PARTITION BY source ORDER BY doc_id, lpos) - 1 AS gpos
  FROM tok
), seqd AS (
  SELECT source, doc_id, tid, lpos,
         CAST(gpos // {_TD_SEQ_LEN} AS INT) AS seq_id,
         gpos % {_TD_SEQ_LEN} AS spos
  FROM pos
), seqs AS (
  SELECT source, seq_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) FILTER (lpos = 1) AS BIGINT) AS n_boundaries,
         CAST(SUM((spos + 1) * tid) AS BIGINT) AS checksum
  FROM seqd
  GROUP BY source, seq_id
  HAVING COUNT(*) = {_TD_SEQ_LEN}
), sharded AS (
  SELECT *,
         CAST(floor(
           (('0x' || substr(md5('{_TD_SEED}|' || source || '|' || CAST(seq_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0) * {_TD_SHARDS}) AS INT) AS shard
  FROM seqs
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_sequences,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_docs) AS BIGINT) AS sum_docs,
       CAST(SUM(n_boundaries) AS BIGINT) AS sum_boundaries,
       CAST(SUM(checksum) AS BIGINT) AS checksum,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM sharded GROUP BY shard
"""

