"""Dedup family oracle SQL (shingles, MinHash/SimHash/Jaccard,
containment, connected components, decontamination).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

_SHINGLE_SQL = r"""
list_distinct(list_transform(
  range(0, greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 3, 0) + 1),
  i -> concat_ws(' ',
        regexp_split_to_array(lower(trim(text)), '\s+')[i + 1],
        regexp_split_to_array(lower(trim(text)), '\s+')[i + 2],
        regexp_split_to_array(lower(trim(text)), '\s+')[i + 3])))
"""

_NGRAM_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents
), shared AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS inter
  FROM (SELECT doc_id, unnest(sh) AS g FROM t) l
  JOIN (SELECT doc_id, unnest(sh) AS g FROM t) r
    ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
), sized AS (
  SELECT s.id_a, s.id_b,
         s.inter::DOUBLE / (ta.nsh + tb.nsh - s.inter)::DOUBLE AS j
  FROM shared s
  JOIN (SELECT doc_id, len(sh) AS nsh FROM t) ta ON ta.doc_id = s.id_a
  JOIN (SELECT doc_id, len(sh) AS nsh FROM t) tb ON tb.doc_id = s.id_b
)
SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM sized WHERE j >= 0.2
"""

_CONTAINMENT_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents
), shared AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS inter
  FROM (SELECT doc_id, unnest(sh) AS g FROM t) l
  JOIN (SELECT doc_id, unnest(sh) AS g FROM t) r
    ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
), sized AS (
  SELECT s.id_a, s.id_b,
         s.inter::DOUBLE / least(ta.nsh, tb.nsh)::DOUBLE AS c
  FROM shared s
  JOIN (SELECT doc_id, len(sh) AS nsh FROM t) ta ON ta.doc_id = s.id_a
  JOIN (SELECT doc_id, len(sh) AS nsh FROM t) tb ON tb.doc_id = s.id_b
)
SELECT id_a, id_b, ROUND(c, 6) AS containment FROM sized WHERE c >= 0.4
"""

def _minhash_sql(
    k: int = 16, bands: int = 8, threshold: float = 0.2,
    table: str = "documents",
) -> str:
    from python_ctd_spark.operators.dedup import MH_PRIME, mh_coeffs

    r = k // bands
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(hm, x -> (({a} * x) + {b}) % {MH_PRIME})) AS h{i}"
        for i, (a, b) in enumerate(mh_coeffs(k))
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bsig FROM sigs".format(
            b=b, cols=", ".join(f"h{b * r + j}::VARCHAR" for j in range(r))
        )
        for b in range(bands)
    )
    return f"""
WITH t AS (
  SELECT doc_id, {_SHINGLE_SQL} AS sh FROM {table}
), hashed AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM t
), hm_t AS (
  SELECT doc_id, hs, list_transform(hs, x -> x % {MH_PRIME}) AS hm FROM hashed
), sigs AS (
  SELECT doc_id, hs,
         {sig_exprs}
  FROM hm_t
), banded AS (
{band_rows}
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bsig = r.bsig AND l.doc_id < r.doc_id
), verified AS (
  -- Jaccard over the 60-bit shingle hashes, mirroring the Spark side
  -- (long-array intersect; collision odds ~1e-50 per pair)
  SELECT c.id_a, c.id_b,
         len(list_intersect(ta.hs, tb.hs))::DOUBLE
           / (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs)))::DOUBLE AS j
  FROM cand c JOIN hashed ta ON ta.doc_id = c.id_a JOIN hashed tb ON tb.doc_id = c.id_b
)
SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM verified WHERE j >= {threshold}
"""

def _incremental_dedup_sql(k: int = 16, bands: int = 8, threshold: float = 0.5) -> str:
    from python_ctd_spark.operators.dedup import MH_PRIME, mh_coeffs

    r = k // bands
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(hm, x -> (({a} * x) + {b}) % {MH_PRIME})) AS h{i}"
        for i, (a, b) in enumerate(mh_coeffs(k))
    )
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bsig FROM sigs".format(
            b=b, cols=", ".join(f"h{b * r + j}::VARCHAR" for j in range(r))
        )
        for b in range(bands)
    )
    return f"""
WITH t AS (
  SELECT doc_id, {_SHINGLE_SQL} AS sh FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM t
), hm_t AS (
  SELECT doc_id, hs, list_transform(hs, x -> x % {MH_PRIME}) AS hm FROM hashed
), sigs AS (
  SELECT doc_id, hs,
         {sig_exprs}
  FROM hm_t
), banded AS (
{band_rows}
), cand AS (
  SELECT DISTINCT nw.doc_id AS new_id, ix.doc_id AS old_id
  FROM banded nw JOIN banded ix
    ON nw.band = ix.band AND nw.bsig = ix.bsig
   AND nw.doc_id % 5 = 0 AND ix.doc_id % 5 != 0
), verified AS (
  SELECT c.new_id, c.old_id,
         len(list_intersect(tn.hs, to_.hs))::DOUBLE
           / (len(tn.hs) + len(to_.hs) - len(list_intersect(tn.hs, to_.hs)))::DOUBLE AS j
  FROM cand c
  JOIN hashed tn ON tn.doc_id = c.new_id
  JOIN hashed to_ ON to_.doc_id = c.old_id
), matches AS (
  SELECT new_id, COUNT(*) AS n_dups, MIN(old_id) AS matched_id,
         ROUND(MAX(j), 6) AS best_jaccard
  FROM verified WHERE j >= {threshold} GROUP BY new_id
)
SELECT d.doc_id, m.new_id IS NOT NULL AS is_dup,
       COALESCE(m.n_dups, 0) AS n_dups, m.matched_id, m.best_jaccard
FROM documents d LEFT JOIN matches m ON m.new_id = d.doc_id
WHERE d.doc_id % 5 = 0
"""

def _simhash_sql(max_hamming: int = 6, bands: int = 4) -> str:
    """Generated oracle for the SimHash pipeline: per-token md5 split into
    low/high 60-bit streams, 64 majority-vote bit sums, banded block
    equi-join, bit_count(xor) verification.  Shift-and-mask on the signed
    fingerprint matches Spark's shiftrightunsigned because the mask cuts
    away the sign-extension bits."""
    width = 64 // bands

    def bit_expr(b: int) -> str:
        stream = "hl" if b < 60 else "hh2"
        mask = 1 << (b % 60)
        val = (1 << b) if b < 63 else -(1 << 63)
        return (
            f"(CASE WHEN 2 * len(list_filter({stream}, x -> (x & {mask}) != 0)) > n "
            f"THEN {val} ELSE 0 END)"
        )

    sig_sum = "\n         + ".join(bit_expr(b) for b in range(64))
    block_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, sh, {b} AS blk, (sh >> {b * width}) & {(1 << width) - 1} AS bval FROM sig"
        for b in range(bands)
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents
), h AS (
  SELECT doc_id, len(toks) AS n, list_transform(toks, s -> md5(s)) AS hs FROM t
), hx AS (
  SELECT doc_id, n,
         list_transform(hs, x -> ('0x' || substr(x, 1, 15))::BIGINT) AS hl,
         list_transform(hs, x -> ('0x' || substr(x, 17, 15))::BIGINT) AS hh2
  FROM h
), sig AS (
  SELECT doc_id,
         {sig_sum} AS sh
  FROM hx
), blocks AS (
{block_rows}
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM blocks l JOIN blocks r
    ON l.blk = r.blk AND l.bval = r.bval AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.sh, sb.sh)) <= {max_hamming}
"""

def _dedup_clusters_sql() -> str:
    # threshold must track the Spark side's dedup_clusters(threshold=0.5);
    # band shape tracks the operator default (k=16, bands=8 -> r=2)
    return f"""
WITH RECURSIVE pairs AS (
{_minhash_sql(threshold=0.5)}
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
)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS is_keeper
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""

_DUP_PASSAGES_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 5 + 2)) AS i) ix
),
pdg AS (SELECT doc_id, g, count(*) AS c FROM pos GROUP BY 1, 2),
gdf AS (SELECT g, count(*) AS n_docs FROM pdg GROUP BY 1)
SELECT p.doc_id,
       CAST(SUM(p.c) AS BIGINT) AS n_ngrams,
       ROUND(SUM(CASE WHEN f.n_docs >= 2 THEN p.c ELSE 0 END) * 1.0 / SUM(p.c), 6)
         AS dup_ngram_frac,
       MAX(f.n_docs) AS max_ngram_df
FROM pdg p JOIN gdf f USING (g)
GROUP BY 1
"""

def _shingle_sql(n: int) -> str:
    """DuckDB twin of dedup.with_shingles for word-``n``-grams: distinct
    n-grams, out-of-range indices yield NULL and concat_ws skips them,
    so a short doc produces one shingle of all its tokens."""
    toks = r"regexp_split_to_array(lower(trim(text)), '\s+')"
    parts = ",\n        ".join(f"{toks}[i + {j + 1}]" for j in range(n))
    return f"""
list_distinct(list_transform(
  range(0, greatest(len({toks}) - {n}, 0) + 1),
  i -> concat_ws(' ',
        {parts})))
"""

def _decontaminate_sql() -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, {_shingle_sql(5)} AS sh FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM sh
), bench AS (
  SELECT DISTINCT unnest(hs) AS g FROM hashed WHERE doc_id % 5 = 0
), inv AS (
  SELECT doc_id, unnest(hs) AS g FROM hashed WHERE doc_id % 5 != 0
)
SELECT inv.doc_id, COUNT(*) AS n_contaminated
FROM inv JOIN bench USING (g)
GROUP BY inv.doc_id
"""

_DEDUP_LINES_SQL = """
WITH pages AS (
  SELECT doc_id,
         concat_ws(chr(10), text, 'nav home login search footer',
                   text, 'nav home login search footer') AS text
  FROM documents
), s AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM pages
)
SELECT doc_id,
       array_to_string(
         list_filter(lines, (x, i) -> list_position(lines, x) = i),
         chr(10)) AS text_dedup,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(lines)
            - len(list_filter(lines, (x, i) -> list_position(lines, x) = i))
            AS BIGINT) AS n_removed
FROM s
"""

def _dedup_apply_sql() -> str:
    return f"""
WITH clustered AS (
{_dedup_clusters_sql()}
)
SELECT cluster_id AS doc_id, COUNT(*) - 1 AS n_dups_removed
FROM clustered GROUP BY cluster_id
"""


_REMOVE_DUP_PASSAGES_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t,
         regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+') AS tl
  FROM documents
),
pos AS (
  SELECT doc_id, i, array_to_string(tl[i:i+4], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(tl) - 5 + 2)) AS i) ix
),
dup AS (
  -- Spark's distinct+count(1) counts a NULL doc id as one document
  -- toward the gram's doc frequency; COUNT(DISTINCT) would drop it.
  -- (The rebuild half of the oracle still requires unique NON-NULL
  -- ids — true of the documents table; Spark's NULL-id pass-through
  -- is pinned by unit tests instead.)
  SELECT g FROM (
    SELECT g,
           count(DISTINCT doc_id)
             + max(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS nd
    FROM pos GROUP BY 1)
  WHERE nd >= 2
),
cov AS (
  SELECT DISTINCT p.doc_id, p.i + jj.j AS cp
  FROM pos p JOIN dup USING (g),
       LATERAL (SELECT unnest(range(0, 5)) AS j) jj
),
tp AS (
  SELECT doc_id, i, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) ix
)
SELECT tp.doc_id,
       COALESCE(
         string_agg(CASE WHEN cov.cp IS NULL THEN tp.tok END, ' ' ORDER BY tp.i),
         '') AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN cov.cp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_tokens
FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.i = cov.cp
GROUP BY 1
"""
