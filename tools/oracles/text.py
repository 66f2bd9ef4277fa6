"""Text-analysis family oracle SQL (stats, lang-id, quality,
Gopher rules, TF-IDF, normalization, fingerprints).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""


_TEXT_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       length(text) AS n_chars_txt,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) AS alpha_ratio,
       length(text) / len(regexp_split_to_array(trim(text), '\s+')) AS chars_per_token
FROM documents
"""

_LANG_ID_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','for'))) AS hits_en,
         len(list_filter(toks, x -> x IN ('el','la','de','y','que','en','los','por'))) AS hits_es,
         len(list_filter(toks, x -> x IN ('le','la','de','et','que','les','des','pour'))) AS hits_fr
  FROM t
)
SELECT doc_id, hits_en, hits_es, hits_fr,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
            WHEN hits_es >= hits_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM h
"""

_FINGERPRINT_SQL = r"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
            list_transform(regexp_split_to_array(trim(text), '\s+'),
                           t -> CAST(ascii(t) AS BIGINT) * 31 + length(t))),
         (acc, x) -> (acc * 131 + x) % 1000000007
       ) AS fingerprint
FROM documents
"""

_TEXT_QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks,
         length(text)::DOUBLE AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS alpha,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::DOUBLE AS punct
  FROM documents
), f AS (
  SELECT doc_id,
         len(toks)::DOUBLE AS n_tok, n_chars, alpha, punct,
         len(list_filter(ltoks, x -> x IN
             ('the','a','of','and','to','in','is','for','that','it')))::DOUBLE AS stop_hits,
         len(list_distinct(ltoks))::DOUBLE AS n_distinct
  FROM t
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       alpha / n_chars AS alpha_ratio,
       punct / n_chars AS punct_ratio,
       stop_hits / n_tok AS stopword_ratio,
       n_distinct / n_tok AS distinct_token_ratio,
       ROUND(0.25 * least(n_tok / 100.0, 1.0)
           + 0.25 * (alpha / n_chars)
           + 0.2 * least(stop_hits / n_tok * 5.0, 1.0)
           + 0.2 * (n_distinct / n_tok)
           + 0.1 * (1.0 - least(punct / n_chars * 10.0, 1.0)), 6) AS quality
FROM f
"""

_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, score,
       CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
)
WHERE rk <= 3
"""

_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS lt FROM documents
), s AS (
  SELECT doc_id, lt, len(lt) AS n,
         list_transform(range(0, greatest(len(lt) - 2, 0) + 1),
                        i -> concat_ws(' ', lt[i + 1], lt[i + 2])) AS bg
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(len(list_distinct(lt))::DOUBLE / n, 6) AS distinct_token_frac,
       ROUND(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 6) AS dup_bigram_frac,
       ROUND(list_max(list_transform(list_distinct(lt),
                      x -> len(list_filter(lt, y -> y = x))))::DOUBLE / n, 6)
         AS top_token_frac
FROM s
"""

_TEXT_NORMALIZE_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_before,
       CAST(length(t) AS BIGINT) AS n_after,
       t AS text_norm
FROM (
  SELECT doc_id, text,
         lower(trim(regexp_replace(
           regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '\s+', ' ', 'g'))) AS t
  FROM documents
)
"""

_GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(lower(text)), '\s+') AS lt
  FROM documents
), s AS (
  SELECT doc_id, len(lt) AS n,
    CAST(list_aggregate(list_transform(lt, w -> length(w)), 'sum') AS DOUBLE) AS wlen,
    CAST(length(text) - length(replace(text, '#', ''))
         + len(string_split_regex(text, '\.\.\.')) - 1 AS DOUBLE) AS symbols,
    CAST(len(list_filter(lt, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) AS alpha_words,
    len(list_filter(lt, w -> list_contains(['the','a','of','and','to','in','is','for','that','it'], w))) AS stop_hits
  FROM t
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  ROUND(wlen / n, 6) AS mean_word_len,
  ROUND(symbols / n, 6) AS symbol_word_ratio,
  ROUND(alpha_words / n, 6) AS alpha_word_frac,
  CAST(stop_hits AS BIGINT) AS stop_hits,
  (n >= 50 AND n <= 100000) AS rule_word_count,
  (wlen / n >= 3.0 AND wlen / n <= 10.0) AS rule_mean_word_len,
  (symbols / n <= 0.1) AS rule_symbol_ratio,
  (alpha_words / n >= 0.8) AS rule_alpha_words,
  (stop_hits >= 2) AS rule_stopwords,
  (n >= 50 AND n <= 100000 AND wlen / n >= 3.0 AND wlen / n <= 10.0
   AND symbols / n <= 0.1 AND alpha_words / n >= 0.8 AND stop_hits >= 2) AS keep
FROM s
"""

_DOMAIN_STATS_SQL = r"""
SELECT source,
       COUNT(*) AS n_docs,
       -- DuckDB SUM(BIGINT) widens to HUGEINT (surfaces as float64 in
       -- Arrow) while Spark stays BIGINT; pin the oracle to BIGINT.
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_tokens,
       ROUND(quantile_cont(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 0.5), 4)
         AS p50_tokens,
       ROUND(quantile_cont(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 0.9), 4)
         AS p90_tokens
FROM documents GROUP BY source
"""

_PII_REDACT_SQL = """
SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_redacted
FROM events
"""

_CHUNK_DOCUMENTS_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 48)) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // 48 AS BIGINT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start + 1, start + 64)) AS BIGINT) AS n_tokens
FROM s
"""

_UNIGRAM_LOGPROB_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), total AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t FROM counts
), scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CAST(ln(c::DOUBLE) AS DECIMAL(25,12))) AS DOUBLE) AS slc
  FROM toks JOIN counts USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       ROUND(slc / n_tokens - ln((SELECT t FROM total)), 4) AS avg_logprob
FROM scored
"""



_STRIP_BOILERPLATE_SQL = r"""
WITH l AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, ' ')) AS line,
         unnest(range(1, len(regexp_split_to_array(text, ' ')) + 1)) AS pos
  FROM documents
), e AS (
  SELECT doc_id, pos, line, length(trim(line)) >= 4 AS elig FROM l
), b AS (
  SELECT trim(line) AS k FROM e WHERE elig
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 390
), kept AS (
  SELECT e.doc_id, e.pos, e.line,
         (e.elig AND b.k IS NOT NULL) AS dropped
  FROM e LEFT JOIN b ON trim(e.line) = b.k
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       COALESCE(string_agg(CASE WHEN NOT dropped THEN line END, ' ' ORDER BY pos), '')
         AS text_clean
FROM kept
GROUP BY doc_id
"""


_HEAVY_HITTERS_SQL = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS v FROM documents
), tot AS (
  SELECT COUNT(*) AS n FROM t
)
SELECT v AS value,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) / (SELECT n FROM tot)::DOUBLE, 6) AS frac
FROM t
GROUP BY v
HAVING COUNT(*) >= ceil(0.01 * (SELECT n FROM tot))
"""


_FREQUENT_NGRAMS_SQL = r"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
), g AS (
  SELECT unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS v
  FROM t WHERE len(toks) >= 3
), tot AS (
  SELECT COUNT(*) AS n FROM g
)
SELECT v AS value,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) / (SELECT n FROM tot)::DOUBLE, 6) AS frac
FROM g
GROUP BY v
HAVING COUNT(*) >= ceil(0.0002 * (SELECT n FROM tot))
"""


_HH_BY_SOURCE_SQL = r"""
WITH t AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS v
  FROM documents
), tot AS (
  SELECT source, COUNT(*) AS n FROM t GROUP BY source
)
SELECT t.source,
       t.v AS value,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) / MIN(tot.n)::DOUBLE, 6) AS frac
FROM t JOIN tot ON t.source = tot.source
GROUP BY t.source, t.v
HAVING COUNT(*) >= ceil(0.03 * MIN(tot.n))
"""


# -- pii_redact_full ---------------------------------------------------
# The testdata carries no natural emails/UUIDs/IPs, so the driver row
# SYNTHESIZES a deterministic PII-bearing column from event fields
# inside the query — same construction in both engines — then redacts
# it.  The two expressions below must stay semantically identical; the
# driver's value-hash compare enforces that every round.
_PII_SYNTH_SPARK_EXPR = (
    "concat('contact u', CAST(coalesce(user_id, 0) AS STRING),"
    " '@example.com or id ',"
    " substr(md5(CAST(coalesce(event_id, 0) AS STRING)), 1, 8), '-',"
    " substr(md5(CAST(coalesce(event_id, 0) AS STRING)), 9, 4), '-',"
    " substr(md5(CAST(coalesce(event_id, 0) AS STRING)), 13, 4), '-',"
    " substr(md5(CAST(coalesce(event_id, 0) AS STRING)), 17, 4), '-',"
    " substr(md5(CAST(coalesce(event_id, 0) AS STRING)), 21, 12),"
    " ' at 10.', CAST(coalesce(user_id, 0) % 256 AS STRING),"
    " '.0.', CAST(coalesce(event_id, 0) % 256 AS STRING),"
    " ' call +1 (555) 010-',"
    " lpad(CAST(coalesce(event_id, 0) % 10000 AS STRING), 4, '0'),"
    " ' ref ', coalesce(props, ''))"
)

_PII_SYNTH_DUCKDB_EXPR = (
    _PII_SYNTH_SPARK_EXPR.replace("AS STRING", "AS VARCHAR")
)


def _pii_redact_full_sql() -> str:
    """DuckDB twin of operators.text.redact_pii over the synthesized
    column: the SAME ordered pattern chain, imported from the package's
    PII_PATTERNS table so the two can never drift — each count runs on
    the text as rewritten by the preceding patterns, then the next
    replacement applies."""
    from python_ctd_spark.operators.text import PII_PATTERNS

    cur = _PII_SYNTH_DUCKDB_EXPR
    pieces = []
    for name, pat, marker in PII_PATTERNS:
        esc = pat.replace("'", "''")
        pieces.append(
            f"CAST(len(regexp_extract_all({cur}, '{esc}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{esc}', '{marker}', 'g')"
    cols = ",\n       ".join(pieces)
    return (
        f"SELECT event_id,\n       {cols},\n       {cur} AS redacted\n"
        "FROM events"
    )


# -- strip_markup ------------------------------------------------------
# The testdata text is plain prose, so the driver row synthesizes a
# deterministic HTML wrapper around it inside the query — identical
# construction in both engines — and strips that.  The wrapper plants
# every pattern class the chain handles: doctype, head with style and
# script blocks (whose CONTENT must vanish), attributes, self-closing
# and close tags, a comment, and all six entities.
_MARKUP_SYNTH_SPARK_EXPR = (
    "concat('<!DOCTYPE html><html><head>',"
    " '<style>p { color: red }</style>',"
    " '<script type=\"text/javascript\">var x = ',"
    " CAST(coalesce(doc_id, 0) % 100 AS STRING), ';</script></head>',"
    " '<body><h1 id=\"t\">Doc ', CAST(coalesce(doc_id, 0) AS STRING),"
    " '</h1><p class=\"main\">', coalesce(text, ''),"
    " '</p><br/><div>&amp; &lt;tag&gt; &nbsp;&quot;q&#39;</div>',"
    " '<!-- c', CAST(coalesce(doc_id, 0) % 7 AS STRING), ' -->',"
    " '</body></html>')"
)

_MARKUP_SYNTH_DUCKDB_EXPR = (
    _MARKUP_SYNTH_SPARK_EXPR.replace("AS STRING", "AS VARCHAR")
)


def _strip_markup_sql(src: str = "documents") -> str:
    """DuckDB twin of operators.markup.strip_markup over the synthesized
    column: the SAME ordered chain, imported from the package's
    MARKUP_PATTERNS/HTML_ENTITIES tables so the two can never drift —
    per-step counts run on the text as rewritten by preceding steps;
    all six entity counts are taken on the tag-stripped text before
    any entity replacement (the operator's documented semantics).
    The final whitespace collapse imports WS_PATTERN — the explicit
    engine-independent class (ADVICE r11: Java's \\s includes \\x0B,
    RE2's does not)."""
    from python_ctd_spark.operators.markup import (
        HTML_ENTITIES,
        MARKUP_PATTERNS,
        WS_PATTERN,
    )

    cur = _MARKUP_SYNTH_DUCKDB_EXPR
    pieces = []
    for name, pat in MARKUP_PATTERNS:
        esc = pat.replace("'", "''")
        pieces.append(
            f"CAST(len(regexp_extract_all({cur}, '{esc}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{esc}', ' ', 'g')"
    ents = " + ".join(
        f"len(regexp_extract_all({cur}, '{lit.replace(chr(39), chr(39)*2)}'))"
        for lit, _rep in HTML_ENTITIES
    )
    pieces.append(f"CAST({ents} AS BIGINT) AS n_entities")
    for lit, rep in HTML_ENTITIES:
        lit_sql = lit.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        cur = f"replace({cur}, '{lit_sql}', '{rep_sql}')"
    cur = f"trim(regexp_replace({cur}, '{WS_PATTERN}', ' ', 'g'))"
    cols = ",\n       ".join(pieces)
    return (
        f"SELECT doc_id,\n       {cols},\n       {cur} AS text_plain\n"
        f"FROM {src}"
    )


def _streaming_markup_sql() -> str:
    """Oracle for the streaming extraction row: the identical generated
    markup chain over the new-document shard — extraction is stateless,
    so the closed drain equals this batch chain exactly (twin law)."""
    from tools.oracles.params import _STREAM_SHARD_BOUND

    inner = _strip_markup_sql(
        "(SELECT doc_id, text FROM documents"
        f" WHERE doc_id % 5 = 0 AND doc_id < {_STREAM_SHARD_BOUND})"
    )
    return (
        "SELECT doc_id, n_tag, n_entities, text_plain FROM ("
        + inner
        + ")"
    )


# -- extract_links -----------------------------------------------------
# Deterministic link-bearing HTML synthesized inside the query in both
# engines: every doc gets a per-doc ref link (double-quoted), a
# blocklisted tracker link (SINGLE-quoted — the quoting variant that
# must not dodge the blocklist, ADVICE r11), a RELATIVE anchor, a
# protocol-relative tracker PIXEL (img — blocked only if resolution
# and asset-tag extraction both work, VERDICT r12 items 1c+8), a
# root-relative stylesheet link; every second doc an UNQUOTED
# dot-dot script src, every third an extra docs link (variable
# outlink counts exercise the explode) and a single-quoted <source
# srcset> pair, every fourth an UNQUOTED href, every sixth a
# fragment-only anchor.  r14: every doc carries an img srcset
# candidate list (relative thumb + protocol-relative spam 2x — the
# responsive-image blocklist dodge, VERDICT r13 item 3); every fifth
# doc opens with an ABSOLUTE <base href> and every tenth with a
# RELATIVE single-quoted one (RFC 3986 §5.1.1 priority — every
# relative link in those docs must resolve against the base element,
# not the page URI; VERDICT r13 item 2); every eighth doc ends with a
# trailing-'..' anchor (the terminal dot-segment rule, ADVICE r13).
_LINKS_SYNTH_SPARK_EXPR = (
    "concat("
    " CASE WHEN coalesce(doc_id, 0) % 10 = 5 THEN"
    " '<base href=''../b/''>'"
    " WHEN coalesce(doc_id, 0) % 5 = 0 THEN"
    " concat('<base href=\"https://cdn',"
    " CAST(coalesce(doc_id, 0) % 3 AS STRING), '.example.org/pages/\">')"
    " ELSE '' END,"
    " '<p>See <a href=\"https://site',"
    " CAST(coalesce(doc_id, 0) % 7 AS STRING),"
    " '.example.org/p/', CAST(coalesce(doc_id, 0) AS STRING),"
    " '\">ref  ', CAST(coalesce(doc_id, 0) AS STRING), '</a>',"
    " ' and <a class=\"x\" href=''https://spam.example.net/track?u=',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '''>offer</a>',"
    " ' then <a href=\"page', CAST(coalesce(doc_id, 0) % 4 AS STRING),"
    " '.html\">next page</a>',"
    " CASE WHEN coalesce(doc_id, 0) % 3 = 0 THEN"
    " concat(' plus <a href=\"http://docs.example.com/',"
    " CAST(coalesce(doc_id, 0) % 11 AS STRING), '\">docs\n',"
    " CAST(coalesce(doc_id, 0) % 11 AS STRING), '</a>') ELSE '' END,"
    " CASE WHEN coalesce(doc_id, 0) % 4 = 0 THEN"
    " concat(' see <a href=http://u.example.net/',"
    " CAST(coalesce(doc_id, 0) % 13 AS STRING), '>bare</a>')"
    " ELSE '' END,"
    " CASE WHEN coalesce(doc_id, 0) % 6 = 0 THEN"
    " concat(' <a href=\"#sec-', CAST(coalesce(doc_id, 0) % 9 AS STRING),"
    " '\">jump</a>') ELSE '' END,"
    " '<img alt=\"px\" src=''//spam.example.net/px/',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '.gif''/>',"
    " '<link rel=\"stylesheet\" href=\"/assets/site-',"
    " CAST(coalesce(doc_id, 0) % 3 AS STRING), '.css\"/>',"
    " CASE WHEN coalesce(doc_id, 0) % 2 = 0 THEN"
    " concat('<script src=../static/app-',"
    " CAST(coalesce(doc_id, 0) % 7 AS STRING), '.js></script>')"
    " ELSE '' END,"
    " '<img alt=\"resp\" srcset=\"thumb-',"
    " CAST(coalesce(doc_id, 0) % 7 AS STRING), '.jpg 1x,"
    " //spam.example.net/big-', CAST(coalesce(doc_id, 0) % 5 AS STRING),"
    " '.jpg 2x\" src=\"main-', CAST(coalesce(doc_id, 0) % 4 AS STRING),"
    " '.png\"/>',"
    " CASE WHEN coalesce(doc_id, 0) % 3 = 0 THEN"
    " concat('<source srcset=''sm-',"
    " CAST(coalesce(doc_id, 0) % 9 AS STRING), '.webp 480w , lg-',"
    " CAST(coalesce(doc_id, 0) % 9 AS STRING), '.webp 800w''/>')"
    " ELSE '' END,"
    " CASE WHEN coalesce(doc_id, 0) % 8 = 0 THEN"
    " ' <a href=\"..\">up</a>' ELSE '' END,"
    " '</p><p>No links here: ', coalesce(text, ''), '</p>')"
)

_LINKS_SYNTH_DUCKDB_EXPR = (
    _LINKS_SYNTH_SPARK_EXPR.replace("AS STRING", "AS VARCHAR")
)

#: the page URI each doc's links resolve against — the WARC-target-URI
#: shape the crawl head produces (directory path, so relative refs
#: exercise the base-dir rule)
_LINKS_BASE_SPARK_EXPR = (
    "concat('https://site', CAST(coalesce(doc_id, 0) % 7 AS STRING),"
    " '.example.org/w/', CAST(coalesce(doc_id, 0) AS STRING),"
    " '/index.html')"
)

_LINKS_BASE_DUCKDB_EXPR = (
    _LINKS_BASE_SPARK_EXPR.replace("AS STRING", "AS VARCHAR")
)


def _resolve_url_sql(url: str, base: str) -> str:
    """DuckDB twin of operators.markup.resolve_url — the SAME pattern
    constants, the same CASE arms, the same bounded dot-segment
    passes, so the two resolutions can never drift."""
    from python_ctd_spark.operators.markup import (
        DOT_SEGMENT_PASSES,
        URL_BASE_DIR_PATTERN,
        URL_BASE_PATH_PATTERN,
        URL_ORIGIN_PATTERN,
        URL_SCHEME_PATTERN,
    )

    origin_re = URL_ORIGIN_PATTERN.replace("'", "''")
    base_nofrag = f"regexp_replace({base}, '#.*', '')"
    origin = f"regexp_extract({base}, '{origin_re}', 1)"
    scheme = f"regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
    bdir = (f"coalesce(nullif(regexp_extract({base},"
            f" '{URL_BASE_DIR_PATTERN}', 1), ''), '/')")
    bpath = (f"coalesce(nullif(regexp_extract({base},"
             f" '{URL_BASE_PATH_PATTERN}', 1), ''), '/')")
    resolved = f"""CASE
      WHEN {url} = '' THEN {base_nofrag}
      WHEN regexp_matches({url}, '{URL_SCHEME_PATTERN}') THEN {url}
      WHEN starts_with({url}, '//') THEN {scheme} || ':' || {url}
      WHEN starts_with({url}, '/') THEN {origin} || {url}
      WHEN starts_with({url}, '#') THEN {base_nofrag} || {url}
      WHEN starts_with({url}, '?') THEN {origin} || {bpath} || {url}
      ELSE {origin} || {bdir} || {url} END"""
    rest = f"regexp_replace({resolved}, '{origin_re}', '')"
    path = f"regexp_extract({rest}, '^([^?#]*)', 1)"
    tail = f"regexp_replace({rest}, '^[^?#]*', '')"
    for _ in range(DOT_SEGMENT_PASSES):
        path = f"regexp_replace({path}, '/\\./', '/', 'g')"
        path = f"regexp_replace({path}, '/[^/]+/\\.\\./', '/', 'g')"
    # terminal dot segments (ADVICE r13) — same two final passes as
    # operators.markup._resolve_with_parts
    path = f"regexp_replace({path}, '/[^/]+/\\.\\.$', '/')"
    path = f"regexp_replace({path}, '/\\.$', '/')"
    return (f"regexp_extract({resolved}, '{origin_re}', 1) || {path}"
            f" || {tail}")


def _unquote_attr_sql(v: str) -> str:
    """DuckDB twin of operators.markup._unquote_attr — strip one level
    of symmetric quoting from an extracted attribute value."""
    return (f"regexp_replace(regexp_replace({v},"
            " '(?s)^\"(.*)\"$', '\\1'), '(?s)^''(.*)''$', '\\1')")


def _extract_links_sql() -> str:
    """DuckDB twin of operators.markup.extract_links over the
    synthesized column — same TAG_URL_PATTERNS (quote-alternating) /
    BASE_HREF_PATTERN / SRCSET split / DOMAIN_PATTERN /
    BLOCKED_DOMAINS / WS_PATTERN / resolve_url constants imported from
    the package so the two can never drift (only the backreference
    SYNTAX differs: Spark's ``$1`` is RE2's ``\\1``); unnest-with-range
    replays the per-tag indexed transform's document order, UNION ALL
    the array concat; the ``nb`` CTE replays the effective-base rule
    (first <base href>, resolved against the page URI, else the page
    URI — RFC 3986 §5.1.1)."""
    from python_ctd_spark.operators.markup import (
        BASE_HREF_PATTERN,
        BLOCKED_DOMAINS,
        DOMAIN_PATTERN,
        LINK_TAG_ATTRS,
        SRCSET_TAGS,
        TAG_URL_PATTERNS,
        WS_CHARS,
        WS_PATTERN,
    )

    html = _LINKS_SYNTH_DUCKDB_EXPR
    dom = DOMAIN_PATTERN.replace("'", "''")
    blocked = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)
    arms = []
    for tag, _attr in LINK_TAG_ATTRS:
        pat = TAG_URL_PATTERNS[tag].replace("'", "''")
        anchor = (
            f"trim(regexp_replace(a[i], '{WS_PATTERN}', ' ', 'g'))"
            if tag == "a" else "CAST(NULL AS VARCHAR)"
        )
        a_col = (f"regexp_extract_all(html, '{pat}', 2) AS a,"
                 if tag == "a" else "")
        if tag in SRCSET_TAGS:
            # candidate list -> URLs: split each attr value on commas,
            # first non-whitespace token per candidate, empties drop —
            # the _srcset_urls twin, flattened across attributes
            cand = (f"regexp_extract(c,"
                    f" '^[{WS_CHARS}]*([^{WS_CHARS}]+)', 1)")
            u_expr = (
                f"flatten(list_transform("
                f"regexp_extract_all(html, '{pat}', 1),"
                f" v -> list_filter(list_transform("
                f"str_split({_unquote_attr_sql('v')}, ','),"
                f" c -> {cand}), u -> u <> '')))"
            )
        else:
            u_expr = (
                f"list_transform(regexp_extract_all(html, '{pat}', 1),"
                f" v -> {_unquote_attr_sql('v')})"
            )
        arms.append(f"""  SELECT doc_id, base, '{tag}' AS tag,
         CAST(i AS INT) AS link_pos, u[i] AS url, {anchor} AS anchor
  FROM (
    SELECT doc_id, base, {a_col}
           {u_expr} AS u
    FROM nb
  ), LATERAL (SELECT unnest(range(1, len(u) + 1)) AS i) ix""")
    union = "\nUNION ALL\n".join(arms)
    resolve = _resolve_url_sql("url", "base")
    base_pat = BASE_HREF_PATTERN.replace("'", "''")
    bh = _unquote_attr_sql(f"regexp_extract(html, '{base_pat}', 1)")
    base_resolve = _resolve_url_sql("bh", "base")
    return f"""
WITH n AS (
  SELECT doc_id, {_LINKS_BASE_DUCKDB_EXPR} AS base, {html} AS html
  FROM documents
), nb AS (
  SELECT doc_id, html,
         CASE WHEN bh <> '' THEN {base_resolve} ELSE base END AS base
  FROM (SELECT doc_id, html, base, {bh} AS bh FROM n)
), ex AS (
{union}
), res AS (
  SELECT doc_id, tag, link_pos, url, anchor,
         {resolve} AS abs_url
  FROM ex
)
SELECT doc_id, tag, link_pos, url, abs_url, domain, anchor,
       domain IN ({blocked}) AS is_blocked
FROM (
  SELECT doc_id, tag, link_pos, url, abs_url, anchor,
         regexp_replace(lower(regexp_extract(abs_url, '{dom}', 1)),
                        '\\.$', '') AS domain
  FROM res
)
"""


# -- quality_classifier ------------------------------------------------
# Deterministic seed construction shared by the Spark row and the
# oracle: good = the corpus's English prose, bad = md5-hex gibberish
# synthesized from every document (no stopwords, hex-only alpha, no
# punctuation — separable by construction).  The expression is valid,
# with identical semantics, in BOTH Spark SQL and DuckDB.
_QC_GIBBERISH_EXPR = (
    "concat(substr(md5(coalesce(text, '')), 1, 7), ' ',"
    " substr(md5(coalesce(text, '')), 8, 9), ' ',"
    " substr(md5(concat(coalesce(text, ''), 'q')), 1, 11), ' ',"
    " substr(md5(concat(coalesce(text, ''), 'r')), 3, 13))"
)


def _qc_feats_inner_sql(src: str, cols: str = "y") -> str:
    """The raw-feature projection shared by every classifier oracle:
    identical primitives (trim/lower/regex/list ops) to
    operators.classify.quality_features, FROM the given source
    relation which must expose a text column ``t`` plus ``cols``."""
    from python_ctd_spark.operators.text import STOPWORDS

    toks = "regexp_split_to_array(trim(lower(t)), '\\s+')"
    stops_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
  SELECT {cols},
         CAST(len({toks}) AS DOUBLE) AS n_tok,
         CAST(length(t) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(trim(t), '\\s+', '', 'g')) AS DOUBLE)
           AS n_nonws,
         CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           AS n_alpha,
         CAST(length(regexp_replace(t, '[A-Za-z0-9 \\t\\n\\f\\r]', '', 'g')) AS DOUBLE)
           AS n_punct,
         CAST(len(list_filter({toks}, w -> w IN ({stops_list}))) AS DOUBLE)
           AS n_stop,
         CAST(len(list_distinct({toks})) AS DOUBLE) AS n_dist
  FROM {src}
"""


def _qc_qf_sql() -> list[str]:
    """Quantized-feature expressions over _qc_feats_inner_sql's columns,
    index-aligned with classify.FEATURES."""
    from python_ctd_spark.operators.classify import _SCALE

    fexprs = [
        "1.0",
        "least(n_tok, 1000.0) / 1000.0",
        "least(n_nonws / n_tok, 10.0) / 10.0",
        "n_stop / n_tok",
        "n_alpha / greatest(n_chars, 1.0)",
        "n_punct / greatest(n_chars, 1.0)",
        "n_dist / n_tok",
    ]
    return [
        f"CAST(floor(({e}) * {float(_SCALE)!r} + 0.5) AS BIGINT) AS qf{i}"
        for i, e in enumerate(fexprs)
    ]


def _quality_classifier_sql(iters: int = 3, lr: float = 5.0) -> str:
    """DuckDB twin of operators.classify.train_quality_classifier on
    the fixture seeds: the SAME fixed-iteration full-batch loop,
    UNROLLED — weights are 1-row CTEs, each gradient CTE aggregates the
    quantized residual x quantized feature BIGINT products, and every
    float step repeats the Spark side's exact IEEE op sequence (the
    rational fast sigmoid keeps exp() out of the contract)."""
    from python_ctd_spark.operators.classify import FEATURES, _SCALE

    nf = len(FEATURES)
    feats_inner = _qc_feats_inner_sql("seeds")
    qf = ",\n         ".join(_qc_qf_sql())
    ctes = [
        "seeds AS (\n"
        "  SELECT 1 AS y, coalesce(text, '') AS t FROM documents"
        " WHERE lang = 'en'\n"
        "  UNION ALL\n"
        f"  SELECT 0 AS y, {_QC_GIBBERISH_EXPR} AS t FROM documents\n)",
        f"feats AS (\n  SELECT y,\n         {qf}\n  FROM ({feats_inner}) )",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM feats)",
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w{i}" for i in range(nf)) + ")",
    ]
    for it in range(1, iters + 1):
        z = " + ".join(
            f"(w{i} * CAST(qf{i} AS DOUBLE))" for i in range(nf)
        )
        gsums = ", ".join(
            f"SUM(r * qf{i}) AS g{i}" for i in range(nf)
        )
        ctes.append(
            f"g{it} AS (\n  SELECT {gsums} FROM (\n"
            f"    SELECT CAST(floor((0.5 + 0.5 * __z / (1.0 + abs(__z))"
            f" - CAST(y AS DOUBLE)) * {float(_SCALE)!r} + 0.5) AS BIGINT)"
            f" AS r,\n           "
            + ", ".join(f"qf{i}" for i in range(nf))
            + f"\n    FROM (SELECT y, ({z}) / {float(_SCALE)!r} AS __z, "
            + ", ".join(f"qf{i}" for i in range(nf))
            + f" FROM feats, w{it - 1})\n  ) )"
        )
        s2 = float(_SCALE) * float(_SCALE)
        wnew = ", ".join(
            f"w{i} - (({lr!r} * (CAST(g{i} AS DOUBLE) / {s2!r})) / n) AS w{i}"
            for i in range(nf)
        )
        ctes.append(f"w{it} AS (SELECT {wnew} FROM w{it - 1}, g{it}, nn)")
    rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature,"
        f" floor(w{i} * 1000000.0 + 0.5) / 1000000.0 AS weight FROM w{iters}"
        for i, name in enumerate(FEATURES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


def _streaming_quality_sql() -> str:
    """Oracle for the streaming scoring row: the committed serving
    weights (classify.DEMO_WEIGHTS) applied to the new-document shard —
    scoring is stateless/deterministic, so the closed-drain streaming
    result equals this batch formula exactly (twin law)."""
    from python_ctd_spark.operators.classify import DEMO_WEIGHTS, _SCALE

    qf = ",\n         ".join(_qc_qf_sql())
    from tools.oracles.params import _STREAM_SHARD_BOUND

    feats_inner = _qc_feats_inner_sql(
        "(SELECT doc_id, coalesce(text, '') AS t FROM documents"
        f" WHERE doc_id % 5 = 0 AND doc_id < {_STREAM_SHARD_BOUND})",
        cols="doc_id",
    )
    z = " + ".join(
        f"({w!r} * CAST(qf{i} AS DOUBLE))" for i, w in enumerate(DEMO_WEIGHTS)
    )
    return f"""
WITH feats AS (
  SELECT doc_id,
         {qf}
  FROM ({feats_inner})
)
SELECT doc_id,
       ROUND(0.5 + 0.5 * __z / (1.0 + abs(__z)), 6) AS quality_prob
FROM (SELECT doc_id, ({z}) / {float(_SCALE)!r} AS __z FROM feats)
"""


_BIGRAM_LOGPROB_SQL = r"""
WITH lt AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
  FROM documents
), big AS (
  SELECT doc_id, t[i] AS p, t[i] || ' ' || t[i + 1] AS g
  FROM lt, LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
  WHERE len(t) >= 2
), cnt AS (
  SELECT g, COUNT(*) AS c FROM big GROUP BY g
), ptot AS (
  SELECT p, COUNT(*) AS cp FROM big GROUP BY p
), v AS (
  SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
  FROM (SELECT unnest(t) AS tok FROM lt)
), scored AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(CAST(
           ln((coalesce(c, 0) + 1)::DOUBLE)
           - ln(coalesce(cp, 0)::DOUBLE + (SELECT v FROM v))
         AS DECIMAL(25,12))) AS DOUBLE) AS s
  FROM big LEFT JOIN cnt USING (g) LEFT JOIN ptot USING (p)
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       ROUND(s / n_bigrams, 4) AS avg_logprob
FROM scored
"""


_CMS_ACCURACY_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS v FROM documents
), jj AS (
  SELECT unnest(range(0, 4)) AS j
), cms AS (
  SELECT j, b, COUNT(*) AS c FROM (
    SELECT j,
           ('0x' || substr(md5(concat(j::VARCHAR, '|', v)), 1, 15))::BIGINT
             % 2048 AS b
    FROM toks, jj
  ) GROUP BY j, b
), probes AS (
  SELECT v, COUNT(*) AS n_exact FROM toks GROUP BY v
  ORDER BY n_exact DESC, v LIMIT 50
), est AS (
  SELECT p.v, MIN(coalesce(c.c, 0)) AS est
  FROM (
    SELECT v, j,
           ('0x' || substr(md5(concat(j::VARCHAR, '|', v)), 1, 15))::BIGINT
             % 2048 AS b
    FROM probes, jj
  ) p
  LEFT JOIN cms c ON p.j = c.j AND p.b = c.b
  GROUP BY p.v
)
SELECT probes.v AS value,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(est AS BIGINT) AS est,
       CAST(est - n_exact AS BIGINT) AS overcount
FROM probes JOIN est ON probes.v = est.v
"""


def _classifier_eval_sql(thresholds: tuple = (0.3, 0.5, 0.7)) -> str:
    """Oracle for the classifier evaluation row: confusion counts and
    precision/recall for the committed serving weights at fixed
    thresholds, over the same fixture seeds the trainer row uses — the
    deterministic evaluation loop (scoring formula shared via
    _qc_feats_inner_sql/_qc_qf_sql, weights literal)."""
    from python_ctd_spark.operators.classify import DEMO_WEIGHTS, _SCALE

    qf = ",\n         ".join(_qc_qf_sql())
    feats_inner = _qc_feats_inner_sql("seeds")
    z = " + ".join(
        f"({w!r} * CAST(qf{i} AS DOUBLE))" for i, w in enumerate(DEMO_WEIGHTS)
    )
    # explicit DOUBLE: a bare 0.3 literal infers DECIMAL(2,1) in DuckDB
    # while Spark emits DOUBLE — the raw-type divergence the type gate
    # exists to catch (the HUGEINT-vs-BIGINT lesson of rounds 4-5)
    th = ", ".join(f"CAST({float(t)!r} AS DOUBLE)" for t in thresholds)
    return f"""
WITH seeds AS (
  SELECT 1 AS y, coalesce(text, '') AS t FROM documents WHERE lang = 'en'
  UNION ALL
  SELECT 0 AS y, {_QC_GIBBERISH_EXPR} AS t FROM documents
), feats AS (
  SELECT y,
         {qf}
  FROM ({feats_inner})
), scored AS (
  SELECT y, ROUND(0.5 + 0.5 * __z / (1.0 + abs(__z)), 6) AS p
  FROM (SELECT y, ({z}) / {float(_SCALE)!r} AS __z FROM feats)
), th AS (SELECT unnest([{th}]) AS threshold)
SELECT threshold,
       CAST(SUM(CASE WHEN p > threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN p > threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN p <= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN p <= threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       ROUND(SUM(CASE WHEN p > threshold AND y = 1 THEN 1 ELSE 0 END)
             / nullif(SUM(CASE WHEN p > threshold THEN 1 ELSE 0 END), 0)::DOUBLE, 6)
         AS precision_,
       ROUND(SUM(CASE WHEN p > threshold AND y = 1 THEN 1 ELSE 0 END)
             / nullif(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END), 0)::DOUBLE, 6)
         AS recall_
FROM scored, th
GROUP BY threshold
"""
