"""DuckDB oracle twins + shared fixture expressions for the r14
crawl-frontier registry rows (VERDICT r13 item 1): ``robots_filter``
(robots.txt payloads -> rules table -> per-link disallow flags, the
composed :mod:`python_ctd_spark.operators.robots` pipeline),
``canonical_url`` (the frontier dedup key), and ``sitemap_urls``
(sitemaps.org XML parsing).

Fixture expressions are written in the Spark-SQL/DuckDB common subset
(``chr(10)`` for newlines — backslash escapes differ between the
engines — and ``CAST(... AS STRING)`` which the DuckDB variant rewrites
to VARCHAR), keyed off the ``documents`` table's ``source``/``doc_id``
columns so both engines synthesize byte-identical inputs.

The oracle SQL re-implements the operators' semantics independently in
DuckDB (line explode + window group attribution + longest-match for
robots — RFC 9309; split/transform/join for the URL key — RFC 3986
§6.2.2; element extraction + entity decode for sitemaps), mirroring
``operators/robots.py`` and ``operators/markup.py`` expression by
expression so the two can never drift silently.
"""

from __future__ import annotations

#: numeric handle of a source (src0..src19 -> 0..19), valid in both
#: engines
_SRC_N = "CAST(regexp_extract(source, '([0-9]+)', 1) AS INT)"

#: the domain key both the robots table and the links carry
_ROBOTS_DOMAIN_EXPR = "concat(source, '.example.org')"

#: deterministic robots.txt per domain: a * group (prefix rule, a
#: longer Allow override, an anchored wildcard rule, and a per-domain
#: varied /tmp<k>* rule), on even-n domains a contiguous
#: goodbot+otherbot group (tests specific-group-replaces-wildcard and
#: crawl-delay group membership), a comment line, a blank line, and a
#: group-independent Sitemap directive
_ROBOTS_TXT_EXPR = (
    "concat('# robots for ', source, chr(10),"
    " 'User-agent: *', chr(10),"
    " 'Disallow: /private/', chr(10),"
    " 'Allow: /private/ok-', CAST(" + _SRC_N + " % 3 AS STRING), '.html',"
    " chr(10),"
    " 'Disallow: /*.pdf$', chr(10),"
    " 'Disallow: /tmp', CAST(" + _SRC_N + " % 4 AS STRING), '*', chr(10),"
    " CASE WHEN " + _SRC_N + " % 2 = 0 THEN"
    " concat('User-agent: goodbot', chr(10), 'User-agent: otherbot',"
    " chr(10), 'Disallow: /only-good/', chr(10), 'Crawl-delay: 2',"
    " chr(10)) ELSE '' END,"
    " chr(10),"
    " 'Sitemap: https://', source, '.example.org/map.xml', chr(10))"
)

#: the per-doc link URLs flagged against the rules — one expression per
#: link_no; fragments on #1 (path-only matching), the Allow override
#: hit-or-miss on #2, the $ anchor on #3 vs the query-suffixed #4, the
#: goodbot-group path on #5, the varied /tmp rule on #6
_ROBOTS_LINK_EXPRS = (
    "concat('https://', source, '.example.org/private/f',"
    " CAST(coalesce(doc_id, 0) % 7 AS STRING), '.html#s',"
    " CAST(coalesce(doc_id, 0) % 3 AS STRING))",
    "concat('https://', source, '.example.org/private/ok-',"
    " CAST(coalesce(doc_id, 0) % 3 AS STRING), '.html')",
    "concat('https://', source, '.example.org/doc-',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '.pdf')",
    "concat('https://', source, '.example.org/doc-',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '.pdf?x=',"
    " CAST(coalesce(doc_id, 0) % 2 AS STRING))",
    "concat('https://', source, '.example.org/only-good/p',"
    " CAST(coalesce(doc_id, 0) % 4 AS STRING))",
    "concat('https://', source, '.example.org/tmp',"
    " CAST(coalesce(doc_id, 0) % 4 AS STRING), '/scratch')",
)

#: the crawler UA the registered row matches with — versioned, so the
#: RFC 9309 product-token prefix rule must fire for the goodbot group
ROBOTS_FILTER_AGENT = "GoodBot-News/2.1"


def _duck(expr: str) -> str:
    return expr.replace("AS STRING", "AS VARCHAR")


def _robots_scoped_ctes() -> tuple[str, str]:
    """The robots-parsing + agent-scoping CTE prefix shared by
    _robots_filter_sql and _frontier_schedule_sql (review r14 — the
    two previously duplicated ~45 lines of group-attribution SQL that
    could drift): returns ``(cte_prefix, link_arms)``.  The prefix
    ends at ``maxt`` (rule rows of the governing group per domain,
    RFC 9309 tiering); callers restrict to their directive."""
    agent_token = ROBOTS_FILTER_AGENT.lower().split("/", 1)[0].strip()
    dom = _duck(_ROBOTS_DOMAIN_EXPR)
    txt = _duck(_ROBOTS_TXT_EXPR)
    link_arms = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {i} AS link_no, {dom} AS domain,"
        f" {_duck(e)} AS abs_url FROM documents"
        for i, e in enumerate(_ROBOTS_LINK_EXPRS, 1)
    )
    prefix = f"""WITH doms AS (SELECT DISTINCT source FROM documents),
robots AS (SELECT {dom} AS domain, {txt} AS txt FROM doms),
lines AS (
  SELECT domain, CAST(i - 1 AS BIGINT) AS line_no,
         trim(regexp_replace(parts[i], '#.*', '')) AS line
  FROM (SELECT domain, str_split(txt, chr(10)) AS parts FROM robots),
       LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) ix
),
parsed AS (
  SELECT domain, line_no,
         lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS key,
         trim(regexp_extract(line, '^[A-Za-z-]+\\s*:(.*)$', 1)) AS value
  FROM lines
  WHERE regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1) <> ''
),
marks AS (
  SELECT *, CASE WHEN key = 'user-agent' AND coalesce(
      LAG(CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END)
        OVER (PARTITION BY domain ORDER BY line_no), 0) = 0
    THEN 1 ELSE 0 END AS is_start
  FROM parsed
),
grouped AS (
  SELECT *, SUM(is_start)
      OVER (PARTITION BY domain ORDER BY line_no) AS group_id
  FROM marks
),
agents AS (
  SELECT domain, group_id, lower(value) AS agent
  FROM grouped WHERE key = 'user-agent'
),
rules AS (
  SELECT domain, group_id, key AS directive, value
  FROM grouped
  WHERE key IN ('allow', 'disallow', 'crawl-delay') AND group_id > 0
),
scoped AS (
  SELECT a.domain, r.directive, r.value,
         regexp_replace(a.agent, '/.*', '') AS gtok
  FROM agents a JOIN rules r USING (domain, group_id)
),
tiered AS (
  SELECT *, CASE WHEN gtok = '*' THEN 0 ELSE length(gtok) END AS tier
  FROM scoped
  WHERE gtok = '*' OR starts_with('{agent_token}', gtok)
),
maxt AS (
  SELECT *, MAX(tier) OVER (PARTITION BY domain) AS max_tier FROM tiered
)"""
    return prefix, link_arms


def _robots_filter_sql() -> str:
    """DuckDB twin of robots_rules + apply_robots on the synthesized
    corpus: the shared parse/scope CTE prefix (_robots_scoped_ctes —
    line explode, contiguous-UA group attribution as two window CTEs
    because DuckDB rejects nested window functions, product-token
    prefix scoping mirroring operators/robots.py), then the per-link
    longest-match with allow-wins-ties expressed as MAX(disallow len)
    > MAX(allow len) — equivalent to the Spark fold: disallow wins
    only when strictly longer than the best allow."""
    prefix, link_arms = _robots_scoped_ctes()
    # _like_pattern twin: escape \ % _, honor the $ end anchor, * -> %
    esc = ("regexp_replace(regexp_replace(regexp_replace(value,"
           " '\\\\', '\\\\\\\\', 'g'), '%', '\\\\%', 'g'),"
           " '_', '\\\\_', 'g')")
    return f"""
{prefix},
esc AS (
  SELECT domain, directive, value, {esc} AS esc_val,
         CAST(length(value) AS INT) AS rule_len
  FROM maxt
  WHERE tier = max_tier AND directive IN ('allow', 'disallow')
    AND value <> ''
),
cand AS (
  SELECT domain, directive, rule_len,
         CASE WHEN ends_with(esc_val, '$')
           THEN replace(substr(esc_val, 1, length(esc_val) - 1), '*', '%')
           ELSE replace(esc_val, '*', '%') || '%' END AS pat
  FROM esc
),
links AS (
{link_arms}
),
keyed AS (
  SELECT *, coalesce(nullif(regexp_replace(
           regexp_replace(abs_url, '#.*', ''),
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), ''), '/') AS path
  FROM links
),
matched AS (
  SELECT k.doc_id, k.link_no, k.abs_url, k.domain, c.directive, c.rule_len
  FROM keyed k
  LEFT JOIN cand c
    ON k.domain = c.domain AND k.path LIKE c.pat ESCAPE '\\'
)
SELECT doc_id, link_no, abs_url, domain,
       coalesce(
         MAX(CASE WHEN directive = 'disallow' THEN rule_len END) >
         coalesce(MAX(CASE WHEN directive = 'allow' THEN rule_len END), -1),
         FALSE) AS is_robots_disallowed
FROM matched
GROUP BY doc_id, link_no, abs_url, domain
"""


# -- canonical_url -----------------------------------------------------

#: URL variants per doc: scheme case, userinfo, host case, default
#: port / trailing FQDN dot / both, percent-encoding (unreserved %7E,
#: reserved %2f, decodable %41, literal %25), tracking params, query
#: param order shuffles, SPA fragments carrying a fake query
_CANON_URL_EXPR = (
    "concat("
    " CASE WHEN coalesce(doc_id, 0) % 5 = 0 THEN 'HTTPS://'"
    " WHEN coalesce(doc_id, 0) % 5 = 1 THEN 'https://crawler@'"
    " ELSE 'https://' END,"
    " CASE WHEN coalesce(doc_id, 0) % 3 = 0 THEN upper(source)"
    " ELSE source END, '.Example.ORG',"
    " CASE WHEN coalesce(doc_id, 0) % 4 = 0 THEN ':443'"
    " WHEN coalesce(doc_id, 0) % 4 = 1 THEN '.'"
    " WHEN coalesce(doc_id, 0) % 4 = 2 THEN '.:443'"
    " ELSE '' END,"
    " '/Pg%7e', CAST(coalesce(doc_id, 0) % 7 AS STRING), '%2f%41%25',"
    " CASE WHEN coalesce(doc_id, 0) % 7 = 0 THEN '/caf%c3%a9' ELSE '' END,"
    " CASE WHEN coalesce(doc_id, 0) % 2 = 0 THEN"
    " concat('?b=2&utm_source=x&a=%3', CAST(coalesce(doc_id, 0) % 8 AS STRING))"
    " ELSE concat('?a=%3', CAST(coalesce(doc_id, 0) % 8 AS STRING), '&b=2')"
    " END,"
    " CASE WHEN coalesce(doc_id, 0) % 6 = 0 THEN '#!/route?tab=1'"
    " ELSE '' END)"
)


def _pct_normalize_sql(u: str) -> str:
    """DuckDB twin of operators.markup.percent_normalize — the same
    sentinel-split shape (PCT_HEX_PATTERN / PCT_UNRESERVED_PATTERN
    imported from the package)."""
    from python_ctd_spark.operators.markup import (
        PCT_HEX_PATTERN,
        PCT_UNRESERVED_PATTERN,
    )

    ch = "decode(from_hex(substr(p, 1, 2)))"
    keep = "'%' || upper(substr(p, 1, 2)) || substr(p, 3)"
    # decode() is guarded to ASCII bytes (leading hex digit 0-7):
    # DuckDB's decode throws on a lone non-UTF8 byte like %C3, while
    # the Spark side's char(195) simply fails the unreserved test —
    # escapes >= 0x80 can never be unreserved, so routing them straight
    # to the uppercase-keep arm is value-identical (review r14)
    return (
        f"substr(array_to_string(list_transform("
        f"str_split(chr(1) || {u}, '%'),"
        f" p -> CASE WHEN regexp_matches(p, '{PCT_HEX_PATTERN}')"
        f" THEN CASE WHEN regexp_matches(p, '^[0-7]')"
        f" THEN CASE WHEN regexp_matches({ch}, '{PCT_UNRESERVED_PATTERN}')"
        f" THEN {ch} || substr(p, 3)"
        f" ELSE {keep} END"
        f" ELSE {keep} END"
        f" ELSE '%' || p END), ''), 3)"
    )


def _canonical_url_sql(raw: str) -> str:
    """DuckDB twin of operators.markup.canonical_url: percent
    normalization first, then scheme/host lowering, userinfo strip,
    trailing-dot and default-port removal, path defaulting, fragment
    drop, tracking-param filter, byte-order param sort."""
    from python_ctd_spark.operators.markup import TRACKING_PARAM_PATTERN

    u = _pct_normalize_sql(raw)
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({u},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1)),"
        f" '\\.$', ''), '\\.:', ':')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http' AND ends_with({hostport}, ':80')"
        f" THEN substr({hostport}, 1, length({hostport}) - 3)"
        f" WHEN {scheme} = 'https' AND ends_with({hostport}, ':443')"
        f" THEN substr({hostport}, 1, length({hostport}) - 4)"
        f" ELSE {hostport} END"
    )
    path = (
        f"coalesce(nullif(regexp_extract({u},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), ''), '/')"
    )
    query = (
        f"regexp_extract(regexp_replace({u}, '#.*', ''), '\\?(.*)', 1)"
    )
    track = TRACKING_PARAM_PATTERN.replace("'", "''")
    q = (
        f"array_to_string(list_sort(list_filter(str_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{track}'))), '&')"
    )
    canon = (
        f"{scheme} || '://' || {host} || {path} ||"
        f" CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END"
    )
    return (
        f"CASE WHEN regexp_matches({raw}, '^[A-Za-z][A-Za-z0-9+.-]*://')"
        f" THEN {canon} ELSE {raw} END"
    )


def _canonical_url_row_sql() -> str:
    url = _duck(_CANON_URL_EXPR)
    return f"""
SELECT doc_id, url, {_canonical_url_sql('url')} AS canon
FROM (SELECT doc_id, {url} AS url FROM documents)
"""


# -- sitemap_urls ------------------------------------------------------

#: deterministic sitemap XML per domain: a urlset with per-entry
#: lastmod pairing across interleaved tags, whitespace inside <loc>,
#: XML entities (&amp; decodes), a variable third entry, and on every
#: third domain a nested sitemapindex; every fourth domain's payload
#: is junk (must emit nothing)
_SITEMAP_XML_EXPR = (
    "CASE WHEN " + _SRC_N + " % 4 = 3 THEN 'not xml at all' ELSE concat("
    " '<?xml version=\"1.0\" encoding=\"UTF-8\"?>', chr(10),"
    " '<urlset>',"
    " '<url><loc>https://', source, '.example.org/p1-',"
    " CAST(" + _SRC_N + " AS STRING), '</loc><lastmod>2024-0',"
    " CAST(" + _SRC_N + " % 9 + 1 AS STRING), '-01</lastmod></url>',"
    " '<url><changefreq>daily</changefreq><loc> https://', source,"
    " '.example.org/p2?a=1&amp;b=', CAST(" + _SRC_N + " AS STRING),"
    " ' </loc></url>',"
    " CASE WHEN " + _SRC_N + " % 2 = 0 THEN"
    " concat('<url><loc>https://', source,"
    " '.example.org/x/&lt;y&gt;</loc></url>') ELSE '' END,"
    " '</urlset>',"
    " CASE WHEN " + _SRC_N + " % 3 = 0 THEN"
    " concat('<sitemapindex><sitemap><loc>https://', source,"
    " '.example.org/sm-a.xml</loc><lastmod>2023-12-31</lastmod>"
    "</sitemap></sitemapindex>') ELSE '' END) END"
)


def _sitemap_urls_sql() -> str:
    """DuckDB twin of operators.robots.sitemap_urls: per-container-kind
    element extraction (the element FIRST so loc/lastmod stay paired),
    loc/lastmod regexes, then the predefined-entity decode chain in
    the module's order (&amp; last)."""
    xml = _duck(_SITEMAP_XML_EXPR)
    arms = []
    for kind, container in (("url", "url"), ("sitemap", "sitemap")):
        elem = f"(?is)<{container}>(.*?)</{container}>"
        arms.append(f"""  SELECT domain, '{kind}' AS kind,
         regexp_extract(e, '(?is)<loc>\\s*(.*?)\\s*</loc>', 1) AS url,
         nullif(regexp_extract(e,
             '(?is)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '') AS lastmod
  FROM (SELECT domain, unnest(regexp_extract_all(xml, '{elem}', 1)) AS e
        FROM sm)""")
    union = "\nUNION ALL\n".join(arms)
    dec = "url"
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&apos;", "''"), ("&amp;", "&")):
        dec = f"replace({dec}, '{ent}', '{rep}')"
    return f"""
WITH sm AS (
  SELECT {_duck(_ROBOTS_DOMAIN_EXPR)} AS domain, {xml} AS xml
  FROM (SELECT DISTINCT source FROM documents)
), ex AS (
{union}
)
SELECT domain, kind, {dec} AS url, lastmod
FROM ex WHERE url <> ''
"""


# -- meta_refresh ------------------------------------------------------

#: per-doc HTML with a meta-refresh variant matrix: double-quoted
#: zero-delay root-relative, upper-case single-quoted with spaced
#: ``URL =``, bare http-equiv with an inner-quoted absolute target,
#: and a URL-LESS reload timer (must emit nothing) — plus a decoy
#: viewport meta and the document text
_META_REFRESH_SYNTH_EXPR = (
    "concat("
    " CASE WHEN coalesce(doc_id, 0) % 5 = 0 THEN"
    " concat('<base href=\"https://mb', CAST(coalesce(doc_id, 0) % 3"
    " AS STRING), '.example.org/r/\">') ELSE '' END,"
    " CASE WHEN coalesce(doc_id, 0) % 4 = 0 THEN"
    " concat('<meta http-equiv=\"refresh\" content=\"0; url=/moved-',"
    " CAST(coalesce(doc_id, 0) % 7 AS STRING), '\">')"
    " WHEN coalesce(doc_id, 0) % 4 = 1 THEN"
    " concat('<META HTTP-EQUIV=''REFRESH'' CONTENT=''5 ; URL = next-',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '.html''>')"
    " WHEN coalesce(doc_id, 0) % 4 = 2 THEN"
    " concat('<meta http-equiv=refresh content=\"3;url=''https://r',"
    " CAST(coalesce(doc_id, 0) % 3 AS STRING), '.example.net/x''\">')"
    " ELSE '<meta http-equiv=\"refresh\" content=\"30\">' END,"
    " '<meta name=\"viewport\" content=\"width=device-width\">',"
    " '<p>', coalesce(text, ''), '</p>')"
)

_META_REFRESH_BASE_EXPR = (
    "concat('https://site', CAST(coalesce(doc_id, 0) % 7 AS STRING),"
    " '.example.org/a/', CAST(coalesce(doc_id, 0) AS STRING),"
    " '/page.html')"
)


def _effective_base_cte(html: str, page: str) -> str:
    """The ``nb`` CTE body shared by every extractor twin (review r14):
    the document's first <base href> (unquoted, resolved against the
    page URI) replaces the page URI as the resolution base — the
    DuckDB mirror of operators.markup._effective_base_select."""
    from tools.oracles.text import _resolve_url_sql
    from python_ctd_spark.operators.markup import BASE_HREF_PATTERN

    def unq(v):
        return (f"regexp_replace(regexp_replace({v},"
                " '(?s)^\"(.*)\"$', '\\1'), '(?s)^''(.*)''$', '\\1')")

    base_pat = BASE_HREF_PATTERN.replace("'", "''")
    bh = unq(f"regexp_extract(html, '{base_pat}', 1)")
    base_resolve = _resolve_url_sql("bh", "base")
    return f"""
  SELECT doc_id, html,
         CASE WHEN bh <> '' THEN {base_resolve} ELSE base END AS base
  FROM (SELECT doc_id, html, {page} AS base, {bh} AS bh
        FROM (SELECT doc_id, {html} AS html FROM documents))"""


def _meta_refresh_sql() -> str:
    """DuckDB twin of operators.markup.extract_meta_refresh: one
    meta-tag scan, per-tag refresh test + content extraction +
    delay/url split on the matched strings, the shared resolve twin,
    the shared domain key — patterns imported from the package."""
    from tools.oracles.text import _resolve_url_sql
    from python_ctd_spark.operators.markup import (
        DOMAIN_PATTERN,
        META_CONTENT_PATTERN,
        META_REFRESH_CONTENT_PATTERN,
        META_REFRESH_TEST_PATTERN,
        META_TAG_PATTERN,
    )

    def unq(v):
        return (f"regexp_replace(regexp_replace({v},"
                " '(?s)^\"(.*)\"$', '\\1'), '(?s)^''(.*)''$', '\\1')")

    tag_pat = META_TAG_PATTERN.replace("'", "''")
    test_pat = META_REFRESH_TEST_PATTERN.replace("'", "''")
    content_pat = META_CONTENT_PATTERN.replace("'", "''")
    split_pat = META_REFRESH_CONTENT_PATTERN.replace("'", "''")
    dom = DOMAIN_PATTERN.replace("'", "''")
    html = _duck(_META_REFRESH_SYNTH_EXPR)
    base = _duck(_META_REFRESH_BASE_EXPR)
    resolve = _resolve_url_sql("url", "base")  # base = the EFFECTIVE base
    return f"""
WITH n AS ({_effective_base_cte(html, base)}
), m AS (
  SELECT doc_id, base,
         unnest(regexp_extract_all(html, '{tag_pat}', 0)) AS tag
  FROM n
), r AS (
  SELECT doc_id, base,
         {unq(f"regexp_extract(tag, '{content_pat}', 1)")} AS content
  FROM m WHERE regexp_matches(tag, '{test_pat}')
), p AS (
  SELECT doc_id, base,
         CAST(regexp_extract(content, '{split_pat}', 1) AS DOUBLE)
           AS delay_s,
         {unq(f"trim(regexp_extract(content, '{split_pat}', 2))")} AS url
  FROM r
), res AS (
  SELECT doc_id, delay_s, url, {resolve} AS abs_url
  FROM p WHERE url <> ''
)
SELECT doc_id, delay_s, url, abs_url,
       regexp_replace(lower(regexp_extract(abs_url, '{dom}', 1)),
                      '\\.$', '') AS domain
FROM res
"""


def robots_fixture_frames(docs):
    """Shared Spark-side fixture construction for the ``robots_filter``
    registered row AND ``bench_scale robots`` (review r14: the two
    previously duplicated these ~25 lines and could drift — the scale
    evidence must measure the exact plan the registry audits): returns
    ``(rules, links)`` — robots.txt payloads parsed per distinct
    domain, and six links per document staged through one posexplode."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.robots import robots_rules

    robots = docs.select("source").distinct().select(
        F.expr(_ROBOTS_DOMAIN_EXPR).alias("domain"),
        F.expr(_ROBOTS_TXT_EXPR).alias("text"),
    )
    rules = robots_rules(robots, text_col="text", domain_col="domain")
    links = docs.select(
        "doc_id",
        F.expr(_ROBOTS_DOMAIN_EXPR).alias("domain"),
        F.posexplode(
            F.array(*[F.expr(e) for e in _ROBOTS_LINK_EXPRS])
        ).alias("__pos", "abs_url"),
    ).select(
        "doc_id",
        (F.col("__pos") + 1).cast("int").alias("link_no"),
        "domain",
        "abs_url",
    )
    return rules, links


# -- link_rels ---------------------------------------------------------

#: per-doc HTML with a typed-link-relation matrix: canonical
#: (quoting/case/attr-order variants), rel-after-href, a multi-token
#: rel (matches via its alternate token), next/prev pagination on
#: alternating docs, and decoys (icon, rel-less, href-less) that must
#: not extract
_LINK_RELS_SYNTH_EXPR = (
    "concat("
    " CASE WHEN coalesce(doc_id, 0) % 5 = 0 THEN"
    " concat('<base href=''/lib', CAST(coalesce(doc_id, 0) % 4"
    " AS STRING), '/''>') ELSE '' END,"
    " '<link rel=\"canonical\" href=\"/canon-',"
    " CAST(coalesce(doc_id, 0) % 9 AS STRING), '\"/>',"
    " CASE WHEN coalesce(doc_id, 0) % 2 = 0 THEN"
    " concat('<link href=''/n-', CAST(coalesce(doc_id, 0) % 5 AS STRING),"
    " ''' rel=NEXT>') ELSE"
    " concat('<link rel=\"prev\" href=p-',"
    " CAST(coalesce(doc_id, 0) % 5 AS STRING), '>') END,"
    " CASE WHEN coalesce(doc_id, 0) % 3 = 0 THEN"
    " concat('<link rel=''stylesheet alternate'' href=\"alt-',"
    " CAST(coalesce(doc_id, 0) % 4 AS STRING), '.css\">') ELSE '' END,"
    " '<link rel=\"icon\" href=\"/favicon.ico\">',"
    " '<link rel=\"search\">',"
    " '<p>', coalesce(text, ''), '</p>')"
)

_LINK_RELS_BASE_EXPR = (
    "concat('https://site', CAST(coalesce(doc_id, 0) % 7 AS STRING),"
    " '.example.org/s/', CAST(coalesce(doc_id, 0) AS STRING),"
    " '/index.html')"
)

#: the rel filter the registered row uses (the extract_link_rels
#: default, spelled out so the oracle shares it)
LINK_RELS_WANTED = ("canonical", "alternate", "amphtml", "prev", "next")


def _link_rels_sql() -> str:
    """DuckDB twin of operators.markup.extract_link_rels: one link-tag
    scan, per-tag rel/href extraction (patterns imported from the
    package), token-overlap rel filtering (list_has_any over the
    WS_PATTERN split — Spark's arrays_overlap twin), the shared
    resolve and domain key."""
    from tools.oracles.text import _resolve_url_sql
    from python_ctd_spark.operators.markup import (
        DOMAIN_PATTERN,
        LINK_HREF_PATTERN,
        LINK_REL_PATTERN,
        LINK_TAG_PATTERN,
        WS_PATTERN,
    )

    def unq(v):
        return (f"regexp_replace(regexp_replace({v},"
                " '(?s)^\"(.*)\"$', '\\1'), '(?s)^''(.*)''$', '\\1')")

    tag_pat = LINK_TAG_PATTERN.replace("'", "''")
    rel_pat = LINK_REL_PATTERN.replace("'", "''")
    href_pat = LINK_HREF_PATTERN.replace("'", "''")
    dom = DOMAIN_PATTERN.replace("'", "''")
    want = ", ".join(f"'{r}'" for r in LINK_RELS_WANTED)
    html = _duck(_LINK_RELS_SYNTH_EXPR)
    base = _duck(_LINK_RELS_BASE_EXPR)
    resolve = _resolve_url_sql("url", "base")
    return f"""
WITH n AS ({_effective_base_cte(html, base)}
), m AS (
  SELECT doc_id, base,
         unnest(regexp_extract_all(html, '{tag_pat}', 0)) AS tag
  FROM n
), p AS (
  SELECT doc_id, base,
         lower({unq(f"regexp_extract(tag, '{rel_pat}', 1)")}) AS rel,
         {unq(f"regexp_extract(tag, '{href_pat}', 1)")} AS url
  FROM m
), f AS (
  SELECT doc_id, base, rel, url FROM p
  WHERE url <> ''
    AND list_has_any(regexp_split_to_array(rel, '{WS_PATTERN}'),
                     [{want}])
), res AS (
  SELECT doc_id, rel, url, {resolve} AS abs_url FROM f
)
SELECT doc_id, rel, url, abs_url,
       regexp_replace(lower(regexp_extract(abs_url, '{dom}', 1)),
                      '\\.$', '') AS domain
FROM res
"""


# -- frontier_schedule -------------------------------------------------

def _frontier_schedule_sql() -> str:
    """DuckDB twin of operators.robots.frontier_schedule over the
    shared robots fixture: the SAME parse/scope CTE prefix as
    _robots_filter_sql (_robots_scoped_ctes) reduced to the
    Crawl-delay directive (MAX of survivors per domain), then a
    domain-partitioned ROW_NUMBER over the deterministic
    (abs_url, doc_id, link_no) queue order and the (rank-1) x delay
    offset; delay-less domains take the default."""
    prefix, link_arms = _robots_scoped_ctes()
    return f"""
{prefix},
delays AS (
  SELECT domain, MAX(CAST(value AS DOUBLE)) AS delay
  FROM maxt
  WHERE tier = max_tier AND directive = 'crawl-delay'
    AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$')
  GROUP BY domain
),
links AS (
{link_arms}
),
ranked AS (
  SELECT l.doc_id, l.link_no, l.domain, l.abs_url,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY l.domain
           ORDER BY l.abs_url, l.doc_id, l.link_no) AS INT) AS fetch_rank,
         d.delay
  FROM links l LEFT JOIN delays d ON l.domain = d.domain
)
SELECT doc_id, link_no, domain, abs_url, fetch_rank,
       CAST(fetch_rank - 1 AS DOUBLE) * coalesce(delay, 1.0)
         AS fetch_offset_s
FROM ranked
"""
