"""Markup stripping: HTML/XML -> plain text, the extraction stage that
sits in front of every web-crawl training pipeline (the C4/CCNet step
before any quality or dedup operator sees the text).

One fixed, ordered regex chain — block elements whose CONTENT must go
(script/style), comments, then every remaining tag, then a literal
entity-decode pass, then whitespace collapse.  All patterns are written
in the common subset of Java regex (Spark) and RE2 (the DuckDB oracle):
inline ``(?is)`` flags and lazy ``.*?`` only — no backreferences, no
lookaround — so the oracle can run the IDENTICAL chain and the two can
never drift (it imports these tables).

Everything is native ``regexp_count``/``regexp_replace`` column
expressions: map-side at any corpus size, no Python workers, no
shuffle; the chain rides whole-stage codegen like the PII scrub
(:func:`.text.redact_pii`), whose chain-order counting discipline this
module copies — each count is taken on the text as rewritten by the
preceding steps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (name, pattern) — ordered; content-bearing blocks first so their
#: inner text never leaks into the tag-stripped output.  ``<[!/]?...``
#: catches open/close tags plus <!DOCTYPE ...>.
MARKUP_PATTERNS: list[tuple[str, str]] = [
    ("script", r"(?is)<script[^>]*>.*?</script\s*>"),
    ("style", r"(?is)<style[^>]*>.*?</style\s*>"),
    ("comment", r"(?s)<!--.*?-->"),
    ("tag", r"<[!/]?[A-Za-z][^>]*>"),
]

#: literal entity -> replacement, ``&amp;`` LAST (standard unescape
#: order: double-escaped entities like ``&amp;lt;`` decode one level to
#: the literal text ``&lt;``, never two).
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


#: whitespace, spelled out ONCE, engine-independently (ADVICE r11):
#: Java's ``\s`` includes vertical tab ``\x0B`` while RE2's does not,
#: so a bare ``\s`` in a pattern shared with the DuckDB oracle would
#: let ``\x0B`` text drift between the two chains.  The explicit class
#: (Java's set) is identical in both engines.
WS_CHARS = r" \t\n\x0B\f\r"
WS_PATTERN = f"[{WS_CHARS}]+"

#: the URL-bearing (tag, attribute) pairs :func:`extract_links`
#: extracts — anchors plus the ASSET tags a crawl pipeline filters on
#: (tracker pixels live in ``img``, not anchors; stylesheet/script
#: hosts are the third-party-dependency graph).
LINK_TAG_ATTRS: tuple[tuple[str, str], ...] = (
    ("a", "href"), ("img", "src"), ("link", "href"), ("script", "src"),
)

_LINK_TAG_ALT = "|".join(t for t, _ in LINK_TAG_ATTRS)

#: URL-attribute normalizers applied BEFORE extraction, in order:
#: single-quoted and unquoted ``href``/``src`` values on any link tag
#: are rewritten to the double-quoted form (ADVICE r11 —
#: ``href='...'`` / ``src=url`` must not dodge the blocklist).
#: Replacement template is ``$1"$2"`` in Spark, ``\1"\2"`` in the
#: DuckDB oracle (engine replacement syntax differs; the PATTERNS are
#: shared).  The unquoted rule runs second and requires a non-quote
#: first char, so it can never re-wrap an already-quoted (or
#: just-rewritten) value.
#: the char that must PRECEDE ``href``/``src`` for it to be the real
#: attribute: whitespace or a closing quote — without the boundary,
#: ``data-src="lazy"`` matches as ``src=`` (suffix of another
#: attribute name) and, the pattern being greedy, REPLACES the real
#: ``src`` — the exact blocklist-dodge lazy-load HTML would exploit.
#: ``<img src=`` still matches: the tag's own trailing whitespace is
#: the boundary when the attribute comes first.
_ATTR_BOUNDARY = rf"[{WS_CHARS}\"']"

HREF_NORMALIZE_PATTERNS: list[str] = [
    rf"(?is)(<(?:{_LINK_TAG_ALT})[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?"
    rf"(?:href|src)=)'([^']*)'",
    rf"(?is)(<(?:{_LINK_TAG_ALT})[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?"
    rf"(?:href|src)=)([^\"'{WS_CHARS}>]+)",
]

#: anchor pattern in the Java-regex/RE2 common subset: group 1 = the
#: href URL, group 2 = the anchor text (lazy, single-level — nested
#: anchors are invalid HTML and out of scope).  Double-quote-only by
#: construction: extraction always runs on href-normalized text.
ANCHOR_PATTERN = (
    rf'(?is)<a[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?href="([^"]*)"'
    rf'[^>]*>(.*?)</a[{WS_CHARS}]*>'
)

#: tag -> URL-extraction pattern (group 1 = the URL).  ``a`` also
#: carries the anchor text as group 2; the asset tags have no text.
#: Every pattern requires the :data:`_ATTR_BOUNDARY` before the
#: attribute name (see its note).
TAG_URL_PATTERNS: dict[str, str] = {
    "a": ANCHOR_PATTERN,
    "img": rf'(?is)<img[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?'
           rf'src="([^"]*)"[^>]*>',
    "link": rf'(?is)<link[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?'
            rf'href="([^"]*)"[^>]*>',
    "script": rf'(?is)<script[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?'
              rf'src="([^"]*)"[^>]*>',
}

#: RFC-3986-lite building blocks for :func:`resolve_url`, all in the
#: Java-regex/RE2 common subset so the DuckDB oracle runs the SAME
#: patterns.  SCHEME matches any absolute reference (``https:``,
#: ``mailto:`` — a colon in the first segment means scheme per the
#: RFC); ORIGIN captures ``scheme://authority``; BASE_DIR captures the
#: base path up to and including its last slash (empty when the base
#: has no path); BASE_PATH captures the full base path (for
#: query-only references).
URL_SCHEME_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*:"
URL_ORIGIN_PATTERN = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
URL_BASE_DIR_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*/)?"
URL_BASE_PATH_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

#: dot-segment collapse depth: ``/./`` and ``/seg/../`` are rewritten
#: this many passes (each pass resolves one nesting level of ``..`` —
#: real pages rarely exceed two; the oracle runs the identical passes
#: so deeper chains, though left partially collapsed, can never drift
#: between the engines).  Unresolvable leading ``/../`` is left in
#: place (a browser would clamp it to the root).
DOT_SEGMENT_PASSES = 4

#: scheme://host extraction from a URL: group 1 = the registrable host
#: with userinfo (``user@``) and port (``:443``) stripped; combined
#: with lowercasing at the use site so trivially-varied URLs
#: (HTTPS://SPAM..., spam...:443, u@spam...) cannot dodge a blocklist.
DOMAIN_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

#: demo blocklist — swap for the real denylist table at deploy time;
#: kept tiny and literal so map-side IN-list evaluation (and the oracle)
#: needs no join.
BLOCKED_DOMAINS: tuple[str, ...] = ("spam.example.net",)


def normalized_domain(url: Column) -> Column:
    """THE domain key: the URL's registrable host lowercased, with
    userinfo/port and the absolute-FQDN trailing dot stripped —
    HTTPS://HOST, host:443, user@host, and host. all resolve to one
    value.  Shared by :func:`extract_links`, blocklist filters, and the
    WARC documents projection (``io.warc.warc_responses_to_documents``)
    so link analytics and corpus sources live in one key space."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(url, DOMAIN_PATTERN, 1)), r"\.$", ""
    )


#: query parameters that identify a CLICK, not a RESOURCE — stripped
#: by :func:`canonical_url` (the usual analytics/click-id families;
#: extend per deployment)
TRACKING_PARAM_PATTERN = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|dclid|mc_[ce]id|igshid|ref_src)(=|$)"
)


def canonical_url(url: Column) -> Column:
    """THE URL dedup key: scheme+host lowercase, userinfo and default
    ports (:80 http / :443 https) and the fragment stripped, absolute-
    FQDN trailing dot removed, tracking parameters
    (:data:`TRACKING_PARAM_PATTERN`) dropped, remaining query
    parameters SORTED (byte order) so parameter-order shuffles
    collide; an emptied query loses its ``?``.  Path case and
    non-default ports are preserved — they are resource-identifying.
    Non-hierarchical URLs (no ``://``) pass through unchanged.

    All native column expressions (regexp + higher-order array ops):
    map-side at any scale, usable directly as an exact-dedup
    ``groupBy`` key or a MinHash input on link corpora."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1
    ))
    # absolute-FQDN trailing dot: both bare ("host.") and before a
    # port ("host.:8080") — spelled as two plain rules (no lookahead,
    # keeping the pattern RE2-portable like the rest of this module)
    hostport = F.regexp_replace(hostport, r"\.$", "")
    hostport = F.regexp_replace(hostport, r"\.:", ":")
    host = (
        F.when((scheme == "http") & hostport.endswith(":80"),
               F.substring(hostport, F.lit(1), F.length(hostport) - 3))
        .when((scheme == "https") & hostport.endswith(":443"),
              F.substring(hostport, F.lit(1), F.length(hostport) - 4))
        .otherwise(hostport)
    )
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.coalesce(F.nullif(path, F.lit("")), F.lit("/"))
    # the query is extracted from the DEFRAGMENTED url: an unanchored
    # \? would otherwise pull '?tab=1' out of an SPA fragment like
    # '#!/route?tab=1' and leak fragment content into the dedup key
    query = F.regexp_extract(
        F.regexp_replace(url, "#.*", ""), r"\?(.*)", 1
    )
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    q = F.array_join(F.array_sort(kept), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(url)


def resolve_url(url: Column, base: Column) -> Column:
    """Resolve a link reference against its page URI (RFC 3986 §5, the
    subset real crawls need) — entirely native column expressions, so
    the resolution is map-side and the DuckDB oracle can run the SAME
    patterns (:data:`URL_SCHEME_PATTERN` family):

    - absolute references (any ``scheme:`` prefix) pass through;
    - ``//host/...`` takes the base's scheme;
    - ``/path`` takes the base's origin;
    - ``#frag`` replaces the base's fragment; ``?query`` replaces its
      query (path preserved);
    - anything else is path-relative: origin + base directory + ref;
    - ``/./`` and ``/seg/../`` collapse (:data:`DOT_SEGMENT_PASSES`
      bounded passes over the path — never the authority, which is
      split off first so ``host/../`` can never eat the hostname).

    ``base`` must be an absolute URI (a crawl's WARC-Target-URI always
    is).  Without resolution, every relative tracker pixel or
    same-site link is invisible to domain analytics and the blocklist
    — the r12 gap this closes."""
    return _resolve_with_parts(url, _base_parts(base))


def _base_parts(base: Column) -> tuple[Column, ...]:
    """The base-URI derivations resolution needs — factored out so
    :func:`extract_links` can compute them ONCE PER DOCUMENT (before
    the link explode) instead of once per link: at ~7 links/doc that
    hoist removes ~85% of the base-side regex work from the hot
    per-link rows."""
    return (
        F.regexp_replace(base, "#.*", ""),                      # nofrag
        F.regexp_extract(base, URL_ORIGIN_PATTERN, 1),          # origin
        F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1),
        F.regexp_extract(base, URL_BASE_DIR_PATTERN, 1),
        F.regexp_extract(base, URL_BASE_PATH_PATTERN, 1),
    )


def _resolve_with_parts(url: Column, parts: tuple[Column, ...]) -> Column:
    base_nofrag, origin, scheme, base_dir, base_path = parts
    resolved = (
        F.when(url == "", base_nofrag)
        .when(url.rlike(URL_SCHEME_PATTERN), url)
        .when(url.startswith("//"), F.concat(scheme, F.lit(":"), url))
        .when(url.startswith("/"), F.concat(origin, url))
        .when(url.startswith("#"), F.concat(base_nofrag, url))
        .when(url.startswith("?"),
              F.concat(origin,
                       F.coalesce(F.nullif(base_path, F.lit("")),
                                  F.lit("/")),
                       url))
        .otherwise(
            F.concat(origin,
                     F.coalesce(F.nullif(base_dir, F.lit("")), F.lit("/")),
                     url))
    )
    # dot-segment collapse on the PATH only (RFC 3986 §5.2.4): origin
    # is split off first so ``host/../`` can never eat the hostname,
    # and the query/fragment tail is split off so ``?next=/a/../b``
    # keeps its value verbatim.  The whole collapse is gated on a cheap
    # substring test — for the overwhelming majority of links (no "/."
    # anywhere) the ~10 per-link regex passes are skipped entirely, and
    # collapse is a no-op on such URLs, so the gate is value-invisible
    # (the oracle runs the unconditional form and must agree).
    rest = F.regexp_replace(resolved, URL_ORIGIN_PATTERN, "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    tail = F.regexp_replace(rest, r"^[^?#]*", "")
    collapsed = path
    for _ in range(DOT_SEGMENT_PASSES):
        collapsed = F.regexp_replace(collapsed, r"/\./", "/")
        collapsed = F.regexp_replace(collapsed, r"/[^/]+/\.\./", "/")
    return F.when(
        ~resolved.contains("/."), resolved
    ).otherwise(
        F.concat(F.regexp_extract(resolved, URL_ORIGIN_PATTERN, 1),
                 collapsed, tail)
    )


def extract_links(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    blocklist: DataFrame | None = None,
    base_col: str | None = None,
    tags: tuple[str, ...] = tuple(t for t, _ in LINK_TAG_ATTRS),
) -> DataFrame:
    """Extract every URL-bearing tag from ``text_col``: one output row
    per link — ``(id_col, tag, link_pos, url, abs_url, domain, anchor,
    is_blocked)`` — the crawl-graph stage in front of URL/domain
    filtering and outlink-based quality signals.  ``tags`` selects
    which of :data:`LINK_TAG_ATTRS` to extract: ``<a href>`` plus the
    asset tags (``img src`` / ``link href`` / ``script src``) — the
    graph a crawl pipeline actually filters on, since tracker pixels
    live in ``img``, not anchors.

    href/src quoting is NORMALIZED before extraction
    (:data:`HREF_NORMALIZE_PATTERNS`): single-quoted and unquoted
    values rewrite to the double-quoted form, so a trivial quoting
    variation cannot dodge the blocklist.  ``link_pos`` is the link's
    1-based position within its document PER TAG (document order,
    deterministic).  ``abs_url`` is the reference resolved against
    ``base_col`` (the page URI) via :func:`resolve_url` when given —
    without resolution a relative tracker pixel is invisible to the
    blocklist — and equals ``url`` when ``base_col`` is None.
    ``domain`` is the NORMALIZED host OF THE RESOLVED URL: lowercased,
    userinfo and port stripped (so HTTPS://HOST, host:443, and
    user@host all resolve to one key); ``anchor`` is the anchor text
    (``a`` only, NULL for asset tags); ``is_blocked`` marks hosts in
    :data:`BLOCKED_DOMAINS` (a literal IN-list — no join) OR, when
    ``blocklist`` is given, in that one-column (``domain``) DataFrame
    — the production shape, where the denylist is a TABLE: a
    broadcast LEFT join on the normalized domain (millions of links x
    thousands of blocked hosts never shuffles the links side).
    Documents with no links emit no rows (explode semantics;
    LEFT-join back to the corpus for a per-doc outlink count
    including zeros).

    All native and SINGLE-PASS: per tag, two ``regexp_extract_all``
    passes build an indexed struct array (``transform`` with the index
    lambda), the per-tag arrays concatenate, and ONE ``explode`` emits
    every link — map-side, no shuffle, no union of re-scans, whole-
    stage codegen (plus the broadcast join when a blocklist table is
    given).
    """
    html = F.col(text_col)
    for pat in HREF_NORMALIZE_PATTERNS:
        html = F.regexp_replace(html, pat, '$1"$2"')
    null_s = F.lit(None).cast("string")
    parts = []
    for tag in tags:
        pat = F.lit(TAG_URL_PATTERNS[tag])
        urls = F.regexp_extract_all(html, pat, 1)
        anchors = (F.regexp_extract_all(html, pat, 2) if tag == "a"
                   else F.transform(urls, lambda _u: null_s))
        parts.append(F.zip_with(
            urls, anchors,
            lambda u, a: F.struct(u.alias("u"), a.alias("a")),
        ))
    links = None
    for tag, arr in zip(tags, parts):
        indexed = F.transform(
            arr,
            lambda x, i: F.struct(
                F.lit(tag).alias("tag"),
                (i + 1).cast("int").alias("link_pos"),
                x["u"].alias("u"),
                x["a"].alias("a"),
            ),
        )
        links = indexed if links is None else F.concat(links, indexed)
    # base-URI derivations are computed BEFORE the explode — once per
    # document, not once per link (see _base_parts)
    part_cols = (
        _base_parts(F.col(base_col)) if base_col
        else (null_s, null_s, null_s, null_s, null_s)
    )
    ex = df.select(
        id_col,
        *(p.alias(f"__bp{i}") for i, p in enumerate(part_cols)),
        F.explode(links).alias("l"),
    ).select(
        id_col,
        F.col("l.tag").alias("tag"),
        F.col("l.link_pos").alias("link_pos"),
        F.col("l.u").alias("url"),
        (_resolve_with_parts(
            F.col("l.u"),
            tuple(F.col(f"__bp{i}") for i in range(5)),
        ) if base_col else F.col("l.u")).alias("abs_url"),
        F.trim(F.regexp_replace(F.col("l.a"), WS_PATTERN, " ")).alias("anchor"),
    )
    domain = normalized_domain(F.col("abs_url"))
    out = ex.select(
        id_col,
        "tag",
        "link_pos",
        "url",
        "abs_url",
        domain.alias("domain"),
        "anchor",
        domain.isin(*BLOCKED_DOMAINS).alias("is_blocked"),
    )
    if blocklist is not None:
        # normalize the TABLE side with the same key function as the
        # link side — an entry like 'Tracker.Example.com' or
        # 'spam.example.net.' must still match, or blocked links flow
        # through silently
        hit = F.broadcast(
            blocklist.select(
                F.regexp_replace(
                    F.lower(F.trim(F.col("domain"))), r"\.$", ""
                ).alias("__blocked_domain")
            ).distinct()
        )
        out = (
            out.join(hit, out["domain"] == hit["__blocked_domain"], "left")
            .withColumn(
                "is_blocked",
                F.col("is_blocked") | F.col("__blocked_domain").isNotNull(),
            )
            .drop("__blocked_domain")
        )
    return out


def strip_markup(
    df: DataFrame, text_col: str, out_col: str = "text_plain"
) -> DataFrame:
    """Strip HTML markup from ``text_col`` into ``out_col`` with
    per-step audit counts (``n_script``, ``n_style``, ``n_comment``,
    ``n_tag``, ``n_entities``).

    A cleaning operator must never delete rows: NULL text yields NULL
    output and NULL counts (the regex expressions propagate NULL), and
    every input row survives — filter on the audit columns explicitly
    if pathological docs should go.

    Apply ONCE per document: like every HTML unescape, the chain is
    deliberately not idempotent — a first pass decodes ``&lt;b&gt;`` to
    the literal text ``<b>``, which a second pass would then strip as a
    tag (and ``&amp;lt;`` would double-decode).  Run it at extraction
    time, before :func:`..text.normalize_text`, and never re-run it on
    its own output.
    """
    cur: Column = F.col(text_col)
    out = []
    for name, pat in MARKUP_PATTERNS:
        out.append(F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, " ")
    ent: Column | None = None
    for lit, _rep in HTML_ENTITIES:
        c = F.regexp_count(cur, F.lit(lit))
        ent = c if ent is None else ent + c
    out.append(ent.cast("bigint").alias("n_entities"))
    for lit, rep in HTML_ENTITIES:
        cur = F.regexp_replace(cur, lit, rep)
    cur = F.trim(F.regexp_replace(cur, WS_PATTERN, " "))
    return df.select("*", *out, cur.alias(out_col))
