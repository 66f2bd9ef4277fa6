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

#: the URL-bearing (tag-label, attribute) pairs :func:`extract_links`
#: extracts — anchors plus the ASSET tags a crawl pipeline filters on
#: (tracker pixels live in ``img``, not anchors; stylesheet/script
#: hosts are the third-party-dependency graph) plus the responsive-
#: image ``srcset`` attributes (VERDICT r13 item 3 — CDN and tracker
#: URLs ride ``img srcset`` / ``<source srcset>`` invisibly to an
#: src-only extractor).  The label is the output ``tag`` column value;
#: ``link_pos`` numbers per label, so ``img`` (src) and ``img_srcset``
#: keep independent document-order positions.
LINK_TAG_ATTRS: tuple[tuple[str, str], ...] = (
    ("a", "href"), ("img", "src"), ("link", "href"), ("script", "src"),
    ("img_srcset", "srcset"), ("source_srcset", "srcset"),
)

#: the char that must PRECEDE the attribute name for it to be the real
#: attribute: whitespace or a closing quote — without the boundary,
#: ``data-src="lazy"`` matches as ``src=`` (suffix of another
#: attribute name) and, the pattern being greedy, REPLACES the real
#: ``src`` — the exact blocklist-dodge lazy-load HTML would exploit.
#: ``<img src=`` still matches: the tag's own trailing whitespace is
#: the boundary when the attribute comes first.
_ATTR_BOUNDARY = rf"[{WS_CHARS}\"']"

#: one capture group = the attribute value WITH its quoting: double-
#: quoted, single-quoted, or bare (VERDICT r13 item 8 — quoting used
#: to be normalized by rewriting the WHOLE document up to 3x before
#: extraction; folding the quote alternation into the per-tag patterns
#: deletes those full-document passes, and :func:`_unquote_attr`
#: strips the quotes per extracted value instead — per-link work on
#: tiny strings, not per-document regex).  Alternation order means a
#: value that opens a quote must close it — a dangling quote extracts
#: nothing, exactly like the old normalize-then-extract chain.
ATTR_VALUE_PATTERN = rf"(\"[^\"]*\"|'[^']*'|[^\"'{WS_CHARS}>]+)"


def _attr_pattern(tag: str, attr: str, tail: str = "") -> str:
    return (
        rf"(?is)<{tag}[{WS_CHARS}](?:[^>]*{_ATTR_BOUNDARY})?"
        rf"{attr}={ATTR_VALUE_PATTERN}[^>]*>{tail}"
    )


#: anchor pattern in the Java-regex/RE2 common subset: group 1 = the
#: href value (quoted), group 2 = the anchor text (lazy, single-level
#: — nested anchors are invalid HTML and out of scope).
ANCHOR_PATTERN = _attr_pattern("a", "href", rf"(.*?)</a[{WS_CHARS}]*>")

#: tag label -> URL-extraction pattern (group 1 = the quoted value —
#: strip with :func:`_unquote_attr`).  ``a`` also carries the anchor
#: text as group 2; the asset tags have no text; the ``srcset``
#: entries yield a CANDIDATE LIST value that :func:`_srcset_urls`
#: splits.  Every pattern requires the :data:`_ATTR_BOUNDARY` before
#: the attribute name (see its note).
TAG_URL_PATTERNS: dict[str, str] = {
    "a": ANCHOR_PATTERN,
    "img": _attr_pattern("img", "src"),
    "link": _attr_pattern("link", "href"),
    "script": _attr_pattern("script", "src"),
    "img_srcset": _attr_pattern("img", "srcset"),
    "source_srcset": _attr_pattern("source", "srcset"),
}

#: tag labels whose extracted value is a srcset candidate list
SRCSET_TAGS: frozenset[str] = frozenset({"img_srcset", "source_srcset"})

#: the FIRST ``<base href>`` of a document (HTML spec: the first base
#: element wins) — its value, resolved against the retrieval URI,
#: becomes the base for every link in the page (RFC 3986 §5.1.1: a
#: base embedded in content takes priority over the retrieval URI;
#: VERDICT r13 item 2 — ignoring it resolved every relative link on a
#: ``<base>`` page to the wrong host/path).
BASE_HREF_PATTERN = _attr_pattern("base", "href")


def _unquote_attr(v: Column) -> Column:
    """Strip one level of symmetric quoting from an extracted
    attribute value (bare values pass through — the char class forbids
    quotes inside them).  ``(?s)`` so a quoted value spanning a
    newline still unwraps."""
    v = F.regexp_replace(v, '(?s)^"(.*)"$', "$1")
    return F.regexp_replace(v, "(?s)^'(.*)'$", "$1")


def _srcset_urls(val: Column) -> Column:
    """srcset candidate list -> array of URLs: comma-separated
    candidates, each ``URL [descriptor]`` — the leading non-whitespace
    token is the URL, descriptors drop, empty candidates (trailing
    commas) drop.  Data-URI commas are out of scope (the usual
    regex-parser approximation; such candidates require descriptors
    precisely because of this ambiguity)."""
    return F.filter(
        F.transform(
            F.split(val, ","),
            lambda c: F.regexp_extract(
                c, rf"^[{WS_CHARS}]*([^{WS_CHARS}]+)", 1
            ),
        ),
        lambda u: u != "",
    )

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

#: percent-encoding normalization building blocks (RFC 3986
#: §6.2.2.1-.2), shared with the DuckDB oracle twin: a split-on-``%``
#: piece that STARTS a valid escape, and the single-char class of
#: unreserved characters whose escapes decode (everything else keeps
#: its escape, hex uppercased)
PCT_HEX_PATTERN = r"^[0-9A-Fa-f]{2}"
PCT_UNRESERVED_PATTERN = r"^[A-Za-z0-9._~-]$"


def percent_normalize(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, fully native:
    escape hex digits uppercase (§6.2.2.1 — ``%2f`` == ``%2F``) and
    escapes of UNRESERVED characters decoded (§6.2.2.2 — ``%7Euser``
    == ``~user``); reserved escapes (``%2F``...) stay encoded, and an
    invalid ``%`` (not followed by two hex digits) passes through
    verbatim.  Without this, trivially re-encoded URLs split the
    frontier dedup key (VERDICT r13 item 4).

    Shape: split on ``%``, transform each piece (decode-or-uppercase
    its leading escape), re-join — one pass, no index-dependent
    lambda.  The ``\\x01`` sentinel makes piece 0 (the text before the
    first ``%``) self-identifying in BOTH engines: every piece gets a
    ``%`` re-prefixed, and the constant 2-char ``%\\x01`` head is
    sliced off at the end."""
    parts = F.split(F.concat(F.lit("\x01"), url), "%")

    def piece(p: Column) -> Column:
        hh = F.substring(p, 1, 2)
        ch = F.char(F.conv(hh, 16, 10).cast("int"))
        rest = F.substring(p, 3, F.length(p))
        return F.when(
            p.rlike(PCT_HEX_PATTERN),
            F.when(ch.rlike(PCT_UNRESERVED_PATTERN), F.concat(ch, rest))
            .otherwise(F.concat(F.lit("%"), F.upper(hh), rest)),
        ).otherwise(F.concat(F.lit("%"), p))

    joined = F.array_join(F.transform(parts, piece), "")
    return F.substring(joined, 3, F.length(joined))


def canonical_url(url: Column) -> Column:
    """THE URL dedup key: scheme+host lowercase, userinfo and default
    ports (:80 http / :443 https) and the fragment stripped, absolute-
    FQDN trailing dot removed, tracking parameters
    (:data:`TRACKING_PARAM_PATTERN`) dropped, remaining query
    parameters SORTED (byte order) so parameter-order shuffles
    collide; an emptied query loses its ``?``.  Percent-encoding
    normalizes FIRST (:func:`percent_normalize` — uppercase hex,
    unreserved escapes decoded, so ``%7Euser`` and ``~user`` merge and
    a ``%75tm_``-obfuscated tracking param is visible to the filter).
    Path case and non-default ports are preserved — they are
    resource-identifying.  Internationalized hostnames pass through
    LOWERCASED ONLY: Unicode and ``xn--`` punycode forms of one host
    stay distinct keys (full IDNA mapping is a documented gate — it
    needs the UTS-46 tables, not a column expression; pre-encode hosts
    upstream if the crawl mixes both forms).  Non-hierarchical URLs
    (no ``://``) pass through unchanged.

    All native column expressions (regexp + higher-order array ops):
    map-side at any scale, usable directly as an exact-dedup
    ``groupBy`` key or a MinHash input on link corpora."""
    raw = url
    url = percent_normalize(url)
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
    # the hierarchical gate tests the RAW input (review r14): gating on
    # the normalized form would let a scheme-obfuscated 'h%74tp://...'
    # slip into the canonical arm on this side only — the DuckDB twin
    # gates on raw, and RFC 3986 gives percent escapes no meaning in
    # the scheme, so such strings are not hierarchical URIs at all
    return F.when(raw.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), canon).otherwise(raw)


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


def _resolve_case(url: Column, parts: tuple[Column, ...]) -> Column:
    """The reference-type CASE of RFC 3986 §5.2.2 — merge without
    dot-segment collapse (see :func:`_collapse_dots`)."""
    base_nofrag, origin, scheme, base_dir, base_path = parts
    return (
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


def _collapse_dots(resolved: Column) -> Column:
    """Dot-segment collapse on the PATH only (RFC 3986 §5.2.4): origin
    is split off first so ``host/../`` can never eat the hostname,
    and the query/fragment tail is split off so ``?next=/a/../b``
    keeps its value verbatim.  The whole collapse is gated on a cheap
    substring test — for the overwhelming majority of links (no "/."
    anywhere) the ~12 per-link regex passes are skipped entirely, and
    collapse is a no-op on such URLs, so the gate is value-invisible
    (the oracle runs the unconditional form and must agree).

    ``resolved`` appears ~13x in the built expression tree (the nested
    collapse chain), so CALLERS ON A HOT PATH MUST PASS A PLAIN COLUMN
    REFERENCE, not a big expression — inlining the §5.2.2 CASE here
    blew the generated projection past the JVM 64KB method limit and
    dropped the stage to interpreted eval (measured in r14;
    :func:`extract_links` stages the two halves through named
    columns)."""
    rest = F.regexp_replace(resolved, URL_ORIGIN_PATTERN, "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    tail = F.regexp_replace(rest, r"^[^?#]*", "")
    collapsed = path
    for _ in range(DOT_SEGMENT_PASSES):
        collapsed = F.regexp_replace(collapsed, r"/\./", "/")
        collapsed = F.regexp_replace(collapsed, r"/[^/]+/\.\./", "/")
    # terminal dot segments (ADVICE r13): a reference ENDING in '..' or
    # '.' has no trailing slash for the loop rules to see — href='..'
    # against base '/w/5/index.html' left '/w/5/..' instead of
    # urljoin's '/w/'.  RFC 3986 §5.2.4 steps 2C-2D output a trailing
    # '/': one final pass each suffices, since the loop has already
    # reduced every inner segment
    collapsed = F.regexp_replace(collapsed, r"/[^/]+/\.\.$", "/")
    collapsed = F.regexp_replace(collapsed, r"/\.$", "/")
    return F.when(
        ~resolved.contains("/."), resolved
    ).otherwise(
        F.concat(F.regexp_extract(resolved, URL_ORIGIN_PATTERN, 1),
                 collapsed, tail)
    )


def _resolve_with_parts(url: Column, parts: tuple[Column, ...]) -> Column:
    return _collapse_dots(_resolve_case(url, parts))


def _effective_base_select(
    df: DataFrame, text_col: str, base_col: str, id_col: str
) -> DataFrame:
    """Project ``(id_col, text_col, __eff_base)`` — the document's
    RFC 3986 §5.1.1 effective base: the first ``<base href>`` (itself
    resolved against the page URI — it is routinely relative) when
    present, else the page URI.  Shared by :func:`extract_links`,
    :func:`extract_meta_refresh`, and :func:`extract_link_rels` so
    every extractor resolves against the SAME base (review r14: the
    rel/refresh extractors initially ignored ``<base>`` — the exact
    defect VERDICT r13 item 2 fixed for links).

    Staged through named columns: _collapse_dots repeats its input
    ~13x and the §5.2.2 CASE repeats ITS inputs, so inlining the whole
    derivation into one projection blew the generated method past the
    JVM 64KB limit and silently dropped the stage to interpreted eval
    (measured r14).  The base-href pass is gated on a cheap case-blind
    literal scan — value-invisible (no ``<base`` substring means the
    pattern cannot match; the oracle runs the unconditional form)."""
    html = F.col(text_col)
    src = df.select(
        id_col,
        F.col(text_col),
        F.col(base_col).alias("__page"),
        F.when(
            F.lower(html).contains("<base"),
            _unquote_attr(F.regexp_extract(html, BASE_HREF_PATTERN, 1)),
        ).otherwise(F.lit("")).alias("__bh"),
    )
    src = src.select(
        id_col, text_col, "__page",
        (F.col("__bh") != "").alias("__has_base"),
        _resolve_case(
            F.col("__bh"), _base_parts(F.col("__page"))
        ).alias("__bcase"),
    )
    return src.select(
        id_col, text_col, "__page", "__has_base",
        _collapse_dots(F.col("__bcase")).alias("__bres"),
    ).select(
        id_col,
        text_col,
        F.when(F.col("__has_base"), F.col("__bres"))
        .otherwise(F.col("__page")).alias("__eff_base"),
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
    live in ``img``, not anchors — plus the responsive-image
    ``srcset`` candidate lists (``img_srcset`` / ``source_srcset``
    rows: one row PER CANDIDATE URL, descriptors dropped).

    Quoting is handled IN the per-tag patterns
    (:data:`ATTR_VALUE_PATTERN` alternation — double, single, bare),
    so a trivial quoting variation cannot dodge the blocklist and no
    full-document normalize pass runs (VERDICT r13 item 8: the old
    rewrite-then-extract chain paid ~2 extra whole-document regex
    passes).  ``link_pos`` is the link's 1-based position within its
    document PER TAG (document order, deterministic).  ``abs_url`` is
    the reference resolved via :func:`resolve_url` when ``base_col``
    (the page URI) is given — without resolution a relative tracker
    pixel is invisible to the blocklist — and equals ``url`` when
    ``base_col`` is None.  The resolution base honors the document's
    FIRST ``<base href>`` when present (RFC 3986 §5.1.1: content-
    embedded base beats the retrieval URI; the base href itself, often
    relative, first resolves against the page URI), else it is the
    page URI.
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
    null_s = F.lit(None).cast("string")
    parts = []
    for tag in tags:
        pat = F.lit(TAG_URL_PATTERNS[tag])
        raw = F.regexp_extract_all(html, pat, 1)
        if tag in SRCSET_TAGS:
            # one candidate list per attribute -> flatten to URLs
            urls = F.flatten(
                F.transform(raw, lambda v: _srcset_urls(_unquote_attr(v)))
            )
        else:
            urls = F.transform(raw, _unquote_attr)
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
    # document, not once per link (see _base_parts).  The effective
    # base is the document's first <base href> (itself resolved
    # against the page URI — it is routinely relative) when present,
    # else the page URI; all still per-document work.  The effective
    # base gets its OWN projection: inlining its resolve chain into
    # each of the five part derivations blew the generated projection
    # method past the JVM 64KB limit and dropped the whole stage to
    # interpreted eval (measured — the fallback, not the regex work,
    # was the slowdown); behind a named column the parts stay small
    # and whole-stage codegen holds.
    if base_col:
        src = _effective_base_select(df, text_col, base_col, id_col)
        part_cols = _base_parts(F.col("__eff_base"))
    else:
        src = df
        part_cols = (null_s, null_s, null_s, null_s, null_s)
    ex = src.select(
        id_col,
        *(p.alias(f"__bp{i}") for i, p in enumerate(part_cols)),
        F.explode(links).alias("l"),
    ).select(
        id_col,
        F.col("l.tag").alias("tag"),
        F.col("l.link_pos").alias("link_pos"),
        F.col("l.u").alias("url"),
        *((F.col(f"__bp{i}") for i in range(5)) if base_col else ()),
        F.trim(F.regexp_replace(F.col("l.a"), WS_PATTERN, " ")).alias("anchor"),
    )
    # resolution runs in TWO staged projections (§5.2.2 CASE, then the
    # dot-segment collapse over the named result): _collapse_dots
    # repeats its input ~13x, and inlining the CASE chain there blew
    # the generated stage method past the JVM 64KB limit — interpreted
    # fallback cost more than every regex in the row (measured r14)
    if base_col:
        ex = ex.select(
            id_col, "tag", "link_pos", "url", "anchor",
            _resolve_case(
                F.col("url"), tuple(F.col(f"__bp{i}") for i in range(5))
            ).alias("__resolved"),
        ).select(
            id_col, "tag", "link_pos", "url", "anchor",
            _collapse_dots(F.col("__resolved")).alias("abs_url"),
        )
    else:
        ex = ex.withColumn("abs_url", F.col("url"))
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


#: all meta tags (group 0 per match); the refresh discriminator and
#: the content attribute are then matched PER TAG on the tiny matched
#: strings — one full-document scan total
META_TAG_PATTERN = rf"(?is)<meta[{WS_CHARS}][^>]*>"
META_REFRESH_TEST_PATTERN = rf"(?is){_ATTR_BOUNDARY}http-equiv=[\"']?refresh"
META_CONTENT_PATTERN = rf"(?is){_ATTR_BOUNDARY}content={ATTR_VALUE_PATTERN}"
#: refresh content value: delay, then optionally ';' or ',' and a
#: url= clause whose value may carry one more quoting level
#: (browsers accept content="0; url='/x'")
META_REFRESH_CONTENT_PATTERN = (
    rf"^[{WS_CHARS}]*([0-9]+(?:\.[0-9]+)?)[{WS_CHARS}]*"
    rf"(?:[;,][{WS_CHARS}]*[Uu][Rr][Ll][{WS_CHARS}]*=[{WS_CHARS}]*(.*))?$"
)


#: all <link ...> tags (group 0 per match) — the rel/href pair is then
#: matched PER TAG, the same one-scan shape as the meta-refresh path
LINK_TAG_PATTERN = rf"(?is)<link[{WS_CHARS}][^>]*>"
LINK_REL_PATTERN = rf"(?is){_ATTR_BOUNDARY}rel={ATTR_VALUE_PATTERN}"
LINK_HREF_PATTERN = rf"(?is){_ATTR_BOUNDARY}href={ATTR_VALUE_PATTERN}"


def extract_link_rels(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    base_col: str | None = None,
    rels: tuple[str, ...] = ("canonical", "alternate", "amphtml",
                             "prev", "next"),
) -> DataFrame:
    """Extract typed ``<link rel=... href=...>`` relations: one row per
    matching tag — ``(id_col, rel, url, abs_url, domain)`` — the
    page-relation edges a frontier dedups and recrawls on:
    ``rel=canonical`` is the author's own dedup key (feed ``abs_url``
    to :func:`canonical_url` and prefer it over the fetch URL),
    ``prev``/``next`` stitch paginated series, ``alternate``/
    ``amphtml`` point at language and AMP variants.

    ``rels`` filters to the relation types of interest (lowercased
    exact match on the rel token; multi-token rel values match on any
    whitespace-separated token).  Same plan shape as
    :func:`extract_meta_refresh`: ONE full-document scan collects the
    link tags, rel/href extraction runs per matched tag on tiny
    strings, resolution is the staged RFC-3986 chain — map-side, no
    shuffle."""
    html = F.col(text_col)
    tags = F.regexp_extract_all(html, F.lit(LINK_TAG_PATTERN), 0)
    pairs = F.transform(
        tags,
        lambda m: F.struct(
            F.lower(_unquote_attr(
                F.regexp_extract(m, LINK_REL_PATTERN, 1)
            )).alias("rel"),
            _unquote_attr(
                F.regexp_extract(m, LINK_HREF_PATTERN, 1)
            ).alias("url"),
        ),
    )
    want = F.array(*[F.lit(r.lower()) for r in rels])
    keep = F.filter(
        pairs,
        lambda x: (x["url"] != "")
        & F.arrays_overlap(F.split(x["rel"], WS_PATTERN), want),
    )
    # the resolution base honors the document's <base href> and its
    # parts hoist BEFORE the explode — once per document, not once per
    # link relation (review r14: rel tags routinely fan out 10-50x, so
    # per-link base parts multiplied the resolve cost)
    base = (_effective_base_select(df, text_col, base_col, id_col)
            if base_col else df)
    src = base.select(
        id_col,
        *((p.alias(f"__bp{i}")
           for i, p in enumerate(_base_parts(F.col("__eff_base"))))
          if base_col else ()),
        F.explode(keep).alias("l"),
    ).select(
        id_col,
        *((f"__bp{i}" for i in range(5)) if base_col else ()),
        F.col("l.rel").alias("rel"),
        F.col("l.url").alias("url"),
    )
    if base_col:
        src = src.select(
            id_col, "rel", "url",
            _resolve_case(
                F.col("url"), tuple(F.col(f"__bp{i}") for i in range(5))
            ).alias("__resolved"),
        ).select(
            id_col, "rel", "url",
            _collapse_dots(F.col("__resolved")).alias("abs_url"),
        )
    else:
        src = src.withColumn("abs_url", F.col("url"))
    return src.select(
        id_col, "rel", "url", "abs_url",
        normalized_domain(F.col("abs_url")).alias("domain"),
    )


def extract_meta_refresh(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    base_col: str | None = None,
) -> DataFrame:
    """Extract ``<meta http-equiv=refresh>`` client-side redirects: one
    row per refresh tag — ``(id_col, delay_s, url, abs_url, domain)``
    — the redirect edges a crawl frontier must follow (soft-404 pages,
    moved content, and redirect spam all ride meta refresh; a frontier
    that ignores them silently drops the targets).

    Semantics: the HTML ``refresh`` pragma — ``content="DELAY"`` or
    ``content="DELAY; url=TARGET"`` (``;`` or ``,`` separator,
    case-insensitive ``url=``, optional inner quoting of the target).
    URL-less refreshes (same-page reload timers) emit no row — they
    carry no frontier edge.  ``abs_url`` resolves against ``base_col``
    (the page URI) via the same staged RFC-3986 chain as
    :func:`extract_links`; ``domain`` is the normalized host of the
    resolved target.

    Plan: ONE full-document scan collects the meta tags
    (:data:`META_TAG_PATTERN`); the refresh test, content extraction,
    and delay/url split all run per matched tag on tiny strings —
    map-side, no shuffle, whole-stage codegen."""
    html = F.col(text_col)
    metas = F.regexp_extract_all(html, F.lit(META_TAG_PATTERN), 0)
    refr = F.filter(metas, lambda m: m.rlike(META_REFRESH_TEST_PATTERN))
    contents = F.transform(
        refr,
        lambda m: _unquote_attr(
            F.regexp_extract(m, META_CONTENT_PATTERN, 1)
        ),
    )
    # the resolution base honors the document's <base href> and its
    # parts hoist BEFORE the explode — once per document, not once per
    # tag — exactly like extract_links (review r14)
    base = (_effective_base_select(df, text_col, base_col, id_col)
            if base_col else df)
    src = base.select(
        id_col,
        *((p.alias(f"__bp{i}")
           for i, p in enumerate(_base_parts(F.col("__eff_base"))))
          if base_col else ()),
        F.explode(contents).alias("__content"),
    ).select(
        id_col,
        *((f"__bp{i}" for i in range(5)) if base_col else ()),
        F.regexp_extract(
            "__content", META_REFRESH_CONTENT_PATTERN, 1
        ).cast("double").alias("delay_s"),
        _unquote_attr(F.trim(F.regexp_extract(
            "__content", META_REFRESH_CONTENT_PATTERN, 2
        ))).alias("url"),
    ).filter(F.col("url") != "")
    if base_col:
        src = src.select(
            id_col, "delay_s", "url",
            _resolve_case(
                F.col("url"), tuple(F.col(f"__bp{i}") for i in range(5))
            ).alias("__resolved"),
        ).select(
            id_col, "delay_s", "url",
            _collapse_dots(F.col("__resolved")).alias("abs_url"),
        )
    else:
        src = src.select(id_col, "delay_s", "url",
                         F.col("url").alias("abs_url"))
    return src.select(
        id_col, "delay_s", "url", "abs_url",
        normalized_domain(F.col("abs_url")).alias("domain"),
    )


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
