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

#: href normalizers applied BEFORE anchor extraction, in order:
#: single-quoted and unquoted href values are rewritten to the
#: double-quoted form (ADVICE r11 — ``href='...'`` / ``href=url``
#: must not dodge the blocklist).  Replacement template is
#: ``$1"$2"`` in Spark, ``\1"\2"`` in the DuckDB oracle (engine
#: replacement syntax differs; the PATTERNS are shared).  The
#: unquoted rule runs second and requires a non-quote first char, so
#: it can never re-wrap an already-quoted (or just-rewritten) value.
HREF_NORMALIZE_PATTERNS: list[str] = [
    rf"(?is)(<a[{WS_CHARS}][^>]*href=)'([^']*)'",
    rf"(?is)(<a[{WS_CHARS}][^>]*href=)([^\"'{WS_CHARS}>]+)",
]

#: anchor pattern in the Java-regex/RE2 common subset: group 1 = the
#: href URL, group 2 = the anchor text (lazy, single-level — nested
#: anchors are invalid HTML and out of scope).  Double-quote-only by
#: construction: extraction always runs on href-normalized text.
ANCHOR_PATTERN = (
    rf'(?is)<a[{WS_CHARS}][^>]*href="([^"]*)"[^>]*>(.*?)</a[{WS_CHARS}]*>'
)

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


def extract_links(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    blocklist: DataFrame | None = None,
) -> DataFrame:
    """Extract every ``<a href>`` link from ``text_col``: one output row
    per link — ``(id_col, link_pos, url, domain, anchor, is_blocked)``
    — the crawl-graph stage in front of URL/domain filtering and
    outlink-based quality signals.

    href quoting is NORMALIZED before extraction
    (:data:`HREF_NORMALIZE_PATTERNS`): single-quoted and unquoted
    hrefs rewrite to the double-quoted form, so a trivial quoting
    variation cannot dodge the blocklist.  ``link_pos`` is the link's
    1-based position within its document (document order,
    deterministic).  ``domain`` is the NORMALIZED host: lowercased,
    userinfo and port stripped (so HTTPS://HOST, host:443, and
    user@host all resolve to one key — a blocklist match must not be
    dodgeable by trivial URL variation); ``is_blocked`` marks hosts in
    :data:`BLOCKED_DOMAINS` (a literal IN-list — no join) OR, when
    ``blocklist`` is given, in that one-column (``domain``) DataFrame
    — the production shape, where the denylist is a TABLE: a
    broadcast LEFT join on the normalized domain (millions of links x
    thousands of blocked hosts never shuffles the links side).
    Documents with no links emit no rows (explode semantics;
    LEFT-join back to the corpus for a per-doc outlink count
    including zeros).

    All native: two ``regexp_extract_all`` passes (URL group, anchor
    group) zipped and exploded — map-side, no shuffle, whole-stage
    codegen (plus the broadcast join when a blocklist table is given).
    """
    html = F.col(text_col)
    for pat in HREF_NORMALIZE_PATTERNS:
        html = F.regexp_replace(html, pat, '$1"$2"')
    urls = F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 1)
    anchors = F.regexp_extract_all(html, F.lit(ANCHOR_PATTERN), 2)
    ex = df.select(
        id_col, F.posexplode(F.arrays_zip(urls.alias("u"), anchors.alias("a")))
    ).select(
        id_col,
        (F.col("pos") + 1).cast("int").alias("link_pos"),
        F.col("col.u").alias("url"),
        F.trim(F.regexp_replace(F.col("col.a"), WS_PATTERN, " ")).alias("anchor"),
    )
    domain = normalized_domain(F.col("url"))
    out = ex.select(
        id_col,
        "link_pos",
        "url",
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
