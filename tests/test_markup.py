"""strip_markup: HTML -> plain text chain semantics on planted cases."""

import pandas as pd
from pyspark.sql import functions as F

from python_ctd_spark.operators.markup import strip_markup


def _run(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(texts)), "html": texts})
    )
    out = strip_markup(df, "html").toPandas().set_index("id")
    return out


def test_strip_markup_planted_document(spark):
    html = (
        '<!DOCTYPE html><html><head><style>p { color: red }</style>'
        '<script type="text/javascript">\nvar hidden = "<b>not text</b>";\n'
        "</script></head><body><h1>Title</h1>\n"
        '<p class="x">Hello   world</p><br/><!-- note -->'
        "&amp; &lt;tag&gt; &nbsp;&quot;q&#39;</body></html>"
    )
    out = _run(spark, [html]).loc[0]
    # script/style CONTENT gone (including the tag-looking string inside
    # the script — removed as a block, not tag-by-tag)
    assert "hidden" not in out.text_plain and "not text" not in out.text_plain
    assert "color" not in out.text_plain
    assert "note" not in out.text_plain
    assert out.text_plain == 'Title Hello world & <tag> "q\''
    assert out.n_script == 1 and out.n_style == 1 and out.n_comment == 1
    assert out.n_entities == 6  # amp, lt, gt, nbsp, quot, #39
    # remaining tags: doctype, html, head x0 (head open counted), body...
    assert out.n_tag > 5


def test_strip_markup_plain_text_noop(spark):
    out = _run(spark, ["just  plain\ttext, no markup"]).loc[0]
    assert out.text_plain == "just plain text, no markup"
    assert (
        out.n_script == out.n_style == out.n_comment == out.n_tag
        == out.n_entities == 0
    )


def test_strip_markup_null_and_case(spark):
    out = _run(spark, [None, "<SCRIPT>x</SCRIPT><B>Bold</B>"])
    assert pd.isna(out.loc[0, "text_plain"]) and pd.isna(out.loc[0, "n_tag"])
    assert len(out) == 2  # NULL rows survive
    assert out.loc[1, "text_plain"] == "Bold"
    assert out.loc[1, "n_script"] == 1  # case-insensitive block match


def test_strip_markup_double_escaped_entity(spark):
    """&amp;lt; decodes ONE level to the literal '&lt;' (amp last)."""
    out = _run(spark, ["a &amp;lt; b"]).loc[0]
    assert out.text_plain == "a &lt; b"
    assert out.n_entities == 1


def test_extract_links(spark):
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<p><a href="https://a.example.org/x">first\n  link</a> text '
        '<A HREF="https://spam.example.net/t?u=1" rel="nofollow">Offer</A>'
        "<a name='no-href'>not a link</a></p>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "html": [html, "no links at all"]})
    )
    out = extract_links(df, "html").toPandas()
    assert list(out.doc_id) == [0, 0]  # linkless docs emit nothing
    assert list(out.link_pos) == [1, 2]  # document order
    assert out.loc[0, "url"] == "https://a.example.org/x"
    assert out.loc[0, "anchor"] == "first link"  # whitespace normalized
    assert out.loc[0, "domain"] == "a.example.org"
    assert not out.loc[0, "is_blocked"]
    # case-insensitive tag match + blocklist hit
    assert out.loc[1, "domain"] == "spam.example.net"
    assert bool(out.loc[1, "is_blocked"])


def test_extract_links_domain_normalization(spark):
    """Blocklist matches cannot be dodged by case, port, or userinfo
    variation: the domain key is lowercased with userinfo/port
    stripped."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<a href="HTTPS://SPAM.EXAMPLE.NET/x">a</a>'
        '<a href="https://spam.example.net:443/x">b</a>'
        '<a href="https://u:pw@spam.example.net/x">c</a>'
        '<a href="https://spam.example.net./x">d</a>'
        '<a href="https://ok.example.org:8080/x">e</a>'
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [html]}))
    out = extract_links(df, "html").toPandas()
    assert list(out.domain) == ["spam.example.net"] * 4 + ["ok.example.org"]
    assert list(out.is_blocked) == [True, True, True, True, False]


def test_extract_links_quote_variants(spark):
    """ADVICE r11: single-quoted and unquoted hrefs are normalized to
    the double-quoted form before extraction — a quoting variation
    must not dodge the blocklist."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        "<a href='https://spam.example.net/x'>sq</a> "
        "<a href=https://spam.example.net/y>bare</a> "
        '<a class="z" href=\'https://a.example.org/p\'>sq2</a> '
        "<a href=http://b.example.org/q>bare2</a>"
    )
    df = pd.DataFrame({"doc_id": [0], "html": [html]})
    out = extract_links(spark.createDataFrame(df), "html").toPandas()
    assert list(out.url) == [
        "https://spam.example.net/x",
        "https://spam.example.net/y",
        "https://a.example.org/p",
        "http://b.example.org/q",
    ]
    assert list(out.anchor) == ["sq", "bare", "sq2", "bare2"]
    assert list(out.is_blocked) == [True, True, False, False]


def test_extract_links_asset_tags_and_resolution(spark):
    """VERDICT r12 items 1c+8: img/link/script URLs extract with a tag
    column (per-tag document-order link_pos), and references resolve
    against the page URI — a protocol-relative tracker pixel must hit
    the blocklist, dot-segments collapse, fragment/query references
    keep the base path."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<a href="https://abs.example.com/x">abs</a>'
        " <a href='page2.html'>rel</a>"
        ' <a href="../up/a.html">up</a>'
        ' <a href="#top">frag</a>'
        ' <a href="?q=1">query</a>'
        ' <a href="">empty</a>'
        ' <a href="mailto:x@y.z">mail</a>'
        " <img alt='px' src='//spam.example.net/px.gif'/>"
        ' <link rel="stylesheet" href="/assets/site.css"/>'
        " <script src=../static/app.js></script>"
    )
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "html": [html],
        "base": ["https://site1.example.org/w/5/index.html#old"],
    }))
    out = (
        extract_links(df, "html", base_col="base")
        .toPandas().set_index(["tag", "link_pos"]).sort_index()
    )
    base_nofrag = "https://site1.example.org/w/5/index.html"
    a = out.loc["a"]
    assert a.loc[1, "abs_url"] == "https://abs.example.com/x"
    assert a.loc[2, "abs_url"] == "https://site1.example.org/w/5/page2.html"
    assert a.loc[3, "abs_url"] == "https://site1.example.org/w/up/a.html"
    assert a.loc[4, "abs_url"] == base_nofrag + "#top"
    assert a.loc[5, "abs_url"] == base_nofrag + "?q=1"
    assert a.loc[6, "abs_url"] == base_nofrag  # empty href = self, no frag
    assert a.loc[7, "abs_url"] == "mailto:x@y.z"
    assert a.loc[2, "url"] == "page2.html"  # raw reference preserved
    img = out.loc["img"]
    assert img.loc[1, "abs_url"] == "https://spam.example.net/px.gif"
    assert bool(img.loc[1, "is_blocked"])  # pixel can't dodge via //
    assert img.loc[1, "anchor"] is None or pd.isna(img.loc[1, "anchor"])
    assert out.loc[("link", 1), "abs_url"] == (
        "https://site1.example.org/assets/site.css")
    assert out.loc[("script", 1), "abs_url"] == (
        "https://site1.example.org/w/static/app.js")
    # tags subset: only anchors come back
    only_a = extract_links(df, "html", base_col="base", tags=("a",))
    assert set(only_a.toPandas().tag) == {"a"}
    # without a base, abs_url mirrors the raw reference
    raw = extract_links(df, "html").toPandas()
    assert list(raw.url) == list(raw.abs_url)


def test_resolve_url_dot_segments(spark):
    """resolve_url collapses /./ and /seg/../ inside the PATH only —
    the authority can never be eaten by a leading dot-dot — and deep
    chains collapse across the bounded passes."""
    from python_ctd_spark.operators import markup

    cases = [
        ("./here.html", "https://h.org/a/b/index.html",
         "https://h.org/a/b/here.html"),
        ("../../x", "https://h.org/a/b/c/index.html", "https://h.org/a/x"),
        ("a/./b/../c.html", "https://h.org/d/index.html",
         "https://h.org/d/a/c.html"),
        ("x.html", "https://h.org", "https://h.org/x.html"),  # no path
        ("/../x", "https://h.org/a/", "https://h.org/../x"),  # clamped: kept
    ]
    df = spark.createDataFrame(
        pd.DataFrame(cases, columns=["u", "b", "want"])
    )
    out = df.select(
        "want",
        markup.resolve_url(F.col("u"), F.col("b")).alias("got"),
    ).toPandas()
    assert list(out.got) == list(out.want)


def test_extract_links_blocklist_table(spark):
    """VERDICT r11 item 7: a blocklist TABLE (the production denylist
    shape) marks domains via a broadcast LEFT join on the normalized
    domain — the executed plan must broadcast the blocklist side, and
    the literal IN-list still applies alongside."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<a href="https://bad1.example.com/x">a</a>'
        '<a href="https://BAD2.example.com:443/x">b</a>'
        '<a href="https://ok.example.org/x">c</a>'
        '<a href="https://spam.example.net/x">d</a>'
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [html]}))
    bl = spark.createDataFrame(
        pd.DataFrame({"domain": [
            "bad1.example.com", "bad2.example.com", "unused.example.net",
        ]})
    )
    out_df = extract_links(df, "html", blocklist=bl)
    out = out_df.toPandas()
    # table hits (incl. normalized-case), literal IN-list hit, clean row
    assert list(out.is_blocked) == [True, True, False, True]
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_markup_whitespace_class_matches_oracle(spark):
    """ADVICE r11: the whitespace collapse uses the explicit
    engine-independent class (WS_PATTERN), so \\x0B collapses to a
    space IDENTICALLY in Spark and the DuckDB oracle — a bare \\s
    would include \\x0B in Java but not in RE2."""
    import duckdb

    from python_ctd_spark.operators.markup import WS_PATTERN, strip_markup

    text = "a\x0bb <b>c\td</b>"
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    got = strip_markup(df, "text").toPandas().loc[0, "text_plain"]
    want = duckdb.sql(
        "SELECT trim(regexp_replace(regexp_replace($$" + text + "$$,"
        " '<[!/]?[A-Za-z][^>]*>', ' ', 'g'), '" + WS_PATTERN + "', ' ', 'g'))"
    ).fetchone()[0]
    assert got == want == "a b c d"


def test_blocklist_table_entries_are_normalized(spark):
    """A blocklist TABLE entry with case or a trailing dot still
    matches — the table side shares the link side's domain key
    normalization."""
    from python_ctd_spark.operators.markup import extract_links

    html = '<a href="https://tracker.example.com/x">t</a>'
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [html]}))
    bl = spark.createDataFrame(
        pd.DataFrame({"domain": [" Tracker.Example.Com. "]})
    )
    out = extract_links(df, "html", blocklist=bl).toPandas()
    assert list(out.is_blocked) == [True]


def test_extract_links_attr_boundary_not_fooled_by_data_src(spark):
    """Self-review r13: ``data-src``/``data-href`` must not match as
    the real attribute — lazy-load HTML is ubiquitous, and the greedy
    pattern previously extracted the benign data-src INSTEAD of the
    blocklisted real src (the exact dodge this feature exists to
    close)."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<img src="//spam.example.net/px.gif"'
        ' data-src="https://cdn.ok.example.com/img.jpg"/>'
        ' <a data-href="https://decoy.example.com/x"'
        ' href="https://spam.example.net/t">offer</a>'
        ' <img data-src="https://only-lazy.example.com/y.png"/>'
    )
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "html": [html],
        "base": ["https://site.example.org/p/index.html"],
    }))
    out = extract_links(df, "html", base_col="base").toPandas()
    img = out[out.tag == "img"]
    assert list(img.url) == ["//spam.example.net/px.gif"]  # not data-src,
    # and the data-src-only img emits nothing
    assert bool(img.iloc[0].is_blocked)
    a = out[out.tag == "a"]
    assert list(a.url) == ["https://spam.example.net/t"]
    assert bool(a.iloc[0].is_blocked)


def test_resolve_url_query_fragment_untouched_by_dot_collapse(spark):
    """Self-review r13: dot-segment collapse is a PATH operation (RFC
    3986 §5.2.4) — a query value like ?next=/a/../b must come through
    verbatim."""
    from python_ctd_spark.operators import markup

    cases = [
        ("p?next=/a/../b", "https://h.org/d/index.html",
         "https://h.org/d/p?next=/a/../b"),
        ("/x/./y?q=/./z#f/../g", "https://h.org/a/",
         "https://h.org/x/y?q=/./z#f/../g"),
    ]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["u", "b", "want"]))
    out = df.select(
        "want", markup.resolve_url(F.col("u"), F.col("b")).alias("got")
    ).toPandas()
    assert list(out.got) == list(out.want)


def test_canonical_url_dedup_key(spark):
    """canonical_url (r13): scheme/host case, userinfo, default ports,
    fragments, tracking params and query-parameter ORDER all collapse
    to one key; resource-identifying parts (path case, non-default
    ports, non-tracking params) survive."""
    from python_ctd_spark.operators.markup import canonical_url

    same = [
        "https://Ex.ORG/Path?b=2&a=1",
        "https://u:p@ex.org:443/Path?a=1&b=2#frag",
        "HTTPS://ex.org./Path?utm_source=x&b=2&utm_campaign=y&a=1",
        "https://ex.org/Path?fbclid=abc&gclid=1&a=1&b=2",
    ]
    diff = [
        "https://ex.org/path?a=1&b=2",      # path case differs
        "https://ex.org:8443/Path?a=1&b=2", # non-default port kept
        "https://ex.org/Path?a=2&b=2",      # param value differs
        "http://ex.org/Path?a=1&b=2",       # scheme differs
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"url": same + diff + ["mailto:a@b.c", "https://h/"]})
    )
    out = df.select("url", canonical_url(F.col("url")).alias("c")).toPandas()
    canon = out.set_index("url").c
    assert len(set(canon[u] for u in same)) == 1
    assert canon[same[0]] == "https://ex.org/Path?a=1&b=2"
    assert len({canon[u] for u in same + diff}) == 1 + len(diff)
    assert canon["mailto:a@b.c"] == "mailto:a@b.c"  # non-hierarchical
    assert canon["https://h/"] == "https://h/"
    # http default port + bare host get a path
    one = spark.createDataFrame(pd.DataFrame({"url": [
        "HTTP://A.Example.COM:80?utm_medium=m"]}))
    got = one.select(canonical_url(F.col("url")).alias("c")).toPandas().c[0]
    assert got == "http://a.example.com/"


def test_canonical_url_fragment_query_does_not_leak(spark):
    """Second self-review pass: a '?' INSIDE the fragment (SPA hash
    routing, '#!/route?tab=1') must not leak fragment content into the
    dedup key — the key equals the defragmented URL's key."""
    from python_ctd_spark.operators.markup import canonical_url

    df = spark.createDataFrame(pd.DataFrame({"url": [
        "https://ex.org/p#frag?a=1",
        "https://ex.org/p",
        "https://ex.org/p?real=1#!/route?tab=2",
    ]}))
    c = df.select("url", canonical_url(F.col("url")).alias("c")).toPandas()
    canon = c.set_index("url").c
    assert canon["https://ex.org/p#frag?a=1"] == "https://ex.org/p"
    assert canon["https://ex.org/p?real=1#!/route?tab=2"] == (
        "https://ex.org/p?real=1")


def test_resolve_url_agrees_with_urljoin_reference(spark):
    """Cross-implementation check: on the documented RFC-3986 subset
    (absolute/protocol-relative/root-relative/fragment/query/path-
    relative refs, dot-segments within the base depth), resolve_url
    must agree with the stdlib's independent urljoin implementation
    case-for-case.  Beyond-root '..' chains are the documented
    divergence (urljoin clamps to the root, resolve_url leaves the
    residue) and are excluded."""
    from urllib.parse import urljoin

    from python_ctd_spark.operators import markup

    bases = [
        "https://h.org/a/b/index.html",
        "https://h.org/",
        "https://h.org/a/x.html?q=0#z",
        "http://user@h.org:8080/p/q/",
    ]
    # the empty reference is excluded: urllib returns the base VERBATIM
    # (fragment included — a known urllib same-document quirk), while
    # RFC 3986 §5.2.2 leaves the target fragment undefined; resolve_url
    # follows the RFC (base without fragment, pinned in the dot-segment
    # test above)
    refs = [
        "x", "./x", "../x", "x/y.html", "x/../y", "a/./b",
        "/x", "/x/y?q=2", "//cdn.org/z", "#f", "?q=1",
        "https://abs.org/p", "mailto:a@b.c",
    ]
    cases = []
    for b in bases:
        for r in refs:
            if r == "../x" and b.count("/", 8) < 2:
                continue  # beyond-root: documented divergence
            cases.append((r, b, urljoin(b, r)))
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["u", "b", "want"]))
    out = df.select(
        "u", "b", "want",
        markup.resolve_url(F.col("u"), F.col("b")).alias("got"),
    ).toPandas()
    bad = out[out.got != out.want]
    assert bad.empty, bad.to_string()


def test_extract_links_base_href_priority(spark):
    """VERDICT r13 item 2 / RFC 3986 §5.1.1: the document's first
    <base href> — absolute or itself relative — replaces the retrieval
    URI as the resolution base for every link; pages without <base>
    keep the page URI."""
    from python_ctd_spark.operators.markup import extract_links

    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "html": [
            # absolute base on another host: the relative link and the
            # root-relative link both move to the base host
            '<base href="https://cdn.example.org/lib/v2/">'
            '<a href="page.html">a</a><img src="/px.gif"/>',
            # relative base resolves against the page URI first
            "<base href='../b/'><a href=\"x.html\">b</a>",
            # no base: page URI applies
            '<a href="x.html">c</a>',
            # only the FIRST base element counts (HTML spec)
            '<base href="https://first.example.org/f/">'
            '<base href="https://second.example.org/s/">'
            '<a href="y.html">d</a>',
        ],
        "base": ["https://site.example.org/w/9/index.html"] * 4,
    })
    out = (
        extract_links(spark.createDataFrame(rows), "html", base_col="base")
        .toPandas().set_index(["doc_id", "tag"]).sort_index()
    )
    assert out.loc[(1, "a"), "abs_url"] == (
        "https://cdn.example.org/lib/v2/page.html")
    # root-relative takes the BASE's origin, not the page's
    assert out.loc[(1, "img"), "abs_url"] == "https://cdn.example.org/px.gif"
    assert out.loc[(2, "a"), "abs_url"] == (
        "https://site.example.org/w/b/x.html")
    assert out.loc[(3, "a"), "abs_url"] == (
        "https://site.example.org/w/9/x.html")
    assert out.loc[(4, "a"), "abs_url"] == (
        "https://first.example.org/f/y.html")


def test_extract_links_srcset_candidates(spark):
    """VERDICT r13 item 3: img/source srcset candidate lists extract —
    one row per candidate URL, descriptors dropped, empty candidates
    skipped, quoting alternation applies — and a protocol-relative
    tracker in a 2x slot hits the blocklist."""
    from python_ctd_spark.operators.markup import extract_links

    html = (
        '<img srcset="a.jpg 1x, //spam.example.net/b.jpg 2x," '
        'src="main.png"/>'
        "<source srcset='s1.webp 480w , s2.webp 800w'/>"
        "<img srcset=bare.png/>"  # HTML5 unquoted-value tokenizer:
        # '/' before '>' belongs to the value — pinned as 'bare.png/'
    )
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "html": [html],
        "base": ["https://site.example.org/p/index.html"],
    }))
    out = extract_links(df, "html", base_col="base").toPandas()
    ss = out[out.tag == "img_srcset"]
    assert list(ss.url) == ["a.jpg", "//spam.example.net/b.jpg",
                            "bare.png/"]
    assert list(ss.link_pos) == [1, 2, 3]
    assert list(ss.is_blocked) == [False, True, False]
    src = out[out.tag == "source_srcset"]
    assert list(src.url) == ["s1.webp", "s2.webp"]
    # the plain src on the same img still extracts independently
    assert list(out[out.tag == "img"].url) == ["main.png"]


def test_canonical_url_percent_encoding_normalization(spark):
    """VERDICT r13 item 4 / RFC 3986 §6.2.2: escape hex uppercases,
    unreserved escapes decode, reserved escapes stay, invalid '%'
    passes through — so %7Euser and ~user share one dedup key."""
    from python_ctd_spark.operators.markup import canonical_url

    cases = [
        ("https://h.org/%7euser/x", "https://h.org/~user/x"),
        ("https://h.org/%7Euser/x", "https://h.org/~user/x"),
        ("https://h.org/~user/x", "https://h.org/~user/x"),
        ("https://h.org/a%2fb", "https://h.org/a%2Fb"),   # reserved stays
        ("https://h.org/%41%31%2d", "https://h.org/A1-"),
        ("https://h.org/100%25", "https://h.org/100%25"),
        ("https://h.org/50%-off", "https://h.org/50%-off"),  # invalid %
        # an obfuscated tracking param decodes, then drops
        ("https://h.org/p?%75tm_source=x&k=1", "https://h.org/p?k=1"),
        ("not-a-url %7e", "not-a-url %7e"),  # non-hierarchical untouched
    ]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["u", "want"]))
    out = df.select("u", "want",
                    canonical_url(F.col("u")).alias("got")).toPandas()
    bad = out[out.got != out.want]
    assert bad.empty, bad.to_string()


def test_resolve_url_terminal_dot_segments(spark):
    """ADVICE r13: references ENDING in '..' or '.' collapse — '..'
    against /w/5/index.html resolves to /w/, matching urljoin."""
    from urllib.parse import urljoin

    from python_ctd_spark.operators import markup

    base = "https://h.org/w/5/index.html"
    refs = ["..", ".", "x/..", "a/b/..", "./.", "../x/.."]
    cases = [(r, base, urljoin(base, r)) for r in refs]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["u", "b", "want"]))
    out = df.select(
        "u", "want", markup.resolve_url(F.col("u"), F.col("b")).alias("got")
    ).toPandas()
    bad = out[out.got != out.want]
    assert bad.empty, bad.to_string()


def test_extract_meta_refresh(spark):
    """Client-side redirects (r14): quoting/case/whitespace variants
    parse, inner-quoted targets unwrap, URL-less reload timers and
    non-refresh metas emit nothing, targets resolve against the page
    URI."""
    from python_ctd_spark.operators.markup import extract_meta_refresh

    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "html": [
            '<meta http-equiv="refresh" content="0; url=/moved">x',
            "<META HTTP-EQUIV='REFRESH' CONTENT='5 ; URL = next.html'>",
            '<meta http-equiv=refresh '
            'content="3;url=\'https://other.example.net/x\'">',
            '<meta http-equiv="refresh" content="30">',   # reload timer
            '<meta name="viewport" content="width=1">',   # decoy
            '<meta http-equiv="refresh" content="1.5, url=../up">',
        ],
        "base": ["https://site.example.org/w/5/index.html"] * 6,
    })
    out = (
        extract_meta_refresh(spark.createDataFrame(rows), "html",
                             base_col="base")
        .toPandas().set_index("doc_id")
    )
    assert set(out.index) == {1, 2, 3, 6}
    assert out.loc[1, "delay_s"] == 0.0
    assert out.loc[1, "abs_url"] == "https://site.example.org/moved"
    assert out.loc[2, "delay_s"] == 5.0
    assert out.loc[2, "abs_url"] == "https://site.example.org/w/5/next.html"
    assert out.loc[3, "url"] == "https://other.example.net/x"
    assert out.loc[3, "domain"] == "other.example.net"
    assert out.loc[6, "delay_s"] == 1.5  # ',' separator, fractional
    assert out.loc[6, "abs_url"] == "https://site.example.org/w/up"


def test_extract_meta_refresh_no_base(spark):
    from python_ctd_spark.operators.markup import extract_meta_refresh

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1],
        "html": ['<meta http-equiv="refresh" content="0;url=/a">'],
    }))
    out = extract_meta_refresh(df, "html").toPandas()
    assert list(out.url) == ["/a"] and list(out.abs_url) == ["/a"]


def test_canonical_url_scheme_obfuscation_and_nonascii_escapes(spark):
    """Review r14: (1) the hierarchical gate tests the RAW input — a
    percent-obfuscated scheme ('h%74tp://...') is not a URI and passes
    through unchanged (matching the oracle's raw-side gate); (2)
    non-ASCII escapes (%C3%A9 — every UTF-8 URL path on the web) keep
    their escapes, hex uppercased."""
    from python_ctd_spark.operators.markup import canonical_url

    cases = [
        ("h%74tp://Host.example/x", "h%74tp://Host.example/x"),
        ("https://h.org/caf%c3%a9", "https://h.org/caf%C3%A9"),
    ]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["u", "want"]))
    out = df.select("u", "want",
                    canonical_url(F.col("u")).alias("got")).toPandas()
    bad = out[out.got != out.want]
    assert bad.empty, bad.to_string()


def test_extract_link_rels(spark):
    """Typed link relations (r14): rel filtering incl. multi-token rel
    values and attribute order, staged resolution, canonical edges."""
    from python_ctd_spark.operators.markup import extract_link_rels

    rows = pd.DataFrame({
        "doc_id": [1, 2],
        "html": [
            '<link rel="canonical" href="https://a.org/page"/>'
            "<link rel='stylesheet alternate' href='alt.css'>"
            '<link rel=next href=/p2>'
            '<link rel="icon" href="/favicon.ico">',
            '<link href="/x" rel="CANONICAL">rel-after-href',
        ],
        "base": ["https://site.org/w/index.html"] * 2,
    })
    out = (
        extract_link_rels(spark.createDataFrame(rows), "html",
                          base_col="base")
        .toPandas().sort_values(["doc_id", "rel"]).reset_index(drop=True)
    )
    # icon filtered out; multi-token 'stylesheet alternate' kept via
    # its alternate token; rel AFTER href still matches
    assert list(out.rel) == ["canonical", "next", "stylesheet alternate",
                             "canonical"]
    assert out.loc[0, "abs_url"] == "https://a.org/page"
    assert out.loc[1, "abs_url"] == "https://site.org/p2"
    assert out.loc[2, "abs_url"] == "https://site.org/w/alt.css"
    assert out.loc[3, "abs_url"] == "https://site.org/x"
    # rels filter narrows
    only = extract_link_rels(
        spark.createDataFrame(rows), "html", base_col="base",
        rels=("canonical",),
    ).toPandas()
    assert set(only.rel) == {"canonical"} and len(only) == 2


def test_refresh_and_rels_honor_base_href(spark):
    """Review r14: the meta-refresh and link-rel extractors resolve
    against the document's EFFECTIVE base — the first <base href>
    (RFC 3986 §5.1.1) — exactly like extract_links; previously they
    used the retrieval URI only, the defect VERDICT r13 item 2 closed
    for links."""
    from python_ctd_spark.operators.markup import (
        extract_link_rels, extract_meta_refresh,
    )

    rows = pd.DataFrame({
        "doc_id": [1],
        "html": [
            '<base href="https://cdn.example.org/lib/">'
            '<meta http-equiv="refresh" content="0; url=go.html">'
            '<link rel="canonical" href="c.html">'
        ],
        "base": ["https://site.example.org/w/index.html"],
    })
    df = spark.createDataFrame(rows)
    mr = extract_meta_refresh(df, "html", base_col="base").toPandas()
    assert list(mr.abs_url) == ["https://cdn.example.org/lib/go.html"]
    lr = extract_link_rels(df, "html", base_col="base").toPandas()
    assert list(lr.abs_url) == ["https://cdn.example.org/lib/c.html"]
    assert list(lr.domain) == ["cdn.example.org"]
