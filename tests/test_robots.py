"""robots.txt parsing + URL filtering (operators/robots.py — RFC 9309
semantics): group attribution, specific-agent-replaces-wildcard,
longest-match with allow-wins-ties, * wildcards and $ anchors, and the
zero-link-shuffle plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark.operators.robots import apply_robots, robots_rules

ROBOTS_A = """# site a
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Crawl-delay: 2

User-agent: goodbot
User-agent: otherbot
Disallow: /only-good/

Sitemap: https://a.example.org/sitemap.xml
"""

ROBOTS_B = """User-agent: badbot
Disallow: /

User-agent: *
Disallow: /*.pdf$
Disallow: /tmp*
"""


@pytest.fixture(scope="module")
def rules(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({
            "source": ["a.example.org", "b.example.org"],
            "text": [ROBOTS_A, ROBOTS_B],
        })
    )
    return robots_rules(docs).cache()


def test_robots_rules_groups_and_sitemap(rules):
    out = rules.toPandas()
    a = out[out.domain == "a.example.org"]
    # the * group carries its three directives
    star = a[a.agent == "*"].set_index("directive")
    assert star.loc["disallow", "value"] == "/private/"
    assert star.loc["allow", "value"] == "/private/ok.html"
    assert star.loc["crawl-delay", "value"] == "2"
    # contiguous UA lines share ONE group's rules
    for agent in ("goodbot", "otherbot"):
        g = a[a.agent == agent]
        assert list(g.directive) == ["disallow"]
        assert list(g.value) == ["/only-good/"]
    # sitemap is group-independent (NULL agent)
    sm = a[a.directive == "sitemap"]
    assert len(sm) == 1 and pd.isna(sm.iloc[0].agent)
    assert sm.iloc[0].value == "https://a.example.org/sitemap.xml"


def _links(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "abs_url", "domain"])
    )


def test_apply_robots_longest_match_and_wildcards(spark, rules):
    links = _links(spark, [
        (1, "https://a.example.org/public/x", "a.example.org"),
        (2, "https://a.example.org/private/secret", "a.example.org"),
        (3, "https://a.example.org/private/ok.html", "a.example.org"),
        (4, "https://b.example.org/doc.pdf", "b.example.org"),
        (5, "https://b.example.org/doc.pdf?x=1", "b.example.org"),
        (6, "https://b.example.org/tmp/scratch", "b.example.org"),
        (7, "https://b.example.org/fine.html", "b.example.org"),
        (8, "https://norobots.example.org/a", "norobots.example.org"),
        (9, "https://a.example.org", "a.example.org"),  # empty path -> /
    ])
    out = (
        apply_robots(links, rules)
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert not out[1]
    assert out[2]          # /private/ prefix
    assert not out[3]      # longer Allow wins over shorter Disallow
    assert out[4]          # /*.pdf$ anchored wildcard
    assert not out[5]      # $ anchor: query-suffixed URL is NOT .pdf-final
    assert out[6]          # /tmp* prefix wildcard
    assert not out[7]
    assert not out[8]      # no robots data -> allowed
    assert not out[9]


def test_apply_robots_specific_agent_replaces_wildcard(spark, rules):
    links = _links(spark, [
        (1, "https://a.example.org/private/secret", "a.example.org"),
        (2, "https://a.example.org/only-good/page", "a.example.org"),
        (3, "https://b.example.org/anything", "b.example.org"),
    ])
    out = (
        apply_robots(links, rules, agent="goodbot")
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    # goodbot has its OWN group on a.example.org: the * group's
    # /private/ rule does NOT apply (replace, not merge)...
    assert not out[1]
    assert out[2]          # ...but its own /only-good/ rule does
    # on b.example.org goodbot has no group -> falls back to *
    assert not bool(out[3])  # /anything is not matched by the * rules
    # badbot's own group on b blocks everything
    out_bad = (
        apply_robots(links, rules, agent="BadBot")
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert bool(out_bad[3])


def test_apply_robots_plan_is_broadcast_no_link_shuffle(spark, rules):
    links = _links(spark, [
        (1, "https://a.example.org/x", "a.example.org"),
    ])
    plan = (
        apply_robots(links, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_robots_end_to_end_from_warc_and_links(spark, tmp_path):
    """The composed crawl head: robots.txt payloads arrive as ordinary
    WARC responses -> robots_rules; pages -> extract_links; the flag
    joins them — no new I/O surface anywhere."""
    from python_ctd_spark.io.warc import (
        build_warc, make_response_record, read_warc,
        warc_responses_to_documents,
    )
    from python_ctd_spark.operators.markup import extract_links

    robots = make_response_record(
        "https://site.example.org/robots.txt",
        b"User-agent: *\nDisallow: /private/\n",
        "r-robots", http_content_type="text/plain",
    )
    page = make_response_record(
        "https://site.example.org/index.html",
        (b'<a href="/private/a">hidden</a>'
         b' <a href="/public/b">fine</a>'),
        "r-page",
    )
    p = tmp_path / "c.warc.gz"
    p.write_bytes(build_warc([robots, page], gz=True))
    docs = warc_responses_to_documents(read_warc(spark, str(p)))
    robots_docs = docs.filter(F.col("text").startswith("User-agent"))
    rules = robots_rules(robots_docs)
    pages = docs.filter(~F.col("text").startswith("User-agent")).withColumn(
        "base_uri", F.lit("https://site.example.org/index.html")
    )
    links = extract_links(pages, "text", base_col="base_uri")
    out = apply_robots(links, rules).toPandas().set_index("url")
    assert bool(out.loc["/private/a", "is_robots_disallowed"])
    assert not out.loc["/public/b", "is_robots_disallowed"]


def test_sitemap_urls(spark):
    """Sitemap XML (sitemaps.org): page entries and nested index
    entries extract with per-entry lastmod pairing intact across
    interleaved tags; <loc> XML entities decode; garbage payloads emit
    nothing."""
    from python_ctd_spark.operators.robots import sitemap_urls

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.org/p1</loc><lastmod>2024-01-02</lastmod></url>
  <url><changefreq>daily</changefreq><loc> https://a.example.org/p2?x=1&amp;y=2 </loc></url>
  <url><loc>https://a.example.org/p3</loc></url>
</urlset>"""
    index = """<sitemapindex>
  <sitemap><loc>https://b.example.org/sitemap-a.xml</loc>
    <lastmod>2023-12-31</lastmod></sitemap>
</sitemapindex>"""
    docs = spark.createDataFrame(pd.DataFrame({
        "source": ["a.example.org", "b.example.org", "junk.example.org"],
        "text": [urlset, index, "not xml at all"],
    }))
    out = sitemap_urls(docs).toPandas()
    a = out[out.domain == "a.example.org"].set_index("url")
    assert len(a) == 3 and (a.kind == "url").all()
    assert a.loc["https://a.example.org/p1", "lastmod"] == "2024-01-02"
    # whitespace trimmed, entity decoded, lastmod NULL where absent
    assert "https://a.example.org/p2?x=1&y=2" in a.index
    assert pd.isna(a.loc["https://a.example.org/p3", "lastmod"])
    b = out[out.domain == "b.example.org"]
    assert list(b.kind) == ["sitemap"]
    assert list(b.url) == ["https://b.example.org/sitemap-a.xml"]
    assert list(b.lastmod) == ["2023-12-31"]
    assert (out.domain != "junk.example.org").all()


def test_robots_review_findings_r13(spark):
    """Second self-review pass: (1) an empty 'Disallow:' — the
    canonical allow-ALL robots.txt — must disallow nothing, not
    everything; (2) an agent group holding only Crawl-delay still
    EXISTS and replaces the * group; (3) two snapshots of one domain's
    robots.txt must never cross-contaminate their groups."""
    docs = spark.createDataFrame(pd.DataFrame({
        "source": ["e.org", "f.org", "y.org", "y.org"],
        "text": [
            "User-agent: *\nDisallow:\n",                       # allow-all
            "User-agent: goodbot\nCrawl-delay: 5\n\n"
            "User-agent: *\nDisallow: /\n",
            "User-agent: a\nDisallow: /a-only/\n",              # snapshot 1
            "User-agent: b\nDisallow: /b-only/\n",              # snapshot 2
        ],
    }))
    rules = robots_rules(docs).cache()
    # (3) no cross-contamination between same-domain documents
    y = rules.filter(F.col("domain") == "y.org").toPandas()
    got = {(r.agent, r.value) for r in y.itertuples()}
    assert got == {("a", "/a-only/"), ("b", "/b-only/")}
    links = _links(spark, [
        (1, "https://e.org/anything", "e.org"),
        (2, "https://f.org/page", "f.org"),
    ])
    # (1) empty Disallow never matches
    star = apply_robots(links, rules).toPandas().set_index("doc_id")
    assert not bool(star.loc[1, "is_robots_disallowed"])
    assert bool(star.loc[2, "is_robots_disallowed"])  # f.org * blocks /
    # (2) goodbot's crawl-delay-only group replaces * on f.org
    good = (
        apply_robots(links, rules, agent="goodbot")
        .toPandas().set_index("doc_id")
    )
    assert not bool(good.loc[2, "is_robots_disallowed"])


def test_apply_robots_product_token_prefix_matching(spark, rules):
    """RFC 9309 §2.2.1 product-token matching (VERDICT r13 item 6): a
    versioned UA string strips its /version suffix, and a group whose
    token PREFIXES the crawler's token applies — 'goodbot-images'
    obeys the 'goodbot' group instead of silently falling back to *."""
    links = _links(spark, [
        (1, "https://a.example.org/private/secret", "a.example.org"),
        (2, "https://a.example.org/only-good/page", "a.example.org"),
    ])
    for ua in ("GoodBot/1.2", "goodbot-images", "Goodbot-Images/2.0 xyz"):
        out = (
            apply_robots(links, rules, agent=ua)
            .toPandas().set_index("doc_id").is_robots_disallowed
        )
        # the goodbot group replaces *: /private/ no longer applies,
        # /only-good/ does
        assert not bool(out[1]), ua
        assert bool(out[2]), ua
    # an unrelated token still falls back to the * group
    out = (
        apply_robots(links, rules, agent="otherbot2000/9")
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert not bool(out[1])  # otherbot group (prefix match) replaces *
    assert bool(out[2])
    out = (
        apply_robots(links, rules, agent="randombot/1")
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert bool(out[1]) and not bool(out[2])  # * group applies


def test_apply_robots_most_specific_prefix_group_wins(spark):
    """When several groups prefix the crawler's token, the LONGEST
    (most specific) one replaces the rest — never a merge."""
    docs = spark.createDataFrame(pd.DataFrame({
        "source": ["m.org"],
        "text": [
            "User-agent: good\nDisallow: /broad/\n\n"
            "User-agent: goodbot\nDisallow: /narrow/\n\n"
            "User-agent: *\nDisallow: /star/\n"
        ],
    }))
    r = robots_rules(docs)
    links = _links(spark, [
        (1, "https://m.org/broad/x", "m.org"),
        (2, "https://m.org/narrow/x", "m.org"),
        (3, "https://m.org/star/x", "m.org"),
    ])
    out = (
        apply_robots(links, r, agent="Goodbot-News/3")
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert not bool(out[1]) and bool(out[2]) and not bool(out[3])


def test_apply_robots_matches_defragmented_url(spark, rules):
    """ADVICE r13: matching is over path+query only — a resolved
    '#sec-N' anchor must not defeat a '$'-anchored rule."""
    links = _links(spark, [
        (1, "https://b.example.org/doc.pdf#sec-2", "b.example.org"),
        (2, "https://b.example.org/fine.html#frag", "b.example.org"),
    ])
    out = (
        apply_robots(links, rules)
        .toPandas().set_index("doc_id").is_robots_disallowed
    )
    assert bool(out[1])       # /*.pdf$ matches once the fragment drops
    assert not bool(out[2])


def test_robots_rules_retry_stable_key_and_duplicate_snapshots(spark):
    """VERDICT r13 item 7: the snapshot discriminator is content-derived
    (md5 halves), so byte-identical (domain, text) snapshots merge to
    one — same output as a single copy, no quadratic agent x rule
    fanout — while distinct snapshots still coexist uncontaminated."""
    one = spark.createDataFrame(pd.DataFrame({
        "source": ["d.org"],
        "text": ["User-agent: a\nUser-agent: b\nDisallow: /x/\n"],
    }))
    dup = spark.createDataFrame(pd.DataFrame({
        "source": ["d.org"] * 3,
        "text": ["User-agent: a\nUser-agent: b\nDisallow: /x/\n"] * 3,
    }))
    want = robots_rules(one).toPandas().sort_values(
        ["agent", "directive", "value"]).reset_index(drop=True)
    got = robots_rules(dup).toPandas().sort_values(
        ["agent", "directive", "value"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 2  # one row per UA in the shared group


def test_sitemap_urls_gzipped_binary_payload(spark):
    """VERDICT r13 item 5: sitemaps.org allows sitemap.xml.gz — a
    BINARY payload column gunzips gzip-magic blobs and UTF-8-decodes
    the rest; junk (binary garbage or corrupt gzip) still emits
    nothing."""
    import gzip

    from python_ctd_spark.operators.robots import sitemap_urls

    urlset = (b'<urlset><url><loc>https://gz.example.org/p1</loc>'
              b'<lastmod>2024-06-01</lastmod></url></urlset>')
    rows = pd.DataFrame({
        "source": ["gz.example.org", "plain.example.org",
                   "junk.example.org", "corrupt.example.org"],
        "text": [gzip.compress(urlset),
                 b"<urlset><url><loc>https://plain.example.org/q</loc></url></urlset>",
                 b"\x00\x01binary-garbage",
                 b"\x1f\x8bnot-really-gzip"],
    })
    out = sitemap_urls(spark.createDataFrame(rows)).toPandas()
    got = out.set_index("domain")
    assert got.loc["gz.example.org", "url"] == "https://gz.example.org/p1"
    assert got.loc["gz.example.org", "lastmod"] == "2024-06-01"
    assert got.loc["plain.example.org", "url"] == "https://plain.example.org/q"
    assert "junk.example.org" not in got.index
    assert "corrupt.example.org" not in got.index


def test_sitemap_truncated_gzip_quarantines_not_kills(spark):
    """Review r14: a TRUNCATED gzip member raises EOFError (not
    OSError) from gzip.decompress — a routine partial fetch must emit
    zero rows next to a good payload, not kill the task."""
    import gzip

    from python_ctd_spark.operators.robots import sitemap_urls

    xml = (b"<urlset><url><loc>https://ok.example.org/p</loc></url>"
           b"</urlset>")
    rows = pd.DataFrame({
        "source": ["trunc.example.org", "ok.example.org"],
        "text": [gzip.compress(xml)[:20], xml],
    })
    out = sitemap_urls(spark.createDataFrame(rows)).toPandas()
    assert list(out.domain) == ["ok.example.org"]


def test_frontier_schedule_crawl_delay_pacing(spark):
    """frontier_schedule (r14): the parsed Crawl-delay paces each
    domain's queue — agent-group tiering picks the right delay, the
    max of surviving values wins, no-delay domains use the default,
    budgets cap the queue, ordering is deterministic."""
    from python_ctd_spark.operators.robots import (
        frontier_schedule, robots_rules,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "source": ["d.org", "e.org"],
        "text": [
            "User-agent: *\nCrawl-delay: 2\nDisallow: /x/\n\n"
            "User-agent: goodbot\nCrawl-delay: 5\nDisallow: /y/\n",
            "User-agent: *\nDisallow: /z/\n",   # no delay -> default
        ],
    }))
    rules = robots_rules(docs).cache()
    links = _links(spark, [
        (1, "https://d.org/a", "d.org"),
        (2, "https://d.org/b", "d.org"),
        (3, "https://d.org/c", "d.org"),
        (4, "https://e.org/a", "e.org"),
        (5, "https://e.org/b", "e.org"),
    ])
    # * group: delay 2
    out = (
        frontier_schedule(links, rules, default_delay_s=1.0)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(out.loc[[1, 2, 3], "fetch_rank"]) == [1, 2, 3]
    assert list(out.loc[[1, 2, 3], "fetch_offset_s"]) == [0.0, 2.0, 4.0]
    assert list(out.loc[[4, 5], "fetch_offset_s"]) == [0.0, 1.0]  # default
    # goodbot's own group replaces *: delay 5, via a versioned UA
    good = (
        frontier_schedule(links, rules, agent="GoodBot-News/9")
        .toPandas().set_index("doc_id").sort_index()
    )
    assert list(good.loc[[1, 2, 3], "fetch_offset_s"]) == [0.0, 5.0, 10.0]
    # budget caps the per-domain queue
    capped = frontier_schedule(links, rules, per_domain_budget=2).toPandas()
    assert len(capped[capped.domain == "d.org"]) == 2
    # plan: delay table broadcasts; links shuffle ONCE on the domain
    plan = (
        frontier_schedule(links, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
