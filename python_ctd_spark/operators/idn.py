"""Internationalized hostname (IDN) normalization — the opt-in
companion to :func:`..markup.canonical_url` for crawls that mix
Unicode and ``xn--`` punycode forms of one host.

``canonical_url`` is fully native and therefore lowercases IDN hosts
without converting them (documented there): ``münchen.example`` and
``xn--mnchen-3ya.example`` stay distinct dedup keys.  This module
closes that under-merge with a pragmatic IDNA ToASCII pass built on
the stdlib ``punycode`` codec (RFC 3492 bootstring — clean-room via
the standard library, no external ``idna`` package in this
environment):

- NFC-normalize and casefold each label (the lowercase subset of the
  UTS-46 mapping), strip one trailing root dot;
- ASCII labels pass through lowercased; non-ASCII labels become
  ``xn--`` + punycode;
- labels ALREADY in ``xn--`` form pass through lowercased (idempotent
  on pre-encoded input);
- anything unencodable (oversize labels, codec errors) returns the
  lowercased input unchanged — a normalizer must never drop rows.

Documented deviations from full UTS-46: no bidi/contextJ validity
checks, no deviation-character mapping (ß, ZWJ/ZWNJ), no STD3 ASCII
rules — those need the Unicode tables; the pass here merges the
case/encoding variants a frontier actually collides on.  Hosts are
tiny strings, so the Arrow-batched UDF hop prices at ~nothing next to
the document-scale columns; everything else in the URL stays on the
native path.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, DataFrame, functions as F


def idn_ascii_host(host: str | None) -> str | None:
    """Kernel: one hostname -> its ASCII (punycode) form, lowercased;
    ``None`` passes through.  Pure Python + stdlib — used inside the
    Spark UDF and directly unit-testable."""
    if host is None:
        return None
    h = unicodedata.normalize("NFC", host).casefold().rstrip(".")
    out = []
    for label in h.split("."):
        if label.isascii():
            out.append(label)
            continue
        try:
            enc = label.encode("punycode").decode("ascii")
        except UnicodeError:
            out.append(label)
            continue
        if len(enc) + 4 > 63:  # DNS label cap — leave unencodable as-is
            out.append(label)
            continue
        out.append("xn--" + enc)
    return ".".join(out)


def idn_hosts_to_ascii(col: Column) -> Column:
    """Column form of :func:`idn_ascii_host` — one Arrow-batched pandas
    UDF over host strings (rule of thumb: run it on the DISTINCT host
    table or a post-:func:`..markup.normalized_domain` column, never on
    per-link rows, so the Python hop is bounded by the domain count —
    the same cardinality argument robots rules ride)."""

    @F.pandas_udf("string")
    def _udf(s):
        return s.map(idn_ascii_host)

    return _udf(col)


def normalize_idn_domains(
    df: DataFrame, domain_col: str = "domain", out_col: str | None = None
) -> DataFrame:
    """Rewrite a domain column to its IDNA-ASCII form (in place by
    default).  The 100 TB shape: join-free, map-side; apply AFTER
    domain extraction so the UDF sees short host strings, and prefer
    deduplicating frontier domains first when the pipeline allows."""
    out = out_col or domain_col
    return df.withColumn(out, idn_hosts_to_ascii(F.col(domain_col)))
