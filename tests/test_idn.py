"""IDN hostname normalization (operators/idn.py): punycode encoding
via the stdlib codec, idempotence on pre-encoded input, agreement with
the stdlib 'idna' codec on its supported range, and the Spark column
path."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark.operators.idn import (
    idn_ascii_host,
    normalize_idn_domains,
)


def test_known_vectors():
    # classic IDNA examples (RFC 3492 / IDNA TestVectors commons)
    assert idn_ascii_host("bücher.example") == "xn--bcher-kva.example"
    assert idn_ascii_host("münchen.de") == "xn--mnchen-3ya.de"
    assert idn_ascii_host("例え.テスト") == "xn--r8jz45g.xn--zckzah"
    # mixed: only the non-ASCII label encodes
    assert idn_ascii_host("www.münchen.de") == "www.xn--mnchen-3ya.de"


def test_case_and_root_dot_merge_with_unicode_form():
    want = "xn--mnchen-3ya.de"
    assert idn_ascii_host("MÜNCHEN.de") == want
    assert idn_ascii_host("münchen.DE.") == want
    # pre-encoded punycode is idempotent (case-insensitively)
    assert idn_ascii_host("XN--MNCHEN-3YA.de") == want
    assert idn_ascii_host(want) == want


def test_agrees_with_stdlib_idna_codec():
    """Cross-implementation check on hosts the stdlib RFC-3490 codec
    accepts: our pragmatic pass must produce the identical ASCII
    form."""
    hosts = [
        "bücher.example", "münchen.de", "россия.рф", "ελλάδα.gr",
        "中文.example.org", "plain.example.com",
    ]
    for h in hosts:
        want = h.encode("idna").decode("ascii")
        assert idn_ascii_host(h) == want, h


def test_nfc_normalization_merges_decomposed_form():
    # u + combining diaeresis (NFD) vs precomposed ü (NFC)
    nfd = "münchen.de"
    assert idn_ascii_host(nfd) == "xn--mnchen-3ya.de"


def test_none_and_unencodable_pass_through():
    assert idn_ascii_host(None) is None
    assert idn_ascii_host("ascii-only.example") == "ascii-only.example"
    # an oversize non-ASCII label stays as-is (lowercased) — never drop
    big = "ü" * 80 + ".example"
    got = idn_ascii_host(big)
    assert got.endswith(".example") and "ü" in got


def test_spark_column_path(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "domain": ["MÜNCHEN.de", "xn--mnchen-3ya.DE", "plain.org", None],
    }))
    out = normalize_idn_domains(df).toPandas()
    assert list(out.domain[:3]) == [
        "xn--mnchen-3ya.de", "xn--mnchen-3ya.de", "plain.org"
    ]
    assert pd.isna(out.domain[3])


def test_composes_with_canonical_url_domains(spark):
    """The documented frontier recipe: native canonical_url /
    normalized_domain first (document-scale work stays JVM-side), the
    IDN pass on the resulting short domain strings — both forms of one
    host end on one dedup key."""
    from python_ctd_spark.operators.markup import normalized_domain

    df = spark.createDataFrame(pd.DataFrame({
        "url": ["https://MÜNCHEN.de/a", "http://xn--mnchen-3ya.de/b"],
    }))
    out = normalize_idn_domains(
        df.select(normalized_domain(F.col("url")).alias("domain"))
    ).toPandas()
    assert set(out.domain) == {"xn--mnchen-3ya.de"}
