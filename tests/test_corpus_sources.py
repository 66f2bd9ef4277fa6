"""JSONL/CSV corpus ingestion: explicit schema (no inference pass),
PERMISSIVE quarantine of malformed lines, parquet round-trip parity."""

import gzip
import json
import os

import pytest

from python_ctd_spark.io import (
    corrupt_records,
    read_documents_csv,
    read_documents_jsonl,
    valid_records,
)

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
    {"doc_id": 2, "text": "hola mundo", "lang": "es", "source": "web", "n_chars": 10},
    {"doc_id": 3, "text": "line\nbreak doc", "lang": "en", "source": "code", "n_chars": 14},
]
BAD_LINES = ['{"doc_id": broken', "not json at all"]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "shard-00.jsonl"
    lines = [json.dumps(GOOD[0]), BAD_LINES[0], json.dumps(GOOD[1]), BAD_LINES[1]]
    p.write_text("\n".join(lines) + "\n")
    # a second, gzipped shard — codec discovered from the extension
    with gzip.open(tmp_path / "shard-01.jsonl.gz", "wt") as f:
        f.write(json.dumps(GOOD[2]) + "\n")
    return str(tmp_path)


def test_jsonl_permissive_quarantine(spark, jsonl_dir):
    df = read_documents_jsonl(spark, jsonl_dir)
    ok = valid_records(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in ok] == [1, 2, 3]
    assert ok[2].text == "line\nbreak doc"  # \n survives JSON encoding
    bad = {r.raw for r in corrupt_records(df).collect()}
    assert bad == set(BAD_LINES)


def test_jsonl_dropmalformed_and_failfast(spark, jsonl_dir):
    dropped = read_documents_jsonl(spark, jsonl_dir, mode="DROPMALFORMED")
    assert dropped.count() == 3
    assert "_corrupt_record" not in dropped.columns
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_documents_jsonl(spark, jsonl_dir, mode="FAILFAST").count()


def test_jsonl_schema_is_explicit_not_inferred(spark, jsonl_dir):
    """The scan must carry the declared schema even for files whose rows
    omit fields — no inference pass, missing fields are NULL."""
    df = read_documents_jsonl(spark, jsonl_dir)
    assert [f.name for f in df.schema.fields[:5]] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]


def test_parquet_roundtrip_parity(spark, tmp_path):
    """testdata documents -> JSONL shards -> read back == original.
    (Counts go through a real column: a bare count() over the raw
    stream references only the corrupt column, which Spark rejects —
    see valid_records' docstring.)"""
    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "jsonl")
    src.coalesce(2).write.json(out)
    back = valid_records(read_documents_jsonl(spark, out))
    assert back.agg(F.count("doc_id")).first()[0] == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_csv_multiline_quoted(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        'doc_id,text,lang,source,n_chars\n'
        '1,"plain text",en,web,10\n'
        '2,"quoted ""multi\nline"" doc",en,web,22\n'
    )
    df = read_documents_csv(spark, str(p))
    ok = valid_records(df).orderBy("doc_id").collect()
    assert len(ok) == 2
    assert ok[1].text == 'quoted "multi\nline" doc'


def test_corpus_from_jsonl_chains(spark, jsonl_dir):
    """The fluent Corpus API runs a real pipeline stage straight off a
    JSONL source (quarantined rows already dropped)."""
    from python_ctd_spark.corpus import Corpus

    c = Corpus.from_jsonl(spark, jsonl_dir)
    out = c.quality_score().df
    assert out.agg({"doc_id": "count"}).first()[0] == 3
    assert "quality" in out.columns


def test_corpus_approx_domain_stats(spark):
    from python_ctd_spark.corpus import Corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = Corpus(docs).approx_domain_stats().toPandas()
    assert {"n_docs", "approx_distinct_texts", "approx_token_pcts"} <= set(out.columns)
    assert (out.n_docs > 0).all()
