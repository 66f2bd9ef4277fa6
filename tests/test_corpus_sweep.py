"""Non-default-column sweep over the ENTIRE Corpus fluent surface
(VERDICT r10 item 1): every method must run end-to-end with
``id_col="item_id", text_col="body", domain_col="src"`` so a
hard-named intermediate column (the r9 Corpus.split bug, the r10
Corpus.dedup bug — both from dedup_clusters normalizing its output to
the literal name 'doc_id') can never regress one method at a time.

One parametrized test; each case forces execution (count/collect) and,
for chainable stages, asserts the renamed columns survive the chain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F


@pytest.fixture(scope="module")
def corp(spark):
    from python_ctd_spark.corpus import Corpus

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
        .withColumnRenamed("doc_id", "item_id")
        .withColumnRenamed("text", "body")
        .withColumnRenamed("source", "src")
        .localCheckpoint()  # freeze: limit() is otherwise nondeterministic
    )
    return Corpus(df, id_col="item_id", text_col="body", domain_col="src")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(5)
        .select("doc_id", "text")
    )


# name -> callable(corp, bench) returning a Corpus or a DataFrame.
# Chainable stages are checked for column survival; point analyses just
# have to execute with the renamed schema.
CASES = {
    "filter": lambda c, b: c.filter(F.col("n_chars") > 0),
    "normalize": lambda c, b: c.normalize(),
    "strip_boilerplate": lambda c, b: c.strip_boilerplate(min_docs=3),
    "dedup_lines": lambda c, b: c.dedup_lines(),
    "quantile_filter": lambda c, b: c.quantile_filter("n_chars", 0.1, 0.9),
    "quality_score": lambda c, b: c.quality_score(),
    "lang_id": lambda c, b: c.lang_id(),
    "filter_lang": lambda c, b: c.filter_lang("en"),
    "redact_numbers": lambda c, b: c.redact_numbers(),
    "redact_pii": lambda c, b: c.redact_pii(),
    "sample": lambda c, b: c.sample(0.5),
    "exact_sample": lambda c, b: c.exact_sample(2),
    "stratified_sample": lambda c, b: c.stratified_sample({"src0": 1.0}, 0.5),
    "decontaminate": lambda c, b: c.decontaminate(b, n=5),
    "dedup_exact": lambda c, b: c.dedup_exact(),
    "dedup": lambda c, b: c.dedup(),
    "dedup_against": lambda c, b: c.dedup_against(c.signatures()),
    "domain_mix": lambda c, b: c.domain_mix({"src0": 2, "src1": 2}),
    "domain_mix_temperature": lambda c, b: c.domain_mix_temperature(20.0),
    "pack": lambda c, b: c.pack(max_tokens=256),
    "tokenize": lambda c, b: c.tokenize(),
    "shard": lambda c, b: c.shard(4),
    "split": lambda c, b: c.split({"train": 0.8, "val": 0.1, "test": 0.1}),
    "gopher_filter": lambda c, b: c.gopher_filter(min_words=1),
    "score_quality": lambda c, b: c.score_quality(
        c.train_quality_classifier(b, b, iters=1)
    ),
    "drop_duplicated_passages": lambda c, b: c.drop_duplicated_passages(0.5),
    "remove_dup_passages": lambda c, b: c.remove_dup_passages(min_docs=2),
    "transform": lambda c, b: c.transform(lambda df: df.limit(10)),
    "strip_markup": lambda c, b: c.strip_markup(),
    "diversity_sample": lambda c, b: c.diversity_sample(
        c.df.select(
            F.col("item_id").alias("id"), (F.col("item_id") % 4).alias("cell")
        ),
        per_cell=2,
    ),
    # point analyses (plain DataFrames out)
    "unigram_logprob": lambda c, b: c.unigram_logprob(),
    "bigram_logprob": lambda c, b: c.bigram_logprob(ref=b),
    "chunk": lambda c, b: c.chunk(window=64),
    "signatures": lambda c, b: c.signatures(),
    "duplicate_pairs": lambda c, b: c.duplicate_pairs(),
    "containment_pairs": lambda c, b: c.containment_pairs(),
    "contamination_report": lambda c, b: c.contamination_report(b, n=5),
    "tfidf_top_terms": lambda c, b: c.tfidf_top_terms(),
    "repetition_stats": lambda c, b: c.repetition_stats(),
    "gopher_rules": lambda c, b: c.gopher_rules(min_words=1),
    "dup_passage_stats": lambda c, b: c.dup_passage_stats(),
    "approx_domain_stats": lambda c, b: c.approx_domain_stats(),
    "sketch_accuracy": lambda c, b: c.sketch_accuracy(),
    "frequent_tokens": lambda c, b: c.frequent_tokens(0.01),
    "frequent_ngrams": lambda c, b: c.frequent_ngrams(2, 0.001),
    "domain_stats": lambda c, b: c.domain_stats(),
    "pack_sequences": lambda c, b: c.tokenize().pack_sequences(seq_len=128),
    "extract_links": lambda c, b: c.extract_links(),
    "robots_rules": lambda c, b: c.robots_rules(),
    "sitemap_urls": lambda c, b: c.sitemap_urls(),
    "extract_meta_refresh": lambda c, b: c.extract_meta_refresh(),
    "extract_link_rels": lambda c, b: c.extract_link_rels(),
}


def test_sweep_covers_every_public_method():
    """The CASES table must track the live surface: a new public Corpus
    method without a sweep entry fails here, not silently."""
    from python_ctd_spark.corpus import Corpus

    public = {
        m for m in dir(Corpus)
        if not m.startswith("_") and callable(getattr(Corpus, m))
    }
    # constructors and the trainers are exercised by dedicated tests
    # (test_corpus_sources.py; train_tokenizer runs on the renamed
    # corpus below; train_quality_classifier feeds the score_quality
    # sweep entry and has its own parity/invariance tests)
    exempt = {"from_jsonl", "from_csv", "train_tokenizer",
              "train_quality_classifier"}
    missing = public - set(CASES) - exempt
    assert not missing, f"Corpus methods without a sweep entry: {missing}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_corpus_method_non_default_columns(spark, corp, bench_docs, name):
    out = CASES[name](corp, bench_docs)
    if isinstance(out, DataFrame):
        df = out
        chained = False
    else:
        df = out.df
        chained = True
    n = df.count()  # force the full plan
    assert n >= 0
    if chained:
        for col in ("item_id", "body"):
            assert col in df.columns, f"{name} lost {col}: {df.columns}"
        assert "doc_id" not in df.columns, (
            f"{name} leaked a hard-named doc_id column: {df.columns}"
        )


def test_train_tokenizer_non_default_columns(corp):
    merges = corp.train_tokenizer(n_merges=4, min_word_freq=1)
    assert len(merges) <= 4 and all(len(m) == 2 for m in merges)
