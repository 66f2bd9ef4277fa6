"""Text-analysis operators for training-data pipelines — all native
string/array functions (JVM, codegen), no Python workers.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ._util import WS_RE

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "that", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "por", "un", "con"],
    "fr": ["le", "la", "de", "et", "que", "les", "des", "pour", "dans", "une"],
}


def tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), WS_RE)


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col)).cast("bigint")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-flavored token estimate: count regex word pieces + digits +
    punctuation marks (a cheap, deterministic stand-in for a real BPE
    vocab; ~chars/4 for English).  Uses one regexp pass — fully
    JVM-side, the right tool when an approximate count feeds a
    heuristic.  For budgets that must match a real tokenizer, use
    :func:`bpe_token_count`."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces).cast("bigint")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 512,
    min_freq: int = 2,
    min_word_freq: int = 2,
    max_vocab: int | None = 500_000,
) -> list[tuple[str, str]]:
    """Train the byte-level BPE merge table ON THE CORPUS, distributed:
    the corpus-sized work — pre-tokenizing every document and counting
    pre-token frequencies — is ONE Spark pass (Arrow-batched
    pre-tokenizer UDF, explode, hash aggregate with map-side combine);
    the merge loop then runs on the collected ``(pre-token, freq)``
    vocabulary, which is BOUNDED driver state (unique pre-tokens, not
    corpus rows — the same lifecycle as ``train_quantizer``/
    ``pq_train``: train once, store the merges, tokenize forever).

    Byte-identical to the serial reference trainer
    (:func:`..functions.bpe.train_merges`) by construction: both run
    :func:`..functions.bpe.merge_loop` on the same vocabulary, and the
    Spark count of a multiset equals the serial count (test-pinned).

    At 100 TB the raw pre-token vocabulary is itself large (10^8-10^9
    distinct pre-tokens on web text), so the driver cap is the DEFAULT
    (VERDICT r9 item 1): ``min_word_freq=2`` drops hapax noise IN the
    aggregate (a word seen < k times cannot influence early merges at
    any realistic scale) and ``max_vocab=500_000`` keeps the top-N by
    (freq desc, word) — both deterministic, both applied before the
    collect so driver state is bounded by construction.  Pass
    ``min_word_freq=1, max_vocab=None`` explicitly to reproduce the
    uncapped serial reference on a corpus you know is small.

    The top-N is NOT a global-sort window: ``orderBy(...).limit(N)``
    compiles to ``TakeOrderedAndProject`` — each task keeps its local
    top-N and only those survivors merge, so no stage ever sees the
    full count table in one partition (plan-pinned in
    tests/test_bpe.py).  Write the result with the GPT-2 merges format
    next to the corpus and feed ``merges_path=`` of
    :func:`bpe_tokenize`."""
    from ..functions.bpe import merge_loop

    counts = bpe_pretoken_counts(df, text_col, min_word_freq, max_vocab)
    word_freq = {r["w"]: int(r["f"]) for r in counts.collect()}
    return merge_loop(word_freq, n_merges, min_freq)


def bpe_pretoken_counts(
    df: DataFrame,
    text_col: str = "text",
    min_word_freq: int = 2,
    max_vocab: int | None = 500_000,
) -> DataFrame:
    """The corpus-sized half of :func:`bpe_train` as a DataFrame:
    pre-token frequencies ``(w, f)`` after the driver-state caps —
    hapax pruning inside the hash aggregate and a DISTRIBUTED top-N
    (``orderBy(...).limit(N)`` compiles to ``TakeOrderedAndProject``:
    per-task local top-N, bounded merge of the survivors; no stage
    ever holds the full count table in one partition).  Exposed so the
    count/prune plan is itself testable and driver-auditable; the
    result is what :func:`bpe_train` collects into the merge loop."""
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.types import ArrayType, StringType

    from ..functions.bpe import pretokens

    def _pre(s):
        return s.map(lambda t: pretokens(t or ""))

    pre_udf = F.pandas_udf(_pre, ArrayType(StringType()))
    counts = (
        df.select(F.explode(pre_udf(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    if min_word_freq > 1:
        counts = counts.filter(F.col("f") >= min_word_freq)
    if max_vocab is not None:
        counts = counts.orderBy(F.col("f").desc(), F.col("w")).limit(max_vocab)
    return counts


def bpe_token_count(
    df: DataFrame,
    text_col: str = "text",
    merges_path: str | None = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """REAL byte-level BPE token counts (VERDICT r7 item 5): the public
    GPT-2 merge-loop (``functions/bpe.py``) over a trained merge table
    (GPT-2 merges format; the committed fixture is trained by
    tools/make_bpe_fixture.py), so packing budgets and per-doc costs
    key off the tokenizer a training run would actually use, not a
    regex estimate.

    Plan shape: the ranks dict is broadcast once (a merge table is KBs
    to a few MB — classic broadcast-dim size); counting runs in an
    Arrow-batched pandas UDF with a per-batch word cache (natural text
    repeats pre-tokens heavily, so the merge loop runs once per
    distinct word per batch).  Map-side only — no shuffle, linear scan,
    the same 100 TB shape as every other per-doc text stat; it is the
    merge loop itself that is Python (BPE is iterative and
    data-dependent — no closed JVM form), which is exactly the
    SURVEY §4.2 pandas-UDF escape hatch."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.types import LongType

    from ..functions.bpe import encode_count, load_ranks

    ranks = load_ranks(merges_path)
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    # no annotations: `from __future__ import annotations` stringifies
    # them and pandas_udf's signature inference rejects the strings
    def _count(s):
        r = bc.value
        cache: dict = {}
        return s.map(lambda t: encode_count(t or "", r, cache)).astype("int64")

    count_udf = F.pandas_udf(_count, LongType())
    return df.withColumn(out_col, count_udf(F.col(text_col)))


def bpe_tokenize(
    df: DataFrame,
    text_col: str = "text",
    merges_path: str | None = None,
    out_col: str = "token_ids",
) -> DataFrame:
    """REAL byte-level BPE token IDS — the tokenize step a training-data
    pipeline actually ships (counts budget the packing; ids ARE the
    data).  Same engine shape as :func:`bpe_token_count` (broadcast
    ranks + the rank-derived vocab, Arrow-batched pandas UDF with a
    per-batch word cache, map-side only); ids follow the canonical
    trained-BPE numbering (byte value 0..255, then 256+merge_rank —
    ``functions.bpe.vocab_from_ranks``), so the merges fixture fully
    determines the vocabulary."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.types import ArrayType, IntegerType

    from ..functions.bpe import encode_ids, load_ranks, vocab_from_ranks

    ranks = load_ranks(merges_path)
    bc = df.sparkSession.sparkContext.broadcast((ranks, vocab_from_ranks(ranks)))

    def _ids(s):
        r, v = bc.value
        cache: dict = {}
        return s.map(lambda t: encode_ids(t or "", r, v, cache))

    ids_udf = F.pandas_udf(_ids, ArrayType(IntegerType()))
    return df.withColumn(out_col, ids_udf(F.col(text_col)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + a composite score:
    length, alpha ratio, punctuation density, stopword ratio, mean token
    length, repetition (distinct/total tokens).

    Tokens and per-feature counts stage through projected columns so each
    split/regex/filter pass runs once per row, however many times the
    composite score references it (inline expressions re-evaluate per
    reference — same pitfall as dedup.with_shingles).
    """
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    lt = F.col("__lt")
    staged = df.withColumn(
        "__lt", F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    ).withColumns(
        {
            "__n_tok": F.size(F.col("__lt")).cast("double"),
            "__n_chars": F.length(text_col).cast("double"),
            "__alpha": F.length(
                F.regexp_replace(text_col, r"[^A-Za-z]", "")
            ).cast("double"),
            "__punct": F.length(
                F.regexp_replace(text_col, r"[A-Za-z0-9\s]", "")
            ).cast("double"),
        }
    ).withColumns(
        {
            "__stop_hits": F.size(
                F.filter(lt, lambda t: F.array_contains(en_stops, t))
            ).cast("double"),
            "__distinct_ratio": F.size(F.array_distinct(lt)).cast("double")
            / F.col("__n_tok"),
        }
    )
    n_tok, n_chars = F.col("__n_tok"), F.col("__n_chars")
    alpha, punct = F.col("__alpha"), F.col("__punct")
    stop_hits, distinct_ratio = F.col("__stop_hits"), F.col("__distinct_ratio")
    score = (
        F.lit(0.25) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * (alpha / n_chars)
        + F.lit(0.2) * F.least(stop_hits / n_tok * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * distinct_ratio
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct / n_chars * F.lit(10.0), F.lit(1.0)))
    )
    return staged.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "alpha_ratio": alpha / n_chars,
            "punct_ratio": punct / n_chars,
            "stopword_ratio": stop_hits / n_tok,
            "distinct_token_ratio": distinct_ratio,
            "quality": F.round(score, 6),
        }
    ).drop("__lt", "__n_tok", "__n_chars", "__alpha", "__punct", "__stop_hits", "__distinct_ratio")


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-hit language identification (en/es/fr heuristic): count
    tokens appearing in each language's stopword list, argmax with a
    fixed precedence for ties."""
    staged = df.withColumn(
        "__lt", F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    )
    hit_cols = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols[f"hits_{lang}"] = F.size(
            F.filter(F.col("__lt"), lambda t: F.array_contains(arr, t))
        ).cast("bigint")
    staged = staged.withColumns(hit_cols)
    en, es, fr = F.col("hits_en"), F.col("hits_es"), F.col("hits_fr")
    pred = (
        F.when((en >= es) & (en >= fr), F.lit("en"))
        .when(es >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return staged.withColumn(out_col, pred).drop("__lt")


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document over a corpus.

    Plan: explode tokens -> (doc, term) counts (one shuffle, map-side
    combine) -> document frequency per term as a COUNT window over the
    tf table partitioned by term (one row per distinct (doc, term) —
    and, unlike a ``tf.groupBy(term)`` + join back, the window reads
    the tf subtree ONCE: Catalyst does not share common subtrees across
    join branches, so the aggregate-and-rejoin spelling re-ran the
    whole scan -> explode -> count chain a second time just to build
    the df table; guide §7.2 "duplicated subtrees", measured as 2 full
    text scans in the r14 plan dump) -> score -> per-doc top-k window.
    The idf is the **rational** form ``tf * N / df`` rather than
    a logarithm: same ranking for fixed N, and exactly reproducible
    across engines (libm log implementations differ in the last ulp,
    which is enough to flip a rank tie).

    The corpus size N stays in-plan as a one-row aggregate broadcast
    into a cross join (mirroring the oracle's ``CROSS JOIN n``) — no
    eager ``collect`` at plan-construction time, no extra driver-side
    job; the id-only count scans a single pruned column.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df(term) = number of (id, term) rows sharing the term — the same
    # integer the groupBy+join computed, attached in one pass
    dfreq_w = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n = df.agg(F.countDistinct(id_col).alias("__n_docs"))
    scored = (
        tf.withColumn("df", dfreq_w)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n_docs")).cast("double") / F.col("df").cast("double"),
        )
        .drop("__n_docs")
    )

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("id").alias(id_col), "term", "tf", "df", "score",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (the Gopher-style repetition
    rules, adapted to whitespace tokens): distinct-token fraction,
    duplicate word-bigram fraction, and the frequency share of the most
    repeated token.  High duplicate-n-gram fractions flag boilerplate /
    looping generations that length and punctuation heuristics miss.

    All native array expressions, staged through projected columns (the
    split runs once per row).  The top-token count is an O(u * n) fold
    per document — u distinct tokens; fine for natural documents whose
    token counts are bounded, and entirely map-side at any corpus size.
    """
    lt = F.col("__lt")
    n = F.col("__n").cast("double")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(lt) - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(lt, (i + 1).cast("int")),
            F.try_element_at(lt, (i + 2).cast("int")),
        ),
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct(lt),
            lambda x: F.size(F.filter(lt, lambda y: y == x)),
        )
    ).cast("double")
    return (
        df.withColumn("__lt", F.split(F.trim(F.lower(F.col(text_col))), WS_RE))
        .withColumn("__n", F.size(F.col("__lt")))
        .withColumn("__bg", bigrams)
        .select(
            F.col(id_col),
            F.col("__n").cast("bigint").alias("n_tokens"),
            F.round(F.size(F.array_distinct(lt)).cast("double") / n, 6).alias(
                "distinct_token_frac"
            ),
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(F.col("__bg"))).cast("double")
                / F.size(F.col("__bg")).cast("double"),
                6,
            ).alias("dup_bigram_frac"),
            F.round(top_count / n, 6).alias("top_token_frac"),
        )
    )


def redact_numbers(
    df: DataFrame, col: str, out: str = "redacted", marker: str = "#"
) -> DataFrame:
    """Redact digit runs (the shape of phone numbers / ids / zip codes in
    a PII-scrubbing pass) and count what was removed — one regex pass for
    the rewrite, one for the count, both native JVM."""
    return df.withColumns(
        {
            out: F.regexp_replace(F.col(col), "[0-9]+", marker),
            "n_redacted": F.size(
                F.regexp_extract_all(F.col(col), F.lit("[0-9]+"), 0)
            ).cast("bigint"),
        }
    )


# Ordered PII pattern chain (VERDICT r10 item 7).  Every regex is
# deliberately restricted to syntax with IDENTICAL semantics in Java
# regex (Spark) and RE2 (the DuckDB oracle): no lookaround, no
# backreferences, ASCII classes and \b only.  ORDER MATTERS and is part
# of the contract: uuid before ipv4/phone (hex runs would otherwise be
# chewed), ipv4 before phone (dotted quads match the phone shape),
# digit runs last as the catch-all.  Each count is taken on the text as
# rewritten by the PRECEDING patterns, so counts never double-report
# one span under two names.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("uuid",
     r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
     r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
     "<UUID>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()./ -]{5,}[0-9]", "<PHONE>"),
    ("digit_runs", r"[0-9]+", "#"),
]


def redact_pii(df: DataFrame, col: str, out: str = "redacted") -> DataFrame:
    """Breadth PII scrub (the superset of :func:`redact_numbers`):
    emails, UUIDs, IPv4 addresses, phone-shaped digit groups, and
    residual digit runs are replaced by typed markers in the
    :data:`PII_PATTERNS` chain order, with a per-pattern audit count
    (``n_email``, ``n_uuid``, ``n_ipv4``, ``n_phone``,
    ``n_digit_runs``).  Heuristic by design — a date can match the
    phone shape — which is the right trade for a training-data scrub
    (over-redact, never under-redact).  Entirely native JVM regex
    passes, map-side at any scale; the DuckDB oracle replays the
    identical chain (tools/oracles/text.py builds it from this very
    table)."""
    # nested expression objects are fine here: whole-stage codegen's
    # subexpression elimination computes each rewrite stage once per
    # row (verified — an explicitly column-staged variant measured
    # identical 4.9-5.4s on the sf0.1 driver row), and the work is one
    # map-side pass of ~2 regex scans per pattern, embarrassingly
    # parallel at any scale
    cur = F.col(col)
    cols: dict = {}
    for name, pat, marker in PII_PATTERNS:
        cols[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), 0)
        ).cast("bigint")
        cur = F.regexp_replace(cur, pat, marker)
    cols[out] = cur
    return df.withColumns(cols)


def rolling_fingerprint(text_col: str = "text", mod: int = 1_000_000_007) -> Column:
    """Deterministic polynomial rolling hash over tokens (document
    fingerprint): acc = (acc*131 + ascii(tok[0])*31 + len(tok)) % mod."""
    toks = tokens(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (
            acc * F.lit(131) + F.ascii(t).cast("bigint") * F.lit(31) + F.length(t).cast("bigint")
        )
        % F.lit(mod),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, MassiveText
    filtering, adapted to whitespace tokens): named boolean verdicts per
    rule plus the conjunction, so a pipeline can both filter and audit
    *why* documents fall.  Complements ``quality_score`` (a soft score)
    with the published hard-rule form.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio (# and ellipsis) <= 0.1; >= 80% of
    words contain an alphabetic character; >= 2 English stopword hits.

    Entirely native expressions, map-side at any scale; the token array
    and per-feature counts stage through projected columns so each
    split/filter pass runs once per row.
    """
    lt = F.col("__lt")
    n = F.col("__n").cast("double")
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    staged = (
        df.withColumn("__lt", F.split(F.trim(F.lower(F.col(text_col))), WS_RE))
        .withColumn("__n", F.size(F.col("__lt")))
        .withColumns(
            {
                "__wlen": F.aggregate(
                    F.transform(lt, lambda w: F.length(w)),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double"),
                "__symbols": (
                    F.length(F.col(text_col))
                    - F.length(F.regexp_replace(text_col, r"#", ""))
                    + F.size(F.split(F.col(text_col), r"\.\.\.")) - 1
                ).cast("double"),
                "__alpha_words": F.size(
                    F.filter(lt, lambda w: w.rlike("[a-z]"))
                ).cast("double"),
                "__stop_hits": F.size(
                    F.filter(lt, lambda w: F.array_contains(en_stops, w))
                ),
            }
        )
    )
    mean_wlen = F.col("__wlen") / n
    sym_ratio = F.col("__symbols") / n
    alpha_frac = F.col("__alpha_words") / n
    rules = {
        "rule_word_count": (F.col("__n") >= min_words) & (F.col("__n") <= max_words),
        "rule_mean_word_len": (mean_wlen >= 3.0) & (mean_wlen <= 10.0),
        "rule_symbol_ratio": sym_ratio <= 0.1,
        "rule_alpha_words": alpha_frac >= 0.8,
        "rule_stopwords": F.col("__stop_hits") >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return staged.select(
        F.col(id_col),
        F.col("__n").cast("bigint").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.col("__stop_hits").cast("bigint").alias("stop_hits"),
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


def chunk_documents(
    df: DataFrame,
    window: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into (optionally overlapping) token-window
    chunks — the RAG-indexing / long-context prep step: ``window``
    tokens per chunk, a new chunk every ``stride`` tokens (default =
    ``window``, i.e. disjoint; ``stride < window`` overlaps, preserving
    context across cuts).  Emits ``(id, chunk_id, chunk_text,
    n_tokens)`` with ``chunk_id = start // stride`` (0-based, dense).

    Pure map-side fan-out: token array + ``posexplode``-style start
    sequence per row, no shuffle anywhere — the 1->N row explosion is
    the whole plan, so it parallelizes with the scan at any scale.
    """
    stride = window if stride is None else stride
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got ({window}, {stride})")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would silently drop tokens"
        )
    toks = F.col("__toks")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    staged = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("__toks", F.split(F.trim(F.col(text_col)), WS_RE))
        .select(F.col(id_col), "__toks", F.explode(starts).alias("__start"))
    )
    chunk = F.slice(toks, F.col("__start") + 1, window)
    return staged.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("bigint").alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average unigram log-likelihood under the corpus's
    own unigram distribution — the classic cheap LM proxy for "does this
    text look like the corpus" (gibberish, boilerplate code, and
    wrong-language documents score far below prose; a rank filter on
    this column is the poor man's perplexity cut).

    Returns ``(doc_id, n_tokens, avg_logprob)`` with ``avg_logprob =
    (1/n) * sum ln(count(tok)) - ln(total_tokens)``.

    Scale shape: tokens explode map-side; the vocabulary count table
    (distinct tokens — orders of magnitude smaller than the token
    stream) aggregates with map-side combine and is **broadcast** back
    onto the stream, so the only full-stream shuffle is the final
    per-doc aggregate.  The log sum is decimal-cast so its value is
    independent of partition order (oracle-stable); the single
    ln(total) lands once per row at the end.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS_RE)).alias("__tok")
    )
    from pyspark.sql import Window

    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    # total corpus tokens = sum of the count table, attached to every
    # vocabulary row by a global window instead of a separate
    # ``counts.agg(sum)`` + cross join: Catalyst shares no subtrees
    # across join branches, so the aggregate spelling re-ran the whole
    # scan -> explode -> count chain a second time for ONE number
    # (guide §7.2 "duplicated subtrees"; 3 full text scans in the r14
    # plan dump, now 2).  The single-partition window pass is bounded
    # by the same design assumption that lets ``counts`` broadcast:
    # the vocabulary is orders of magnitude smaller than the stream.
    counts = counts.withColumn(
        "__t", F.sum("__c").over(Window.partitionBy()).cast("double")
    )
    scored = (
        toks.join(F.broadcast(counts), "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log(F.col("__c").cast("double")).cast("decimal(25,12)"))
            .cast("double")
            .alias("__slc"),
            F.max("__t").alias("__t"),
        )
    )
    return (
        scored.select(
            id_col,
            "n_tokens",
            F.round(
                F.col("__slc") / F.col("n_tokens").cast("double")
                - F.log(F.col("__t")),
                4,
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    ref: DataFrame | None = None,
) -> DataFrame:
    """Per-document average BIGRAM log-likelihood under the corpus's own
    bigram distribution, add-1 smoothed over the corpus vocabulary —
    the LM-proxy upgrade of :func:`unigram_logprob`: a unigram model
    scores repeated-common-token salad ("the the the ...") ABOVE real
    prose, while the bigram model sees the improbable transitions.

    Returns ``(doc_id, n_bigrams, avg_logprob)`` with ``avg_logprob =
    (1/m) * sum ln((C(prev,w) + 1) / (C(prev) + V))`` over the doc's m
    positional bigrams (docs with fewer than 2 tokens have no bigrams
    and no output row — same contract as the oracle).

    Scale shape (mirrors unigram_logprob): bigrams build NATIVELY per
    row and explode map-side; the bigram count table aggregates with
    map-side combine, the prefix totals reduce from the already
    aggregated counts (one row per distinct bigram, not per token), and
    both — plus the 1-row vocabulary size — broadcast back onto the
    stream, so the only full-stream shuffle is the final per-doc
    aggregate.  Per-term decimal casts make the log sum independent of
    partition order (oracle-stable, same discipline as
    unigram_logprob).

    ``ref`` scores ``df`` under a REFERENCE corpus's bigram LM instead
    of its own (the CCNet usage: train on a trusted corpus, score the
    crawl) — self-scoring cannot rank planted repetition below prose
    because the plant is in its own training counts.  Bigrams unseen in
    the reference take the smoothed zero count (LEFT joins)."""
    lm = df if ref is None else ref
    lt = F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    pairs = F.when(
        F.size("__lt") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__lt") - 1),
            lambda i: F.struct(
                F.try_element_at(F.col("__lt"), i.cast("int")).alias("p"),
                F.concat_ws(
                    " ",
                    F.try_element_at(F.col("__lt"), i.cast("int")),
                    F.try_element_at(F.col("__lt"), (i + 1).cast("int")),
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:string,g:string>>"))
    def _bigrams(frame):
        return (
            frame.withColumn("__lt", lt)
            .select(F.col(id_col), F.explode(pairs).alias("__b"))
            .select(
                id_col, F.col("__b.p").alias("__p"), F.col("__b.g").alias("__g")
            )
        )

    big = _bigrams(df)
    # the LM side needs no document ids (a reference frame may not even
    # carry this corpus's id column) — counts are over pairs alone
    if ref is None:
        lm_big = big.select("__p", "__g")
    else:
        lm_big = (
            lm.withColumn("__lt", lt)
            .select(F.explode(pairs).alias("__b"))
            .select(F.col("__b.p").alias("__p"), F.col("__b.g").alias("__g"))
        )
    counts = lm_big.groupBy("__g", "__p").agg(F.count(F.lit(1)).alias("__c"))
    vocab = (
        lm.select(F.explode(lt).alias("__tok"))
        .agg(F.countDistinct("__tok").cast("double").alias("__v"))
    )
    # LEFT joins: a bigram/prefix unseen in the reference LM takes the
    # smoothed zero count instead of silently dropping from the average
    term = (
        F.log(F.coalesce(F.col("__c"), F.lit(0)).cast("double") + 1.0)
        - F.log(
            F.coalesce(F.col("__cp"), F.lit(0)).cast("double") + F.col("__v")
        )
    ).cast("decimal(25,12)")
    if ref is None:
        # self-scoring: every scored bigram exists in its own count
        # table, so the prefix total can ride the SAME broadcast row as
        # the bigram count — a SUM window over __p on the count table
        # replaces the ``counts.groupBy(__p)`` + second join, which
        # (Catalyst sharing no subtrees across join branches) re-ran
        # the whole scan -> tokenize -> bigram-explode -> count chain
        # a second time (guide §7.2; 4 full text scans in the r14 plan
        # dump, now 3).  With a reference LM this fusion would be
        # WRONG: a probe bigram missing from ``counts`` must still
        # find its prefix total, so the two-join shape stays below.
        from pyspark.sql import Window

        counts_cp = counts.withColumn(
            "__cp", F.sum("__c").over(Window.partitionBy("__p"))
        ).drop("__p")
        scored = (
            big.join(F.broadcast(counts_cp), "__g", "left")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum(term).cast("double").alias("__s"),
            )
        )
    else:
        prev_tot = counts.groupBy("__p").agg(F.sum("__c").alias("__cp"))
        scored = (
            big.join(F.broadcast(counts.drop("__p")), "__g", "left")
            .join(F.broadcast(prev_tot), "__p", "left")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum(term).cast("double").alias("__s"),
            )
        )
    return scored.select(
        id_col,
        "n_bigrams",
        F.round(F.col("__s") / F.col("n_bigrams").cast("double"), 4).alias(
            "avg_logprob"
        ),
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_dedup",
    sep: str = "\n",
) -> DataFrame:
    """Intra-document repeated-line removal (the MassiveText in-doc rule
    that doc-level dedup cannot express): keep the FIRST occurrence of
    every line, preserving order — boilerplate navigation/footer lines
    pasted repeatedly inside one page collapse to a single copy.

    Pure higher-order array expressions (split -> indexed filter on
    first-occurrence position -> rejoin), map-side at any scale; also
    emits ``n_lines`` and ``n_removed`` so a pipeline can audit how much
    boilerplate each document carried."""
    lines = F.split(F.col(text_col), re.escape(sep))
    kept = F.filter(
        F.col("__lines"),
        lambda x, i: F.array_position(F.col("__lines"), x) == i + 1,
    )
    return (
        df.withColumn("__lines", lines)
        .withColumn(out_col, F.concat_ws(sep, kept))
        .withColumn("n_lines", F.size("__lines").cast("bigint"))
        .withColumn(
            "n_removed",
            (F.size("__lines") - F.size(F.split(F.col(out_col), re.escape(sep))))
            .cast("bigint"),
        )
        .drop("__lines")
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    min_line_chars: int = 4,
    out_col: str = "text_clean",
    sep: str = "\n",
) -> DataFrame:
    """CROSS-document boilerplate line removal (the C4/RefinedWeb
    cleaning rule :func:`dedup_lines` cannot express): a line that
    appears in >= ``min_docs`` DISTINCT documents is template chrome —
    navigation, cookie banners, footers — and is stripped from every
    document; lines shorter than ``min_line_chars`` (after trim) are
    exempt (blank separators and "1." style fragments would otherwise
    mass-trigger).  Emits ``out_col`` plus audit columns ``n_lines``
    and ``n_boiler`` (lines removed per document).

    Plan shape (the 100 TB shape): posexplode lines -> one hash
    aggregate on the trimmed line keyed by md5 (``count(distinct doc)``
    via a two-level (line, doc) pre-distinct, never a giant set) ->
    broadcast-or-shuffle join of the BOILERPLATE set back onto the
    exploded lines (the boilerplate set is tiny — lines crossing the
    doc threshold — so AQE broadcasts it) -> re-assemble per document
    with an order-preserving ``array_agg sort_array`` on the kept
    (pos, line) pairs.  Three narrow-keyed shuffles, all on uniform
    md5-ish keys; no driver materialization.

    No reference counterpart (LLM-pipeline extension surface; the rule
    is Raffel et al. 2020 §2.2's "citation/boilerplate" filter family
    re-expressed relationally)."""
    if out_col == text_col:
        # the NULL-id fallback reads the original text after base drops
        # out_col; Corpus.strip_boilerplate provides in-place semantics
        raise ValueError(
            "out_col must differ from text_col (use "
            "Corpus.strip_boilerplate for in-place replacement)"
        )
    # NULL text coalesces to '' so the document still emits its single
    # empty line and SURVIVES the rebuild join (a cleaning operator must
    # never delete rows; same NULL policy as dedup_lines)
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
    exploded = (
        df.select(F.col(id_col).alias("__doc"), F.posexplode(lines))
        .withColumnRenamed("pos", "__pos")
        .withColumnRenamed("col", "__line")
        .withColumn("__key", F.md5(F.trim(F.col("__line"))))
        .withColumn("__eligible", F.length(F.trim("__line")) >= min_line_chars)
    )
    boiler = (
        exploded.filter("__eligible")
        .select("__key", "__doc")
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__key", F.lit(True).alias("__boiler"))
    )
    kept = (
        exploded.join(boiler, "__key", "left")
        .withColumn(
            "__drop", F.col("__eligible") & F.coalesce("__boiler", F.lit(False))
        )
    )
    rebuilt = kept.groupBy("__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("__drop").cast("bigint")).alias("n_boiler"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"),
                            F.struct("__pos", F.col("__line").alias("l")),
                        )
                    )
                ),
                lambda s: s["l"],
            ),
        ).alias(out_col),
    )
    # REPLACE any pre-existing audit/output columns instead of stacking
    # a second copy (chaining after dedup_lines — which also emits
    # n_lines — would otherwise make the name ambiguous)
    base = df.drop(out_col, "n_lines", "n_boiler")
    # LEFT join back (ADVICE r10): a NULL doc id groups fine in the
    # rebuild but can never equi-join, so the inner form silently
    # deleted those rows — contradicting the never-delete policy above.
    # Unmatched rows pass through uncleaned: out_col falls back to the
    # original text (NULL text -> ''), audits to their trivial values.
    # Precondition for exact audits: id_col should be UNIQUE — duplicate
    # ids get one interleaved rebuild attached to every duplicate row
    # (run dedup_exact first if ids can repeat).
    joined = base.join(
        rebuilt.select(
            F.col("__doc").alias(id_col), out_col, "n_lines", "n_boiler"
        ),
        id_col,
        "left",
    )
    fallback_lines = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
    return (
        joined
        .withColumn(out_col, F.coalesce(out_col, F.coalesce(text_col, F.lit(""))))
        .withColumn(
            "n_lines",
            F.coalesce("n_lines", F.size(fallback_lines).cast("bigint")),
        )
        .withColumn("n_boiler", F.coalesce("n_boiler", F.lit(0).cast("bigint")))
    )


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold_frac: float = 0.0002,
    capacity: int | None = None,
) -> DataFrame:
    """Boilerplate-PHRASE mining: every whitespace token ``n``-gram at
    >= ``threshold_frac`` of all n-gram instances, with exact counts —
    the phrase-level twin of :func:`strip_boilerplate`'s line rule and
    the standard way to FIND the template chrome before deciding what
    to strip.  Composition: positional n-grams built natively
    (``transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))``
    — map-side, no Python), exploded, then
    :func:`..sketches.heavy_hitters` (per-partition Misra-Gries
    candidate superset + broadcast-semi exact count), so the n-gram
    space — quadratically larger than the vocabulary — never shuffles;
    only the candidates do."""
    from .sketches import heavy_hitters

    # sequence(1, 0) is DESCENDING [1, 0] in Spark, so short documents
    # must short-circuit to an empty gram array, not an empty sequence
    grams = (
        df.withColumn("__t", tokens(text_col))
        .select(
            F.explode(
                F.expr(
                    f"CASE WHEN size(__t) >= {n} THEN "
                    f"transform(sequence(1, size(__t) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(__t, i, {n}))) "
                    "ELSE array() END"
                )
            ).alias("gram")
        )
    )
    return heavy_hitters(
        grams, "gram", threshold_frac=threshold_frac, capacity=capacity
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    lowercase: bool = True,
) -> DataFrame:
    """Canonical text cleanup before tokenizing/hashing: strip control
    characters, collapse all whitespace runs to single spaces, trim, and
    (by default) lowercase.  Dedup signatures and quality features are
    only comparable across sources after this — two crawls of the same
    page differing in \\r\\n vs \\n or trailing tabs must hash
    identically.

    One native regexp chain per row, map-side at any scale.  (Unicode
    NFC normalization is deliberately NOT attempted: Spark SQL has no
    built-in normalizer, and a Python UDF in this hot path would cost
    more than it cleans — run NFC upstream at ingest if the corpus
    needs it.)
    """
    c = F.col(text_col)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)
