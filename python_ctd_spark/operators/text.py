"""Text-analysis operators for training-data pipelines — all native
string/array functions (JVM, codegen), no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "that", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "por", "un", "con"],
    "fr": ["le", "la", "de", "et", "que", "les", "des", "pour", "dans", "une"],
}


def tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col)).cast("bigint")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-flavored token estimate: count regex word pieces + digits +
    punctuation marks (a cheap, deterministic stand-in for a real BPE
    vocab; ~chars/4 for English).  Uses one regexp pass."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces).cast("bigint")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + a composite score:
    length, alpha ratio, punctuation density, stopword ratio, mean token
    length, repetition (distinct/total tokens)."""
    toks = tokens(text_col)
    lower_toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", "")).cast("double")
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(lower_toks, lambda t: F.array_contains(en_stops, t))).cast(
        "double"
    )
    distinct_ratio = F.size(F.array_distinct(lower_toks)).cast("double") / n_tok
    score = (
        F.lit(0.25) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * (alpha / n_chars)
        + F.lit(0.2) * F.least(stop_hits / n_tok * F.lit(5.0), F.lit(1.0))
        + F.lit(0.2) * distinct_ratio
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct / n_chars * F.lit(10.0), F.lit(1.0)))
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "alpha_ratio": alpha / n_chars,
            "punct_ratio": punct / n_chars,
            "stopword_ratio": stop_hits / n_tok,
            "distinct_token_ratio": distinct_ratio,
            "quality": F.round(score, 6),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-hit language identification (en/es/fr heuristic): count
    tokens appearing in each language's stopword list, argmax with a
    fixed precedence for ties."""
    lower_toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hits = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(lower_toks, lambda t: F.array_contains(arr, t)))
    pred = (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]), F.lit("en"))
        .when(hits["es"] >= hits["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumns(
        {f"hits_{lg}": c.cast("bigint") for lg, c in hits.items()}
    ).withColumn(out_col, pred)


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
