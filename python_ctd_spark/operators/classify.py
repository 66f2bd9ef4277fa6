"""Learned document-quality classifier (VERDICT r10 item 5): logistic
regression over cheap text features, trained DISTRIBUTED as DataFrame
aggregates — the same engine-portable integer-sum discipline as
``similarity._kmeans_centroids(exact=True)`` — and scored map-side.

Why this shape at 100 TB:

- **Features** are one native-expression projection per document
  (split/regex/filter passes staged through columns, map-side at any
  scale), quantized to BIGINT micro-units (``floor(f * 1e6 + 0.5)``)
  at extraction so every downstream step starts from identical
  integers in any engine.
- **Training** is ``iters`` passes of one global aggregate: per-row
  quantized residuals times quantized features, summed as BIGINTs —
  partial aggregation combines map-side, the shuffle carries
  ``n_features`` longs per partition, and the weight vector is tiny
  driver state (exactly like IVF centroids).  No MLlib, no RDDs, no
  per-row Python.
- **Determinism / oracle-exactness**: the squash is the RATIONAL
  "fast sigmoid" ``p = 0.5 + 0.5 * z / (1 + |z|)`` — only IEEE
  +,*,/,abs, so an independent SQL engine (the DuckDB oracle unrolls
  the same fixed-iteration loop) reproduces the weights EXACTLY; no
  ``exp()`` whose last-ulp differs across libms.  Integer gradient
  sums make the result independent of partitioning and row order.

No reference counterpart (LLM-pipeline extension surface; the
seed-classifier design follows the fastText/CCNet quality-filter
pattern re-expressed relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._util import WS_RE

#: feature names, index-aligned with the qf0..qfN quantized columns
FEATURES: list[str] = [
    "bias",
    "len_capped",        # least(n_tokens, 1000) / 1000
    "mean_tok_len",      # least(non-ws chars / n_tokens, 10) / 10
    "stop_ratio",        # english stopword hits / n_tokens
    "alpha_ratio",       # [A-Za-z] chars / chars
    "punct_ratio",       # non-alnum-non-ws chars / chars
    "distinct_ratio",    # distinct tokens / n_tokens
]

_SCALE = 1_000_000  # micro-unit feature quantization

# punctuation class spelled as EXPLICIT ASCII characters: Java's \s
# includes \x0B (vertical tab) while RE2's does not, so a bare \s here
# would silently break the bit-exact oracle contract on a \x0B byte —
# same discipline as text.PII_PATTERNS ("ASCII classes only")
_NON_PUNCT_CLASS = "[A-Za-z0-9 \\t\\n\\f\\r]"


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quantized feature columns ``qf0..qf6`` (BIGINT
    micro-units, :data:`FEATURES` order).  Bounded transforms keep every
    feature in [0, 1] so one learning rate fits all.  All-native
    expression chain; each split/regex pass stages through a projected
    column and runs once per row."""
    from .text import STOPWORDS

    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    t = F.coalesce(F.col(text_col), F.lit(""))
    lt = F.col("__lt")
    staged = df.withColumn(
        "__lt", F.split(F.trim(F.lower(t)), WS_RE)
    ).withColumns(
        {
            "__n_tok": F.size(F.col("__lt")).cast("double"),
            "__n_chars": F.length(t).cast("double"),
            "__n_nonws": F.length(
                F.regexp_replace(F.trim(t), WS_RE, "")
            ).cast("double"),
            "__n_alpha": F.length(
                F.regexp_replace(t, "[^A-Za-z]", "")
            ).cast("double"),
            "__n_punct": F.length(
                F.regexp_replace(t, _NON_PUNCT_CLASS, "")
            ).cast("double"),
            "__n_stop": F.size(
                F.filter(lt, lambda w: F.array_contains(en_stops, w))
            ).cast("double"),
            "__n_dist": F.size(F.array_distinct(lt)).cast("double"),
        }
    )
    n_tok = F.col("__n_tok")          # >= 1: split('') yields ['']
    chars = F.greatest(F.col("__n_chars"), F.lit(1.0))
    feats = [
        F.lit(1.0),
        F.least(n_tok, F.lit(1000.0)) / 1000.0,
        F.least(F.col("__n_nonws") / n_tok, F.lit(10.0)) / 10.0,
        F.col("__n_stop") / n_tok,
        F.col("__n_alpha") / chars,
        F.col("__n_punct") / chars,
        F.col("__n_dist") / n_tok,
    ]
    out = staged.withColumns(
        {
            f"qf{i}": F.floor(f * float(_SCALE) + F.lit(0.5)).cast("bigint")
            for i, f in enumerate(feats)
        }
    )
    return out.drop(
        "__lt", "__n_tok", "__n_chars", "__n_nonws",
        "__n_alpha", "__n_punct", "__n_stop", "__n_dist",
    )


# A committed serving configuration (FEATURES order): the weights the
# r11 fixture training produces on the sf0.01 seeds (good = the
# corpus's English prose, bad = md5-hex gibberish; iters=3, lr=5.0,
# floor-half-up rounded to 1e-6 — the exact vector the
# `quality_classifier` driver row reproduces).  Use it the way
# DEFAULT_MERGES serves BPE: a stored artifact for scoring paths that
# must not retrain.
DEMO_WEIGHTS: list[float] = [
    0.302199,    # bias
    0.14846,     # len_capped
    -1.343613,   # mean_tok_len
    0.189836,    # stop_ratio
    1.519984,    # alpha_ratio
    0.0,         # punct_ratio
    -1.169006,   # distinct_ratio
]


def _z_sql(weights: list[float]) -> str:
    """The margin expression ``(w0*qf0 + ... + wN*qfN) / 1e6`` with a
    FIXED left-to-right addition order and repr'd double literals —
    byte-identical arithmetic in Spark SQL and the DuckDB oracle."""
    terms = " + ".join(
        f"({w!r} * CAST(qf{i} AS DOUBLE))" for i, w in enumerate(weights)
    )
    return f"({terms}) / {float(_SCALE)!r}"


def _p_sql(z: str = "__z") -> str:
    """Rational fast sigmoid — IEEE-exact in every engine."""
    return f"0.5 + 0.5 * {z} / (1.0 + abs({z}))"


def train_quality_classifier(
    seed_good: DataFrame,
    seed_bad: DataFrame,
    text_col: str = "text",
    iters: int = 3,
    lr: float = 5.0,
) -> list[float]:
    """Train logistic-regression weights separating ``seed_good``
    (label 1) from ``seed_bad`` (label 0).  Fixed ``iters`` full-batch
    gradient steps from all-zero weights:

    per row:   z = w . qf / 1e6;  p = 0.5 + 0.5 z / (1 + |z|)
               r = floor((p - y) * 1e6 + 0.5)          (BIGINT)
    gradient:  g_i = SUM(r * qf_i)                     (BIGINT, exact)
    update:    w_i -= lr * (g_i / 1e12) / n_rows

    The quantized residual makes the gradient an exact integer sum —
    independent of partition layout — and every float step is a fixed
    sequence of IEEE ops, so an independent engine reproduces the
    weights bit-for-bit.  Each iteration is one scan of the (eagerly
    materialized) feature frame + a 7-long aggregate; driver state is
    the weight vector."""
    feats = (
        quality_features(seed_good, text_col).select(
            F.lit(1).cast("bigint").alias("y"),
            *[f"qf{i}" for i in range(len(FEATURES))],
        )
        .unionByName(
            quality_features(seed_bad, text_col).select(
                F.lit(0).cast("bigint").alias("y"),
                *[f"qf{i}" for i in range(len(FEATURES))],
            )
        )
        .localCheckpoint()
    )
    n_rows = feats.count()
    if n_rows == 0:
        raise ValueError("empty seed sets")
    w = [0.0] * len(FEATURES)
    for _ in range(int(iters)):
        staged = feats.selectExpr("y", f"{_z_sql(w)} AS __z",
                                  *[f"qf{i}" for i in range(len(FEATURES))])
        staged = staged.selectExpr(
            f"CAST(floor(({_p_sql()} - CAST(y AS DOUBLE)) * {float(_SCALE)!r}"
            " + 0.5) AS BIGINT) AS __r",
            *[f"qf{i}" for i in range(len(FEATURES))],
        )
        # per-row |r * qf| <= 1e12, so a BIGINT sum overflows int64 near
        # ~9e6 worst-case rows — nothing at fleet scale.  Sum in
        # DECIMAL(38,0) instead: exact to ~1e38 (supports ~1e26 rows),
        # and the DuckDB twin's SUM(BIGINT) promotes to HUGEINT, so the
        # two engines stay exact at every size instead of diverging at
        # the int64 boundary.
        g = staged.agg(
            *[F.sum(
                (F.col("__r") * F.col(f"qf{i}")).cast("decimal(38,0)")
            ).alias(f"g{i}") for i in range(len(FEATURES))]
        ).first()
        w = [
            w[i] - lr * (float(g[f"g{i}"]) / float(_SCALE * _SCALE)) / n_rows
            for i in range(len(FEATURES))
        ]
    return w


def score_quality_classifier(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Map-side scoring: the trained weights ride as literal
    coefficients (broadcast-free driver state, like IVF centroids);
    one projection per document, no shuffle."""
    scored = quality_features(df, text_col).withColumn(
        "__z", F.expr(_z_sql(list(weights)))
    )
    out = scored.withColumn(
        out_col, F.round(F.expr(_p_sql()), 6)
    )
    return out.drop("__z", *[f"qf{i}" for i in range(len(FEATURES))])
