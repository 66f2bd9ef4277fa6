"""Deterministic sampling operators for training-data pipelines.

`rand()`-based sampling is useless in a data pipeline that must be
reproducible across runs, retries, partitionings, and engines — a task
retry would sample a different subset.  These operators derive the
sampling decision from **md5 of the row key**, so the same row always
makes the same decision everywhere (Spark and the DuckDB oracle compute
the identical integer from the identical bytes).

All decisions are map-side row-local predicates: no shuffle, no state,
perfect pushdown past the filter at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: 16^8 — the hash-uniform denominator: 8 md5 hex chars as an integer in
#: [0, 2^32), giving ~9.3e-10 rate granularity.
_U32 = float(1 << 32)


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform in [0, 1) from a key column: the first 8 md5
    hex chars as an integer over 2^32.  Engine-portable (DuckDB:
    ``('0x' || substr(md5(k), 1, 8))::BIGINT / 4294967296.0``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(_U32)
    )


def bernoulli_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep each row with probability ``rate``, decided by the row key's
    hash — reproducible under retries and repartitioning, unlike
    ``df.sample`` (whose seed interacts with partition layout)."""
    return df.filter(hash_uniform(F.col(key_col)) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with deterministic hash decisions:
    ``rates`` maps stratum value -> keep probability (e.g. downsample the
    dominant 'view' events, keep every 'error').  Rows in strata missing
    from ``rates`` use ``default_rate``.

    The predicate is a CASE over literal rates — fully map-side, pushed
    into the scan, zero shuffle at any corpus size.
    """
    u = hash_uniform(F.col(key_col))
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def quantile_band_filter(
    df: DataFrame,
    value_col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    by: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the [q_lo, q_hi]
    quantile band — per ``by`` group when given, else globally.  The
    outlier-trim every feature-based quality pipeline runs (drop the
    pathologically short and the pathologically long before training).

    One tiny exact-percentile aggregate (a handful of rows: one per
    group) broadcast back onto the corpus; the corpus itself never
    shuffles and the band predicate is map-side.  ``exact=False``
    swaps in ``percentile_approx`` — constant-size mergeable state per
    group, the fleet-scale default; the plan shape is identical.
    ``exact=True`` is the oracle-stable form (integer-valued columns
    make the interpolated bounds engine-exact, which sketches are not).
    """
    if not (0.0 <= q_lo <= q_hi <= 1.0):
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got ({q_lo}, {q_hi})")
    if exact:
        pcts = F.percentile(value_col, F.array(F.lit(q_lo), F.lit(q_hi)))
    else:
        # the fleet-scale form: constant-size mergeable sketch state per
        # group instead of a full sorted buffer; rank error bounded by
        # n/accuracy (same guarantee sketch_accuracy_report checks)
        pcts = F.percentile_approx(
            value_col, F.array(F.lit(q_lo), F.lit(q_hi)), accuracy
        )
    if by is not None:
        bounds = df.groupBy(by).agg(pcts.alias("__b"))
        joined = df.join(F.broadcast(bounds), by)
    else:
        bounds = df.agg(pcts.alias("__b"))
        joined = df.crossJoin(F.broadcast(bounds))
    v = F.col(value_col).cast("double")
    return (
        joined.filter((v >= F.col("__b")[0]) & (v <= F.col("__b")[1]))
        .drop("__b")
    )


def exact_sample(
    df: DataFrame, k: int, key_col: str = "doc_id", by: str | None = None
) -> DataFrame:
    """EXACTLY ``min(k, group size)`` rows per group (global when ``by``
    is None), selected by deterministic hash order of the row key — the
    fixed-budget complement of Bernoulli :func:`stratified_sample`
    (whose kept counts are only *expected* values).  Reproducible under
    retries, repartitioning, and engines, like every sampler here.

    Plan: per group, a rank window over (md5-int, key) — Spark inserts
    a partial WindowGroupLimit below the exchange for this frame shape,
    so only ~k rows per group cross the wire at any scale (same
    physical shape as topk_per_group).  The GLOBAL form (``by=None``)
    deliberately avoids an empty window partition (which would funnel
    every row through one task): it compiles to sort+limit, i.e.
    TakeOrderedAndProject — per-partition top-k heads merged on the
    driver, k rows total."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    if by is None:
        return (
            df.withColumn("__h", h)
            .orderBy("__h", key_col)
            .limit(k)
            .drop("__h")
        )
    w = Window.partitionBy(by).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
