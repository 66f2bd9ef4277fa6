"""Sketch aggregates for 100 TB-scale summaries: HyperLogLog++ distinct
counts and t-digest-style approximate percentiles.

At corpus scale the exact forms stop being an option: exact distinct
counts shuffle every distinct value, and exact percentiles materialize
per-group value arrays.  The sketch forms aggregate into O(KB)
mergeable state per group — constant-size partial aggregates over any
row count — at a declared, testable accuracy:

- ``approx_count_distinct(col, rsd)`` — HLL++ with relative standard
  deviation ``rsd`` (~1.04/sqrt(2^p)); error is ~normal, so 3*rsd is a
  practical hard bound.
- ``percentile_approx(col, p, accuracy)`` — guarantees *rank* error at
  most ``1/accuracy`` of the group size.

``sketch_accuracy_report`` turns those promises into data: it runs the
sketch and its exact twin side by side and emits per-group booleans —
the self-checking form the driver query uses (the oracle asserts the
exact columns and that every bound holds).  Run it on a sample before
trusting a sketch configuration on a new distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._util import WS_RE

# heavy_hitters candidate sets above this row count stop being hinted
# broadcast (a 10k-partition corpus at capacity 10k is 100M candidate
# strings — past any healthy broadcast) and flow through a shuffled
# semi join instead; both paths keep the value space off the driver
_BROADCAST_CAND_MAX = 2_000_000


def approx_corpus_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    rsd: float = 0.05,
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group corpus summary in one sketch pass: doc count, HLL++
    distinct-content estimate, and approximate token-count percentiles.
    This is the 100 TB form of ``domain_stats`` — every aggregate is
    constant-size mergeable state."""
    nt = F.size(F.split(F.trim(F.col(text_col)), WS_RE)).cast("double")
    staged = df.select(group_col, F.col(text_col).alias("__t"), nt.alias("__nt"))
    return staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("__t", rsd).alias("approx_distinct_texts"),
        F.percentile_approx("__nt", F.array(F.lit(0.5), F.lit(0.9)), accuracy).alias(
            "approx_token_pcts"
        ),
    )


def sketch_accuracy_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    rsd: float = 0.05,
    accuracy: int = 1000,
) -> DataFrame:
    """Sketches vs their exact twins, reduced to per-group verdicts.

    Emits ``(group, n_docs, exact_distinct_texts, hll_ok, p50_ok,
    p90_ok)`` where ``hll_ok`` = HLL++ estimate within 3*rsd of the
    exact distinct count, and ``pXX_ok`` = the approximate percentile's
    *rank* lies within ``n/accuracy`` positions of the target rank (the
    documented guarantee, checked against the exact sorted order via
    counts of values <= the approximate answer).  Exact columns and
    verdicts are engine-reproducible, so the whole report is
    oracle-checkable even though sketch internals are not.
    """
    nt = F.size(F.split(F.trim(F.col(text_col)), WS_RE)).cast("double")
    staged = df.select(group_col, F.col(text_col).alias("__t"), nt.alias("__nt"))
    agg = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__t").alias("exact_distinct_texts"),
        F.approx_count_distinct("__t", rsd).alias("__hll"),
        F.percentile_approx("__nt", F.array(F.lit(0.5), F.lit(0.9)), accuracy).alias(
            "__apx"
        ),
        F.sort_array(F.collect_list("__nt")).alias("__vals"),
    )
    n = F.col("n_docs").cast("double")
    rank_tol = n / accuracy + F.lit(1.0)

    def rank_ok(p: float, i: int):
        # with ties the returned value occupies a rank INTERVAL
        # [#(v < apx) + 1, #(v <= apx)]; the guarantee holds if that
        # interval overlaps [p*n - tol, p*n + tol]
        apx = F.col("__apx")[i]
        lo = F.size(F.filter(F.col("__vals"), lambda v: v < apx)).cast("double") + 1
        hi = F.size(F.filter(F.col("__vals"), lambda v: v <= apx)).cast("double")
        return (lo <= p * n + rank_tol) & (hi >= p * n - rank_tol)

    hll_err = F.abs(F.col("__hll") - F.col("exact_distinct_texts")) / F.col(
        "exact_distinct_texts"
    ).cast("double")
    return agg.select(
        group_col,
        "n_docs",
        "exact_distinct_texts",
        (hll_err <= 3 * rsd).alias("hll_ok"),
        rank_ok(0.5, 0).alias("p50_ok"),
        rank_ok(0.9, 1).alias("p90_ok"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float = 0.01,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT frequent items with a bounded-shuffle plan (the two-pass
    Misra-Gries scheme; Agarwal et al. 2013 "Mergeable Summaries"
    prove the per-partition summaries preserve the frequency
    guarantee): returns every value of ``col`` whose frequency is
    >= ``threshold_frac`` of the total row count, with its EXACT count
    and fraction — ``(value, n, frac)``.

    Why not a plain groupBy: at 100 TB the full value set (token
    vocabulary, URLs, n-grams) is billions of distinct keys, and the
    exact groupBy shuffles ALL of them to find the handful above 1%.
    Plan here:

    1. **candidates** — one ``mapInPandas`` pass runs a Misra-Gries
       summary of ``capacity`` counters PER INPUT PARTITION (no
       shuffle; O(capacity) state per task).  MG guarantees any value
       with partition frequency >= partition_rows/(capacity+1) survives
       that partition's summary; a value at global frequency f*n must
       exceed that bar in at least one partition, so with
       ``capacity >= 2/threshold_frac`` (the default) the UNION of
       per-partition candidates is a SUPERSET of the true heavy
       hitters.  The union is tiny: <= n_partitions x capacity rows.
    2. **exact pass** — count ONLY the candidates (broadcast semi
       join, map-side pre-aggregation on a key set bounded by step 1)
       and filter by the exact threshold.  Output is exact, so the
       approximation never reaches the caller — it only prunes the
       shuffle.

    Deterministic for the ORACLE regardless of partitioning: step 1's
    candidate set varies with partition layout, but it is always a
    superset of the true answer and step 2 is exact, so the final rows
    are partition-invariant (test-pinned).

    Two scans total: the candidate pass ALSO emits each partition's row
    count (one sentinel row per partition), so the threshold total needs
    no third ``count()`` job.  The summary is materialized ON THE
    EXECUTORS (``localCheckpoint``, <= partitions x (capacity + 1)
    rows); the driver fetches only the scalar total — never the
    candidate strings (ADVICE r10: partitions x capacity long n-grams
    in a Python list would OOM the driver at fleet scale).  The exact
    pass broadcasts the candidate frame while it is broadcast-sized
    (<= ``_BROADCAST_CAND_MAX`` rows, counted from the checkpointed
    summary for free) and falls back to a shuffled semi join above
    that — bounded either way.

    NULL semantics: NULL values of ``col`` are excluded BEFORE
    counting, so ``frac`` is relative to the non-NULL row count and
    NULL is never a reportable value (a NULL can neither survive the
    candidate pass nor match the semi join, so counting it in the
    denominator would only deflate every frac — ADVICE r10).

    A caller-supplied ``capacity`` below ``ceil(1/threshold_frac)`` is
    CLAMPED up to it: below that the per-partition survival bar exceeds
    the threshold and the superset guarantee — the whole exactness
    claim — would silently break."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    if threshold_frac <= 0.0:
        raise ValueError("threshold_frac must be > 0 (a zero threshold "
                         "means 'every distinct value' — use a plain "
                         "groupBy, there is nothing to prune)")
    guarantee_floor = int(math.ceil(1.0 / threshold_frac))
    if capacity is None:
        capacity = max(8, int(2.0 / threshold_frac))
    capacity = max(capacity, guarantee_floor)

    def _mg(batches):
        # weighted Misra-Gries (the mergeable-summaries form): fold each
        # Arrow batch's EXACT value_counts (vectorized) into the summary,
        # then prune back to `capacity` by subtracting the (capacity+1)-th
        # largest count — Python work is O(distinct per batch + capacity),
        # never O(rows)
        from collections import Counter

        agg: Counter = Counter()
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)  # ALL rows, matching a SQL COUNT(*) total
            for v, c in pdf["v"].value_counts().items():
                agg[v] += int(c)
            if len(agg) > capacity:
                m = sorted(agg.values(), reverse=True)[capacity]
                agg = Counter(
                    {k: c - m for k, c in agg.items() if c - m > 0}
                )
        # one sentinel row (v=NULL) carries the partition's row count so
        # the caller never needs a separate count() scan
        yield pd.DataFrame(
            {"v": list(agg.keys()) + [None],
             "pn": [0] * len(agg) + [n_rows]}
        )

    staged = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # summary materializes on the EXECUTORS; lineage is truncated so the
    # corpus is scanned exactly once for candidates + totals
    summary = staged.mapInPandas(
        _mg,
        T.StructType(
            [T.StructField("v", T.StringType()),
             T.StructField("pn", T.LongType())]
        ),
    ).localCheckpoint()
    # only SCALARS reach the driver: the row total and the candidate count
    total = summary.filter(F.col("v").isNull()).agg(
        F.coalesce(F.sum("pn"), F.lit(0))
    ).first()[0]
    cands = summary.filter(F.col("v").isNotNull()).select("v").distinct()
    n_cands = cands.count()
    cand_side = F.broadcast(cands) if n_cands <= _BROADCAST_CAND_MAX else cands
    # same double product + ceil as a SQL `ceil(frac * n)` twin computes
    floor = math.ceil(threshold_frac * total) if total else 0
    counted = (
        staged
        .join(cand_side, "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(max(floor, 1)))
    )
    return counted.select(
        F.col("v").alias("value"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.lit(total).cast("double"), 6).alias("frac"),
    )


def heavy_hitters_by_group(
    df: DataFrame,
    col: str,
    group_col: str,
    threshold_frac: float = 0.01,
    capacity: int | None = None,
) -> DataFrame:
    """Per-GROUP exact heavy hitters (``(group, value, n, frac)`` with
    frac relative to the group's row count) — the per-domain form of
    :func:`heavy_hitters`, the decision input for per-domain cleaning
    (a token that is chrome in one crawl is content in another).

    Same two-pass shape: the candidate pass keeps an independent
    Misra-Gries summary PER GROUP per partition (state is
    O(groups_in_partition x capacity) — domains are few by
    construction) and emits each group's per-partition row count as a
    sentinel row (v=NULL), so per-group totals cost no extra scan; the
    exact pass counts only the (group, value) candidates against the
    broadcast totals.  Output exact and partition-invariant; no
    full-vocabulary shuffle.  As in :func:`heavy_hitters`, the summary
    stays on the executors (``localCheckpoint``) — the driver never
    sees the candidate strings — and the candidate join demotes from
    broadcast to shuffled semi above ``_BROADCAST_CAND_MAX`` rows.

    NULL semantics (ADVICE r10): rows with a NULL value OR a NULL group
    key are excluded before counting — ``frac`` is relative to the
    group's non-NULL row count, and neither a NULL value nor a NULL
    group is ever reported.

    ``capacity`` is clamped to ``ceil(1/threshold_frac)`` — below that
    the superset guarantee (and so the exactness claim) would silently
    break."""
    import math

    import pandas as pd
    from pyspark.sql import types as T

    if threshold_frac <= 0.0:
        raise ValueError("threshold_frac must be > 0")
    if capacity is None:
        capacity = max(8, int(2.0 / threshold_frac))
    capacity = max(capacity, int(math.ceil(1.0 / threshold_frac)))

    def _mg(batches):
        from collections import Counter

        per_group: dict = {}
        group_rows: dict = {}
        for pdf in batches:
            sizes = pdf.groupby("g", sort=False).size()
            for g, c in sizes.items():
                group_rows[g] = group_rows.get(g, 0) + int(c)
            counts = pdf.groupby("g", sort=False)["v"].value_counts()
            for (g, v), c in counts.items():
                agg = per_group.setdefault(g, Counter())
                agg[v] += int(c)
            for g, agg in per_group.items():
                if len(agg) > capacity:
                    m = sorted(agg.values(), reverse=True)[capacity]
                    per_group[g] = Counter(
                        {k: c - m for k, c in agg.items() if c - m > 0}
                    )
        rows = [(g, v, 0) for g, agg in per_group.items() for v in agg]
        rows += [(g, None, n) for g, n in group_rows.items()]
        yield pd.DataFrame(rows, columns=["g", "v", "pn"])

    staged = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(col).cast("string").alias("v"),
    ).filter(F.col("g").isNotNull() & F.col("v").isNotNull())
    summary = staged.mapInPandas(
        _mg,
        T.StructType(
            [T.StructField("g", T.StringType()),
             T.StructField("v", T.StringType()),
             T.StructField("pn", T.LongType())]
        ),
    ).localCheckpoint()
    totals = (
        summary.filter(F.col("v").isNull())
        .groupBy("g")
        .agg(F.sum("pn").alias("__total"))
    )
    cands = summary.filter(F.col("v").isNotNull()).select("g", "v").distinct()
    n_cands = cands.count()
    cand_side = F.broadcast(cands) if n_cands <= _BROADCAST_CAND_MAX else cands
    counted = (
        staged.join(cand_side, ["g", "v"], "left_semi")
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(totals), "g")
        .filter(
            F.col("n")
            >= F.greatest(
                F.ceil(F.lit(threshold_frac) * F.col("__total")), F.lit(1)
            )
        )
    )
    return counted.select(
        F.col("g").alias(group_col),
        F.col("v").alias("value"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("__total").cast("double"), 6).alias("frac"),
    )


def _cm_bucket(col: str, j: int, width: int):
    """The CM cell for hash row ``j``: md5-derived (engine-portable,
    same family as the MinHash oracle), salted with the row index.
    SHARED by build and probe — the never-undercount guarantee holds
    only while both compute identical buckets."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col(col))), 1, 15),
            16, 10,
        ).cast("bigint") % width
    )


def count_min_table(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch of ``col`` as a (j, b, c) counter table — the
    mergeable point-frequency summary (Cormode & Muthukrishnan 2005)
    that answers "how often does ANY value occur" in ``depth x width``
    integers, where :func:`heavy_hitters` only reports values above a
    threshold.  Estimates never undercount; overcount is bounded by
    ~(e/width) * N per row with probability ~1 - exp(-depth).

    Plan (the 100 TB shape): each row expands to its ``depth``
    (row, bucket) pairs NATIVELY (md5-derived bucket per hash row — the
    same engine-portable hash family as the MinHash oracle) and one
    hash aggregate reduces them; the shuffle key space is bounded by
    ``depth x width`` REGARDLESS of corpus size, so the wire carries at
    most that many partial counts per partition — a CM sketch is a
    linear sketch, and a groupBy over its cells IS the merge.  NULLs
    are excluded (never representable in a point query), matching
    :func:`heavy_hitters`."""
    staged = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    pairs = F.array(*[
        F.struct(F.lit(j).alias("j"), _cm_bucket("v", j, width).alias("b"))
        for j in range(depth)
    ])
    return (
        staged.select(F.explode(pairs).alias("p"))
        .select(F.col("p.j").alias("j"), F.col("p.b").alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_estimate(
    cms: DataFrame,
    probes: DataFrame,
    col: str = "value",
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` against a stored
    :func:`count_min_table`: per probe, the MIN over its ``depth``
    counters (an absent cell reads 0 — LEFT join).  The sketch table is
    <= depth x width rows, so it broadcasts; probing is a map-side
    expansion + one per-value min aggregate.  Returns ``(value, est)``
    with the CM guarantee ``est >= true count`` (deterministic, not
    probabilistic — test-pinned)."""
    staged = probes.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    ).distinct()
    pairs = F.array(*[
        F.struct(F.lit(j).alias("j"), _cm_bucket("value", j, width).alias("b"))
        for j in range(depth)
    ])
    exploded = staged.select("value", F.explode(pairs).alias("p")).select(
        "value", F.col("p.j").alias("j"), F.col("p.b").alias("b")
    )
    return (
        exploded.join(F.broadcast(cms), ["j", "b"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("est"))
    )
