"""Signal-processing operators: despike, lp_filter, smooth
(reference ctd/processing.py:49-240, SURVEY.md §2.3 O5-O7).

Two execution tiers per operator:

- **native** (default where exact): pure window expressions, JVM-side,
  whole-stage-codegen, no Python workers.  ``despike`` is *exactly*
  expressible natively — forward-frame mean/stddev_pop plus a
  forward-fill of the last complete window's stats reproduces the
  reference's tail-padding rule bit-for-bit (modulo float summation
  order), so the scale path and the parity path are the same plan.
- **applyInPandas** (per-cast, Arrow-batched) where the kernel is
  inherently sequential (``lp_filter``'s forward+backward IIR) or needs
  whole-series edge reflection (``smooth``).  One cast per group; casts
  are <= ~1e5 rows (BASELINE.md) so a group always fits a task, and the
  work is embarrassingly parallel across casts — exactly how 100 TB of
  casts should be processed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.operators._util import as_list, cast_window, null_where, value_columns
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


def _pin_partitions(df: DataFrame, by: list) -> DataFrame:
    """Hash-partition by cast with an *explicit* partition count (the
    session's shuffle parallelism).  A bare ``repartition(*by)`` is a
    non-user-specified shuffle, so AQE's coalescer is free to merge the
    tiny post-shuffle blocks into a couple of tasks — correct for JVM
    stages, but it serializes the CPU-bound Python stage that follows
    (measured: 2 tasks instead of 32 on local[32], 1.5x slower).  An
    explicit count is exempt from coalescing and keeps the pandas
    workers busy; the following groupBy.applyInPandas reuses the
    partitioning (one exchange total)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *by)


# ---------------------------------------------------------------------------
# despike — native, exact
# ---------------------------------------------------------------------------

def despike(
    df: DataFrame,
    n1: float = 2,
    n2: float = 20,
    block: int = 100,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Sea-Bird Wild-Edit despike (reference ctd/processing.py:146-194).

    Semantics: rolling *forward* window of ``block`` rows; positions past
    the last complete window reuse that window's stats
    (``np.r_[std, tile(std[-1], block-1)]``); population std, NaN-aware.
    Pass 1 NULLs values beyond ``n1*std``; pass 2 recomputes stats on the
    cleaned series and flags the *original* values beyond ``n2*std``.

    Native plan per pass: ``avg/stddev_pop OVER (ROWS 0 TO block-1)``
    gated to rows that still have a complete window, then
    ``last(stats, ignorenulls)`` forward-fills the final ``block-1`` rows
    with the last complete window's stats.  NULL std/mean (all-NULL
    window) -> comparison NULL -> row kept, matching the masked-array
    fill behavior.
    """
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    w_ord = cast_window(by, order)
    w_fwd = w_ord.rowsBetween(0, block - 1)
    w_fill = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    # whole-partition frame on the ORDERED window (not a bare
    # partition-only one) so the cast count shares the single sort with
    # the rolling frames — see split() and tests/test_plans.py
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    df = df.withColumn("__rn", F.row_number().over(w_ord) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    full = F.col("__rn") <= F.col("__n") - block  # rows owning a complete window

    out = df
    for c in cols:
        x = F.col(c).cast("double")
        # pass 1
        s1 = F.when(
            full,
            F.struct(
                F.avg(x).over(w_fwd).alias("m"),
                F.stddev_pop(x).over(w_fwd).alias("s"),
            ),
        )
        st1 = F.last(s1, ignorenulls=True).over(w_fill)
        flag1 = F.abs(x - st1["m"]) > F.lit(float(n1)) * st1["s"]
        out = out.withColumn(f"__c1_{c}", F.when(flag1, F.lit(None).cast("double")).otherwise(x))
        # pass 2: stats over the cleaned column, flag the ORIGINAL values
        x1 = F.col(f"__c1_{c}")
        s2 = F.when(
            full,
            F.struct(
                F.avg(x1).over(w_fwd).alias("m"),
                F.stddev_pop(x1).over(w_fwd).alias("s"),
            ),
        )
        st2 = F.last(s2, ignorenulls=True).over(w_fill)
        flag2 = F.abs(x - st2["m"]) > F.lit(float(n2)) * st2["s"]
        out = out.withColumn(c, null_where(c, flag2)).drop(f"__c1_{c}")
    return out.drop("__rn", "__n")


def despike_udf(
    df: DataFrame,
    n1: float = 2,
    n2: float = 20,
    block: int = 100,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Bit-exact reference despike via per-cast grouped-map pandas UDF
    (same NumPy kernel, stride-tricks rolling window).  Used for parity
    validation of the native plan; the native version is the scale path."""
    from python_ctd_spark.functions.signal_numpy import despike_kernel

    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    schema = df.schema

    def fn(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        for c in cols:
            pdf[c] = despike_kernel(pdf[c].to_numpy(), n1=n1, n2=n2, block=block)
        return pdf

    return _pin_partitions(df, by).groupBy(*by).applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# lp_filter — sequential IIR, applyInPandas
# ---------------------------------------------------------------------------

def lp_filter(
    df: DataFrame,
    sample_rate: float = 24.0,
    time_constant: float = 0.15,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Zero-phase order-2 Butterworth low-pass of the *pressure* channel
    (reference ctd/processing.py:49-90 filters the index).

    ``Wn = (1/time_constant) / (sample_rate * 2)``; forward+backward IIR
    (filtfilt) is irreducibly sequential in both directions -> per-cast
    ``applyInPandas`` with the pure-NumPy kernel.  ``cols`` may widen the
    filter to other channels; default matches the reference (index only).
    """
    from python_ctd_spark.functions.signal_numpy import butter2_lowpass, filtfilt2

    by, order = as_list(by), as_list(order)
    target_cols = as_list(cols) if cols is not None else [pressure]
    wn = (1.0 / time_constant) / (sample_rate * 2.0)
    schema = df.schema

    def fn(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        b, a = butter2_lowpass(wn)
        padlen = 3 * max(len(a), len(b))
        # Casts too short to pad pass through unchanged — same documented
        # short-series policy as despike_kernel/smooth_kernel; raising here
        # would abort the whole distributed job for one stub cast.
        if len(pdf) > padlen:
            for c in target_cols:
                pdf[c] = filtfilt2(b, a, pdf[c].to_numpy())
        return pdf

    return _pin_partitions(df, by).groupBy(*by).applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# smooth — reflect-padded convolution
# ---------------------------------------------------------------------------

def smooth(
    df: DataFrame,
    window_len: int = 11,
    window: str = "hanning",
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Exact reference smoothing (ctd/processing.py:197-240): normalized
    flat/hanning/hamming/bartlett/blackman kernel, pivot-reflect padding at
    both ends.  The padding needs the first/last ``window_len`` values of
    the whole cast -> per-cast ``applyInPandas`` for exactness.  For a
    JVM-only approximation away from the edges use :func:`smooth_native`.
    """
    from python_ctd_spark.functions.signal_numpy import smooth_kernel

    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    schema = df.schema

    def fn(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        for c in cols:
            pdf[c] = smooth_kernel(pdf[c].to_numpy(), window_len, window)
        return pdf

    return _pin_partitions(df, by).groupBy(*by).applyInPandas(fn, schema=schema)


def smooth_native(
    df: DataFrame,
    window_len: int = 11,
    window: str = "hanning",
    cols=None,
    by=CAST_ID,
    order=SCAN,
    suffix: str = "",
) -> DataFrame:
    """JVM-native windowed smoothing: identical kernel weights, but edge
    rows renormalize over the available samples instead of reflecting
    (``sum(w_j * x_j) / sum(w_j available)``).  Interior rows (> window_len
    from either end) are numerically identical to :func:`smooth`.  100 %
    whole-stage-codegen — this is the default at scale where edge rows are
    a vanishing fraction of a cast.
    """
    from python_ctd_spark.functions.signal_numpy import window_weights

    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, None)
    if window_len < 3:
        return df
    weights = window_weights(window, window_len)
    c_off = (window_len - 1) // 2  # numpy 'same' centering
    w_ord = cast_window(by, order)
    out = {}
    for c in cols:
        terms = []
        norms = []
        for j, wt in enumerate(weights):
            d = j - c_off
            xj = F.lag(F.col(c).cast("double"), -d).over(w_ord) if d != 0 else F.col(c).cast("double")
            terms.append(F.coalesce(xj * F.lit(float(wt)), F.lit(0.0)))
            norms.append(F.when(xj.isNotNull(), F.lit(float(wt))).otherwise(F.lit(0.0)))
        num = terms[0]
        for t in terms[1:]:
            num = num + t
        den = norms[0]
        for t in norms[1:]:
            den = den + t
        out[c + suffix] = F.when(den > 0, num / den)
    return df.withColumns(out)
