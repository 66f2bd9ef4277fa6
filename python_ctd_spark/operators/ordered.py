"""Ordered / positional operators — the heart of the reference
(SURVEY.md §2.3).  All are pure native Spark window expressions on
``Window.partitionBy(cast).orderBy(scan)``: JVM-side, codegen'd, no Python
workers, and they scale horizontally because one cast never spans
partitions and casts are small (<= ~1e5 rows, BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.operators._util import (
    as_list,
    cast_window,
    null_where,
    value_columns,
)
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


def split(
    df: DataFrame,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
    leg_col: str = "leg",
) -> DataFrame:
    """Tag each row as downcast or upcast.

    Reference ``split`` (ctd/processing.py:38-46) slices at
    ``index.argmax()+1`` — the *first* row attaining the maximum pressure
    ends the downcast (inclusive); everything after is the upcast, returned
    reversed.  Here the split is a ``leg`` column ('down'/'up') so both legs
    stay in one distributed frame; select + re-sort recovers either leg
    (the reversal is presentation-only — every downstream positional op
    re-sorts by its own order key).

    Plan: two stacked window functions over the same partitioning (single
    shuffle, no join): max pressure per cast, then min order-key among rows
    attaining it.  The windows carry the cast ORDER with an explicit
    whole-partition frame — same result as a partition-only window, but
    the required sort (cast, order) is shared with every downstream
    ordered operator, so a chain like split -> press_check -> bindata
    sorts ONCE (a bare partition-only window forces its own sort-by-key
    pass first; verified in the physical plan, tests/test_plans.py).
    """
    by, order = as_list(by), as_list(order)
    w_cast = cast_window(by, order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # first row (in scan order) attaining the cast's max pressure
    ord0 = order[0]
    df = df.withColumn("__maxp", F.max(pressure).over(w_cast))
    df = df.withColumn(
        "__split_at",
        F.min(F.when(F.col(pressure) == F.col("__maxp"), F.col(ord0))).over(w_cast),
    )
    leg = F.when(F.col(ord0) <= F.col("__split_at"), F.lit("down")).otherwise(F.lit("up"))
    return df.withColumn(leg_col, leg).drop("__maxp", "__split_at")


def press_check(
    df: DataFrame,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """NULL the value columns of rows caught in a pressure reversal.

    Reference ``press_check`` (ctd/processing.py:93-109) walks the cast
    marking row *i* iff ``pressure[i] < max(pressure[0..i-1])`` — i.e. a
    strict drop below the running maximum of *prior* rows (ties survive;
    the index itself is kept, values become NaN).  The sequential loop
    reduces exactly to a running-max window:

        run_max = max(pressure) OVER (cast ROWS UNBOUNDED PRECEDING TO -1)
        value   = CASE WHEN pressure < run_max THEN NULL ELSE value END

    (equivalence argued in SURVEY.md §2.3 O2 and property-tested against
    the reference loop in tests/test_ordered.py).
    """
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    w = cast_window(by, order).rowsBetween(Window.unboundedPreceding, -1)
    run_max = F.max(pressure).over(w)
    flag = F.col(pressure) < run_max  # NULL run_max (first row) -> false
    return df.withColumns({c: null_where(c, flag) for c in cols})


def movingaverage(
    df: DataFrame,
    window_size: int = 48,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
    suffix: str = "",
) -> DataFrame:
    """Centered boxcar moving average, zero-padded at the edges.

    Reference ``movingaverage`` (ctd/processing.py:243-262):
    ``np.convolve(x, ones(w)/w, 'same')`` — the edge values are the sum of
    the available samples divided by the *full* window size (zero padding),
    and any NaN inside the window poisons the output (NaN propagation).

    Native translation: frame ``ROWS BETWEEN -(w//2) AND w-w//2-1``
    (numpy 'same' centering for both odd and even w), ``sum(x)/w`` (NOT
    avg — avg divides by available rows and would break the zero-padding
    parity), and NULL when the frame contains any NULL value (count(x) <
    count(*)) to reproduce NaN propagation.
    """
    by, order = as_list(by), as_list(order)
    # pressure is the physical index, never a data channel: the reference
    # convolves only the data columns (ctd/processing.py:243-262).
    cols = value_columns(df, cols, by, order, pressure)
    w_int = int(window_size)
    frame = cast_window(by, order).rowsBetween(-(w_int // 2), w_int - w_int // 2 - 1)
    out = {}
    for c in cols:
        has_nan = F.count(c).over(frame) < F.count(F.lit(1)).over(frame)
        out[c + suffix] = F.when(has_nan, F.lit(None).cast("double")).otherwise(
            F.sum(F.col(c).cast("double")).over(frame) / F.lit(float(w_int))
        )
    return df.withColumns(out)


def ffill(
    df: DataFrame,
    cols=None,
    by=CAST_ID,
    order=SCAN,
) -> DataFrame:
    """Forward-fill NULLs within a cast (reference uses pandas ``ffill`` in
    the BTL reshape, ctd/read.py:294-295).

    ``last(x, ignorenulls=True) OVER (cast ROWS UNBOUNDED PRECEDING TO 0)``.
    """
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, None)
    w = cast_window(by, order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
    )


def interpolate_index(
    df: DataFrame,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Linear interpolation of NULLs against the physical index, interior
    only — the reference pipeline's
    ``.interpolate(method="index", limit_direction="both",
    limit_area="inside")`` step (README.md:52-54; pandas builtin).

    For each NULL row, fetch the nearest non-NULL neighbor on each side
    (value *and* its index) with ignorenulls window first/last over struct
    pairs, then blend linearly in index space.  Rows with a neighbor on one
    side only stay NULL (limit_area='inside'); non-NULL rows pass through.
    """
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    w_prev = cast_window(by, order).rowsBetween(Window.unboundedPreceding, 0)
    w_next = cast_window(by, order).rowsBetween(0, Window.unboundedFollowing)
    out = {}
    p = F.col(pressure).cast("double")
    for c in cols:
        x = F.col(c).cast("double")
        pair = F.when(x.isNotNull(), F.struct(p.alias("p"), x.alias("v")))
        prev = F.last(pair, ignorenulls=True).over(w_prev)
        nxt = F.first(pair, ignorenulls=True).over(w_next)
        interp = F.when(
            nxt["p"] == prev["p"], prev["v"]  # exact hit / repeated index
        ).otherwise(
            prev["v"] + (p - prev["p"]) * (nxt["v"] - prev["v"]) / (nxt["p"] - prev["p"])
        )
        out[c] = F.when(x.isNotNull(), x).otherwise(
            F.when(prev.isNotNull() & nxt.isNotNull(), interp)
        )
    return df.withColumns(out)


def cumsum(
    df: DataFrame,
    cols=None,
    by=CAST_ID,
    order=SCAN,
    suffix: str = "_cumsum",
) -> DataFrame:
    """Running sum per cast (reference: ``np.cumsum`` in section distance,
    ctd/extras.py:146,176)."""
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, None)
    w = cast_window(by, order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumns({c + suffix: F.sum(c).over(w) for c in cols})
