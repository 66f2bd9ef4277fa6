"""Pressure-bin aggregation — reference ``bindata``
(ctd/processing.py:112-143).

Exact semantics being reproduced (SURVEY.md §2.3 O3/O4):

- per cast: ``start = ceil(first index value)``, ``stop = floor(last index
  value)`` — first/last in *row order*, not min/max;
- edges = ``arange(start, stop, delta)`` (stop excluded), intervals
  right-closed ``(e_j, e_{j+1}]`` (pandas ``cut`` default);
- ``method='average'``: mean per interval, **empty intervals kept as NULL
  rows** (``observed=False``), output index = left edge + delta/2;
- ``method='interpolate'``: ``np.interp(edges, index, values)`` — linear
  interpolation onto the edge grid itself, clamped to the boundary values
  outside the data range.

Plan shape (average): one window pass for first/last pressure, a hash
aggregate on (cast, bin) — map-side partial aggregation for free — and a
per-cast ``sequence``+``explode`` grid left-joined to preserve empty bins.
The grid is tiny (one row per bin per cast) so AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.operators._util import as_list, cast_window, value_columns
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


def _with_bin_bounds(df: DataFrame, by, order, pressure: str) -> DataFrame:
    """Attach per-cast start/stop/n_edges columns (single window pass)."""
    w_all = cast_window(by, order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = F.col(pressure).cast("double")
    # Direction-insensitive bounds: the reference reverses the upcast before
    # binning so its index always ascends; our split() keeps scan order
    # (deep-to-shallow on the up leg), so take least/greatest of the two
    # endpoint values.  Identical to first/last on a downcast.
    first_p = F.first(p).over(w_all)
    last_p = F.last(p).over(w_all)
    return (
        df.withColumn("__start", F.ceil(F.least(first_p, last_p)).cast("double"))
        .withColumn("__stop", F.floor(F.greatest(first_p, last_p)).cast("double"))
    )


def bindata(
    df: DataFrame,
    delta: float = 1.0,
    method: str = "average",
    cols=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
    exact_avg: bool = False,
) -> DataFrame:
    """Bin the physical index to a regular ``delta`` grid.

    Returns ``(by..., pressure, cols...)`` where ``pressure`` is the bin
    center (average) or the grid edge (interpolate); one row per bin per
    cast, empty bins NULL (average) — matching the reference exactly.

    ``exact_avg`` computes the bin mean through an order-independent
    DECIMAL(25,6) sum (bit-reproducible across partitionings / engines) at
    a small aggregation cost; default is the native float ``avg``.
    """
    if cols is not None and pressure in as_list(cols):
        msg = (
            f"bindata bins value columns against the index column "
            f"{pressure!r}; alias the channel first (e.g. withColumn) "
            f"instead of binning the index against itself."
        )
        raise ValueError(msg)
    if method == "average":
        return _bindata_average(df, delta, cols, by, order, pressure, exact_avg)
    if method == "interpolate":
        return _bindata_interpolate(df, delta, cols, by, order, pressure)
    msg = f"Expected method `average` or `interpolate`, but got {method}."
    raise ValueError(msg)


def _bindata_average(df, delta, cols, by, order, pressure, exact_avg=False) -> DataFrame:
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    delta = float(delta)

    if exact_avg:
        def _avg(c):
            return (
                F.sum(F.col(c).cast("double").cast("decimal(25,6)")).cast("double")
                / F.count(F.col(c).cast("double"))
            )
    else:
        def _avg(c):
            return F.avg(F.col(c).cast("double"))

    d = _with_bin_bounds(df, by, order, pressure)
    p = F.col(pressure).cast("double")
    # number of edges in arange(start, stop, delta): ceil((stop-start)/delta)
    n_edges = F.ceil((F.col("__stop") - F.col("__start")) / F.lit(delta)).cast("long")
    # right-closed interval index: p in (start + i*delta, start + (i+1)*delta]
    bin_idx = F.ceil((p - F.col("__start")) / F.lit(delta)).cast("long") - 1
    # The arithmetic form can misplace a point sitting within 1 ULP of an
    # edge (e.g. (2.2e-16 - -2.0) rounds to exactly 2.0, flipping the
    # ceil).  pd.cut decides by direct comparison against the edge values
    # (edges[k] = start + k*delta), so correct the index by comparing p to
    # its bin's edges the same way — at most one step off.
    d = d.withColumn("__nedges", n_edges).withColumn("__bin0", bin_idx)
    right = F.col("__start") + (F.col("__bin0") + 1) * F.lit(delta)
    left = F.col("__start") + F.col("__bin0") * F.lit(delta)
    corrected = (
        F.when(p > right, F.col("__bin0") + 1)
        .when(p <= left, F.col("__bin0") - 1)
        .otherwise(F.col("__bin0"))
    )
    d = d.withColumn("__bin", corrected).drop("__bin0")

    # Single-scan grid, array work on the REDUCED table only.  pd.cut
    # drops values outside the edge span, but the cast itself must
    # survive to anchor its empty-bin grid — so out-of-range rows fold
    # into a per-cast NULL-bin group instead of being filtered (at most
    # one extra group per cast), and the aggregate carries start/n_edges.
    # The empty-bin rows are then synthesized ON THE AGGREGATE OUTPUT
    # (one row per non-empty bin per cast): a previous formulation
    # exploded a grid/own struct array per FACT row, and the per-row
    # allocation + Generate cost ~5s on a 4.5M-row fleet vs <1s for the
    # plain grouped aggregate — the explode belongs above the reduction.
    # Exchanges: the groupBy's ClusteredDistribution(by, bin) and the
    # post-agg window's (by) are both satisfied by the bounds window's
    # hash(by) partitioning (key-subset rule) -> still ONE exchange for
    # the whole operator; the post-agg sort orders the tiny relation.
    in_range = (F.col("__bin") >= 0) & (F.col("__bin") <= F.col("__nedges") - 2)
    agged = d.groupBy(
        *by, F.when(in_range, F.col("__bin")).alias("__bin")
    ).agg(
        F.first("__start").alias("__start"),
        F.first("__nedges").alias("__nedges"),
        *[_avg(c).alias(c) for c in cols],
    )
    # collect_list rides the same (by, __bin) sort as row_number (whole-
    # partition frame on the ORDERED window) -> one post-agg sort, not two
    w_rn = Window.partitionBy(*by).orderBy(F.col("__bin").asc_nulls_first())
    w_all_bins = w_rn.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agged = agged.withColumn(
        "__present", F.collect_list("__bin").over(w_all_bins)
    ).withColumn("__rn", F.row_number().over(w_rn))
    struct_t = f"array<struct<b:bigint,{','.join(f'`{c}`:double' for c in cols)}>>"
    own = F.when(
        F.col("__bin").isNotNull(),
        F.array(
            F.struct(
                F.col("__bin").alias("b"),
                *[F.col(c).cast("double").alias(c) for c in cols],
            )
        ),
    ).otherwise(F.array().cast(struct_t))
    null_d = F.lit(None).cast("double")
    missing = F.when(
        (F.col("__rn") == 1) & (F.col("__nedges") >= 2),
        F.transform(
            F.array_except(
                F.sequence(F.lit(0).cast("long"), F.col("__nedges") - 2),
                F.col("__present"),
            ),
            lambda i: F.struct(i.alias("b"), *[null_d.alias(c) for c in cols]),
        ),
    ).otherwise(F.array().cast(struct_t))
    contribs = agged.select(
        *by, F.col("__start"), F.explode(F.concat(missing, own)).alias("__c")
    )
    center = F.col("__start") + (F.col("__c.b") + F.lit(0.5)) * F.lit(delta)
    return contribs.select(
        *by, center.alias(pressure), *[F.col(f"__c.{c}").alias(c) for c in cols]
    )


def _bindata_interpolate(df, delta, cols, by, order, pressure) -> DataFrame:
    """``np.interp`` onto the edge grid, expressed natively.

    Union the grid points with the data points, sort by pressure within a
    cast, and for every grid point take the nearest data point on each side
    via ignorenulls window last/first, then blend.  np.interp semantics:
    out-of-range grid points clamp to the edge data values; a grid point
    exactly on a data x returns that data value.  Data must be sorted by
    index (np.interp precondition — reference callers bin the *downcast*).

    This is a sort-within-cast + two window passes — no Python workers, no
    driver loop, and it scales to any number of casts.
    """
    by, order = as_list(by), as_list(order)
    cols = value_columns(df, cols, by, order, pressure)
    delta = float(delta)

    d = _with_bin_bounds(df, by, order, pressure)
    p = F.col(pressure).cast("double")
    data = d.select(
        *by,
        p.alias("__p"),
        F.lit(0).alias("__is_grid"),
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    n_edges = F.ceil((F.col("__stop") - F.col("__start")) / F.lit(delta)).cast("long")
    grid = (
        d.groupBy(*by)
        .agg(F.first("__start").alias("__start"), F.first(n_edges).alias("__n"))
        .filter(F.col("__n") >= 1)
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .select(
            *by,
            (F.col("__start") + F.col("__i") * F.lit(delta)).alias("__p"),
            F.lit(1).alias("__is_grid"),
            *[F.lit(None).cast("double").alias(c) for c in cols],
        )
    )
    # Sort data points before grid points at equal pressure so an exact-hit
    # grid point sees the data value as its "previous" neighbor.
    unioned = data.unionByName(grid)
    w = Window.partitionBy(*by).orderBy(F.col("__p"), F.col("__is_grid"))
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    out_cols = {}
    for c in cols:
        pair = F.when(
            F.col("__is_grid") == 0, F.struct(F.col("__p").alias("p"), F.col(c).alias("v"))
        )
        prev = F.last(pair, ignorenulls=True).over(w_prev)
        nxt = F.first(pair, ignorenulls=True).over(w_next)
        blended = F.when(prev.isNull(), nxt["v"]).when(nxt.isNull(), prev["v"]).when(
            nxt["p"] == prev["p"], prev["v"]
        ).otherwise(
            prev["v"]
            + (F.col("__p") - prev["p"]) * (nxt["v"] - prev["v"]) / (nxt["p"] - prev["p"])
        )
        out_cols[c] = blended
    return (
        unioned.withColumns(out_cols)
        .filter(F.col("__is_grid") == 1)
        .select(*by, F.col("__p").alias(pressure), *cols)
    )
