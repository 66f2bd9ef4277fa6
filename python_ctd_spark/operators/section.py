"""Section (transect) operators — the distributed counterparts of the
reference's section post-processing (``ctd/extras.py:42-152``).

A *section* is a set of casts along a track.  In the engine it is a long
frame ``(section, station distance, depth, value)`` — the matrix shape
only ever exists inside a per-section ``applyInPandas`` group, where it
is tens of stations x thousands of levels: always task-sized, and
sections are embarrassingly parallel across a fleet (the same execution
model as the signal kernels, operators/signal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from python_ctd_spark.operators._util import as_list
from python_ctd_spark.schema import PRESSURE

SECTION_ID = "section_id"


def _pin(df: DataFrame, by: list) -> DataFrame:
    from python_ctd_spark.operators.signal import _pin_partitions

    return _pin_partitions(df, by)


def extrap_sec(
    df: DataFrame,
    value_col: str,
    by=SECTION_ID,
    dist_col: str = "distance_m",
    depth_col: str = PRESSURE,
    w1: float = 1.0,
    w2: float = 0.0,
) -> DataFrame:
    """Fill a section's shadow zone (reference ``extrap_sec``,
    ctd/extras.py:42-103) distributedly: per section, pivot the long frame
    to a (depth x station) matrix, run the horizontal/vertical
    interp-extrapolate blend, and melt back to long form.

    Input: ``(by..., dist_col, depth_col, value_col)`` long frame.
    Output: same shape with ``value_col`` filled; one row per
    (depth, station) grid cell of the section.
    """
    from python_ctd_spark.functions.extras_numpy import extrap_sec_kernel

    by = as_list(by)
    schema = T.StructType(
        [f for f in df.select(*by).schema.fields]
        + [
            T.StructField(dist_col, T.DoubleType()),
            T.StructField(depth_col, T.DoubleType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )

    def fn(pdf):
        import pandas as pd

        keys = pdf.iloc[0][by]
        mat = pdf.pivot_table(
            index=depth_col, columns=dist_col, values=value_col, aggfunc="mean",
            dropna=False,
        ).sort_index()
        dist = mat.columns.to_numpy(dtype=float)
        depth = mat.index.to_numpy(dtype=float)
        filled = extrap_sec_kernel(mat.to_numpy(dtype=float), dist, depth, w1, w2)
        out = pd.DataFrame(filled, index=depth, columns=dist).stack(dropna=False)
        out = out.rename(value_col).reset_index()
        out.columns = [depth_col, dist_col, value_col]
        for k in by:
            out[k] = keys[k]
        return out[[*by, dist_col, depth_col, value_col]]

    proj = df.select(
        *by,
        F.col(dist_col).cast("double").alias(dist_col),
        F.col(depth_col).cast("double").alias(depth_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    return _pin(proj, by).groupBy(*by).applyInPandas(fn, schema)


def gen_topomask(
    stations: DataFrame,
    by=SECTION_ID,
    h_col: str = "maxdepth",
    lon: str = "lon",
    lat: str = "lat",
    order_by: str | None = None,
    dx: float = 1.0,
    kind: str = "linear",
) -> DataFrame:
    """Topography mask per section (reference ``gen_topomask``,
    ctd/extras.py:106-152): stations (one row each, deepest-scan pressure
    ``h_col`` + position) -> regular ``dx``-km along-track grid of local
    depth [m].  Stations order by ``order_by`` (default: longitude, the
    reference's section ordering).

    Output: ``(by..., x_km, depth_m)`` — a handful of rows per km of
    transect, ready for the client to draw or for a range join against
    the section grid.
    """
    from python_ctd_spark.functions.extras_numpy import gen_topomask_kernel

    by = as_list(by)
    order_by = order_by or lon
    schema = T.StructType(
        [f for f in stations.select(*by).schema.fields]
        + [T.StructField("x_km", T.DoubleType()), T.StructField("depth_m", T.DoubleType())]
    )

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_by, kind="mergesort")
        xm, hm = gen_topomask_kernel(
            pdf[h_col].to_numpy(dtype=float),
            pdf[lon].to_numpy(dtype=float),
            pdf[lat].to_numpy(dtype=float),
            dx=dx,
            kind=kind,
        )
        out = pd.DataFrame({"x_km": xm, "depth_m": hm})
        keys = pdf.iloc[0][by]
        for k in by:
            out[k] = keys[k]
        return out[[*by, "x_km", "depth_m"]]

    cols = {order_by, h_col, lon, lat}
    proj = stations.select(*by, *sorted(cols))
    return _pin(proj, by).groupBy(*by).applyInPandas(fn, schema)


def station_maxdepths(
    df: DataFrame,
    by=SECTION_ID,
    cast: str = "cast_id",
    pressure: str = PRESSURE,
) -> DataFrame:
    """Deepest scan per station — the ``h`` input of :func:`gen_topomask`
    (reference ``get_maxdepth``, ctd/extras.py:36-39, per cast)."""
    by = as_list(by)
    return df.groupBy(*by, cast).agg(F.max(F.col(pressure)).alias("maxdepth"))
