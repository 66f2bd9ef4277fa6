"""Presentation layer (reference ``ctd/plotting.py`` + the section plots
of ``ctd/extras.py:106-259``, SURVEY.md §2.8).

Split exactly as the survey prescribes: the **engine** computes everything
that scales with data — per-cast ordered collection, along-transect
distances (haversine + cumulative sum, pure window arithmetic), the
section matrix in long form — and the **client** (matplotlib) only draws
the final, small result.  matplotlib is not a dependency of the engine;
the draw functions gate on an import-try and raise a clear error.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.functions.teos10 import distance_col
from python_ctd_spark.operators._util import as_list
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


def _mpl():
    try:
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "matplotlib is required for the draw functions; the engine-side "
            "helpers (cast_to_pandas, section_distances, section_long) work "
            "without it"
        ) from exc
    return plt


def cast_to_pandas(
    df: DataFrame,
    cast_id=None,
    by=CAST_ID,
    order=SCAN,
    pressure: str = PRESSURE,
) -> pd.DataFrame:
    """Collect one cast in scan order as a pandas DataFrame indexed by the
    physical coordinate — the reference's cast shape
    (``ctd/plotting.py:12-58`` plots y = index, inverted axis)."""
    by, order = as_list(by), as_list(order)
    if cast_id is not None:
        df = df.filter(F.col(by[0]) == F.lit(cast_id))
    pdf = df.orderBy(*by, *order).toPandas()
    return pdf.set_index(pressure)


def section_distances(
    meta: DataFrame,
    by: str = CAST_ID,
    lon: str = "lon",
    lat: str = "lat",
    order_by: str | None = None,
    cruise: str | None = None,
) -> DataFrame:
    """Along-transect cumulative distance [m] per station.

    Stations are ordered by ``order_by`` (default: longitude, the
    reference's section ordering, ctd/extras.py:170-176); distance is the
    haversine between successive stations accumulated with a running-sum
    window — ``gsw.distance(...).cumsum()`` re-expressed as lag + sum.
    ``cruise`` partitions the fleet so each transect orders independently;
    station counts per cruise are small, so the per-partition window is
    cheap even with millions of cruises.
    """
    keys = [cruise] if cruise else []
    order_by = order_by or lon
    w = Window.partitionBy(*keys).orderBy(F.col(order_by), F.col(by))
    prev_lon = F.lag(F.col(lon)).over(w)
    prev_lat = F.lag(F.col(lat)).over(w)
    leg = F.when(
        prev_lon.isNull(), F.lit(0.0)
    ).otherwise(distance_col(prev_lon, prev_lat, F.col(lon), F.col(lat)))
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return meta.withColumn("distance_m", F.sum(leg).over(w_cum))


def section_long(
    df: DataFrame,
    meta: DataFrame,
    channel: str,
    by: str = CAST_ID,
    pressure: str = PRESSURE,
    **dist_kw,
) -> DataFrame:
    """Section matrix in long form: (cast, distance_m, pressure, value).

    The meta side is one row per cast -> broadcast join; the client pivots
    the (already small, binned) collect into the contour grid.
    """
    d = section_distances(meta, by=by, **dist_kw).select(by, "distance_m")
    return (
        df.join(F.broadcast(d), by)
        .select(by, "distance_m", F.col(pressure).cast("double").alias(pressure),
                F.col(channel).cast("double").alias(channel))
    )


def plot_cast(df: DataFrame, channels=None, cast_id=None, secondary_y=None, **kw):
    """Draw a cast profile: y = physical index, inverted axis (reference
    ``plot_cast``, ctd/plotting.py:12-58).

    ``secondary_y`` names the channel(s) drawn on a twin x-axis sharing
    the inverted y — the reference's ``ax.twiny()`` dual-axis behavior
    (ctd/plotting.py:39-41) for channels with incomparable units (e.g.
    temperature vs fluorescence).
    """
    plt = _mpl()
    pdf = cast_to_pandas(df, cast_id=cast_id, **{
        k: v for k, v in kw.items() if k in ("by", "order", "pressure")
    })
    channels = as_list(channels) if channels else [
        c for c in pdf.columns if pdf[c].dtype.kind == "f"
    ]
    sec = [c for c in as_list(secondary_y) if c in pdf.columns] if secondary_y else []
    prim = [c for c in channels if c not in sec]
    fig, ax = plt.subplots()
    for c in prim:
        ax.plot(pdf[c].to_numpy(), pdf.index.to_numpy(), label=c)
    ax.invert_yaxis()
    ax.set_ylabel(pdf.index.name or "pressure")
    if prim:
        ax.set_xlabel(", ".join(prim))
        ax.legend()
    if sec:
        ax2 = ax.twiny()
        for c in sec:
            ax2.plot(pdf[c].to_numpy(), pdf.index.to_numpy(), linestyle="--", label=c)
        ax2.set_xlabel(", ".join(sec))
        ax2.legend()
    return ax


def plot_section(
    df: DataFrame,
    meta: DataFrame,
    channel: str,
    levels: int = 10,
    filled: bool = False,
    topomask: bool = False,
    dx: float = 1.0,
    **kw,
):
    """Contour a transect: x = along-track distance, y = pressure
    (inverted), z = channel (reference ``plot_section``,
    ctd/extras.py:155-259).  Engine computes the long-form section; the
    pivot + contourf happen client-side on the small result.

    ``filled`` fills the shadow zone with the reference's extrap_sec blend
    (w1=0.97, w2=0.03, ctd/extras.py:180-182).  ``topomask`` overlays the
    seafloor line from the deepest scan per station
    (ctd/extras.py:212-215).
    """
    plt = _mpl()
    by = kw.get("by", CAST_ID)
    pressure = kw.get("pressure", PRESSURE)
    pdf = section_long(df, meta, channel, **kw).toPandas()
    pivot = pdf.pivot_table(
        index=pressure, columns="distance_m", values=channel
    ).sort_index()
    grid = pivot.to_numpy()
    if filled:
        from python_ctd_spark.functions.extras_numpy import extrap_sec_kernel

        grid = extrap_sec_kernel(
            grid, pivot.columns.to_numpy(dtype=float),
            pivot.index.to_numpy(dtype=float), w1=0.97, w2=0.03,
        )
    fig, ax = plt.subplots()
    cs = ax.contourf(pivot.columns.to_numpy(), pivot.index.to_numpy(), grid,
                     levels=levels)
    if topomask:
        from python_ctd_spark.functions.extras_numpy import gen_topomask_kernel

        stations = (
            df.groupBy(by)
            .agg(F.max(F.col(pressure)).alias("maxdepth"))
            .join(meta.select(by, "lon", "lat"), by)
            .orderBy("lon")
            .toPandas()
        )
        xm, hm = gen_topomask_kernel(
            stations["maxdepth"].to_numpy(), stations["lon"].to_numpy(),
            stations["lat"].to_numpy(), dx=dx,
        )
        ax.plot(xm, hm, color="black")
        ax.fill_between(xm, hm, y2=hm.max(), color="0.9")
    ax.invert_yaxis()
    fig.colorbar(cs, ax=ax)
    return ax
