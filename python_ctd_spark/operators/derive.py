"""Derived oceanographic analytics — reference ``ctd/extras.py``
(SURVEY.md §2.9).  All pure window/aggregate arithmetic, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.functions.teos10 import sigma0_col
from python_ctd_spark.operators._util import as_list, cast_window, value_columns
from python_ctd_spark.schema import CAST_ID, PRESSURE, SCAN


def cell_thermal_mass(
    df: DataFrame,
    temperature: str,
    conductivity: str,
    out_col: str = "ctm",
    by=CAST_ID,
    order=SCAN,
) -> DataFrame:
    """Conductivity cell thermal-mass correction [S/m].

    Reference ``cell_thermal_mass`` (ctd/extras.py:262-279): constants
    alpha=0.03, beta=1/7, sample interval 1/15 s;
    ``-b*C + a*(dc/dt)*dT`` with ``dT = diff(T)`` (lag difference; first
    row has no predecessor -> NULL).  The reference has a latent bug —
    ``[temperature - 20]`` builds a 1-element *list* — so this implements
    the documented formula ``dc_o_dt = 0.1*(1 + 0.006*(T - 20))``
    element-wise (divergence noted per SURVEY.md §7.5.7).
    """
    by, order = as_list(by), as_list(order)
    alpha = 0.03
    beta = 1.0 / 7
    sample_interval = 1.0 / 15
    a = 2 * alpha / (sample_interval * beta + 2)
    b = 1 - (2 * a / alpha)
    w = cast_window(by, order)
    t = F.col(temperature).cast("double")
    c = F.col(conductivity).cast("double")
    dc_o_dt = F.lit(0.1) * (F.lit(1.0) + F.lit(0.006) * (t - F.lit(20.0)))
    dt = t - F.lag(t, 1).over(w)
    return df.withColumn(out_col, F.lit(-1.0) * F.lit(b) * c + F.lit(a) * dc_o_dt * dt)


def mixed_layer_depth(
    df: DataFrame,
    ct: str,
    out_col: str = "MLD",
    method: str = "half degree",
    by=CAST_ID,
    order=SCAN,
) -> DataFrame:
    """Mixed-layer mask: ``ct[0] - ct < 0.5`` (reference
    ctd/extras.py:282-290, 'half degree' criterion)."""
    by, order = as_list(by), as_list(order)
    w = cast_window(by, order).rowsBetween(Window.unboundedPreceding, 0)
    surface = F.first(F.col(ct).cast("double")).over(w)
    if method == "half degree":
        mask = (surface - F.col(ct).cast("double")) < F.lit(0.5)
    else:
        mask = F.lit(False)
    return df.withColumn(out_col, mask)


def barrier_layer_thickness(
    df: DataFrame,
    sa: str,
    ct: str,
    out_col: str = "BLT",
    by=CAST_ID,
    order=SCAN,
) -> DataFrame:
    """Barrier-layer mask (reference ctd/extras.py:293-311).

    sigma_theta = sigma0(SA, CT); mld = *last* row (in cast order) passing
    the MLD criterion; the barrier layer is where
    ``sigma_theta - sigma0(SA[0], CT[mld]) < sigma0[0] - sigma0(SA[0], CT[mld])``.
    Window plan: full-frame first/last-where over the cast — no joins.
    """
    by, order = as_list(by), as_list(order)
    w_all = cast_window(by, order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sac = F.col(sa).cast("double")
    ctc = F.col(ct).cast("double")
    sigma_theta = sigma0_col(sac, ctc)
    surface_ct = F.first(ctc).over(w_all)
    surface_sa = F.first(sac).over(w_all)
    mld_mask = (surface_ct - ctc) < F.lit(0.5)
    ct_at_mld = F.last(F.when(mld_mask, ctc), ignorenulls=True).over(w_all)
    sig_surface = F.first(sigma_theta).over(w_all)
    sig_bottom_mld = sigma0_col(surface_sa, ct_at_mld)
    d_sig_t = sig_surface - sig_bottom_mld
    return df.withColumn(out_col, (sigma_theta - sig_bottom_mld) < d_sig_t)


def get_maxdepth(
    df: DataFrame,
    cols=None,
    by=CAST_ID,
    pressure: str = PRESSURE,
) -> DataFrame:
    """Max physical index among rows where each channel is non-NULL, per
    cast (reference ``get_maxdepth``, ctd/extras.py:36-39) — a plain hash
    aggregate: ``max(CASE WHEN c IS NOT NULL THEN pressure END)``."""
    by = as_list(by)
    cols = value_columns(df, cols, by, [], pressure)
    aggs = [
        F.max(F.when(F.col(c).isNotNull(), F.col(pressure).cast("double"))).alias(c)
        for c in cols
    ]
    return df.groupBy(*by).agg(*aggs)
