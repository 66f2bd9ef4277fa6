"""TEOS-10 seawater functions (gsw equivalents) as vectorized pandas UDFs.

The reference calls four gsw functions: ``p_from_z`` (ctd/read.py:473),
``sigma0`` (ctd/extras.py:303), ``distance`` + ``z_from_p``
(ctd/extras.py:146-147).  The ``gsw`` package is not installed in this
environment, so each function tries gsw first and falls back to a
documented public approximation:

- pressure<->depth: Saunders (1981) quadratic formula (the classic
  pre-TEOS-10 standard, good to ~0.1 dbar in the upper ocean);
- ``sigma0``: linearized equation of state around (SA=35.16504 g/kg,
  CT=15 degC) with quadratic thermal-expansion correction — adequate for
  the reference's use (a masking *criterion*, ctd/extras.py:293-311);
- ``distance``: great-circle haversine on a 6371-km sphere.

All are exposed both as NumPy functions (for pandas-UDF kernels) and as
Spark column expressions (pure arithmetic -> whole-stage codegen).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

try:  # pragma: no cover - gsw not present in this environment
    import gsw as _gsw
except ImportError:
    _gsw = None

_DEG2RAD = np.pi / 180.0
_EARTH_RADIUS = 6371000.0


def p_from_z(z, lat):
    """Pressure [dbar] from height z [m, negative below surface]."""
    if _gsw is not None:
        return _gsw.p_from_z(z, lat, geo_strf_dyn_height=0, sea_surface_geopotential=0)
    z = np.asarray(z, dtype=float)
    lat = np.asarray(lat, dtype=float)
    depth = -z
    s = np.sin(lat * _DEG2RAD) ** 2
    return depth * (1.0052405 * (1.0 + 5.28e-3 * s)) + 2.36e-6 * depth * depth


def z_from_p(p, lat):
    """Height z [m] from pressure [dbar] — inverse of :func:`p_from_z`
    (quadratic solve of the Saunders formula)."""
    if _gsw is not None:
        return _gsw.z_from_p(p, lat)
    p = np.asarray(p, dtype=float)
    lat = np.asarray(lat, dtype=float)
    s = np.sin(lat * _DEG2RAD) ** 2
    c1 = 1.0052405 * (1.0 + 5.28e-3 * s)
    c2 = 2.36e-6
    depth = (-c1 + np.sqrt(c1 * c1 + 4.0 * c2 * p)) / (2.0 * c2)
    return -depth


#: Linearized EOS reference point and coefficients (public textbook values).
_SA0, _CT0, _RHO0 = 35.16504, 15.0, 1026.45
_ALPHA0, _ALPHA1, _BETA0 = 2.07e-4, 5.0e-6, 7.6e-4


def sigma0(sa, ct):
    """Potential density anomaly sigma_0 [kg/m^3] (rho(SA, CT, 0) - 1000)."""
    if _gsw is not None:
        return _gsw.sigma0(sa, ct)
    sa = np.asarray(sa, dtype=float)
    ct = np.asarray(ct, dtype=float)
    dct = ct - _CT0
    return (
        _RHO0 * (1.0 - (_ALPHA0 + _ALPHA1 * dct) * dct + _BETA0 * (sa - _SA0))
        - 1000.0
    )


def distance(lon, lat):
    """Great-circle distance [m] between successive positions."""
    if _gsw is not None:
        return _gsw.distance(lon, lat)
    lon = np.atleast_2d(np.asarray(lon, dtype=float)) * _DEG2RAD
    lat = np.atleast_2d(np.asarray(lat, dtype=float)) * _DEG2RAD
    dlon = np.diff(lon, axis=-1)
    dlat = np.diff(lat, axis=-1)
    a = (
        np.sin(dlat / 2) ** 2
        + np.cos(lat[..., :-1]) * np.cos(lat[..., 1:]) * np.sin(dlon / 2) ** 2
    )
    return 2 * _EARTH_RADIUS * np.arcsin(np.sqrt(a))


# --------------------------------------------------------------------------
# Spark column expressions (pure arithmetic, codegen'd — no Python workers)
# --------------------------------------------------------------------------

def register_sql_functions(spark) -> None:
    """Register the TEOS-10 pack as SQL-callable functions (vectorized
    pandas UDFs over the NumPy kernels) — the engine analog of the
    reference's method-registration extension surface (SURVEY.md §2.10):
    ``SELECT ctd_sigma0(sa, ct) FROM casts``.  Prefer the ``*_col``
    column expressions in DataFrame code (pure JVM arithmetic); the SQL
    names exist for ad-hoc ``spark.sql`` use.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ctd_sigma0(sa, ct):
        return pd.Series(sigma0(sa.to_numpy(), ct.to_numpy()))

    @pandas_udf("double")
    def ctd_p_from_z(z, lat):
        return pd.Series(p_from_z(z.to_numpy(), lat.to_numpy()))

    @pandas_udf("double")
    def ctd_z_from_p(p, lat):
        return pd.Series(z_from_p(p.to_numpy(), lat.to_numpy()))

    spark.udf.register("ctd_sigma0", ctd_sigma0)
    spark.udf.register("ctd_p_from_z", ctd_p_from_z)
    spark.udf.register("ctd_z_from_p", ctd_z_from_p)


def distance_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle (haversine) distance [m] between two positions — the
    column twin of :func:`distance` for successive stations via lag."""
    rlon1, rlat1 = F.radians(lon1.cast("double")), F.radians(lat1.cast("double"))
    rlon2, rlat2 = F.radians(lon2.cast("double")), F.radians(lat2.cast("double"))
    a = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return F.lit(2.0 * _EARTH_RADIUS) * F.asin(F.sqrt(a))


def p_from_z_col(z: Column, lat: Column) -> Column:
    depth = -z.cast("double")
    s = F.pow(F.sin(F.radians(lat.cast("double"))), 2)
    return depth * (F.lit(1.0052405) * (F.lit(1.0) + F.lit(5.28e-3) * s)) + F.lit(
        2.36e-6
    ) * depth * depth


def sigma0_col(sa: Column, ct: Column) -> Column:
    dct = ct.cast("double") - F.lit(_CT0)
    return (
        F.lit(_RHO0)
        * (
            F.lit(1.0)
            - (F.lit(_ALPHA0) + F.lit(_ALPHA1) * dct) * dct
            + F.lit(_BETA0) * (sa.cast("double") - F.lit(_SA0))
        )
        - F.lit(1000.0)
    )
