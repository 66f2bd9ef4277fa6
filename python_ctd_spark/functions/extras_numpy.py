"""Pure-NumPy kernels for section post-processing — the math of reference
``ctd/extras.py`` (``_extrap1d`` 9-33, ``extrap_sec`` 42-103,
``gen_topomask`` 106-152) re-derived without scipy (absent from this
environment): linear ``interp1d`` is ``np.interp`` on sorted coordinates,
and the extrapolation beyond the data range is the two-endpoint secant
line, exactly as the reference's ``pointwise`` wrapper computes it.

These run inside per-section ``applyInPandas`` groups
(operators/section.py); a section matrix is tens of stations x thousands
of levels — always task-sized.
"""

from __future__ import annotations

import numpy as np

from python_ctd_spark.functions.teos10 import distance, z_from_p


def interp_extrap_linear(
    x_known: np.ndarray, y_known: np.ndarray, x_new: np.ndarray
) -> np.ndarray:
    """Linear interpolation on ``[x_known[0], x_known[-1]]`` with secant
    extrapolation outside: below the range the line through the first two
    points, above it the line through the last two (reference
    ``_extrap1d``, ctd/extras.py:9-33).  ``x_known`` must be strictly
    increasing with >= 2 points."""
    x_known = np.asarray(x_known, dtype=float)
    y_known = np.asarray(y_known, dtype=float)
    x_new = np.asarray(x_new, dtype=float)
    out = np.interp(x_new, x_known, y_known)
    lo = x_new < x_known[0]
    if lo.any():
        slope = (y_known[1] - y_known[0]) / (x_known[1] - x_known[0])
        out[lo] = y_known[0] + (x_new[lo] - x_known[0]) * slope
    hi = x_new > x_known[-1]
    if hi.any():
        slope = (y_known[-1] - y_known[-2]) / (x_known[-1] - x_known[-2])
        out[hi] = y_known[-1] + (x_new[hi] - x_known[-1]) * slope
    return out


def _fill_along(mat: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Per-row NaN fill: rows with one valid sample repeat it, rows with
    more interp/extrapolate over ``coords``; all-NaN rows stay NaN."""
    out = np.empty_like(mat, dtype=float)
    for i, row in enumerate(mat):
        mask = ~np.isnan(row)
        if not mask.any():
            out[i] = row
        elif mask.sum() == 1:
            out[i] = row[mask][0]
        else:
            out[i] = interp_extrap_linear(coords[mask], row[mask], coords)
    return out


def extrap_sec_kernel(
    data: np.ndarray,
    dist: np.ndarray,
    depth: np.ndarray,
    w1: float = 1.0,
    w2: float = 0.0,
) -> np.ndarray:
    """Fill the shadow zone of a section matrix (depth levels x stations):
    a horizontal pass along station distance and a vertical pass along
    depth, blended ``w1 * horizontal + w2 * vertical`` (reference
    ``extrap_sec``, ctd/extras.py:42-103)."""
    data = np.asarray(data, dtype=float)
    dist = np.asarray(dist, dtype=float)
    depth = np.asarray(depth, dtype=float)
    horiz = _fill_along(data, dist)
    vert = _fill_along(data.T, depth).T
    return horiz * w1 + vert * w2


def gen_topomask_kernel(
    h: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    dx: float = 1.0,
    kind: str = "linear",
) -> tuple[np.ndarray, np.ndarray]:
    """Topography mask for a transect: per station the deepest scan's
    pressure becomes a local depth [m], resampled onto a regular ``dx``
    [km] along-track grid (reference ``gen_topomask``,
    ctd/extras.py:106-152).  Only ``kind='linear'`` is supported (scipy
    is absent; the reference default).  Queries beyond the last station
    clamp to the last depth — the reference's ``fill_value=h[-1]``."""
    if kind != "linear":
        msg = f"only kind='linear' is available without scipy, got {kind!r}"
        raise NotImplementedError(msg)
    h = np.asarray(h, dtype=float)
    lon = np.asarray(lon, dtype=float)
    lat = np.asarray(lat, dtype=float)
    x = np.append(0.0, np.cumsum(distance(lon, lat)[0] / 1e3))
    depth_m = -z_from_p(h, lat.mean())
    xm = np.arange(0.0, x.max() + dx, dx)
    # np.interp right-clamps to depth_m[-1] == the reference fill_value;
    # xm never queries below x[0] = 0
    hm = np.interp(xm, x, depth_m)
    return xm, hm
