"""Section operators: extrap_sec + gen_topomask parity with a pointwise
reference re-implementation (reference ctd/extras.py:9-152 semantics)."""

import numpy as np
import pandas as pd
import pytest

from python_ctd_spark.functions.extras_numpy import (
    extrap_sec_kernel,
    gen_topomask_kernel,
    interp_extrap_linear,
)
from python_ctd_spark.functions.teos10 import distance, p_from_z
from python_ctd_spark.operators import section


def _pointwise_oracle(xs, ys, x):
    """Literal transcription of the reference's pointwise rule
    (ctd/extras.py:21-28): secant extrapolation outside, linear inside."""
    if x < xs[0]:
        return ys[0] + (x - xs[0]) * (ys[1] - ys[0]) / (xs[1] - xs[0])
    if x > xs[-1]:
        return ys[-1] + (x - xs[-1]) * (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
    return float(np.interp(x, xs, ys))


def test_interp_extrap_linear_pointwise():
    rng = np.random.RandomState(3)
    xs = np.sort(rng.uniform(0, 10, 7))
    ys = rng.uniform(-5, 5, 7)
    q = np.r_[-3.0, -0.1, xs, 4.2, 9.99, 12.5, 20.0]
    got = interp_extrap_linear(xs, ys, q)
    exp = np.array([_pointwise_oracle(xs, ys, x) for x in q])
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def _shadow_matrix():
    """5 depth levels x 4 stations; deep levels of the near-shore stations
    are NaN (the classic shadow zone), one row single-valued, one all-NaN."""
    dist = np.array([0.0, 10.0, 25.0, 40.0])
    depth = np.array([5.0, 10.0, 20.0, 30.0, 50.0])
    data = np.array(
        [
            [10.0, 10.5, 11.0, 11.5],
            [9.0, 9.4, np.nan, 10.2],
            [np.nan, 8.1, 8.5, 8.9],
            [np.nan, np.nan, np.nan, 7.5],  # single valid -> repeat
            [np.nan, np.nan, np.nan, np.nan],  # stays NaN
        ]
    )
    return data, dist, depth


def test_extrap_sec_kernel_matches_pointwise_reference():
    data, dist, depth = _shadow_matrix()
    got = extrap_sec_kernel(data, dist, depth, w1=0.97, w2=0.03)

    def fill(mat, coords):
        rows = []
        for row in mat:
            mask = ~np.isnan(row)
            if not mask.any():
                rows.append(row.copy())
            elif mask.sum() == 1:
                rows.append(np.repeat(row[mask], len(row)))
            else:
                rows.append(
                    np.array([_pointwise_oracle(coords[mask], row[mask], x) for x in coords])
                )
        return np.array(rows)

    exp = fill(data, dist) * 0.97 + fill(data.T, depth).T * 0.03
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # an all-NaN row stays NaN through the horizontal pass and NaN poisons
    # the weighted blend even at w1=0 (NaN * 0 = NaN) — exactly the
    # reference's `new_data1 * w1 + new_data2.T * w2` behavior
    assert np.isnan(got[4]).all()
    assert np.isnan(extrap_sec_kernel(data, dist, depth, w1=0.0, w2=1.0)[4]).all()


def test_extrap_sec_operator_matches_kernel(spark):
    data, dist, depth = _shadow_matrix()
    rows = [
        ("secA", float(d), float(z), data[i, j] if np.isfinite(data[i, j]) else None)
        for i, z in enumerate(depth)
        for j, d in enumerate(dist)
    ]
    pdf = pd.DataFrame(rows, columns=["section_id", "distance_m", "pressure", "t"])
    out = (
        section.extrap_sec(spark.createDataFrame(pdf), "t", w1=0.97, w2=0.03)
        .toPandas()
        .sort_values(["pressure", "distance_m"])
        .reset_index(drop=True)
    )
    exp = extrap_sec_kernel(data, dist, depth, w1=0.97, w2=0.03)
    got = out.pivot_table(
        index="pressure", columns="distance_m", values="t", dropna=False
    ).to_numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)
    assert len(out) == data.size  # full grid back, one row per cell


def test_gen_topomask_kernel():
    h = np.array([120.0, 480.0, 1450.0])
    lon = np.array([-40.0, -39.5, -39.0])
    lat = np.array([-20.0, -20.0, -20.0])
    xm, hm = gen_topomask_kernel(h, lon, lat, dx=5.0)
    legs = distance(lon, lat)[0] / 1e3
    x = np.append(0.0, np.cumsum(legs))
    assert xm[0] == 0.0
    assert np.all(np.diff(xm) == 5.0)
    assert xm[-1] >= x[-1]
    # depth_m inverts the Saunders pressure relation: p_from_z round-trips
    np.testing.assert_allclose(p_from_z(-hm[0], lat.mean()), h[0], rtol=1e-10)
    # beyond the last station the mask clamps to the deepest station
    deepest = hm[np.searchsorted(xm, x[-1])]
    np.testing.assert_allclose(hm[-1], deepest, rtol=1e-12)
    with pytest.raises(NotImplementedError):
        gen_topomask_kernel(h, lon, lat, kind="cubic")


def test_gen_topomask_operator(spark):
    pdf = pd.DataFrame(
        {
            "section_id": "s1",
            "cast_id": ["c0", "c1", "c2"],
            "maxdepth": [120.0, 480.0, 1450.0],
            "lon": [-40.0, -39.5, -39.0],
            "lat": [-20.0, -20.0, -20.0],
        }
    )
    out = (
        section.gen_topomask(spark.createDataFrame(pdf), dx=5.0)
        .toPandas()
        .sort_values("x_km")
        .reset_index(drop=True)
    )
    xm, hm = gen_topomask_kernel(
        pdf["maxdepth"].to_numpy(), pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), dx=5.0
    )
    np.testing.assert_allclose(out["x_km"].to_numpy(), xm)
    np.testing.assert_allclose(out["depth_m"].to_numpy(), hm, rtol=1e-12)


def test_station_maxdepths(spark):
    pdf = pd.DataFrame(
        {
            "section_id": "s1",
            "cast_id": ["c0", "c0", "c1"],
            "pressure": [10.0, 55.0, 30.0],
            "t": [1.0, 2.0, 3.0],
        }
    )
    out = section.station_maxdepths(spark.createDataFrame(pdf)).toPandas()
    got = dict(zip(out.cast_id, out.maxdepth))
    assert got == {"c0": 55.0, "c1": 30.0}
