"""Native ordered-operator parity vs the reference's semantics
(pandas/NumPy oracles re-derived from reference ctd/processing.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark.operators import filters, ordered
from tests.conftest import collect_sorted


# -- filters (reference tests/test_processing.py:22-45) ---------------------

def test_remove_above_water(v_cast, v_cast_pdf):
    out = collect_sorted(filters.remove_above_water(v_cast))
    exp = v_cast_pdf[v_cast_pdf.pressure >= 0]
    assert len(out) == len(exp)
    assert (out.pressure >= 0).all()
    np.testing.assert_allclose(out.v.to_numpy(), exp.v.to_numpy())


def test_remove_up_to(v_cast, v_cast_pdf):
    out = collect_sorted(filters.remove_up_to(v_cast, 5.0))
    assert (out.pressure >= 5.0).all()
    assert len(out) == (v_cast_pdf.pressure >= 5.0).sum()


# -- split (reference tests/test_processing.py:48-61) -----------------------

def test_split_legs_reconstruct(v_cast, v_cast_pdf):
    out = collect_sorted(ordered.split(v_cast))
    # argmax of the V fixture pressure is row 19 (0-based) -> scan 20
    argmax = int(v_cast_pdf.pressure.to_numpy().argmax())
    down = out[out.leg == "down"]
    up = out[out.leg == "up"]
    assert down.scan.max() == argmax + 1
    assert len(down) == argmax + 1
    assert len(up) == len(v_cast_pdf) - argmax - 1
    # down + up re-concatenated (in scan order) is the original cast
    recon = pd.concat([down, up]).sort_values("scan")
    np.testing.assert_allclose(recon.v.to_numpy(), v_cast_pdf.v.to_numpy())


def test_split_first_max_wins(spark):
    # two rows attain the max; reference argmax takes the first
    pdf = pd.DataFrame(
        {
            "cast_id": "c",
            "scan": [1, 2, 3, 4, 5],
            "pressure": [1.0, 5.0, 3.0, 5.0, 2.0],
            "v": [0.0, 1.0, 2.0, 3.0, 4.0],
        }
    )
    out = collect_sorted(ordered.split(spark.createDataFrame(pdf)))
    assert list(out.leg) == ["down", "down", "up", "up", "up"]


# -- press_check (reference tests/test_processing.py:64-88) -----------------

def _press_check_oracle(press: np.ndarray) -> np.ndarray:
    """The reference loop, verbatim semantics (ctd/processing.py:93-109)."""
    ref = press[0]
    inversions = np.diff(np.r_[press, press[-1]]) < 0
    mask = np.zeros_like(inversions)
    for k, p in enumerate(inversions):
        if p:
            ref = press[k]
            cut = press[k + 1 :] < ref
            mask[k + 1 :][cut] = True
    return mask


def test_press_check_reversal_fixture(spark, reversal_pdf):
    out = collect_sorted(ordered.press_check(spark.createDataFrame(reversal_pdf)))
    nulls = out.v.isna().to_numpy()
    exp = _press_check_oracle(reversal_pdf.pressure.to_numpy())
    np.testing.assert_array_equal(nulls, exp)
    # exactly positions 7 and 9 (0-based)
    assert list(np.where(nulls)[0]) == [7, 9]
    # pressure column itself is kept
    np.testing.assert_allclose(out.pressure.to_numpy(), reversal_pdf.pressure.to_numpy())


def test_press_check_matches_loop_on_noisy_casts(multi_cast, multi_cast_pdf):
    out = collect_sorted(ordered.press_check(multi_cast, cols=["t090C"]))
    for cid, grp in multi_cast_pdf.groupby("cast_id"):
        grp = grp.sort_values("scan")
        exp_mask = _press_check_oracle(grp.pressure.to_numpy())
        got = out[out.cast_id == cid].t090C.isna().to_numpy()
        exp = exp_mask | grp.t090C.isna().to_numpy()
        np.testing.assert_array_equal(got, exp)


# -- movingaverage (reference ctd/processing.py:243-262) --------------------

@pytest.mark.parametrize("w", [3, 4, 5, 48])
def test_movingaverage_matches_convolve(spark, multi_cast, multi_cast_pdf, w):
    out = collect_sorted(ordered.movingaverage(multi_cast, window_size=w, cols=["t090C"]))
    for cid, grp in multi_cast_pdf.groupby("cast_id"):
        grp = grp.sort_values("scan")
        kernel = np.ones(w) / w
        exp = np.convolve(grp.t090C.to_numpy(), kernel, "same")
        got = out[out.cast_id == cid].t090C.to_numpy()
        np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_movingaverage_nan_propagation(spark):
    x = np.array([1.0, 2.0, np.nan, 4.0, 5.0, 6.0])
    pdf = pd.DataFrame({"cast_id": "c", "scan": range(1, 7), "pressure": 0.0, "v": x})
    out = collect_sorted(ordered.movingaverage(spark.createDataFrame(pdf), window_size=3, cols=["v"]))
    exp = np.convolve(x, np.ones(3) / 3, "same")
    np.testing.assert_allclose(out.v.to_numpy(), exp, equal_nan=True)


# -- ffill / interpolate (reference ctd/read.py:294-295, README.md:52-54) ---

def test_ffill(spark):
    pdf = pd.DataFrame(
        {
            "cast_id": ["a"] * 4 + ["b"] * 3,
            "scan": [1, 2, 3, 4, 1, 2, 3],
            "v": [1.0, np.nan, np.nan, 2.0, np.nan, 3.0, np.nan],
        }
    )
    out = collect_sorted(ordered.ffill(spark.createDataFrame(pdf), cols=["v"]))
    exp = pdf.groupby("cast_id").v.ffill().to_numpy()
    np.testing.assert_allclose(out.v.to_numpy(), exp, equal_nan=True)


def test_interpolate_index_matches_pandas(spark):
    # monotonic pressure index (pandas method='index' precondition), NULLs
    # at the edges and interior; interior fills, edges stay NULL
    rng = np.random.RandomState(3)
    n = 200
    p = np.sort(rng.uniform(0, 100, size=n))
    v = 10.0 + 0.2 * p + rng.normal(0, 0.1, size=n)
    v[[0, 1, n - 1]] = np.nan
    v[rng.choice(np.arange(2, n - 1), size=40, replace=False)] = np.nan
    pdf = pd.DataFrame(
        {"cast_id": "c", "scan": np.arange(1, n + 1), "pressure": p, "v": v}
    )
    out = collect_sorted(
        ordered.interpolate_index(spark.createDataFrame(pdf), cols=["v"])
    )
    exp = (
        pdf.set_index("pressure")
        .v.interpolate(method="index", limit_direction="both", limit_area="inside")
        .to_numpy()
    )
    np.testing.assert_allclose(out.v.to_numpy(), exp, rtol=1e-9, atol=1e-9, equal_nan=True)


def test_cumsum(multi_cast, multi_cast_pdf):
    out = collect_sorted(ordered.cumsum(multi_cast, cols=["t090C"]))
    exp = (
        multi_cast_pdf.sort_values(["cast_id", "scan"])
        .groupby("cast_id")
        .t090C.cumsum()
        .to_numpy()
    )
    np.testing.assert_allclose(out.t090C_cumsum.to_numpy(), exp, rtol=1e-9)


def test_movingaverage_leaves_pressure_alone(spark, multi_cast, multi_cast_pdf):
    """Default cols must exclude the physical index: the reference convolves
    only data columns (ctd/processing.py:243-262).  Regression for the r1
    advice finding where pressure was boxcar-averaged too."""
    out = collect_sorted(ordered.movingaverage(multi_cast, window_size=4))
    pdf = multi_cast_pdf.sort_values(["cast_id", "scan"], kind="mergesort")
    np.testing.assert_array_equal(out.pressure.to_numpy(), pdf.pressure.to_numpy())
    # the data channel really was averaged
    assert not np.allclose(out.t090C.to_numpy(), pdf.t090C.to_numpy())
