"""bindata parity vs the reference algorithm (pandas.cut oracle re-derived
from reference ctd/processing.py:112-143)."""

import numpy as np
import pandas as pd
import pytest

from python_ctd_spark.operators import binning, ordered
from tests.conftest import collect_sorted


def _bindata_oracle(series: pd.Series, delta: float, method: str) -> pd.Series:
    """Verbatim reference semantics (ctd/processing.py:112-129)."""
    start = np.ceil(series.index[0])
    stop = np.floor(series.index[-1])
    new_index = np.arange(start, stop, delta)
    if method == "average":
        binned = pd.cut(series.index, bins=new_index)
        out = series.groupby(binned, observed=False).mean()
        out.index = new_index[:-1] + delta / 2
        return out
    data = np.interp(new_index, series.index, series)
    return pd.Series(data, index=new_index, name=series.name)


def _downcast_pdf():
    rng = np.random.RandomState(11)
    frames = []
    for i, n in enumerate([300, 157]):
        p = np.sort(rng.uniform(0.3, 80.0, size=n))
        t = 25.0 - 0.2 * p + rng.normal(0, 0.02, size=n)
        frames.append(
            pd.DataFrame(
                {
                    "cast_id": f"c{i}",
                    "scan": np.arange(1, n + 1),
                    "pressure": p,
                    "t090C": t,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.mark.parametrize("delta", [1.0, 2.0])
def test_bindata_average_matches_reference(spark, delta):
    pdf = _downcast_pdf()
    out = collect_sorted(
        binning.bindata(spark.createDataFrame(pdf), delta=delta, cols=["t090C"]),
        order=("cast_id", "pressure"),
    )
    for cid, grp in pdf.groupby("cast_id"):
        s = grp.sort_values("scan").set_index("pressure").t090C
        exp = _bindata_oracle(s, delta, "average")
        got = out[out.cast_id == cid]
        np.testing.assert_allclose(got.pressure.to_numpy(), exp.index.to_numpy())
        np.testing.assert_allclose(
            got.t090C.to_numpy(), exp.to_numpy(), rtol=1e-12, equal_nan=True
        )


def test_bindata_average_keeps_empty_bins(spark):
    # a gap in pressure -> empty bins must appear as NULL rows
    p = np.r_[np.linspace(0.5, 10.0, 50), np.linspace(30.0, 40.0, 50)]
    pdf = pd.DataFrame(
        {"cast_id": "c", "scan": np.arange(1, 101), "pressure": p, "v": np.arange(100.0)}
    )
    out = collect_sorted(
        binning.bindata(spark.createDataFrame(pdf), delta=1.0, cols=["v"]),
        order=("cast_id", "pressure"),
    )
    s = pdf.set_index("pressure").v
    exp = _bindata_oracle(s, 1.0, "average")
    np.testing.assert_allclose(out.pressure.to_numpy(), exp.index.to_numpy())
    np.testing.assert_allclose(out.v.to_numpy(), exp.to_numpy(), equal_nan=True)
    assert out.v.isna().sum() > 10  # the gap really produced empty bins


def test_bindata_v_fixture_centers(spark, v_cast):
    """Reference tests/test_processing.py:91-101: bin centers of
    ``remove_above_water().split()[0].bindata(delta)`` at delta in {1, 2}."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.filters import remove_above_water

    down = ordered.split(remove_above_water(v_cast))
    down = down.filter(F.col("leg") == "down").drop("leg")
    for delta in (1.0, 2.0):
        out = collect_sorted(
            binning.bindata(down, delta=delta, cols=["v"]),
            order=("cast_id", "pressure"),
        )
        exp_centers = np.arange(1, 9, delta) + delta / 2
        np.testing.assert_allclose(out.pressure.to_numpy(), exp_centers)


@pytest.mark.parametrize("delta", [1.0, 2.5])
def test_bindata_interpolate_matches_np_interp(spark, delta):
    pdf = _downcast_pdf()
    out = collect_sorted(
        binning.bindata(
            spark.createDataFrame(pdf), delta=delta, method="interpolate", cols=["t090C"]
        ),
        order=("cast_id", "pressure"),
    )
    for cid, grp in pdf.groupby("cast_id"):
        s = grp.sort_values("scan").set_index("pressure").t090C
        exp = _bindata_oracle(s, delta, "interpolate")
        got = out[out.cast_id == cid]
        np.testing.assert_allclose(got.pressure.to_numpy(), exp.index.to_numpy())
        np.testing.assert_allclose(got.t090C.to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_bindata_upcast_matches_reversed_reference(spark, v_cast, v_cast_pdf):
    """The reference reverses the upcast before binning (split returns the
    up leg ascending); our split keeps scan order, so bindata's bounds must
    be direction-insensitive.  Regression for the r1 advice finding where
    the up leg silently binned to an empty frame."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.filters import remove_above_water

    up = ordered.split(remove_above_water(v_cast))
    up = up.filter(F.col("leg") == "up").drop("leg")
    out = collect_sorted(
        binning.bindata(up, delta=1.0, cols=["v"]), order=("cast_id", "pressure")
    )
    # oracle: reference filters, splits at argmax+1, REVERSES the up leg
    pdf = v_cast_pdf[v_cast_pdf.pressure >= 0].reset_index(drop=True)
    argmax = int(pdf.pressure.to_numpy().argmax())
    up_ref = pdf.iloc[argmax + 1 :].iloc[::-1]
    s = up_ref.set_index("pressure").v
    exp = _bindata_oracle(s, 1.0, "average")
    assert len(out) > 0
    np.testing.assert_allclose(out.pressure.to_numpy(), exp.index.to_numpy())
    np.testing.assert_allclose(out.v.to_numpy(), exp.to_numpy(), equal_nan=True)
