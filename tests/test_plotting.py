"""Presentation layer: engine-side section math is exact (haversine
cumsum vs NumPy reference); draw functions gate cleanly on matplotlib."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark import plotting
from python_ctd_spark.functions.teos10 import distance


@pytest.fixture(scope="module")
def section(spark):
    meta = spark.createDataFrame(
        pd.DataFrame(
            {
                "cast_id": ["s1", "s2", "s3"],
                "lon": [-40.0, -39.5, -39.0],
                "lat": [10.0, 10.2, 10.5],
            }
        )
    )
    rows = []
    for cid, base in (("s1", 10.0), ("s2", 11.0), ("s3", 12.0)):
        for i, p in enumerate([0.0, 10.0, 20.0]):
            rows.append((cid, i, p, base + p / 10.0))
    data = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cast_id", "scan", "pressure", "t"])
    )
    return data, meta


def test_section_distances_match_numpy(section):
    _, meta = section
    got = (
        plotting.section_distances(meta)
        .orderBy("lon")
        .select("cast_id", "distance_m")
        .toPandas()
    )
    lons, lats = [-40.0, -39.5, -39.0], [10.0, 10.2, 10.5]
    exp = np.r_[0.0, np.cumsum(distance(lons, lats).ravel())]
    np.testing.assert_allclose(got.distance_m.to_numpy(), exp, rtol=1e-9)
    assert list(got.cast_id) == ["s1", "s2", "s3"]


def test_section_long_shape(section):
    data, meta = section
    out = plotting.section_long(data, meta, "t").toPandas()
    assert len(out) == 9
    assert set(out.columns) == {"cast_id", "distance_m", "pressure", "t"}
    # every cast carries its station distance on every row
    assert out.groupby("cast_id").distance_m.nunique().eq(1).all()


def test_cast_to_pandas_index(section):
    data, _ = section
    pdf = plotting.cast_to_pandas(data, cast_id="s2")
    assert pdf.index.name == "pressure"
    assert list(pdf.index) == [0.0, 10.0, 20.0]
    assert list(pdf["t"]) == [11.0, 12.0, 13.0]


def test_draw_functions_gate_on_matplotlib(section):
    data, meta = section
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="matplotlib is required"):
        plotting.plot_cast(data, cast_id="s1")
    with pytest.raises(ImportError, match="matplotlib is required"):
        plotting.plot_section(data, meta, "t")


class _FakeAxes:
    def __init__(self):
        self.calls = []
        self.twins = []

    def __getattr__(self, name):
        def record(*args, **kwargs):
            self.calls.append((name, args, kwargs))
            if name == "twiny":
                twin = _FakeAxes()
                self.twins.append(twin)
                return twin
            return None

        return record


def _install_fake_mpl(monkeypatch):
    import sys
    import types

    axes = []
    fake_plt = types.ModuleType("matplotlib.pyplot")

    def subplots(**kw):
        ax = _FakeAxes()
        axes.append(ax)
        fig = _FakeAxes()
        return fig, ax

    fake_plt.subplots = subplots
    fake_mpl = types.ModuleType("matplotlib")
    fake_mpl.pyplot = fake_plt
    monkeypatch.setitem(sys.modules, "matplotlib", fake_mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", fake_plt)
    return axes


def test_plot_cast_secondary_y_twins_axis(section, monkeypatch):
    """secondary_y channels draw on a twin x-axis (reference
    ctd/plotting.py:39-41), primaries on the main inverted axis."""
    data, _ = section
    axes = _install_fake_mpl(monkeypatch)
    ax = plotting.plot_cast(data, channels=["t"], cast_id="s1", secondary_y="t")
    main = axes[0]
    assert main.twins, "secondary_y did not create a twiny axis"
    twin = main.twins[0]
    twin_plots = [c for c in twin.calls if c[0] == "plot"]
    assert len(twin_plots) == 1
    # the channel moved to the twin: the main axis drew nothing
    assert not any(c[0] == "plot" for c in main.calls if c[0] == "plot")
    assert any(c[0] == "invert_yaxis" for c in main.calls)
    xlabel = [c for c in twin.calls if c[0] == "set_xlabel"]
    assert xlabel and xlabel[0][1][0] == "t"


def test_plot_section_filled_topomask(section, monkeypatch):
    data, meta = section
    axes = _install_fake_mpl(monkeypatch)
    plotting.plot_section(data, meta, "t", filled=True, topomask=True, dx=5.0)
    main = axes[0]
    names = [c[0] for c in main.calls]
    assert "contourf" in names
    assert "plot" in names  # topomask seafloor line
    assert "fill_between" in names
