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
