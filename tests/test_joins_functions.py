"""Alignment/metadata joins (§2.5) and the SQL function registry (§2.10)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark.functions import teos10
from python_ctd_spark.operators.join import align_frames, with_meta


def test_align_frames_matches_pandas_alignment(spark, multi_cast, multi_cast_pdf):
    from python_ctd_spark.operators.signal import despike

    clean = despike(multi_cast, n1=1.0, n2=2.0, block=10, cols=["t090C"])
    aligned = align_frames(multi_cast, clean, suffixes=("", "_clean"))
    pdf = aligned.toPandas().sort_values(["cast_id", "scan"]).reset_index(drop=True)
    assert len(pdf) == len(multi_cast_pdf)
    # where despike kept the value, the aligned pair is identical — the
    # reference's dirty[~spikes] == clean[~spikes] identity
    kept = pdf.t090C_clean.notna()
    np.testing.assert_array_equal(pdf.t090C[kept].to_numpy(), pdf.t090C_clean[kept].to_numpy())


def test_align_frames_suffixes_only_overlapping(spark, v_cast):
    r = v_cast.withColumn("extra", F.lit(1.0))
    out = align_frames(v_cast, r)
    assert "v" in out.columns and "v_r" in out.columns
    assert "extra" in out.columns and "extra_r" not in out.columns


def test_with_meta_broadcasts(spark, v_cast):
    meta = spark.createDataFrame(
        pd.DataFrame({"cast_id": ["cast_0"], "lat": [10.0], "lon": [-40.0]})
    )
    out = with_meta(v_cast, meta)
    assert out.count() == v_cast.count()
    assert out.filter(F.col("lat") == 10.0).count() == v_cast.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sql_function_registry_matches_numpy(spark):
    teos10.register_sql_functions(spark)
    pdf = pd.DataFrame(
        {
            "sa": np.linspace(30, 38, 50),
            "ct": np.linspace(-2, 30, 50),
            "z": np.linspace(-5000, 0, 50),
            "lat": np.linspace(-60, 60, 50),
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("t_teos")
    got = spark.sql(
        "SELECT ctd_sigma0(sa, ct) AS s, ctd_p_from_z(z, lat) AS p, "
        "ctd_z_from_p(ctd_p_from_z(z, lat), lat) AS z2 FROM t_teos"
    ).toPandas()
    np.testing.assert_allclose(
        got.s.to_numpy(), teos10.sigma0(pdf.sa.to_numpy(), pdf.ct.to_numpy()), rtol=1e-12
    )
    np.testing.assert_allclose(
        got.p.to_numpy(), teos10.p_from_z(pdf.z.to_numpy(), pdf.lat.to_numpy()), rtol=1e-12
    )
    # z_from_p inverts p_from_z
    np.testing.assert_allclose(got.z2.to_numpy(), pdf.z.to_numpy(), rtol=1e-6, atol=1e-6)


def test_sigma0_col_matches_numpy(spark):
    pdf = pd.DataFrame({"sa": np.linspace(30, 38, 20), "ct": np.linspace(-2, 30, 20)})
    out = (
        spark.createDataFrame(pdf)
        .select(teos10.sigma0_col(F.col("sa"), F.col("ct")).alias("s"))
        .toPandas()
    )
    np.testing.assert_allclose(
        out.s.to_numpy(), teos10.sigma0(pdf.sa.to_numpy(), pdf.ct.to_numpy()), rtol=1e-12
    )


def test_asof_join_backward_semantics(spark):
    from python_ctd_spark.operators.join import asof_join

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "t": [5, 10, 3, 7], "lv": list("abcd")})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "rt": [4, 10, 9], "rv": [40.0, 100.0, 90.0]})
    )
    out = (
        asof_join(left, right, on="k", left_time="t", right_time="rt",
                  value_cols=["rt", "rv"])
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # t=3: no right row at/before -> nulls; t=5 -> rt=4; t=10 -> rt=10
    # (inclusive match); k=2 t=7 -> rt=9 is after -> nulls
    assert out.loc[out.t == 3, "rv"].isna().all()
    assert out.loc[out.t == 5, "rt"].iloc[0] == 4
    assert out.loc[out.t == 10, "rt"].iloc[0] == 10
    assert out.loc[out.t == 10, "rv"].iloc[0] == 100.0
    assert out.loc[out.k == 2, "rv"].isna().all()


def test_asof_join_tiebreak_last_wins(spark):
    from python_ctd_spark.operators.join import asof_join

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [10]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [10, 10], "seq": [1, 2], "rv": [1.0, 2.0]})
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        value_cols=["rv"], right_order="seq",
    ).toPandas()
    assert out.rv.iloc[0] == 2.0  # greatest seq at the tied timestamp


def test_connected_components_chain_and_clique(spark):
    from python_ctd_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [1, 2, 10, 10, 11, 20], "id_b": [2, 3, 11, 12, 12, 21]}
        )
    )
    out = connected_components(edges).toPandas().set_index("node").label
    assert out.loc[1] == out.loc[2] == out.loc[3] == 1
    assert out.loc[10] == out.loc[11] == out.loc[12] == 10
    assert out.loc[20] == out.loc[21] == 20


def test_salted_agg_matches_direct(spark):
    from python_ctd_spark.operators._util import salted_agg

    rng = np.random.RandomState(0)
    pdf = pd.DataFrame(
        {
            # skewed: 90% of rows share one key
            "k": np.where(rng.rand(5000) < 0.9, 0, rng.randint(1, 50, 5000)),
            "v": rng.randint(0, 1000, 5000).astype("int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        salted_agg(
            df,
            "k",
            {
                "total": ("sum", "v"),
                "n": ("count", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            n_salts=8,
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        pdf.groupby("k")
        .agg(total=("v", "sum"), n=("v", "count"), lo=("v", "min"), hi=("v", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n": "int64"}), exp.astype({"n": "int64"}), check_like=True
    )


def test_salted_agg_rejects_nonalgebraic(spark):
    from python_ctd_spark.operators._util import salted_agg

    df = spark.range(10)
    with pytest.raises(ValueError):
        salted_agg(df, "id", {"a": ("avg", "id")})


def test_interval_join_matches_naive_inequality_join(spark):
    """The grid-bucketed plan must produce exactly the naive inequality
    join's pairs (multiplicity included), for intervals spanning zero,
    one, and many cells, points on boundaries, and an equality key."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.join import interval_join

    rng = np.random.RandomState(7)
    pts = pd.DataFrame({
        "pid": np.arange(300),
        "k": rng.randint(0, 3, 300),
        "t": rng.randint(0, 1000, 300).astype("int64"),
    })
    los = rng.randint(0, 950, 40).astype("int64")
    ivs = pd.DataFrame({
        "iid": np.arange(40),
        "k": rng.randint(0, 3, 40),
        "lo": los,
        "hi": los + rng.randint(0, 200, 40),   # includes zero-length
    })
    p, i = spark.createDataFrame(pts), spark.createDataFrame(ivs)
    got = interval_join(p, i, "t", "lo", "hi", bucket=64, on="k").toPandas()
    naive = pts.merge(ivs, on="k")
    naive = naive[(naive.t >= naive.lo) & (naive.t <= naive.hi)]
    assert sorted(zip(got.pid, got.iid)) == sorted(zip(naive.pid, naive.iid))
    # keyless form too
    got2 = interval_join(p.drop("k"), i.drop("k"), "t", "lo", "hi", bucket=64).toPandas()
    naive2 = pts.merge(ivs, how="cross", suffixes=("", "_r"))
    naive2 = naive2[(naive2.t >= naive2.lo) & (naive2.t <= naive2.hi)]
    assert sorted(zip(got2.pid, got2.iid)) == sorted(zip(naive2.pid, naive2.iid))
    # plan: a hash equi-join on the cell, not a nested loop
    plan = interval_join(p, i, "t", "lo", "hi", bucket=64, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_connected_components_star_matches_label(spark):
    """The alternating large-star/small-star path returns the identical
    (node, component-min) labeling as min-label propagation."""
    from python_ctd_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [1, 2, 10, 10, 11, 20], "id_b": [2, 3, 11, 12, 12, 21]}
        )
    )
    lbl = connected_components(edges, algorithm="label").toPandas()
    star = connected_components(edges, algorithm="star").toPandas()
    assert (
        lbl.sort_values("node").reset_index(drop=True).equals(
            star.sort_values("node").reset_index(drop=True)
        )
    )


def test_connected_components_chain_log_rounds(spark):
    """On a chain-shaped graph (diameter = n), label propagation needs
    O(n) rounds while the star path converges in O(log n): a 200-node
    chain must finish well under the diameter and still label every
    node with the chain minimum."""
    from python_ctd_spark.operators.dedup import connected_components

    n = 200
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(n - 1)), "id_b": list(range(1, n))})
    )
    stats: dict = {}
    out = connected_components(edges, stats=stats).toPandas()
    assert stats["algorithm"] == "auto:star"
    # log2(200) ~ 7.6; allow generous slack but stay far under diameter
    assert stats["iterations"] <= 25
    assert (out.label == 0).all() and len(out) == n

    # pure label propagation on a (shorter) chain needs ~diameter/2
    # rounds — each round propagates the min one hop from both ends
    m = 60
    edges_m = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(m - 1)), "id_b": list(range(1, m))})
    )
    stats_l: dict = {}
    out_l = connected_components(
        edges_m, algorithm="label", max_iter=500, stats=stats_l
    ).toPandas()
    assert stats_l["iterations"] > 20
    assert (out_l.label == 0).all()
