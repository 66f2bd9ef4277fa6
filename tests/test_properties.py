"""Property-based tests (hypothesis) for the edge-semantics hard parts
(SURVEY.md §7.5): the places where a naive Spark translation silently
diverges from the reference — press_check's running-max-of-prior-rows
rule with ties, bindata's right-closed bins + empty-bin grid,
movingaverage's zero-padded edges, interior-only index interpolation.

Each example builds a handful of random casts into ONE DataFrame so a
single Spark job checks the whole batch (Spark-per-example is the cost
ceiling; max_examples is kept modest)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from python_ctd_spark.operators.binning import bindata
from python_ctd_spark.operators.ordered import (
    interpolate_index,
    movingaverage,
    press_check,
)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

finite = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False, width=32
)


def _casts_to_pdf(casts):
    frames = []
    for i, vals in enumerate(casts):
        n = len(vals)
        frames.append(
            pd.DataFrame(
                {
                    "cast_id": f"c{i}",
                    "scan": np.arange(n, dtype="int64"),
                    "pressure": np.asarray(vals, dtype="float64"),
                    "v": np.arange(n, dtype="float64") * 1.5,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


casts_strategy = st.lists(
    st.lists(finite, min_size=3, max_size=40), min_size=1, max_size=4
)


@given(casts=casts_strategy)
@SET
def test_press_check_equals_sequential_loop(spark, casts):
    pdf = _casts_to_pdf(casts)
    out = (
        press_check(spark.createDataFrame(pdf), cols=["v"])
        .toPandas()
        .sort_values(["cast_id", "scan"])
        .reset_index(drop=True)
    )
    # oracle: NULL iff pressure < max of strictly-prior pressures
    exp = []
    for _, g in pdf.groupby("cast_id", sort=True):
        mx = -math.inf
        for p, v in zip(g.pressure, g.v):
            exp.append(np.nan if p < mx else v)
            mx = max(mx, p)
    got = out.sort_values(["cast_id", "scan"]).v.to_numpy()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(np.array(exp)))
    np.testing.assert_allclose(got[~np.isnan(got)], np.array(exp)[~np.isnan(np.array(exp))])


@given(casts=casts_strategy, w=st.integers(min_value=1, max_value=9))
@SET
def test_movingaverage_equals_zero_padded_convolve(spark, casts, w):
    pdf = _casts_to_pdf(casts)
    out = (
        movingaverage(spark.createDataFrame(pdf), window_size=w, cols=["v"])
        .toPandas()
        .sort_values(["cast_id", "scan"])
        .reset_index(drop=True)
    )
    # oracle: zero-padded centered window sum / w.  Equals
    # np.convolve(x, ones(w)/w, 'same') whenever n >= w; for n < w
    # convolve returns max(n, w) elements (ill-defined as a column op),
    # where the engine keeps one output row per input row.
    def zero_padded(x, w):
        lo, hi = w // 2, w - w // 2 - 1
        return np.array(
            [x[max(0, i - lo): i + hi + 1].sum() / w for i in range(len(x))]
        )

    exp = np.concatenate(
        [
            zero_padded(g.v.to_numpy(), w)
            for _, g in pdf.groupby("cast_id", sort=True)
        ]
    )
    np.testing.assert_allclose(out.v.to_numpy(), exp, rtol=1e-9, atol=1e-12)


@given(
    casts=st.lists(
        st.lists(finite, min_size=4, max_size=40, unique=True), min_size=1, max_size=3
    ),
    delta=st.sampled_from([1.0, 2.0, 5.0]),
)
@SET
def test_bindata_average_matches_pandas_cut(spark, casts, delta):
    pdf = _casts_to_pdf(casts)
    out = (
        bindata(spark.createDataFrame(pdf), delta=delta, cols=["v"], exact_avg=False)
        .toPandas()
        .sort_values(["cast_id", "pressure"])
        .reset_index(drop=True)
    )
    # oracle: the reference recipe — edges arange(ceil(first), floor(last),
    # delta), right-closed pd.cut, observed=False keeps empty bins.
    # Bounds are direction-insensitive (least/greatest of the endpoints):
    # the reference reverses the upcast before binning so its index always
    # ascends; our split() keeps scan order, so the operator normalizes.
    frames = []
    for cid, g in pdf.groupby("cast_id", sort=True):
        start = math.ceil(min(g.pressure.iloc[0], g.pressure.iloc[-1]))
        stop = math.floor(max(g.pressure.iloc[0], g.pressure.iloc[-1]))
        edges = np.arange(start, stop, delta)
        if len(edges) < 2:
            continue
        binned = pd.cut(g.pressure, edges, right=True)
        m = g.groupby(binned, observed=False).v.mean()
        frames.append(
            pd.DataFrame(
                {
                    "cast_id": cid,
                    "pressure": edges[:-1] + delta / 2.0,
                    "v": m.to_numpy(),
                }
            )
        )
    if not frames:
        assert len(out) == 0
        return
    exp = pd.concat(frames, ignore_index=True).sort_values(
        ["cast_id", "pressure"]
    ).reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_allclose(out.pressure.to_numpy(), exp.pressure.to_numpy())
    np.testing.assert_allclose(out.v.to_numpy(), exp.v.to_numpy(), rtol=1e-9)


@given(
    n=st.integers(min_value=4, max_value=40),
    null_idx=st.sets(st.integers(min_value=0, max_value=39), min_size=1, max_size=10),
)
@SET
def test_interpolate_index_matches_pandas(spark, n, null_idx):
    rng = np.random.RandomState(n)
    v = rng.uniform(-100, 100, size=n)
    v[[i for i in null_idx if i < n]] = np.nan
    pdf = pd.DataFrame(
        {
            "cast_id": "c0",
            "scan": np.arange(n, dtype="int64"),
            "pressure": np.sort(rng.uniform(0, 50, size=n)),
            "v": v,
        }
    )
    out = (
        interpolate_index(spark.createDataFrame(pdf), cols=["v"])
        .toPandas()
        .sort_values("scan")
        .reset_index(drop=True)
    )
    exp = (
        pdf.set_index("pressure")
        .v.interpolate(method="index", limit_direction="both", limit_area="inside")
        .to_numpy()
    )
    np.testing.assert_allclose(out.v.to_numpy(), exp, rtol=1e-9, atol=1e-12, equal_nan=True)


@given(
    n_left=st.integers(1, 40),
    n_right=st.integers(0, 40),
    seed=st.integers(0, 10_000),
)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, n_left, n_right, seed):
    from python_ctd_spark.operators.join import asof_join

    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 3, n_left).astype("int64"),
            "t": rng.randint(0, 30, n_left).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 3, n_right).astype("int64"),
            # distinct (k, rt) pairs: merge_asof picks the LAST right row
            # among equal keys, which is only deterministic without ties
            "rt": np.arange(n_right, dtype="int64") * 2,
            "rv": rng.uniform(-5, 5, n_right),
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left, schema="k bigint, t bigint"),
            spark.createDataFrame(right, schema="k bigint, rt bigint, rv double"),
            on="k",
            left_time="t",
            right_time="rt",
            value_cols=["rt", "rv"],
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("rt"),
            left_on="t",
            right_on="rt",
            by="k",
            direction="backward",
        )
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # left rows are not unique on (k, t): both engines assign every such
    # row the same match, so sorting by (k, t) aligns them
    np.testing.assert_allclose(
        out.rv.to_numpy(dtype=float), exp.rv.to_numpy(dtype=float), equal_nan=True
    )
    np.testing.assert_allclose(
        out.rt.to_numpy(dtype=float), exp.rt.to_numpy(dtype=float), equal_nan=True
    )


def test_normalize_text_idempotent(spark):
    """normalize(normalize(x)) == normalize(x) — the property that makes
    it safe to run the stage defensively at multiple pipeline points."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.text import normalize_text

    rows = [
        (0, "  A\r\n\tB \x07 c  "),
        (1, "already clean text"),
        (2, "MIXED  Case\twith\nstuff"),
        (3, ""),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    once = normalize_text(df).select("doc_id", F.col("text_norm").alias("text"))
    twice = normalize_text(once).select("doc_id", "text_norm")
    joined = once.join(twice, "doc_id")
    assert joined.filter(F.col("text") != F.col("text_norm")).count() == 0


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "ee", ""]), min_size=1, max_size=8),
        min_size=1, max_size=6,
    )
)
@SET
def test_dedup_lines_properties(spark, docs_lines):
    """Idempotence + conservation: output lines are exactly the input's
    distinct lines in first-occurrence order, so a second pass is the
    identity and counts reconcile."""
    from python_ctd_spark.operators.text import dedup_lines

    pdf = pd.DataFrame(
        {"doc_id": range(len(docs_lines)),
         "text": ["\n".join(ls) for ls in docs_lines]}
    )
    df = spark.createDataFrame(pdf)
    out = dedup_lines(df).toPandas().set_index("doc_id").sort_index()
    for i, ls in enumerate(docs_lines):
        expect = list(dict.fromkeys(ls))  # first-occurrence order
        assert out.loc[i, "text_dedup"] == "\n".join(expect)
        assert out.loc[i, "n_lines"] == len(ls)
        assert out.loc[i, "n_removed"] == len(ls) - len(expect)
    # idempotence through the engine
    again = dedup_lines(
        df.select("doc_id", F.col("text").alias("orig"))
        .join(spark.createDataFrame(out.reset_index()[["doc_id", "text_dedup"]])
              .withColumnRenamed("text_dedup", "text"), "doc_id")
    ).toPandas().set_index("doc_id").sort_index()
    assert (again.n_removed == 0).all()


@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=30),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=200),
                  st.integers(min_value=0, max_value=60)),
        min_size=1, max_size=10,
    ),
    st.sampled_from([7, 32, 64, 301]),
)
@SET
def test_interval_join_equals_naive_for_any_bucket(spark, points, spans, bucket):
    """For EVERY bucket width the grid plan must equal the naive
    inequality join — bucket choice is a performance knob, never a
    correctness knob."""
    from python_ctd_spark.operators.join import interval_join

    pts = pd.DataFrame({"pid": range(len(points)), "t": np.asarray(points, "int64")})
    ivs = pd.DataFrame(
        {"iid": range(len(spans)),
         "lo": np.asarray([lo for lo, _ in spans], "int64"),
         "hi": np.asarray([lo + w for lo, w in spans], "int64")}
    )
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        "t", "lo", "hi", bucket=float(bucket),
    ).toPandas()
    naive = pts.merge(ivs, how="cross")
    naive = naive[(naive.t >= naive.lo) & (naive.t <= naive.hi)]
    assert sorted(zip(got.pid, got.iid)) == sorted(zip(naive.pid, naive.iid))


# -- remove_dup_passages vs a pure-Python twin (r11) -------------------

_rdp_word = st.sampled_from(["aa", "bb", "cc", "dd", "The", "ee"])
_rdp_doc = st.lists(_rdp_word, min_size=0, max_size=12).map(" ".join)
_rdp_corpus = st.lists(_rdp_doc, min_size=1, max_size=8)


def _rdp_python(texts, n=3, min_docs=2):
    """Pure-Python re-derivation of remove_dup_passages' contract."""
    toks = [t.split() if t.strip() else [""] for t in
            (" ".join(x.split()) for x in texts)]
    low = [[w.lower() for w in ts] for ts in toks]
    grams = {}
    for d, ts in enumerate(low):
        for i in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[i:i + n]), set()).add(d)
    dup = {g for g, docs in grams.items() if len(docs) >= min_docs}
    out = []
    for d, ts in enumerate(toks):
        covered = set()
        for i in range(len(low[d]) - n + 1):
            if " ".join(low[d][i:i + n]) in dup:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(ts) if i not in covered]
        out.append((" ".join(kept), len(ts), len(ts) - len(kept)))
    return out


@SET
@given(texts=_rdp_corpus)
def test_remove_dup_passages_matches_python_twin(spark, texts):
    """Property: the distributed span removal equals a direct Python
    re-derivation on arbitrary small corpora — order preservation,
    boundary-gram coverage, case-insensitive matching with original
    casing kept, short docs untouched.  (Spark splits on a whitespace
    RUN, so inputs are pre-normalized the way tokens() sees them.)"""
    from python_ctd_spark.operators.dedup import remove_dup_passages

    norm = [" ".join(t.split()) for t in texts]
    df = spark.createDataFrame(
        list(enumerate(norm)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_dup_tokens"])
        for r in remove_dup_passages(df, n=3, min_docs=2).collect()
    }
    want = dict(enumerate(_rdp_python(norm, n=3, min_docs=2)))
    assert got == want


# -- banded Hamming join (shared core of simhash_dedup + image_dedup) --

hash_corpus = st.lists(
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    min_size=2,
    max_size=24,
)


@given(
    hashes=hash_corpus,
    bands=st.sampled_from([1, 2, 4, 8]),
    data=st.data(),
)
@SET
def test_banded_hamming_pairs_lossless_property(spark, hashes, bands, data):
    """For ANY 64-bit fingerprint corpus and max_hamming < bands, the
    banded equi-join returns EXACTLY the all-pairs Hamming<=t set — the
    pigeonhole losslessness contract both simhash (lossless configs)
    and image ahash rely on.  Hypothesis drives random corpora
    including sign-bit values, duplicates, and near-misses."""
    import itertools

    import pandas as pd

    from python_ctd_spark.operators.dedup import banded_hamming_pairs

    max_hamming = data.draw(st.integers(min_value=0, max_value=bands - 1))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": range(len(hashes)),
                "sh": pd.Series(hashes, dtype="int64"),
            }
        )
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in banded_hamming_pairs(
            df, max_hamming=max_hamming, bands=bands, materialize=False
        ).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (a, b, ham(hashes[a], hashes[b]))
        for a, b in itertools.combinations(range(len(hashes)), 2)
        if ham(hashes[a], hashes[b]) <= max_hamming
    }
    assert got == want
