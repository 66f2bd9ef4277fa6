"""Structured Streaming extensions: every streaming result must equal its
batch twin on the same closed input (availableNow drain)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_ctd_spark.streaming import (
    event_stream,
    run_to_memory,
    session_windows,
    stateful_despike,
    stateful_press_check,
    streaming_bindata,
    windowed_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Multi-file event archive: 3 parquet files -> 3 micro-batches.

    Files are range-partitioned by time (an archive grows in arrival
    order) so the watermark doesn't legitimately discard whole batches as
    late data.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = str(tmp_path_factory.mktemp("events_stream"))
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .repartitionByRange(3, "ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    # The file source orders micro-batches by modification time; the writer
    # stamps all parts identically, so make arrival order = time-range
    # order explicitly (part-00000 holds the earliest ts range).
    import glob
    import os
    import time

    t0 = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{out}/part-*.parquet"))):
        os.utime(f, (t0 + 10 * i, t0 + 10 * i))
    return out


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    df = spark.read.parquet(events_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = df.withColumn("event_time", F.col("ts"))
    return df.cache()


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_windowed_stats_matches_batch(spark, events_dir, batch_events):
    sdf = event_stream(spark, events_dir)
    got = run_to_memory(
        windowed_stats(sdf, window="1 day"), "t_win", output_mode="complete"
    ).toPandas()
    exp = (
        batch_events.groupBy(F.window("event_time", "1 day").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
            "user_id", "n_events", "sum_value", "max_value",
        )
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_sliding_window_covers_each_event_twice(spark, events_dir):
    sdf = event_stream(spark, events_dir)
    got = run_to_memory(
        windowed_stats(sdf, window="2 days", slide="1 day"), "t_slide",
        output_mode="complete",
    ).toPandas()
    n_total = got.groupby("user_id").n_events.sum()
    # every event lands in exactly two sliding windows
    assert (n_total % 2 == 0).all()


def test_session_windows_match_batch(spark, events_dir, batch_events):
    sdf = event_stream(spark, events_dir)
    got = run_to_memory(
        session_windows(sdf, gap="6 hours"), "t_sess", output_mode="complete"
    ).toPandas()
    exp = (
        batch_events.groupBy(
            F.session_window("event_time", "6 hours").alias("s"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("s_start"), F.col("s.end").alias("s_end"),
            "user_id", "n_events",
        )
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_streaming_bindata_matches_batch(spark, events_dir, batch_events):
    """Complete-mode bin rollup on a closed input == the identical batch
    aggregation (delta-aligned right-closed bins, decimal-avg)."""
    sdf = event_stream(spark, events_dir)
    got = run_to_memory(
        streaming_bindata(sdf, delta=100.0), "t_bindata", output_mode="complete"
    ).toPandas()
    p = F.col("value").cast("double")
    left = (F.ceil(p / F.lit(100.0)) - 1).cast("double") * F.lit(100.0)
    exp = (
        batch_events.withColumn("bin_center", left + F.lit(50.0))
        .groupBy("user_id", "bin_center")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
                / F.count(F.col("value"))
            ).alias("mean_value"),
        )
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_stateful_despike_matches_batch_prefix(spark, events_dir, batch_events):
    """Every emitted row's verdict equals the batch kernel's on the same
    cast; emitted rows are exactly the positions with 2*block-1 rows of
    lookahead at the end of the drain (the stable prefix per cast)."""
    import numpy as np

    from python_ctd_spark.functions.signal_numpy import despike_kernel

    block = 10
    sdf = event_stream(spark, events_dir)
    got = run_to_memory(
        stateful_despike(sdf, n1=1.0, n2=2.0, block=block), "t_despike"
    ).toPandas()
    assert len(got) > 0

    batch = batch_events.orderBy("user_id", "event_time", "event_id").toPandas()
    exp_rows = []
    for uid, grp in batch.groupby("user_id"):
        vals = grp["value"].astype(float).to_numpy()
        stable = max(0, len(vals) - (2 * block - 1))
        cleaned = despike_kernel(vals, n1=1.0, n2=2.0, block=block)
        for i in range(stable):
            exp_rows.append(
                (int(uid), int(grp["event_id"].iloc[i]), float(vals[i]), cleaned[i])
            )
    exp = pd.DataFrame(exp_rows, columns=["user_id", "event_id", "value", "despiked"])
    assert len(got) == len(exp)
    g = got.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["event_id"].to_numpy(), e["event_id"].to_numpy())
    np.testing.assert_allclose(
        g["despiked"].to_numpy(), e["despiked"].to_numpy(), rtol=0, atol=0
    )


def test_stateful_press_check_matches_batch_operator(spark, events_dir, batch_events):
    from python_ctd_spark.operators.ordered import press_check

    sdf = event_stream(spark, events_dir)
    got = run_to_memory(stateful_press_check(sdf, "value"), "t_press").toPandas()

    batch = batch_events.withColumn("pressure", F.col("value"))
    exp = (
        press_check(
            batch, cols=["pressure"],
            by="user_id", order=["event_time", "event_id"], pressure="value",
        )
        .select("user_id", "event_id", "pressure")
        .toPandas()
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp))


def test_stateful_despike_out_of_order_across_triggers(spark, tmp_path):
    """Bounded-disorder mode: rows arriving out of event-time order
    across triggers are merged into the buffer and sealed-region
    emission keeps verdicts equal to the batch kernel over the fully
    sorted archive; a row older than the disorder bound is discarded —
    the watermark contract — instead of corrupting finalized verdicts.

    Timeline: one cast, events at 1 s spacing.  Trigger 1 delivers
    ids 0-39 except 30 and 33; trigger 2 delivers 30, 33 (insertions
    within the 15 s disorder bound), ids 40-59, and one row at t=5.5 s
    (behind the seal — discarded).  With D=15 s the final seal is
    t(59)-15 = t(44), so positions 0..(45 - (2*block-1) - 1) = 0..35
    finalize; the rest awaits close-out."""
    import glob
    import os
    import time

    import numpy as np

    from python_ctd_spark.functions.signal_numpy import despike_kernel

    block = 5  # lookahead horizon 2*block - 1 = 9
    rng = np.random.RandomState(3)
    vals = rng.uniform(0, 100, 60)
    base_us = 1_700_000_000_000_000

    def rows(ids):
        return pd.DataFrame(
            {
                "event_id": [int(i) for i in ids],
                "ts": pd.to_datetime([base_us + int(i) * 1_000_000 for i in ids], unit="us"),
                "user_id": [1] * len(ids),
                "value": [float(vals[i % 60]) if i < 60 else 55.5 for i in ids],
            }
        )

    held = {30, 33}
    f1_ids = [i for i in range(40) if i not in held]
    late_id = 1000  # event-time of position 5 -> behind the frontier
    f2 = rows(sorted(held) + list(range(40, 60)))
    f2 = pd.concat(
        [f2, rows([late_id]).assign(ts=pd.to_datetime([base_us + 5_500_000], unit="us"))],
        ignore_index=True,
    )

    out = str(tmp_path / "ooo_events")
    t0 = time.time() - 100
    for i, pdf in enumerate((rows(f1_ids), f2)):
        before = set(glob.glob(f"{out}/part-*.parquet"))
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(out)
        for f in set(glob.glob(f"{out}/part-*.parquet")) - before:
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))

    got = run_to_memory(
        stateful_despike(
            event_stream(spark, out),
            n1=1.0,
            n2=2.0,
            block=block,
            max_disorder_us=15_000_000,
        ),
        "t_despike_ooo",
    ).toPandas()

    assert late_id not in set(got["event_id"])  # sealed-boundary discard

    verdicts = got.sort_values("event_id")
    cleaned = despike_kernel(vals, n1=1.0, n2=2.0, block=block)
    sealed = 45  # events with t <= t(59) - 15s, i.e. ids 0..44
    stable = sealed - (2 * block - 1)
    assert verdicts["event_id"].tolist() == list(range(stable))
    np.testing.assert_allclose(
        verdicts["despiked"].to_numpy(), cleaned[:stable], rtol=0, atol=0
    )


def test_windowed_stats_parquet_sink_exactly_once(spark, tmp_path):
    """The checkpointed parquet sink across two drains of a growing
    archive: the second drain processes only the new files, append-mode
    windows emit exactly once (no duplicates across drains), and every
    emitted row equals the batch aggregate over the full archive."""
    import glob
    import os
    import time

    from python_ctd_spark.streaming.pipeline import run_to_parquet

    base_us = 1_700_000_000_000_000
    day = 86_400_000_000

    def mk(ids_days):
        return pd.DataFrame(
            {
                "event_id": [i for i, _ in ids_days],
                "ts": pd.to_datetime(
                    [base_us + int(d * day) for _, d in ids_days], unit="us"
                ),
                "user_id": [1] * len(ids_days),
                "value": [float(i) for i, _ in ids_days],
            }
        )

    src = str(tmp_path / "arch")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = time.time() - 100

    def append_file(pdf, i):
        before = set(glob.glob(f"{src}/part-*.parquet"))
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(f"{src}/part-*.parquet")) - before:
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))

    # phase 1: events on days 0 and 1 -> watermark passes day-0 window
    append_file(mk([(1, 0.1), (2, 0.4)]), 0)
    append_file(mk([(3, 1.5)]), 1)
    run_to_parquet(
        windowed_stats(event_stream(spark, src), window="1 day", watermark="1 hour"),
        sink, ckpt,
    )
    first = spark.read.parquet(sink).toPandas()
    assert len(first) >= 1  # day-0 window sealed by the day-1 event

    # phase 2: a day-3 event seals the day-1 window; same checkpoint
    append_file(mk([(4, 3.2)]), 2)
    run_to_parquet(
        windowed_stats(event_stream(spark, src), window="1 day", watermark="1 hour"),
        sink, ckpt,
    )
    got = spark.read.parquet(sink).toPandas()
    # exactly once: no window emitted twice across the two drains
    assert not got.duplicated(subset=["w_start", "user_id"]).any()
    assert len(got) > len(first)  # the second drain made progress

    # every emitted row equals the batch aggregate over the full archive
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 day").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
            "user_id", "n_events", "sum_value", "max_value",
        )
        .toPandas()
    )
    merged = got.merge(batch, on=["w_start", "user_id"], suffixes=("", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_events"] == merged["n_events_b"]).all()
    assert (merged["sum_value"] == merged["sum_value_b"]).all()


def test_despike_closeout_completes_the_stream(spark, events_dir, batch_events):
    """stateful_despike emissions plus the batch close-out equal the
    batch kernel over the whole archive, cast by cast, row for row —
    the late-finalization contract closed end to end."""
    import numpy as np

    from python_ctd_spark.functions.signal_numpy import despike_kernel
    from python_ctd_spark.streaming import despike_closeout

    block = 10
    emitted = run_to_memory(
        stateful_despike(event_stream(spark, events_dir), n1=1.0, n2=2.0, block=block),
        "t_despike_close",
    ).toPandas()
    tail = despike_closeout(batch_events, n1=1.0, n2=2.0, block=block).toPandas()

    got = (
        pd.concat([emitted, tail], ignore_index=True)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    batch = batch_events.orderBy("user_id", "event_time", "event_id").toPandas()
    exp_rows = []
    for uid, grp in batch.groupby("user_id"):
        vals = grp["value"].astype(float).to_numpy()
        cleaned = despike_kernel(vals, n1=1.0, n2=2.0, block=block)
        for i in range(len(vals)):
            exp_rows.append((int(uid), int(grp["event_id"].iloc[i]), cleaned[i]))
    exp = (
        pd.DataFrame(exp_rows, columns=["user_id", "event_id", "despiked"])
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)  # no overlap, no gap
    np.testing.assert_array_equal(got["event_id"].to_numpy(), exp["event_id"].to_numpy())
    np.testing.assert_allclose(
        got["despiked"].to_numpy(), exp["despiked"].to_numpy(), rtol=0, atol=0
    )


def test_stream_stream_join_matches_batch(spark, events_dir, batch_events):
    """The attribution join drained over the replayed archive equals the
    identical batch join — inner-join emission is not watermark-gated,
    so the closed input yields every match."""
    from python_ctd_spark.streaming import event_stream, run_to_memory, stream_stream_join

    sdf = event_stream(spark, events_dir)
    res = stream_stream_join(sdf, within="6 hours", watermark="12 hours")
    got = run_to_memory(res, "tss_join").select(
        "user_id", "l_id", "r_id", "l_time", "r_time"
    ).toPandas()

    b = batch_events
    l = b.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("l_id"), F.col("event_time").alias("l_time")
    )
    r = b.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ru"), F.col("event_id").alias("r_id"),
        F.col("event_time").alias("r_time"),
    )
    want = l.join(
        r,
        (F.col("user_id") == F.col("ru"))
        & (F.col("r_time") >= F.col("l_time"))
        & (F.col("r_time") <= F.col("l_time") + F.expr("INTERVAL 6 HOURS")),
    ).drop("ru").toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))
    assert len(got) > 0


def test_dedup_stream_restores_original_from_redelivered_archive(spark, events_dir, batch_events):
    """Every shard redelivered once -> the raw drain doubles the rows,
    dropDuplicatesWithinWatermark restores the original set exactly."""
    import glob
    import os
    import shutil

    from python_ctd_spark.streaming import dedup_stream, event_stream, run_to_memory

    dup_dir = events_dir + "_dup"
    if not os.path.isdir(dup_dir):
        os.makedirs(dup_dir)
        t0 = os.path.getmtime(events_dir) - 2000
        for i, f in enumerate(sorted(glob.glob(f"{events_dir}/part-*.parquet"))):
            a, b = f"{dup_dir}/a{i:02d}.parquet", f"{dup_dir}/b{i:02d}.parquet"
            shutil.copy(f, a), shutil.copy(f, b)
            os.utime(a, (t0 + 20 * i,) * 2)
            os.utime(b, (t0 + 20 * i + 10,) * 2)

    n_orig = batch_events.count()
    raw = run_to_memory(event_stream(spark, dup_dir), "tsd_raw")
    assert raw.count() == 2 * n_orig  # redelivery really doubles the input
    deduped = run_to_memory(
        dedup_stream(event_stream(spark, dup_dir), keys=["event_id"]), "tsd_dedup"
    )
    got = deduped.select("event_id").toPandas().event_id.sort_values().to_numpy()
    want = batch_events.select("event_id").toPandas().event_id.sort_values().to_numpy()
    assert (got == want).all()


def test_stream_static_enrich_matches_batch_join(spark, events_dir, batch_events):
    """The stream-static broadcast enrichment drained over the replayed
    archive equals the batch left join; users without a dimension row
    survive with NULL (left semantics), and row count is preserved."""
    from python_ctd_spark.streaming import event_stream, run_to_memory, stream_static_enrich

    dim = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 2, 3], "tier": ["gold", "silver", "gold"]})
    )
    sdf = event_stream(spark, events_dir).select("event_id", "user_id", "value")
    got = run_to_memory(
        stream_static_enrich(sdf, dim, ["user_id"]), "tsse"
    ).toPandas()
    want = (
        batch_events.select("event_id", "user_id", "value")
        .join(F.broadcast(dim), ["user_id"], "left")
        .toPandas()
    )
    assert len(got) == len(want) == batch_events.count()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_despike_closeout_prunes_partitioned_archive(spark, tmp_path, batch_events):
    """The 100 TB close-out path: the archive written date-partitioned,
    the caller prunes to the recent partitions before the operator —
    the scan must show PartitionFilters (directories skipped, not rows
    filtered), and the close-out over the pruned slice equals the
    close-out over a same-content unpartitioned frame."""
    from python_ctd_spark.streaming import despike_closeout

    path = str(tmp_path / "archive")
    (
        batch_events.withColumn("d", F.to_date("event_time"))
        .write.mode("overwrite").partitionBy("d").parquet(path)
    )
    back = spark.read.parquet(path)
    days = sorted(r["d"] for r in back.select("d").distinct().collect())
    recent = back.filter(F.col("d") >= days[len(days) // 2])
    plan = recent._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(d" in plan, plan

    got = despike_closeout(recent, n1=1.0, n2=2.0, block=10).toPandas()
    want_src = batch_events.filter(
        F.to_date("event_time") >= days[len(days) // 2]
    )
    want = despike_closeout(want_src, n1=1.0, n2=2.0, block=10).toPandas()
    key = ["user_id", "event_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns],
        want.sort_values(key).reset_index(drop=True),
    )
    assert len(got) > 0


def test_streaming_ann_probe_equals_batch_lsh_probe(spark, tmp_path):
    """Streaming ANN serving twin law: a closed archive of query vectors
    drained through streaming_ann_probe (stream-static probes of a
    stored-shape LSH index, windowed top-k) equals batch lsh_probe with
    the same (planes, tables, dim, probe-bits) on the same query set —
    including cos values and ranks."""
    from python_ctd_spark.operators.similarity import lsh_index, lsh_probe
    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_ann_probe,
    )

    kw = dict(n_planes=4, n_tables=2, dim=8, n_probe_bits=1)
    rng = __import__("numpy").random.default_rng(21)
    vecs = rng.normal(size=(40, 8)).round(3)
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [list(v) for v in vecs]})
    )
    ix = lsh_index(corpus, n_planes=4, n_tables=2, dim=8)

    # query archive: 3 time-ordered files -> 3 micro-batches, plus a
    # far-future sentinel file that advances the watermark past every
    # real window (append mode emits a window only once the watermark
    # passes its end)
    n_q = 9
    qpdf = pd.DataFrame(
        {
            "vec_id": range(n_q),
            "embedding": [list(v) for v in vecs[:n_q]],
            "event_time": pd.to_datetime(
                [f"2024-01-0{1 + i % 3} 0{i % 9}:00:00" for i in range(n_q)]
            ),
        }
    )
    # arrival order = event-time order (a growing archive is
    # time-ordered); out-of-order files would fall behind the watermark
    qpdf = qpdf.sort_values("event_time", kind="mergesort").reset_index(drop=True)
    sentinel = pd.DataFrame(
        {
            "vec_id": [999],
            "embedding": [list(vecs[0])],
            "event_time": [pd.Timestamp("2024-03-01 00:00:00")],
        }
    )
    src = str(tmp_path / "queries")
    import os
    import time

    os.makedirs(src)
    t0 = time.time() - 100
    for i, part in enumerate((qpdf.iloc[:3], qpdf.iloc[3:6], qpdf.iloc[6:9], sentinel)):
        p = f"{src}/part-{i}.parquet"
        # pandas defaults to TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects without the nanosAsLong legacy conf — write us
        part.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    q_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with state_partitions(spark, 4):
        got_df = run_to_memory(
            streaming_ann_probe(
                q_stream, ix, corpus, k=3, window="1 day",
                watermark="1 hour", **kw,
            ),
            "ann_probe_stream",
        )
    got = {
        (r["qid"], r["id"], r["rk"], r["cos"])
        for r in got_df.collect()
        if r["qid"] != 999
    }

    queries = corpus.filter(f"vec_id < {n_q}")
    expected = {
        (r["qid"], r["id"], r["rk"], r["cos"])
        for r in lsh_probe(ix, corpus, queries, k=3, **kw).collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_incremental_dedup_equals_batch(spark, tmp_path):
    """Rolling-ingest dedup twin law: a closed archive of arriving
    documents drained through streaming_incremental_dedup (stream-static
    probes of the stored MinHash band index) yields the same verdicts —
    is_dup, n_dups, matched_id, best_jaccard — as batch
    incremental_dedup over the same docs, including candidate-less
    documents (is_dup=false rows must not vanish)."""
    from python_ctd_spark.operators.dedup import (
        band_rows, incremental_dedup, minhash_signatures,
    )
    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0 AND doc_id < 250")
    index = minhash_signatures(old)

    expected = {
        (r["doc_id"], r["is_dup"], r["n_dups"], r["matched_id"], r["best_jaccard"])
        for r in incremental_dedup(new, index, threshold=0.5).collect()
    }
    assert any(e[1] for e in expected), "fixture must contain real dups"
    assert any(not e[1] for e in expected), "fixture must contain non-dups"

    # time-ordered 3-file archive + far-future sentinel to advance the
    # watermark past every real window
    npdf = new.toPandas().sort_values("doc_id").reset_index(drop=True)
    npdf["event_time"] = pd.to_datetime(
        [f"2024-01-0{1 + i % 2} 0{i % 7}:00:00" for i in range(len(npdf))]
    )
    # arrival order must be event-time order (as the events_dir fixture:
    # a growing archive is time-ordered) — otherwise rows in later files
    # fall behind the watermark the earlier files advanced and are
    # legitimately discarded as late
    npdf = npdf.sort_values("event_time", kind="mergesort").reset_index(drop=True)
    sentinel = pd.DataFrame(
        {
            "doc_id": [10**9],
            "text": ["sentinel advance the watermark"],
            "event_time": [pd.Timestamp("2024-03-01 00:00:00")],
        }
    )
    import os
    import time

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    third = len(npdf) // 3
    parts = (npdf.iloc[:third], npdf.iloc[third: 2 * third], npdf.iloc[2 * third:], sentinel)
    t0 = time.time() - 100
    for i, part in enumerate(parts):
        p = f"{src}/part-{i}.parquet"
        part.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    doc_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with state_partitions(spark, 4):
        got_df = run_to_memory(
            streaming_incremental_dedup(
                doc_stream, index,
                index_banded=band_rows(minhash_signatures(old), 8, 2),
                threshold=0.5, window="1 day", watermark="1 hour",
            ),
            "inc_dedup_stream",
        )
    got = {
        (r["doc_id"], r["is_dup"], r["n_dups"], r["matched_id"], r["best_jaccard"])
        for r in got_df.collect()
        if r["doc_id"] != 10**9
    }
    assert got == expected


def test_streaming_strip_boilerplate_equals_batch(spark, tmp_path):
    """Ingest-time cleaning twin law (new r10): arriving documents
    drained through streaming_strip_boilerplate (stream-static
    broadcast of the stored template keys + one watermarked windowed
    rebuild) carry exactly the batch strip_boilerplate verdicts —
    text_clean, n_lines, n_boiler — under a multi-file replay,
    including documents with nothing to strip."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.text import strip_boilerplate
    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_strip_boilerplate,
    )

    chrome = "accept all cookies to continue"
    rows = [(i, f"{chrome} real content {i} more body {i * 3}")
            for i in range(30)] + [(97, "nothing shared here at all")]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    expected = {
        (r["doc_id"], r["n_lines"], r["n_boiler"], r["text_clean"])
        for r in strip_boilerplate(corpus, min_docs=20, sep=" ").collect()
    }
    assert any(e[2] > 0 for e in expected) and any(e[2] == 0 for e in expected)

    # the stored template index (mined from the same corpus)
    lines = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("__line")
    ).filter(F.length(F.trim("__line")) >= 4)
    boiler = (
        lines.select(F.md5(F.trim("__line")).alias("__key"), "doc_id")
        .distinct().groupBy("__key").agg(F.count(F.lit(1)).alias("df"))
        .filter("df >= 20").select("__key")
    )

    import os
    import time

    npdf = corpus.toPandas().sort_values("doc_id").reset_index(drop=True)
    npdf["event_time"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        npdf["doc_id"] % 12, unit="h"
    )
    npdf = npdf.sort_values("event_time", kind="mergesort").reset_index(drop=True)
    sentinel = pd.DataFrame({
        "doc_id": [10**9], "text": ["sentinel"],
        "event_time": [pd.Timestamp("2024-03-01")],
    })
    src = str(tmp_path / "clean_stream")
    os.makedirs(src)
    half = len(npdf) // 2
    t0 = time.time() - 100
    for i, part in enumerate((npdf.iloc[:half], npdf.iloc[half:], sentinel)):
        p = f"{src}/part-{i}.parquet"
        part.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(p, (t0 + i, t0 + i))

    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with state_partitions(spark, 4):
        got_df = run_to_memory(
            streaming_strip_boilerplate(
                sdf, boiler, sep=" ", min_line_chars=4,
                window="1 day", watermark="1 hour",
            ),
            "clean_stream_tbl",
        )
    got = {
        (r["doc_id"], r["n_lines"], r["n_boiler"], r["text_clean"])
        for r in got_df.collect() if r["doc_id"] != 10**9
    }
    assert got == expected


def test_streaming_quality_twin_and_stateless(spark):
    """New r11 (11th streaming row): classifier scoring at ingest is
    STATELESS — the drained stream equals batch scoring row-for-row,
    and the streaming plan carries no state store (no watermark, no
    aggregation: the sidecar shape that adds zero state at any rate)."""
    import pandas as pd

    import __spark_entry__ as entrymod
    from python_ctd_spark.operators.classify import (
        DEMO_WEIGHTS, score_quality_classifier,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = (
        entrymod.queries()["streaming_quality"](spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id % 5 = 0 AND doc_id < 2000")
    want = (
        score_quality_classifier(docs, DEMO_WEIGHTS)
        .select("doc_id", "quality_prob")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    # statelessness asserted on the PLAN, not inferred from the drain:
    # rebuild the streaming frame the row builds and pin that its
    # analyzed plan has no watermark / aggregate / dedup operator
    import glob

    stage_dirs = sorted(glob.glob("/tmp/quality_stream_*"))
    assert stage_dirs, "the row's staged shard should exist"
    schema = spark.read.parquet(stage_dirs[-1]).schema
    sdf = spark.readStream.schema(schema).parquet(stage_dirs[-1])
    scored = score_quality_classifier(sdf, DEMO_WEIGHTS).select(
        "doc_id", "quality_prob"
    )
    assert scored.isStreaming
    plan = scored._jdf.queryExecution().analyzed().toString()
    for stateful in ("EventTimeWatermark", "Aggregate", "Deduplicate"):
        assert stateful not in plan, f"stateless row grew a {stateful}"


def test_streaming_markup_twin_and_stateless(spark):
    """12th streaming row: HTML extraction at ingest is STATELESS — the
    drained stream equals the batch chain row-for-row, and the
    streaming plan carries no state store (no watermark, no
    aggregation: the text-extraction sidecar adds zero state at any
    ingest rate)."""
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from python_ctd_spark.operators.markup import strip_markup
    from tools.oracles.text import _MARKUP_SYNTH_SPARK_EXPR

    sf_dir = "/root/testdata/sf0.001"
    got = (
        entrymod.queries()["streaming_markup"](spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id % 5 = 0 AND doc_id < 2000")
    want = (
        strip_markup(
            docs.withColumn("html", F.expr(_MARKUP_SYNTH_SPARK_EXPR)), "html"
        )
        .select("doc_id", "n_tag", "n_entities", "text_plain")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    # statelessness asserted on the PLAN, not inferred from the drain
    import glob

    stage_dirs = sorted(glob.glob("/tmp/markup_stream_*"))
    assert stage_dirs, "the row's staged shard should exist"
    schema = spark.read.parquet(stage_dirs[-1]).schema
    sdf = spark.readStream.schema(schema).parquet(stage_dirs[-1])
    stripped = strip_markup(
        sdf.withColumn("html", F.expr(_MARKUP_SYNTH_SPARK_EXPR)), "html"
    ).select("doc_id", "n_tag", "n_entities", "text_plain")
    assert stripped.isStreaming
    plan = stripped._jdf.queryExecution().analyzed().toString()
    for stateful in ("EventTimeWatermark", "Aggregate", "Deduplicate"):
        assert stateful not in plan, f"stateless row grew a {stateful}"
