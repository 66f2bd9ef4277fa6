"""Structured Streaming extensions.

The reference (pyoceans/python-ctd) is batch-only over closed files
(SURVEY.md §2.10 — no watermarks/session windows/state anywhere in
``ctd/*.py``); this module is the engine extension for live instrument /
event feeds, built on the idiomatic Spark surface:

- ``readStream`` file source over the same parquet layout the batch engine
  reads — a cast archive that *grows* gets incremental processing with the
  identical schema;
- event-time **tumbling/sliding windows + watermark** for late data
  (``windowed_stats``);
- native **session windows** (``F.session_window``) for activity
  sessionization — the streaming twin of the batch ``sessionize`` query;
- **applyInPandasWithState** for custom per-key state
  (``stateful_press_check``: the reference's press_check running-max rule
  , ctd/processing.py:93-109, applied incrementally — state is one double
  per cast).

Every aggregation here is in append/update-compatible form, so outputs
stay correct under retriggering; at scale, state is partitioned by
``user_id`` (= cast) exactly like the batch windows, and watermarks bound
the state store.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


#: event-time column: nanosecond-long parquet timestamps get the same
#: `ts div 1000` truncation the batch path uses; TIMESTAMP_NTZ (the
#: timestamp[us] parquet encoding) is cast to TIMESTAMP because watermarks
#: require an instant type — the cast interprets the naive value in the
#: session timezone, which event_stream pins to UTC so the instant equals
#: the naive micros (and DuckDB's epoch_us); typed timestamps pass through.
def _with_event_time(df: DataFrame) -> DataFrame:
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("event_time", F.col("ts").cast("timestamp"))
    return df.withColumn("event_time", F.col("ts"))


def event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files (the
    growing-archive layout).  One file per trigger, so even a closed test
    directory exercises real incremental micro-batches."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ->TIMESTAMP cast in _with_event_time depends on this:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return _with_event_time(sdf)


def windowed_stats(
    sdf: DataFrame,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time windowed per-user stats with a watermark bounding state.

    Tumbling when ``slide`` is None, else sliding.  Aggregates are
    append-mode compatible once the watermark passes the window end.
    """
    win = (
        F.window("event_time", window)
        if slide is None
        else F.window("event_time", window, slide)
    )
    return (
        sdf.withWatermark("event_time", watermark)
        .groupBy(win.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "user_id",
            "n_events",
            "sum_value",
            "max_value",
        )
    )


def session_windows(
    sdf: DataFrame, gap: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Native session windows per user: a session closes after ``gap`` of
    inactivity — the streaming twin of the batch sessionize query (which
    uses lag-diff + cumulative sum)."""
    return (
        sdf.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_press_check(sdf: DataFrame, pressure: str = "value") -> DataFrame:
    """Streaming press_check (reference ctd/processing.py:93-109): NULL
    any arriving row whose pressure is below the running max of *earlier*
    rows of the same cast.  State per cast = one double (the running max),
    carried across triggers via ``applyInPandasWithState``.

    Note the within-batch order is event-time order (the file source
    delivers in file order; a production feed would sort each micro-batch
    by event time, as done here).
    """
    out_schema = "user_id bigint, event_id bigint, pressure double"
    state_schema = "mx double"

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (mx,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            pdf = pdf.sort_values(["event_time", "event_id"], kind="mergesort")
            out_p = []
            for p in pdf[pressure].astype(float):
                out_p.append(None if (mx is not None and p < mx) else p)
                mx = p if mx is None else max(mx, p)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "pressure": out_p,
                }
            )
        state.update((mx,))

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_bindata(
    sdf: DataFrame,
    delta: float = 100.0,
    value_col: str = "value",
    by: str = "user_id",
    pressure: str = "value",
) -> DataFrame:
    """Streaming pressure-bin averages: the incremental twin of the batch
    ``bindata`` aggregate (reference ctd/processing.py:112-129).

    Bins are right-closed ``(a, a+delta]`` exactly like the batch
    operator's pd.cut semantics, but **delta-aligned to a global origin**
    instead of each cast's first pressure — a cast's start is a
    stream-order quantity no windowless aggregate can see, and the
    aligned grid is what an incremental rollup needs anyway: state is one
    row per (cast, bin), updatable in any arrival order, no tail rule.
    Empty-bin rows (a batch-side grid join) have no streaming meaning and
    are deliberately absent.

    Aggregates use the engine's decimal-sum/count form, so on a closed
    input the complete-mode result is bit-identical to the same batch
    aggregation (the streaming==batch twin law, tested per operator).
    """
    p = F.col(pressure).cast("double")
    # right-closed: p in (a, a+delta] -> bin index ceil(p/delta) - 1
    left = (F.ceil(p / F.lit(float(delta))) - 1).cast("double") * F.lit(float(delta))
    return (
        sdf.withColumn("bin_center", left + F.lit(float(delta) / 2.0))
        .groupBy(by, "bin_center")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col(value_col).cast("decimal(25,6)")).cast("double")
                / F.count(F.col(value_col))
            ).alias("mean_value"),
        )
    )


def stateful_despike(
    sdf: DataFrame,
    n1: float = 2.0,
    n2: float = 20.0,
    block: int = 100,
    pressure: str = "value",
) -> DataFrame:
    """Streaming Sea-Bird Wild-Edit despike via bounded per-cast
    buffering (reference ctd/processing.py:146-194 incrementally).

    The kernel's two forward-looking rolling windows mean a row's verdict
    is final only once ``2*block - 1`` later rows exist: pass 2's stats
    at position ``i`` read pass-1-cleaned values through
    ``i + 2*block - 2``, and the tail rule ("reuse the last complete
    window's stats") depends on where the cast *ends*.  So state per cast
    is a ring of the last ``2*block`` rows; each trigger appends the new
    rows, runs the exact batch kernel
    (functions/signal_numpy.despike_kernel) over the buffer, emits every
    position old enough that appends can no longer change it, and keeps
    the rest buffered.  Emitted verdicts are therefore *identical* to the
    batch operator's on the same prefix — the twin law tested in
    tests/test_streaming.py — and the final ``2*block`` rows of a cast
    finalize when the cast closes (a batch close-out over the archive
    tail, the same late-finalization contract as any watermarked sink).

    State is O(block) doubles per live cast; at fleet scale that is
    ~3 KB per cast for the default block=100.
    """
    from python_ctd_spark.functions.signal_numpy import despike_kernel

    out_schema = "user_id bigint, event_id bigint, value double, despiked double"
    state_schema = "eid array<bigint>, tsu array<bigint>, v array<double>"

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        if state.exists:
            eid, tsu, v = state.get
            eid, tsu, v = list(eid), list(tsu), list(v)
        else:
            eid, tsu, v = [], [], []
        # one sort over the whole trigger's rows: the group's Arrow chunks
        # carry no cross-chunk order guarantee
        new = pd.concat(list(pdfs), ignore_index=True)
        if len(new):
            new = new.sort_values(["event_time", "event_id"], kind="mergesort")
            eid.extend(int(x) for x in new["event_id"])
            tsu.extend(int(x.value) for x in pd.to_datetime(new["event_time"]))
            v.extend(float(x) for x in new[pressure])
        n = len(v)
        # positions < n - (2*block - 1) can't be changed by later appends
        stable = max(0, n - (2 * block - 1))
        if stable > 0:
            cleaned = despike_kernel(np.asarray(v, dtype=float), n1=n1, n2=n2, block=block)
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])] * stable,
                    "event_id": eid[:stable],
                    "value": v[:stable],
                    "despiked": cleaned[:stable],
                }
            )
        state.update((eid[stable:], tsu[stable:], v[stable:]))

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    result: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a streaming DataFrame with an availableNow trigger into a
    memory sink and return the collected table (test/drive helper)."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)
