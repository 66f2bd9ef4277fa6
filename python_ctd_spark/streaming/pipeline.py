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
