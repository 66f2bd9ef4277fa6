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

from contextlib import contextmanager
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


def event_stream(
    spark: SparkSession, events_dir: str, max_files: int | None = 1
) -> DataFrame:
    """File-source stream over a directory of event parquet files (the
    growing-archive layout).  ``max_files`` (default 1) is the
    per-trigger file cap: one file per trigger exercises real
    incremental micro-batches even on a closed test directory — the
    setting the twin-law tests replay under.  ``max_files=None`` lets an
    availableNow drain take the whole closed archive in ONE micro-batch:
    identical output for every operator whose result is
    batching-invariant (complete-mode aggregates, watermarked windows
    with a closing sentinel, dropDuplicates, stateless joins, the
    stable-prefix stateful kernels — i.e. the twin laws), at a third of
    the per-trigger fixed cost; the bench drains use it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ->TIMESTAMP cast in _with_event_time depends on this:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files))
    return _with_event_time(reader.parquet(events_dir))


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
    max_disorder_us: int | None = None,
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

    **Out-of-order arrival.**  Count-based stability ("2*block-1 rows
    exist after me") is only valid for append-only arrival: a later
    *insertion* inside an emitted row's lookahead would falsify its
    verdict.  Two modes, chosen by ``max_disorder_us``:

    - ``None`` (default): the ordered-archive precondition — each cast's
      rows arrive in nondecreasing ``(event_time, event_id)`` order
      across triggers (in-trigger disorder is always fine; every trigger
      is sorted and merge-inserted).  A row arriving behind the emitted
      frontier is **discarded**, exactly as a watermarked aggregate
      discards late rows — never given a wrong verdict.  (A NULL-verdict
      flag would collide with the kernel's own spike-NULLs, so the
      discard is silent; an auditing pipeline should count frontier
      violations upstream.)
    - ``D`` microseconds: bounded-disorder mode, the per-cast watermark
      contract.  Rows with ``event_time <= max_seen - D`` are discarded
      at arrival; everything younger is merge-inserted.  A position is
      emitted only when its entire ``2*block - 1`` lookahead lies in the
      *sealed* region (keys ``<= max_seen - D``), which no future row
      can enter — so emitted verdicts equal the batch kernel over the
      fully sorted archive for ANY arrival order whose disorder stays
      within ``D``.  Emission lags arrival by ``D`` of event time, the
      usual latency/completeness trade.

    State is O(block) doubles per live cast; at fleet scale that is
    ~3 KB per cast for the default block=100.
    """
    from python_ctd_spark.functions.signal_numpy import despike_kernel

    out_schema = "user_id bigint, event_id bigint, value double, despiked double"
    state_schema = (
        "eid array<bigint>, tsu array<bigint>, v array<double>, "
        "lts bigint, leid bigint, mxts bigint"
    )
    horizon = 2 * block - 1
    # buffer timestamps are pandas .value epoch-NANOseconds; the API
    # takes the disorder bound in event-time MICROseconds (the parquet
    # resolution), so scale once here
    disorder_ns = None if max_disorder_us is None else int(max_disorder_us) * 1000

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import bisect

        import numpy as np

        if state.exists:
            eid, tsu, v, lts, leid, mxts = state.get
            eid, tsu, v = list(eid), list(tsu), list(v)
        else:
            eid, tsu, v, lts, leid, mxts = [], [], [], None, None, None
        # one sort over the whole trigger's rows: the group's Arrow chunks
        # carry no cross-chunk order guarantee
        new = pd.concat(list(pdfs), ignore_index=True)
        if len(new):
            new = new.sort_values(["event_time", "event_id"], kind="mergesort")
            nts = [int(x.value) for x in pd.to_datetime(new["event_time"])]
            neid = [int(x) for x in new["event_id"]]
            nv = [float(x) for x in new[pressure]]
            if max_disorder_us is None and lts is not None:
                # ordered-archive mode: discard rows behind the emitted
                # frontier rather than emit a wrong verdict
                fresh = [(t, e) > (lts, leid) for t, e in zip(nts, neid)]
            elif disorder_ns is not None and mxts is not None:
                # bounded-disorder mode: discard rows behind the sealed
                # boundary of the PREVIOUS trigger (what emissions used)
                seal = mxts - disorder_ns
                fresh = [t > seal for t in nts]
            else:
                fresh = [True] * len(nts)
            if not all(fresh):
                nts = [t for t, f in zip(nts, fresh) if f]
                neid = [e for e, f in zip(neid, fresh) if f]
                nv = [x for x, f in zip(nv, fresh) if f]
            if nts:
                mxts = max(mxts, nts[-1]) if mxts is not None else nts[-1]
            # merge-insert: the buffer holds O(block) rows, so a full
            # re-sort is cheap and makes cross-trigger reordering inside
            # the accepted region a no-op
            merged = sorted(zip(tsu, eid, v))
            merged.extend(zip(nts, neid, nv))
            merged.sort()
            tsu = [m[0] for m in merged]
            eid = [m[1] for m in merged]
            v = [m[2] for m in merged]
        n = len(v)
        if max_disorder_us is None:
            # append-only: positions < n - horizon can't change later
            stable = max(0, n - horizon)
        else:
            # a position is final once its whole lookahead is sealed
            # (no future arrival can sort at or before the seal)
            seal = (mxts - disorder_ns) if mxts is not None else None
            sealed = bisect.bisect_right(tsu, seal) if seal is not None else 0
            stable = max(0, sealed - horizon)
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
            lts, leid = tsu[stable - 1], eid[stable - 1]
        state.update((eid[stable:], tsu[stable:], v[stable:], lts, leid, mxts))

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def despike_closeout(
    batch_df: DataFrame,
    n1: float = 2.0,
    n2: float = 20.0,
    block: int = 100,
    pressure: str = "value",
) -> DataFrame:
    """Batch close-out for :func:`stateful_despike`: verdicts for the
    final ``2*block - 1`` rows of each cast, which the streaming
    operator rightly holds back (their verdicts depend on where the
    cast ends).  Run it over the closed archive once the cast stops
    growing; ``stateful_despike`` emissions ∪ ``despike_closeout`` ==
    the batch despike over the full archive, row for row (tested).

    Scale shape: the archive is TRIMMED to each cast's last ``2*block``
    rows JVM-side before anything crosses into Python.  This is exact,
    not approximate: a tail row's pass-1 stats come from its own anchor
    or the carry anchor at position n - block (windows covering rows
    n - 2*block .. n-1), and its pass-2 stats from pass-1 values of
    those same rows — the carry (``last_value ignore nulls``) can never
    reach further back because the anchor at n - block always has a
    full, non-null window.  So the kernel over the trimmed cast equals
    the full-cast kernel on every emitted row (tested against the
    full-archive oracle), and the close-out ships 2*block rows per cast
    at any archive size instead of the whole history.  The trim window
    rides the same cast-key partitioning the kernel's groupBy uses —
    one exchange total.
    """
    from pyspark.sql import Window

    from python_ctd_spark.functions.signal_numpy import despike_kernel

    out_schema = "user_id bigint, event_id bigint, value double, despiked double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["event_time", "event_id"], kind="mergesort")
        vals = pdf[pressure].astype(float).to_numpy()
        cleaned = despike_kernel(np.asarray(vals), n1=n1, n2=n2, block=block)
        stable = max(0, len(vals) - (2 * block - 1))
        tail = pdf.iloc[stable:]
        return pd.DataFrame(
            {
                "user_id": tail["user_id"].astype("int64"),
                "event_id": tail["event_id"].astype("int64"),
                "value": vals[stable:],
                "despiked": cleaned[stable:],
            }
        )

    w = Window.partitionBy("user_id").orderBy(
        F.col("event_time").desc(), F.col("event_id").desc()
    )
    trimmed = (
        batch_df.select("user_id", "event_id", "event_time", pressure)
        .withColumn("__rev", F.row_number().over(w))
        .filter(F.col("__rev") <= 2 * block)
        .drop("__rev")
    )
    return trimmed.groupBy("user_id").applyInPandas(fn, out_schema)


def run_to_parquet(
    result: DataFrame, path: str, checkpoint: str
) -> None:
    """Drain a streaming DataFrame into a parquet archive with an
    availableNow trigger and a durable checkpoint — the incremental
    production sink.

    The checkpoint carries the file-source offsets, watermark, and
    window state across drains, so re-running against a GROWN archive
    processes only the new files and append-mode windows emit **exactly
    once** — rerun, crash, or scheduler retry never duplicates a row in
    the sink (file sink + checkpoint is Spark's transactional pairing).
    Watermark-bounded aggregates emit a window only once the watermark
    passes its end; the final windows of a closed archive emit on the
    next drain that advances the watermark past them (or a close-out
    batch query over the archive tail — the same late-finalization
    contract as stateful_despike)."""
    q = (
        result.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Temporarily set ``spark.sql.shuffle.partitions`` around a
    streaming query start.

    A streaming query pins its state-store partition count to the
    shuffle-partition setting of its FIRST micro-batch (it is recorded in
    the checkpoint), and every subsequent trigger schedules that many
    state tasks.  Local drains over modest archives pay ~per-task
    overhead x partitions x triggers, so 32 state partitions on a
    single-JVM drain roughly doubles wall time vs 8 (measured at sf0.1:
    windowed stats 3.8s -> 2.1s, session windows 4.2s -> 1.8s,
    identical results).  On a cluster, size this to the peak keyed-state
    volume instead — the setting is per-query, not global; batch plans
    started outside the ``with`` block are unaffected."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def stream_static_enrich(
    sdf: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table
    (per-user metadata, quotas, routing) — stateless on the stream side,
    so it needs no watermark and stays append-mode at any rate.  The
    static side is planned per micro-batch (Spark re-resolves it each
    trigger, so a dimension refreshed in place is picked up) and is
    broadcast — the stream never shuffles for the enrichment."""
    from pyspark.sql import functions as F

    return sdf.join(F.broadcast(dim), on, how)


def stream_stream_join(
    sdf: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "6 hours",
    watermark: str = "12 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition —
    the attribution shape (every ``right_type`` event joined to the
    ``left_type`` events of the same user in the preceding ``within``).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, which is what lets Spark EVICT join state: a
    left row can only match rights in ``[l_time, l_time + within]``, so
    once the watermark passes that bound the row leaves the state store.
    Unbounded stream-stream joins (no time bound) grow state forever —
    the 100 TB trap this operator's signature makes unrepresentable.

    ``watermark`` must be >= ``within`` or in-order matches could be
    evicted before their partner arrives; on the closed, time-ordered
    archive the drain then equals the identical batch join (the
    streaming == batch twin law; inner-join emission is not gated on the
    watermark, only state cleanup is)."""
    l = (
        sdf.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("l_id"),
            F.col("event_time").alias("l_time"),
            F.col("value").alias("l_value"),
        )
        .withWatermark("l_time", watermark)
    )
    r = (
        sdf.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("r_id"),
            F.col("event_time").alias("r_time"),
            F.col("value").alias("r_value"),
        )
        .withWatermark("r_time", watermark)
    )
    return l.join(
        r,
        (F.col("user_id") == F.col("r_user"))
        & (F.col("r_time") >= F.col("l_time"))
        & (F.col("r_time") <= F.col("l_time") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).drop("r_user")


def dedup_stream(
    sdf: DataFrame,
    keys: Iterable[str] = ("event_id",),
    watermark: str = "12 hours",
) -> DataFrame:
    """Streaming deduplication: drop re-deliveries of the same event
    across micro-batches (at-least-once transport -> exactly-once
    pipeline input).

    ``dropDuplicatesWithinWatermark`` keeps one row per key and holds
    key state only until the watermark passes the first sighting —
    bounded state, unlike a plain streaming ``dropDuplicates`` whose key
    set grows forever.  The contract this buys: duplicates arriving
    within ``watermark`` of the original are dropped; re-deliveries
    later than that would pass (size the watermark to the transport's
    maximum redelivery lag)."""
    return sdf.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_ann_probe(
    q_stream: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    n_probe_bits: int = 2,
    window: str = "1 day",
    watermark: str = "1 hour",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Real-time ANN serving: a STREAM of query vectors probes a STORED
    LSH index and emits per-query top-k — the streaming completion of
    the lsh_index/lsh_probe serving story (queries arrive forever; the
    corpus index was written once).

    Plan, all stream-static and stateless until the final aggregate:
    the query stream is hashed with the same deterministic hyperplane
    basis as the index (signature_table — pure projections, so it runs
    on a streaming frame), multiprobe-fanned query-side only, equi-
    joined to the static ``index`` on (tbl, bkt), candidates' vectors
    fetched from static ``corpus`` by id, decimal-exact cosine per
    candidate.  The only stateful stage is the watermarked tumbling-
    window aggregate that assembles each query's top-k: dedup +
    ordering ride ONE ``collect_set`` of (neg_cos, id, cos) structs
    (array_sort on natural struct order = cos desc, id asc — the batch
    tie-break), sliced to k, then exploded to ranked rows.  State per
    key is O(candidates of one query), evicted at the watermark.

    Exactness: every candidate is scored with the decimal-exact cosine,
    so on a closed archive the drain equals batch ``lsh_probe`` with
    the same (n_planes, n_tables, dim, n_probe_bits) exactly — the
    epsilon-band prefilter the batch two-phase uses keeps, by
    construction, every vector the exact ranking can place in the
    top-k (streaming == batch twin law; pinned in
    tests/test_streaming.py)."""
    from python_ctd_spark.operators.similarity import (
        _as_double, _cos_exact, probe_masks, signature_table,
    )

    q = q_stream.select(
        F.col(id_col).alias("qid"),
        _as_double(vec_col).alias("qe"),
        # NTZ-tolerant, as _with_event_time: watermarks require TIMESTAMP
        F.col("event_time").cast("timestamp").alias("event_time"),
    ).withWatermark("event_time", watermark)
    qb = signature_table(
        q, ["qid", "qe", "event_time"], "qe", n_planes, n_tables, dim,
        persist=False,  # streaming frames cannot (and need not) persist
    )
    if n_probe_bits > 0:
        probes = F.array(
            *[
                F.col("bkt").bitwiseXOR(F.lit(m))
                for m in probe_masks(n_planes, n_probe_bits)
            ]
        )
        qb = qb.select(
            "qid", "qe", "event_time", "tbl", F.explode(probes).alias("bkt")
        )
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    # a pair surfaces once per shared (table, probe-mask) bucket — dedup
    # BEFORE the decimal-exact scoring (the batch op's dropDuplicates;
    # decimal folds are ~100x a double fold, so scoring duplicates is
    # the dominant waste).  Watermark-bounded state, evicted like the
    # window state.
    cand = (
        qb.join(index, ["tbl", "bkt"])
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "qe", "event_time", "id")
        .dropDuplicatesWithinWatermark(["qid", "id"])
        .join(c, "id")
    )
    cos = _cos_exact("qe", "e")
    # rank on the UNROUNDED cosine (the batch side rounds only on
    # output — rounding before the sort would turn near-ties at the
    # 6th decimal into real ties and flip ids at the k boundary)
    scored = cand.select("qid", "event_time", "id", cos.alias("cos"))
    agg = scored.groupBy(F.window("event_time", window), "qid").agg(
        F.slice(
            F.array_sort(
                F.collect_set(
                    F.struct(
                        (-F.col("cos")).alias("neg"),
                        F.col("id").alias("id"),
                        F.col("cos").alias("cos"),
                    )
                )
            ),
            1,
            k,
        ).alias("topk")
    )
    hit = F.col("hit")
    return agg.select(
        F.col("window.start").alias("window_start"),
        "qid",
        F.posexplode("topk").alias("pos", "hit"),
    ).select(
        "window_start",
        "qid",
        hit["id"].alias("id"),
        F.round(hit["cos"], 6).alias("cos"),
        (F.col("pos") + 1).cast("int").alias("rk"),
    )


def streaming_incremental_dedup(
    doc_stream: DataFrame,
    index: DataFrame,
    index_banded: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Rolling-ingest dedup as a STREAM: arriving documents probe the
    STORED MinHash signature index (the dedup twin of
    :func:`streaming_ann_probe`, and the streaming form of
    :func:`..operators.dedup.incremental_dedup`) and every document
    emits a verdict row ``(window_start, doc_id, is_dup, n_dups,
    matched_id, best_jaccard)`` — the production ingest-gate shape:
    documents arrive forever, the historical corpus is never
    re-shingled.

    Plan: shingles + k-permutation MinHash are pure per-row expressions
    (streaming-safe); the band explode carries (event_time, hsh) along;
    candidates come from the stream-static equi-join against the stored
    ``index_banded`` table (bucketed by (band, bsig) — pass it to keep
    the static side exchange-free) or band rows derived from ``index``
    in-plan; verification fetches the candidate's stored shingle-hash
    array and computes the exact Jaccard.  Stateful stages, both
    watermark-bounded: ``dropDuplicatesWithinWatermark`` collapses the
    per-shared-band duplicate candidate pairs (the batch op's
    dropDuplicates), then one windowed aggregate folds verdicts —
    seed rows (one per arriving doc, null candidate) ride the same
    union so a document with NO candidates still emits its
    ``is_dup=false`` row instead of silently vanishing.

    On a closed archive the drain equals the batch
    ``incremental_dedup`` verdict-for-verdict (streaming == batch twin
    law; pinned in tests/test_streaming.py).  ``(bands, k)`` MUST match
    the values the stored index was banded with — same contract as the
    batch op."""
    from python_ctd_spark.operators.dedup import (
        MH_PRIME, _sh_md5, band_rows, minhash_sig_from_hashes, with_shingles,
    )

    if k % bands != 0:
        raise ValueError(
            f"k ({k}) must be divisible by bands ({bands}); a remainder "
            "silently drops the signature tail from every band key"
        )
    r = k // bands
    base = doc_stream.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.col("event_time").cast("timestamp").alias("event_time"),
    ).withWatermark("event_time", watermark)
    sigs = (
        with_shingles(base, "text", n)
        .withColumn("hsh", _sh_md5())
        .withColumn(
            "sig",
            minhash_sig_from_hashes(f"transform(hsh, h -> h % {MH_PRIME})", k),
        )
        .select("id", "event_time", "hsh", "sig")
    )
    ix_banded = (
        index_banded if index_banded is not None else band_rows(index, bands, r)
    ).select(F.col("id").alias("old_id"), "band", "bsig")
    cand = (
        band_rows(sigs, bands, r, keep=("id", "event_time", "hsh"))
        .join(ix_banded, ["band", "bsig"])
        .select("id", "event_time", "hsh", "old_id")
        .dropDuplicatesWithinWatermark(["id", "old_id"])
    )
    verified = cand.join(
        index.select(F.col("id").alias("old_id"), F.col("hsh").alias("h_o")),
        "old_id",
    )
    inter = F.size(F.array_intersect(F.col("hsh"), F.col("h_o"))).cast("double")
    jac = inter / (
        F.size("hsh").cast("double") + F.size("h_o").cast("double") - inter
    )
    matches = (
        verified.withColumn("j", jac)
        .filter(F.col("j") >= threshold)
        .select("id", "event_time", "old_id", "j")
    )
    # seed rows keep candidate-less documents in the aggregate
    seeds = sigs.select(
        "id",
        "event_time",
        F.lit(None).cast("long").alias("old_id"),
        F.lit(None).cast("double").alias("j"),
    )
    agg = (
        matches.unionByName(seeds)
        .groupBy(F.window("event_time", window), "id")
        .agg(
            F.count("old_id").alias("n_dups"),
            F.min("old_id").alias("matched_id"),
            F.round(F.max("j"), 6).alias("best_jaccard"),
        )
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("id").alias(id_col),
        (F.col("n_dups") > 0).alias("is_dup"),
        F.col("n_dups").cast("bigint").alias("n_dups"),
        "matched_id",
        "best_jaccard",
    )


def streaming_strip_boilerplate(
    sdf: DataFrame,
    boiler: DataFrame,
    sep: str = "\n",
    min_line_chars: int = 4,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingest-time boilerplate stripping against a STORED template
    index (the streaming twin of
    :func:`..operators.text.strip_boilerplate`, same serving pattern as
    :func:`streaming_incremental_dedup`): template lines are mined ONCE
    from the existing corpus (``boiler`` = the stored ``(__key)`` table
    of md5(trim(line)) keys over the doc-frequency threshold) and every
    arriving document is cleaned against them before it lands.

    Plan: posexplode the arriving document's lines (stateless,
    per-row), stream-static LEFT join against the broadcast template
    keys (the boilerplate set is small by nature — template chrome, not
    content), then ONE watermarked windowed aggregate rebuilds the
    cleaned text in line order — the only stateful step, keyed
    (window, doc_id), state evicted at the watermark.  Emits
    ``(window_start, doc_id, n_lines, n_boiler, text_clean)``; on a
    closed drain the verdicts equal the batch operator exactly (twin
    law, oracle-checked)."""
    import re as _re

    from pyspark.sql import functions as F

    lines = sdf.select(
        "doc_id",
        # parquet stages write TIMESTAMP_NTZ; watermarks need TIMESTAMP
        F.col("event_time").cast("timestamp").alias("event_time"),
        # NULL text -> one empty line, so the arrival still lands in the
        # sink (same row-preservation policy as the batch twin)
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), _re.escape(sep))
        ).alias("__pos", "__line"),
    ).withColumn(
        "__eligible", F.length(F.trim("__line")) >= min_line_chars
    ).withColumn("__key", F.md5(F.trim(F.col("__line"))))
    joined = lines.join(
        F.broadcast(boiler.select("__key", F.lit(True).alias("__boiler"))),
        "__key",
        "left",
    ).withColumn(
        "__drop", F.col("__eligible") & F.coalesce("__boiler", F.lit(False))
    )
    return (
        joined.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("__drop").cast("bigint")).alias("n_boiler"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("__drop"),
                                F.struct("__pos", F.col("__line").alias("l")),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
            ).alias("text_clean"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "doc_id",
            "n_lines",
            "n_boiler",
            "text_clean",
        )
    )
