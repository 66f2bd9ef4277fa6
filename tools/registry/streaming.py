"""Streaming query callables + their staging/stored-index
plumbing (drains, twins, serving indexes).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9 phase 2)."""

from pyspark.sql import DataFrame, SparkSession, functions as F
from tools.oracles.params import (
    _EMB_DIM,
    _NEARDUP_PLANES,
    _NEARDUP_TABLES,
    _SERVING_PROBE_BITS,
    _STREAM_SHARD_BOUND,
)
from tools.registry.base import _ev, _t

_STREAM_RUN_COUNTER = [0]

_STREAM_STAGE_CACHE: dict[str, str] = {}

def _stream_stage(spark, sf_dir: str) -> str:
    """Stage the closed event archive as 3 time-ranged parquet parts
    (earliest range first, arrival order = mtime order) so file-source
    streams replay real incremental micro-batches."""
    import glob
    import os
    import tempfile

    stage = _STREAM_STAGE_CACHE.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="events_stream_")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .repartitionByRange(3, "ts")
            .write.mode("overwrite")
            .parquet(stage)
        )
        t0 = os.path.getmtime(stage) - 1000
        for i, f in enumerate(sorted(glob.glob(f"{stage}/part-*.parquet"))):
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))
        _STREAM_STAGE_CACHE[sf_dir] = stage
    return stage

def _q_streaming_windowed(spark, sf_dir):
    """Structured Streaming surface in the driver contract: the event
    archive replayed through ``readStream`` (one file per micro-batch),
    event-time 1-day tumbling windows per user with a watermark, drained
    with an availableNow trigger into a memory sink.

    Complete output mode, so on a closed input the streaming result is
    *exactly* the batch aggregation — which is the oracle (the streaming
    == batch twin law that tests/test_streaming.py asserts per operator).
    Window starts are epoch-aligned; emitted as epoch microseconds so the
    oracle compare is timestamp-representation-free.
    """
    import glob
    import os
    import tempfile

    from python_ctd_spark.streaming import (
        event_stream, run_to_memory, state_partitions, windowed_stats,
    )

    # The file stream source replays a *directory* in file-arrival order;
    # stage the closed archive as 3 time-ranged parts (earliest range
    # first) so the drain exercises real incremental micro-batches, the
    # same growing-archive layout tests/test_streaming.py uses.
    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    res = windowed_stats(sdf, window="1 day", watermark="1 hour")
    _STREAM_RUN_COUNTER[0] += 1
    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(
            res, f"stream_win_stats_{_STREAM_RUN_COUNTER[0]}", output_mode="complete"
        )
    return tbl.select(
        F.unix_micros(F.col("w_start")).alias("w_start_us"),
        "user_id",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "max_value",
    )

def _q_streaming_sessions(spark, sf_dir):
    """Native streaming session windows (F.session_window): a session
    closes after 6 hours of inactivity; complete-mode drain over the
    replayed archive equals the batch session assignment, which the
    oracle recomputes with the classic lag-gap + running-sum
    sessionization (break when the gap is >= the window's [start, end)
    exclusive bound; session end = last event + gap)."""
    from python_ctd_spark.streaming import event_stream, run_to_memory, session_windows

    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    res = session_windows(sdf, gap="6 hours", watermark="1 hour")
    _STREAM_RUN_COUNTER[0] += 1
    from python_ctd_spark.streaming import state_partitions

    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(
            res, f"stream_sessions_{_STREAM_RUN_COUNTER[0]}", output_mode="complete"
        )
    return tbl.select(
        F.unix_micros(F.col("s_start")).alias("s_start_us"),
        F.unix_micros(F.col("s_end")).alias("s_end_us"),
        "user_id",
        "n_events",
    )

def _q_streaming_bindata(spark, sf_dir):
    """Streaming bindata: complete-mode (cast, pressure-bin) rollup over
    the replayed event archive — the incremental twin of the batch
    bindata aggregate (reference ctd/processing.py:112-129), with
    delta-aligned right-closed bins (a cast-relative origin is not a
    streaming quantity; state stays one row per (cast, bin)).  On the
    closed input the drain equals the identical batch aggregation, which
    is the oracle."""
    from python_ctd_spark.streaming import event_stream, run_to_memory, streaming_bindata

    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    res = streaming_bindata(sdf, delta=100.0)
    _STREAM_RUN_COUNTER[0] += 1
    from python_ctd_spark.streaming import state_partitions

    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(
            res, f"stream_bindata_{_STREAM_RUN_COUNTER[0]}", output_mode="complete"
        )
    # no rounding: the decimal sum and integer count are engine-identical,
    # so the IEEE division is bit-identical too — rounding can only
    # *introduce* half-ULP tie disagreements
    return tbl.select("user_id", "bin_center", "n", "mean_value")

def _q_stateful_despike(spark, sf_dir):
    """Streaming Wild-Edit despike: per-cast bounded buffering via
    applyInPandasWithState (state = last 2*block rows per cast); emits a
    row once 2*block-1 rows of lookahead exist, at which point the
    verdict is provably identical to the batch kernel's — so the oracle
    is the batch despike SQL restricted to the stable prefix of each
    cast.  Flagged (and originally-NULL) values surface as NULL, matching
    the batch operator's output convention."""
    from python_ctd_spark.streaming import event_stream, run_to_memory, stateful_despike

    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    res = stateful_despike(sdf, n1=1.0, n2=2.0, block=10)
    _STREAM_RUN_COUNTER[0] += 1
    from python_ctd_spark.streaming import state_partitions

    # 16, not the pure-JVM drains' 8: the pandas state kernel does real
    # per-row Python work, so worker parallelism still pays at local[32]
    # (measured sf0.1: 32 -> 6.1s, 16 -> 4.6s, 8 -> 5.7s, 4 -> 8.4s)
    with state_partitions(spark, 16):
        tbl = run_to_memory(res, f"stream_despike_{_STREAM_RUN_COUNTER[0]}")
    return tbl.select(
        "event_id",
        "user_id",
        F.when(~F.isnan("despiked"), F.col("despiked")).alias("v"),
    )

_STREAM_DUP_CACHE: dict = {}

def _stream_stage_dup(spark, sf_dir):
    """The staged archive with every part file REDELIVERED: arrival
    order f1, f1', f2, f2', f3, f3' (mtime-ordered), simulating an
    at-least-once transport that re-sends each shard once."""
    import glob
    import os
    import shutil
    import tempfile

    stage = _STREAM_DUP_CACHE.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        src = _stream_stage(spark, sf_dir)
        stage = tempfile.mkdtemp(prefix="events_stream_dup_")
        t0 = os.path.getmtime(src) - 2000
        for i, f in enumerate(sorted(glob.glob(f"{src}/part-*.parquet"))):
            orig = os.path.join(stage, f"a{i:02d}.parquet")
            redeliver = os.path.join(stage, f"b{i:02d}.parquet")
            shutil.copy(f, orig)
            shutil.copy(f, redeliver)
            os.utime(orig, (t0 + 20 * i, t0 + 20 * i))
            os.utime(redeliver, (t0 + 20 * i + 10, t0 + 20 * i + 10))
        _STREAM_DUP_CACHE[sf_dir] = stage
    return stage

def _q_streaming_dedup(spark, sf_dir):
    """Exactly-once ingest from an at-least-once transport: the archive
    arrives with every shard redelivered once, and
    dropDuplicatesWithinWatermark (bounded key state — the watermark
    evicts keys, unlike plain streaming dropDuplicates) restores the
    original event set.  Oracle: the clean events table, verbatim."""
    from python_ctd_spark.streaming import (
        dedup_stream, event_stream, run_to_memory, state_partitions,
    )

    sdf = event_stream(spark, _stream_stage_dup(spark, sf_dir), max_files=None)
    res = dedup_stream(sdf, keys=["event_id"], watermark="12 hours")
    _STREAM_RUN_COUNTER[0] += 1
    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_dedup_{_STREAM_RUN_COUNTER[0]}")
    return tbl.select("event_id", "user_id", "event_type", "value")

def _q_streaming_enrich(spark, sf_dir):
    """Stream-static join: the replayed event stream enriched with the
    static customer dimension (broadcast, stateless, append mode — no
    watermark needed).  On the closed archive the drain equals the
    batch left join, which is the oracle."""
    from python_ctd_spark.streaming import (
        event_stream, run_to_memory, state_partitions, stream_static_enrich,
    )

    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    res = stream_static_enrich(
        sdf.select("event_id", "user_id", "value"), dim, ["user_id"]
    )
    _STREAM_RUN_COUNTER[0] += 1
    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_enrich_{_STREAM_RUN_COUNTER[0]}")
    return tbl.select(
        "event_id", "user_id", F.col("c_mktsegment").alias("segment"), "value"
    )

_STREAM_PDF_CACHE: dict = {}

#: sentinel id for driver-built streams: one far-future row advances the
#: watermark past every real window so append-mode aggregates emit on
#: the availableNow drain; its output rows are filtered before compare
_STREAM_SENTINEL_ID = 2_000_000_000

def _stage_pdf_parts(tag: str, sf_dir: str, build_parts) -> str:
    """Stage a small driver-built pandas archive as time-ordered parquet
    parts (arrival order = mtime order = event-time order — the
    growing-archive layout the watermark contract assumes) for
    file-source streams.  ``build_parts() -> [pandas.DataFrame, ...]``,
    earliest event range first, each carrying an ``event_time`` column;
    timestamps are written as microseconds (Spark's reader rejects
    pandas' default TIMESTAMP(NANOS)).  Cached per (tag, sf_dir)."""
    import os
    import tempfile

    key = (tag, sf_dir)
    stage = _STREAM_PDF_CACHE.get(key)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix=f"{tag}_stream_")
        t0 = os.path.getmtime(stage) - 1000
        for i, pdf in enumerate(build_parts()):
            p = os.path.join(stage, f"part-{i}.parquet")
            pdf.to_parquet(
                p, coerce_timestamps="us", allow_truncated_timestamps=True
            )
            os.utime(p, (t0 + 10 * i, t0 + 10 * i))
        _STREAM_PDF_CACHE[key] = stage
    return stage

def _stored_stream_mh_index(spark, sf_dir):
    """The existing-corpus MinHash index as STORED bucketed tables
    (signatures by id for exact-Jaccard verification; band rows by
    (band, bsig) for exchange-free candidate joins), built once per
    session per sf_dir — the write-once serving twin of
    :func:`_stored_stream_lsh_index`."""
    from python_ctd_spark.io import sinks
    from python_ctd_spark.operators.dedup import band_rows, minhash_signatures

    sig_name = _table_name("t_stream_mh_sig_", sf_dir)
    band_name = _table_name("t_stream_mh_band_", sf_dir)
    if ("mh", sf_dir) not in _STREAM_IX_BUILT:
        _drop_stale_table(spark, sig_name)
        _drop_stale_table(spark, band_name)
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        sinks.write_bucketed(
            minhash_signatures(docs.filter(F.col("doc_id") % 5 != 0)),
            sig_name, buckets=8, by="id", sort_by="id",
        )
        sinks.write_bucketed(
            band_rows(sinks.read_table(spark, sig_name), 8, 2),
            band_name, buckets=8, by=["band", "bsig"], sort_by=["band", "bsig"],
        )
        _STREAM_IX_BUILT.add(("mh", sf_dir))
    return sinks.read_table(spark, sig_name), sinks.read_table(spark, band_name)

def _q_streaming_inc_dedup(spark, sf_dir):
    """Streaming ingest-gate dedup in the driver contract: the new-shard
    documents (doc_id % 5 == 0) arrive as a 3-file time-ordered stream
    and probe the STORED MinHash band index of the existing corpus
    (streaming/pipeline.streaming_incremental_dedup — stream-static
    band-key joins, exact-Jaccard verification, one watermarked windowed
    aggregate; seed rows keep candidate-less docs).  Every event lands
    in the single 2024-01-01 day window, so on the closed drain the
    verdicts equal batch incremental_dedup exactly — the oracle is the
    batch SQL plus the constant window column."""
    import pandas as pd

    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_incremental_dedup,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    index, ix_banded = _stored_stream_mh_index(spark, sf_dir)

    def build_parts():
        # the arriving shard is bounded (doc_id < 2000 keeps every new
        # doc at sf<=0.01 and 400 of 1000 at sf0.1) — per-doc drain cost
        # is the measured quantity, not shard size; the oracle applies
        # the same bound
        npdf = docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < _STREAM_SHARD_BOUND)
        ).toPandas()
        npdf["event_time"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            npdf["doc_id"] % 24, unit="h"
        )
        npdf = npdf.sort_values(
            ["event_time", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        half = max(1, len(npdf) // 2)
        sentinel = pd.DataFrame(
            {
                "doc_id": [_STREAM_SENTINEL_ID],
                "text": ["watermark advance sentinel"],
                "event_time": [pd.Timestamp("2024-03-01")],
            }
        )
        return [npdf.iloc[:half], npdf.iloc[half:], sentinel]

    stage = _stage_pdf_parts("inc_dedup", sf_dir, build_parts)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(stage).schema
    # single-batch drain (see event_stream): the sentinel still closes
    # the day window via the trailing no-data micro-batch
    sdf = spark.readStream.schema(schema).parquet(stage)
    res = streaming_incremental_dedup(
        sdf, index, index_banded=ix_banded, threshold=0.5,
        window="1 day", watermark="1 hour",
    )
    _STREAM_RUN_COUNTER[0] += 1
    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_incdedup_{_STREAM_RUN_COUNTER[0]}")
    return tbl.filter(F.col("doc_id") != _STREAM_SENTINEL_ID).select(
        F.unix_micros("window_start").alias("w_start_us"),
        "doc_id", "is_dup", "n_dups", "matched_id", "best_jaccard",
    )

#: stored-index tables already (re)built this SESSION, keyed by
#: (artifact, sf_dir).  The streaming serving rows probe bucketed
#: warehouse tables — the write-once/probe-forever serving shape — but
#: a table left over from a PREVIOUS session may describe older
#: testdata, so the first touch per session always rebuilds it.
_STREAM_IX_BUILT: set = set()

def _table_name(prefix: str, sf_dir: str) -> str:
    import re as _re

    return prefix + _re.sub(r"\W+", "_", sf_dir.rstrip("/"))

def _drop_stale_table(spark, name: str) -> None:
    """Make room for a per-session rebuild: drop the catalog entry AND
    any orphaned warehouse directory a previous session left behind
    (saveAsTable refuses a managed-table location that exists without a
    catalog entry)."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    p = os.path.join(wh.removeprefix("file:"), name)
    if os.path.isdir(p):
        shutil.rmtree(p, ignore_errors=True)

def _stored_stream_lsh_index(spark, sf_dir):
    """The corpus LSH index as a STORED bucketed table (io.sinks), built
    once per session per sf_dir: the streaming serving drain then pays
    probe cost only — queries arrive forever, the index was written
    once — instead of re-deriving the corpus signature table on every
    drain (~1s of the row's wall at sf0.1)."""
    from python_ctd_spark.io import sinks
    from python_ctd_spark.operators.similarity import lsh_index

    name = _table_name("t_stream_lsh_ix_", sf_dir)
    if ("lsh", sf_dir) not in _STREAM_IX_BUILT:
        _drop_stale_table(spark, name)
        emb = _t(spark, sf_dir, "embeddings")
        sinks.write_bucketed(
            lsh_index(
                emb, n_planes=_NEARDUP_PLANES, n_tables=_NEARDUP_TABLES,
                dim=_EMB_DIM,
            ),
            name, buckets=8, by=["tbl", "bkt"], sort_by=["tbl", "bkt"],
        )
        _STREAM_IX_BUILT.add(("lsh", sf_dir))
    return sinks.read_table(spark, name)

def _q_streaming_ann(spark, sf_dir):
    """Streaming ANN serving in the driver contract: query vectors
    arrive as a time-ordered stream and probe the STORED corpus LSH
    index (a bucketed warehouse table, rebuilt once per session —
    the write-once/probe-forever serving shape) at the recall-gated
    serving width (streaming/pipeline.streaming_ann_probe —
    stream-static bucket joins, decimal-exact scoring, one watermarked
    windowed top-k).  All queries land in the single 2024-01-01 day
    window, so the drain equals the batch ann_index_probe result
    exactly — the oracle is the same SQL plus the constant window
    column."""
    import pandas as pd

    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_ann_probe,
    )

    emb = _t(spark, sf_dir, "embeddings")
    ix = _stored_stream_lsh_index(spark, sf_dir)

    def build_parts():
        qpdf = emb.filter(F.col("vec_id") < 10).select(
            "vec_id", "embedding"
        ).toPandas()
        qpdf["embedding"] = qpdf["embedding"].map(
            lambda v: [float(x) for x in v]
        )
        qpdf["event_time"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            qpdf["vec_id"] % 9, unit="h"
        )
        qpdf = qpdf.sort_values(
            ["event_time", "vec_id"], kind="mergesort"
        ).reset_index(drop=True)
        sentinel = pd.DataFrame(
            {
                "vec_id": [_STREAM_SENTINEL_ID],
                "embedding": [qpdf["embedding"].iloc[0]],
                "event_time": [pd.Timestamp("2024-03-01")],
            }
        )
        return [qpdf.iloc[:5], qpdf.iloc[5:], sentinel]

    stage = _stage_pdf_parts("ann_probe", sf_dir, build_parts)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(stage).schema
    # single-batch drain (see event_stream): the sentinel still closes
    # the day window via the trailing no-data micro-batch
    sdf = spark.readStream.schema(schema).parquet(stage)
    res = streaming_ann_probe(
        sdf, ix, emb, k=5, n_planes=_NEARDUP_PLANES,
        n_tables=_NEARDUP_TABLES, dim=_EMB_DIM,
        n_probe_bits=_SERVING_PROBE_BITS,
        window="1 day", watermark="1 hour",
    )
    _STREAM_RUN_COUNTER[0] += 1
    # 4 state partitions: single-batch drains over modest archives are
    # per-task-overhead-bound (measured sf0.1: 8 -> 4 saves 15-30% on
    # every JVM drain; despike keeps 16 for its pandas kernel)
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_ann_{_STREAM_RUN_COUNTER[0]}")
    return tbl.filter(F.col("qid") != _STREAM_SENTINEL_ID).select(
        F.unix_micros("window_start").alias("w_start_us"),
        "qid", "id", "cos", "rk",
    )

def _q_streaming_join(spark, sf_dir):
    """Stream-stream inner join (attribution shape): purchases joined to
    the same user's clicks within the preceding 6 hours, drained over
    the replayed archive.  The event-time bound in the join condition is
    what lets Spark evict join state; on the closed input the drain
    equals the identical batch join, which is the oracle."""
    from python_ctd_spark.streaming import (
        event_stream, run_to_memory, state_partitions, stream_stream_join,
    )

    # single-batch drain: output is batching-invariant (twin laws);
    # the multi-batch replay is covered by tests/test_streaming.py
    sdf = event_stream(spark, _stream_stage(spark, sf_dir), max_files=None)
    res = stream_stream_join(sdf, within="6 hours", watermark="12 hours")
    _STREAM_RUN_COUNTER[0] += 1
    # 4, not the aggregate drains' 8: a stream-stream join runs TWO
    # state stores (left/right buffers) per partition per trigger, so
    # the per-task overhead doubles (measured sf0.1: 16 -> 7.8s,
    # 8 -> 4.4s, 4 -> 3.2s, 2 -> 3.0s; identical rows)
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_join_{_STREAM_RUN_COUNTER[0]}")
    return tbl.select(
        "user_id", "l_id", "r_id",
        F.unix_micros(F.col("l_time")).alias("l_time_us"),
        (F.unix_micros(F.col("r_time")) - F.unix_micros(F.col("l_time"))).alias("lag_us"),
    )

def _q_despike_closeout(spark, sf_dir):
    """Batch close-out of the streaming despike: verdicts for each
    cast's final 2*block-1 rows — the positions streaming rightly holds
    back because their verdicts depend on where the cast ends.  Oracle
    is the batch despike SQL restricted to the complement of the
    streaming query's stable prefix, so streaming emissions ∪ this
    query == the batch kernel row for row."""
    from python_ctd_spark.streaming import despike_closeout

    ev = _ev(spark, sf_dir).withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )
    out = despike_closeout(ev, n1=1.0, n2=2.0, block=10)
    return out.select(
        "user_id", "event_id", "value",
        F.when(~F.isnan("despiked"), F.col("despiked")).alias("despiked"),
    )



def _stored_boiler_index(spark, sf_dir):
    """The stored template index for ingest-time cleaning: md5 keys of
    every trimmed 'line' (word at sep=' ' — the corpus has no newlines)
    whose doc frequency crosses the batch threshold.  Mined ONCE per
    corpus version from the FULL documents table, saved as a warehouse
    table — the write-once/probe-forever lifecycle the other streaming
    serving rows use (it is the strip_boilerplate candidate table, so a
    refresh costs one aggregate pass)."""
    name = _table_name("t_boiler_", sf_dir)
    key = ("boiler", sf_dir)
    if key not in _STREAM_IX_BUILT:
        _drop_stale_table(spark, name)
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        exploded = docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("__line")
        ).filter(F.length(F.trim("__line")) >= 4)
        (
            exploded.select(F.md5(F.trim("__line")).alias("__key"), "doc_id")
            .distinct()
            .groupBy("__key")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") >= 390)
            .select("__key")
            .write.mode("overwrite")
            .saveAsTable(name)
        )
        _STREAM_IX_BUILT.add(key)
    return spark.table(name)


def _q_streaming_clean(spark, sf_dir):
    """Ingest-time boilerplate strip in the driver contract (new r10):
    the new-doc shard (doc_id % 5 == 0, bounded) arrives as a
    time-ordered 2-part stream and is cleaned against the STORED
    template index (streaming/pipeline.streaming_strip_boilerplate —
    posexplode, stream-static broadcast template join, ONE watermarked
    windowed aggregate rebuilding line order).  Every event lands in
    the single 2024-01-01 day window, so the closed drain equals the
    batch strip rule applied to the shard — the oracle."""
    import pandas as pd

    from python_ctd_spark.streaming import (
        run_to_memory, state_partitions, streaming_strip_boilerplate,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = _stored_boiler_index(spark, sf_dir)

    def build_parts():
        npdf = docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < _STREAM_SHARD_BOUND)
        ).toPandas()
        npdf["event_time"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            npdf["doc_id"] % 24, unit="h"
        )
        npdf = npdf.sort_values(
            ["event_time", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        half = max(1, len(npdf) // 2)
        sentinel = pd.DataFrame(
            {
                "doc_id": [_STREAM_SENTINEL_ID],
                "text": ["watermark advance sentinel"],
                "event_time": [pd.Timestamp("2024-03-01")],
            }
        )
        return [npdf.iloc[:half], npdf.iloc[half:], sentinel]

    stage = _stage_pdf_parts("clean", sf_dir, build_parts)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(stage).schema
    sdf = spark.readStream.schema(schema).parquet(stage)
    res = streaming_strip_boilerplate(
        sdf, boiler, sep=" ", min_line_chars=4,
        window="1 day", watermark="1 hour",
    )
    _STREAM_RUN_COUNTER[0] += 1
    with state_partitions(spark, 4):
        tbl = run_to_memory(res, f"stream_clean_{_STREAM_RUN_COUNTER[0]}")
    return tbl.filter(F.col("doc_id") != _STREAM_SENTINEL_ID).select(
        F.unix_micros("window_start").alias("w_start_us"),
        "doc_id", "n_lines", "n_boiler", "text_clean",
    )

def _q_streaming_markup(spark, sf_dir):
    """Streaming HTML extraction (new, 12th streaming row): the
    new-document shard (doc_id % 5 == 0, bounded) arrives as a 2-part
    file stream wrapped in the deterministic HTML fixture (same
    synthesized construction as the batch ``strip_markup`` row) and is
    stripped map-side by the SAME native regex chain
    (operators.markup.strip_markup).  Extraction is stateless (no
    watermark, no state store — the shape of a text-extraction sidecar
    at crawl ingest), so the closed drain equals the batch chain
    row-for-row; the oracle replays the identical generated chain over
    the shard."""
    from tools.oracles.text import _MARKUP_SYNTH_SPARK_EXPR

    from python_ctd_spark.operators.markup import strip_markup
    from python_ctd_spark.streaming import run_to_memory

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build_parts():
        npdf = docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < _STREAM_SHARD_BOUND)
        ).toPandas()
        npdf = npdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        half = max(1, len(npdf) // 2)
        return [npdf.iloc[:half], npdf.iloc[half:]]

    stage = _stage_pdf_parts("markup", sf_dir, build_parts)
    schema = spark.read.parquet(stage).schema
    sdf = spark.readStream.schema(schema).parquet(stage)
    stripped = strip_markup(
        sdf.withColumn("html", F.expr(_MARKUP_SYNTH_SPARK_EXPR)), "html"
    ).select("doc_id", "n_tag", "n_entities", "text_plain")
    _STREAM_RUN_COUNTER[0] += 1
    tbl = run_to_memory(stripped, f"stream_markup_{_STREAM_RUN_COUNTER[0]}")
    return tbl


def _q_streaming_quality(spark, sf_dir):
    """Streaming classifier scoring (new r11, 11th streaming row): the
    new-document shard (doc_id % 5 == 0, bounded) arrives as a 2-part
    file stream and is scored map-side under the COMMITTED serving
    weights (operators.classify.DEMO_WEIGHTS — the stored-artifact
    pattern of DEFAULT_MERGES).  Scoring is stateless (no watermark, no
    state store; one projection per arriving row — the plan a scoring
    sidecar runs at ingest), so the closed drain equals the batch
    formula exactly; the oracle replays it with the same literal
    weights."""
    from python_ctd_spark.operators.classify import (
        DEMO_WEIGHTS, score_quality_classifier,
    )
    from python_ctd_spark.streaming import run_to_memory

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build_parts():
        npdf = docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < _STREAM_SHARD_BOUND)
        ).toPandas()
        npdf = npdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        half = max(1, len(npdf) // 2)
        return [npdf.iloc[:half], npdf.iloc[half:]]

    stage = _stage_pdf_parts("quality", sf_dir, build_parts)
    schema = spark.read.parquet(stage).schema
    sdf = spark.readStream.schema(schema).parquet(stage)
    scored = score_quality_classifier(sdf, DEMO_WEIGHTS).select(
        "doc_id", "quality_prob"
    )
    _STREAM_RUN_COUNTER[0] += 1
    tbl = run_to_memory(scored, f"stream_quality_{_STREAM_RUN_COUNTER[0]}")
    return tbl


def _q_streaming_warc(spark, sf_dir):
    """Streaming crawl ingestion (13th streaming row): the SAME four
    per-record-gzip WARC shards as the batch ``warc_documents`` row
    arrive as a ``binaryFile`` file stream (io.warc.read_warc_stream —
    each shard is one micro-batch unit, parsed by the same Arrow pass)
    and project through ``warc_responses_to_documents`` unchanged.
    The head is stateless end-to-end (no watermark, no state store —
    parse + projection are per-record), so the closed drain equals the
    batch read row-for-row and the row shares the batch row's full
    value oracle (_WARC_DOCUMENTS_SQL), latin-1 charset decode and
    404 filtering included."""
    from python_ctd_spark.io.warc import (
        read_warc_stream, warc_responses_to_documents,
    )
    from python_ctd_spark.streaming import run_to_memory

    from .base import _warc_fixture_dir

    sdf = read_warc_stream(spark, _warc_fixture_dir(sf_dir))
    docs = warc_responses_to_documents(sdf)
    _STREAM_RUN_COUNTER[0] += 1
    return run_to_memory(docs, f"stream_warc_{_STREAM_RUN_COUNTER[0]}")
