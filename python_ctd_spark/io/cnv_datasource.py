"""Sea-Bird CNV as a native Spark data source: ``spark.read.format("cnv")``.

Spark 4's Python DataSource API lets the instrument-file parsers plug
into the regular reader surface — planning on the driver (one input
partition per file, so a directory of casts parallelizes exactly like
the ``binaryFile`` path in readers.py), parsing on executors, rows
shipped back as Arrow record batches.

The emitted layout is LONG — ``(cast_id, scan, pressure, channel,
value)`` — because a DataSource must declare one schema up front while
CNV channel sets vary per file: the long form is the union-safe shape
for a heterogeneous fleet (pivot to wide per cast after filtering,
when the channel set is known).  ``from_cnv`` (readers.py) remains the
wide-table reader for homogeneous batches.

Usage::

    from python_ctd_spark.io.cnv_datasource import register_cnv_source
    register_cnv_source(spark)
    df = spark.read.format("cnv").load("/data/casts/")   # dir or file

Compression (.gz/.bz2/.zip) and encoding sniffing ride the same
``read_text`` dispatch as every other parser (parsers.py).

Paths are scheme-dispatched through :mod:`.blobfs` — local and
``file://`` open directly, ``http(s)://`` fetches via urllib, and any
other scheme resolves through IMPORTABLE callables passed as options::

    spark.read.format("cnv") \
        .option("fetcher", "my_store:fetch")   # (path) -> bytes
        .option("lister",  "my_store:list")    # (path) -> [paths]
        .load("s3like://bucket/casts/")

Options are the only channel that reaches the source's code: a Python
DataSource's whole lifecycle (init/partitions/read) runs in worker
processes, so neither driver memory nor pickled instance state exists
there — which also means no shared driver/executor filesystem is
required.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "cast_id string, scan bigint, pressure double, channel string, value double"


class CnvFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CnvDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cnv source requires a path: .load('/dir/or/file')")
        # Custom schemes arrive as IMPORTABLE references ("module:fn")
        # through the string-only options channel — the only state that
        # reliably reaches the source, whose entire lifecycle (init /
        # partitions / read) runs in Python worker processes where
        # driver memory and pickled instances don't exist (classes
        # re-import by reference).
        self._fetcher_ref = options.get("fetcher")
        self._lister_ref = options.get("lister")
        # http(s) fetch timeout (seconds) so a hung endpoint fails the
        # task instead of stalling the executor; blobfs default if unset
        from python_ctd_spark.io.blobfs import DEFAULT_HTTP_TIMEOUT

        self._http_timeout = float(
            options.get("http_timeout", DEFAULT_HTTP_TIMEOUT)
        )

    #: a file qualifies only by suffix — bare ``.cnv`` or ``.cnv`` plus a
    #: compression codec extension (``foo.cnv.bak`` does not qualify)
    _SUFFIX_RE = re.compile(r"\.cnv(\.(gz|bz2|zip))?$", re.IGNORECASE)

    def partitions(self):
        from python_ctd_spark.io.blobfs import list_blobs, resolve_ref

        lister = resolve_ref(self._lister_ref) if self._lister_ref else None
        files = list_blobs(self.path, self._SUFFIX_RE, lister=lister)
        if not files:
            raise FileNotFoundError(f"no .cnv files under {self.path}")
        return [CnvFilePartition(f) for f in files]

    def read(self, partition: CnvFilePartition):
        # executor side: fetch one blob (scheme-dispatched — local,
        # http(s), or a registered custom scheme; blobfs.py), parse,
        # melt to the long layout, ship Arrow
        import pandas as pd
        import pyarrow as pa

        from python_ctd_spark.io.blobfs import fetch_blob, resolve_ref
        from python_ctd_spark.io.parsers import parse_cnv

        fetcher = resolve_ref(self._fetcher_ref) if self._fetcher_ref else None
        content = fetch_blob(
            partition.path, fetcher, http_timeout=self._http_timeout
        )
        pc = parse_cnv(partition.path, content)
        pdf = pc.data
        channels = [c for c in pdf.columns if c not in ("scan", "pressure")]
        long = pdf.melt(
            id_vars=["scan", "pressure"],
            value_vars=channels,
            var_name="channel",
            value_name="value",
        )
        out = pd.DataFrame(
            {
                "cast_id": pc.cast_id,
                "scan": long["scan"].astype("int64"),
                "pressure": long["pressure"].astype(float),
                "channel": long["channel"],
                "value": pd.to_numeric(long["value"], errors="coerce").astype(float),
            }
        )
        yield pa.RecordBatch.from_pandas(out, preserve_index=False)


class CnvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cnv"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return CnvDataSourceReader(self.options)


def register_cnv_source(spark) -> None:
    """Register the ``cnv`` format on this session."""
    spark.dataSource.register(CnvDataSource)


def long_to_wide(df, channels: list[str] | None = None):
    """Pivot the long ``(cast_id, scan, pressure, channel, value)``
    layout back to the wide cast table ``from_cnv`` produces — the
    bridge from ``spark.read.format("cnv")`` into the ``CtdFrame``
    pipeline.

    Pass ``channels`` explicitly on a big archive: Spark's pivot
    otherwise runs one extra collect-distinct job over the stream to
    learn the column set (bounded by the channel vocabulary, but a full
    pass).  The pivot itself is a single (cast, scan)-keyed aggregate —
    one shuffle, same key the downstream per-cast operators use.
    """
    from pyspark.sql import functions as F

    p = df.groupBy("cast_id", "scan", "pressure")
    piv = p.pivot("channel", channels) if channels else p.pivot("channel")
    return piv.agg(F.first("value")).orderBy("cast_id", "scan")
