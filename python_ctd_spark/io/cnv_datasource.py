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

    #: a file qualifies only by suffix — bare ``.cnv`` or ``.cnv`` plus a
    #: compression codec extension (``foo.cnv.bak`` does not qualify)
    _SUFFIX_RE = re.compile(r"\.cnv(\.(gz|bz2|zip))?$", re.IGNORECASE)

    def partitions(self):
        import glob
        import os

        p = self.path
        if os.path.isdir(p):
            files = sorted(
                f
                for f in glob.glob(os.path.join(p, "*"))
                if self._SUFFIX_RE.search(os.path.basename(f))
            )
        else:
            files = [p]
        if not files:
            raise FileNotFoundError(f"no .cnv files under {p}")
        return [CnvFilePartition(f) for f in files]

    def read(self, partition: CnvFilePartition):
        # executor side: parse one file, melt to the long layout, ship Arrow.
        # NOTE: paths are opened with local open(), so on a real cluster the
        # source requires a filesystem shared between driver and executors
        # (NFS/FUSE-mounted object store); for pure object-store layouts,
        # fetch the blob and feed read_text()/from_cnv instead.
        import pandas as pd
        import pyarrow as pa

        from python_ctd_spark.io.parsers import parse_cnv

        with open(partition.path, "rb") as f:
            content = f.read()
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
