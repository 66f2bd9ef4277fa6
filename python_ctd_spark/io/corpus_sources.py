"""Document-corpus sources: JSONL and CSV ingestion for the
training-data side of the engine.

Web-scale corpora arrive as (compressed) JSON-lines shards; the two
rules that matter at 100 TB:

- **Never infer the schema.**  Inference is a full extra pass over the
  data before the real read starts.  These readers always pass an
  explicit schema (defaulting to the canonical ``documents`` shape) so
  the scan is single-pass and column-prunable.
- **Corrupt records are data, not exceptions.**  A trillion-line crawl
  always contains malformed lines; failing the job on line 10^11 is not
  an option, and silently dropping is worse.  The default PERMISSIVE
  mode lands malformed lines in a quarantine column, and
  :func:`corrupt_records` / :func:`valid_records` split the stream so a
  pipeline can archive the rejects and continue — all one scan, no
  extra pass.

Compression (.gz/.bz2/.zst shards) is handled by Spark's codec
discovery from the file extension; a directory of mixed shards reads as
one DataFrame, parallelized per shard (gzip is not splittable — at
scale prefer many modest shards over few giant ones, which this layout
gives naturally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: canonical documents-table schema (TESTDATA.md) — the shape every
#: corpus operator in operators/ expects.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if _CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT_COL, T.StringType())])


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read a JSONL (one JSON object per line) document corpus.

    ``schema`` defaults to :data:`DOCUMENTS_SCHEMA`; pass your own for a
    different shape — it is always explicit, never inferred.  ``mode``
    is Spark's JSON policy: ``PERMISSIVE`` (default — malformed lines
    quarantine into ``_corrupt_record``), ``DROPMALFORMED``, or
    ``FAILFAST``.
    """
    schema = schema or DOCUMENTS_SCHEMA
    reader = spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
    return reader.option("mode", mode).json(path)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
    header: bool = True,
    **options,
) -> DataFrame:
    """Read a CSV document corpus with the same explicit-schema and
    quarantine contract as :func:`read_documents_jsonl`.  Multiline
    quoted fields are ON (documents contain newlines); note multiline
    CSV parses per-file, not per-split — shard accordingly at scale.
    """
    schema = schema or DOCUMENTS_SCHEMA
    reader = (
        spark.read.schema(_with_corrupt(schema) if mode == "PERMISSIVE" else schema)
        .option("mode", mode)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def corrupt_records(df: DataFrame) -> DataFrame:
    """The quarantine stream: raw text of every malformed line (for
    archival/inspection).  Requires a PERMISSIVE read.

    Spark rejects a JSON/CSV scan whose only referenced column is the
    internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and
    column pruning reduces exactly this query to that shape (it even
    trims unused columns out of a non-deterministic barrier projection).
    The output expression therefore anchors one real schema column via
    ``coalesce``: the filter guarantees the corrupt column is non-null,
    so the fallback never fires, but the reference keeps the scan
    legal — one extra scanned column on a rejects-only stream."""
    first = next(c for c in df.columns if c != _CORRUPT_COL)
    return (
        df.filter(F.col(_CORRUPT_COL).isNotNull())
        .select(
            F.coalesce(F.col(_CORRUPT_COL), F.col(first).cast("string")).alias("raw")
        )
    )


def valid_records(df: DataFrame) -> DataFrame:
    """The clean stream: fully-parsed rows only, quarantine column
    dropped — the input every corpus operator expects.

    Deliberately plan-transparent (no barrier): downstream projections
    prune the scan to exactly the columns they touch.  The one edge this
    leaves is Spark's own: a bare ``count()`` over the raw stream
    references only the corrupt column and is rejected — count a real
    column (``agg(count("doc_id"))``) or cache first, per the error's
    guidance."""
    return df.filter(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
