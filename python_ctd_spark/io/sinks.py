"""Sinks (SURVEY.md §2.1 — the reference is read-only into memory; the
engine's outputs are parquet tables shaped for the next reader).

Two layouts, both plain parquet so any engine can read them back:

- :func:`write_casts` — partition the archive by a low-cardinality cast
  prefix (cruise / deployment / date).  Partition pruning then turns
  per-cruise queries into directory listings — the engine-side analog of
  the reference's one-file-per-cast layout, but scan-prunable.
- :func:`write_bucketed` — hash-bucket by ``cast_id`` into a saveAsTable
  bucketed table: two tables bucketed the same way co-locate their
  alignment joins (§2.5) and grouped/window stages *without a shuffle* —
  the prescription for pipelines that re-join processing states at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_ctd_spark.operators._util import as_list


def write_casts(
    df: DataFrame,
    path: str,
    partition_by=None,
    mode: str = "overwrite",
) -> None:
    """Write a cast table as (optionally partition-pruned) parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*as_list(partition_by))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    by="cast_id",
    sort_by="scan",
    mode: str = "overwrite",
) -> None:
    """Save as a parquet table bucketed (and sorted) by the cast key.

    Joins and grouped/window stages between tables bucketed identically
    skip the exchange: Spark reads each bucket as a pre-clustered split.
    """
    by, sort_by = as_list(by), as_list(sort_by)
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, by[0], *by[1:])
        .sortBy(sort_by[0], *sort_by[1:])
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
