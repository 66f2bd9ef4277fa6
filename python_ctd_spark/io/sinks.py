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


def write_training_shards(
    seqs: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "seq_key",
    seed: str = "",
    mode: str = "overwrite",
) -> dict:
    """Materialize packed training sequences as the sharded dataset a
    trainer actually reads: deterministic shard assignment
    (:func:`..operators.assemble.shard_documents` — md5-uniform, skew-
    impossible), ONE file per shard in shuffle order, a dataloader can
    open ``shard=i/`` with no index — plus a driver-written MANIFEST
    (row/token counts and a position-weighted BIGINT checksum per
    shard) so a consumer can verify integrity without rescanning.

    Layout: ``path/shard=N/part-*.parquet`` (Hive-partitioned by
    ``shard`` — partition pruning gives a worker its shard as a
    directory listing) and ``path/_manifest.json``.

    Scale shape: the assignment is row-local; ``repartition(n_shards,
    shard)`` + ``sortWithinPartitions(shard, shard_u)`` is exactly the
    one exchange + per-shard sort any sharded writer performs, with
    partitions balanced by hash uniformity; the manifest aggregate is
    one map-side-combined pass over the written columns (n_shards
    result rows).  Exactly-once: parquet writes are atomic per task +
    driver commit protocol; ``mode="overwrite"`` replaces the whole
    dataset, never merges.  At 100 TB pick ``n_shards`` so one shard
    fits the file budget (e.g. 100k shards of ~1 GB).

    Returns the manifest dict (also written to ``_manifest.json``)."""
    import json
    import os

    from pyspark.sql import functions as F

    from python_ctd_spark.operators.assemble import shard_documents

    sharded = shard_documents(
        seqs, n_shards, key_col=key_col, seed=seed, rank=False
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_u")
        .drop("shard_u")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    spark = seqs.sparkSession
    back = spark.read.parquet(path)
    # empty/NULL-array guard: sequence(1, 0) is [1, 0] in Spark, so the
    # zip_with would yield [null, null] and the row checksum NULL — an
    # all-empty shard would then sum to NULL and int() would crash; a
    # NULL array has the same failure through the NULL-propagating
    # aggregate.  Both contribute an explicit 0 instead.
    checksum = (
        "CASE WHEN token_ids IS NULL OR size(token_ids) = 0 THEN 0L ELSE "
        "aggregate(zip_with(token_ids, sequence(1, size(token_ids)), "
        "(t, i) -> CAST(t AS BIGINT) * i), 0L, (acc, x) -> acc + x) END"
    )
    has_tokens = "token_ids" in back.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if has_tokens:
        # NULL arrays count as 0 tokens (size(NULL) is NULL/-1 by conf;
        # neither may reach the sum)
        n_tok = F.when(
            F.col("token_ids").isNull(), F.lit(0)
        ).otherwise(F.size("token_ids"))
        aggs += [
            F.sum(n_tok).cast("bigint").alias("n_tokens"),
            F.sum(F.expr(checksum)).cast("bigint").alias("checksum"),
        ]
    per_shard = {
        int(r["shard"]): {k: int(r[k]) for k in r.asDict() if k != "shard"}
        for r in back.groupBy("shard").agg(*aggs).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "key_col": key_col,
        "total_rows": sum(s["n_rows"] for s in per_shard.values()),
        "shards": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
