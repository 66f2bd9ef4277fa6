"""SparkSession factory.

One place to set the engine's execution posture:

- AQE on (runtime re-planning: skew joins, partition coalescing, dynamic
  broadcast) — the 100 TB story depends on it;
- Arrow on (every pandas-UDF kernel crosses JVM<->Python via Arrow batches);
- UTC session timezone (oracle comparisons against DuckDB's naive-UTC
  timestamps);
- shuffle partitions sized to cores for local mode (callers on a real
  cluster should leave the 200+/AQE-coalesce default or size to cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE's 1 MB default floor coalesces a small-but-expensive shuffle
    # (e.g. the despike close-out: ~600 KB of trimmed tail rows fanning
    # into 1500 per-cast pandas kernel calls) into ONE task, serializing
    # the whole grouped-map stage (measured 7.4s -> 1.7s at sf0.1 with
    # the floor at 64 KB).  Post-shuffle *bytes* are a bad proxy for
    # post-shuffle *compute* when a Python stage follows; keep the floor
    # low so parallelism survives.  At fleet scale shuffles dwarf either
    # floor and the setting is inert.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pandas-UDF batches: large enough to amortize Arrow transfer, small
    # enough to keep executor memory bounded with wide casts.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # A cast never exceeds ~1e5 rows (BASELINE.md); 128 MB split size keeps
    # parquet scan tasks balanced at large SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "python_ctd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster, pass
    ``master=None`` with ``spark.master`` already set and it is respected.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    effective_master = master
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        effective_master = f"local[{cpus}]"
        builder = builder.master(effective_master)
    if effective_master is not None and effective_master.startswith("local"):
        # local mode = one JVM doing all executor work; Spark's 1g driver
        # default hits the GC wall long before the machine does.  Any local
        # master gets the bump (a long pytest session on the default 1g heap
        # OOM-kills the Arrow serving thread, which leaves SocketAuthServer's
        # promise incomplete and hangs toPandas forever) — on a cluster the
        # deployer sizes it.  Only effective before the JVM launches; a no-op
        # on getOrCreate of an existing session.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )

    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
