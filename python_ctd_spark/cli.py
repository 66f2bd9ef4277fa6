"""Installed console entry points (``pyproject.toml [project.scripts]``).

``ctd-spark-bench`` times the canonical CTD fluent chain (the same
seven-operator pipeline as the reference's quick-start:
remove_up_to -> split -> down -> press_check -> despike -> bindata)
over any events-shaped parquet directory and prints ONE compact JSON
line — a smoke benchmark a user can run right after ``pip install`` to
check their Spark setup end to end, without the repo's driver harness.
"""

from __future__ import annotations

import argparse
import json
import time


def _load_events(spark, path: str):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(path)
    # events.ts arrives as TIMESTAMP(NANOS)-as-long or timestamp[us]
    # depending on the writer; branch on the resolved dtype
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        ev = ev.withColumn(
            "ts_us", F.expr("unix_micros(cast(ts as timestamp))")
        )
    return ev.withColumn("signal", F.col("value") * F.lit(2.0))


def bench_main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="ctd-spark-bench")
    ap.add_argument(
        "events",
        help="events-shaped parquet path (event_id, user_id, ts, value)",
    )
    ap.add_argument("--master", default=None, help="Spark master override")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from python_ctd_spark import CtdFrame, get_spark

    kw = {}
    if args.master:
        kw["master"] = args.master
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(app_name="ctd_spark_bench_cli", **kw)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    ev = _load_events(spark, args.events)
    cf = CtdFrame(
        ev, by="user_id", order=["ts_us", "event_id"], pressure="value"
    )
    t0 = time.perf_counter()
    out = (
        cf.remove_up_to(50.0)
        .split()
        .down()
        .press_check(cols=["signal"])
        .despike(cols=["signal"])
        .bindata(delta=100.0, cols=["signal"])
        .df
    )
    n = out.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "ctd_chain_runtime",
                "value": round(dt, 3),
                "unit": "sec",
                "rows": n,
                "events": args.events,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    bench_main()
