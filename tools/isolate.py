"""Isolate one query's cost: DataFrame construction (incl. index-build
jobs), plan analysis (explain), then N timed noop executions — the guide
§1 decomposition.  Also reports the number of Spark jobs the timed
execution submitted (statusTracker delta) and total tasks.

Usage: python tools/isolate.py ann_recall [--passes 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from python_ctd_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="isolate")
    sc = spark.sparkContext
    qs = entrymod.queries()

    if not args.no_warm:
        # same warm-up discipline as bench.py: JVM/codegen + Python workers
        qs["q1_pricing_summary"](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        from pyspark.sql import functions as F

        from python_ctd_spark.operators.signal import lp_filter

        n = sc.defaultParallelism
        tiny = (
            spark.range(n * 64)
            .withColumn("g", F.col("id") % (n * 2))
            .withColumn("v", F.col("id").cast("double"))
        )
        lp_filter(tiny, cols=["v"], by="g", order=["id"], pressure="v").write.format(
            "noop"
        ).mode("overwrite").save()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    for name in args.names:
        q = qs[name]
        sc.setJobDescription(f"isolate:{name}")
        t0 = time.perf_counter()
        df = q(spark, args.sf_dir)
        t_build = time.perf_counter() - t0

        import contextlib
        import io

        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t_explain = time.perf_counter() - t0

        runs = []
        tracker = sc.statusTracker()
        for i in range(args.passes):
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # rebuild once to count jobs across a fresh construction+run
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        all_jobs_before = max(
            [j for j in (tracker.getJobIdsForGroup(None) or [])] or [0]
        )
        t0 = time.perf_counter()
        df2 = q(spark, args.sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        all_jobs_after = max(
            [j for j in (tracker.getJobIdsForGroup(None) or [])] or [0]
        )
        n_jobs = all_jobs_after - all_jobs_before
        print(
            f"{name}: build={t_build:.2f}s explain={t_explain:.2f}s "
            f"runs={['%.2f' % r for r in runs]} rebuild+run={t_total:.2f}s "
            f"jobs~{n_jobs}"
        )
        spark.catalog.clearCache()
        spark._jvm.System.gc()


if __name__ == "__main__":
    main()
