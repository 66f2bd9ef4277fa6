"""Throwaway interleaved A/B for the training_dataset kept-checkpoint
(round 14 opt).  Alternates TD_KEPT_CKPT=0/1 in ONE session, min-of-N,
construction+execution timed together (the checkpoint moves cost between
the two, so only the sum is honest)."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from python_ctd_spark.session import get_spark  # noqa: E402

ROUNDS = 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="ab_td")
    sc = spark.sparkContext
    q = entrymod.queries()["training_dataset"]

    # warm-up: one full run of the query itself (JVM JIT + Python workers)
    os.environ["TD_KEPT_CKPT"] = "1"
    q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    results = {"0": [], "1": []}
    for rnd in range(ROUNDS):
        for flag in ("0", "1"):
            os.environ["TD_KEPT_CKPT"] = flag
            sc.setJobDescription(f"ab_td ckpt={flag} round={rnd}")
            t0 = time.perf_counter()
            df = q(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[flag].append(dt)
            print(f"round={rnd} ckpt={flag} {dt:.2f}s", flush=True)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
    for flag in ("0", "1"):
        r = results[flag]
        print(
            f"ckpt={flag}: min={min(r):.2f} "
            f"all={['%.2f' % x for x in r]}"
        )


if __name__ == "__main__":
    main()
