"""Head-to-head vs the reference: canonical chain over a fleet of casts.

The reference publishes no benchmark numbers (BASELINE.md), so this
script *measures* it: the single-threaded pandas chain per cast vs this
engine running the same chain over N copies of the reference's own
71,325-scan golden cast (tests/data/CTD-spiked-unfiltered.cnv.bz2).

Chain (both sides): remove_above_water -> split -> down leg ->
press_check -> despike(2, 20, 100) -> movingaverage(48) -> bindata(1.0)
on the t090C channel.

Usage:  python tools/bench_fleet.py [n_casts]   (default 64)

Reference timings are taken by importing /root/reference/ctd directly
with its absent optional deps (matplotlib/gsw/chardet/pandas_flavor)
stubbed — the pandas/NumPy kernels under test are untouched.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = "/root/reference/tests/data/CTD-spiked-unfiltered.cnv.bz2"


def time_reference(n_casts: int) -> dict:
    sys.path.insert(0, "/root/reference")
    for name in ("matplotlib", "matplotlib.pyplot", "gsw", "pandas_flavor", "chardet"):
        try:
            __import__(name)
        except Exception:
            sys.modules[name] = types.ModuleType(name)
    import pandas_flavor, chardet  # noqa: E401

    if not hasattr(pandas_flavor, "register_dataframe_method"):
        pandas_flavor.register_dataframe_method = lambda f: f
        pandas_flavor.register_series_method = lambda f: f
    if not hasattr(chardet, "detect"):
        chardet.detect = lambda b: {"encoding": "utf-8"}

    from ctd import from_cnv
    from ctd.processing import (
        bindata, despike, movingaverage, press_check, remove_above_water, split,
    )

    def one_cast():
        cast = from_cnv(GOLDEN)
        df = remove_above_water(cast.copy())
        down, _up = split(df)
        down = press_check(down)
        d = despike(down["t090C"], n1=2, n2=20, block=100)
        d = movingaverage(d, window_size=48)
        return bindata(d, delta=1.0)

    one_cast()  # warm the interpreter / page cache
    t0 = time.perf_counter()
    for _ in range(min(n_casts, 4)):  # serial is linear; extrapolate from 4
        out = one_cast()
    per_cast = (time.perf_counter() - t0) / min(n_casts, 4)
    return {"per_cast_s": per_cast, "fleet_s": per_cast * n_casts, "out_rows": len(out)}


def time_engine(n_casts: int) -> dict:
    from pyspark.sql import functions as F

    from python_ctd_spark.io import readers
    from python_ctd_spark.operators.binning import bindata
    from python_ctd_spark.operators.filters import remove_above_water
    from python_ctd_spark.operators.ordered import movingaverage, press_check, split
    from python_ctd_spark.operators.signal import despike
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name="bench_fleet")
    stage = tempfile.mkdtemp(prefix="fleet_")
    for i in range(n_casts):
        shutil.copy(GOLDEN, f"{stage}/cast_{i:03d}.cnv.bz2")
    paths = sorted(glob.glob(f"{stage}/cast_*.cnv.bz2"))

    kw = dict(by="cast_id", order=["scan"], pressure="pressure")

    def chain(data):
        df = remove_above_water(data, pressure="pressure")
        df = split(df, **kw)
        df = df.filter(F.col("leg") == "down")
        df = press_check(df, cols=["t090C"], **kw)
        df = despike(df, n1=2, n2=20, block=100, cols=["t090C"], **kw)
        df = movingaverage(df, window_size=48, cols=["t090C"], **kw)
        return bindata(df, delta=1.0, cols=["t090C"], **kw)

    # cold: parse + chain end to end, exactly what the reference loop does
    t0 = time.perf_counter()
    data, _meta = readers.from_cnv(spark, paths)
    n_out = chain(data).count()
    cold = time.perf_counter() - t0

    # steady state: JIT/worker warm-up paid
    t0 = time.perf_counter()
    data, _meta = readers.from_cnv(spark, paths)
    n_out = chain(data).count()
    warm = time.perf_counter() - t0

    spark.stop()
    shutil.rmtree(stage, ignore_errors=True)
    return {"cold_s": cold, "warm_s": warm, "out_rows": n_out}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    eng = time_engine(n)
    ref = time_reference(n)
    print(
        {
            "n_casts": n,
            "reference_serial_s": round(ref["fleet_s"], 2),
            "reference_per_cast_s": round(ref["per_cast_s"], 3),
            "engine_cold_s": round(eng["cold_s"], 2),
            "engine_warm_s": round(eng["warm_s"], 2),
            "speedup_warm": round(ref["fleet_s"] / eng["warm_s"], 2),
            "rows_per_cast_out": ref["out_rows"],
        }
    )
