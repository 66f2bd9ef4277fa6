"""Benchmark driver: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line (<1 KB, fits the harness's 2000-char tail capture):
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {10 slowest}, "n_queries": N, "full": "BENCH_out.json",
"sf": ...}.  The complete per-query map is persisted to BENCH_out.json.

Execution is forced with a noop sink (full plan runs, nothing collected),
which is the honest way to measure a distributed plan — no driver
materialization cost, no show()-style partial evaluation.

Timing methodology: steady state.  A query whose first run exceeds a
small threshold is run a second time and the faster of the two is
reported — the first pass through a heavy plan pays one-off JVM JIT
compilation/deoptimization and Python-worker warm-up that repeat runs
never see (measured: lp_filter 8.4s first pass vs 1.5s on every
subsequent run in the same session).  Per-query work is identical in
both passes; nothing is cached between them (the SQL cache is cleared
after every run).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from python_ctd_spark.session import get_spark  # noqa: E402


def pack_compact_line(timings: dict[str, float], base: dict) -> str:
    """The ONE stdout line: ``base`` with its "queries" map packed
    slowest-first up to a ~1.6 KB budget — as much of the suite as the
    harness's ~2000-char tail capture can carry without ever clipping
    mid-JSON (clipped lines cost rounds 4-6 their BENCH artifacts)."""
    budget = 1600 - len(json.dumps(dict(base, queries={}), separators=(",", ":")))
    slowest: dict[str, float] = {}
    for k, v in sorted(timings.items(), key=lambda kv: kv[1], reverse=True):
        cost = len(json.dumps({k: v}, separators=(",", ":")))
        if budget - cost < 0:
            break
        budget -= cost
        slowest[k] = v
    return json.dumps(dict(base, queries=slowest), separators=(",", ":"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--passes",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")),
        help="minimum timed passes per query; the recorded number is the "
        "min over passes (min-of-N by construction, VERDICT r7 item 9)",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: time just these (iteration "
        "aid; the driver always runs the full suite)",
    )
    args = ap.parse_args()
    passes = max(1, args.passes)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # HOST-SPEED CANARY (r12): a fixed single-thread hash loop and a
    # fixed BLAS matmul, timed before any Spark work.  Cross-round
    # bench comparisons on this box have repeatedly tripped over
    # uniform 1.3-2x host-state swings (identical code + clean plan
    # census, every row moved together — VM/CPU weather, not plans);
    # stamping every artifact with the same two scalars makes that
    # adjudication mechanical: if the canary moved with the suite, it
    # was the host.
    import hashlib as _hl

    import numpy as _np

    _t0 = time.perf_counter()
    for _i in range(1_000_000):
        _hl.sha256(str(_i).encode()).digest()
    _sha_s = time.perf_counter() - _t0
    _a = _np.random.default_rng(0).random((2000, 2000))
    _t0 = time.perf_counter()
    _a @ _a
    _mm_s = time.perf_counter() - _t0
    canary = {"sha1m_s": round(_sha_s, 3), "matmul2k_s": round(_mm_s, 3)}

    spark = get_spark(app_name="python_ctd_spark_bench")

    # warm the JVM + parquet footer caches once so per-query numbers measure
    # the plans, not first-touch JIT
    entrymod.queries()["q1_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # warm the Python workers: the first pandas-UDF stage otherwise pays
    # ~3.5s of fork + numpy/pandas/pyarrow imports across the executor
    # cores — session infrastructure, not query cost (measured: lp_filter
    # 4.8s cold vs 1.2s warm on local[32])
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.signal import lp_filter

    n = spark.sparkContext.defaultParallelism
    tiny = (
        spark.range(n * 64)
        .withColumn("g", F.col("id") % (n * 2))
        .withColumn("v", F.col("id").cast("double"))
    )
    # lp_filter on a tiny frame forks every worker through the real
    # grouped-map path: python_ctd_spark + numpy imports and the Arrow
    # grouped-map serde all happen here instead of inside the first
    # timed pandas-UDF query
    lp_filter(tiny, cols=["v"], by="g", order=["id"], pressure="v").write.format(
        "noop"
    ).mode("overwrite").save()

    def drain_gc() -> None:
        # grouped-map/Arrow stages leave enough old-gen garbage that G1
        # mixed collections later land *inside* timed queries as 4-10s
        # pauses (measured: q1 1.3s steady vs 9.4s when a collection
        # hits).  Collect between queries, outside the timed window.
        spark._jvm.System.gc()

    # C2 warm-up (r12): JVM-core compilation keeps landing inside timed
    # rows for the first ~minute of ANY workload — whichever queries run
    # first read 2-5x their steady state, and rows under the rerun
    # threshold never recover (measured: alphabetical order inflated
    # asof_join/bindata_* 3.5-4.9x; registry order inflated whatever
    # the window rotation put first).  Run the two heaviest registered
    # plans untimed so Spark core is hot before the first timed row.
    qs_all = entrymod.queries()
    for warm_name in ("ann_recall", "training_dataset"):
        if warm_name in qs_all and args.only is None:
            qs_all[warm_name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
    drain_gc()

    def run_once(q) -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # operators persist intermediates (LSH signatures, CC rounds);
        # drop them between queries — CacheManager canonicalizes every new
        # plan against every cached entry, so leaked giant-expression
        # plans slow down ALL later queries' analysis
        spark.catalog.clearCache()
        drain_gc()
        return dt

    # Rerun floor: queries above it get up to two extra passes (min
    # kept).  0.75 rather than 2.0 because first-pass numbers are
    # position-sensitive — a sub-2s query early in the suite can read
    # 3-5x its steady state on residual JIT/codegen warm-up alone
    # (measured: lang_id 1.9s at suite position 20 vs 0.41s late), so
    # registry reordering would otherwise masquerade as regression.
    rerun_threshold = 0.75
    only = set(args.only.split(",")) if args.only else None
    timings: dict[str, float] = {}
    # FIXED alphabetical execution order (r12): the registry order is
    # the driver's AUDIT-WINDOW rotation and reshuffles every round;
    # per-row walls are position-sensitive (JIT warm-up early,
    # giant-expression deopt contagion after the LSH family), so a
    # bench that follows registry order makes cross-round per-row
    # diffs measure the rotation, not the code.  Alphabetical is
    # stable across rounds and neutral w.r.t. query families.
    for name, q in sorted(entrymod.queries().items()):
        if only is not None and name not in only:
            continue
        # min-of-N by construction: every query gets at least `passes`
        # timed runs (per-query work is identical on every pass; the min
        # is the steady-state plan cost, not compiler/GC state)
        best = min(run_once(q) for _ in range(passes))
        tries = passes
        # extension beyond the floor: keep rerunning while the best time
        # is still improving >25% — the giant-expression queries (shingle
        # joins after the LSH family) can need extra passes for the JVM
        # to recompile what earlier plans deoptimized (measured: 22s ->
        # 10s -> 2.2s), and stopping mid-decay records compiler state,
        # not plan cost.
        max_tries = max(5, passes + 2)
        while best > rerun_threshold and tries < max_tries:
            nxt = run_once(q)
            improved = nxt < best * 0.75
            best = min(best, nxt)
            tries += 1
            if not improved:
                break
        timings[name] = round(best, 2)

    total = round(sum(timings.values()), 2)
    # a filtered --only run must never masquerade as the real suite:
    # mark BOTH the persisted record and the stdout line with the
    # explicit query list so BENCH_r* consumers can tell them apart
    only_marker = sorted(only) if only is not None else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    full_record = {
        "metric": "query_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "canary": canary,
        "cpus": cpus,
        "sf": sf,
    }
    if only_marker is not None:
        full_record["only"] = only_marker
    full_line = json.dumps(full_record, separators=(",", ":"))
    # The harness tail-captures ~2000 chars of stdout; the full 132-query
    # map is ~3 KB and was clipped mid-JSON three rounds running
    # ("parsed": null in BENCH_r04-r06).  So: persist the FULL record to
    # BENCH_out.json (plus a per-round archive, below), and print ONE
    # compact line whose "queries" map is packed slowest-first up to a
    # ~1.6 KB budget — as much of the suite as the tail capture can
    # carry without ever clipping mid-JSON.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    compact_base = {
        "metric": "query_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": {},
        "n_queries": len(timings),
        "passes": passes,
        "canary": canary,
        "full": "BENCH_out.json",
        "sf": sf,
    }
    if only_marker is not None:
        compact_base["only"] = only_marker
    compact_line = pack_compact_line(timings, compact_base)
    with open(os.path.join(repo_dir, "BENCH_out.json"), "w") as f:
        f.write(full_line + "\n")
    # Per-round FULL archive (VERDICT r10 item 3): the driver's
    # BENCH_r{N}.json is built from the clipped tail, so cross-round
    # bench_diff could only compare the slowest handful.  A full run
    # also writes BENCH_full_r{N}.json (N inferred as 1 + the highest
    # committed driver round) — bench_diff prefers it when pointed at
    # the matching BENCH_r{N}.json, comparing whole suites.
    # ... but only a run at the driver's bench scale AND the full core
    # count may write it: an sf0.001 smoke overwriting the sf0.1 archive
    # silently breaks every cross-round bench_diff (this clobbered the
    # r14 archive once), and the driver's LOW-core scaling rerun did the
    # same to the r15 archive (an 8-cpu map masquerading as the 32-cpu
    # round record).  The stdout line and BENCH_out.json are unaffected
    # — every run still reports normally; only the cross-round archive
    # is pinned to the comparable configuration.
    if only_marker is None and abs(sf - 0.1) < 1e-9 and cpus == "32":
        rounds = [
            int(m.group(1))
            for f_ in os.listdir(repo_dir)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f_))
        ]
        this_round = (max(rounds) + 1) if rounds else 1
        with open(
            os.path.join(repo_dir, f"BENCH_full_r{this_round:02d}.json"), "w"
        ) as f:
            f.write(full_line + "\n")
    try:
        spark.stop()
    except Exception:
        pass
    # Spark is already stopped, so no cleanup is owed to atexit; print
    # the line LAST and hard-exit so py4j/JVM teardown handlers cannot
    # emit anything after the only copy of the JSON (the tail capture
    # must end with it).
    print(compact_line, flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
