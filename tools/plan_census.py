"""Mechanical plan-shape census + regression check (r11).

PLANS.md narrates plan audits; this tool makes them DIFFABLE: for every
registered query it compiles the physical plan (no execution) and
records a per-query fingerprint of the operators that matter at 100 TB:

    exchanges, broadcast-hash / sort-merge / nested-loop / cartesian
    joins, MapInPandas / Python-eval nodes, sorts, window nodes.

``--write`` stores the census as PLAN_CENSUS.json; ``check`` recompiles
today's plans against the stored census and fails on SHAPE REGRESSIONS:

- any new CartesianProduct, or a query GROWING BroadcastNestedLoopJoin
  nodes (the baseline legitimately contains 15 one-row-broadcast cross
  joins — Spark compiles a scalar-total crossJoin(broadcast(1 row)) to
  BNLJ, which is benign by construction; an INCREASE means a real join
  lost its equi-keys);
- a query's Exchange count increasing (a silent extra shuffle);
- a BroadcastHashJoin count falling while SortMergeJoin rises (the
  classic lost-broadcast regression; a new join that sort-merges with
  the broadcasts intact is churn, not regression).

New queries (not in the stored census) are reported, not failed — the
next ``--write`` adopts them.  Streaming rows execute a drain inside
their builder, so they are censused from the RETURNED (memory-table)
frame like everything else; their stateful plans live in the streaming
tests instead.

Usage:
    python tools/plan_census.py --write      # adopt today's shapes
    python tools/plan_census.py check        # diff + regression gate
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CENSUS_PATH = os.path.join(REPO, "PLAN_CENSUS.json")
SF_DIR = os.environ.get("SPARK_GRAFT_CENSUS_SF", "/root/testdata/sf0.001")

PATTERNS = {
    "exchange": r"\bExchange\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "smj": r"\bSortMergeJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "nlj": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "map_in_pandas": r"\bMapInPandas\b",
    "py_eval": r"\bBatchEvalPython\b|\bArrowEvalPython\b",
    "grouped_map": r"\bFlatMapGroupsInPandas\b",
    # "Sort [" with word boundary: matches "+- Sort [", ":- Sort ["
    # (the left child of binary nodes) and a root "Sort [", but not
    # SortMergeJoin/SortAggregate
    "sort": r"\bSort \[",
    "window": r"\bWindow\b|\bWindowGroupLimit\b",
}


def fingerprint(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}


def census() -> tuple[dict[str, dict[str, int]], dict[str, str]]:
    import __spark_entry__ as entrymod
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name="plan_census")
    out: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, q in entrymod.queries().items():
        try:
            out[name] = fingerprint(q(spark, SF_DIR))
        except Exception as e:  # a builder that cannot compile is itself news
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    return out, errors


def compare(
    stored: dict[str, dict[str, int]], cur: dict[str, dict[str, int]]
) -> tuple[list[str], list[str]]:
    """Shape-regression rules over two censuses; returns (regressions,
    human-readable change lines).  Pure so tests can pin the rules."""
    regressions: list[str] = []
    changed: list[str] = []
    for n in sorted(set(cur) & set(stored)):
        c, s = cur[n], stored[n]
        if c == s:
            continue
        diffs = {k: (s.get(k, 0), c.get(k, 0)) for k in PATTERNS
                 if c.get(k, 0) != s.get(k, 0)}
        changed.append(f"CHANGED {n}: " + ", ".join(
            f"{k} {a}->{b}" for k, (a, b) in diffs.items()))
        if c.get("cartesian", 0) > s.get("cartesian", 0):
            regressions.append(f"{n}: new CartesianProduct")
        if c.get("nlj", 0) > s.get("nlj", 0):
            regressions.append(f"{n}: new BroadcastNestedLoopJoin")
        if c.get("exchange", 0) > s.get("exchange", 0):
            regressions.append(
                f"{n}: exchanges {s.get('exchange', 0)} -> {c.get('exchange', 0)}"
            )
        if (c.get("smj", 0) > s.get("smj", 0)
                and c.get("bhj", 0) < s.get("bhj", 0)):
            regressions.append(f"{n}: broadcast join degraded to sort-merge")
    return regressions, changed


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    cur, errors = census()
    for n, e in errors.items():
        print(f"ERROR   {n}: {e}")
    if mode == "--write":
        with open(CENSUS_PATH, "w", encoding="utf-8") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"wrote {len(cur)} plan fingerprints to PLAN_CENSUS.json")
        if errors:
            raise SystemExit(1)
        return
    if not os.path.exists(CENSUS_PATH):
        raise SystemExit("no PLAN_CENSUS.json — run --write first")
    with open(CENSUS_PATH, encoding="utf-8") as f:
        stored = json.load(f)
    new = sorted(set(cur) - set(stored))
    gone = sorted(set(stored) - set(cur))
    if new:
        print(f"new queries (adopt with --write): {new}")
    if gone:
        print(f"removed queries: {gone}")
    regressions, changed = compare(stored, cur)
    for line in changed:
        print(line)
    print(f"compared {len(set(cur) & set(stored))} queries; "
          f"{len(changed)} changed shape")
    if regressions:
        print("PLAN REGRESSIONS:")
        for r in regressions:
            print(f"  {r}")
        raise SystemExit(2)
    if errors:
        raise SystemExit(1)
    print("plan census clean")


if __name__ == "__main__":
    main()
