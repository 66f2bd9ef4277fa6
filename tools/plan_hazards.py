"""Plan-hazard sweep over dumped .explain("formatted") files.

Usage: python tools/plan_hazards.py <plans_dir> [suffix]

For every <query>_<suffix>.txt in <plans_dir>, counts the optimization
guide's red flags (guide §7.2: exchanges, join strategies, Python
boundary nodes, cartesians, scans without pushed filters) and prints a
table sorted by the heaviest signatures, plus a summary.  Read-only
measurement aid — the enforcement gate stays tools/plan_census.py.
"""

from __future__ import annotations

import os
import re
import sys


def stats(txt: str) -> dict:
    scans = len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M))
    pushed_none = len(re.findall(r"PushedFilters: \[\]", txt))
    return {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", txt, re.M)),
        "bcast": len(re.findall(r"^\(\d+\) BroadcastExchange", txt, re.M)),
        "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
        "smj": len(re.findall(r"SortMergeJoin", txt)),
        "nlj": len(re.findall(r"BroadcastNestedLoopJoin", txt)),
        "cart": len(re.findall(r"CartesianProduct", txt)),
        "batch_py": len(re.findall(r"BatchEvalPython", txt)),
        "arrow_py": len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", txt)
        ),
        "scans": scans,
        "scans_no_pf": pushed_none,
        "sorts": len(re.findall(r"^\(\d+\) Sort", txt, re.M)),
        "bytes": len(txt),
    }


def main() -> None:
    d = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "cur"
    rows = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(f"_{suffix}.txt"):
            continue
        name = f[: -len(f"_{suffix}.txt")]
        rows.append((name, stats(open(os.path.join(d, f)).read())))
    hdr = [
        "exchanges", "bcast", "bhj", "smj", "nlj", "cart",
        "batch_py", "arrow_py", "scans", "scans_no_pf", "bytes",
    ]
    print(f"{'query':30s} " + " ".join(f"{h:>9s}" for h in hdr))
    for name, s in sorted(rows, key=lambda r: (-r[1]["cart"], -r[1]["nlj"], -r[1]["exchanges"])):
        print(f"{name:30s} " + " ".join(f"{s[h]:>9d}" for h in hdr))
    tot = {h: sum(s[h] for _, s in rows) for h in hdr}
    print(f"{'TOTAL':30s} " + " ".join(f"{tot[h]:>9d}" for h in hdr))
    flagged = [n for n, s in rows if s["cart"]]
    print(f"\ncartesians: {flagged or 'none'}")
    print(f"rows with BatchEvalPython: {[n for n, s in rows if s['batch_py']] or 'none'}")


if __name__ == "__main__":
    main()
