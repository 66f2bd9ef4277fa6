"""One-command round-over-round bench diff (VERDICT r6 item 8).

Compares the current full per-query map (BENCH_out.json) against a
previous round's record: either another BENCH_out.json-style file or a
driver BENCH_r0N.json artifact (whose ``parsed`` may be null — the
truncated ``tail`` capture is then regex-mined for whatever per-query
pairs survived the clipping).

Usage:
    python tools/bench_diff.py BENCH_r06.json [--min-ratio 1.3]
    python tools/bench_diff.py path/to/old_BENCH_out.json
    python tools/bench_diff.py BENCH_r09.json --fail-above 1.2

``--fail-above R`` (VERDICT r9 item 7) turns the diff into a REGRESSION
ALARM: exit nonzero naming every query that got >= R-times slower AND
slowed by at least ``--min-abs`` seconds (the absolute floor keeps
sub-second host jitter — measured at +/-5-20% on this machine — from
tripping the alarm; a 0.10s -> 0.13s wobble is noise, a 8s -> 10s drift
is not).  This replaces prose adjudication of host variance vs real
regressions in the round notes.
"""

from __future__ import annotations

import argparse
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_queries(path: str) -> dict[str, float]:
    # a driver BENCH_rN.json carries only the tail-capture's clipped
    # query map; when the same round's FULL archive (BENCH_full_rNN.json,
    # written by bench.py since r11) exists next to it, compare against
    # that instead so the diff covers the whole suite
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        full = os.path.join(
            os.path.dirname(path) or REPO, f"BENCH_full_r{int(m.group(1)):02d}.json"
        )
        if os.path.exists(full):
            # guard against a mis-attributed archive (a post-commit
            # re-run can write BENCH_full_r{N+1} from round-N code): the
            # substitute must carry the SAME suite total as the driver
            # artifact it stands in for, else fall back with a warning
            with open(path, encoding="utf-8") as f:
                drv = json.load(f)
            with open(full, encoding="utf-8") as f:
                fd = json.load(f)
            drv_val = (drv.get("parsed") or {}).get("value")
            if drv_val is None:
                mt = re.search(r'"value":([0-9.]+)', drv.get("tail", ""))
                drv_val = float(mt.group(1)) if mt else None
            if drv_val is not None and abs(fd.get("value", -1) - drv_val) < 0.015:
                print(f"using full archive {os.path.basename(full)} for "
                      f"{os.path.basename(path)}")
                path = full
            else:
                print(f"warning: {os.path.basename(full)} total "
                      f"{fd.get('value')} != driver artifact total {drv_val}"
                      f" — ignoring the archive (stale/mis-attributed run)")
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    if d.get("only"):
        print(f"warning: {os.path.basename(path)} is a FILTERED --only "
              f"run ({len(d['only'])} queries), not a full suite")
    if isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return {k: float(v) for k, v in parsed["queries"].items()}
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)', tail)
    out = {k: float(v) for k, v in pairs if k not in ("value", "sf", "n_queries")}
    if not out:
        raise SystemExit(f"no per-query map recoverable from {path}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", help="previous round record (BENCH_rN.json or full map)")
    ap.add_argument("--new", default=os.path.join(REPO, "BENCH_out.json"))
    ap.add_argument("--min-ratio", type=float, default=1.3,
                    help="report queries with new/old outside [1/r, r]")
    ap.add_argument("--fail-above", type=float, default=None,
                    help="exit nonzero if any query regressed by this "
                    "ratio or more (e.g. 1.2 = +20%%)")
    ap.add_argument("--min-abs", type=float, default=0.5,
                    help="absolute slowdown floor (sec) for --fail-above; "
                    "ratio blips below it are host jitter, not regressions")
    args = ap.parse_args()
    old = load_queries(args.old if os.path.exists(args.old)
                       else os.path.join(REPO, args.old))
    new = load_queries(args.new)
    common = sorted(set(old) & set(new))
    print(f"comparable: {len(common)}  new-only: {sorted(set(new) - set(old))}"
          f"  old-only: {sorted(set(old) - set(new))}")
    print(f"sum over comparable: old={sum(old[n] for n in common):.1f}s"
          f" new={sum(new[n] for n in common):.1f}s")
    # bench.py rounds per-query walls to 2 decimals, so a sub-5ms query
    # records 0.0 — treat old==0 as ratio=inf (report it, don't crash)
    ratio = {n: (new[n] / old[n] if old[n] else (1.0 if new[n] == 0 else float("inf")))
             for n in common}
    moved = [(n, new[n], old[n], ratio[n]) for n in common
             if ratio[n] >= args.min_ratio
             or ratio[n] <= 1 / args.min_ratio]
    for n, nv, ov, r in sorted(moved, key=lambda t: -t[3]):
        print(f"{n:30s} old={ov:6.2f} new={nv:6.2f} ratio={r:.2f}")
    if not moved:
        print(f"no query moved beyond {args.min_ratio}x")
    if args.fail_above is not None:
        # per-row variance floors (VERDICT r10 item 2): BENCH_VARIANCE.json
        # records rows whose min-of-3 wall is MEASURED to spread more than
        # the global threshold across runs/suite positions on identical
        # code; the alarm threshold for those rows is raised to the
        # measured spread so context jitter stops masquerading as
        # regression.  Each entry carries the measurement in "note".
        var_path = os.path.join(REPO, "BENCH_VARIANCE.json")
        floors: dict[str, float] = {}
        if os.path.exists(var_path):
            with open(var_path, encoding="utf-8") as f:
                floors = {
                    k: float(v["fail_above"])
                    for k, v in json.load(f).items()
                    if isinstance(v, dict) and "fail_above" in v
                }

        def bar(n: str) -> float:
            return max(args.fail_above, floors.get(n, 0.0))

        regressed = sorted(
            (n for n in common
             if ratio[n] >= bar(n)
             and (new[n] - old[n]) >= args.min_abs),
            key=lambda n: -(new[n] - old[n]),
        )
        if regressed:
            names = ", ".join(
                f"{n} ({old[n]:.2f}s -> {new[n]:.2f}s, {ratio[n]:.2f}x)"
                for n in regressed
            )
            print(f"REGRESSION ALARM (>= {args.fail_above}x and >= "
                  f"{args.min_abs}s slower): {names}")
            raise SystemExit(2)
        varied = [n for n in common if floors.get(n, 0.0) > args.fail_above
                  and ratio[n] >= args.fail_above]
        note = (f"; variance-floored rows passed: "
                f"{', '.join(f'{n} ({ratio[n]:.2f}x < {floors[n]:.2f}x floor)' for n in varied)}"
                if varied else "")
        print(f"regression alarm clean (threshold {args.fail_above}x, "
              f"floor {args.min_abs}s{note})")


if __name__ == "__main__":
    main()
