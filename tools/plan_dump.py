"""Dump .explain("formatted") for registered queries to plans/r<N>/.

Usage:
    python tools/plan_dump.py --out plans/r14 --suffix before q1 q2 ...
    python tools/plan_dump.py --out plans/r14 --suffix after --all

Explain is driver-side only (no job runs), so this is safe to run on a
busy host.  Queries whose construction itself runs jobs (index builds,
persisted artifacts) still execute those build jobs; the returned frame's
plan is what gets dumped.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from python_ctd_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    outdir = os.path.join(REPO, args.out)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    qs = entrymod.queries()
    names = sorted(qs) if args.all else args.names
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
