"""Dump the INTERNAL plans of training_dataset (the row's returned frame
is the bounded report — a LocalTableScan — and the pipeline is
checkpoint-truncated, so the informative plans are the INPUTS of each
localCheckpoint plus the final report aggregation).  Throwaway r14-opt
evidence tool: intercepts DataFrame.localCheckpoint and the final
collect."""

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from python_ctd_spark.session import get_spark  # noqa: E402


class _Captured(Exception):
    def __init__(self, df):
        self.df = df


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out = sys.argv[1]
    spark = get_spark(app_name="dump_td_plan")
    q = entrymod.queries()["training_dataset"]

    sections = []
    orig_ckpt = DataFrame.localCheckpoint
    orig_collect = DataFrame.collect

    def ckpt(self, eager=True):
        sections.append(
            f"== localCheckpoint input #{len(sections) + 1} ==\n" + _fmt(self)
        )
        return orig_ckpt(self, eager=eager)

    def capture(self):
        raise _Captured(self)

    DataFrame.localCheckpoint = ckpt
    DataFrame.collect = capture
    try:
        q(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    except _Captured as c:
        sections.append("== final report aggregation ==\n" + _fmt(c.df))
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        DataFrame.collect = orig_collect

    text = "\n".join(sections)
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out} ({len(text)} bytes, {len(sections)} sections)")


if __name__ == "__main__":
    main()
