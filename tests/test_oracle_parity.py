"""Driver-gate rehearsal: run every ``queries()`` entry at sf0.01 and
compare against its DuckDB ``oracle_sql()`` twin — row count, schema
arity, and exact (order-insensitive) values.  This is stricter than a
hash: mismatches print the offending columns."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("bool")
        else:
            pdf[c] = pdf[c].astype("string")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                bad = ~((av.isna() & bv.isna()) | (av == bv))
                diff = (av[bad] - bv[bad]).abs().max()
                raise AssertionError(
                    f"{name}.{c}: {int(bad.sum())} mismatches, max abs diff {diff}"
                )
        else:
            mism = ~((av.isna() & bv.isna()) | (av == bv))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, e.g. "
                f"{av[mism].head(3).tolist()} vs {bv[mism].head(3).tolist()}"
            )


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    spark_pdf = q(spark, SF_DIR).toPandas()
    assert len(spark_pdf) >= 0
    if sql is None:
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    duck_pdf = ddb.execute(sql).fetchdf()
    _compare(name, spark_pdf, duck_pdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0
