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


def _assert_hash_stable_types(
    name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
):
    """The driver hashes *raw* values, so a DuckDB HUGEINT (fetchdf
    widens it to float64) or int128-as-object against a Spark BIGINT
    hash-mismatches even when every value is equal — this cost rounds
    4 (domain_stats/pack_documents) and 5 (q12_ship_delay).  Fail the
    local gate before the int64 coercion hides it: any oracle whose
    integer SUM/COUNT arithmetic lacks a CAST(... AS BIGINT) dies here
    instead of at the driver."""
    for c in spark_pdf.columns:
        if c not in duck_pdf.columns:
            continue
        sv, dv = spark_pdf[c].dtype, duck_pdf[c].dtype
        if pd.api.types.is_integer_dtype(sv) and not pd.api.types.is_integer_dtype(dv):
            raise AssertionError(
                f"{name}.{c}: Spark emits integer ({sv}) but the DuckDB oracle "
                f"yields {dv} — likely an un-CAST HUGEINT SUM; wrap the oracle "
                f"expression in CAST(... AS BIGINT) so the driver hash matches"
            )
        if dv == object and not (
            pd.api.types.is_object_dtype(sv)
            or pd.api.types.is_string_dtype(sv)
            or sv == object
        ):
            raise AssertionError(
                f"{name}.{c}: DuckDB oracle yields object dtype against Spark "
                f"{sv} — hash-unstable; cast the oracle column explicitly"
            )


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    _assert_hash_stable_types(name, spark_pdf, duck_pdf)
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


def test_type_gate_catches_uncast_hugeint():
    """The strict gate must red-flag exactly the failure class that cost
    rounds 4 and 5: an oracle SUM left as HUGEINT (float64 via fetchdf)
    against a Spark int64 column."""
    duck = duckdb.connect().execute("SELECT SUM(1) AS n FROM range(3)").fetchdf()
    assert not pd.api.types.is_integer_dtype(duck["n"].dtype)  # HUGEINT widened
    spark_like = pd.DataFrame({"n": pd.Series([3], dtype="int64")})
    with pytest.raises(AssertionError, match="BIGINT"):
        _assert_hash_stable_types("selftest", spark_like, duck)
    # and the cast form passes
    duck_ok = duckdb.connect().execute(
        "SELECT CAST(SUM(1) AS BIGINT) AS n FROM range(3)"
    ).fetchdf()
    _assert_hash_stable_types("selftest", spark_like, duck_ok)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0
