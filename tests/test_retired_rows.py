"""Local value gate for registry rows retired in r14 (near-twin
consolidation, VERDICT r13 item 1): the operators left the DRIVER
audit window, not the correctness contract — every retired row still
runs against its DuckDB oracle at sf0.01 on every local test run,
through the same compare the live registry uses."""

import pytest

import __spark_entry__ as entrymod

# the parity harness's compare, sf dir, AND DuckDB-view fixture are
# imported, not copied (review r14): a future change to how parity
# tests mount the parquet views must flow through here automatically
from test_oracle_parity import SF_DIR, _compare, ddb  # noqa: F401


RETIRED = sorted(entrymod.retired_queries().keys())


def test_retired_rows_left_the_registry():
    live = set(entrymod.queries())
    assert not (set(RETIRED) & live)
    # and every retired row still has its oracle pair
    assert set(entrymod.retired_oracle_sql()) == set(RETIRED)


@pytest.mark.parametrize("name", RETIRED)
def test_retired_row_matches_oracle(spark, ddb, name):
    q = entrymod.retired_queries()[name]
    sql = entrymod.retired_oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(sql).fetchdf()
    _compare(name, spark_pdf, duck_pdf)
