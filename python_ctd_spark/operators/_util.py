"""Shared helpers for cast-ordered operators.

Every ordered operator is parameterized by:

- ``by``       : cast partition key column(s) (default ``cast_id``)
- ``order``    : ordering column(s) within a cast (default ``scan``) —
                 MUST be a deterministic total order (add tie-breakers);
- ``pressure`` : the physical index column (default ``pressure``);
- ``cols``     : value columns the kernel applies to (default: every
                 numeric column that is not key/order/pressure).

This is the Spark translation of the reference's implicit contract that a
pandas index carries both the physical coordinate and row order
(reference ctd/processing.py:8, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.window import WindowSpec

NUMERIC_TYPES = ("double", "float", "int", "bigint", "smallint", "tinyint", "decimal")


def as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def value_columns(
    df: DataFrame,
    cols: list[str] | str | None,
    by: list[str],
    order: list[str],
    pressure: str | None = None,
) -> list[str]:
    """Resolve the value columns an operator applies to."""
    if cols is not None:
        return as_list(cols)
    skip = set(by) | set(order) | ({pressure} if pressure else set())
    out = []
    for f in df.schema.fields:
        if f.name in skip:
            continue
        if f.dataType.typeName() in NUMERIC_TYPES or f.dataType.typeName().startswith("decimal"):
            out.append(f.name)
    return out


def cast_window(by, order) -> WindowSpec:
    """``Window.partitionBy(cast).orderBy(scan)`` — the engine's spine."""
    return Window.partitionBy(*as_list(by)).orderBy(*[F.col(c) for c in as_list(order)])


def null_where(col: str, cond: Column) -> Column:
    """``df[mask] = NaN`` (reference ctd/processing.py:108,162,179) as an
    expression: NULL where cond holds, else the original value."""
    return F.when(cond, F.lit(None).cast("double")).otherwise(F.col(col).cast("double"))
