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

#: Tokenizer whitespace class, written out instead of ``\s``: Java regex
#: ``\s`` also matches U+000B (vertical tab) while the DuckDB/RE2
#: oracles' ``\s`` does not, so a document containing \x0B would
#: tokenize differently across engines.  This class is exactly RE2's
#: ``\s`` ([ \t\n\f\r]); documents are expected to pass through
#: ``normalize_text`` (which strips \x0B with the other controls) before
#: token-sensitive dedup anyway.
WS_RE = r"[ \t\n\f\r]+"
#: Same class escaped for embedding in a Spark SQL string literal
#: (SQL literal backslashes are themselves escaped).
WS_SQL = r"[ \\t\\n\\f\\r]+"


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


#: aggregates that decompose into (partial, final) pairs for two-stage
#: salted aggregation.  sum/count combine with sum; min/max are idempotent.
_SALTABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys,
    aggs: dict,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: stage 1 aggregates on
    ``(keys..., salt)`` where the salt is a uniform hash of the full row
    spread across ``n_salts`` buckets, stage 2 combines the partials on
    the true keys.  A single hot key becomes ``n_salts`` map-side groups
    instead of one straggler reducer.

    ``aggs`` maps output column name -> ('sum'|'count'|'min'|'max', col).
    Only algebraic aggregates decompose this way — avg must be expressed
    as sum/count by the caller (and exact decimal sums survive the
    two-stage combine unchanged, since decimal addition is associative).

    Spark's AQE handles skewed *joins* at runtime; skewed *aggregations*
    already get map-side partial aggregation for free, so reach for this
    only when the partial-agg hash table thrashes (billions of distinct
    (key, value) combinations per task) — the classic 100 TB case is a
    high-cardinality count-distinct-ish rollup under a hot key.
    """
    keys = as_list(keys)
    unknown = {kind for kind, _ in aggs.values()} - set(_SALTABLE)
    if unknown:
        msg = f"salted_agg supports {sorted(_SALTABLE)}, got {sorted(unknown)}"
        raise ValueError(msg)
    salt = (F.hash(*[F.col(c) for c in df.columns]) % n_salts).alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _SALTABLE[kind][0](F.col(col)).alias(f"__p_{out}")
            for out, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _SALTABLE[kind][1](F.col(f"__p_{out}")).alias(out)
            for out, (kind, col) in aggs.items()
        ]
    )
