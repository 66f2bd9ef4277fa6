"""Alignment and metadata joins (SURVEY.md §2.5).

The reference has no explicit joins; its implicit join-like behaviors are
pandas **index alignment** on binary ops (e.g.
``dirty[~spikes] == clean[~spikes]``, reference
tests/test_processing_real_data.py:30-31) and the ``_metadata``
side-channel lookup.  The engine makes both first-class:

- :func:`align_frames` — the canonical inner equi-join on
  ``(cast_id, scan)``: two processing states of the same casts, matched
  row-for-row.  Both sides are partitioned the same way, so at scale this
  is a co-partitioned sort-merge join (one exchange per side, reusable
  across a chain of alignments).
- :func:`with_meta` — enrich scans with cast metadata (lat/lon/time/...):
  ``cast_meta`` is one small row per cast -> **broadcast hash join**, the
  fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from python_ctd_spark.operators._util import as_list
from python_ctd_spark.schema import CAST_ID, SCAN


def align_frames(
    left: DataFrame,
    right: DataFrame,
    by=CAST_ID,
    order=SCAN,
    suffixes: tuple[str, str] = ("", "_r"),
) -> DataFrame:
    """Inner-join two states of the same casts on (cast, scan) — the Spark
    analog of pandas index alignment.  Non-key columns appearing on both
    sides get ``suffixes``."""
    keys = as_list(by) + as_list(order)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    lsuf, rsuf = suffixes
    lsel = left.select(
        *keys, *[F.col(c).alias(c + lsuf) for c in left.columns if c not in keys]
    )
    rsel = right.select(
        *keys,
        *[
            F.col(c).alias(c + rsuf if c in overlap else c)
            for c in right.columns
            if c not in keys
        ],
    )
    return lsel.join(rsel, keys)


def with_meta(
    df: DataFrame,
    meta: DataFrame,
    by=CAST_ID,
    meta_cols=None,
) -> DataFrame:
    """Broadcast-join cast metadata onto scan rows (the ``_metadata``
    side-channel as a proper dimension, SURVEY.md §1.4)."""
    by = as_list(by)
    if meta_cols is not None:
        meta = meta.select(*by, *as_list(meta_cols))
    return df.join(F.broadcast(meta), by, "left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_time: str,
    right_time: str,
    value_cols=None,
    right_order=None,
) -> DataFrame:
    """As-of (most-recent-at-or-before) join: for every left row, attach
    the right row with the greatest ``right_time <= left_time`` within the
    same ``on`` key group — the time-series enrichment join the reference's
    pandas world gets from ``merge_asof``.

    Implementation is the union-merge pattern, NOT a range join: tag both
    sides, union on (key, time), and carry the right side's values forward
    with ``last(..., ignorenulls=True)`` over
    ``Window.partitionBy(on).orderBy(time, side)``.  One shuffle on the
    key, O(n log n) in the partition — a range join would generate
    O(left x right) candidates per key before filtering, which is the
    classic 100 TB trap.  Right rows sort before left rows at equal
    timestamps (side 0 < 1), making the match inclusive; ties between
    right rows at the same timestamp are broken by ``right_order``
    (last one wins).

    Returns all left columns plus ``value_cols`` from the right (null
    when no right row precedes the left row).
    """
    on = as_list(on)
    value_cols = as_list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in on and c != right_time
    ]
    tiebreak = as_list(right_order) if right_order is not None else []

    carried = [f"__v_{c}" for c in value_cols]
    rsel = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, carried)],
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak],
    )
    lsel = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(t.dataType).alias(a)
          for t, a in zip([right.schema[c] for c in value_cols], carried)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
          for c in tiebreak],
    )
    merged = lsel.unionByName(rsel, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side", *[F.col(f"__tb_{c}").asc_nulls_last() for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.select(
        "*", *[F.last(a, ignorenulls=True).over(w).alias(f"__c_{a}") for a in carried]
    )
    keep = [c for c in left.columns] + [
        F.col(f"__c___v_{c}").alias(c) for c in value_cols
    ]
    return out.filter(F.col("__side") == 1).select(*keep)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: float,
    on=None,
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``lo <= point <= hi`` (optionally also matching ``on`` equality
    keys) — the enrichment join for "which window does this event fall
    in" questions that plain equi-joins can't express.

    Spark has no native range join, and the naive formulation
    ``points.join(intervals, (pt >= lo) & (pt <= hi))`` compiles to a
    broadcast nested loop — O(|points| x |intervals|) comparisons, the
    classic 100 TB trap.  This implementation grid-buckets instead:
    each interval explodes into the integer grid cells it covers
    (``floor(v / bucket)``), each point lands in exactly ONE cell, and
    the join is a plain hash equi-join on (keys..., cell) followed by
    the exact containment filter.  A qualifying pair meets in exactly
    one cell (the point's own), so no dedup pass is needed and the
    output multiplicity is exact.

    ``bucket`` should be of the order of the TYPICAL interval length:
    cells-per-interval ~ len/bucket + 1 rows of fan-out on the interval
    side (keep it small), while candidate pairs per point ~ intervals
    overlapping its cell (a too-large bucket degrades toward the
    cartesian).  Pathologically long intervals fan out proportionally —
    cap or split them upstream.
    """
    if not bucket > 0:
        raise ValueError(f"bucket must be positive, got {bucket!r}")
    on = as_list(on)
    cell = lambda c: F.floor(F.col(c) / F.lit(bucket)).cast("bigint")  # noqa: E731
    iv = intervals.withColumn(
        "__cell", F.explode(F.sequence(cell(lo_col), cell(hi_col)))
    )
    pt = points.withColumn("__cell", cell(point_col))
    joined = pt.join(iv, on + ["__cell"]).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("__cell")
