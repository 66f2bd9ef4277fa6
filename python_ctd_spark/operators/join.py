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

from pyspark.sql import DataFrame, functions as F

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
