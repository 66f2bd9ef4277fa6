"""Predicate operators — reference ``remove_above_water`` / ``remove_up_to``
(ctd/processing.py:21-35).

Pure Catalyst filters: on a parquet-backed cast table these compile to
``PushedFilters: [GreaterThanOrEqual(pressure, ...)]`` on the scan itself —
zero rows ever leave the data source for pruned casts/row-groups.  At
100 TB this is the single highest-leverage operator: express it early in
the chain and Catalyst pushes it below everything order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from python_ctd_spark.schema import PRESSURE


def remove_up_to(df: DataFrame, idx: float, pressure: str = PRESSURE) -> DataFrame:
    """Drop all rows whose physical index (pressure/depth) is below ``idx``.

    Reference: ``ctd/processing.py:28-35`` (``df[df.index >= idx]``).
    """
    return df.filter(F.col(pressure) >= F.lit(idx))


def remove_above_water(df: DataFrame, pressure: str = PRESSURE) -> DataFrame:
    """Drop all rows above the water line (index < 0).

    Reference: ``ctd/processing.py:21-25``.
    """
    return remove_up_to(df, 0, pressure=pressure)
