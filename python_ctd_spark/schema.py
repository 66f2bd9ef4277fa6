"""Canonical schemas + instrument-column name registry.

The reference keeps raw instrument strings as pandas column names
(``t090C``, ``c0S/m``, ``sbeox0Mm/Kg`` — reference ``ctd/read.py:136-139``)
and deduplicates repeats with a ``_`` suffix (``ctd/read.py:95-119``).
Spark column names cannot contain ``.``/whitespace without backtick pain, so
the engine sanitizes names through a reversible registry: every reader
returns (DataFrame with safe names, {safe -> raw} mapping persisted into the
cast_meta table as a map column).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

CAST_ID = "cast_id"
SCAN = "scan"
PRESSURE = "pressure"

#: Pressure/depth column priority for CNV files (reference ctd/read.py:445-456).
PRESSURE_KEYS = [
    "prM", "prE", "prDM", "pr50M", "pr50M1", "prSM", "prdM", "pr",
    "depSM", "prDE",
]

_UNSAFE = re.compile(r"[^0-9A-Za-z_]")


def normalize_name(name: str) -> str:
    """Strip whitespace and '*' — reference ``_normalize_names``
    (ctd/read.py:30-33)."""
    return name.strip().strip("*")


def safe_name(raw: str) -> str:
    """Map a raw instrument column name to a Spark-safe identifier.

    ``c0S/m`` -> ``c0S_m``; mojibake and unit glyphs collapse to ``_``.
    Reversible via the registry returned by :func:`sanitize_names`.
    """
    s = _UNSAFE.sub("_", normalize_name(raw))
    if not s or s[0].isdigit():
        s = "c_" + s
    return s


def rename_duplicate_columns(names: list[str]) -> list[str]:
    """Second occurrence of a duplicated name gets a ``_`` suffix; more than
    two occurrences raise — reference ``_remane_duplicate_columns``
    (ctd/read.py:95-119, tested tests/test_read.py:107-109)."""
    from collections import Counter

    counts = Counter(names)
    for item, count in counts.items():
        if count > 2:
            msg = (
                "Cannot handle more than two duplicated columns. "
                f"Found {count} for {item}."
            )
            raise ValueError(msg)
    out = list(names)
    for item, count in counts.items():
        if count > 1:
            # last index of the item == its second occurrence
            idx = len(out) - 1 - out[::-1].index(item)
            out[idx] = f"{out[idx]}_"
    return out


def sanitize_names(raw_names: list[str]) -> tuple[list[str], dict[str, str]]:
    """Raw instrument names -> unique Spark-safe names + registry.

    Applies the reference's duplicate rule first (on raw names), then the
    safe-name mapping, then a final uniquify pass (distinct raw names can
    collide after sanitization).
    """
    deduped = rename_duplicate_columns([normalize_name(n) for n in raw_names])
    safe: list[str] = []
    seen: dict[str, int] = {}
    registry: dict[str, str] = {}
    for raw in deduped:
        s = safe_name(raw)
        if s in seen:
            seen[s] += 1
            s = f"{s}_{seen[s]}"
        else:
            seen[s] = 0
        safe.append(s)
        registry[s] = raw
    return safe, registry


#: cast_meta — the reference's ``_metadata`` dict (ctd/read.py:207-218) as a
#: proper joinable table.  Broadcast-join it onto scans when enrichment is
#: needed; never carry header blobs through shuffles.
CAST_META_SCHEMA = T.StructType([
    T.StructField("cast_id", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("time", T.TimestampType(), True),
    T.StructField("lat", T.DoubleType(), True),
    T.StructField("lon", T.DoubleType(), True),
    T.StructField("header", T.StringType(), True),
    T.StructField("config", T.StringType(), True),
    T.StructField("serial", T.StringType(), True),
    T.StructField("time_of_reset", T.TimestampType(), True),
    T.StructField("columns", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("units", T.ArrayType(T.StringType()), True),
    T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
])
