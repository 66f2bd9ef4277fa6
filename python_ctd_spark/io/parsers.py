"""Per-file text parsers for the seven instrument formats.

These are pure Python (+pandas for fixed-width), designed to run inside
``mapInPandas`` over a ``binaryFile`` scan: one file per invocation, line
order preserved natively, encoding and compression handled per file.
They re-express the semantics of the reference readers (cited per
function) on a different architecture: each parser returns a
``ParsedCast`` carrying a *wide pandas frame in file order* plus a
metadata dict; the Spark layer (readers.py) aligns frames to a fleet-wide
schema and builds the distributed table.

No code is copied from the reference — formats are re-derived from its
documented behavior and the sample files' structure.
"""

from __future__ import annotations

import bz2
import datetime
import gzip
import io
import re
import zipfile
from dataclasses import dataclass, field
from pathlib import PurePath

import numpy as np
import pandas as pd

from python_ctd_spark.schema import (
    PRESSURE_KEYS,
    normalize_name,
    rename_duplicate_columns,
    sanitize_names,
)

#: reserved engine column names — a sensor channel that sanitizes to one of
#: these gets a ``_ch`` suffix so it never shadows the engine's keys.
RESERVED = {"cast_id", "scan", "pressure", "channel"}


@dataclass
class ParsedCast:
    """One parsed instrument file."""

    cast_id: str
    data: pd.DataFrame  # wide, file order; no cast_id column yet
    meta: dict = field(default_factory=dict)
    columns: dict = field(default_factory=dict)  # safe -> raw channel names


# ---------------------------------------------------------------------------
# bytes -> text  (reference _read_file/_open_compressed, ctd/read.py:36-92)
# ---------------------------------------------------------------------------

_DECOMPRESSORS = {
    ".gz": lambda b: gzip.decompress(b),
    ".gzip": lambda b: gzip.decompress(b),
    ".bz2": lambda b: bz2.decompress(b),
}


def decompress(name: str, content: bytes) -> bytes:
    """Transparent gz/bz2/zip decompression by extension.  Zip archives may
    hold several members; like the reference (ctd/read.py:51-59) only the
    first member is read."""
    ext = PurePath(name).suffix.casefold()
    if ext == ".zip":
        with zipfile.ZipFile(io.BytesIO(content)) as zf:
            member = zf.namelist()[0]
            with zf.open(member) as fh:
                return fh.read()
    fn = _DECOMPRESSORS.get(ext)
    return fn(content) if fn else content


#: cp1252 leaves exactly these five bytes unmapped; their presence in a
#: non-UTF-8 file is the byte-level signal to prefer latin-1 (where they
#: are C1 controls) over cp1252, which would otherwise replace them.
_CP1252_HOLES = frozenset({0x81, 0x8D, 0x8F, 0x90, 0x9D})


def sniff_decode(content: bytes) -> str:
    """Decode with a light encoding sniff (the reference uses chardet,
    ctd/read.py:88-91; not available here).  UTF-8 strict first; on
    failure pick between the two dominant single-byte instrument encodings
    by byte frequency: cp1252 (covers the reference's cp1252 BTL corpus,
    tests/test_read.py:67-74) unless bytes in cp1252's unmapped holes
    appear, in which case latin-1 decodes every byte losslessly.  Final
    decode still uses errors="replace" (matching the reference's policy)
    so no input can ever raise."""
    try:
        return content.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _CP1252_HOLES.intersection(content):
        return content.decode("latin-1", errors="replace")
    return content.decode("cp1252", errors="replace")


def read_text(name: str, content: bytes) -> str:
    return sniff_decode(decompress(name, content))


def stem_of(name: str) -> str:
    p = PurePath(name)
    stem = p.stem
    while PurePath(stem).suffix.casefold() in {".cnv", ".edf", ".txt", ".ros", ".btl", ".bl", ".csv", ".gz", ".gzip", ".bz2", ".zip"}:
        stem = PurePath(stem).stem
    return stem


# ---------------------------------------------------------------------------
# coordinate / time helpers (reference ctd/read.py:153-181, 349-370)
# ---------------------------------------------------------------------------

def ddm_to_decimal(text: str) -> float | None:
    """'28 34.567 N' / '39 52.7417W' degrees-decimal-minutes -> signed
    decimal degrees."""
    text = text.strip()
    if not text:
        return None
    hemisphere = text[-1].upper()
    if hemisphere not in "NSEW":
        return None
    body = text[:-1].strip()
    parts = body.split()
    try:
        deg = float(parts[0])
        minutes = float(parts[1]) if len(parts) > 1 else 0.0
    except (ValueError, IndexError):
        return None
    value = deg + minutes / 60.0
    return -value if hemisphere in "SW" else value


def parse_nmea_time(text: str) -> datetime.datetime | None:
    try:
        return datetime.datetime.strptime(text.strip(), "%b %d %Y %H:%M:%S").replace(
            tzinfo=datetime.timezone.utc
        )
    except ValueError:
        return None


def _safe_channels(raw_names: list[str]) -> tuple[list[str], dict[str, str]]:
    """Sanitize + dedupe raw instrument names, keeping clear of reserved
    engine columns."""
    safe, registry = sanitize_names(raw_names)
    out, reg = [], {}
    for s in safe:
        s2 = s + "_ch" if s in RESERVED else s
        out.append(s2)
        reg[s2] = registry[s]
    return out, reg


# ---------------------------------------------------------------------------
# Sea-Bird header (reference _parse_seabird, ctd/read.py:122-219)
# ---------------------------------------------------------------------------

_CNV_NAME_RE = re.compile(r"#\s*name\s+\d+\s*=\s*([^:]+):?(.*)$")


def parse_seabird_header(lines: list[str], ftype: str) -> dict:
    """State machine over the ``*`` / ``#`` header of CNV/ROS/BTL files.

    Returns name/header/config/names/skiprows/time/lat/lon — the same
    metadata surface as the reference, independently implemented.
    """
    header: list[str] = []
    config: list[str] = []
    names: list[str] = []
    lat = lon = time = None
    fname = None
    skiprows = 0

    for k, raw in enumerate(lines):
        line = raw.strip()

        if ftype in ("cnv", "ros") and line.startswith("#"):
            m = _CNV_NAME_RE.match(line)
            if m:
                names.append(normalize_name(m.group(1)))

        if line.startswith("*"):
            header.append(line)
            if "FileName" in line:
                fname = PurePath(line.split("=")[-1].strip().replace("\\", "/")).stem
        if line.startswith("#"):
            config.append(line)

        if "NMEA Latitude" in line:
            lat = ddm_to_decimal(line.split("=", 1)[1])
        elif "NMEA Longitude" in line:
            lon = ddm_to_decimal(line.split("=", 1)[1])
        elif "NMEA UTC (Time)" in line:
            time = parse_nmea_time(line.split("=", 1)[1])

        if ftype in ("cnv", "ros"):
            if line == "*END*":
                skiprows = k + 1
                break
        else:  # btl: first non-comment, non-blank row carries the names
            if line and not (line.startswith("*") or line.startswith("#")):
                # un-concatenate 'Sbeox' glued to the previous name
                # (known Sea-Bird quirk, reference ctd/read.py:195-199)
                names = re.sub(r"(\S)Sbeox", r"\1 Sbeox", line).split()
                skiprows = k + 2  # the following line holds Position/Time
                break

    if ftype == "btl":
        names = [*names, "Statistic"]

    return {
        "name": fname,
        "header": "\n".join(header),
        "config": "\n".join(config),
        "names": rename_duplicate_columns(names),
        "skiprows": skiprows,
        "time": time,
        "lat": lat,
        "lon": lon,
    }


# ---------------------------------------------------------------------------
# CNV / ROS (reference from_cnv, ctd/read.py:406-493)
# ---------------------------------------------------------------------------

_BOOL_COLS = {"pumps", "flag"}
_INT_COLS = {"bpos", "nbf"}


def parse_cnv(name: str, content: bytes) -> ParsedCast:
    """Sea-Bird CNV (and ROS): header state machine -> whitespace rows ->
    numeric coercion -> pressure-index selection from the priority list
    (reference ctd/read.py:445-456); ``depSM`` depth index converts to
    pressure downstream (readers.py) when latitude is known."""
    text = read_text(name, content)
    lines = text.splitlines()
    meta = parse_seabird_header(lines, "cnv")
    raw_names = meta.pop("names")

    rows = [ln.split() for ln in lines[meta.pop("skiprows"):] if ln.strip()]
    pdf = pd.DataFrame(rows, columns=raw_names, dtype=object)

    for col in pdf.columns:
        base = col.rstrip("_")
        if base in _BOOL_COLS:
            pdf[col] = pd.to_numeric(pdf[col], errors="coerce").astype(bool)
        elif base in _INT_COLS:
            pdf[col] = pd.to_numeric(pdf[col], errors="coerce").astype("int64")
        else:
            pdf[col] = pd.to_numeric(pdf[col], errors="coerce")

    prkeys = [k for k in PRESSURE_KEYS if k in pdf.columns]
    if not prkeys:
        msg = "Expected one pressure/depth column, didn't receive any"
        raise ValueError(msg)
    prkey = prkeys[0]

    pressure = pdf.pop(prkey).astype(float)
    safe, registry = _safe_channels(list(pdf.columns))
    pdf.columns = safe
    pdf.insert(0, "scan", np.arange(1, len(pdf) + 1, dtype="int64"))
    pdf.insert(1, "pressure", pressure.to_numpy())

    cast_id = meta["name"] or stem_of(name)
    meta.update({"name": cast_id, "prkey": prkey, "source_path": name})
    return ParsedCast(cast_id=cast_id, data=pdf, meta=meta, columns=registry)


# ---------------------------------------------------------------------------
# BTL (reference from_btl, ctd/read.py:251-328) — raw fixed-width rows only;
# the grouped date-stitch/ffill reshape is done in Spark (readers.py)
# ---------------------------------------------------------------------------

def parse_btl_raw(name: str, content: bytes) -> ParsedCast:
    text = read_text(name, content)
    lines = text.splitlines()
    meta = parse_seabird_header(lines, "btl")
    raw_names = meta.pop("names")
    skiprows = meta.pop("skiprows")

    pdf = pd.read_fwf(
        io.StringIO(text),
        header=None,
        index_col=False,
        names=raw_names,
        skiprows=skiprows,
    )
    safe, registry = _safe_channels(list(pdf.columns))
    pdf.columns = safe
    for col in pdf.columns:
        pdf[col] = pdf[col].astype("string")
    pdf.insert(0, "line", np.arange(1, len(pdf) + 1, dtype="int64"))

    cast_id = meta["name"] or stem_of(name)
    meta.update({"name": cast_id, "source_path": name})
    return ParsedCast(cast_id=cast_id, data=pdf, meta=meta, columns=registry)


# ---------------------------------------------------------------------------
# XBT EDF (reference from_edf, ctd/read.py:331-403)
# ---------------------------------------------------------------------------

def parse_edf(name: str, content: bytes) -> ParsedCast:
    text = read_text(name, content)
    lines = text.splitlines()
    header: list[str] = []
    names: list[str] = []
    serial = None
    lat = lon = None
    skiprows = 0

    for k, raw in enumerate(lines):
        line = raw.strip()
        if line.startswith("Serial Number"):
            serial = line.split(":", 1)[1].strip()
        elif line.startswith("Latitude"):
            lat = ddm_to_decimal(line.split(":", 1)[1]) if ":" in line else None
        elif line.startswith("Longitude"):
            lon = ddm_to_decimal(line.split(":", 1)[1]) if ":" in line else None
        else:
            header.append(line)
            if line.startswith("Field"):
                # 'Field3 :  Temperature (�C)' -> 'temperature'
                rhs = line.split(":", 1)[1].strip().casefold()
                names.append(rhs.split()[0])
        if line == "// Data":
            skiprows = k + 1
            break

    rows = [ln.split() for ln in lines[skiprows:] if ln.strip()]
    pdf = pd.DataFrame(rows, columns=names, dtype=object)
    for col in pdf.columns:
        pdf[col] = pd.to_numeric(pdf[col], errors="coerce")

    depth = pdf.pop("depth").astype(float)
    safe, registry = _safe_channels(list(pdf.columns))
    pdf.columns = safe
    pdf.insert(0, "scan", np.arange(1, len(pdf) + 1, dtype="int64"))
    pdf.insert(1, "pressure", depth.to_numpy())  # depth index, meters

    cast_id = stem_of(name)
    meta = {
        "name": cast_id,
        "header": "\n".join(header),
        "serial": serial,
        "lat": lat,
        "lon": lon,
        "index_name": "Depth [m]",
        "source_path": name,
    }
    return ParsedCast(cast_id=cast_id, data=pdf, meta=meta, columns=registry)


# ---------------------------------------------------------------------------
# FSI (reference from_fsi, ctd/read.py:496-525)
# ---------------------------------------------------------------------------

def parse_fsi(name: str, content: bytes, skiprows: int = 9) -> ParsedCast:
    text = read_text(name, content)
    lines = [ln for ln in text.splitlines()[skiprows:] if ln.strip()]
    names = lines[0].split()
    rows = [ln.split() for ln in lines[1:]]
    pdf = pd.DataFrame(rows, columns=names, dtype=object).astype(float)

    pressure = pdf.pop("PRES").astype(float)
    safe, registry = _safe_channels(list(pdf.columns))
    pdf.columns = safe
    pdf.insert(0, "scan", np.arange(1, len(pdf) + 1, dtype="int64"))
    pdf.insert(1, "pressure", pressure.to_numpy())

    cast_id = stem_of(name)
    meta = {"name": cast_id, "source_path": name}
    return ParsedCast(cast_id=cast_id, data=pdf, meta=meta, columns=registry)


# ---------------------------------------------------------------------------
# BL bottle-trip log (reference from_bl, ctd/read.py:222-248)
# ---------------------------------------------------------------------------

def parse_bl(name: str, content: bytes) -> ParsedCast:
    text = read_text(name, content)
    lines = text.splitlines()
    reset = None
    if len(lines) > 1 and lines[1].startswith("RESET"):
        try:
            reset = datetime.datetime.strptime(
                lines[1][6:].strip(), "%b %d %Y %H:%M:%S"
            )
        except ValueError:
            reset = None

    recs = []
    for ln in lines[2:]:
        parts = [p.strip() for p in ln.split(",")]
        if len(parts) < 4 or not parts[0]:
            continue
        try:
            t = datetime.datetime.strptime(parts[2], "%b %d %Y %H:%M:%S")
        except ValueError:
            t = None
        recs.append(
            {
                "bottle_number": int(parts[0]),
                "fire_seq": int(parts[1]) if parts[1] else None,
                "time": t,
                "startscan": int(parts[3]) if len(parts) > 3 and parts[3] else None,
                "endscan": int(parts[4]) if len(parts) > 4 and parts[4] else None,
            }
        )
    pdf = pd.DataFrame(
        recs, columns=["bottle_number", "fire_seq", "time", "startscan", "endscan"]
    )
    cast_id = stem_of(name)
    meta = {"name": cast_id, "time_of_reset": reset, "source_path": name}
    return ParsedCast(cast_id=cast_id, data=pdf, meta=meta, columns={})


# ---------------------------------------------------------------------------
# CastAway CSV (reference from_castaway_csv, ctd/read.py:557-601)
# ---------------------------------------------------------------------------

def parse_castaway(name: str, content: bytes) -> ParsedCast:
    text = read_text(name, content)
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    meta_lines = [ln for ln in lines if ln.startswith("%")]
    data_lines = [ln for ln in lines if not ln.startswith("%")]

    header = data_lines[0].split(",")
    rows = [ln.split(",") for ln in data_lines[1:]]
    pdf = pd.DataFrame(rows, columns=header, dtype=object)
    for col in pdf.columns:
        pdf[col] = pd.to_numeric(pdf[col], errors="coerce")

    units = [c[c.find("(") + 1 : c.find(")")] for c in pdf.columns]
    snake = [
        normalize_name(c.split("(")[0]).lower().replace(" ", "_") for c in pdf.columns
    ]
    registry = dict(zip(snake, list(pdf.columns)))
    pdf.columns = snake

    pressure = pdf.pop("pressure").astype(float)
    pdf.insert(0, "scan", np.arange(1, len(pdf) + 1, dtype="int64"))
    pdf.insert(1, "pressure", pressure.to_numpy())

    meta: dict = {}
    for ln in meta_lines:
        body = ln.lstrip("%").strip()
        if "," in body:
            k, v = body.split(",", 1)
            meta[k.strip()] = v.strip()
    cast_id = stem_of(name)
    out_meta = {
        "name": cast_id,
        "units": units,
        "extra": meta,
        "lat": _maybe_float(meta.get("Start latitude")),
        "lon": _maybe_float(meta.get("Start longitude")),
        "source_path": name,
    }
    registry.pop("pressure", None)
    return ParsedCast(cast_id=cast_id, data=pdf, meta=out_meta, columns=registry)


def _maybe_float(x):
    try:
        return float(x) if x is not None else None
    except ValueError:
        return None


PARSERS = {
    "cnv": parse_cnv,
    "ros": parse_cnv,
    "btl": parse_btl_raw,
    "edf": parse_edf,
    "fsi": parse_fsi,
    "bl": parse_bl,
    "castaway": parse_castaway,
}
