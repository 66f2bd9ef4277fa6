"""Distributed readers: instrument files -> (cast table, cast_meta table).

Architecture (SURVEY.md §4.3, §7.1): a ``binaryFile`` scan ships each
file's bytes to an executor; a ``mapInPandas`` stage runs the pure-Python
parser per file (line order native, compression/encoding per file) and
emits Arrow batches aligned to a fleet-wide schema.  Schema discovery is
a first lightweight distributed pass (like ``spark.read.json`` inference)
that also yields the ``cast_meta`` table — one row per file, so it is
always driver-small and broadcast-joinable.

Scale model: files are casts (<= a few MB each); 100 TB = millions of
files, embarrassingly parallel.  Discovery is fully distributed: the
driver materializes only the unioned channel schema (one row per distinct
column) and the duplicate-stem renames (one row per collision) — both
bounded by data shape, never by file count.  ``cast_meta`` is pure column
expressions over the discovery frame, no createDataFrame round-trip.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from python_ctd_spark.functions.teos10 import p_from_z_col
from python_ctd_spark.io import parsers

_SPECIAL_TYPES = {"bool": T.BooleanType(), "int64": T.LongType()}


def _scan_files(spark: SparkSession, paths) -> DataFrame:
    if isinstance(paths, (list, tuple)):
        return spark.read.format("binaryFile").load(list(paths))
    return spark.read.format("binaryFile").load(paths)


def _dtype_tag(dtype) -> str:
    name = str(dtype)
    if name == "bool":
        return "bool"
    if name in ("int64", "Int64"):
        return "int64"
    if name in ("string", "object"):
        return "string"
    return "double"


_DISCOVER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("cast_id", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("meta_json", T.StringType()),
        T.StructField("columns_json", T.StringType()),
        T.StructField("datacols_json", T.StringType()),
        T.StructField("coltypes_json", T.StringType()),
    ]
)

#: shape of the executor-cooked meta_json — everything CAST_META_SCHEMA
#: needs, already stringified/naive so the meta table is pure column
#: expressions over the discovery frame (no driver round-trip).
_META_JSON_TYPE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("time_iso", T.StringType()),
        T.StructField("reset_iso", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("header", T.StringType()),
        T.StructField("config", T.StringType()),
        T.StructField("serial", T.StringType()),
        T.StructField("units", T.ArrayType(T.StringType())),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _naive_iso(dt) -> str | None:
    """Wall-clock ISO string with the zone dropped (the reference keeps
    instrument-local times as-is)."""
    if dt is None:
        return None
    try:
        dt = dt.replace(tzinfo=None)
    except (TypeError, AttributeError):
        pass
    return dt.isoformat()


def _discover(spark: SparkSession, paths, fmt: str) -> DataFrame:
    """Pass 1: parse every file on executors; one small row per file with
    the fully-cooked meta (JSON) and the data column names/types.  Returns
    a DataFrame — nothing is materialized on the driver here."""
    parse = parsers.PARSERS[fmt]

    def fn(it):
        import pandas as pd

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                parsed = parse(row["path"], row["content"])
                meta = dict(parsed.meta)
                extra = {str(k): str(v) for k, v in (meta.get("extra") or {}).items()}
                for k in ("prkey", "source_path", "index_name"):
                    if meta.get(k) is not None:
                        extra[k] = str(meta[k])
                cooked = {
                    "name": meta.get("name"),
                    "time_iso": _naive_iso(meta.get("time")),
                    "reset_iso": _naive_iso(meta.get("time_of_reset")),
                    "lat": meta.get("lat"),
                    "lon": meta.get("lon"),
                    "header": meta.get("header"),
                    "config": meta.get("config"),
                    "serial": meta.get("serial"),
                    "units": meta.get("units"),
                    "extra": extra,
                }
                out.append(
                    {
                        "path": row["path"],
                        "cast_id": parsed.cast_id,
                        "n_rows": len(parsed.data),
                        "meta_json": json.dumps(cooked, default=str),
                        "columns_json": json.dumps(parsed.columns),
                        "datacols_json": json.dumps(list(parsed.data.columns)),
                        "coltypes_json": json.dumps(
                            {c: _dtype_tag(t) for c, t in parsed.data.dtypes.items()}
                        ),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in _DISCOVER_SCHEMA.fields])

    files = _scan_files(spark, paths).select("path", "content")
    return files.mapInPandas(fn, _DISCOVER_SCHEMA)


def _with_unique_ids(disc: DataFrame) -> DataFrame:
    """Duplicate file stems get a numeric suffix, first (by path) keeps the
    bare name — same rule as the reference's dict-of-casts keying, computed
    with a window instead of a driver loop."""
    w = Window.partitionBy("cast_id").orderBy("path")
    idx = F.row_number().over(w) - 1
    return disc.withColumn("__dup_idx", idx).withColumn(
        "final_cast_id",
        F.when(idx == 0, F.col("cast_id")).otherwise(
            F.concat_ws("_", F.col("cast_id"), idx.cast("string"))
        ),
    )


def _union_schema_distributed(disc: DataFrame) -> T.StructType:
    """Fleet-wide schema union as a distributed aggregate: explode each
    file's (position, column) pairs, reduce to one row per *distinct
    column* (first-seen position for ordering, the set of type tags for
    widening).  The driver receives only the union — bounded by schema
    width, never by file count."""
    pairs = disc.select(
        "path",
        F.from_json("coltypes_json", "map<string,string>").alias("__types"),
        F.posexplode(F.from_json("datacols_json", "array<string>")).alias("pos", "col"),
    ).select(
        "col",
        F.struct("path", "pos").alias("first_seen"),
        F.col("__types")[F.col("col")].alias("tag"),
    )
    rows = (
        pairs.groupBy("col")
        .agg(F.min("first_seen").alias("first_seen"), F.collect_set("tag").alias("tags"))
        .collect()
    )
    fields: list[T.StructField] = [T.StructField("cast_id", T.StringType(), False)]
    for r in sorted(rows, key=lambda r: (r["first_seen"]["path"], r["first_seen"]["pos"])):
        tags = set(r["tags"])
        if len(tags) == 1:
            tag = next(iter(tags))
            dt = _SPECIAL_TYPES.get(tag, T.StringType() if tag == "string" else T.DoubleType())
        elif "string" in tags:
            dt = T.StringType()
        else:
            dt = T.DoubleType()
        fields.append(T.StructField(r["col"], dt, True))
    return T.StructType(fields)


def _build_meta(disc: DataFrame) -> DataFrame:
    """cast_meta straight from the discovery frame — column expressions
    only, no createDataFrame round-trip through driver lists."""
    m = F.from_json("meta_json", _META_JSON_TYPE)
    return disc.select(
        F.col("final_cast_id").alias("cast_id"),
        m["name"].alias("name"),
        F.to_timestamp(m["time_iso"]).alias("time"),
        m["lat"].alias("lat"),
        m["lon"].alias("lon"),
        m["header"].alias("header"),
        m["config"].alias("config"),
        m["serial"].alias("serial"),
        F.to_timestamp(m["reset_iso"]).alias("time_of_reset"),
        F.from_json("columns_json", "map<string,string>").alias("columns"),
        m["units"].alias("units"),
        m["extra"].alias("extra"),
    )


def _read_with_schema(
    spark: SparkSession, paths, fmt: str, schema: T.StructType, dup_ids: dict[str, str]
) -> DataFrame:
    """Pass 2: full distributed parse aligned to the unioned schema.

    ``dup_ids`` maps *only* the duplicate-stem paths to their suffixed
    cast_ids — driver state bounded by the number of stem collisions, not
    by file count (a million unique files ships an empty dict)."""
    parse = parsers.PARSERS[fmt]
    colnames = [f.name for f in schema.fields]
    coltypes = {f.name: f.dataType.simpleString() for f in schema.fields}

    def fn(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            for _, row in pdf.iterrows():
                parsed = parse(row["path"], row["content"])
                data = parsed.data
                out = pd.DataFrame(index=data.index)
                out["cast_id"] = dup_ids.get(row["path"], parsed.cast_id)
                for c in colnames:
                    if c == "cast_id":
                        continue
                    if c in data.columns:
                        col = data[c]
                        if coltypes[c] == "double":
                            col = pd.to_numeric(col, errors="coerce").astype(float)
                        out[c] = col
                    else:
                        out[c] = (
                            np.nan if coltypes[c] == "double" else pd.Series([None] * len(data))
                        )
                yield out

    files = _scan_files(spark, paths).select("path", "content")
    return files.mapInPandas(fn, schema)


def _read_format(spark, paths, fmt) -> tuple[DataFrame, DataFrame]:
    disc = _with_unique_ids(_discover(spark, paths, fmt)).persist()
    # The only driver materializations are (a) the schema union — one row
    # per distinct column — and (b) the duplicate-stem renames — one row
    # per collision.  Both are bounded by data shape, not file count.
    schema = _union_schema_distributed(disc)
    if len(schema.fields) <= 1 and disc.isEmpty():
        msg = f"No files matched {paths!r}"
        raise ValueError(msg)
    dup_ids = {
        r["path"]: r["final_cast_id"]
        for r in disc.filter(F.col("__dup_idx") > 0).select("path", "final_cast_id").collect()
    }
    data = _read_with_schema(spark, paths, fmt, schema, dup_ids)
    meta = _build_meta(disc)
    return data, meta


# ---------------------------------------------------------------------------
# public readers
# ---------------------------------------------------------------------------

def from_cnv(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """Sea-Bird CNV -> (cast table, cast_meta).  Reference ``from_cnv``
    (ctd/read.py:406-493).  The cast table is wide:
    ``cast_id, scan, pressure, <channels...>``.

    ``depSM`` depth indexes are converted to pressure via the TEOS-10
    height->pressure relation exactly as the reference applies it
    (``gsw.p_from_z(index, lat)``, ctd/read.py:470-486) for casts whose
    metadata carries a latitude — a broadcast meta join + conditional
    column, no Python workers.
    """
    data, meta = _read_format(spark, paths, "cnv")
    conv = meta.select(
        "cast_id",
        F.col("lat").alias("__lat"),
        (F.col("extra")["prkey"] == "depSM").alias("__is_depth"),
    )
    data = (
        data.join(F.broadcast(conv), "cast_id", "left")
        .withColumn(
            "pressure",
            F.when(
                F.col("__is_depth") & F.col("__lat").isNotNull(),
                p_from_z_col(F.col("pressure"), F.col("__lat")),
            ).otherwise(F.col("pressure")),
        )
        .drop("__lat", "__is_depth")
    )
    return data, meta


def from_edf(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """Sippican XBT EDF -> (cast table indexed by depth, cast_meta).
    Reference ``from_edf`` (ctd/read.py:331-403)."""
    return _read_format(spark, paths, "edf")


def from_fsi(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """Falmouth FSI -> (cast table, cast_meta).  Reference ``from_fsi``
    (ctd/read.py:496-525)."""
    return _read_format(spark, paths, "fsi")


def from_bl(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """Sea-Bird bottle-trip log -> (trip table, cast_meta with
    time_of_reset).  Reference ``from_bl`` (ctd/read.py:222-248)."""
    return _read_format(spark, paths, "bl")


def from_castaway_csv(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """CastAway CSV -> (cast table, cast_meta with device metadata map).
    Reference ``from_castaway_csv`` (ctd/read.py:557-601)."""
    return _read_format(spark, paths, "castaway")


def from_btl(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """Sea-Bird BTL bottle summary -> (bottle-stats table, cast_meta).

    Reference ``from_btl`` (ctd/read.py:251-328).  The raw fixed-width rows
    arrive misaligned — per bottle there are len(rowtypes) stat rows, the
    date on row 0 and the time on row 1 — so the reshape is done with
    Spark windows (distributed, any number of files):

    - rowtype count  = countDistinct(Statistic) per cast;
    - bottle group   = (row_number - 1) div rowtypes;
    - Date           = first date + second-row time within the group;
    - Bottle         = first value within the group (the fwf ffill);
    - Statistic      = strip surrounding parens;
    - all channel columns -> double via try_cast.
    """
    raw, meta = _read_format(spark, paths, "btl")

    w_cast = Window.partitionBy("cast_id")
    w_ord = Window.partitionBy("cast_id").orderBy("line")
    raw = raw.withColumn(
        "__ntypes",
        F.size(F.collect_set("Statistic").over(w_cast)),
    ).withColumn("__rn", F.row_number().over(w_ord) - 1)
    raw = raw.withColumn("__grp", F.floor(F.col("__rn") / F.col("__ntypes")))

    w_grp = Window.partitionBy("cast_id", "__grp").orderBy("line")
    w_grp_all = w_grp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    date_part = F.first("Date").over(w_grp_all)
    time_part = F.first(
        F.when(F.col("__rn") % F.col("__ntypes") == 1, F.col("Date")), ignorenulls=True
    ).over(w_grp_all)
    stamp = F.to_timestamp(
        F.concat_ws(" ", date_part, time_part), "MMM d yyyy HH:mm:ss"
    )

    out = (
        raw.withColumn("Date", stamp)
        .withColumn(
            "Bottle",
            F.first("Bottle", ignorenulls=True).over(w_grp_all).cast("double").cast("int"),
        )
        .withColumn("Statistic", F.regexp_replace("Statistic", r"^\(|\)$", ""))
    )
    special = {"cast_id", "line", "Date", "Bottle", "Statistic", "__ntypes", "__rn", "__grp"}
    int_cols = {"Scan", "bpos"}
    for f_ in out.schema.fields:
        if f_.name in special:
            continue
        expr = f"try_cast(`{f_.name}` as double)"
        if f_.name in int_cols:
            expr = f"cast({expr} as int)"
        out = out.withColumn(f_.name, F.expr(expr))
    return out.drop("__ntypes", "__rn", "__grp"), meta


def rosette_summary(spark: SparkSession, paths) -> tuple[DataFrame, DataFrame]:
    """ROS bottle-log -> bottle-keyed scan table.  Reference
    ``rosette_summary`` (ctd/read.py:528-554): the CNV parse plus an
    explicit ``pressure`` data column and integer ``nbf`` (bottles fired).
    The documented per-bottle averaging is ``bottle_means``."""
    data, meta = from_cnv(spark, paths)
    if "nbf" not in data.columns:
        msg = "ROS file has no 'nbf' (bottles fired) channel"
        raise ValueError(msg)
    data = data.withColumn("nbf", F.col("nbf").cast("long"))
    return data, meta


def bottle_means(ros: DataFrame, cols=None) -> DataFrame:
    """Per-bottle scan averages — ``ros.groupby(ros.index).mean()`` from
    the reference doctest (ctd/read.py:543-545) as a hash aggregate."""
    num_cols = cols or [
        f.name
        for f in ros.schema.fields
        if f.name not in ("cast_id", "nbf", "scan")
        and f.dataType.typeName() in ("double", "float", "long", "integer")
    ]
    return ros.groupBy("cast_id", "nbf").agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in num_cols]
    )
