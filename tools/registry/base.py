"""Shared registry plumbing: table loaders, decimal aggregates,
the event-source normalizer.

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9 phase 2)."""

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: Scan-parallelism repair (optimization guide §2.5 "input skew: one huge
#: unsplittable file ... otherwise repartition immediately after the
#: read", §6 "minPartitionNum sets a floor on scan parallelism"): the
#: sf-series parquet files are written as a SINGLE row group each, and a
#: parquet row group is indivisible — Spark assigns it to the one split
#: holding its midpoint, so `events` (100k rows) and `documents` (5k
#: long texts) scan as ONE task no matter how the file-split knobs are
#: set (measured: every map-heavy row in the suite ran on 1 of 32
#: cores; pii_redact_full spent 5.4s single-threaded).  The repair is a
#: hash repartition straight after the scan — keyed, not round-robin,
#: so there is no sort-before-repartition pass and no retry hazard
#: (guide §2.5), and keyed on each table's DOMINANT downstream
#: partitioning so the inserted exchange is one the plan was going to
#: pay anyway (events -> user_id: the CTD window family partitions by
#: cast; lineitem/orders -> orderkey: the TPC-H join key), letting
#: EnsureRequirements reuse it instead of adding a second shuffle.
#:
#: Scale-adaptive by construction, not a local[32] constant: the
#: repartition fires ONLY when the planner's own estimate of scan
#: splits (file bytes / maxPartitionBytes) is below the session's
#: defaultParallelism AND the table is big enough for single-task map
#: work to matter.  At fleet scale every table has orders of magnitude
#: more row groups than cores, the condition is false, and the plan is
#: byte-identical to the pre-repair one (no exchange inserted).
_SCAN_REPARTITION_KEY = {
    "events": ["user_id"],
    "documents": ["doc_id"],
}
_SCAN_REPARTITION_MIN_BYTES = 256 << 10


def _scan_splits_estimate(spark: SparkSession, df: DataFrame) -> tuple[int, int]:
    """(estimated scan tasks, total bytes) from file metadata alone —
    mirrors FilePartition packing: a file yields ~ceil(size/maxPB)
    splits.  Local files only; anything else returns a huge estimate so
    the repartition never fires on storage we cannot stat."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        max_pb = int(
            "".join(
                ch
                for ch in str(
                    spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
                )
                if ch.isdigit()
            )
            or "134217728"
        )
        splits = 0
        total = 0
        for f in df.inputFiles():
            parsed = urlparse(f)
            if parsed.scheme not in ("", "file"):
                return (1 << 30, 1 << 50)
            size = os.path.getsize(unquote(parsed.path))
            total += size
            splits += max(1, -(-size // max_pb))
        return (splits, total)
    except Exception:
        return (1 << 30, 1 << 50)


def _t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parallel: bool = True,
    keys: list[str] | None = None,
) -> DataFrame:
    """``parallel=False`` opts a caller out of the adaptive scan
    repartition: right for queries whose first post-scan operator is a
    cheap aggregation/hash (the shuffled text bytes cost more than the
    map parallelism buys — measured per-row, see OPTIMIZATION_r14.md);
    the default serves the map-heavy majority.

    ``keys=[...]`` opts a caller IN for a table with no default key —
    same scale-adaptive condition (fires only when the planner's split
    estimate is below defaultParallelism, a no-op at fleet scale).
    Used by the aggregation-heavy TPC-H rows whose map-side partial
    aggregate / probe work otherwise runs on lineitem's 3 row-group
    splits: keying lineitem FAMILY-WIDE measured net-negative
    (interleaved A/B, min-of-3: 19.0s -> 22.4s over the 24 relational
    rows — the broadcast-join spine pays the exchange for nothing),
    but q1/q18/q21/region_revenue each win 0.3-0.6s (the exchange
    feeds their own aggregate or join key), so the opt-in is per-row."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if keys is None:
        keys = _SCAN_REPARTITION_KEY.get(name)
    if keys is None or not parallel:
        return df
    par = spark.sparkContext.defaultParallelism
    splits, total = _scan_splits_estimate(spark, df)
    if splits >= par or total < _SCAN_REPARTITION_MIN_BYTES:
        return df
    return df.repartition(par, *[F.col(k) for k in keys])

def dsum(c) -> F.Column:
    """Order-independent (exact) sum of a double expression."""
    c = c if isinstance(c, F.Column) else F.col(c)
    return F.sum(c.cast("decimal(25,6)")).cast("double")

def davg(c) -> F.Column:
    """avg via exact decimal sum / count (matches the SQL twin exactly)."""
    c = c if isinstance(c, F.Column) else F.col(c)
    return F.sum(c.cast("decimal(25,6)")).cast("double") / F.count(c)

#: cast-shaped view of the events table: user_id = cast, (ts_us, event_id)
#: = deterministic scan order, value = the physical channel.  events.parquet
#: may carry TIMESTAMP(NANOS) — read as a nanosecond long (nanosAsLong) and
#: truncated to micros, exactly DuckDB's behavior — or timestamp[us], which
#: Spark reads as TIMESTAMP_NTZ and _ev converts to naive epoch micros via a
#: UTC-pinned cast; either way both engines order and diff identical integers.
_EV_KW = {"by": "user_id", "order": ["ts_us", "event_id"], "pressure": "value"}

def _ev(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the timestamp[us] branch below casts TIMESTAMP_NTZ -> TIMESTAMP, which
    # reads the naive value in the *session* timezone; entry()/queries()
    # accept externally built sessions, so pin it rather than assume
    # session.get_spark was the builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") == "bigint":
        # nanosecond-long parquet timestamps: truncate to micros
        return ev.withColumn("ts_us", F.expr("ts div 1000"))
    # timestamp[us] parquet: naive micros since epoch, matching DuckDB's
    # epoch_us(ts) (session timezone is pinned to UTC in session._DEFAULTS)
    return ev.withColumn("ts_us", F.expr("unix_micros(cast(ts as timestamp))"))

def _with_gap(ev):
    """NULL-injected channel: clicks lose their value (deterministic)."""
    return ev.withColumn(
        "v",
        F.when(F.col("event_type") == "click", F.lit(None).cast("double")).otherwise(
            F.col("value").cast("double")
        ),
    )


def _warc_fixture_dir(sf_dir):
    """Build (once per corpus, cached in /tmp by content key) the
    deterministic WARC shards behind the ``warc_documents`` row: four
    per-record-gzip archives holding one HTTP response per document.
    The per-doc branch chain (FIRST match wins — the oracle's SQL CASE
    mirrors it in the same order, _WARC_DOCUMENTS_SQL):

    - ``doc_id % 3 == 1`` (latin-1-encodable text only — ADVICE r12: a
      regenerated corpus with CJK/emoji text must fall through, not
      crash the encode): latin-1 body with accents, DECLARED
      ISO-8859-1 in the HTTP header (header-charset decode path);
    - ``doc_id % 7 == 3``: XHTML page served as
      ``application/xhtml+xml`` (the non-``text/*`` acceptance path —
      before r13 these pages silently vanished);
    - ``doc_id % 5 == 2`` (ASCII text only): GBK body whose HTTP header
      says bare ``text/html`` — only ``<meta charset="gbk"/>`` inside
      the page names the encoding (the HTML5-prescan sniff path);
    - ``doc_id % 5 == 4`` (latin-1-encodable text only): ISO-8859-1
      body, bare ``text/html`` header, charset named by the
      ``http-equiv`` pragma form of the meta tag;
    - otherwise utf-8 declared in the header.

    Every ``doc_id % 11 == 7`` doc is served as a 404 (the status
    filter) regardless of branch.  Construction is pyarrow-side
    (fixture building, not dataflow); the engine under test starts at
    read_warc's binaryFile scan."""
    import hashlib
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq_

    from python_ctd_spark.io.warc import build_warc, make_response_record

    tbl = pq_.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    # content-keyed, not length-keyed: a regenerated corpus with
    # same-length different text must MISS this cache (a stale hit
    # would drift the fixture shards away from the oracle's documents
    # table); the layout-version token ("v2": r13 crawl-head branches)
    # busts the cache when the BUILDER changes against the same corpus
    key = hashlib.md5(
        ("v2" + repr([
            (d, hashlib.md5((t or "").encode()).hexdigest()) for d, t in rows
        ])).encode()
    ).hexdigest()[:12]
    dest = os.path.join(tempfile.gettempdir(), f"warc_fixture_{key}")
    if os.path.isdir(dest):
        return dest

    def latin1_ok(s: str) -> bool:
        return all(ord(c) <= 0xFF for c in s)

    shards: list[list[bytes]] = [[] for _ in range(4)]
    for i, (d, t) in enumerate(rows):
        body = t or ""
        if d % 3 == 1 and latin1_ok(body):
            body += " café crème"
            enc, ct = "latin-1", "text/plain; charset=ISO-8859-1"
        elif d % 7 == 3:
            body = ('<html xmlns="http://www.w3.org/1999/xhtml"><body>'
                    + body + "</body></html>")
            enc, ct = "utf-8", "application/xhtml+xml; charset=utf-8"
        elif d % 5 == 2 and body.isascii():
            body = '<meta charset="gbk"/><p>' + body + " 你好世界</p>"
            enc, ct = "gbk", "text/html"
        elif d % 5 == 4 and latin1_ok(body):
            body = ('<meta http-equiv="Content-Type" content="text/html;'
                    ' charset=ISO-8859-1"/>' + body + " voilà")
            enc, ct = "latin-1", "text/html"
        else:
            enc, ct = "utf-8", "text/plain; charset=utf-8"
        shards[i % 4].append(
            make_response_record(
                f"https://site{d % 7}.example.org/w/{d}",
                body.encode(enc),
                f"w-{d}",
                http_content_type=ct,
                status=404 if d % 11 == 7 else 200,
            )
        )
    tmp = tempfile.mkdtemp()
    for s, recs in enumerate(shards):
        with open(os.path.join(tmp, f"s{s}.warc.gz"), "wb") as f:
            f.write(build_warc(recs, gz=True))
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent build won
    return dest
