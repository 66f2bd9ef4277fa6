"""WARC (Web ARChive) source — the format web crawls actually arrive
in (ISO 28500; Common-Crawl-style `.warc` / `.warc.gz` shards).

Same architecture as the instrument readers (SURVEY.md §4.3): a
``binaryFile`` scan ships each archive's bytes to an executor, and an
Arrow ``mapInPandas`` pass parses records there — one input partition
per shard, no driver-side I/O, linear scale-out over shards.  Parsing
is pure stdlib (the framing is Content-Length-delimited headers +
block), mirroring the repo's no-extra-deps codec policy (png/gif/wav).

The corrupt-records discipline of :mod:`.corpus_sources` applies at
record granularity: a malformed record (bad framing, missing
Content-Length, truncated block) becomes a quarantine ROW
(``warc_type='invalid'``, ``error`` set) rather than an exception —
failing a 10^11-record crawl on one mangled record is not an option,
and silently dropping is worse.

``build_warc`` / ``make_response_record`` write the same framing
(round-trip-tested), so fixtures and any archival sink share one
implementation with the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: output schema of :func:`read_warc` — one row per WARC record
WARC_FIELDS = (
    "path string, record_idx int, warc_type string, record_id string,"
    " target_uri string, warc_date string, http_status int,"
    " content_type string, payload binary, n_bytes long, error string"
)

_CRLF = b"\r\n"


def make_record(
    warc_type: str,
    block: bytes,
    record_id: str,
    content_type: str = "application/octet-stream",
    **headers: str,
) -> bytes:
    """One framed WARC record; extra ``headers`` become WARC headers
    (underscores map to dashes: ``WARC_Target_URI=...``)."""
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{record_id}>",
        f"Content-Type: {content_type}",
    ]
    lines += [f"{k.replace('_', '-')}: {v}" for k, v in headers.items()]
    lines.append(f"Content-Length: {len(block)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("ascii")
    return head + block + _CRLF + _CRLF


def make_response_record(
    uri: str,
    body: bytes,
    record_id: str,
    date: str = "2024-01-01T00:00:00Z",
    http_content_type: str = "text/html; charset=utf-8",
    status: int = 200,
) -> bytes:
    """One WARC ``response`` record wrapping an HTTP/1.1 response."""
    phrase = {
        200: "OK", 301: "Moved Permanently", 404: "Not Found",
        403: "Forbidden", 500: "Internal Server Error",
    }.get(status, "Status")
    http = (
        f"HTTP/1.1 {status} {phrase}\r\n"
        f"Content-Type: {http_content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    return make_record(
        "response",
        http,
        record_id,
        content_type="application/http; msgtype=response",
        WARC_Date=date,
        WARC_Target_URI=uri,
    )


def build_warc(records: list[bytes], gz: bool = False) -> bytes:
    """Concatenate framed records into one archive; ``gz=True`` wraps
    EACH record in its own gzip member (the Common Crawl layout — a
    reader can then seek to a member; ``gzip.decompress`` handles the
    concatenation transparently)."""
    if not gz:
        return b"".join(records)
    import gzip

    return b"".join(gzip.compress(r) for r in records)


def _parse_warc_bytes(data: bytes, path: str) -> list[tuple]:
    """Parse one (possibly multi-member-gzip) archive into record
    tuples matching :data:`WARC_FIELDS`."""
    import gzip

    rows: list[tuple] = []
    idx = 0

    def bad(msg: str, at: int) -> tuple:
        return (path, idx, "invalid", None, None, None, None, None, None, None, f"{msg} at byte {at}")

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # loops over concatenated members
        except (EOFError, OSError) as exc:
            # a shard cut mid-member must be a quarantine ROW, same as
            # an uncompressed truncation — never a task-killing raise
            rows.append(bad(f"gzip: {exc}", 0))
            return rows
    pos, n = 0, len(data)

    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            rows.append(bad("expected WARC/ version line", pos))
            break  # framing lost — no way to resynchronize safely
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            rows.append(bad("unterminated record headers", pos))
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            rows.append(bad("missing/invalid Content-Length", pos))
            break
        block_start = hdr_end + 4
        block = data[block_start : block_start + length]
        if len(block) < length:
            rows.append(bad("truncated block", block_start))
            break
        wtype = headers.get("warc-type", "unknown")
        status = None
        ctype = headers.get("content-type")
        payload = block
        if wtype == "response" and block[:5] == b"HTTP/":
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                head_lines = block[:http_end].split(_CRLF)
                parts = head_lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in head_lines[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("latin-1")
                payload = block[http_end + 4 :]
        rid = headers.get("warc-record-id")
        rows.append(
            (
                path,
                idx,
                wtype,
                rid.strip("<>") if rid else None,
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                status,
                ctype,
                payload,
                len(payload),
                None,
            )
        )
        idx += 1
        pos = block_start + length
    return rows


def _map_warc_batches(batches):
    """Arrow batch mapper shared by the batch and streaming readers —
    one parse implementation, two trigger modes."""
    import pandas as pd

    cols = [f.split()[0] for f in WARC_FIELDS.split(",")]
    for pdf in batches:
        rows: list[tuple] = []
        for p, content in zip(pdf["path"], pdf["content"]):
            rows.extend(_parse_warc_bytes(bytes(content), p))
        yield pd.DataFrame(rows, columns=cols)


def read_warc(spark: SparkSession, paths) -> DataFrame:
    """Read `.warc` / `.warc.gz` shards: one row per record.

    Filter ``warc_type == 'response'`` for page payloads (HTTP headers
    are already split off — ``http_status``/``content_type`` are
    columns, ``payload`` is the body bytes); ``warc_type == 'invalid'``
    rows are the quarantine stream (``error`` says why, ``path`` +
    ``record_idx`` say where).
    """
    from .readers import _scan_files

    files = _scan_files(spark, paths).select("path", "content")
    return files.mapInPandas(_map_warc_batches, WARC_FIELDS)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING twin of :func:`read_warc`: a ``binaryFile`` file
    stream over a growing shard directory — each arriving `.warc` /
    `.warc.gz` shard becomes one micro-batch unit, parsed by the SAME
    Arrow pass as the batch reader (record rows, HTTP split, quarantine
    rows), so a drained stream equals the batch read row-for-row.

    This is the live-crawl ingestion shape: stateless (no watermark, no
    state store — parsing is per-shard), so it composes with the other
    stateless ingest stages (``streaming_markup``'s extraction,
    classifier scoring) at any arrival rate.  Downstream,
    :func:`warc_responses_to_documents` applies unchanged — it is pure
    column expressions."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .load(path)
        .select("path", "content")
    )

    return files.mapInPandas(_map_warc_batches, WARC_FIELDS)


def warc_responses_to_documents(records: DataFrame) -> DataFrame:
    """Project successful text/html responses onto the canonical
    ``documents`` shape: ``doc_id`` is the md5-derived 60-bit int
    (``operators.dedup._md5_long`` — THE engine-portable hash key) of
    the record id, falling back to target URI + date, then to
    path + record index, so the id is deterministic and never NULL even
    on header-poor records; ``text`` the body as UTF-8 with invalid
    byte sequences REPLACED (crawl charsets are dirty — ``F.decode``
    would kill the job on the first latin-1 page, the exact failure the
    module contract forbids); ``source`` the normalized registrable
    host of the target URI (:func:`..operators.markup.normalized_domain`
    — the one key space domain filters and link analytics share).  Feed
    the result to ``Corpus(...).strip_markup()`` — the ingestion head of
    the crawl pipeline.  All map-side column expressions; no shuffle."""
    from python_ctd_spark.operators.dedup import _md5_long
    from python_ctd_spark.operators.markup import normalized_domain

    ok = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/")
    )
    doc_id = _md5_long(
        F.coalesce(
            F.col("record_id"),
            F.concat_ws("|", "target_uri", "warc_date"),
            F.concat_ws("|", "path", "record_idx"),
        )
    )
    domain = normalized_domain(F.col("target_uri"))
    text = F.make_valid_utf8(F.col("payload").cast("string"))
    return ok.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        domain.alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )
