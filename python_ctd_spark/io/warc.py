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
Content-Length, truncated block, a shard cut mid-gzip-member) becomes
a quarantine ROW (``warc_type='invalid'``, ``error`` set) rather than
an exception — failing a 10^11-record crawl on one mangled record is
not an option, and silently dropping is worse.  Records BEFORE the
corruption point still parse: a half-uploaded shard salvages its good
prefix plus one quarantine row for the tail.

Memory contract: ``binaryFile`` ships each shard as ONE row, so a
shard must fit Spark's 2 GB per-value ceiling COMPRESSED (Common
Crawl's ~1 GB gz shards do).  Decompression is STREAMED — gzip
members are parsed record-by-record through :class:`gzip.GzipFile`,
never materialized whole, so per-task peak memory is the compressed
bytes + one record + one output Arrow batch (``_BATCH_ROWS`` rows),
NOT the multi-GB decompressed shard.

``build_warc`` / ``make_response_record`` write the same framing
(round-trip-tested), so fixtures and any archival sink share one
implementation with the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: output schema of :func:`read_warc` — one row per WARC record.
#: ``payload`` is the raw body bytes; ``payload_text`` is the body
#: DECODED BY ITS DECLARED CHARSET (the ``charset=`` parameter of the
#: HTTP Content-Type; <meta charset> prescan when the header has none;
#: utf-8-with-replacement fallback) for textual responses (``text/*``
#: + the XML family), NULL otherwise — crawl charsets are a data
#: property, not
#: a reader option, so the decode happens executor-side at parse time
#: (same discipline as the instrument readers' cp1252 sniff,
#: parsers.py).
WARC_FIELDS = (
    "path string, record_idx int, warc_type string, record_id string,"
    " target_uri string, warc_date string, http_status int,"
    " content_type string, payload binary, payload_text string,"
    " n_bytes long, error string"
)

_CRLF = b"\r\n"

#: output Arrow batch bounds from the parser — whichever trips first.
#: Rows alone is not enough: 4096 rows of 64 KB payloads is a 256 MB
#: batch, so payload BYTES cap the flush for fat records
_BATCH_ROWS = 4096
_BATCH_BYTES = 32 << 20

_CHARSET_RE = None  # compiled lazily executor-side
_META_CHARSET_RE = None  # compiled lazily executor-side

#: non-``text/*`` media types that still carry page text — the crawl
#: head must accept them or every XHTML-served page (a large, standards
#: -compliant slice of the web) silently vanishes from the corpus.
#: Matching is on the BASE type (parameters stripped): the named types
#: plus any ``*+xml`` structured-syntax suffix (RFC 7303 §4.2 /
#: RFC 6839 — ``application/xhtml+xml``, ``image/svg+xml``, ...).
TEXTUAL_NON_TEXT_TYPES = ("application/xhtml+xml", "application/xml",
                          "application/json")

#: how far into the payload the <meta charset> sniff looks when the
#: HTTP header declares no charset — the HTML5 prescan bound (the
#: spec's own algorithm stops at 1024 bytes), and ASCII-safe to scan
#: raw because every charset the sniff can name is ASCII-compatible
#: in the region where the <meta> tag itself is legal (inside <head>)
_META_SNIFF_BYTES = 1024


def _base_type(content_type: str | None) -> str | None:
    """``text/html; charset=utf-8`` -> ``text/html`` (lowered)."""
    if not content_type:
        return None
    return content_type.split(";", 1)[0].strip().lower()


def _is_textual_type(content_type: str | None) -> bool:
    """True when the payload is page text: ``text/*`` plus the XML
    family (:data:`TEXTUAL_NON_TEXT_TYPES` and any ``+xml`` suffix)."""
    base = _base_type(content_type)
    if not base:
        return False
    return (base.startswith("text/") or base in TEXTUAL_NON_TEXT_TYPES
            or base.endswith("+xml"))


def _decode_declared(block: bytes, content_type: str | None) -> str | None:
    """Decode a textual payload (``text/*`` or the XML family) by its
    declared ``charset=`` parameter, always with replacement — a crawl
    page lying about its encoding yields mojibake characters, never a
    dead task.  Non-text payloads return None (images stay bytes).

    When the HTTP header declares NO charset, the prescan applies, in
    priority order: (1) a Unicode BOM (UTF-8/16/32 — the meta regex
    can never match NUL-interleaved UTF-16 bytes, so the BOM must win
    first); (2) the HTML5-style scan of the first
    :data:`_META_SNIFF_BYTES` bytes for ``<meta charset=...>`` /
    ``<meta http-equiv="Content-Type" content="...; charset=...">``
    or — the XML-family twin, since this reader accepts
    ``application/xhtml+xml`` — the ``<?xml ... encoding=...?>``
    declaration.  Real crawls are full of servers that send a bare
    ``text/html`` while the page itself declares GBK or ISO-8859-1;
    header-only decode turns those pages into mojibake (same
    executor-side sniff discipline as the instrument readers' cp1252
    fallback, parsers.py)."""
    global _CHARSET_RE, _META_CHARSET_RE
    if not _is_textual_type(content_type):
        return None
    if _CHARSET_RE is None:
        import re

        _CHARSET_RE = re.compile(r"charset=[\"']?([\w.:-]+)", re.I)
        # the byte-level prescan form: attribute charset= inside a
        # <meta ...> tag (covers BOTH <meta charset="..."> and the
        # http-equiv pragma, whose content="...; charset=..." value
        # contains the same charset= token) OR encoding= inside an
        # <?xml ...?> declaration
        _META_CHARSET_RE = re.compile(
            rb"(?:<meta[^>]{0,512}?charset|<\?xml[^>]{0,512}?encoding)"
            rb"\s*=\s*[\"']?([\w.:-]+)",
            re.I,
        )
    m = _CHARSET_RE.search(content_type)
    if not m:
        head = block[:4]
        if head[:3] == b"\xef\xbb\xbf":
            m = _CHARSET_RE.search("charset=utf-8-sig")
        elif head in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
            m = _CHARSET_RE.search("charset=utf-32")
        elif head[:2] in (b"\xff\xfe", b"\xfe\xff"):
            m = _CHARSET_RE.search("charset=utf-16")
    if not m:
        bm = _META_CHARSET_RE.search(block[:_META_SNIFF_BYTES])
        if bm:
            try:
                m_name = bm.group(1).decode("ascii")
            except UnicodeDecodeError:
                m_name = None
            m = m_name and _CHARSET_RE.search(f"charset={m_name}")
    if m:
        import codecs

        try:
            codec = codecs.lookup(m.group(1)).name
        except LookupError:
            codec = "utf-8"  # unknown declared charset: best effort
    else:
        codec = "utf-8"
    try:
        return block.decode(codec, errors="replace")
    except (LookupError, UnicodeError, TypeError):
        # a page can DECLARE a registered NON-TEXT codec (charset=base64
        # / hex / zlib / rot13 ...) — codecs.lookup accepts it but
        # bytes.decode then raises.  Adversarial/garbage declarations
        # must yield mojibake, never a dead task.
        return block.decode("utf-8", errors="replace")


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


#: readline bound — a "header line" longer than this is lost framing,
#: not a header (keeps a malformed binary blob from buffering whole)
_MAX_LINE = 65536


def _iter_warc_records(data: bytes, path: str):
    """Yield record tuples matching :data:`WARC_FIELDS` from one
    (possibly multi-member-gzip) archive, STREAMING: gzip members are
    inflated through :class:`gzip.GzipFile` as the parser consumes
    them, so only the current record's bytes are ever materialized —
    a several-GB decompressed shard never exists in memory.

    Corruption anywhere (bad framing, short block, a shard cut
    mid-gzip-member) ends the iteration with ONE quarantine row; every
    record parsed before that point has already been yielded (salvage
    the good prefix — losing a whole shard to its last byte is the
    all-or-nothing failure this reader exists to avoid)."""
    import gzip
    import io

    raw = io.BytesIO(data)
    fobj = gzip.GzipFile(fileobj=raw) if data[:2] == b"\x1f\x8b" else raw
    idx = 0
    pos = 0  # decompressed-stream offset, for quarantine messages

    def bad(msg: str, at: int) -> tuple:
        return (path, idx, "invalid", None, None, None, None, None,
                None, None, None, f"{msg} at byte {at}")

    while True:
        # skip inter-record CRLF padding
        try:
            line = fobj.readline(_MAX_LINE)
            while line == _CRLF:
                pos += 2
                line = fobj.readline(_MAX_LINE)
        except (EOFError, OSError) as exc:
            # cut mid-gzip-member: quarantine the tail, keep the prefix
            yield bad(f"gzip: {exc}", pos)
            return
        if not line:
            return  # clean end of archive
        rec_start = pos
        if not line.startswith(b"WARC/"):
            yield bad("expected WARC/ version line", rec_start)
            return  # framing lost — no way to resynchronize safely
        pos += len(line)
        headers: dict[str, str] = {}
        while True:
            try:
                hline = fobj.readline(_MAX_LINE)
            except (EOFError, OSError) as exc:
                yield bad(f"gzip: {exc}", rec_start)
                return
            if hline == _CRLF:
                pos += 2
                break  # end of headers
            if not hline or not hline.endswith(b"\n"):
                # EOF (or an unbounded line) inside the header region
                yield bad("unterminated record headers", rec_start)
                return
            pos += len(hline)
            k, sep, v = hline.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield bad("missing/invalid Content-Length", rec_start)
            return
        block_start = pos
        try:
            block = fobj.read(length)
        except (EOFError, OSError) as exc:
            yield bad(f"gzip: {exc}", block_start)
            return
        if len(block) < length:
            yield bad("truncated block", block_start)
            return
        pos += length
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
                    k, sep, v = line.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        ctype = v.strip().decode("latin-1")
                payload = block[http_end + 4 :]
        rid = headers.get("warc-record-id")
        yield (
            path,
            idx,
            wtype,
            rid.strip("<>") if rid else None,
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            status,
            ctype,
            payload,
            _decode_declared(payload, ctype) if wtype == "response" else None,
            len(payload),
            None,
        )
        idx += 1


def _map_warc_batches(batches):
    """Arrow batch mapper shared by the batch and streaming readers —
    one parse implementation, two trigger modes.  Emits bounded
    chunks (:data:`_BATCH_ROWS` rows / :data:`_BATCH_BYTES` payload
    bytes, whichever first) so neither a record-dense nor a
    fat-record shard ever builds one giant output batch."""
    import pandas as pd

    cols = [f.split()[0] for f in WARC_FIELDS.split(",")]
    rows: list[tuple] = []
    nbytes = 0
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            for row in _iter_warc_records(bytes(content), p):
                rows.append(row)
                nbytes += (row[10] or 0) * 2  # payload + decoded text
                if len(rows) >= _BATCH_ROWS or nbytes >= _BATCH_BYTES:
                    yield pd.DataFrame(rows, columns=cols)
                    rows, nbytes = [], 0
    if rows:
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
    """Project successful TEXTUAL responses — ``text/*`` plus the XML
    family (``application/xhtml+xml`` and friends, any ``+xml``
    suffix: the same acceptance set as the parse-time decode,
    :func:`_is_textual_type`) — onto the canonical
    ``documents`` shape: ``doc_id`` is the md5-derived 60-bit int
    (``operators.dedup._md5_long`` — THE engine-portable hash key) of
    the record id, falling back to target URI + date, then to
    path + record index, so the id is deterministic and never NULL even
    on header-poor records (each fallback uses ``F.concat``, NULL
    unless EVERY component is present — ``concat_ws`` skips NULLs and
    returns ``''``, which both made the last fallback unreachable and
    collided a missing-date record's key with the bare URI);
    ``text`` the body decoded by its DECLARED ``charset=``
    (``payload_text``, computed at parse time — a latin-1 or GBK page
    arrives with its non-ASCII text intact), falling back to UTF-8
    with invalid sequences REPLACED (crawl charsets are dirty —
    ``F.decode`` would kill the job on the first mis-declared page,
    the exact failure the module contract forbids); ``source`` the
    normalized registrable
    host of the target URI (:func:`..operators.markup.normalized_domain`
    — the one key space domain filters and link analytics share).  Feed
    the result to ``Corpus(...).strip_markup()`` — the ingestion head of
    the crawl pipeline.  All map-side column expressions; no shuffle."""
    from python_ctd_spark.operators.dedup import _md5_long
    from python_ctd_spark.operators.markup import normalized_domain

    base_type = F.lower(F.trim(F.split_part(
        F.col("content_type"), F.lit(";"), F.lit(1))))
    texty = (
        base_type.startswith("text/")
        | base_type.isin(*TEXTUAL_NON_TEXT_TYPES)
        | base_type.endswith("+xml")
    )
    ok = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & texty
    )
    doc_id = _md5_long(
        F.coalesce(
            F.nullif(F.col("record_id"), F.lit("")),
            F.concat(F.col("target_uri"), F.lit("|"), F.col("warc_date")),
            F.concat(F.col("path"), F.lit("|"),
                     F.col("record_idx").cast("string")),
        )
    )
    domain = normalized_domain(F.col("target_uri"))
    text = F.coalesce(
        F.col("payload_text"),
        F.make_valid_utf8(F.col("payload").cast("string")),
    )
    return ok.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
        domain.alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    )
