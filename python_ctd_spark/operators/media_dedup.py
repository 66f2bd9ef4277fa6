"""Media deduplication: perceptual-hash near-dup detection for image
blobs — the multimodal twin of the text dedup family.

Pipeline shape (the one that survives 100 TB of images):

1. :func:`image_ahash` — decode + hash is a pure map-side pass
   (``mapInPandas`` over Arrow batches, real PNG and baseline-JPEG
   decode via the repo's stdlib codecs, dispatched on magic bytes);
   the corpus of blobs is read once and never shuffled.
2. :func:`ahash_pairs` — near-dup candidates come from the SAME banded
   Hamming equi-join as text SimHash
   (:func:`.dedup.banded_hamming_pairs` — one implementation, two
   modalities): lossless by pigeonhole for ``max_hamming < bands``,
   and only the tiny ``(id, hash)`` fingerprint table enters the join,
   never pixels.

Exact-duplicate grouping is the degenerate case: ``groupBy("ahash")``
on the fingerprint table (or feed ``hamming = 0`` pairs to
``dedup.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import banded_hamming_pairs


def _to_gray(px):
    """Flatten a decoded raster to 2-D grayscale: color channels are
    averaged (luma), the ALPHA channel is dropped — transparency is not
    brightness, and two visually identical images that differ only in
    alpha must hash identically (decode_png color layouts: (H,W,1)
    gray, (H,W,2) gray+alpha, (H,W,3) RGB, (H,W,4) RGBA)."""
    import numpy as np

    if px.ndim == 2:
        return px
    c = px.shape[2]
    if c == 1:
        return px[:, :, 0]
    if c == 2:  # gray + alpha
        return px[:, :, 0]
    return px[:, :, :3].astype(np.float64).mean(axis=2)  # RGB / RGBA


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    hash_size: int = 8,
    strict: bool = True,
) -> DataFrame:
    """Decode each image blob (real stdlib decoders — PNG via
    :mod:`..functions.png_numpy`, JPEG — baseline, multi-scan or
    progressive — via :mod:`..functions.jpeg_numpy`, dispatched on
    magic bytes) and emit its 64-bit average-hash:
    ``(id, ahash, height, width, error)``.

    Arrow-batched ``mapInPandas``; no shuffle — the blob column never
    leaves the scan stage's partitions, and downstream joins see only
    the ~16-byte fingerprint rows.  Color inputs are luma-averaged and
    the alpha channel is DROPPED before pooling (:func:`_to_gray`).

    Error contract (VERDICT r12 item 3): with ``strict=True`` (the
    default — unchanged behavior) a malformed blob raises, because
    dedup must not silently skip corpus rows.  With ``strict=False``
    an undecodable blob becomes a QUARANTINE ROW — ``error`` set,
    hash/dims NULL — mirroring the WARC reader's record-granular
    quarantine: on a real archive, one arithmetic-coded JPEG must not
    kill a 100 TB job, and silently dropping it is worse.  Filter
    ``error IS NULL`` before :func:`ahash_pairs` (which also guards
    itself) and audit the complement.
    """

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.bmp_numpy import (
            decode_bmp, decode_ico,
        )
        from python_ctd_spark.functions.image_hash import ahash64
        from python_ctd_spark.functions.jpeg_numpy import decode_jpeg
        from python_ctd_spark.functions.png_numpy import decode_png

        for pdf in batches:
            ids, hashes, hs, ws, errs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                try:
                    px = (decode_jpeg(b) if b[:2] == b"\xff\xd8"
                          else decode_bmp(b) if b[:2] == b"BM"
                          else decode_ico(b)
                          if b[:4] == b"\x00\x00\x01\x00"
                          else decode_png(b))
                    h64 = ahash64(_to_gray(px), hash_size)
                except ValueError as exc:
                    if strict:
                        raise
                    ids.append(i)
                    hashes.append(None)
                    hs.append(None)
                    ws.append(None)
                    errs.append(str(exc))
                    continue
                ids.append(i)
                hashes.append(h64)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                errs.append(None)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="Int64"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn, "id long, ahash long, height int, width int, error string"
    )


def _synthesize_blobs(df: DataFrame, id_col: str, load_maker) -> DataFrame:
    """Shared scaffold for the fixture blob synthesizers:
    ``load_maker`` is a zero-arg callable, invoked EXECUTOR-side, that
    returns ``id -> blob bytes``.

    The id table typically arrives as ONE parquet split; without a
    spread, a single Python worker would synthesize+decode every blob
    serially.  Repartitioning 8-byte ids is a ~KB shuffle that buys
    full-cluster decode parallelism — blobs themselves still never
    shuffle (they are BORN in the scan stage's successor partitions).
    The partition count is explicit: a column-only repartition is an
    AQE coalesce target, and the id shuffle is tiny, so AQE would fold
    it back to ONE partition and the decode would run serially again."""

    def gen(batches):
        import pandas as pd

        make = load_maker()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "blob": [make(int(i)) for i in pdf[id_col]],
                }
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col)
        .repartition(n_parts, F.col(id_col))
        .mapInPandas(gen, f"{id_col} long, blob binary")
    )


def synthesize_image_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic fixture image for every id — the single
    blob-synthesis pass shared by the registered ``image_dedup`` query
    and the scale harness (tools/bench_scale.py), so both always
    measure the identical pipeline.

    FORMAT-MIXED on purpose (even ids PNG; ``id % 4 == 1`` baseline
    JPEG, ``id % 4 == 3`` PROGRESSIVE JPEG — the SOF2 spectral-
    selection + successive-approximation layout real crawls serve,
    r13 — both at quality 100): the oracle's golden hashes are
    computed from the PRE-encode pixels, so the driver row's green
    proves EVERY codec round trip AND that near-dup detection works
    across formats — the crawl reality, where the same raster arrives
    in whatever format the site served (JPEG q=100 error <= 2 gray
    levels vs the fixture's 80-level cell margin, so the hashes are
    exactly the pre-encode ones)."""

    def load_maker():
        from python_ctd_spark.functions.image_hash import make_image_blob
        from python_ctd_spark.functions.jpeg_numpy import encode_jpeg

        def make(i: int) -> bytes:
            blob, px = make_image_blob(i)
            if i % 2 == 0:
                return blob
            return encode_jpeg(px, quality=100, progressive=i % 4 == 3)

        return make

    return _synthesize_blobs(df, id_col, load_maker)


def ahash_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "id",
    hash_col: str = "ahash",
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a, id_b, hamming)`` by banded
    Hamming join on the 64-bit perceptual hash — a thin adapter over
    the shared :func:`..dedup.banded_hamming_pairs` core (identical
    plan shape as text SimHash).

    Unlike the text row's best-effort 6-bit band, image near-dup here
    CONTRACTS losslessness (the oracle proves it with an exhaustive
    all-pairs scan), so ``max_hamming < bands`` is enforced.

    NULL hashes — the quarantine rows a ``strict=False`` fingerprint
    pass emits for undecodable blobs — are excluded here BY KEY
    SEMANTICS, not silently: the quarantine contract is that those ids
    sit in the ``error IS NOT NULL`` audit stream, never in the join.
    """
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"({max_hamming} >= {bands})"
        )
    base = hashed.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("sh")
    )
    return banded_hamming_pairs(base, max_hamming, bands, materialize)


def synthesize_audio_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic fixture WAV for every id
    (:func:`..functions.media_dedup_fixtures.make_audio_blob`) — the
    blob-synthesis pass behind the registered ``audio_dedup`` query."""

    def load_maker():
        from python_ctd_spark.functions.media_dedup_fixtures import (
            make_audio_blob,
        )

        return lambda i: make_audio_blob(i)[0]

    return _synthesize_blobs(df, id_col, load_maker)


def synthesize_gif_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic fixture animated GIF for every id
    (:func:`..functions.media_dedup_fixtures.make_gif_blob`) — the
    blob-synthesis pass behind the registered ``gif_dedup`` query."""

    def load_maker():
        from python_ctd_spark.functions.media_dedup_fixtures import (
            make_gif_blob,
        )

        return lambda i: make_gif_blob(i)[0]

    return _synthesize_blobs(df, id_col, load_maker)


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    strict: bool = True,
) -> DataFrame:
    """Decode each WAV blob — PCM plus the compressed variants
    (G.711 mu-law/A-law, IMA ADPCM) via
    :func:`..functions.wav_numpy.decode_wav_any`, multi-channel
    averaged to mono — and emit its 64-bit frame-energy fingerprint
    (:func:`..functions.audio_hash.energy_hash64`):
    ``(id, afp, n_samples, rate, error)``.

    Same shape discipline as :func:`image_ahash` — map-side
    ``mapInPandas``, samples never shuffle, and the fingerprint feeds
    the SAME :func:`..dedup.banded_hamming_pairs` join (pass
    ``hash_col="afp"`` to :func:`ahash_pairs`), so audio near-dup costs
    one more adapter, not a third engine.  Gain-changed copies collide
    exactly (the hash is amplitude-scale-invariant).  Same error
    contract too: strict raises on a malformed blob; ``strict=False``
    emits a quarantine row (``error`` set, fingerprint NULL) — a
    compressed-codec WAV in a dirty archive must not kill the job."""

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.audio_hash import energy_hash64
        from python_ctd_spark.functions.wav_numpy import decode_wav_any

        for pdf in batches:
            ids, fps, ns, rates, errs = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    samples, rate = decode_wav_any(bytes(blob))
                    fp = energy_hash64(samples)
                except (ValueError, NotImplementedError) as exc:
                    if strict:
                        raise
                    ids.append(i)
                    fps.append(None)
                    ns.append(None)
                    rates.append(None)
                    errs.append(str(exc))
                    continue
                ids.append(i)
                fps.append(fp)
                ns.append(samples.shape[0])
                rates.append(rate)
                errs.append(None)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="Int64"),
                    "n_samples": pd.Series(ns, dtype="Int64"),
                    "rate": pd.Series(rates, dtype="Int32"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn, "id long, afp long, n_samples long, rate int, error string"
    )


def synthesize_video_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic MJPEG AVI for every id: the SAME planted
    frame rasters as the GIF fixtures
    (:func:`..functions.media_dedup_fixtures.gif_fixture_frames`)
    muxed through :func:`..functions.avi_numpy.encode_avi_mjpeg` at
    quality 100 — so video near-dup over these blobs must reproduce
    the GIF fixture's planted group structure exactly (JPEG q=100
    error <= 2 gray levels vs the 80-level cell margin)."""

    def load_maker():
        from python_ctd_spark.functions.avi_numpy import encode_avi_mjpeg
        from python_ctd_spark.functions.media_dedup_fixtures import (
            gif_fixture_frames,
        )

        return lambda i: encode_avi_mjpeg(
            gif_fixture_frames(i), fps=10.0, quality=100
        )

    return _synthesize_blobs(df, id_col, load_maker)


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    hash_size: int = 8,
    strict: bool = True,
) -> DataFrame:
    """Decode each Motion-JPEG AVI blob (real stdlib container walk +
    the repo's own JPEG codec — :mod:`..functions.avi_numpy`) and emit
    one perceptual hash PER FRAME: ``(id, frame_idx, ahash, height,
    width, error)`` — the SAME schema as :func:`gif_frame_hashes`, so
    :func:`gif_near_dup_pairs` aggregates video near-dups unchanged
    (one banded join + per-pair frame-match aggregate serves GIF and
    AVI alike; the codec is an adapter, per the design that makes each
    new modality one map-side pass, never a new engine).  Same error
    contract: strict raises on an undecodable blob or a non-MJPEG
    fourcc; ``strict=False`` quarantines it as one row."""

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.avi_numpy import decode_avi
        from python_ctd_spark.functions.image_hash import ahash64

        for pdf in batches:
            ids, idxs, hashes, hs, ws, errs = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    frames, _fps = decode_avi(bytes(blob))
                except ValueError as exc:
                    if strict:
                        raise
                    ids.append(i)
                    idxs.append(None)
                    hashes.append(None)
                    hs.append(None)
                    ws.append(None)
                    errs.append(str(exc))
                    continue
                for j, fr in enumerate(frames):
                    ids.append(i)
                    idxs.append(j)
                    hashes.append(ahash64(_to_gray(fr), hash_size))
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="Int32"),
                    "ahash": pd.Series(hashes, dtype="Int64"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn,
        "id long, frame_idx int, ahash long, height int, width int,"
        " error string",
    )


def gif_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    hash_size: int = 8,
    strict: bool = True,
) -> DataFrame:
    """Decode each GIF blob (real stdlib decoder, disposal-composited
    full-canvas frames — :mod:`..functions.gif_numpy`) and emit one
    perceptual hash PER FRAME: ``(id, frame_idx, ahash, height,
    width)`` — the video-style near-dup primitive (two animations are
    near-dups when most frame hashes pair within a small Hamming
    distance; join this table through
    :func:`..dedup.banded_hamming_pairs` and aggregate matches per id
    pair).  Frames are luma-averaged; canvas sides must be multiples of
    ``hash_size`` (resize first otherwise — same contract as
    :func:`image_ahash`).  Same error contract as the other
    fingerprinters: strict raises; ``strict=False`` quarantines an
    undecodable animation as ONE row (``frame_idx`` NULL, ``error``
    set)."""

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.gif_numpy import decode_gif
        from python_ctd_spark.functions.image_hash import ahash64

        for pdf in batches:
            ids, idxs, hashes, hs, ws, errs = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    frames, _delays = decode_gif(bytes(blob))
                except ValueError as exc:
                    if strict:
                        raise
                    ids.append(i)
                    idxs.append(None)
                    hashes.append(None)
                    hs.append(None)
                    ws.append(None)
                    errs.append(str(exc))
                    continue
                for j, fr in enumerate(frames):
                    ids.append(i)
                    idxs.append(j)
                    hashes.append(ahash64(_to_gray(fr), hash_size))
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="Int32"),
                    "ahash": pd.Series(hashes, dtype="Int64"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn,
        "id long, frame_idx int, ahash long, height int, width int,"
        " error string",
    )


#: frame_idx capacity when packing (id, frame_idx) into one join key —
#: an animation with more frames than this would alias; raise instead
_MAX_FRAMES = 1 << 20


def gif_near_dup_pairs(
    frames: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    min_match_frac: float = 0.5,
    id_col: str = "id",
) -> DataFrame:
    """Animation-level near-dup pairs from a per-frame hash table
    (:func:`gif_frame_hashes` output): two animations are near-dups
    when at least ``min_match_frac`` of their frames match at the SAME
    frame index within ``max_hamming`` bits — the per-id-pair
    frame-match aggregate the per-frame primitive exists for.

    Returns ``(id_a, id_b, n_matched, match_frac)`` with
    ``match_frac = n_matched / max(n_frames_a, n_frames_b)`` (the
    conservative denominator: a 2-frame clip fully contained in a
    100-frame one is NOT a near-dup of it).

    Plan shape: frame identities pack into one 64-bit key
    (``id * 2^20 + frame_idx``) so the SAME lossless banded Hamming
    join as every other modality produces candidate frame pairs; a
    same-frame-index filter, one per-pair count, and a broadcast join
    of the tiny per-id frame counts finish it.  Frame hashes are the
    only thing shuffled — 16 bytes per frame, never pixels."""
    if not 0.0 < min_match_frac <= 1.0:
        raise ValueError(f"min_match_frac in (0, 1], got {min_match_frac}")
    # quarantine rows from a strict=False hash pass (NULL frame_idx /
    # ahash, error set) belong to the audit stream, not the join —
    # same exclusion-by-key-semantics as ahash_pairs
    if "error" in frames.columns:
        frames = frames.filter(F.col("ahash").isNotNull())
    # packed key = id * 2^20 + frame_idx must fit a signed 64-bit long:
    # ids are capped at 2^43 (enough for sequence ids; the repo's
    # 60-bit md5 doc_ids need a remap first — e.g. dense_rank — and
    # must fail LOUDLY here, not overflow into wrong pairs or an ANSI
    # ArithmeticException mid-join)
    _max_id = 1 << 43
    base = frames.select(
        F.when(
            (F.col("frame_idx") >= 0)
            & (F.col("frame_idx") < _MAX_FRAMES)
            & (F.col(id_col) >= 0)
            & (F.col(id_col) < _max_id),
            F.col(id_col) * _MAX_FRAMES + F.col("frame_idx"),
        ).otherwise(
            F.raise_error(F.concat(
                F.lit(f"gif_near_dup_pairs: need 0 <= {id_col} < 2^43 and "
                      f"0 <= frame_idx < {_MAX_FRAMES}, got ("),
                F.col(id_col).cast("string"), F.lit(", "),
                F.col("frame_idx").cast("string"), F.lit(")"),
            ))
        ).alias("id"),
        F.col("ahash").alias("sh"),
    )
    # ONE shared fingerprint materialization: the banded core's two
    # self-join branches AND the two per-id frame-count broadcasts below
    # all consume this table.  Deriving `counts` from `frames` instead
    # (the pre-r14opt spelling) missed the banded core's internal cache
    # (different logical plan), so the full synthesize+decode chain ran
    # THREE times per query — once cached for the join, once per count
    # broadcast (gif_dedup plan: two extra uncached MapInPandas chains).
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = banded_hamming_pairs(base, max_hamming, bands, materialize=False)
    same_frame = pairs.filter(
        F.col("id_a") % _MAX_FRAMES == F.col("id_b") % _MAX_FRAMES
    ).select(
        # integer div, not float division: packed keys reach id * 2^20
        # and doubles lose exactness past 2^53
        F.expr(f"id_a div {_MAX_FRAMES}").alias("id_a"),
        F.expr(f"id_b div {_MAX_FRAMES}").alias("id_b"),
    )
    # per-id frame count off the SAME persisted rows (base is 1:1 with
    # the filtered frames: the packing either emits or raise_errors)
    counts = base.groupBy(
        F.expr(f"id div {_MAX_FRAMES}").alias("__id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nf")
    )
    matched = same_frame.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched")
    )
    out = (
        matched.join(
            F.broadcast(counts.withColumnRenamed("__id", "id_a")
                        .withColumnRenamed("__nf", "__nf_a")),
            "id_a",
        )
        .join(
            F.broadcast(counts.withColumnRenamed("__id", "id_b")
                        .withColumnRenamed("__nf", "__nf_b")),
            "id_b",
        )
        .withColumn(
            "match_frac",
            F.round(
                F.col("n_matched").cast("double")
                / F.greatest("__nf_a", "__nf_b").cast("double"),
                6,
            ),
        )
        .filter(F.col("match_frac") >= min_match_frac)
        .select("id_a", "id_b", "n_matched", "match_frac")
    )
    return out
