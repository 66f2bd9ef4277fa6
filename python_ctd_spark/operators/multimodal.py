"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns with a typed metadata struct
alongside (``media_meta``: format/width/height/duration/…).  Decode,
feature-extract, resize, and frame-sample run as Arrow-batched
``mapInPandas`` stages — one batch of blobs in, one batch of
features/derived blobs out — so media work parallelizes exactly like any
other column and never touches the driver.

PNG images decode for REAL via a pure stdlib+NumPy decoder
(``functions/png_numpy.py`` — zlib inflate + spec §9 un-filtering), PCM
WAV audio via ``functions/wav_numpy.py`` (stdlib ``wave`` + vectorized
dtype view, mono mixdown), and animated GIF — the one real multi-frame
format decodable with the stdlib — via ``functions/gif_numpy.py``
(GIF89a LZW, interlace, disposal compositing), so
``decode_and_featurize(fake=False)`` produces true pixel/sample
features for all three and ``frame_sample(fake=False)`` samples REAL
video-style frames from GIF blobs.  The remaining codecs (JPEG via
PIL, compressed audio via librosa, true video containers via ffmpeg)
are NOT available in this environment and stay honestly stubbed behind
``NotImplementedError`` unless ``fake=True``, whose deterministic
header-derived pseudo-decode exercises the Spark-side contract
(schemas, batching, partitioning, UDF signatures) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, blob_col: str = "blob", out_col: str = "media_meta"
) -> DataFrame:
    """Cheap header sniff without decoding: format from magic bytes,
    size from length — pure JVM expressions."""
    blob = F.col(blob_col)
    head = F.hex(F.substring(blob, 1, 4))
    riff_form = F.hex(F.substring(blob, 9, 4))  # RIFF form: WAVE / AVI\x20
    fmt = (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(head.startswith("52494646") & (riff_form == "57415645"),
              F.lit("wav"))
        .when(head.startswith("52494646") & (riff_form == "41564920"),
              F.lit("avi"))
        .when(head.startswith("47494638"), F.lit("gif"))
        .when(head.startswith("424D"), F.lit("bmp"))
        .when(head == "00000100", F.lit("ico"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn(
        out_col,
        F.struct(
            fmt.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(blob).cast("long").alias("n_bytes"),
        ),
    )


_FEATURE_SCHEMA = "id bigint, format string, n_bytes bigint, feat array<double>"


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "blob",
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode blobs and emit fixed-width feature vectors via mapInPandas.

    ``fake=True`` derives features from raw byte statistics — the
    deterministic pseudo-decode the driver oracle checks.  ``fake=False``
    REALLY decodes PNG blobs (pure stdlib+NumPy,
    :func:`python_ctd_spark.functions.png_numpy.decode_png`; features
    from pixel values), baseline JPEG blobs
    (:func:`python_ctd_spark.functions.jpeg_numpy.decode_jpeg` —
    clean-room T.81 decoder, the dominant crawl format) and PCM WAV
    blobs (:func:`python_ctd_spark.functions.wav_numpy.decode_wav_any` —
    PCM plus the compressed WAV variants: G.711 mu-law/A-law and
    IMA ADPCM, r13; features from mono samples), animated GIF blobs
    (:func:`python_ctd_spark.functions.gif_numpy.decode_gif`; features
    from all frames' pixels) and Motion-JPEG AVI video
    (:func:`python_ctd_spark.functions.avi_numpy.decode_avi`, r13)
    and BMP (:func:`python_ctd_spark.functions.bmp_numpy.decode_bmp`,
    r13); other formats raise ``NotImplementedError`` inside the
    worker —
    perceptual-audio (mp3/aac) and inter-coded video codecs genuinely
    aren't in this environment, and only that boundary stays stubbed.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        from python_ctd_spark.functions.avi_numpy import decode_avi
        from python_ctd_spark.functions.bmp_numpy import decode_bmp, decode_ico
        from python_ctd_spark.functions.gif_numpy import decode_gif
        from python_ctd_spark.functions.jpeg_numpy import decode_jpeg
        from python_ctd_spark.functions.media_features import feature_fold
        from python_ctd_spark.functions.png_numpy import decode_png
        from python_ctd_spark.functions.wav_numpy import decode_wav_any

        for pdf in batches:
            feats, fmts = [], []
            for blob in pdf[blob_col]:
                b = bytes(blob)
                is_png = b[:4] == b"\x89PNG"
                is_jpg = b[:2] == b"\xff\xd8"
                is_wav = b[:4] == b"RIFF" and b[8:12] == b"WAVE"
                is_avi = b[:4] == b"RIFF" and b[8:12] == b"AVI "
                is_gif = b[:4] == b"GIF8"
                is_bmp = b[:2] == b"BM"
                is_ico = b[:4] == b"\x00\x00\x01\x00"
                fmts.append(
                    "png" if is_png else "jpeg" if is_jpg
                    else "wav" if is_wav else "avi" if is_avi
                    else "gif" if is_gif else "bmp" if is_bmp
                    else "ico" if is_ico else "raw"
                )
                if fake:
                    arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                elif is_png:
                    arr = decode_png(b).astype(np.float64).ravel()
                elif is_jpg:
                    arr = decode_jpeg(b).astype(np.float64).ravel()
                elif is_wav:
                    # PCM via stdlib wave; G.711 / IMA ADPCM clean-room
                    arr, _rate = decode_wav_any(b)
                elif is_avi:
                    avi_frames, _fps = decode_avi(b)
                    arr = np.concatenate(
                        [f.astype(np.float64).ravel() for f in avi_frames]
                    )
                elif is_gif:
                    gif_frames, _delays = decode_gif(b)
                    arr = np.concatenate(
                        [f.astype(np.float64).ravel() for f in gif_frames]
                    )
                elif is_bmp:
                    arr = decode_bmp(b).astype(np.float64).ravel()
                elif is_ico:
                    arr = decode_ico(b).astype(np.float64).ravel()
                else:
                    raise NotImplementedError(
                        "real decode supports PNG, JPEG (baseline/"
                        "progressive), BMP, WAV (PCM/G.711/IMA-ADPCM), "
                        "GIF and MJPEG AVI (no librosa/ffmpeg here for "
                        "mp3/aac/h264); pass fake=True for the "
                        "byte-statistics pseudo-decode"
                    )
                # one shared fold definition with the kernel-golden
                # oracle (functions/media_features.feature_fold):
                # same np.array_split boundaries, same float64 means
                feats.append(feature_fold(arr, n_features))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "format": fmts,
                    "n_bytes": pdf[blob_col].map(len).astype("int64"),
                    "feat": feats,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(fn, _FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "blob",
    every_n: int = 4,
    frame_bytes: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Video frame-sampling: one input blob -> many frame rows
    ``(id, frame_idx, frame blob)`` via the 1->N mapInPandas fan-out.

    ``fake=False`` REALLY decodes animated-GIF blobs
    (:func:`python_ctd_spark.functions.gif_numpy.decode_gif` — stdlib
    LZW + disposal compositing) AND Motion-JPEG AVI blobs
    (:func:`python_ctd_spark.functions.avi_numpy.decode_avi` — RIFF
    walk + the repo's own JPEG codec, r13), emitting every
    ``every_n``-th composed frame as raw row-major RGB bytes (H*W*3;
    dimensions ride in ``media_meta``/the blob header).  Inter-coded
    container video (mp4/webm/h264) genuinely needs ffmpeg, which this
    environment lacks — other blobs raise ``NotImplementedError``.
    ``fake=True`` keeps the deterministic byte-chunk fake (the
    oracle-checkable form): the blob is treated as a concatenation of
    fixed-size frames."""
    schema = "id bigint, frame_idx int, frame binary"

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.avi_numpy import decode_avi
        from python_ctd_spark.functions.gif_numpy import decode_gif

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if fake:
                    n_frames = max(1, len(b) // frame_bytes)
                    for k in range(0, n_frames, every_n):
                        ids.append(int(i))
                        idxs.append(k)
                        frames.append(b[k * frame_bytes : (k + 1) * frame_bytes])
                elif b[:4] == b"GIF8" or (
                    b[:4] == b"RIFF" and b[8:12] == b"AVI "
                ):
                    if b[:4] == b"GIF8":
                        vid_frames, _delays = decode_gif(b)
                    else:
                        vid_frames, _fps = decode_avi(b)
                    for k in range(0, len(vid_frames), every_n):
                        ids.append(int(i))
                        idxs.append(k)
                        frames.append(vid_frames[k].tobytes())
                else:
                    raise NotImplementedError(
                        "real frame sampling supports animated GIF and "
                        "Motion-JPEG AVI (no ffmpeg in this environment "
                        "for inter-coded video); pass fake=True for the "
                        "byte-chunk fake"
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(fn, schema)


def resize_image(
    df: DataFrame,
    id_col: str = "id",
    blob_col: str = "blob",
    target_w: int = 8,
    target_h: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Image-resize: blob in -> (smaller) PNG blob + new dims out, one
    row per input, via mapInPandas.

    ``fake=False`` REALLY resizes PNG, JPEG and BMP blobs: stdlib
    decode (:func:`..functions.png_numpy.decode_png` /
    :func:`..functions.jpeg_numpy.decode_jpeg` /
    :func:`..functions.bmp_numpy.decode_bmp`), exact box-mean area
    average (:func:`..functions.png_numpy.resize_area` — integral
    image, nearest-neighbor on upscale), stdlib PNG re-encode — a true
    thumbnail pipeline with no PIL.  Other blobs raise
    ``NotImplementedError``.  The deterministic ``fake=True``
    byte-stride form stays for the oracle-checkable contract."""
    schema = "id bigint, width int, height int, resized binary"

    def fn(batches):
        import pandas as pd

        from python_ctd_spark.functions.bmp_numpy import decode_bmp
        from python_ctd_spark.functions.jpeg_numpy import decode_jpeg
        from python_ctd_spark.functions.png_numpy import (
            decode_png, encode_png_gray, resize_area,
        )

        for pdf in batches:
            ids, ws, hs, out = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if fake:
                    n = target_w * target_h
                    if len(b) == 0:
                        sampled = b""
                    else:
                        step = max(1, len(b) // n)
                        sampled = b[::step][:n]
                elif (b[:4] == b"\x89PNG" or b[:2] == b"\xff\xd8"
                      or b[:2] == b"BM"):
                    img = (
                        decode_png(b) if b[:4] == b"\x89PNG"
                        else decode_bmp(b) if b[:2] == b"BM"
                        else decode_jpeg(b)
                    )
                    small = resize_area(img, target_h, target_w)
                    if small.ndim == 3 and small.shape[2] == 2:
                        # gray+alpha (PNG color type 4): the encoder
                        # emits gray/RGB/RGBA only — drop the alpha
                        # plane rather than die on an opaque KeyError
                        small = small[:, :, 0]
                    sampled = encode_png_gray(small)
                else:
                    raise NotImplementedError(
                        "real resize supports PNG, JPEG and BMP only "
                        "(no PIL in this environment); pass fake=True "
                        "for the byte-stride fake"
                    )
                ids.append(int(i))
                ws.append(target_w)
                hs.append(target_h)
                out.append(sampled)
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "resized": out}
            )

    return df.select(id_col, blob_col).mapInPandas(fn, schema)
