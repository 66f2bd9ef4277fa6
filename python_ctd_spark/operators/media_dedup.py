"""Media deduplication: perceptual-hash near-dup detection for image
blobs — the multimodal twin of the text dedup family.

Pipeline shape (the one that survives 100 TB of images):

1. :func:`image_ahash` — decode + hash is a pure map-side pass
   (``mapInPandas`` over Arrow batches, real PNG decode via the repo's
   stdlib codec); the corpus of blobs is read once and never shuffled.
2. :func:`ahash_pairs` — near-dup candidates come from a banded
   equi-join on 16-bit blocks of the 64-bit hash (pigeonhole: two
   hashes within ``max_hamming <= 3`` bits MUST agree on one of 4
   blocks), verified with an exact ``bit_count(xor)``.  Identical
   banding guarantee and plan shape as text SimHash
   (:func:`.dedup.simhash_pairs`) — only the tiny ``(id, hash)``
   fingerprint table enters the join, never pixels.

Exact-duplicate grouping is the degenerate case: ``groupBy("ahash")``
on the fingerprint table (or feed ``hamming = 0`` pairs to
``dedup.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    hash_size: int = 8,
) -> DataFrame:
    """Decode each PNG blob (real stdlib decoder —
    :mod:`..functions.png_numpy`) and emit its 64-bit average-hash:
    ``(id, ahash, height, width)``.

    Arrow-batched ``mapInPandas``; no shuffle — the blob column never
    leaves the scan stage's partitions, and downstream joins see only
    the ~16-byte fingerprint rows.  RGB inputs are luma-averaged before
    pooling; a malformed blob raises (dedup must not silently skip
    corpus rows — filter decodable rows explicitly upstream if the
    archive is dirty).
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        from python_ctd_spark.functions.image_hash import ahash64
        from python_ctd_spark.functions.png_numpy import decode_png

        for pdf in batches:
            ids, hashes, hs, ws = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                px = decode_png(bytes(blob))
                if px.ndim == 3 and px.shape[2] > 1:
                    px = px.astype(np.float64).mean(axis=2)
                hashes.append(ahash64(px, hash_size))
                ids.append(i)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn, "id long, ahash long, height int, width int"
    )


def ahash_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "id",
    hash_col: str = "ahash",
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a, id_b, hamming)`` by banded
    Hamming join on the 64-bit perceptual hash.

    Split the hash into ``bands`` equal blocks; two hashes within
    ``max_hamming < bands`` bits must agree on at least one block
    (pigeonhole), so the band equi-join is LOSSLESS for the threshold —
    the all-pairs scan an oracle runs finds exactly the same pairs.
    The join key space is (block index, 16-bit value): candidate
    volume scales with hash collisions, never corpus^2.
    """
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"({max_hamming} >= {bands})"
        )
    width = 64 // bands
    base = hashed.select(F.col(id_col).alias("id"), F.col(hash_col).alias("sh"))
    if materialize:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    blocks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("sh"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.blk").alias("blk"), F.col("bk.bval").alias("bval"))
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
