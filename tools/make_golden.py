"""Generate kernel-golden parquet oracles for the two non-SQL-expressible
signal queries (``lp_filter``, ``smooth``).

The driver's correctness gate compares each Spark query against a DuckDB
SQL oracle at sf0.01.  A bidirectional IIR (filtfilt) and a pivot-reflect
padded convolution have no SQL equivalent, so these two were rows-only in
round 1.  This script runs the *same pure-NumPy kernels* (independently
validated against Sea-Bird-filtered vendor CNV data in
``tests/test_signal.py``) over the sf0.01 events table in the exact group
/ sort order the Spark queries use, and writes the expected output as
parquet.  The oracle SQL then becomes ``SELECT ... FROM read_parquet(...)``
— a full value-level check.

Determinism: the Spark queries run the identical kernel on the identical
float64 input per group (Arrow preserves bits), so outputs are
bit-identical — no rounding needed on either side.

Run from the repo root:  python tools/make_golden.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from python_ctd_spark.functions.signal_numpy import (  # noqa: E402
    butter2_lowpass,
    filtfilt2,
    smooth_kernel,
)

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "data" / "golden"


def load_events(sf_dir: str) -> pd.DataFrame:
    """Replicate ``__spark_entry__._ev`` + the signal queries' projection:
    ts is raw int64 nanoseconds (nanosAsLong), ts_us = ts div 1000."""
    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    pdf = pd.DataFrame(
        {
            "event_id": tbl["event_id"].to_numpy(),
            "user_id": tbl["user_id"].to_numpy(),
            "ts_us": tbl["ts"].cast(pa.int64()).to_numpy() // 1000,
            "v": tbl["value"].to_numpy().astype("float64"),
        }
    )
    return pdf


def apply_per_group(pdf: pd.DataFrame, kernel) -> pd.DataFrame:
    """Same contract as the operators' applyInPandas fn: per user_id group,
    sort by (ts_us, event_id) with a stable sort, run the kernel over v."""
    parts = []
    for _, grp in pdf.groupby("user_id", sort=False):
        grp = grp.sort_values(["ts_us", "event_id"], kind="mergesort").copy()
        grp["v"] = kernel(grp["v"].to_numpy())
        parts.append(grp)
    out = pd.concat(parts, ignore_index=True)
    return out[["event_id", "user_id", "v"]]


def lp_kernel(x: np.ndarray) -> np.ndarray:
    """lp_filter(sample_rate=24, time_constant=0.15) on the v channel,
    short casts pass through (same policy as operators/signal.py)."""
    wn = (1.0 / 0.15) / (24.0 * 2.0)
    b, a = butter2_lowpass(wn)
    padlen = 3 * max(len(a), len(b))
    if x.shape[0] <= padlen:
        return x
    return filtfilt2(b, a, x)


def smooth_k(x: np.ndarray) -> np.ndarray:
    return smooth_kernel(x, 11, "hanning")


def make_multimodal_real(sf_dir: str, tag: str) -> None:
    """Golden for ``multimodal_real_decode``: expected features computed
    from the PRE-ENCODE source arrays (not by running the decoders), so
    the driver row is a true encode->decode round-trip check on the
    stdlib PNG/GIF/WAV codecs, not a plumbing tautology."""
    from python_ctd_spark.functions.media_fixtures import (
        expected_features,
        make_media_blob,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in tbl["doc_id"].to_pylist():
        fmt, blob, src = make_media_blob(int(d))
        f = expected_features(src, 4)
        rows.append((int(d), fmt, len(blob), f[0], f[1], f[2], f[3]))
    out = pd.DataFrame(
        rows, columns=["doc_id", "format", "n_bytes", "f0", "f1", "f2", "f3"]
    )
    path = GOLDEN_DIR / f"multimodal_real_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_bpe(sf_dir: str, tag: str) -> None:
    """Golden for ``bpe_token_count``: the pure-Python byte-level BPE
    reference (functions/bpe.py, itself pinned by hand-computed unit
    tests) over the documents table with the committed merges fixture —
    the real-merge-table twin of the signal kernels' goldens."""
    from python_ctd_spark.functions.bpe import encode_count, load_ranks

    ranks = load_ranks()
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cache: dict = {}
    rows = [
        (int(d), encode_count(t or "", ranks, cache))
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "bpe_tokens"])
    path = GOLDEN_DIR / f"bpe_token_count_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_bpe_ids(sf_dir: str, tag: str) -> None:
    """Golden for the tokenize->pack pipeline: per-document token ID
    arrays from the pure-Python reference encoder + the rank-derived
    canonical vocab (functions/bpe.py:vocab_from_ranks) — the DuckDB
    oracle re-packs these ids in SQL, so equality checks BOTH the live
    Spark tokenizer and the sequence assembly."""
    from python_ctd_spark.functions.bpe import (
        encode_ids, load_ranks, vocab_from_ranks,
    )

    ranks = load_ranks()
    vocab = vocab_from_ranks(ranks)
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    cache: dict = {}
    rows = [
        (int(d), s, encode_ids(t or "", ranks, vocab, cache))
        for d, s, t in zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "source", "token_ids"])
    path = GOLDEN_DIR / f"bpe_token_ids_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_bpe_train(sf_dir: str, tag: str) -> None:
    """Golden for the ``bpe_train`` driver row (VERDICT r9 item 2): the
    SERIAL reference trainer — a pure-Python Counter over the documents
    table, the same capped defaults (min_word_freq=2, top-500k by
    (freq desc, word)), then the shared merge loop — written as the
    merge table ``(rank, lhs, rhs)``.  Equality with the distributed
    trainer audits the Spark counting + TakeOrdered top-N pass, the
    genuinely distributed (and genuinely breakable) half."""
    from collections import Counter

    from python_ctd_spark.functions.bpe import merge_loop, pretokens
    from tools.oracles.params import _BPE_TRAIN_MERGES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    wf: Counter = Counter(
        tok for t in tbl["text"].to_pylist() for tok in pretokens(t or "")
    )
    pruned = {w: f for w, f in wf.items() if f >= 2}
    top = dict(
        sorted(pruned.items(), key=lambda kv: (-kv[1], kv[0]))[:500_000]
    )
    merges = merge_loop(top, _BPE_TRAIN_MERGES, 2)
    out = pd.DataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        columns=["rank", "lhs", "rhs"],
    )
    out["rank"] = out["rank"].astype("int32")
    path = GOLDEN_DIR / f"bpe_train_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_image_ahash(sf_dir: str, tag: str) -> None:
    """Golden for ``image_dedup``: perceptual hashes computed from the
    PRE-ENCODE pixel rasters (functions/image_hash.py fixture), so the
    driver row is a real PNG encode->decode->ahash round trip — the
    oracle then finds near-dup pairs with a plain all-pairs
    bit_count(xor) scan, proving the banded Hamming join misses
    nothing."""
    from python_ctd_spark.functions.image_hash import ahash64, make_image_blob

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in tbl["doc_id"].to_pylist():
        _blob, px = make_image_blob(int(d))
        rows.append((int(d), ahash64(px)))
    out = pd.DataFrame(rows, columns=["doc_id", "ahash"])
    out["ahash"] = out["ahash"].astype("int64")
    path = GOLDEN_DIR / f"image_ahash_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_audio_afp(sf_dir: str, tag: str) -> None:
    """Golden for ``audio_dedup``: frame-energy fingerprints computed
    from the PRE-ENCODE int16 sample streams
    (functions/media_dedup_fixtures.py), so the driver row is a real
    WAV encode->decode->energy_hash64 round trip; the oracle's
    all-pairs bit_count(xor) scan then proves the banded Hamming join
    misses nothing."""
    from python_ctd_spark.functions.audio_hash import energy_hash64
    from python_ctd_spark.functions.media_dedup_fixtures import make_audio_blob

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in tbl["doc_id"].to_pylist():
        _blob, samples = make_audio_blob(int(d))
        rows.append((int(d), energy_hash64(samples.astype("float64"))))
    out = pd.DataFrame(rows, columns=["doc_id", "afp"])
    out["afp"] = out["afp"].astype("int64")
    path = GOLDEN_DIR / f"audio_afp_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def make_gif_frame_ahash(sf_dir: str, tag: str) -> None:
    """Golden for ``gif_dedup``: per-frame perceptual hashes computed
    from the PRE-ENCODE frame rasters
    (functions/media_dedup_fixtures.py), so the driver row is a real
    GIF encode->decode->per-frame-ahash round trip; the oracle then
    rebuilds the per-id-pair frame-match aggregate exhaustively."""
    from python_ctd_spark.functions.image_hash import ahash64
    from python_ctd_spark.functions.media_dedup_fixtures import (
        gif_fixture_frames,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in tbl["doc_id"].to_pylist():
        for j, fr in enumerate(gif_fixture_frames(int(d))):
            rows.append((int(d), j, ahash64(fr.astype("float64").mean(axis=2))))
    out = pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ahash"])
    out["frame_idx"] = out["frame_idx"].astype("int32")
    out["ahash"] = out["ahash"].astype("int64")
    path = GOLDEN_DIR / f"gif_frame_ahash_{tag}.parquet"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
    print(f"wrote {path} ({len(out)} rows)")


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    ev = load_events(sf_dir)
    tag = pathlib.Path(sf_dir).name
    for name, kernel in [("lp_filter", lp_kernel), ("smooth", smooth_k)]:
        out = apply_per_group(ev, kernel)
        path = GOLDEN_DIR / f"{name}_{tag}.parquet"
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
        print(f"wrote {path} ({len(out)} rows)")
    make_multimodal_real(sf_dir, tag)
    make_bpe(sf_dir, tag)
    make_bpe_ids(sf_dir, tag)
    make_bpe_train(sf_dir, tag)
    make_image_ahash(sf_dir, tag)
    make_audio_afp(sf_dir, tag)
    make_gif_frame_ahash(sf_dir, tag)


if __name__ == "__main__":
    main(*sys.argv[1:])
