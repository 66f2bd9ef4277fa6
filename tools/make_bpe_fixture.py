"""Train the repo's BPE merge-table fixture (VERDICT r7 item 5).

Trains a byte-level BPE merge table (python_ctd_spark.functions.bpe,
the public GPT-2 scheme) on the sf0.001 documents corpus and writes it
in the public GPT-2 merges format to python_ctd_spark/data/bpe_merges.txt
(shipped as package data).
Training is fully deterministic (frequency then lexicographic
tie-break), so re-running this script on the same corpus reproduces
the committed fixture byte-for-byte.

Run from the repo root:  python tools/make_bpe_fixture.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from python_ctd_spark.functions.bpe import train_merges  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "python_ctd_spark" / "data"


def main(sf_dir: str = "/root/testdata/sf0.001", n_merges: int = 512) -> None:
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    merges = train_merges(texts, n_merges=n_merges)
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "bpe_merges.txt"
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"# byte-level BPE merges, trained on {sf_dir}/documents"
                f" ({len(merges)} merges)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {path} ({len(merges)} merges from {len(texts)} docs)")


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["/root/testdata/sf0.001"]))
