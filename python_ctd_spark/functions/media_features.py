"""Canonical media feature fold — the ONE definition shared by the
production decode path (:func:`..operators.multimodal.decode_and_featurize`)
and the kernel-golden oracle builder
(:mod:`.media_fixtures` / ``tools/make_golden.py``).

Lives in a neutral, numpy-only module so the dependency direction is
production -> here and fixtures -> here (never production -> fixtures):
``decode_and_featurize(fake=False)`` keeps working even if the test
fixtures are excluded from packaging.
"""

from __future__ import annotations

import numpy as np


def feature_fold(src: np.ndarray, n_features: int) -> list[float]:
    """Fold a flat decoded sample/pixel array into ``n_features`` float64
    chunk means (same ``np.array_split`` boundaries on both the Spark
    side and the oracle side, so lossless codecs match bit-for-bit)."""
    if src.size == 0:
        src = np.zeros(1)
    return [float(c.mean()) if c.size else 0.0 for c in np.array_split(src, n_features)]
