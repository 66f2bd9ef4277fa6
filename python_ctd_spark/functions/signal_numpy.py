"""Pure-NumPy signal kernels used by the per-cast ``applyInPandas`` paths.

scipy is not available in this environment, so the two scipy entry points
the reference uses — ``signal.butter(2, wn, 'low')`` and
``signal.filtfilt`` (reference ctd/processing.py:83-89) — are implemented
here from the standard public formulas:

- 2nd-order Butterworth low-pass via bilinear transform with frequency
  pre-warping (classic biquad design, e.g. Oppenheim & Schafer;
  identical coefficients to scipy.signal.butter up to float rounding);
- zero-phase forward-backward IIR filtering with scipy-compatible
  defaults: odd-reflection padding of length ``3*max(len(a),len(b))`` and
  steady-state initial conditions (``lfilter_zi``).

These run on whole casts inside Arrow-batched pandas UDFs — one cast
(<= ~1e5 rows) per task, embarrassingly parallel across casts.
"""

from __future__ import annotations

import numpy as np


def butter2_lowpass(wn: float) -> tuple[np.ndarray, np.ndarray]:
    """Coefficients (b, a) of a 2nd-order digital Butterworth low-pass.

    ``wn`` is the cutoff normalized to Nyquist (scipy convention, 0<wn<1).
    """
    if not 0 < wn < 1:
        msg = f"Digital filter critical frequency must be 0 < wn < 1, got {wn}"
        raise ValueError(msg)
    k = np.tan(np.pi * wn / 2.0)  # pre-warped cutoff
    q = 1.0 / np.sqrt(2.0)  # Butterworth quality factor
    norm = 1.0 / (1.0 + k / q + k * k)
    b0 = k * k * norm
    b = np.array([b0, 2.0 * b0, b0])
    a = np.array([1.0, 2.0 * (k * k - 1.0) * norm, (1.0 - k / q + k * k) * norm])
    return b, a


def _lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray) -> np.ndarray:
    """Direct-form II transposed IIR filter (order 2), sequential scan."""
    y = np.empty_like(x, dtype=float)
    z0, z1 = float(zi[0]), float(zi[1])
    b0, b1, b2 = b
    a1, a2 = a[1], a[2]
    for i in range(x.shape[0]):
        xi = x[i]
        yi = b0 * xi + z0
        z0 = b1 * xi + z1 - a1 * yi
        z1 = b2 * xi - a2 * yi
        y[i] = yi
    return y


def _lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a unit-step input (order 2)."""
    a1, a2 = a[1], a[2]
    bb = np.array([b[1] - a1 * b[0], b[2] - a2 * b[0]])
    m = np.array([[1.0 + a1, -1.0], [a2, 1.0]])
    return np.linalg.solve(m, bb)


def filtfilt2(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase filtering, scipy-default behavior for an order-2 filter:
    odd-extension padding (padlen = 3*3 = 9) + forward and backward passes
    seeded with steady-state initial conditions."""
    x = np.asarray(x, dtype=float)
    padlen = 3 * max(len(a), len(b))
    if x.shape[0] <= padlen:
        msg = f"The length of the input vector must be > {padlen}, got {x.shape[0]}"
        raise ValueError(msg)
    left = 2.0 * x[0] - x[padlen:0:-1]
    right = 2.0 * x[-1] - x[-2 : -(padlen + 2) : -1]
    ext = np.concatenate([left, x, right])
    zi = _lfilter_zi(b, a)
    y = _lfilter(b, a, ext, zi * ext[0])
    y = _lfilter(b, a, y[::-1], zi * y[-1])[::-1]
    return y[padlen:-padlen]


_WINDOWS = {
    "flat": np.ones,
    "hanning": np.hanning,
    "hamming": np.hamming,
    "bartlett": np.bartlett,
    "blackman": np.blackman,
}


def window_weights(window: str, window_len: int) -> np.ndarray:
    """Normalized smoothing-kernel weights (reference ctd/processing.py:199-225)."""
    if window not in _WINDOWS:
        msg = (
            "window must be one of 'flat', 'hanning', 'hamming', "
            "'bartlett', 'blackman'"
        )
        raise ValueError(msg)
    w = _WINDOWS[window](window_len)
    return w / w.sum()


def smooth_kernel(data: np.ndarray, window_len: int, window: str) -> np.ndarray:
    """Exact reference smoothing (ctd/processing.py:197-229): pivot-reflect
    padding ``2*x[0] - x[window_len:1:-1]`` both ends, normalized-window
    convolution in 'same' mode, then trim back to the original length."""
    data = np.asarray(data, dtype=float)
    if window_len < 3:
        return data.copy()
    if data.size < window_len:
        # reference raises ValueError for vectors shorter than the window
        # (ctd/processing.py:206-207); in a multi-cast frame one short
        # cast must not kill the job — pass it through untouched (the
        # documented divergence, same policy as despike on short casts)
        return data.copy()
    s = np.r_[
        2 * data[0] - data[window_len:1:-1],
        data,
        2 * data[-1] - data[-1:-window_len:-1],
    ]
    w = window_weights(window, window_len)
    out = np.convolve(w, s, mode="same")
    return out[window_len - 1 : -window_len + 1]


def despike_kernel(values: np.ndarray, n1: float, n2: float, block: int) -> np.ndarray:
    """Exact reference Wild-Edit despike (ctd/processing.py:146-180): two
    passes of forward-looking rolling mean/std (population, NaN-aware) with
    the final ``block-1`` positions reusing the last complete window's
    stats; pass 1 masks at ``n1*std``, pass 2 recomputes on the cleaned
    data and masks the *original* values at ``n2*std``."""
    from numpy import ma

    data = np.asarray(values, dtype=float).copy()
    if data.shape[0] < block:
        # the reference errors here (negative as_strided shape,
        # ctd/processing.py:11-18); we pass short casts through unchanged
        # — same behavior as the native window plan
        return data
    original = data.copy()

    def _roll_stats(arr: np.ndarray, factor: float):
        n = arr.shape[0]
        shape = (n - block + 1, block)
        strides = (arr.strides[-1], arr.strides[-1])
        roll = np.lib.stride_tricks.as_strided(arr, shape=shape, strides=strides)
        roll = ma.masked_invalid(roll)
        std = factor * roll.std(axis=1)
        mean = roll.mean(axis=1)
        std = np.r_[std, np.tile(std[-1], block - 1)]
        mean = np.r_[mean, np.tile(mean[-1], block - 1)]
        return (
            ma.asarray(mean).filled(fill_value=np.nan),
            ma.asarray(std).filled(fill_value=np.nan),
        )

    mean, std = _roll_stats(data, n1)
    with np.errstate(invalid="ignore"):
        data[np.abs(original - mean) > std] = np.nan

    mean, std = _roll_stats(data, n2)
    clean = original.copy()
    with np.errstate(invalid="ignore"):
        clean[np.abs(original - mean) > std] = np.nan
    return clean


def movingaverage_kernel(values: np.ndarray, window_size: int) -> np.ndarray:
    """Reference boxcar (ctd/processing.py:243-246)."""
    w = np.ones(int(window_size)) / float(window_size)
    return np.convolve(np.asarray(values, dtype=float), w, "same")
