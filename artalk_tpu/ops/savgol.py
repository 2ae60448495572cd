"""Savitzky-Golay smoothing as a constant matrix multiply.

The reference smooths predicted motion on the host with
``scipy.signal.savgol_filter`` (window 5 / polyorder 2 on all dims, window 9 /
polyorder 3 on the rotation dims 100:103; reference: inference.py:89-95),
forcing a device->host->device round trip. Here the filter -- including
scipy's default ``mode='interp'`` edge handling (polynomial fit on the first
and last window) -- is precomputed as a (T, T) matrix applied on-device, so
smoothing fuses into the decode pipeline.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """FIR coefficients for the central (interior) Savitzky-Golay tap.

    Least-squares polynomial fit over positions [-half, half], evaluated at 0.
    Matches scipy.signal.savgol_coeffs(window_length, polyorder, use='dot').
    """
    half = window_length // 2
    pos = np.arange(-half, half + 1, dtype=np.float64)
    vander = np.vander(pos, polyorder + 1, increasing=True)  # (W, P+1)
    # y_fit(0) = e0 @ pinv(V) @ x_window
    coeffs = np.linalg.pinv(vander)[0]
    return coeffs


@functools.lru_cache(maxsize=None)
def savgol_matrix(n: int, window_length: int, polyorder: int) -> np.ndarray:
    """Full (n, n) smoothing matrix equivalent to scipy savgol_filter(mode='interp').

    Interior rows carry the FIR coefficients; the first/last ``half`` rows come
    from a polynomial fit over the first/last ``window_length`` samples
    (scipy's 'interp' mode).
    """
    assert n >= window_length, f"sequence length {n} < window {window_length}"
    half = window_length // 2
    coeffs = savgol_coeffs(window_length, polyorder)
    m = np.zeros((n, n), dtype=np.float64)
    for t in range(half, n - half):
        m[t, t - half : t + half + 1] = coeffs
    # Edge handling: fit a polynomial to the first window and evaluate at 0..half-1.
    pos = np.arange(window_length, dtype=np.float64)
    vander_fit = np.vander(pos, polyorder + 1, increasing=True)
    fit = np.linalg.pinv(vander_fit)  # (P+1, W)
    eval_head = np.vander(np.arange(half, dtype=np.float64), polyorder + 1, increasing=True)
    m[:half, :window_length] = eval_head @ fit
    eval_tail = np.vander(
        np.arange(window_length - half, window_length, dtype=np.float64),
        polyorder + 1,
        increasing=True,
    )
    m[n - half :, n - window_length :] = eval_tail @ fit
    return m.astype(np.float32)


def savgol_smooth(x: jnp.ndarray, window_length: int, polyorder: int) -> jnp.ndarray:
    """Smooth along axis -2 of a (..., T, C) array (static T).

    Robustness deviation from the reference (which would crash via scipy):
    sequences shorter than the window shrink the window to the largest odd
    length that fits (identity for T < 3).
    """
    n = x.shape[-2]
    if n < window_length:
        window_length = n if n % 2 == 1 else n - 1
        polyorder = min(polyorder, max(window_length - 1, 0))
        if window_length < 3:
            return x
    m = jnp.asarray(savgol_matrix(n, window_length, polyorder))
    return jnp.einsum("ts,...sc->...tc", m, x)


def smooth_motion_savgol(motion: jnp.ndarray) -> jnp.ndarray:
    """Reference motion smoothing (inference.py:89-95), fully on-device.

    window 5 / polyorder 2 on all 106 dims; window 9 / polyorder 3 recomputed
    from the *raw* motion on the global-rotation dims 100:103.
    """
    smoothed = savgol_smooth(motion, 5, 2)
    rot = savgol_smooth(motion[..., 100:103], 9, 3)
    return jnp.concatenate([smoothed[..., :100], rot, smoothed[..., 103:]], axis=-1)
