"""Exact 1-D resampling as constant matrices (MXU-friendly).

The reference resamples sequences with ``F.interpolate(mode='area')`` (adaptive
average pooling) and ``mode='linear'`` (align_corners=False) at fixed sizes
(reference: app/modules/bitwise_vae.py:232-234,274-304 and app/models.py:94).
On TPU, data-dependent gather/pool patterns are slow and unfusable; since every
(in_size, out_size) pair in this workload is a static constant, each resize is
expressed as a single constant matrix multiply: ``y[..., o, c] = M[o, i] @ x[..., i, c]``.
This is bit-equivalent to the PyTorch semantics (verified in
tests/test_resample1d.py) and maps directly onto the MXU.

Matrices are built once in NumPy float64, rounded to float32, and cached.
"""

from __future__ import annotations

import functools

import jax

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def area_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Matrix M (out_size, in_size) equivalent to F.interpolate(mode='area').

    PyTorch 'area' downsampling equals adaptive average pooling: output j
    averages input bins [floor(j*i/o), ceil((j+1)*i/o)).
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for j in range(out_size):
        start = int(np.floor(j * in_size / out_size))
        end = int(np.ceil((j + 1) * in_size / out_size))
        m[j, start:end] = 1.0 / (end - start)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def linear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Matrix M (out_size, in_size) equivalent to F.interpolate(mode='linear').

    align_corners=False semantics: output j samples the input at continuous
    position (j + 0.5) * in/out - 0.5, linearly interpolating between the two
    neighboring samples with edge clamping.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for j in range(out_size):
        pos = (j + 0.5) * scale - 0.5
        pos = min(max(pos, 0.0), in_size - 1.0)
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        w_hi = pos - lo
        m[j, lo] += 1.0 - w_hi
        m[j, hi] += w_hi
    return m.astype(np.float32)


# These matmuls sit on the bit-decision path (BSQ sign / argmax boundaries);
# TPU default f32 matmul precision (bf16 passes) flips near-zero signs, so pin
# them to full f32 -- they are tiny (<=200x200) and off the critical FLOPs path.
_PRECISION = jax.lax.Precision.HIGHEST


def resize_area(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Area-resize along axis -2 of a (..., T, C) array."""
    in_size = x.shape[-2]
    if in_size == out_size:
        return x
    m = jnp.asarray(area_resize_matrix(in_size, out_size))
    return jnp.einsum("oi,...ic->...oc", m, x, precision=_PRECISION)


def resize_linear(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Linear-resize along axis -2 of a (..., T, C) array."""
    in_size = x.shape[-2]
    if in_size == out_size:
        return x
    m = jnp.asarray(linear_resize_matrix(in_size, out_size))
    return jnp.einsum("oi,...ic->...oc", m, x, precision=_PRECISION)
