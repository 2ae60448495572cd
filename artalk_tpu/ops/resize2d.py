"""2-D bilinear resizing as separable constant matrices.

The GAGAvatar stack uses three resize flavors (all static sizes):
- ``F.interpolate(mode='bilinear', align_corners=False)`` (StyleGAN/UNet up/down)
- ``F.interpolate(mode='bilinear', align_corners=True)`` (DPT fusion blocks)
- antialiased torchvision resize (image preprocessing; approximated with
  jax.image.resize antialias)

The first two are exact separable matrix multiplies: out = My @ img @ Mx^T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resample1d import linear_resize_matrix


@functools.lru_cache(maxsize=None)
def linear_resize_matrix_align(in_size: int, out_size: int) -> np.ndarray:
    """1-D linear interpolation matrix with align_corners=True semantics."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        m[0, 0] = 1.0
        return m.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    for j in range(out_size):
        pos = j * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        w = pos - lo
        m[j, lo] += 1.0 - w
        m[j, hi] += w
    return m.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """(..., C, H, W) -> (..., C, out_h, out_w), torch bilinear semantics."""
    h, w = x.shape[-2], x.shape[-1]
    if h == out_h and w == out_w:
        return x
    build = linear_resize_matrix_align if align_corners else linear_resize_matrix
    my = jnp.asarray(build(h, out_h))
    mx = jnp.asarray(build(w, out_w))
    x = jnp.einsum("oh,...hw->...ow", my, x)
    return jnp.einsum("pw,...ow->...op", mx, x)


def resize_bilinear_nhwc(x: jnp.ndarray, out_h: int, out_w: int,
                         align_corners: bool = False) -> jnp.ndarray:
    """(B, H, W, C) -> (B, out_h, out_w, C); same matrices as
    ``resize_bilinear`` applied to the NHWC layout without transposes."""
    h, w = x.shape[1], x.shape[2]
    if h == out_h and w == out_w:
        return x
    build = linear_resize_matrix_align if align_corners else linear_resize_matrix
    my = jnp.asarray(build(h, out_h))
    mx = jnp.asarray(build(w, out_w))
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("pw,bowc->bopc", mx, x)


def resize_antialias(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Antialiased bilinear resize (torchvision-resize-like) via jax.image."""
    shape = x.shape[:-2] + (out_h, out_w)
    return jax.image.resize(x, shape, method="bilinear", antialias=True)
