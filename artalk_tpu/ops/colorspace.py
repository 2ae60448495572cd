"""On-device colorspace conversion: BT.601 full-range RGB -> planar YUV 4:2:0.

Rendered frames leave the chip as yuv420p rather than RGB -- half the bytes
across the host link and zero host-side conversion work (the reference ships
full RGB per frame, inference.py:70-79, and converts inside FFmpeg). The math
mirrors the native host converter (runtime/native/media.cpp:rgb_to_yuv420):
uint8 quantization first (what the RGB path would have shipped), 2x2 block
mean for chroma, round-half-up with clamp.
"""

from __future__ import annotations

import jax.numpy as jnp


def _quant_u8(v: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 255] then round half up -- media.cpp's (uint8)(x + 0.5f)."""
    return jnp.floor(jnp.clip(v, 0.0, 255.0) + 0.5).astype(jnp.uint8)


def rgb_to_yuv420p(rgb: jnp.ndarray, channel_axis: int = 1) -> jnp.ndarray:
    """float RGB in [0, 1] -> uint8 frames in standard yuv420p plane layout.

    rgb: (T, 3, H, W) when channel_axis is 1 (renderer output), or
    (T, H, W, 3) when -1. Returns (T, H * 3 // 2, W) uint8: rows [0, H) are
    the Y plane, then U then V at quarter resolution (H % 4 == 0 required so
    each chroma plane reshapes to rows of W bytes).
    """
    x = rgb.transpose(0, 2, 3, 1) if channel_axis in (1, -3) else rgb
    t, h, w, _ = x.shape
    assert h % 4 == 0 and w % 2 == 0, (h, w)
    # quantize exactly like the RGB path's clip(x*255).astype(uint8)
    q = jnp.floor(jnp.clip(x * 255.0, 0.0, 255.0))
    r, g, b = q[..., 0], q[..., 1], q[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    blocks = 0.25 * (q[:, 0::2, 0::2] + q[:, 0::2, 1::2]
                     + q[:, 1::2, 0::2] + q[:, 1::2, 1::2])
    rb, gb, bb = blocks[..., 0], blocks[..., 1], blocks[..., 2]
    u = -0.168736 * rb - 0.331264 * gb + 0.5 * bb + 128.0
    v = 0.5 * rb - 0.418688 * gb - 0.081312 * bb + 128.0
    y8 = _quant_u8(y)
    u8 = _quant_u8(u).reshape(t, h // 4, w)
    v8 = _quant_u8(v).reshape(t, h // 4, w)
    return jnp.concatenate([y8, u8, v8], axis=1)
