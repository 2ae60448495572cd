"""GAGAvatar watermark overlay.

Parity with the reference (app/GAGAvatar/models.py:37-47 load + :95 apply +
:131-138 blend): an RGBA logo is resized to 82x256 once at load time and
alpha-blended at 0.8 strength into the bottom-right corner of every rendered
frame. Device-side: the blend is a constant-folded elementwise update inside
the jitted frame step, not a host post-process.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...ops.resize2d import resize_antialias

WATERMARK_SIZE = (82, 256)


def load_watermark(assets_dir: str) -> Optional[jnp.ndarray]:
    """RGBA (4, 82, 256) f32 in [0, 1], or None when no logo asset exists.

    Accepts the reference asset layout (``GAGAvatar/gagavatar_logo.png``,
    models.py:37) or a converted ``gagavatar_logo.npz`` holding an ``rgba``
    (4, H, W) float array.
    """
    png = os.path.join(assets_dir, "GAGAvatar", "gagavatar_logo.png")
    npz = os.path.join(assets_dir, "gagavatar_logo.npz")
    if os.path.exists(png):
        from PIL import Image

        img = Image.open(png).convert("RGBA")
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
    elif os.path.exists(npz):
        with np.load(npz) as z:
            arr = np.asarray(z["rgba"], np.float32)
        assert arr.ndim == 3 and arr.shape[0] == 4, f"bad rgba shape {arr.shape}"
    else:
        return None
    return resize_antialias(jnp.asarray(arr), *WATERMARK_SIZE)


def apply_watermark(image: jnp.ndarray, mark: Optional[jnp.ndarray]
                    ) -> jnp.ndarray:
    """Alpha-blend ``mark`` (4, h, w) into the bottom-right corner of
    (..., 3, H, W) frames at 0.8 strength (models.py:131-138). No-op when
    ``mark`` is None (logo asset absent)."""
    if mark is None:
        return image
    # frames smaller than the logo keep only its bottom-right crop (the
    # image[..., -h:, -w:] slice clamps to the frame, so the mark must be
    # cropped identically or the blend broadcast fails)
    h = min(mark.shape[-2], image.shape[-2])
    w = min(mark.shape[-1], image.shape[-1])
    mark = mark[..., -h:, -w:]
    rgb = mark[:3]
    alpha = mark[3:4] * 0.8
    patch = image[..., -h:, -w:]
    blended = patch * (1.0 - alpha) + rgb * alpha
    return image.at[..., -h:, -w:].set(blended)
