"""Watermark overlay: blend math vs numpy oracle + asset loading paths.

Reference behavior: app/GAGAvatar/models.py:37-47 (load + resize to 82x256),
:95 (unconditional apply), :131-138 (0.8-strength alpha blend, bottom-right).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.models.gagavatar.watermark import (
    WATERMARK_SIZE, apply_watermark, load_watermark)


def test_apply_watermark_matches_numpy(rng):
    mark = rng.random((4, 4, 8)).astype(np.float32)
    image = rng.random((2, 3, 16, 16)).astype(np.float32)
    got = np.asarray(apply_watermark(jnp.asarray(image), jnp.asarray(mark)))

    ref = image.copy()
    alpha = mark[3:4] * 0.8
    patch = ref[..., -4:, -8:]
    ref[..., -4:, -8:] = patch * (1 - alpha) + mark[:3] * alpha
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # pixels outside the corner untouched
    np.testing.assert_array_equal(got[..., :12, :], image[..., :12, :])
    np.testing.assert_array_equal(got[..., :, :8], image[..., :, :8])


def test_apply_watermark_none_is_noop(rng):
    image = jnp.asarray(rng.random((1, 3, 8, 8)).astype(np.float32))
    assert apply_watermark(image, None) is image


def test_apply_watermark_opaque_overwrites():
    mark = np.zeros((4, 2, 2), np.float32)
    mark[3] = 1.0  # fully opaque -> 0.8 blend weight
    mark[0] = 1.0  # red
    image = jnp.zeros((1, 3, 4, 4), jnp.float32)
    out = np.asarray(apply_watermark(image, jnp.asarray(mark)))
    np.testing.assert_allclose(out[0, 0, -2:, -2:], 0.8, atol=1e-6)
    np.testing.assert_allclose(out[0, 1, -2:, -2:], 0.0, atol=1e-6)


def test_load_watermark_absent_returns_none(tmp_path):
    assert load_watermark(str(tmp_path)) is None


def test_load_watermark_png(tmp_path, rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path / "GAGAvatar"
    d.mkdir()
    arr = (rng.random((41, 128, 4)) * 255).astype(np.uint8)
    Image.fromarray(arr, "RGBA").save(d / "gagavatar_logo.png")
    mark = load_watermark(str(tmp_path))
    assert mark.shape == (4,) + WATERMARK_SIZE
    m = np.asarray(mark)
    assert m.min() >= 0.0 and m.max() <= 1.0


def test_load_watermark_npz(tmp_path, rng):
    rgba = rng.random((4, 30, 100)).astype(np.float32)
    np.savez(tmp_path / "gagavatar_logo.npz", rgba=rgba)
    mark = load_watermark(str(tmp_path))
    assert mark.shape == (4,) + WATERMARK_SIZE
    assert np.isfinite(np.asarray(mark)).all()


def test_apply_watermark_frame_smaller_than_logo(rng):
    """Frames smaller than the 82x256 logo blend its bottom-right crop
    instead of crashing on a broadcast mismatch (e.g. reduced-size SR)."""
    import jax.numpy as jnp
    from artalk_tpu.models.gagavatar.watermark import apply_watermark

    mark = jnp.asarray(rng.random((4, 82, 256)).astype(np.float32))
    img = jnp.asarray(rng.random((1, 3, 64, 64)).astype(np.float32))
    out = np.asarray(apply_watermark(img, mark))
    assert out.shape == (1, 3, 64, 64)
    crop_rgb = np.asarray(mark)[:3, -64:, -64:]
    alpha = np.asarray(mark)[3:4, -64:, -64:] * 0.8
    want = np.asarray(img) * (1 - alpha) + crop_rgb * alpha
    np.testing.assert_allclose(out, want, atol=1e-6)
