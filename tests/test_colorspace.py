"""On-device RGB->YUV420: parity vs the native/host converter + writer path."""

import numpy as np

import jax.numpy as jnp

from artalk_tpu.ops.colorspace import rgb_to_yuv420p
from artalk_tpu.runtime import media
from artalk_tpu.utils.video import yuv420p_to_rgb


def _frames_u8(rng, t=2, h=32, w=48):
    return rng.integers(0, 256, (t, h, w, 3)).astype(np.uint8)


def test_matches_host_converter(rng):
    """Device op == runtime.media.rgb_to_yuv420 (C++/NumPy) byte for byte."""
    u8 = _frames_u8(rng)
    t, h, w, _ = u8.shape
    # feed floats that quantize exactly to u8 (centered in the bucket, so
    # f32 rounding can't cross an integer boundary)
    x = jnp.asarray((u8.astype(np.float32) + 0.5) / 255.0)
    got = np.asarray(rgb_to_yuv420p(x, channel_axis=-1))
    assert got.shape == (t, h * 3 // 2, w) and got.dtype == np.uint8
    y, u, v = media.rgb_to_yuv420(u8)
    want = np.concatenate([
        y.reshape(t, h, w),
        u.reshape(t, h // 4, w),
        v.reshape(t, h // 4, w),
    ], axis=1)
    np.testing.assert_array_equal(got, want)


def test_channel_first_layout(rng):
    u8 = _frames_u8(rng, t=1)
    x = (u8.astype(np.float32) + 0.5) / 255.0
    a = np.asarray(rgb_to_yuv420p(jnp.asarray(x), channel_axis=-1))
    b = np.asarray(rgb_to_yuv420p(jnp.asarray(x.transpose(0, 3, 1, 2)),
                                  channel_axis=1))
    np.testing.assert_array_equal(a, b)


def test_roundtrip_on_chroma_constant_blocks(rng):
    """YUV->RGB inverse recovers the input up to rounding when the chroma
    subsampling is lossless (2x2-constant color blocks)."""
    small = rng.integers(16, 240, (2, 16, 24, 3)).astype(np.uint8)
    u8 = np.repeat(np.repeat(small, 2, axis=1), 2, axis=2)
    x = jnp.asarray((u8.astype(np.float32) + 0.5) / 255.0)
    yuv = np.asarray(rgb_to_yuv420p(x, channel_axis=-1))
    back = yuv420p_to_rgb(yuv)
    assert np.abs(back.astype(int) - u8.astype(int)).max() <= 3


def test_write_video_yuv_matches_rgb_y4m(rng, tmp_path):
    """write_video(pix_fmt='yuv420') produces the same Y4M bytes as the
    host-side RGB->Y4M conversion of the same frames."""
    from artalk_tpu.utils.video import _write_y4m_wav

    u8 = _frames_u8(rng, t=3, h=32, w=32)
    x = jnp.asarray((u8.astype(np.float32) + 0.5) / 255.0)
    yuv = np.asarray(rgb_to_yuv420p(x, channel_axis=-1))

    p_rgb = _write_y4m_wav(u8, str(tmp_path / "a.mp4"), 25.0, None, 16000)
    p_yuv = _write_y4m_wav(yuv, str(tmp_path / "b.mp4"), 25.0, None, 16000,
                           pix_fmt="yuv420")
    a = open(p_rgb, "rb").read()
    b = open(p_yuv, "rb").read()
    assert a == b
