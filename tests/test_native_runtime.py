"""Native C++ media kernels vs NumPy/scipy references."""

import os

import numpy as np
import pytest

from artalk_tpu.runtime import media


@pytest.fixture(scope="module")
def native():
    if not media.native_available():
        pytest.skip("no C++ toolchain available")
    return media


def test_rgb_to_yuv420_matches_numpy(native, rng):
    frames = rng.integers(0, 256, (3, 32, 64, 3)).astype(np.uint8)
    y, u, v = native.rgb_to_yuv420(frames)
    yn, un, vn = media._rgb_to_yuv420_numpy(frames)
    assert y.shape == (3, 32, 64) and u.shape == (3, 16, 32)
    # +-1 quantization differences allowed between float paths
    assert np.abs(y.astype(int) - yn.astype(int)).max() <= 1
    assert np.abs(u.astype(int) - un.astype(int)).max() <= 1
    assert np.abs(v.astype(int) - vn.astype(int)).max() <= 1


def test_write_y4m_roundtrip(native, rng, tmp_path):
    frames = rng.integers(0, 256, (2, 16, 32, 3)).astype(np.uint8)
    path = str(tmp_path / "clip.y4m")
    out = native.write_y4m(path, frames, fps=25.0)
    assert os.path.exists(out)
    with open(out, "rb") as f:
        header = f.readline().decode()
        assert header.startswith("YUV4MPEG2 W32 H16 F25:1")
        body = f.read()
    frame_bytes = 16 * 32 + 2 * (8 * 16)
    assert body.count(b"FRAME\n") == 2
    assert len(body) == 2 * (6 + frame_bytes)


def test_resample_poly_matches_scipy(native, rng):
    from scipy.signal import resample_poly as sp

    audio = rng.standard_normal(48000).astype(np.float32)
    got = native.resample_poly(audio, 1, 3)          # 48k -> 16k
    ref = sp(audio, 1, 3).astype(np.float32)
    assert abs(len(got) - len(ref)) <= 1
    n = min(len(got), len(ref))
    # same filter family (kaiser 5.0, 10 taps/phase); allow small numeric slack
    err = np.abs(got[:n] - ref[:n])
    assert np.percentile(err, 99) < 5e-3, np.percentile(err, 99)


def test_resample_identity(native, rng):
    audio = rng.standard_normal(1000).astype(np.float32)
    out = native.resample_poly(audio, 1, 1)
    np.testing.assert_array_equal(out, audio)


def test_resample_preserves_tone(native):
    """A 440 Hz tone resampled 48k -> 16k keeps its frequency content."""
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = media.resample_poly(tone, 1, 3)
    spec = np.abs(np.fft.rfft(out[2000:-2000]))
    freq = np.fft.rfftfreq(len(out) - 4000, 1.0 / sr_out)
    assert abs(freq[spec.argmax()] - 440.0) < 2.0
