"""Mux-branch coverage for utils/video.py.

This image ships neither PyAV nor ffmpeg, so CI normally exercises only the
Y4M/npz fallbacks. These tests close the gap:

- `_write_ffmpeg` runs against a FAKE ffmpeg planted on PATH that records its
  argv and stdin, pinning the CLI/pipe protocol (codec flags, geometry,
  rawvideo byte count, color-range signalling, temp-file cleanup, failure
  propagation) without needing the real binary.
- `_write_av` and the PyAV readers run under ``pytest.importorskip("av")`` so
  any environment that does have PyAV executes them (here they skip).

Reference behavior being pinned: app/utils_videos.py:16-59 (H.264 crf 18 +
AAC mux).
"""

import os
import stat

import numpy as np
import pytest

from artalk_tpu.utils import video


FAKE_FFMPEG = """#!/bin/sh
log="$FAKE_FFMPEG_DIR/argv.txt"
: > "$log"
for a in "$@"; do printf '%s\\n' "$a" >> "$log"; done
cat - > "$FAKE_FFMPEG_DIR/stdin.bin"
exit ${FAKE_FFMPEG_RC:-0}
"""


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(FAKE_FFMPEG)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ.get('PATH', '')}")
    monkeypatch.setenv("FAKE_FFMPEG_DIR", str(tmp_path))
    monkeypatch.setattr(video, "_have_av", lambda: False)
    return tmp_path


def _argv(tmp_path):
    return (tmp_path / "argv.txt").read_text().splitlines()


def test_ffmpeg_branch_rgb_with_audio(fake_ffmpeg, tmp_path, rng):
    frames = (rng.random((3, 16, 24, 3)) * 255).astype(np.uint8)
    audio = rng.standard_normal(1000).astype(np.float32)
    out = str(tmp_path / "out.mp4")
    got = video.write_video(frames, out, fps=25.0, audio=audio,
                            sample_rate=16000)
    assert got == out
    argv = _argv(fake_ffmpeg)
    # rawvideo pipe geometry
    assert argv[argv.index("-f") + 1] == "rawvideo"
    assert argv[argv.index("-pix_fmt") + 1] == "rgb24"
    assert argv[argv.index("-s") + 1] == "24x16"
    assert argv[argv.index("-r") + 1] == "25.0"
    # audio leg: f32le mono pcm temp file + aac + shortest
    assert "f32le" in argv and "aac" in argv and "-shortest" in argv
    assert argv[argv.index("-ar") + 1] == "16000"
    assert argv[argv.index("-ac") + 1] == "1"
    # video codec settings (reference: utils_videos.py crf 18 h264 yuv420p)
    assert argv[argv.index("-c:v") + 1] == "libx264"
    assert argv[argv.index("-crf") + 1] == "18"
    assert argv[-1] == out
    # the rawvideo pipe carried exactly the frame bytes
    stdin = (fake_ffmpeg / "stdin.bin").read_bytes()
    assert len(stdin) == frames.nbytes
    assert stdin == frames.tobytes()
    # pcm temp file was cleaned up
    assert not os.path.exists(out + ".pcm")


def test_ffmpeg_branch_yuv420_planar(fake_ffmpeg, tmp_path, rng):
    h, w = 16, 24
    frames = (rng.random((2, h * 3 // 2, w)) * 255).astype(np.uint8)
    out = str(tmp_path / "out.mp4")
    video.write_video(frames, out, fps=30.0, pix_fmt="yuv420")
    argv = _argv(fake_ffmpeg)
    assert argv[argv.index("-pix_fmt") + 1] == "yuv420p"
    assert argv[argv.index("-s") + 1] == f"{w}x{h}"  # true height, not 3/2
    # device planes are full-range BT.601: must be declared on both legs
    assert argv.count("-color_range") == 2
    assert argv[argv.index("-color_range") + 1] == "pc"
    stdin = (fake_ffmpeg / "stdin.bin").read_bytes()
    assert len(stdin) == frames.nbytes


def test_ffmpeg_failure_raises(fake_ffmpeg, tmp_path, monkeypatch, rng):
    monkeypatch.setenv("FAKE_FFMPEG_RC", "3")
    frames = (rng.random((2, 8, 8, 3)) * 255).astype(np.uint8)
    with pytest.raises(RuntimeError, match="ffmpeg failed"):
        video._write_ffmpeg(frames, str(tmp_path / "o.mp4"), 25.0, None, 16000)


def test_ffmpeg_failure_still_removes_pcm(fake_ffmpeg, tmp_path, monkeypatch, rng):
    monkeypatch.setenv("FAKE_FFMPEG_RC", "1")
    frames = (rng.random((2, 8, 8, 3)) * 255).astype(np.uint8)
    audio = np.zeros(100, np.float32)
    out = str(tmp_path / "o.mp4")
    with pytest.raises(RuntimeError):
        video._write_ffmpeg(frames, out, 25.0, audio, 16000)
    assert not os.path.exists(out + ".pcm")


# ---------------------------------------------------------------------------
# PyAV branch: executes wherever av is installed; skips in this image
# ---------------------------------------------------------------------------


def test_av_write_and_read_roundtrip(tmp_path, rng):
    pytest.importorskip("av")
    frames = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    audio = (0.1 * np.sin(np.linspace(0, 440, 16000))).astype(np.float32)
    out = str(tmp_path / "clip.mp4")
    video._write_av(frames, out, 25.0, audio, 16000, "aac")
    assert os.path.getsize(out) > 0
    info = video.get_video_info(out)
    assert info["video"]["width"] == 32 and info["video"]["height"] == 32
    back, fps = video.read_all_video_frames(out)
    assert back.shape[1:] == (32, 32, 3) and abs(fps - 25.0) < 1e-6
    samples, sr = video.read_audio_samples(out)
    assert sr == 16000 and samples.ndim == 1


def test_av_write_yuv420_planar(tmp_path, rng):
    pytest.importorskip("av")
    h, w = 32, 32
    frames = (rng.random((3, h * 3 // 2, w)) * 255).astype(np.uint8)
    out = str(tmp_path / "clip_yuv.mp4")
    video._write_av(frames, out, 25.0, None, 16000, "aac", pix_fmt="yuv420")
    info = video.get_video_info(out)
    assert info["video"]["height"] == h
