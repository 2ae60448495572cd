"""Host-side video muxing (port of the reference's PyAV writer, gated).

The reference muxes H.264 (yuv420p, crf 18) + AAC via PyAV
(app/utils_videos.py:8-59). Video encode is inherently a host/C concern, so it
stays host-side here too, behind one function with graceful degradation:

1. PyAV (if installed) -- H.264 + AAC, same settings as the reference.
2. ffmpeg CLI (if on PATH) -- same codecs via a rawvideo pipe.
3. Native C++ Y4M writer (artalk_tpu.runtime) -- codec-free YUV4MPEG2 playable
   by mpv/ffplay/VLC, audio as a sibling .wav.
4. Fallback: .npz of frames + audio (lossless, always available).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


def _have_av() -> bool:
    try:
        import av  # noqa: F401
        return True
    except ImportError:
        return False


def write_video(frames: np.ndarray, path: str, fps: float = 25.0,
                audio: Optional[np.ndarray] = None, sample_rate: int = 16000,
                acodec: str = "aac", pix_fmt: str = "rgb24") -> str:
    """frames: (T, H, W, 3) uint8 RGB, or -- with ``pix_fmt="yuv420"`` --
    (T, H * 3 // 2, W) uint8 planar yuv420p straight off the device
    (ops/colorspace.py), which every backend here consumes natively.
    Returns the path actually written."""
    frames = np.ascontiguousarray(frames)
    if pix_fmt == "yuv420":
        assert frames.ndim == 3 and frames.dtype == np.uint8, frames.shape
    else:
        assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
        if frames.dtype != np.uint8:
            frames = np.clip(frames, 0, 255).astype(np.uint8)
    if _have_av():
        _write_av(frames, path, fps, audio, sample_rate, acodec, pix_fmt)
        return path
    if shutil.which("ffmpeg"):
        _write_ffmpeg(frames, path, fps, audio, sample_rate, pix_fmt)
        return path
    try:
        return _write_y4m_wav(frames, path, fps, audio, sample_rate, pix_fmt)
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"[artalk_tpu] y4m writer unavailable ({e}); falling back to npz")
    alt = os.path.splitext(path)[0] + ".npz"
    np.savez_compressed(alt, frames=frames, fps=fps,
                        audio=audio if audio is not None else np.zeros(0, np.float32),
                        sample_rate=sample_rate, pix_fmt=pix_fmt)
    return alt


def _write_av(frames, path, fps, audio, sample_rate, acodec, pix_fmt="rgb24"):
    import av

    yuv = pix_fmt == "yuv420"
    height = frames.shape[1] * 2 // 3 if yuv else frames.shape[1]
    container = av.open(path, mode="w")
    stream = container.add_stream("h264", rate=fps)
    stream.width = frames.shape[2]
    stream.height = height
    stream.pix_fmt = "yuv420p"
    stream.options = {"crf": "18"}
    if yuv:
        # device planes are BT.601 FULL range (ops/colorspace.py); signal it
        # so decoders don't expand 0-255 as if it were limited/tv range
        try:
            stream.codec_context.color_range = 2  # AVCOL_RANGE_JPEG
        except (AttributeError, ValueError):  # pragma: no cover - PyAV version
            pass
    audio_stream = None
    if audio is not None:
        audio_stream = container.add_stream(acodec if acodec == "aac" else "mp3",
                                            rate=sample_rate)
        audio_stream.format = "fltp"
    for frame in frames:
        vf = av.VideoFrame.from_ndarray(frame, format="yuv420p" if yuv else "rgb24")
        for packet in stream.encode(vf):
            container.mux(packet)
    if audio is not None:
        audio = np.asarray(audio, np.float32)
        spf = int(sample_rate // fps)
        for i in range(0, len(audio), spf):
            chunk = audio[i : i + spf]
            if len(chunk) < spf:
                chunk = np.pad(chunk, (0, spf - len(chunk)))
            af = av.AudioFrame.from_ndarray(chunk[None], format="fltp", layout="mono")
            af.rate = sample_rate
            for packet in audio_stream.encode(af):
                container.mux(packet)
    for packet in stream.encode():
        container.mux(packet)
    if audio is not None:
        for packet in audio_stream.encode():
            container.mux(packet)
    container.close()


def _write_ffmpeg(frames, path, fps, audio, sample_rate, pix_fmt="rgb24"):
    if pix_fmt == "yuv420":
        t, h32, w = frames.shape
        h, in_fmt = h32 * 2 // 3, "yuv420p"
    else:
        t, h, w, _ = frames.shape
        in_fmt = "rgb24"
    audio_args = []
    audio_file = None
    if audio is not None:
        audio_file = path + ".pcm"
        np.asarray(audio, np.float32).tofile(audio_file)
        audio_args = ["-f", "f32le", "-ar", str(sample_rate), "-ac", "1",
                      "-i", audio_file, "-c:a", "aac", "-shortest"]
    # device yuv planes are BT.601 FULL range (ops/colorspace.py): declare the
    # input range and keep it on output so players don't mis-expand levels
    range_in = ["-color_range", "pc"] if pix_fmt == "yuv420" else []
    range_out = ["-color_range", "pc"] if pix_fmt == "yuv420" else []
    cmd = [
        "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", in_fmt, *range_in,
        "-s", f"{w}x{h}", "-r", str(fps), "-i", "-", *audio_args,
        "-c:v", "libx264", "-pix_fmt", "yuv420p", *range_out, "-crf", "18",
        path,
    ]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    proc.communicate(frames.tobytes())
    if audio_file and os.path.exists(audio_file):
        os.remove(audio_file)
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed with code {proc.returncode}")


def _write_y4m_wav(frames, path, fps, audio, sample_rate, pix_fmt="rgb24") -> str:
    """Native Y4M video + sibling .wav audio (no codecs required)."""
    import wave

    from ..runtime import media

    out = os.path.splitext(path)[0] + ".y4m"
    if pix_fmt == "yuv420":
        # device-converted planes: stream straight to disk, no host conversion
        media.write_y4m_planar(out, frames, fps=fps)
    else:
        media.write_y4m(out, frames, fps=fps)
    if audio is not None:
        wav_path = os.path.splitext(path)[0] + ".wav"
        pcm = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
        with wave.open(wav_path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sample_rate)
            f.writeframes((pcm * 32767.0).astype(np.int16).tobytes())
    return out


def yuv420p_to_rgb(frames: np.ndarray) -> np.ndarray:
    """(T, H * 3 // 2, W) uint8 planar yuv420p -> (T, H, W, 3) uint8 RGB
    (inverse of ops/colorspace.py's BT.601 full-range transform)."""
    t, h32, w = frames.shape
    h = h32 * 2 // 3
    y = frames[:, :h].astype(np.float32)
    u = frames[:, h:h + h // 4].reshape(t, h // 2, w // 2).astype(np.float32) - 128.0
    v = frames[:, h + h // 4:].reshape(t, h // 2, w // 2).astype(np.float32) - 128.0
    u = np.repeat(np.repeat(u, 2, axis=1), 2, axis=2)
    v = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def read_video_npz(path: str):
    """Read the fallback .npz container (frames always returned as RGB)."""
    with np.load(path) as z:
        frames = z["frames"]
        if "pix_fmt" in z.files and str(z["pix_fmt"]) == "yuv420":
            frames = yuv420p_to_rgb(frames)
        return frames, float(z["fps"]), z["audio"], int(z["sample_rate"])


# ---------------------------------------------------------------------------
# Readers (ports of app/utils_videos.py:62-128, gated on PyAV)
# ---------------------------------------------------------------------------


def _require_av():
    try:
        import av
        return av
    except ImportError as e:
        raise RuntimeError("video reading requires PyAV (not installed)") from e


def read_video_frames(video_path: str):
    """Yield (H, W, 3) uint8 RGB frames."""
    av = _require_av()
    container = av.open(video_path)
    for frame in container.decode(video=0):
        yield frame.to_ndarray(format="rgb24")


def get_video_info(video_path: str) -> dict:
    av = _require_av()
    info = {}
    container = av.open(video_path)
    vs = next((s for s in container.streams if s.type == "video"), None)
    info["video"] = None if vs is None else {
        "width": vs.width, "height": vs.height,
        "frame_rate": float(vs.average_rate), "num_frames": vs.frames,
    }
    astream = next((s for s in container.streams if s.type == "audio"), None)
    info["audio"] = None if astream is None else {
        "channels": astream.channels, "sample_rate": astream.rate,
        "duration": astream.duration,
    }
    return info


def read_all_video_frames(video_path: str):
    """-> (uint8 (T, H, W, 3), fps)."""
    av = _require_av()
    container = av.open(video_path)
    vs = next((s for s in container.streams if s.type == "video"), None)
    if vs is None:
        return np.zeros((0,), np.uint8), 0.0
    frames = [f.to_ndarray(format="rgb24")
              for f in container.decode(video=0) if f.pts is not None]
    return np.stack(frames), float(vs.average_rate)


def read_audio_samples(video_path: str, stereo: bool = False):
    """-> (float32 samples in [-1, 1], sample_rate)."""
    av = _require_av()
    container = av.open(video_path)
    astream = next((s for s in container.streams if s.type == "audio"), None)
    if astream is None:
        return None, None
    chunks = [f.to_ndarray() for f in container.decode(audio=0)]
    audio = np.concatenate(chunks, axis=-1)
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    elif audio.dtype == np.int32:
        audio = audio.astype(np.float32) / 2147483648.0
    if not stereo:
        audio = audio.mean(axis=0)
    return audio, astream.rate
