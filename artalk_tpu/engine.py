"""ARTAvatarInferEngine: the top-level speech -> talking-head pipeline.

Public surface mirrors the reference engine (inference.py:18-95):
``ARTAvatarInferEngine(load_gaga, fix_pose, clip_length)``,
``set_style_motion``, ``inference``, ``rendering``, ``smooth_motion_savgol``
-- plus a TPU-first addition: ``stream()`` for chunked low-latency decode with
a persistent donated carry.

TPU execution model:
- one jit-compiled *window step* (audio chunk -> 100 motion frames), scanned
  over windows for offline clips (constant memory in clip length),
- savgol smoothing fused on device (ops/savgol.py) instead of the reference's
  host scipy round-trip (inference.py:89-95),
- geometry + rendering batched over frames with one host transfer per chunk
  instead of per-frame .cpu() (inference.py:70-79).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, load_config
from .models.ar_model import BitwiseARModel, WindowState
from .models.flame import FlameModel
from .models.renderer import MeshRenderer
from .ops.savgol import smooth_motion_savgol
from .utils.assets import load_or_synthesize_flame
from .utils.checkpoint import load_params
from .utils.metrics import GLOBAL_METRICS
from .utils.video import write_video


def _resolve_ar_precision(config: ModelConfig) -> ModelConfig:
    """Apply the ARTALK_AR_PRECISION env knob ("exact" default / "fast" /
    "int8" = fast + weight-only int8 fused kernels).

    "fast" opts the motion path into bfloat16 (audio encoder + AR blocks,
    config.bf16_audio/bf16_ar). Default stays "exact": unlike the GAGA frame
    (where the 8-bit video floor hides bf16 rounding) the AR decode emits
    discrete code bits, so fast mode CHANGES outputs.
    """
    ar_prec = os.environ.get("ARTALK_AR_PRECISION", "exact")
    if ar_prec not in ("exact", "fast", "int8"):
        raise ValueError(
            f"ARTALK_AR_PRECISION={ar_prec!r}: expected 'exact', 'fast' "
            "or 'int8'")
    if ar_prec in ("fast", "int8"):
        config = dataclasses.replace(config, bf16_audio=True, bf16_ar=True)
    if ar_prec == "int8":
        # weight-only int8 fused kernels (requires the fused path; the XLA
        # fallback stays bf16 -- see config.int8_ar)
        config = dataclasses.replace(config, int8_ar=True, fused_ar=True)
    if os.environ.get("ARTALK_AR_FUSED", "0") not in ("0", ""):
        # fused weight-streaming Pallas decode (ops/ar_block_stack.py);
        # orthogonal to the precision knob, pairs best with "fast"
        config = dataclasses.replace(config, fused_ar=True)
    return config


class ARTAvatarInferEngine:
    def __init__(self, load_gaga: bool = False, fix_pose: bool = False,
                 clip_length: int = 750, assets_dir: str = "assets",
                 output_dir: Optional[str] = None,
                 config: Optional[ModelConfig] = None,
                 params=None, image_size: int = 512, seed: int = 0,
                 interpret: bool = False):
        self.fix_pose = fix_pose
        self.clip_length = clip_length
        self.assets_dir = assets_dir

        if config is None:
            cfg_path = os.path.join(assets_dir, "config.json")
            config = load_config(cfg_path) if os.path.exists(cfg_path) else ModelConfig()
        config = _resolve_ar_precision(config)
        self.cfg = config
        self.model = BitwiseARModel(config)

        if params is None:
            ckpt_path = os.path.join(assets_dir, "artalk_params.npz")
            if os.path.exists(ckpt_path):
                template = jax.eval_shape(self.model.init, jax.random.PRNGKey(0))
                params = load_params(ckpt_path, like=template)
            else:
                print(f"[artalk_tpu] no checkpoint at {ckpt_path}; "
                      "initializing random weights")
                params = self.model.init(jax.random.PRNGKey(seed))
        if config.fused_ar and "fused_pack" not in params:
            # pack the tile-stream weights once (not per jitted window step)
            params = dict(params,
                          fused_pack=self.model.pack_fused_decode(params))
        if config.fused_ar and "fused_audio_pack" not in params:
            audio_pack = self.model.pack_fused_audio(params)
            if audio_pack is not None:
                params = dict(params, fused_audio_pack=audio_pack)
        self.params = jax.device_put(params)

        flame_data = load_or_synthesize_flame(assets_dir)
        self.flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=1.0)
        self.mesh_renderer = MeshRenderer(
            image_size=image_size, faces=flame_data["faces"], scale=1.0,
            interpret=interpret, template_verts=flame_data["v_template"])

        self.output_dir = output_dir or "render_results/ARTAvatar_tpu"
        os.makedirs(self.output_dir, exist_ok=True)
        self.style_motion: Optional[jnp.ndarray] = None

        if load_gaga:
            from .models.gagavatar import GAGAvatar

            self.gagavatar = GAGAvatar(assets_dir=assets_dir)
            self.gagavatar_flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=5.0)

        # jitted entry points (window count / length static per compile, cached)
        self._generate = jax.jit(self.model.generate)
        self._window_step = jax.jit(self.model.window_step, donate_argnums=(1,))
        self._encode_style = jax.jit(self.model.encode_style)

    # ------------------------------------------------------------------ style

    def set_style_motion(self, style_motion: Union[str, np.ndarray]) -> None:
        """Set the 50-frame (2 s) style clip; accepts an id under
        assets/style_motion/ or an array (reference: inference.py:41-45)."""
        if isinstance(style_motion, str):
            base = os.path.join(self.assets_dir, "style_motion", style_motion)
            if os.path.exists(base + ".npy"):
                style_motion = np.load(base + ".npy")
            elif os.path.exists(base + ".pt"):
                import torch

                style_motion = torch.load(base + ".pt", map_location="cpu",
                                          weights_only=True).numpy()
            else:
                raise FileNotFoundError(f"no style motion {base}.npy / .pt")
        style_motion = np.asarray(style_motion, np.float32)
        assert style_motion.shape == (50, 106), \
            f"Invalid style_motion shape: {style_motion.shape}."
        self.style_motion = jnp.asarray(style_motion)[None]

    def _style_cond(self) -> jnp.ndarray:
        return self._encode_style(self.params, self.style_motion)

    # -------------------------------------------------------------- inference

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _postprocess(self, motions: jnp.ndarray, fix_pose: bool) -> jnp.ndarray:
        """On-device smoothing + dim zeroing (reference: inference.py:52-56)."""
        smoothed = smooth_motion_savgol(motions)
        if fix_pose:
            smoothed = smoothed.at[..., 100:103].set(0.0)
        return smoothed.at[..., 104:].set(0.0)

    def inference(self, audio: np.ndarray, clip_length: Optional[int] = None
                  ) -> np.ndarray:
        """16 kHz mono audio -> (T, 106) smoothed motion, T = ceil(len/640)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        cfg = self.cfg
        seq_length = math.ceil(len(audio) / cfg.sample_rate * cfg.fps)
        window = cfg.vae.window
        ws = self.model.window_samples
        n_windows = max(1, math.ceil(seq_length / window))
        padded = np.zeros(n_windows * ws, np.float32)
        padded[: len(audio)] = audio[: n_windows * ws]
        chunks = jnp.asarray(padded.reshape(n_windows, 1, ws))

        with GLOBAL_METRICS.stage("inference.generate"):
            motions = self._generate(self.params, chunks, self._style_cond())
        GLOBAL_METRICS.count("inference.windows", n_windows)
        GLOBAL_METRICS.count("inference.frames", seq_length)
        with GLOBAL_METRICS.stage("inference.postprocess"):
            motions = motions[:, :seq_length]
            motions = self._postprocess(motions, self.fix_pose)
        clip_length = clip_length if clip_length is not None else self.clip_length
        return np.asarray(motions[0])[:clip_length]

    def stream(self, audio_chunks: Iterator[np.ndarray],
               state: Optional[WindowState] = None) -> Iterator[np.ndarray]:
        """Streaming decode: yields (window, 106) raw motion per 4 s chunk.

        The carry (prev codes + attention prefix) is donated across steps, so
        arbitrarily long streams run in constant device memory. Chunks shorter
        than a window are zero-padded (matching the offline padding
        semantics); a chunk longer than one window raises — silently dropping
        the tail would desynchronize audio and motion.

        Mid-stream resume: pass ``state`` from a previous session's
        ``last_stream_state`` (host-transferable pytree) to continue a long
        clip exactly where it stopped.
        """
        ws = self.model.window_samples
        style_cond = self._style_cond()
        self.last_stream_state: Optional[WindowState] = state
        for chunk in audio_chunks:
            chunk = np.asarray(chunk, np.float32).reshape(-1)
            if len(chunk) > ws:
                raise ValueError(
                    f"stream chunk of {len(chunk)} samples exceeds the "
                    f"{ws}-sample (4 s) window; split it across chunks")
            n_valid = len(chunk)
            buf = np.zeros(ws, np.float32)
            buf[:n_valid] = chunk
            if state is None:
                state = self.model.initial_state(self.params, style_cond)
            with GLOBAL_METRICS.stage("stream.window_step"):
                state, motion = self._window_step(
                    self.params, state, jnp.asarray(buf[None]), style_cond)
            self.last_stream_state = state
            n_frames = math.ceil(n_valid / self.cfg.sample_rate * self.cfg.fps)
            yield np.asarray(motion[0])[:n_frames]

    # -------------------------------------------------------------- rendering

    def rendering(self, audio: np.ndarray, pred_motions: np.ndarray,
                  shape_id: str = "mesh", shape_code: Optional[np.ndarray] = None,
                  save_name: str = "ARTAvatar") -> str:
        """Motions -> rendered video with muxed audio; returns output path."""
        pred_motions = jnp.asarray(np.asarray(pred_motions, np.float32))
        t = pred_motions.shape[0]
        GLOBAL_METRICS.count("render.frames", int(t))
        if shape_id == "mesh":
            if shape_code is None:
                shape = jnp.zeros((t, 300), jnp.float32)
            else:
                shape_code = np.asarray(shape_code, np.float32).reshape(1, -1)
                shape = jnp.broadcast_to(jnp.asarray(shape_code), (t, shape_code.shape[1]))
            with GLOBAL_METRICS.stage("render.flame_verts"):
                verts = self._flame_verts(shape, pred_motions)
            with GLOBAL_METRICS.stage("render.rasterize"):
                frames = self.mesh_renderer.render_frames(verts, colorspace="yuv420")
        else:
            if not hasattr(self, "gagavatar"):
                raise RuntimeError(
                    f"shape_id={shape_id!r} requires the GAGAvatar renderer; "
                    "construct ARTAvatarInferEngine(load_gaga=True) or use "
                    "shape_id='mesh'")
            frames = self.gagavatar.render_motion_sequence(
                shape_id, pred_motions, self.gagavatar_flame, colorspace="yuv420")
        audio = np.asarray(audio, np.float32).reshape(-1)
        audio = audio[: int(t / self.cfg.fps * self.cfg.sample_rate)]
        out_path = os.path.join(self.output_dir, f"{save_name}.mp4")
        # frames cross the device link as yuv420p (ops/colorspace.py): half
        # the bytes of RGB, and what the encoder wants anyway
        return write_video(frames, out_path, self.cfg.fps, audio,
                           self.cfg.sample_rate, pix_fmt="yuv420")

    @functools.partial(jax.jit, static_argnums=(0,))
    def _flame_verts(self, shape: jnp.ndarray, motions: jnp.ndarray) -> jnp.ndarray:
        """All-frames FLAME vertices in one batched call (vs the reference's
        per-frame loop, inference.py:70-72)."""
        return self.flame.motion_to_verts(shape, motions, with_global=True)

    # ------------------------------------------------------------------ misc

    @staticmethod
    def smooth_motion_savgol(motion: np.ndarray) -> np.ndarray:
        """Reference-parity smoothing (inference.py:89-95), on device."""
        return np.asarray(smooth_motion_savgol(jnp.asarray(motion)))
