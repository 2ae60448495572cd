"""Multi-session streaming service: B live audio streams on one chip.

The reference has no serving layer at all (single process, batch=1 asserted at
/root/reference/app/models.py:65). This is the TPU-native way to serve many
concurrent real-time sessions: every active session occupies one row of a
fixed-size batch, and each service tick runs ONE compiled batched
``window_step`` (static shapes, donated carry) that advances all of them
together. Joining or leaving a session never recompiles — it just resets that
session's rows of the batched :class:`WindowState` and style table.

Why batching is the right TPU shape: the window step is dominated by small
matmuls (768-d AR blocks, 512-d VAE) that leave the MXU mostly idle at B=1.
Measured scaling curve on a v5e (tools/bench_streampool.py, pipelined
device timing; exact = round-3 default XLA scan, int8 = round-4
ARTALK_AR_PRECISION=int8 routing the pool through the BATCH-TILED fused
weight-streaming kernel, ops/ar_block_stack.py batch_tile):

            exact (f32 XLA scan)             int8 fused (batch-tiled)
    B=1   14.16 ms/sw    ~282 RT streams     8.58 ms/sw    ~466
    B=2    8.60          ~465                4.10          ~976
    B=4    5.93          ~674                3.48         ~1149
    B=8    4.45          ~899                2.97         ~1348
    B=16   3.97         ~1008                2.79         ~1436
    B=32   3.88         ~1031                2.72         ~1473

(bf16 "fast" at B=8: 4.26 ms/sw -- the serving knee is weight-bandwidth
bound at 2-row batch tiles, so halving streamed bytes again with int8 is
what moves it.) The efficiency knee is B=8-16; every point keeps per-window
latency far inside the 200 ms budget (BASELINE.md) at the 4-second window
cadence. Grow capacity ahead of load with :meth:`StreamPool.grow` (one
recompile per new batch shape).

END-TO-END HTTP tier (tools/bench_http_serving.py, r05: N concurrent
stdlib clients -> server.py's 5 ms tick batcher -> this pool, int8,
capacity 16, saturated back-to-back windows, measured THROUGH the dev
tunnel):

    N=1   chunk p50 174 ms   p90 195    5.7 windows/s   ~23 RT streams
    N=4            223        269      17.7             ~71
    N=8            405        478      20.4             ~82
    N=16           476        561      32.8            ~131

Every p50 sits far inside the 4 s real-time budget, but the CURVE is bound
by this dev tunnel, not the chip: each tick pays ~27 ms of RTT plus the
motion-row fetch at ~10-40 MB/s (16 x 42 KB/window), which is 50-100x the
2.72 ms device step. On a production host (direct PCIe/ICI attach) the
per-tick overhead collapses to the device step + LAN RTT, so the DEVICE
curve above is the binding capacity number; the HTTP measurement certifies
the tier itself adds only the aggregation tick + transport.

Usage::

    pool = StreamPool(model, params, max_sessions=8)
    sid = pool.open_session(style_motion=None)      # join (optional style)
    out = pool.step({sid: audio_chunk_16k})          # one tick, all sessions
    pool.close_session(sid)                          # leave

``step`` accepts any subset of active sessions (absent ones idle that tick —
their carry is untouched) and returns per-session ``(frames, 106)`` motion.
"""

from __future__ import annotations

from typing import Dict, Optional

import math

import jax
import jax.numpy as jnp
import numpy as np

from .models.ar_model import BitwiseARModel, WindowState
from .models import nn


class StreamPool:
    """Fixed-capacity pool of concurrent streaming decode sessions."""

    def __init__(self, model: BitwiseARModel, params: nn.Params,
                 max_sessions: int = 4):
        self.model = model
        cfg = model.cfg
        if cfg.fused_ar and "fused_pack" not in params:
            # pack the tile-stream weights once (not per jitted pool step);
            # the batched window step routes through the batch-tiled fused
            # kernel (ops/ar_block_stack.py batch_tile)
            params = dict(params,
                          fused_pack=model.pack_fused_decode(params))
        if cfg.fused_ar and "fused_audio_pack" not in params:
            audio_pack = model.pack_fused_audio(params)
            if audio_pack is not None:
                params = dict(params, fused_audio_pack=audio_pack)
        self.params = params
        self.capacity = int(max_sessions)

        null = model.encode_style(params, None)              # (1, 1, d)
        self._null_style = null
        # per-slot style rows; row i is a session's conditioning token
        self._styles = jnp.tile(null, (self.capacity, 1, 1))
        # template initial carry for ONE null-style slot (used on reset);
        # per-style carries are rebuilt on open_session
        self._state = model.initial_state(params, self._styles,
                                          batch_size=self.capacity)
        self._free = list(range(self.capacity))[::-1]
        self._active: Dict[int, bool] = {}
        self.window_samples = model.window_samples
        self.fps = cfg.fps
        self.sample_rate = cfg.sample_rate

        # ONE compiled batched step; the carry is donated. Idle-slot masking
        # happens INSIDE the jit (donation invalidates the old state buffers,
        # so the merge cannot read them afterwards on the host side).
        def _masked_step(params, state, audio, styles, mask):
            new_state, motion = model.window_step(params, state, audio, styles)
            m = mask[:, None, None]
            merged = WindowState(
                jnp.where(m, new_state.prev_bits, state.prev_bits),
                jnp.where(m, new_state.prev_attn_feat, state.prev_attn_feat))
            return merged, motion

        self._step = jax.jit(_masked_step, donate_argnums=(1,))

    # ------------------------------------------------------------- lifecycle

    def open_session(self, style_motion: Optional[np.ndarray] = None) -> int:
        """Claim a slot; returns the session id. Raises when full."""
        if not self._free:
            raise RuntimeError(
                f"StreamPool full ({self.capacity} sessions); close one first")
        sid = self._free.pop()
        style = (self._null_style if style_motion is None
                 else self.model.encode_style(
                     self.params, jnp.asarray(style_motion)[None]))
        self._styles = self._styles.at[sid].set(style[0])
        fresh = self.model.initial_state(self.params, style, batch_size=1)
        self._state = WindowState(
            self._state.prev_bits.at[sid].set(fresh.prev_bits[0]),
            self._state.prev_attn_feat.at[sid].set(fresh.prev_attn_feat[0]))
        self._active[sid] = True
        return sid

    def close_session(self, sid: int) -> None:
        if self._active.pop(sid, None) is None:
            raise KeyError(f"unknown session {sid}")
        self._free.append(sid)

    def grow(self, new_capacity: int) -> None:
        """Raise capacity WITHOUT losing live sessions.

        Existing carries/styles keep their slot ids (re-padded into larger
        batched buffers); the new slots join the free list. The batched step
        retraces at the new shape on the next tick -- a one-time compile, so
        grow ahead of load (e.g. at double the expected watermark) rather
        than per joining session. Shrinking is deliberately unsupported:
        closing sessions already frees slots, and compacting ids would
        rename live sessions under the caller."""
        new_capacity = int(new_capacity)
        if new_capacity <= self.capacity:
            raise ValueError(
                f"grow: new capacity {new_capacity} must exceed {self.capacity}")
        extra = new_capacity - self.capacity
        self._styles = jnp.concatenate(
            [self._styles, jnp.tile(self._null_style, (extra, 1, 1))], axis=0)
        fresh = self.model.initial_state(self.params, self._null_style,
                                         batch_size=extra)
        self._state = WindowState(
            jnp.concatenate([self._state.prev_bits, fresh.prev_bits], axis=0),
            jnp.concatenate([self._state.prev_attn_feat,
                             fresh.prev_attn_feat], axis=0))
        self._free = list(range(self.capacity, new_capacity))[::-1] + self._free
        self.capacity = new_capacity

    @property
    def active_sessions(self):
        return sorted(self._active)

    @property
    def free_slots(self) -> int:
        return len(self._free)

    # ------------------------------------------------------------------ tick

    def step(self, chunks: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
        """Advance the sessions in ``chunks`` by one 4-s window.

        chunks: session id -> 1-D 16 kHz audio (<= window_samples; shorter
        chunks are zero-padded, mirroring ``engine.stream``). Sessions not in
        ``chunks`` idle this tick: they are stepped with silence for batch
        shape, but their carry/output are discarded, so a later real chunk
        continues exactly where they stopped.

        Returns session id -> (ceil(valid_samples/640), 106) raw motion.
        """
        unknown = [s for s in chunks if s not in self._active]
        if unknown:
            raise KeyError(f"unknown session(s) {unknown}")
        ws = self.window_samples
        buf = np.zeros((self.capacity, ws), np.float32)
        n_valid: Dict[int, int] = {}
        for sid, chunk in chunks.items():
            chunk = np.asarray(chunk, np.float32).reshape(-1)
            if len(chunk) > ws:
                # silently dropping the tail would desynchronize audio and
                # motion by the excess every tick -- make the caller split
                raise ValueError(
                    f"session {sid}: chunk of {len(chunk)} samples exceeds "
                    f"the {ws}-sample window; split it across ticks")
            n = len(chunk)
            buf[sid, :n] = chunk
            n_valid[sid] = n

        # idle slots keep their previous carry (their rows advance on
        # silence this tick, which must not perturb a paused session)
        stepped = np.zeros((self.capacity,), bool)
        for sid in chunks:
            stepped[sid] = True
        # DONATION INVARIANT: self._state's buffers are donated to the jitted
        # step, so ALL input validation must happen before this call -- an
        # exception raised after donation would leave the pool permanently
        # broken. Commit to self._state only once the call has returned.
        new_state, motion = self._step(self.params, self._state,
                                       jnp.asarray(buf), self._styles,
                                       jnp.asarray(stepped))
        self._state = new_state

        host_motion = np.asarray(motion)
        out = {}
        for sid, n in n_valid.items():
            frames = math.ceil(n / self.sample_rate * self.fps)
            out[sid] = host_motion[sid, :frames]
        return out


def _demo(argv=None):
    """Demo server loop: N concurrent sessions streaming one WAV.

    python -m artalk_tpu.serving -a audio.wav [--sessions 4] — every session
    streams the same audio (offset joins), printing per-tick latency and
    aggregate throughput. Random-init weights unless a checkpoint exists.
    """
    import argparse
    import os
    import time

    from .config import ModelConfig, load_config
    from .utils.audio import load_audio_16k_mono
    from .utils.checkpoint import load_params

    ap = argparse.ArgumentParser(description=_demo.__doc__)
    ap.add_argument("--audio_path", "-a", required=True)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--assets", default="assets")
    args = ap.parse_args(argv)
    if args.sessions < 1:
        ap.error("--sessions must be >= 1")

    cfg_path = os.path.join(args.assets, "config.json")
    cfg = load_config(cfg_path) if os.path.exists(cfg_path) else ModelConfig()
    from .engine import _resolve_ar_precision  # ARTALK_AR_PRECISION knob

    cfg = _resolve_ar_precision(cfg)
    model = BitwiseARModel(cfg)
    ckpt = os.path.join(args.assets, "artalk_params.npz")
    if os.path.exists(ckpt):
        params = load_params(
            ckpt, like=jax.eval_shape(model.init, jax.random.PRNGKey(0)))
    else:
        print(f"[artalk_tpu] no checkpoint at {ckpt}; random weights")
        params = model.init(jax.random.PRNGKey(0))
    pool = StreamPool(model, params, max_sessions=args.sessions)
    audio = load_audio_16k_mono(args.audio_path)
    ws = pool.window_samples
    windows = [audio[i:i + ws] for i in range(0, len(audio), ws)]

    sids = [pool.open_session() for _ in range(args.sessions)]
    total_frames = 0
    t_start = None
    for tick, chunk in enumerate(windows):
        t0 = time.perf_counter()
        out = pool.step({s: chunk for s in sids})
        ms = (time.perf_counter() - t0) * 1000.0
        tag = "  (includes one-time compile)" if tick == 0 else ""
        print(f"tick {tick}: {len(out)} sessions, {ms:.1f} ms "
              f"({ms / len(out):.1f} ms/session){tag}")
        if tick == 0:
            t_start = time.perf_counter()  # steady-state only
        else:
            total_frames += sum(o.shape[0] for o in out.values())
    if total_frames:
        elapsed = time.perf_counter() - t_start
        print(f"steady state: {total_frames} motion frames in {elapsed:.2f} s "
              f"= {total_frames / elapsed:.0f} frames/s "
              "(host-fetch included; see bench.py for device numbers)")


if __name__ == "__main__":
    _demo()
