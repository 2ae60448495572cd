"""StreamPool batch-scaling curve on the real chip.

Measures the batched window step at B in {1, 2, 4, 8, 16, 32} sessions
(pipelined device timing: enqueue ITERS chained steps, fetch once) and prints
ms/tick, ms/session-window, and the implied real-time stream capacity at the
4-second window cadence. This replaces the single-B=8 extrapolation the
serving docstring used to carry (round-2 verdict, weak #8).

    python tools/bench_streampool.py [--sizes 1,2,4,8,16,32] [--iters 10]

Each batch size is a fresh compile of the full production window step
(~minutes each over the dev tunnel); expect the tool to take a while cold.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", default="1,2,4,8,16,32")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.ar_model import BitwiseARModel
    from artalk_tpu.serving import StreamPool

    from artalk_tpu.engine import _resolve_ar_precision

    # honor ARTALK_AR_PRECISION (exact/fast/int8) exactly like the serving
    # entrypoint does, so the curve measures the production pool config
    cfg = _resolve_ar_precision(ModelConfig())
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if cfg.fused_ar:
        params["fused_pack"] = model.pack_fused_decode(params)
        audio_pack = model.pack_fused_audio(params)
        if audio_pack is not None:
            params["fused_audio_pack"] = audio_pack
    print(f"device: {jax.devices()[0]}  precision="
          f"{os.environ.get('ARTALK_AR_PRECISION', 'exact')}")

    rng = np.random.default_rng(0)
    window_s = cfg.vae.window / cfg.fps
    rows = []
    for b in sizes:
        pool = StreamPool(model, params, max_sessions=b)
        audio = jnp.asarray(
            rng.standard_normal((b, model.window_samples)).astype(np.float32) * 0.1)
        mask = jnp.ones((b,), bool)
        state = pool._state
        # warm-up compile
        state, motion = pool._step(params, state, audio, pool._styles, mask)
        jax.device_get(motion[0, -1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, motion = pool._step(params, state, audio, pool._styles, mask)
        jax.device_get(motion[0, -1])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        per_session = ms / b
        streams = window_s / (ms / 1e3) * b
        rows.append((b, ms, per_session, streams))
        print(f"B={b:<3d} {ms:8.2f} ms/tick  {per_session:6.2f} ms/session-window"
              f"  ~{streams:7.0f} concurrent RT streams", flush=True)

    best = max(rows, key=lambda r: r[3])
    print(f"\nknee: B={best[0]} -> {best[2]:.2f} ms/session-window, "
          f"~{best[3]:.0f} real-time streams/chip")
    print("(record the curve in serving.py's docstring + CLAUDE.md)")


if __name__ == "__main__":
    main()
