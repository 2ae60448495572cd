#!/usr/bin/env python
"""Benchmark: motion-generation throughput on the flagship pipeline.

Measures the full speech->motion path (wav2vec2-300M audio encode -> KV-cached
multi-scale AR decode -> BITWISE_VAE decode, sliding 4 s windows) on one chip
and prints ONE JSON line:

    {"metric": "motion_frames_per_sec", "value": N, "unit": "frames/s",
     "vs_baseline": N / 500.0, ...}

Baseline = the BASELINE.md north-star target of 500 motion-frames/s/chip
(>10x real-time at 25 fps codes). vs_baseline > 1.0 beats the target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.ar_model import BitwiseARModel

    cfg = ModelConfig()
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n_windows = 8  # 32 s clip = the default --clip_length 750 workload (padded)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((n_windows, 1, model.window_samples)).astype(np.float32) * 0.1)
    style_cond = model.encode_style(params, None)

    generate = jax.jit(model.generate)
    # warmup / compile (device_get forces real completion -- block_until_ready
    # is unreliable on tunneled platforms)
    jax.device_get(generate(params, chunks, style_cond))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        motions = jax.device_get(generate(params, chunks, style_cond))
    elapsed = (time.perf_counter() - t0) / iters

    total_frames = n_windows * cfg.vae.window
    frames_per_sec = total_frames / elapsed
    rtf = frames_per_sec / cfg.fps  # x real-time
    p50_window_ms = elapsed / n_windows * 1000.0

    print(json.dumps({
        "metric": "motion_frames_per_sec",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / 500.0, 3),
        "real_time_factor": round(rtf, 2),
        "p50_window_latency_ms": round(p50_window_ms, 1),
        "windows": n_windows,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
