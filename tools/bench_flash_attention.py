"""Measure-or-retire for ops/attention.py (round-2 verdict, weak #4/#10).

A/B on the real chip:
1. the production wav2vec2 encode site (199 tokens, 24 layers, 16 heads)
   with use_flash_attention off vs on;
2. a standalone attention scaling sweep (sequence 256..8192, 16 heads x 64)
   comparing XLA SDPA vs the Pallas blockwise kernel inside one jit (50
   chained calls per measurement so the tunnel dispatch floor divides out).

    python tools/bench_flash_attention.py

Record the output in CLAUDE.md / ops/attention.py and set the default
accordingly.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artalk_tpu.config import Wav2VecConfig  # noqa: E402
from artalk_tpu.models import nn  # noqa: E402
from artalk_tpu.models.wav2vec import Wav2VecEncoder  # noqa: E402
from artalk_tpu.ops.attention import flash_attention  # noqa: E402


def timed(fn, *args, iters=10):
    out = fn(*args)  # compile + warm
    jax.device_get(jax.tree.leaves(out)[0].ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def encoder_ab():
    print("== production wav2vec encode site (1x64000 samples -> 199 tokens) ==")
    audio = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 64000)).astype(np.float32) * 0.1)
    results = {}
    for flash in (False, True):
        cfg = Wav2VecConfig(use_flash_attention=flash)
        enc = Wav2VecEncoder(cfg)
        params = enc.init(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p, a: jnp.sum(enc(p, a)))
        ms = timed(fn, params, audio)
        results[flash] = ms
        print(f"  use_flash_attention={flash}: {ms:8.2f} ms/encode")
    rel = (results[True] - results[False]) / results[False] * 100
    print(f"  flash is {rel:+.1f}% vs XLA SDPA at this site\n")


def scaling_sweep():
    print("== standalone attention, B=1 H=16 hd=64, f32, 50 chained calls ==")
    # 8192 omitted: the kernel stages whole K/V in VMEM and OOMs there
    # (16.25M > 16M scoped vmem) -- see ops/attention.py docstring
    rng = np.random.default_rng(0)
    for seq in (256, 512, 1024, 2048, 4096):
        q = jnp.asarray(rng.standard_normal((1, 16, seq, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 16, seq, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 16, seq, 64)).astype(np.float32))

        def chained(attn_fn, q, k, v):
            def body(c, _):
                o = attn_fn(q + c * 1e-20, k, v)
                return jnp.sum(o) * 1e-20, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=50)
            return c

        ms_xla = timed(jax.jit(lambda q, k, v: chained(
            lambda *a: nn.sdpa(*a, scale=0.125), q, k, v)), q, k, v, iters=3) / 50
        ms_fl = timed(jax.jit(lambda q, k, v: chained(
            lambda *a: flash_attention(*a, scale=0.125), q, k, v)), q, k, v,
            iters=3) / 50
        print(f"  seq={seq:<5d} xla {ms_xla:7.3f} ms   flash {ms_fl:7.3f} ms   "
              f"({(ms_fl / ms_xla - 1) * 100:+.0f}%)", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    encoder_ab()
    scaling_sweep()
