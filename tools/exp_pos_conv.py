#!/usr/bin/env python
"""Experiment: faster formulations of the wav2vec positional conv.

The pos conv (d=1024, k=128, groups=16 -> 16 independent 64-ch convs over
T=199 frames) measures ~3.4 ms for the batched-8-window encode
(tools/profile_encoder.py) — ~4 TFLOP/s effective for 1.7 GMAC/window, i.e.
the 64-channel groups starve the 128-lane MXU. Probes (bf16, B in {1, 8}):

  grouped     production lax.conv feature_group_count=16 on (B, 1024, T)
  im2col      per-group (B*T, 64*128) im2col buffer (built from 128 shifted
              time-slices) + batched dot_general with contraction 8192
              (MXU-shaped; pays a ~3.3 MB/group/window materialization)

All variants parity-checked against grouped at f32.

Run on the real TPU:  python tools/exp_pos_conv.py

RESULT (v5e, 2026-08-19, r05):
    B=1 f32:  grouped 3.31   im2col 1.96 ms   (im2col 1.7x, near the
    B=1 bf16: grouped 3.40   im2col 2.57 ms    ~1.2 ms dispatch floor)
    B=8 f32:  grouped 2.83   im2col 6.32 ms   (im2col LOSES 2.2x: the
    B=8 bf16: grouped 4.99   im2col 6.23 ms    16 x 3.3 MB/window im2col
                                               buffers = ~420 MB traffic)
Verdict: REJECTED for the batched-windows encode (the grouped lax.conv
stays); the B=1 win is a standalone-microbench number at the dispatch
floor (CLAUDE.md) -- an in-context batch-1 window_step A/B would be needed
before routing the streaming path through im2col, and the streaming path's
budget (6.0 ms fused p50) makes a ~1 ms conv nobody's bottleneck.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from artalk_tpu.utils.timing import timed

D, G, K, T = 1024, 16, 128, 199
CG = D // G  # 64 channels per group
PAD = K // 2  # HF pads k//2 both sides, then drops the trailing step


def grouped(w, b, x):
    # x (B, T, D) -> conv on (B, D, T) like _pos_conv_embed
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1), w, (1,), [(PAD, PAD)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=G)[..., :-1]
    return y.transpose(0, 2, 1) + b


def im2col(wmat, b, x):
    """wmat (G, K*CG, CG); x (B, T, D)."""
    bsz = x.shape[0]
    xg = x.reshape(bsz, T, G, CG)
    xp = jnp.pad(xg, ((0, 0), (PAD, PAD - 1), (0, 0), (0, 0)))
    # windows: (B, T, K, G, CG) via K shifted slices
    win = jnp.stack([xp[:, j:j + T] for j in range(K)], axis=2)
    win = win.transpose(3, 0, 1, 2, 4).reshape(G, bsz * T, K * CG)
    y = jnp.einsum("gtk,gko->gto", win, wmat,
                   preferred_element_type=jnp.float32)
    y = y.reshape(G, bsz, T, CG).transpose(1, 2, 0, 3).reshape(bsz, T, D)
    return y.astype(x.dtype) + b


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.standard_normal((D, CG, K)) / np.sqrt(CG * K))
                    .astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
    # im2col weight: (G, K*CG, CG); out channel o of group g = w[g*CG+o]
    wm = np.asarray(w).reshape(G, CG, CG, K)        # (G, O, I, K)
    wm = wm.transpose(0, 3, 2, 1).reshape(G, K * CG, CG)
    wm = jnp.asarray(wm)

    print(f"device: {jax.devices()[0]}  D={D} G={G} K={K} T={T}\n")
    for bsz in (1, 8):
        x = jnp.asarray(rng.standard_normal((bsz, T, D)).astype(np.float32))
        ref = np.asarray(jax.jit(grouped)(w, bias, x))
        got = np.asarray(jax.jit(im2col)(wm, bias, x))
        print(f"  B={bsz} parity im2col max|d| = "
              f"{np.max(np.abs(ref - got)):.3e}")

        for mode in ("f32", "bf16"):
            cast = (lambda a: a.astype(jnp.bfloat16)) if mode == "bf16" \
                else (lambda a: a)
            s = lambda f: jax.jit(
                lambda w, b, x: jnp.sum(f(w, b, x).astype(jnp.float32)))
            timed(f"  B={bsz} {mode} grouped", s(grouped),
                  cast(w), cast(bias), cast(x), iters=20)
            timed(f"  B={bsz} {mode} im2col", s(im2col),
                  cast(wm), cast(bias), cast(x), iters=20)
        print()


if __name__ == "__main__":
    main()
