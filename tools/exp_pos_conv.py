#!/usr/bin/env python
"""Experiment: structural alternatives for the wav2vec grouped positional conv.

The pos conv (d=1024, kernel 128, groups 16; reference architecture per HF
wav2vec2-xls-r config, consumed at app/modules/wav2vec.py:11-20) costs
~3.4 ms at batch 8 (tools/profile_encoder.py) against a ~0.07 ms bf16 FLOP
floor (26.7 GFLOP at b=8) -- consistent with XLA dense-ifying the 16-group
conv into a block-diagonal dense conv (16x redundant FLOPs). This probes
structural rewrites of the SAME math:

  prod      lax.conv feature_group_count=16, NCH (production)
  dense     explicit block-diagonal dense conv (hypothesis check: should
            match prod if XLA dense-ifies)
  bgc       groups folded batch-major + batch_group_count=16
  scan_g    lax.scan over the 16 groups, each a dense (64 -> 64, k=128) conv
  chunk_t   tap-chunked einsum: 8 accumulation steps, each a (g)-batched
            dot_general over a (tap=16, in=64) contraction built from 16
            static shifted slices (no conv primitive at all)

Run on the real TPU:  python tools/exp_pos_conv.py [--windows 8]

Round-3 results on the v5e (b=8): hypothesis REFUTED -- XLA does NOT
dense-ify the grouped conv; the production form is already the fastest.
  f32:  prod 1.93  dense 4.97  bgc 2.14  scan_g 2.12  chunk_t 5.18 ms
  bf16: prod 2.02  dense 4.88  bgc 3.49  scan_g 3.17  chunk_t 5.27 ms
All f32 variants except chunk_t are bit-identical to prod. (The old 3.4 ms
"pos conv" line in profile_encoder is a single-op dispatch-floor artifact.)
Verdict: keep the production grouped conv; a Pallas kernel could still
target the remaining ~1.9 ms (FLOP floor ~0.07 ms) but the absolute ceiling
is ~0.2 ms/window amortized.
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artalk_tpu.utils.timing import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8)
    args = ap.parse_args()

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder
    from artalk_tpu.models import nn

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    d = cfg.hidden_size                      # 1024
    g = cfg.num_conv_pos_embedding_groups    # 16
    k = cfg.num_conv_pos_embeddings          # 128
    gd = d // g                              # 64
    pad = k // 2
    b = args.windows
    n_frames = cfg.num_output_frames(64000)  # 199
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n_frames, d)).astype(np.float32))
    pc = params["encoder"]["pos_conv"]
    w = pc["w"]                              # (d, d/g, k) torch layout
    bias = pc["b"]

    def finish(h):
        if k % 2 == 0:
            h = h[:, :, :-1] if h.shape[1] == d else h[:, :-1]
        return h

    def prod(w, bias, x):
        h = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1), w, window_strides=(1,),
            padding=[(pad, pad)], feature_group_count=g,
            dimension_numbers=("NCH", "OIH", "NCH"))
        h = finish(h) + bias[None, :, None]
        return nn.gelu_erf(h.transpose(0, 2, 1))

    def dense(w, bias, x):
        # block-diagonal (d, d, k): out channel o reads only its group's slice
        wd = jnp.zeros((d, d, k), w.dtype)
        for gi in range(g):
            wd = wd.at[gi * gd:(gi + 1) * gd,
                       gi * gd:(gi + 1) * gd].set(w[gi * gd:(gi + 1) * gd])
        h = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1), wd, window_strides=(1,),
            padding=[(pad, pad)], dimension_numbers=("NCH", "OIH", "NCH"))
        h = finish(h) + bias[None, :, None]
        return nn.gelu_erf(h.transpose(0, 2, 1))

    def bgc(w, bias, x):
        # fold groups batch-major: lhs (g*B, gd, L); rhs (d, gd, k) with out
        # features group-major (already are); batch_group_count=g
        xg = x.reshape(b, n_frames, g, gd)            # (B, L, g, gd)
        xg = xg.transpose(2, 0, 3, 1).reshape(g * b, gd, n_frames)
        h = jax.lax.conv_general_dilated(
            xg, w, window_strides=(1,), padding=[(pad, pad)],
            batch_group_count=g,
            dimension_numbers=("NCH", "OIH", "NCH"))   # (B, d, L+1)
        h = finish(h) + bias[None, :, None]
        return nn.gelu_erf(h.transpose(0, 2, 1))

    def scan_g(w, bias, x):
        xg = x.reshape(b, n_frames, g, gd).transpose(2, 0, 3, 1)  # (g,B,gd,L)
        wg = w.reshape(g, gd, gd, k)                              # (g,out,in,k)

        def body(_, inp):
            xi, wi = inp
            h = jax.lax.conv_general_dilated(
                xi, wi, window_strides=(1,), padding=[(pad, pad)],
                dimension_numbers=("NCH", "OIH", "NCH"))
            return _, h

        _, hs = jax.lax.scan(body, None, (xg, wg))     # (g, B, gd, L+1)
        h = hs.transpose(1, 0, 2, 3).reshape(b, d, -1)
        h = finish(h) + bias[None, :, None]
        return nn.gelu_erf(h.transpose(0, 2, 1))

    def chunk_t(w, bias, x, tchunk=16):
        # y[b,l,g,o] = sum_{t,i} xpad[b,l+t,g,i] w[g,o,i,t]; accumulate over
        # tap chunks; per chunk one dot_general with g as batch dim.
        lout = n_frames + 1 if k % 2 == 0 else n_frames
        xpad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        xg = xpad.reshape(b, -1, g, gd)                # (B, Lp, g, gd)
        wg = w.reshape(g, gd, gd, k)                   # (g, o, i, t)
        acc = jnp.zeros((g, b * lout, gd), jnp.float32)
        for c in range(k // tchunk):
            sl = [xg[:, c * tchunk + t:c * tchunk + t + lout]
                  for t in range(tchunk)]
            patch = jnp.stack(sl, axis=2)              # (B, lout, T, g, gd)
            patch = patch.transpose(3, 0, 1, 2, 4).reshape(
                g, b * lout, tchunk * gd)
            wc = wg[:, :, :, c * tchunk:(c + 1) * tchunk]  # (g, o, i, T)
            wc = wc.transpose(0, 3, 2, 1).reshape(g, tchunk * gd, gd)
            acc = acc + jax.lax.dot_general(
                patch, wc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        h = acc.reshape(g, b, lout, gd).transpose(1, 2, 0, 3).reshape(
            b, lout, d).astype(x.dtype)
        h = (h[:, :-1] if k % 2 == 0 else h) + bias
        return nn.gelu_erf(h)

    variants = [("prod", prod), ("dense", dense), ("bgc", bgc),
                ("scan_g", scan_g), ("chunk_t", chunk_t)]

    print(f"device: {jax.devices()[0]}  windows: {b}  L={n_frames}\n")
    ref = np.asarray(jax.jit(prod)(w, bias, x0))
    for name, fn in variants:
        got = np.asarray(jax.jit(fn)(w, bias, x0))
        err = np.max(np.abs(ref - got))
        print(f"  parity {name:<8s} max|d| = {err:.3e}")
    print()
    for mode in ("f32", "bf16"):
        if mode == "bf16":
            wi, bi, xi = (w.astype(jnp.bfloat16), bias.astype(jnp.bfloat16),
                          x0.astype(jnp.bfloat16))
        else:
            wi, bi, xi = w, bias, x0
        print(f"--- {mode} ---")
        for name, fn in variants:
            timed(f"pos conv {name}",
                  jax.jit(lambda w, b_, x, fn=fn: jnp.sum(fn(w, b_, x))),
                  wi, bi, xi, iters=20)
        print()


if __name__ == "__main__":
    main()
