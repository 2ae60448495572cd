#!/usr/bin/env python
"""Experiment: route the BATCHED-windows encoder stack through the fused
weight-streaming kernel, one window at a time.

The offline ``generate`` path encodes all of a clip's windows in one batch-8
XLA scan (amortizing the ~600 MB bf16 weight read), while the fused Pallas
kernel (ops/encoder_block_stack.py) only engages at batch 1. But at int8 the
per-window weight re-stream is only ~300 MB / 0.4 ms -- below the per-window
compute -- so ``lax.map`` of the B=1 kernel over the window axis may beat
the XLA scan outright. Measures, at batch 8:

  scan      current XLA 24-layer lax.scan (bf16 params)
  map_bf16  lax.map over windows of the fused kernel, bf16 tiles
  map_int8  lax.map over windows of the fused kernel, int8 tiles
  one_bf16 / one_int8   single-window fused kernel (floor per window)

Run on the real TPU:  python tools/exp_encoder_batched_fused.py

Round-3 results on the v5e (b=8, T=199, d=1024):
  stack scan f32 14.28 | scan bf16 12.29 | map_bf16 10.46 | map_int8 9.93
  single-window fused: bf16 3.72 / int8 4.03 (floor-bound alone; the mapped
  calls pipeline back-to-back, 8x costs only ~2.6x)
Verdict: ADOPTED -- Wav2VecEncoder.encode lax.maps the batch-1 kernel over
windows for bf16/int8 packs (f32 packs keep the XLA scan).
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
    b = args.windows

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder
    from artalk_tpu.ops.encoder_block_stack import (encoder_block_stack,
                                                    pack_encoder_weights)

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    n_frames = cfg.num_output_frames(64000)
    d = cfg.hidden_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n_frames, d)).astype(np.float32))

    layers = params["encoder"]["layers"]
    packs = {
        "bf16": pack_encoder_weights(layers, dtype=jnp.bfloat16),
        "int8": pack_encoder_weights(layers, dtype=jnp.int8),
    }
    p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)

    def stack_only(p, feats):
        """encode() minus projection/pos-conv/final-LN: just the 24 layers."""
        from artalk_tpu.models import nn
        eps = cfg.layer_norm_eps
        lys = p["encoder"]["layers"]
        w_qkv = jnp.concatenate(
            [lys["q"]["w"], lys["k"]["w"], lys["v"]["w"]], axis=-1)
        b_qkv = jnp.concatenate(
            [lys["q"]["b"], lys["k"]["b"], lys["v"]["b"]], axis=-1)

        def layer_body(h, inp):
            lp, wq, bq = inp
            y = nn.layer_norm_apply(lp["norm1"], h, eps=eps)
            qkv = jnp.einsum("...i,io->...o", y, wq) + bq
            q, k, v = (nn.split_heads(t, cfg.num_attention_heads)
                       for t in jnp.split(qkv, 3, axis=-1))
            attn = nn.merge_heads(nn.sdpa(q, k, v, scale=q.shape[-1] ** -0.5))
            h = h + nn.linear(lp["out"], attn)
            y = nn.layer_norm_apply(lp["norm2"], h, eps=eps)
            return h + nn.linear(lp["fc2"], nn.gelu_erf(nn.linear(lp["fc1"], y))), None

        h, _ = jax.lax.scan(layer_body, feats, (lys, w_qkv, b_qkv))
        return h

    def fused_map(pack, xs):
        # NB: pack must be a jit ARGUMENT -- closing over it inlines the
        # ~600 MB of tiles into the lowered module (CLAUDE.md gotcha).
        def one(xi):
            return encoder_block_stack(
                xi[None], pack["wtiles"], pack["biases"], pack.get("scales"),
                num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps)[0]
        return jax.lax.map(one, xs)

    print(f"device: {jax.devices()[0]}  windows: {b}  T={n_frames} d={d}\n")
    ref = np.asarray(jax.jit(stack_only)(params, x))
    for name, pack in packs.items():
        got = np.asarray(jax.jit(fused_map)(pack, x))
        err = np.max(np.abs(ref - got))
        print(f"  parity map_{name}: max|d| = {err:.3e}")
    print()

    timed("stack scan f32 (exact)",
          jax.jit(lambda p, xs: jnp.sum(stack_only(p, xs))), params, x,
          iters=10)
    timed("stack scan bf16 (fast)",
          jax.jit(lambda p, xs: jnp.sum(stack_only(p, xs))), p_bf16,
          x.astype(jnp.bfloat16), iters=10)
    fused_map_sum = jax.jit(lambda pk, xs: jnp.sum(fused_map(pk, xs)))
    fused_one_sum = jax.jit(lambda pk, xs: jnp.sum(encoder_block_stack(
        xs[:1], pk["wtiles"], pk["biases"], pk.get("scales"),
        num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps)))
    for name, pack in packs.items():
        timed(f"fused map_{name} x{b}", fused_map_sum, pack, x, iters=10)
        timed(f"fused one_{name} (single window)", fused_one_sum, pack, x,
              iters=10)


if __name__ == "__main__":
    main()
