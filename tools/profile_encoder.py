#!/usr/bin/env python
"""Per-stage device timing of the wav2vec2 audio encoder.

Splits the batched-windows encode (the dominant stage of the offline
``generate`` clip path) into conv feature extractor / feature projection +
positional conv / transformer stack, at both f32 (exact mode) and bf16
(fast mode). Run on the real TPU:

    python tools/profile_encoder.py [--iters 10] [--windows 8]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--convdetail", action="store_true",
                    help="per-layer cumulative timing of the conv frontend "
                         "(prefix k minus prefix k-1), plus a no-norm "
                         "variant and a transpose-free channel-LN variant")
    ap.add_argument("--only_fused", action="store_true",
                    help="skip the standard sections (saves ~8 min of "
                         "remote compiles when only the fused numbers matter)")
    ap.add_argument("--fused", action="store_true",
                    help="also time the full encode with the weight-"
                         "streaming fused stack engaged (bf16/int8 packs, "
                         "ops/encoder_block_stack.py via lax.map) — the "
                         "path generate() actually uses in fused modes")
    args = ap.parse_args()
    it = args.iters

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio

    cfg = ModelConfig()
    enc = Wav2VecEncoder(cfg.wav2vec)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b = args.windows
    audio = jnp.asarray(rng.standard_normal(
        (b, cfg.window_audio_samples)).astype(np.float32) * 0.1)

    print(f"device: {jax.devices()[0]}   iters: {it}   windows: {b}\n")

    for mode in ("f32", "bf16"):
        if mode == "bf16":
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, params)
            aud = audio.astype(jnp.bfloat16)
        else:
            p, aud = params, audio
        print(f"--- {mode} (batched {b} windows) ---")
        if not args.only_fused:
            timed("full __call__",
                  jax.jit(lambda p, a: jnp.sum(enc(p, a))), p, aud, iters=it)
            timed("conv feature extractor",
                  jax.jit(lambda p, a: jnp.sum(enc.extract_features(
                      p, normalize_audio(a)))), p, aud, iters=it)
            feats = jax.jit(enc.extract_features)(p, normalize_audio(aud))
            timed("pos conv embed",
                  jax.jit(lambda p, x: jnp.sum(enc._pos_conv_embed(p, x))),
                  p, jnp.zeros((b, feats.shape[1], cfg.wav2vec.hidden_size),
                               feats.dtype), iters=it)
            timed("encode (proj + 24-layer stack)",
                  jax.jit(lambda p, f: jnp.sum(enc.encode(p, f))), p, feats,
                  iters=it)

        if args.fused and mode == "bf16":
            for pack_dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
                pack = enc.pack_fused(params, dtype=pack_dtype)
                # pack passed as a jit ARGUMENT: closing over it inlines the
                # ~300 MB of tiles into the lowered module and the remote
                # compile service rejects the payload (CLAUDE.md)
                timed(f"full __call__ fused {name} pack",
                      jax.jit(lambda p, a, pk: jnp.sum(
                          enc(p, a, fused_pack=pk))), p, aud, pack, iters=it)

        if args.convdetail:
            from artalk_tpu.models.wav2vec import _conv1d
            from artalk_tpu.models import nn

            def prefix(p, a, k, norm="layer"):
                """First k conv layers; norm: layer | none | chanln."""
                x = normalize_audio(a)[:, None, :]
                for i, (lp, stride) in enumerate(
                        zip(p["feature_extractor"], cfg.wav2vec.conv_stride)):
                    if i >= k:
                        break
                    x = _conv1d(lp["conv"]["w"], lp["conv"].get("b"), x,
                                stride=stride)
                    if norm == "layer":
                        x = x.transpose(0, 2, 1)
                        x = nn.layer_norm_apply(
                            lp["norm"], x, eps=cfg.wav2vec.layer_norm_eps)
                        x = x.transpose(0, 2, 1)
                    elif norm == "chanln":  # same math, no transposes
                        mean = jnp.mean(x, axis=1, keepdims=True)
                        var = jnp.var(x, axis=1, keepdims=True)
                        x = (x - mean) * jax.lax.rsqrt(
                            var + cfg.wav2vec.layer_norm_eps)
                        x = x * lp["norm"]["scale"][None, :, None] \
                            + lp["norm"]["bias"][None, :, None]
                    x = nn.gelu_erf(x)
                return jnp.sum(x)

            print(f"  --- conv frontend detail ({mode}) ---")
            prev = 0.0
            for k in range(1, 8):
                ms = timed(f"  conv prefix {k}",
                           jax.jit(lambda p, a, k=k: prefix(p, a, k)),
                           p, aud, iters=it)
                print(f"    -> layer {k - 1} delta {ms - prev:8.2f} ms")
                prev = ms
            timed("  full frontend, no norms (gelu kept)",
                  jax.jit(lambda p, a: prefix(p, a, 7, norm="none")),
                  p, aud, iters=it)
            timed("  full frontend, transpose-free chan-LN",
                  jax.jit(lambda p, a: prefix(p, a, 7, norm="chanln")),
                  p, aud, iters=it)
        print()


if __name__ == "__main__":
    main()
