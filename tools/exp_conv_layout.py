#!/usr/bin/env python
"""Experiment: wav2vec conv-frontend layout on TPU.

The production feature extractor runs channel-major 1-D convs
(dimension_numbers NCH/OIH/NCH) with each LayerNorm wrapped in a
transpose pair (models/wav2vec.py:extract_features). This measures the
same math feature-minor (NWC/WIO/NWC, LN applied in-place, no transposes)
to decide whether a layout refactor is justified. Also probes the grouped
positional conv both ways.

Run on the real TPU:  python tools/exp_conv_layout.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artalk_tpu.utils.timing import timed


def main():
    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio
    from artalk_tpu.models import nn

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b = 8
    audio = jnp.asarray(rng.standard_normal((b, 64000)).astype(np.float32) * 0.1)

    def extract_nwc(p, a):
        """Same math as extract_features, feature-minor throughout."""
        x = normalize_audio(a)[:, :, None]  # (B, T, 1)
        for lp, stride in zip(p["feature_extractor"], cfg.conv_stride):
            w = lp["conv"]["w"].transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=[(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            if "b" in lp["conv"]:
                y = y + lp["conv"]["b"]
            y = nn.layer_norm_apply(lp["norm"], y, eps=cfg.layer_norm_eps)
            x = nn.gelu_erf(y)
        return x

    def pos_conv_nwc(p, x):
        pc = p["encoder"]["pos_conv"]
        w = pc["w"].transpose(2, 1, 0)  # (d, d/g, k) -> (k, d/g, d)
        h = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=[(cfg.num_conv_pos_embeddings // 2,) * 2],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dimension_numbers=("NWC", "WIO", "NWC"))
        h = h + pc["b"]
        if cfg.num_conv_pos_embeddings % 2 == 0:
            h = h[:, :-1]
        return nn.gelu_erf(h)

    print(f"device: {jax.devices()[0]}  windows: {b}\n")
    for mode in ("f32", "bf16"):
        if mode == "bf16":
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, params)
            aud = audio.astype(jnp.bfloat16)
        else:
            p, aud = params, audio
        print(f"--- {mode} ---")
        timed("conv stack NCH (production)",
              jax.jit(lambda p, a: jnp.sum(enc.extract_features(
                  p, normalize_audio(a)))), p, aud, iters=10)
        out_nwc = timed("conv stack NWC",
                        jax.jit(lambda p, a: jnp.sum(extract_nwc(p, a))),
                        p, aud, iters=10)
        feats = jax.jit(enc.extract_features)(p, normalize_audio(aud))
        x = jnp.zeros((b, feats.shape[1], cfg.hidden_size), feats.dtype)
        timed("pos conv NCH (production)",
              jax.jit(lambda p, x: jnp.sum(enc._pos_conv_embed(p, x))),
              p, x, iters=10)
        timed("pos conv NWC",
              jax.jit(lambda p, x: jnp.sum(pos_conv_nwc(p, x))), p, x,
              iters=10)
        if mode == "f32":
            a_prod = np.asarray(jax.jit(enc.extract_features)(
                params, normalize_audio(audio)))
            a_nwc = np.asarray(jax.jit(extract_nwc)(params, audio))
            err = np.max(np.abs(a_prod - a_nwc))
            print(f"  max |NCH - NWC| (f32): {err:.3e}")
        print()


if __name__ == "__main__":
    main()
