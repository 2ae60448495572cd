#!/usr/bin/env python
"""Experiment: per-layer cost of the wav2vec conv frontend + a matmul rewrite
of the scalar-input first layer.

The 7-conv feature extractor (reference architecture: HF wav2vec2-xls-r,
consumed at app/modules/wav2vec.py:11-20) measures ~6.1 ms at batch 8
(tools/profile_encoder.py) against a ~1 ms bf16 FLOP floor. This isolates
where it goes: each layer's conv alone vs conv+LN+GELU, and a rewrite of
layer 0 (in_ch=1, k=10, s=5 -- a shape the MXU hates as a conv) as an
explicit patch-matmul: reshape to 5-sample frames, concat two shifted frame
views into (B, L, 10) patches, one (10 -> 512) matmul.

Run on the real TPU:  python tools/exp_frontend.py [--windows 8]

Round-3 results on the v5e (b=8): full extract_features is 4.67 ms f32 /
4.81 ms bf16 -- NOT the ~6.1 ms profile_encoder suggested, and the
per-layer lines (1.4-4.5 ms each, summing to 3x the whole) are pure
single-op dispatch-floor artifacts (CLAUDE.md), carrying no signal. The
layer0 patch-matmul rewrite is bit-identical but times at the same floor.
Verdict: the frontend is within ~1.5x of a realistic conv roofline once
measured as one program; no restructure justified.
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
    from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio, _conv1d
    from artalk_tpu.models import nn

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    b = args.windows
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, 64000)).astype(np.float32) * 0.1)

    convs = params["feature_extractor"]

    def layer0_matmul(p, a):
        """(B, T) -> (B, 512, L): k=10 s=5 conv as frame-concat + matmul."""
        w = p["conv"]["w"]                   # (512, 1, 10)
        x5 = a.reshape(b, -1, 5)             # (B, 12800, 5)
        patches = jnp.concatenate([x5[:, :-1], x5[:, 1:]], axis=-1)  # (B,L,10)
        y = jnp.einsum("blt,ot->blo", patches, w[:, 0, :])
        if "b" in p["conv"]:
            y = y + p["conv"]["b"]
        return y.transpose(0, 2, 1)

    # f32 parity of the rewrite
    ref0 = jax.jit(lambda p, a: _conv1d(p["conv"]["w"], p["conv"].get("b"),
                                        a[:, None, :], stride=5))(convs[0], audio)
    got0 = jax.jit(layer0_matmul)(convs[0], audio)
    print(f"layer0 matmul parity: max|d| = "
          f"{np.max(np.abs(np.asarray(ref0) - np.asarray(got0))):.3e}\n")
    print(f"device: {jax.devices()[0]}  windows: {b}\n")

    for mode in ("f32", "bf16"):
        if mode == "bf16":
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, params)
            aud = audio.astype(jnp.bfloat16)
        else:
            p, aud = params, audio
        cv = p["feature_extractor"]
        print(f"--- {mode} ---")
        timed("full extract_features",
              jax.jit(lambda p, a: jnp.sum(enc.extract_features(
                  p, normalize_audio(a)))), p, aud, iters=20)

        # per-layer: conv alone, then conv+LN+GELU, on that layer's real input
        x = jax.jit(lambda a: normalize_audio(a)[:, None, :])(aud)
        for i, (lp, stride) in enumerate(zip(cv, cfg.conv_stride)):
            conv_fn = jax.jit(lambda w, bb, x, s=stride: jnp.sum(
                _conv1d(w, bb, x, stride=s)))
            timed(f"  L{i} conv only  in={x.shape[1]:4d} T={x.shape[2]:6d}",
                  conv_fn, lp["conv"]["w"], lp["conv"].get("b"), x, iters=20)

            def full_layer(lp, x, s=stride):
                y = _conv1d(lp["conv"]["w"], lp["conv"].get("b"), x, stride=s)
                y = y.transpose(0, 2, 1)
                y = nn.layer_norm_apply(lp["norm"], y, eps=cfg.layer_norm_eps)
                return nn.gelu_erf(y.transpose(0, 2, 1))

            timed(f"  L{i} conv+LN+GELU", jax.jit(
                lambda lp, x: jnp.sum(full_layer(lp, x))), lp, x, iters=20)
            x = jax.jit(full_layer)(lp, x)

        timed("layer0 as matmul (conv only)",
              jax.jit(lambda lp, a: jnp.sum(layer0_matmul(lp, a))),
              cv[0], aud, iters=20)
        print()


if __name__ == "__main__":
    main()
