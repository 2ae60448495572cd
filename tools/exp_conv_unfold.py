#!/usr/bin/env python
"""Experiment: wav2vec conv frontend as unfold+matmul vs lax.conv (VERDICT r4
ask #2: the batched encode is 16.1 ms bf16 vs a ~5 ms roofline and the conv
frontend is ~6.1 ms of it).

Hypothesis: the frontend's cost is NOT the conv FLOPs (157 GFLOP for 8
windows = ~0.8 ms at bf16 peak) but the memory structure around them — NCH
convs force a (B,C,T)->(B,T,C) transpose pair around every channel LayerNorm
(7 layers x 2 transposes over activations up to 26 MB), and XLA cannot fuse
across them. Restructure each conv as unfold+matmul IN (B,T,C) LAYOUT:

  k=10,s=5 (layer 0): x.reshape(B,12800,5); concat rows t,t+1 -> (B,12799,10)
      @ W (10,512)
  k=3,s=2: y[u] = x[2u]W0 + x[2u+1]W1 + x[2u+2]W2
      = x[:, :2F].reshape(B,F,2C) @ W01  +  x[:, 2:2F+1:2] @ W2
  k=2,s=2: y[u] = x[:, :2F].reshape(B,F,2C) @ W01        (single matmul)

LayerNorm then acts on the last axis directly — zero transposes end to end,
and every matmul is MXU-shaped ((B*F, 1024) @ (1024, 512)). Same math
(reassociated sum), so parity vs extract_features is checked here
(CPU f32: max|d| 6e-6).

RESULT (v5e, 2026-08-19, 8 windows, iters 20) -- REJECTED, twice:
    run 1:  f32 conv 5.21 / unfold 6.33        bf16 conv 5.02 / unfold 5.62
    run 2:  f32 conv 4.65 / unfold 5.74 / hybrid 4.86
            bf16 conv 4.52 / unfold 5.28 / hybrid 4.31
The transpose-pair-around-LayerNorm hypothesis is wrong: XLA's NCH conv
lowering already absorbs the layout work, while the full unfold pays real
copies for its strided slice (x[:, 2:2F+1:2]) and reshape-of-slice
operands. The layer-0-only hybrid (bit-identical output, checked to 0.0 on
CPU) moves +-5% -- inside run-to-run noise (conv itself moved 5.21 -> 4.65
between runs), confirming exp_frontend.py's r3 finding that the per-layer
"layer 0 = 4 ms" decomposition is a single-op dispatch-floor artifact, not
signal. With tools/exp_conv_layout.py (NCH vs NWC neutral) and
tools/exp_pos_conv.py (im2col loses batched), every local restructure of
the frontend is now measured-and-rejected: the ~4.5-5 ms frontend is an
XLA-program floor at these shapes. The production batched encode instead
routes the 24-layer stack through the weight-streaming fused kernel
(wav2vec.encode fused_pack path) -- see profile_encoder.py --fused.

Usage (real TPU): python tools/exp_conv_unfold.py [--iters 20] [--windows 8]
Parity (any host): python tools/exp_conv_unfold.py --check
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def unfold_frontend(cfg, params, audio):
    """extract_features re-expressed as unfold+matmul in (B,T,C) layout."""
    from artalk_tpu.models import nn
    from artalk_tpu.models.wav2vec import normalize_audio

    x = normalize_audio(audio)  # (B, T)
    b = x.shape[0]
    for i, (p, k, s) in enumerate(zip(params["feature_extractor"],
                                      cfg.conv_kernel, cfg.conv_stride)):
        w = p["conv"]["w"]  # (out, in, k) torch layout
        t = x.shape[1]
        f = (t - k) // s + 1
        if i == 0:
            assert (k, s) == (10, 5) and x.ndim == 2
            x5 = x[:, :(t // s) * s].reshape(b, t // s, s)
            xu = jnp.concatenate([x5[:, :f], x5[:, 1:f + 1]], axis=-1)
            x = xu @ w[:, 0, :].T                        # (B, F, out)
        else:
            assert s == 2 and k in (2, 3)
            c = x.shape[-1]
            w01 = jnp.concatenate([w[:, :, 0].T, w[:, :, 1].T], axis=0)
            y = x[:, :2 * f].reshape(b, f, 2 * c) @ w01
            if k == 3:
                y = y + x[:, 2:2 * f + 1:2] @ w[:, :, 2].T
            x = y
        bb = p["conv"].get("b")
        if bb is not None:
            x = x + bb
        x = nn.layer_norm_apply(p["norm"], x, eps=cfg.layer_norm_eps)
        x = nn.gelu_erf(x)
    return x  # (B, F, C) — already the (B, T, C) layout encode() wants


def hybrid_frontend(cfg, params, audio):
    """Unfold ONLY layer 0 (in_ch=1, k=10, s=5 — the shape XLA's conv
    lowering handles worst: profile_encoder --convdetail puts layer 0 at
    ~3.9-4.5 ms of the ~6.2 ms frontend), keep lax.conv for layers 1-6
    (whose strided-slice unfolds pay real copies — the full-unfold loss)."""
    from artalk_tpu.models import nn
    from artalk_tpu.models.wav2vec import _conv1d, normalize_audio

    x = normalize_audio(audio)
    b = x.shape[0]
    p0 = params["feature_extractor"][0]
    k, s = cfg.conv_kernel[0], cfg.conv_stride[0]
    t = x.shape[1]
    f = (t - k) // s + 1
    x5 = x[:, :(t // s) * s].reshape(b, t // s, s)
    xu = jnp.concatenate([x5[:, :f], x5[:, 1:f + 1]], axis=-1)
    x = xu @ p0["conv"]["w"][:, 0, :].T
    if p0["conv"].get("b") is not None:
        x = x + p0["conv"]["b"]
    x = nn.layer_norm_apply(p0["norm"], x, eps=cfg.layer_norm_eps)
    x = nn.gelu_erf(x).transpose(0, 2, 1)          # (B, C, F) for lax.conv
    for p, stride in list(zip(params["feature_extractor"],
                              cfg.conv_stride))[1:]:
        x = _conv1d(p["conv"]["w"], p["conv"].get("b"), x, stride=stride)
        x = x.transpose(0, 2, 1)
        x = nn.layer_norm_apply(p["norm"], x, eps=cfg.layer_norm_eps)
        x = x.transpose(0, 2, 1)
        x = nn.gelu_erf(x)
    return x.transpose(0, 2, 1)


def check():
    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 64000)).astype(np.float32) * 0.1)
    ref = jax.jit(lambda p, a: enc.extract_features(p, normalize_audio(a)))(
        params, audio)
    for name, fn in (("unfold", unfold_frontend), ("hybrid", hybrid_frontend)):
        got = jax.jit(lambda p, a, fn=fn: fn(cfg, p, a))(params, audio)
        assert ref.shape == got.shape, (ref.shape, got.shape)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"{name}: shape {got.shape}  max|d| = {err:.3e}  "
              f"(max|ref| = {scale:.3f})")
        assert err < 2e-3 * max(scale, 1.0), err
    print("parity OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=8)
    args = ap.parse_args()
    if args.check:
        check()
        return

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio
    from artalk_tpu.utils.timing import timed

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (args.windows, 64000)).astype(np.float32) * 0.1)

    for mode in ("f32", "bf16"):
        if mode == "bf16":
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, params)
            aud = audio.astype(jnp.bfloat16)
        else:
            p, aud = params, audio
        print(f"--- {mode} ({args.windows} windows) ---")
        f_conv = jax.jit(lambda p, a: jnp.sum(
            enc.extract_features(p, normalize_audio(a))))
        f_unf = jax.jit(lambda p, a: jnp.sum(unfold_frontend(cfg, p, a)))
        f_hyb = jax.jit(lambda p, a: jnp.sum(hybrid_frontend(cfg, p, a)))
        a_ = float(jax.device_get(f_conv(p, aud)))
        b_ = float(jax.device_get(f_unf(p, aud)))
        c_ = float(jax.device_get(f_hyb(p, aud)))
        print(f"  sums: conv {a_:.4f}  unfold {b_:.4f}  hybrid {c_:.4f}")
        t_c = timed(f"conv frontend   {mode}", f_conv, p, aud, iters=args.iters)
        t_u = timed(f"unfold frontend {mode}", f_unf, p, aud, iters=args.iters)
        t_h = timed(f"hybrid frontend {mode}", f_hyb, p, aud, iters=args.iters)
        best = min((t_c, "CONV"), (t_u, "UNFOLD"), (t_h, "HYBRID"))[1]
        print(f"  -> {best} wins (conv {t_c:.2f} / unfold {t_u:.2f} / "
              f"hybrid {t_h:.2f} ms)\n")


if __name__ == "__main__":
    main()
