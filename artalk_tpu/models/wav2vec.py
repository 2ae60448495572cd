"""wav2vec2-xls-r-300m audio encoder, TPU-native.

The reference wraps HF's ``Wav2Vec2Model`` with a custom forward: per-utterance
z-normalization -> conv feature extractor -> feature projection -> 24-layer
stable-layer-norm transformer encoder, returning (B, ~50/s, 1024) features
(reference: app/modules/wav2vec.py:11-27; config facebook/wav2vec2-xls-r-300m
per app/models.py:25-27). This is a from-scratch JAX implementation of that
architecture: convs via lax.conv_general_dilated, encoder layers parameter-
stacked under lax.scan, weight-norm of the positional conv materialized at
conversion time.

For the fixed 4 s window (64 000 samples) every shape is static: the conv
stack yields exactly 199 frames, so downstream resizes are constant matrices.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..config import Wav2VecConfig
from . import nn


def normalize_audio(audio: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-utterance z-norm with torch ``std`` semantics (unbiased, ddof=1)
    (reference: app/modules/wav2vec.py:22-27)."""
    mean = jnp.mean(audio, axis=-1, keepdims=True)
    n = audio.shape[-1]
    var = jnp.sum(jnp.square(audio - mean), axis=-1, keepdims=True) / (n - 1)
    return (audio - mean) / (jnp.sqrt(var) + eps)


def _conv1d(w: jnp.ndarray, b: jnp.ndarray | None, x: jnp.ndarray,
            stride: int = 1, padding: int = 0, groups: int = 1) -> jnp.ndarray:
    """1-D conv on (B, C, T) with torch weight layout (out, in/groups, k)."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


class Wav2VecEncoder:
    """Supports both HF wav2vec2-family variants:

    - ``feat_extract_norm="layer"`` + ``do_stable_layer_norm=True``: the
      xls-r encoder the reference uses (per-conv LayerNorm, pre-LN blocks,
      final LN after the stack).
    - ``feat_extract_norm="group"`` + ``do_stable_layer_norm=False``: the
      base/HuBERT layout (GroupNorm after conv0 only, encoder LN *before*
      the stack, post-LN blocks) -- used by models/hubert.py.
    """

    def __init__(self, cfg: Wav2VecConfig = Wav2VecConfig()):
        assert cfg.feat_extract_norm in ("layer", "group"), cfg.feat_extract_norm
        self.cfg = cfg

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array) -> nn.Params:
        cfg = self.cfg
        keys = jax.random.split(key, 8)

        convs = []
        in_ch = 1
        for i, (out_ch, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
            kk = jax.random.fold_in(keys[0], i)
            fan_in = in_ch * k
            w = nn.kaiming_uniform(kk, (out_ch, in_ch, k), fan_in=fan_in)
            conv = {"w": w}
            if cfg.conv_bias:
                conv["b"] = jnp.zeros((out_ch,))
            entry = {"conv": conv}
            if cfg.feat_extract_norm == "layer" or i == 0:
                entry["norm"] = nn.layer_norm_init(out_ch)
            convs.append(entry)
            in_ch = out_ch

        d = cfg.hidden_size
        pos_groups = cfg.num_conv_pos_embedding_groups
        pos_k = cfg.num_conv_pos_embeddings
        pos_fan_in = (d // pos_groups) * pos_k
        pos_conv = {
            "w": nn.kaiming_uniform(keys[1], (d, d // pos_groups, pos_k), fan_in=pos_fan_in),
            "b": jnp.zeros((d,)),
        }

        def layer(k):
            ks = jax.random.split(k, 6)
            return {
                "q": nn.linear_init(ks[0], d, d),
                "k": nn.linear_init(ks[1], d, d),
                "v": nn.linear_init(ks[2], d, d),
                "out": nn.linear_init(ks[3], d, d),
                "norm1": nn.layer_norm_init(d),
                "norm2": nn.layer_norm_init(d),
                "fc1": nn.linear_init(ks[4], d, cfg.intermediate_size),
                "fc2": nn.linear_init(ks[5], cfg.intermediate_size, d),
            }

        layers = [layer(jax.random.fold_in(keys[2], i)) for i in range(cfg.num_hidden_layers)]
        return {
            "feature_extractor": convs,
            "feature_projection": {
                "norm": nn.layer_norm_init(cfg.conv_dim[-1]),
                "proj": nn.linear_init(keys[3], cfg.conv_dim[-1], d),
            },
            "encoder": {
                "pos_conv": pos_conv,
                "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
                "final_norm": nn.layer_norm_init(d),
            },
        }

    # -- forward --------------------------------------------------------------

    def extract_features(self, params: nn.Params, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T_samples) -> (B, T_frames, conv_dim): the conv feature stack.

        "layer" mode: every conv is followed by a channel LayerNorm + erf-GELU.
        "group" mode: conv0 is followed by GroupNorm(C, C) (per-channel norm
        over time, biased variance); later convs have no norm.
        """
        cfg = self.cfg
        x = audio[:, None, :]  # (B, 1, T)
        for p, stride in zip(params["feature_extractor"], cfg.conv_stride):
            x = _conv1d(p["conv"]["w"], p["conv"].get("b"), x, stride=stride)
            if cfg.feat_extract_norm == "layer":
                x = x.transpose(0, 2, 1)
                x = nn.layer_norm_apply(p["norm"], x, eps=cfg.layer_norm_eps)
                x = x.transpose(0, 2, 1)
            elif "norm" in p:  # group mode, conv0 only
                mean = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.var(x, axis=-1, keepdims=True)
                x = (x - mean) / jnp.sqrt(var + cfg.layer_norm_eps)
                x = x * p["norm"]["scale"][None, :, None] \
                    + p["norm"]["bias"][None, :, None]
            x = nn.gelu_erf(x)
        return x.transpose(0, 2, 1)  # (B, T, C)

    def _pos_conv_embed(self, params: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        p = params["encoder"]["pos_conv"]
        h = _conv1d(p["w"], p["b"], x.transpose(0, 2, 1),
                    padding=cfg.num_conv_pos_embeddings // 2,
                    groups=cfg.num_conv_pos_embedding_groups)
        if cfg.num_conv_pos_embeddings % 2 == 0:  # SamePad: drop trailing step
            h = h[..., :-1]
        return nn.gelu_erf(h.transpose(0, 2, 1))

    def pack_fused(self, params: nn.Params, dtype=jnp.float32) -> nn.Params:
        """Tile-stream weight pack for the fused encoder kernel
        (ops/encoder_block_stack.py). Compute once and pass to ``encode``
        as ``fused_pack`` (or store under the model's params)."""
        from ..ops.encoder_block_stack import pack_encoder_weights

        return pack_encoder_weights(params["encoder"]["layers"], dtype=dtype)

    def encode(self, params: nn.Params, features: jnp.ndarray,
               fused_pack: nn.Params | None = None) -> jnp.ndarray:
        """Feature projection + transformer encoder (pre-LN "stable" layout,
        or the base/HuBERT post-LN layout when ``do_stable_layer_norm`` is
        False: encoder LN before the stack, LN after each residual).

        ``fused_pack`` (stable layout) routes the layer stack through the
        weight-streaming Pallas kernel instead of the XLA scan; parity-tested
        to atol, not bit-pinned (see ops/encoder_block_stack). Batch 1 runs
        the kernel directly; larger batches (the offline batched-windows
        encode) ``lax.map`` the batch-1 kernel over windows -- measured
        FASTER than the weight-amortizing XLA scan despite re-streaming the
        weights per window (b=8 stack: scan bf16 12.3 ms vs map int8 9.9 /
        map bf16 10.5; tools/exp_encoder_batched_fused.py), because the XLA
        scan round-trips every intermediate through HBM while the mapped
        kernels pipeline back-to-back. f32 packs keep the XLA scan at B>1
        (half-width HIGHEST-precision tiles are a parity artifact, not a
        perf path -- same verdict as the AR "fusedx" mode)."""
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        fp = params["feature_projection"]
        x = nn.linear(fp["proj"], nn.layer_norm_apply(fp["norm"], features, eps=eps))
        x = x + self._pos_conv_embed(params, x)
        if not cfg.do_stable_layer_norm:
            x = nn.layer_norm_apply(params["encoder"]["final_norm"], x, eps=eps)
        from ..ops.encoder_block_stack import pack_batched_ok

        if (fused_pack is not None and cfg.do_stable_layer_norm
                and (x.shape[0] == 1 or pack_batched_ok(fused_pack))):
            from ..ops.encoder_block_stack import (encoder_block_stack,
                                                   fused_batch_size)

            def run_window(xi):
                return encoder_block_stack(
                    xi, fused_pack["wtiles"],
                    fused_pack["biases"], fused_pack.get("scales"),
                    num_heads=cfg.num_attention_heads,
                    eps=eps, interpret=jax.default_backend() != "tpu")

            x = x.astype(jnp.float32)
            b = x.shape[0]
            gb = fused_batch_size(fused_pack)
            if b <= gb:
                x = run_window(x)
            elif b % gb == 0:
                # map over GROUPS of gb windows: each kernel call streams
                # the ~600 MB (bf16) of layer weights ONCE for gb windows
                # (the per-window map re-read them per window — most of the
                # stack's time at B=8)
                xg = x.reshape(b // gb, gb, x.shape[1], x.shape[2])
                x = jax.lax.map(run_window, xg).reshape(b, x.shape[1],
                                                        x.shape[2])
            else:
                x = jax.lax.map(lambda xi: run_window(xi[None])[0], x)
            return nn.layer_norm_apply(params["encoder"]["final_norm"], x,
                                       eps=eps)
        num_heads = cfg.num_attention_heads

        # Fuse the three (d, d) q/k/v projections into one (d, 3d) matmul per
        # layer: each output column is an independent dot product over the
        # same contraction dim, so the fusion is numerically identical while
        # cutting the op count of the 24-layer scan (the encoder is latency-
        # bound on small-op overhead at 199 tokens, not FLOPs).
        layers = params["encoder"]["layers"]
        w_qkv = jnp.concatenate(
            [layers["q"]["w"], layers["k"]["w"], layers["v"]["w"]], axis=-1)
        b_qkv = jnp.concatenate(
            [layers["q"]["b"], layers["k"]["b"], layers["v"]["b"]], axis=-1)

        def attend(y, p, w_qkv_l, b_qkv_l):
            qkv = jnp.einsum("...i,io->...o", y, w_qkv_l) + b_qkv_l
            q, k, v = (nn.split_heads(t, num_heads)
                       for t in jnp.split(qkv, 3, axis=-1))
            if cfg.use_flash_attention:
                from ..ops.attention import flash_attention

                attn = nn.merge_heads(
                    flash_attention(q, k, v, scale=q.shape[-1] ** -0.5))
            else:
                attn = nn.merge_heads(nn.sdpa(q, k, v, scale=q.shape[-1] ** -0.5))
            return nn.linear(p["out"], attn)

        def layer_body(h, inp):
            p, w_qkv_l, b_qkv_l = inp
            if cfg.do_stable_layer_norm:
                h = h + attend(nn.layer_norm_apply(p["norm1"], h, eps=eps), p,
                               w_qkv_l, b_qkv_l)
                y = nn.layer_norm_apply(p["norm2"], h, eps=eps)
                h = h + nn.linear(p["fc2"], nn.gelu_erf(nn.linear(p["fc1"], y)))
            else:
                h = nn.layer_norm_apply(
                    p["norm1"], h + attend(h, p, w_qkv_l, b_qkv_l), eps=eps)
                ff = nn.linear(p["fc2"], nn.gelu_erf(nn.linear(p["fc1"], h)))
                h = nn.layer_norm_apply(p["norm2"], h + ff, eps=eps)
            return h, None

        x, _ = jax.lax.scan(layer_body, x, (layers, w_qkv, b_qkv))
        if cfg.do_stable_layer_norm:
            x = nn.layer_norm_apply(params["encoder"]["final_norm"], x, eps=eps)
        return x

    def __call__(self, params: nn.Params, audio: jnp.ndarray,
                 fused_pack: nn.Params | None = None) -> jnp.ndarray:
        """Full reference forward (wav2vec.py:11-20): z-norm -> convs -> encoder."""
        audio = normalize_audio(audio)
        feats = self.extract_features(params, audio)
        return self.encode(params, feats, fused_pack=fused_pack)

    def num_output_frames(self, num_samples: int) -> int:
        return self.cfg.num_output_frames(num_samples)
