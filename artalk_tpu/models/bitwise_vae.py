"""BITWISE_VAE: transformer motion tokenizer with multi-scale BSQ codes.

Encodes 106-d FLAME motion into 32-bit-per-token binary codes over the scale
pyramid (1, 5, 25, 50, 100) and decodes codes back to motion. Operates on a
two-window layout ``[prev_window, this_window]`` (200 positions) with a block
attention mask: the previous window attends only to itself, the current window
attends to both (reference: app/modules/bitwise_vae.py:15-125).

TPU-first design choices:
- layers are parameter-stacked and driven by ``lax.scan`` (fast compiles,
  identical math),
- the block mask is additive bias on f32 logits,
- every pyramid resize is a constant-matrix matmul (see models/bsq.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import VAEConfig
from . import nn
from .bsq import MultiScaleBSQ
from .data_stats import ALLTALKEMICA_MEAN, ALLTALKEMICA_STD


def _attn_init(key, hidden: int) -> nn.Params:
    k1, k2 = jax.random.split(key)
    return {
        "norm": nn.layer_norm_init(hidden),
        "qkv": nn.linear_init(k1, hidden, 3 * hidden, bias=False),
        "out": nn.linear_init(k2, hidden, hidden, bias=True),
    }


def _ffn_init(key, hidden: int) -> nn.Params:
    k1, k2 = jax.random.split(key)
    inner = int(1.5 * hidden)
    return {
        "fc1": nn.linear_init(k1, hidden, inner, bias=True),
        "fc2": nn.linear_init(k2, inner, hidden, bias=True),
    }


def _simple_attention(p: nn.Params, x: jnp.ndarray, num_heads: int,
                      bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Pre-LN self-attention block body (bitwise_vae.py:194-215).

    Note the reference quirk kept for parity: softmax scale is
    hidden_dim**-0.5, not head_dim**-0.5 (bitwise_vae.py:198).
    """
    hidden = x.shape[-1]
    qkv = nn.linear(p["qkv"], nn.layer_norm_apply(p["norm"], x, eps=1e-5))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (nn.split_heads(t, num_heads) for t in (q, k, v))
    out = nn.sdpa(q, k, v, scale=hidden ** -0.5, bias=bias)
    return nn.linear(p["out"], nn.merge_heads(out))


def _ffn(p: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(p["fc2"], nn.gelu_tanh(nn.linear(p["fc1"], x)))


def _transformer_tower(layers: nn.Params, feat: jnp.ndarray, num_heads: int,
                       bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Residual attn+ffn tower over parameter-stacked layers via lax.scan.

    The reference applies the FFN residual without a pre-norm
    (bitwise_vae.py:149-157) -- kept as-is.
    """

    def body(x, layer):
        x = x + _simple_attention(layer["attn"], x, num_heads, bias)
        x = x + _ffn(layer["ffn"], x)
        return x, None

    feat, _ = jax.lax.scan(body, feat, layers)
    return feat


class BitwiseVAE:
    """Functional BITWISE_VAE. Parameters live in an explicit pytree."""

    def __init__(self, cfg: VAEConfig = VAEConfig()):
        self.cfg = cfg
        self.quantizer = MultiScaleBSQ(cfg.code_dim, cfg.patch_nums)
        self.window = cfg.window

    # -- parameters ----------------------------------------------------------

    def init(self, key: jax.Array) -> nn.Params:
        cfg = self.cfg
        keys = jax.random.split(key, 16)

        def tower(k):
            ks = jax.random.split(k, cfg.depth)
            per_layer = [
                {"attn": _attn_init(jax.random.fold_in(ki, 0), cfg.hidden_dim),
                 "ffn": _ffn_init(jax.random.fold_in(ki, 1), cfg.hidden_dim)}
                for ki in ks
            ]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

        pe_std_enc = math.sqrt(1 / cfg.motion_dim / 3)
        pe_std_dec = math.sqrt(1 / cfg.code_dim / 3)
        if cfg.motion_dim == ALLTALKEMICA_MEAN.shape[0]:
            mean, std = ALLTALKEMICA_MEAN, ALLTALKEMICA_STD
        else:  # non-standard motion dim (tests / custom datasets): identity stats
            mean = jnp.zeros((cfg.motion_dim,))
            std = jnp.ones((cfg.motion_dim,))
        return {
            "encoder": {
                "inp": nn.linear_init(keys[0], cfg.motion_dim, cfg.hidden_dim),
                "layers": tower(keys[1]),
                "out": nn.linear_init(keys[2], cfg.hidden_dim, cfg.code_dim),
            },
            "decoder": {
                "inp": nn.linear_init(keys[3], cfg.code_dim, cfg.hidden_dim),
                "layers": tower(keys[4]),
                "out": nn.linear_init(
                    keys[5], cfg.hidden_dim, cfg.motion_dim,
                    w_init=lambda k, s: nn.xavier_uniform(k, s, cfg.hidden_dim, cfg.motion_dim, gain=0.05),
                ),
            },
            "enc_pos_embed": nn.trunc_normal(keys[6], (1, 2 * self.window, cfg.motion_dim), std=pe_std_enc),
            "dec_pos_embed": nn.trunc_normal(keys[7], (1, 2 * self.window, cfg.code_dim), std=pe_std_dec),
            "motion_mean": jnp.asarray(mean),
            "motion_std": jnp.asarray(std),
        }

    # -- helpers ---------------------------------------------------------------

    def norm(self, params: nn.Params, motion: jnp.ndarray) -> jnp.ndarray:
        return (motion - params["motion_mean"]) / params["motion_std"]

    def unnorm(self, params: nn.Params, motion: jnp.ndarray) -> jnp.ndarray:
        return motion * params["motion_std"] + params["motion_mean"]

    def two_window_bias(self) -> jnp.ndarray:
        """Additive block mask over [prev, this] (bitwise_vae.py:68-76):
        prev positions are blind to current; current sees both."""
        w = self.window
        bias = jnp.zeros((2 * w, 2 * w), jnp.float32)
        bias = bias.at[:w, w:].set(-jnp.inf)
        return bias[None, None]

    def _encode_feat(self, params: nn.Params, motion: jnp.ndarray,
                     bias: Optional[jnp.ndarray], pos_len: int) -> jnp.ndarray:
        enc = params["encoder"]
        x = self.norm(params, motion) + params["enc_pos_embed"][:, :pos_len]
        feat = nn.leaky_relu(nn.linear(enc["inp"], x), 0.2)
        feat = _transformer_tower(enc["layers"], feat, self.cfg.num_heads, bias)
        return nn.linear(enc["out"], feat)

    # -- public API (parity with quant_to_vqidx / vqidx_to_* at
    #    bitwise_vae.py:79-125) -----------------------------------------------

    def encode_to_bits(self, params: nn.Params, prev_motion: jnp.ndarray,
                       this_motion: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Motion window(s) -> per-window multi-scale bits (B, 181, code_dim)."""
        w = self.window
        if this_motion is not None:
            motion = jnp.concatenate([prev_motion, this_motion], axis=1)
            enc_out = self._encode_feat(params, motion, self.two_window_bias(), 2 * w)
            _, prev_bits = self.quantizer.encode(enc_out[:, :w])
            _, this_bits = self.quantizer.encode(enc_out[:, w:])
            return prev_bits, this_bits
        enc_out = self._encode_feat(params, prev_motion, None, w)
        _, prev_bits = self.quantizer.encode(enc_out)
        return prev_bits, None

    def decode_from_bits(self, params: nn.Params, prev_bits: jnp.ndarray,
                         this_bits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Two windows of bits -> (prev_motion, this_motion), unnormalized."""
        w = self.window
        dec = params["decoder"]
        feat = jnp.concatenate(
            [self.quantizer.bits_to_feat(prev_bits), self.quantizer.bits_to_feat(this_bits)],
            axis=1,
        )
        x = feat + params["dec_pos_embed"]
        h = nn.leaky_relu(nn.linear(dec["inp"], x), 0.2)
        h = _transformer_tower(dec["layers"], h, self.cfg.num_heads, self.two_window_bias())
        motion = self.unnorm(params, nn.linear(dec["out"], h))
        return motion[:, :w], motion[:, w:]

    def bits_to_ms_feat(self, bits: jnp.ndarray) -> jnp.ndarray:
        """AR teacher inputs (vqidx_to_ms_vqfeat, bitwise_vae.py:117-119)."""
        return self.quantizer.bits_to_ms_feat(bits)

    def bits_to_ar_feat(self, level: int, bits: jnp.ndarray) -> jnp.ndarray:
        """Next-level AR decode input (vqidx_to_ar_vqfeat, bitwise_vae.py:123-125)."""
        return self.quantizer.bits_to_ar_feat(level, bits)

    # -- training --------------------------------------------------------------

    def reconstruct(self, params: nn.Params, prev_motion: jnp.ndarray,
                    this_motion: jnp.ndarray):
        """Full differentiable autoencode pass for training.

        Returns (recon_prev, recon_this, aux_losses) where aux_losses stacks the
        per-window BSQ entropy+commit terms. The reference ships no training
        code (README 'in preparation'); this follows its quantizer's training
        losses (bitwise_vae.py:316-327).
        """
        w = self.window
        motion = jnp.concatenate([prev_motion, this_motion], axis=1)
        enc_out = self._encode_feat(params, motion, self.two_window_bias(), 2 * w)
        q_prev, _, loss_prev = self.quantizer.encode_with_losses(enc_out[:, :w])
        q_this, _, loss_this = self.quantizer.encode_with_losses(enc_out[:, w:])
        dec = params["decoder"]
        x = jnp.concatenate([q_prev, q_this], axis=1) + params["dec_pos_embed"]
        h = nn.leaky_relu(nn.linear(dec["inp"], x), 0.2)
        h = _transformer_tower(dec["layers"], h, self.cfg.num_heads, self.two_window_bias())
        motion_out = self.unnorm(params, nn.linear(dec["out"], h))
        aux = jnp.stack([loss_prev, loss_this])
        return motion_out[:, :w], motion_out[:, w:], aux
