"""Minimal pure-functional NN primitives with explicit parameter pytrees.

Parameters are plain nested dicts of ``jnp.ndarray`` -- fully transparent to
jit/scan/vmap/pjit, trivially shardable with ``jax.sharding``, and directly
mappable from/to external checkpoints. Weight layouts follow the JAX
convention: linear weights are (in, out) so forward is ``x @ w`` (row-major
activations hit the MXU without transposes).

Initializers replicate the torch defaults the reference relies on so that a
randomly-initialized model here has the same statistics as a
randomly-initialized reference model.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def uniform_init(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform(key, shape, fan_in: int, a: float = math.sqrt(5), dtype=jnp.float32):
    """torch nn.Linear/Conv default weight init (kaiming_uniform with a=sqrt(5))."""
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return uniform_init(key, shape, bound, dtype)


def trunc_normal(key, shape, std: float = 1.0, mean: float = 0.0,
                 a: float = -2.0, b: float = 2.0, dtype=jnp.float32):
    """Truncated normal matching nn.init.trunc_normal_: ``a``/``b`` are
    ABSOLUTE bounds (torch semantics), not multiples of std. With the small
    stds the reference uses (e.g. 0.02 for pos/lvl embeddings) the default
    (-2, 2) window is effectively untruncated; truncating at +/-2 sigma
    instead would clip 4.6% of the mass and shrink the effective std ~12%."""
    lo = max((a - mean) / std, -10.0)
    hi = min((b - mean) / std, 10.0)
    x = jax.random.truncated_normal(key, lo, hi, shape, dtype)
    return x * std + mean


def xavier_uniform(key, shape, fan_in: int, fan_out: int, gain: float = 1.0, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return uniform_init(key, shape, bound, dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                w_init=None, dtype=jnp.float32) -> Params:
    """Linear layer params; default init matches torch nn.Linear."""
    kw, kb = jax.random.split(key)
    if w_init is None:
        w = kaiming_uniform(kw, (in_dim, out_dim), fan_in=in_dim, dtype=dtype)
    else:
        w = w_init(kw, (in_dim, out_dim))
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["b"] = uniform_init(kb, (out_dim,), bound, dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.einsum("...i,io->...o", x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Normalization / activations
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, eps: float = 1e-5,
               scale: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    # statistics always in f32 (stable under bf16 activations)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return layer_norm(x, eps=eps, scale=p["scale"], bias=p["bias"])


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with tanh approximation (nn.GELU(approximate='tanh'))."""
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (torch default; used by HF wav2vec2 and nn.Transformer)."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


# ---------------------------------------------------------------------------
# Attention (XLA path; Pallas fused kernel lives in ops/attention.py)
# ---------------------------------------------------------------------------


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, C) -> (B, H, L, c)."""
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, c) -> (B, L, C)."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         scale: float | jnp.ndarray,
         bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, c) tensors, f32 softmax."""
    logits = jnp.einsum("bhqc,bhkc->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkc->bhqc", weights, v)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches F.normalize: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Vanilla sinusoidal positional encoding table (max_len, d_model)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)
