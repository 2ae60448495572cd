"""Fused blockwise (flash) attention with additive bias, Pallas TPU.

MEASURED AND RETIRED for the production sites (round-3 A/B,
tools/bench_flash_attention.py, v5e): XLA's fused SDPA wins at every length
in play --

    wav2vec encode site (199 tok, 24 layers): 8.66 ms vs 9.37 ms (+8.2%)
    standalone B=1 H=16 hd=64: seq 256 +21%, 512 +49%, 1024 +161%,
    2048 +33%, 4096 +36% for the Pallas kernel

so ``use_flash_attention`` stays False everywhere and this kernel is kept
only as the long-window scaling artifact (online-softmax accumulator,
additive-bias support, shard_map/ring-attention-ready blocking). Known
limitation, found by the same sweep: K/V are staged whole into VMEM per
grid step (BlockSpec (1, pk, hd)), so kv_len is capped at ~4096 on a 16MB
VMEM part -- a true O(block)-VMEM variant would DMA K/V blocks from HBM and
only matters beyond the materialized-bias regime.

Numerics: logits and softmax accumulate in f32 regardless of input dtype
(matches models/nn.py sdpa semantics).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLK = 128   # query rows per grid step
KBLK = 128   # kv columns per inner step
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float,
                  kv_len: int, with_bias: bool):
    """One (batch*head, q-block) grid step: online softmax over kv blocks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (QBLK, hd)
    hd = q.shape[-1]
    num_kv = kv_len // KBLK

    def body(i, carry):
        acc, m, l = carry                              # (QBLK, hd), (QBLK,1), (QBLK,1)
        k = k_ref[0, pl.ds(i * KBLK, KBLK), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * KBLK, KBLK), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (QBLK, KBLK)
        if with_bias:
            s = s + bias_ref[0, :, pl.ds(i * KBLK, KBLK)]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc0 = jnp.zeros((QBLK, hd), jnp.float32)
    m0 = jnp.full((QBLK, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((QBLK, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _flash_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                bias: Optional[jnp.ndarray], scale: float,
                interpret: bool) -> jnp.ndarray:
    b, h, lq, hd = q.shape
    lk = k.shape[2]
    pq = (lq + QBLK - 1) // QBLK * QBLK
    pk = (lk + KBLK - 1) // KBLK * KBLK

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pq - lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk - lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk - lk), (0, 0)))

    # fold kv padding into the bias so padded columns never win the softmax
    need_bias = bias is not None or pk != lk
    if need_bias:
        full = jnp.zeros((b, h, pq, pk), jnp.float32)
        if bias is not None:
            full = full.at[:, :, :lq, :lk].set(
                jnp.broadcast_to(bias, (b, h, lq, lk)).astype(jnp.float32))
        if pk != lk:
            full = full.at[:, :, :, lk:].set(NEG_INF)
        biasf = full.reshape(b * h, pq, pk)
    else:
        biasf = jnp.zeros((b * h, 1, 1), jnp.float32)  # placeholder

    qf = qp.reshape(b * h, pq, hd)
    kf = kp.reshape(b * h, pk, hd)
    vf = vp.reshape(b * h, pk, hd)

    grid = (b * h, pq // QBLK)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=pk,
                          with_bias=need_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, QBLK, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QBLK, pk) if need_bias else (1, 1, 1),
                         (lambda i, j: (i, j, 0)) if need_bias else
                         (lambda i, j: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QBLK, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, pq, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, biasf)
    return out.reshape(b, h, pq, hd)[:, :, :lq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, bias, scale, interpret):
    return _flash_impl(q, k, v, bias, scale, interpret)


def _flash_core_fwd(q, k, v, bias, scale, interpret):
    return _flash_core(q, k, v, bias, scale, interpret), (q, k, v, bias)


def _flash_core_bwd(scale, interpret, res, g):
    """Standard softmax-attention VJP with an f32 recompute of the logits.

    The Pallas kernel is forward-only (inference is the hot path); training
    gradients recompute the (Lq, Lk) probabilities in XLA -- the same memory
    class as the additive bias the forward already materializes. A blockwise
    Pallas backward only pays off once windows outgrow that bias, which the
    181-token VAR windows never do (SURVEY 5.7)."""
    q, k, v, bias = res

    def ref(q, k, v, bias):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        if bias is not None:
            s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        return o.astype(q.dtype)

    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None, *, scale: float = 1.0,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention over (B, H, Lq, hd) x (B, H, Lk, hd) [+ bias].

    bias: additive logits bias broadcastable to (B, H, Lq, Lk) -- e.g. the
    VAR level mask (models.py:124-135) or the VAE two-window block mask
    (bitwise_vae.py:68-76). Lengths are padded to the block sizes internally;
    padded kv columns are masked with -inf via the bias path.

    Differentiable: gradients flow through a custom VJP (f32 softmax
    recompute), so the kernel can sit inside training graphs.
    """
    return _flash_core(q, k, v, bias, scale, interpret)
