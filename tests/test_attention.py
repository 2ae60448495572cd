"""Pallas flash attention vs the XLA sdpa reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.models.nn import sdpa
from artalk_tpu.ops.attention import flash_attention


def _qkv(rng, b=2, h=3, lq=181, lk=362, hd=64):
    q = rng.standard_normal((b, h, lq, hd)).astype(np.float32)
    k = rng.standard_normal((b, h, lk, hd)).astype(np.float32)
    v = rng.standard_normal((b, h, lk, hd)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_no_bias_matches_sdpa(rng):
    q, k, v = _qkv(rng)
    ref = np.asarray(sdpa(q, k, v, scale=0.125))
    got = np.asarray(flash_attention(q, k, v, scale=0.125, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_var_mask_bias_matches_sdpa(rng):
    """The AR model's VAR mask shape: prev prefix all-visible + level-causal."""
    q, k, v = _qkv(rng, lq=8, lk=16)
    lvl = np.array([0, 1, 1, 2, 2, 2, 3, 3])
    mask = np.where(lvl[:, None] >= lvl[None, :], 0.0, -np.inf)
    bias = np.concatenate([np.zeros((8, 8)), mask], axis=1).astype(np.float32)
    bias_j = jnp.asarray(bias)[None, None]
    ref = np.asarray(sdpa(q, k, v, scale=1.0, bias=bias_j))
    got = np.asarray(flash_attention(q, k, v, bias=bias_j, scale=1.0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("lq,lk", [(100, 100), (181, 362), (57, 300)])
def test_padding_lengths(lq, lk, rng):
    """Non-block-multiple lengths are padded internally and trimmed back."""
    q, k, v = _qkv(rng, b=1, h=2, lq=lq, lk=lk)
    ref = np.asarray(sdpa(q, k, v, scale=0.2))
    got = np.asarray(flash_attention(q, k, v, scale=0.2, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_long_sequence_blockwise(rng):
    """Multiple kv blocks exercise the online-softmax accumulation."""
    q, k, v = _qkv(rng, b=1, h=1, lq=256, lk=640, hd=32)
    ref = np.asarray(sdpa(q, k, v, scale=0.1))
    got = np.asarray(flash_attention(q, k, v, scale=0.1, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_gradients_match_sdpa(rng):
    """Custom VJP: grads through the Pallas forward == grads of the XLA sdpa
    reference, for q/k/v and the additive bias."""
    import jax

    q, k, v = _qkv(rng, b=1, h=2, lq=32, lk=48, hd=16)
    bias = jnp.asarray(rng.standard_normal((1, 1, 32, 48)).astype(np.float32))

    def loss_flash(q, k, v, bias):
        o = flash_attention(q, k, v, bias=bias, scale=0.25, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v, bias):
        o = sdpa(q, k, v, scale=0.25, bias=bias)
        return jnp.sum(o * jnp.cos(o))

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5)
    # bias grad keeps the broadcast shape
    assert got[3].shape == bias.shape


def test_gradients_no_bias(rng):
    import jax

    q, k, v = _qkv(rng, b=1, h=1, lq=16, lk=16, hd=8)
    g1 = jax.grad(lambda q: jnp.sum(
        flash_attention(q, k, v, scale=1.0, interpret=True) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(sdpa(q, k, v, scale=1.0) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)
