"""Multi-scale BSQ parity vs an independent torch oracle of the same math."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from artalk_tpu.models.bsq import MultiScaleBSQ, bits_to_values, bsq_quantize

SCHEDULE = (1, 5, 25, 50, 100)
CODE_DIM = 32


def torch_ms_bsq_encode(f):
    """Oracle: residual BSQ pyramid with torch's own interpolate ops."""
    t = f.shape[1]
    residual = f
    all_bits = []
    for pt in SCHEDULE:
        r = (
            F.interpolate(residual.permute(0, 2, 1), size=pt, mode="area").permute(0, 2, 1)
            if pt != t else residual
        )
        z = F.normalize(r, dim=-1)
        q = torch.where(z > 0, 1.0, -1.0) / (CODE_DIM ** 0.5)
        bits = (q > 0).int()
        q_up = (
            F.interpolate(q.permute(0, 2, 1), size=t, mode="linear").permute(0, 2, 1)
            if pt != t else q
        )
        residual = residual - q_up
        all_bits.append(bits)
    return torch.cat(all_bits, dim=1)


def torch_bits_to_feat(bits):
    t = SCHEDULE[-1]
    vals = (bits.float() * 2 - 1.0) / (CODE_DIM ** 0.5)
    f_hat = torch.zeros(bits.shape[0], t, CODE_DIM)
    start = 0
    for lvl, pt in enumerate(SCHEDULE):
        v = vals[:, start : start + pt]
        start += pt
        if lvl < len(SCHEDULE) - 1:
            v = F.interpolate(v.permute(0, 2, 1), size=t, mode="linear").permute(0, 2, 1)
        f_hat = f_hat + v
    return f_hat


def test_encode_bits_match_torch_oracle(rng):
    """Bits match the torch oracle except where the residual latent is ~0:
    sign(~0) is not stable across frameworks (different accumulation order),
    and such ties carry no information. Require < 0.1% tie-flips."""
    f = rng.standard_normal((2, 100, CODE_DIM)).astype(np.float32)
    q = MultiScaleBSQ(CODE_DIM, SCHEDULE)
    _, bits = q.encode(jnp.asarray(f))
    ref_bits = torch_ms_bsq_encode(torch.from_numpy(f)).numpy()
    assert bits.shape == (2, sum(SCHEDULE), CODE_DIM)
    mismatch = np.asarray(bits) != ref_bits
    assert mismatch.mean() < 1e-3, f"{mismatch.mean():.2%} bits differ"


def test_bits_to_feat_matches_oracle(rng):
    bits = (rng.random((2, sum(SCHEDULE), CODE_DIM)) > 0.5).astype(np.int32)
    q = MultiScaleBSQ(CODE_DIM, SCHEDULE)
    got = np.asarray(q.bits_to_feat(jnp.asarray(bits)))
    ref = torch_bits_to_feat(torch.from_numpy(bits)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ms_feat_prefix_consistency(rng):
    """bits_to_ar_feat at the final level must equal bits_to_ms_feat
    (they are the incremental and batch forms of the same pyramid)."""
    bits = (rng.random((1, sum(SCHEDULE), CODE_DIM)) > 0.5).astype(np.int32)
    q = MultiScaleBSQ(CODE_DIM, SCHEDULE)
    ms = np.asarray(q.bits_to_ms_feat(jnp.asarray(bits)))
    ar = np.asarray(q.bits_to_ar_feat(len(SCHEDULE) - 2, jnp.asarray(bits[:, : sum(SCHEDULE[:-1])])))
    assert ms.shape == (1, sum(SCHEDULE[1:]), CODE_DIM)
    np.testing.assert_allclose(ar, ms, atol=1e-6)


def test_ar_feat_incremental_prefixes(rng):
    """Earlier-level AR inputs are prefixes of later-level AR inputs — the
    invariant the KV-cached decoder relies on."""
    bits = (rng.random((1, sum(SCHEDULE), CODE_DIM)) > 0.5).astype(np.int32)
    q = MultiScaleBSQ(CODE_DIM, SCHEDULE)
    feats = [
        np.asarray(q.bits_to_ar_feat(lvl, jnp.asarray(bits[:, : sum(SCHEDULE[: lvl + 1])])))
        for lvl in range(len(SCHEDULE) - 1)
    ]
    for lvl in range(len(feats) - 1):
        n = feats[lvl].shape[1]
        np.testing.assert_allclose(feats[lvl + 1][:, :n], feats[lvl], atol=1e-6)


def test_quantizer_reduces_residual(rng):
    """Each pyramid level should reduce the residual energy of a unit-sphere
    signal — sanity that encode actually quantizes toward the input."""
    f = rng.standard_normal((1, 100, CODE_DIM)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    q = MultiScaleBSQ(CODE_DIM, SCHEDULE)
    quantized, bits = q.encode(jnp.asarray(f))
    recon = np.asarray(q.bits_to_feat(bits))
    np.testing.assert_allclose(np.asarray(quantized), recon, atol=1e-6)
    err = np.mean((recon - f) ** 2)
    assert err < np.mean(f ** 2)


def test_bsq_quantize_values():
    z = jnp.asarray(np.array([[[0.5, -0.2, 0.0, 1.0]]], dtype=np.float32))
    q, bits = bsq_quantize(z, 4)
    np.testing.assert_allclose(np.asarray(q)[0, 0], [0.5, -0.5, -0.5, 0.5])
    np.testing.assert_array_equal(np.asarray(bits)[0, 0], [1, 0, 0, 1])
    np.testing.assert_allclose(
        np.asarray(bits_to_values(bits, 4))[0, 0], [0.5, -0.5, -0.5, 0.5]
    )
