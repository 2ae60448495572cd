"""Binary Spherical Quantization (BSQ) and its multi-scale residual pyramid.

Lookup-free quantization: latents are L2-normalized onto the unit sphere and
binarized per-dimension to +/- 1/sqrt(C) (reference behavior:
app/modules/bitwise_vae.py:308-334). The multi-scale variant quantizes a
residual pyramid over the fixed scale schedule (1, 5, 25, 50, 100), area-
downsampling residuals and linearly-upsampling quantized values
(bitwise_vae.py:218-305).

TPU-first design: every resize in the pyramid is a constant matrix multiply
(ops/resample1d.py) so the whole encode/decode pyramid compiles into a handful
of small MXU matmuls with no gathers; all loops below are static Python loops
over the fixed schedule, unrolled at trace time.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resample1d import resize_area, resize_linear
from .nn import l2_normalize


def bsq_quantize(z: jnp.ndarray, code_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binarize a (pre-normalized) latent; returns (quantized, bits).

    quantized: +/- 1/sqrt(code_dim) values with straight-through gradients,
    bits: int32 in {0, 1}.
    """
    z = l2_normalize(z, axis=-1)
    q_scale = 1.0 / (code_dim ** 0.5)
    hard = jnp.where(z > 0, q_scale, -q_scale).astype(z.dtype)
    # straight-through estimator: forward = hard, backward = identity
    quantized = z + jax.lax.stop_gradient(hard - z)
    bits = (hard > 0).astype(jnp.int32)
    return quantized, bits


def bits_to_values(bits: jnp.ndarray, code_dim: int) -> jnp.ndarray:
    """{0,1} bits -> +/- 1/sqrt(code_dim) sphere values (bitwise_vae.py:267)."""
    return (bits.astype(jnp.float32) * 2.0 - 1.0) / (code_dim ** 0.5)


def bsq_entropy_loss(z: jnp.ndarray, code_dim: int,
                     inv_temperature: float = 100.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample and codebook soft entropy of the binary codes (training aux).

    Mirrors the reference's soft_entropy_loss (bitwise_vae.py:336-348): a
    sigmoid relaxation of each bit's probability; returns
    (per_sample_entropy, codebook_entropy).
    """
    p = jax.nn.sigmoid(-4.0 * z / (code_dim ** 0.5) * inv_temperature)
    prob = jnp.stack([p, 1.0 - p], axis=-1)  # (..., C, 2)

    def entropy(c, axis):
        return -jnp.sum(c * jnp.log(c + 1e-8), axis=axis)

    per_sample = jnp.mean(jnp.sum(entropy(prob, -1), axis=-1))
    avg_prob = jnp.mean(prob, axis=tuple(range(prob.ndim - 2)))  # (C, 2)
    codebook = jnp.sum(entropy(avg_prob, -1))
    return per_sample, codebook


class MultiScaleBSQ:
    """Multi-scale residual BSQ over a fixed scale schedule.

    Stateless (no learned parameters); bundles the schedule plus the exact
    resize semantics. All methods are jit-safe with static shapes.
    """

    def __init__(self, code_dim: int = 32, scale_schedule: Sequence[int] = (1, 5, 25, 50, 100)):
        self.code_dim = code_dim
        self.scale_schedule = tuple(scale_schedule)
        self.num_levels = len(self.scale_schedule)
        self.total_tokens = sum(self.scale_schedule)

    # -- encode ------------------------------------------------------------

    def encode(self, f: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Quantize (B, T, C) features into the residual pyramid.

        Returns (quantized_out (B, T, C), bits (B, sum(schedule), C)).
        Reference semantics: MultiScaleBSQ.forward (bitwise_vae.py:227-242).
        """
        t = f.shape[-2]
        assert t == self.scale_schedule[-1], f"expected T={self.scale_schedule[-1]}, got {t}"
        residual = f
        quantized_out = jnp.zeros_like(f)
        all_bits = []
        for pt in self.scale_schedule:
            r_down = resize_area(residual, pt)
            q, bits = bsq_quantize(r_down, self.code_dim)
            q_up = resize_linear(q, t)
            residual = residual - jax.lax.stop_gradient(q_up)
            quantized_out = quantized_out + q_up
            all_bits.append(bits)
        return quantized_out, jnp.concatenate(all_bits, axis=-2)

    def encode_with_losses(self, f: jnp.ndarray):
        """encode() plus the per-level BSQ aux losses (training path).

        Returns (quantized_out, bits, aux_losses (num_levels,)). Mirrors the
        entropy + commit combination at bitwise_vae.py:316-327 with the
        reference's fixed weights.
        """
        inv_temperature, entropy_w, commit_w = 100.0, 0.1, 0.2
        t = f.shape[-2]
        residual = f
        quantized_out = jnp.zeros_like(f)
        all_bits, all_losses = [], []
        for pt in self.scale_schedule:
            r_down = resize_area(residual, pt)
            z = l2_normalize(r_down, axis=-1)
            q, bits = bsq_quantize(r_down, self.code_dim)
            per_sample, codebook = bsq_entropy_loss(z, self.code_dim, inv_temperature)
            entropy_penalty = (per_sample - codebook) / inv_temperature
            commit = jnp.mean(jnp.sum((jax.lax.stop_gradient(q) - z) ** 2, axis=-1))
            all_losses.append(entropy_penalty * entropy_w + commit * commit_w)
            q_up = resize_linear(q, t)
            residual = residual - jax.lax.stop_gradient(q_up)
            quantized_out = quantized_out + q_up
            all_bits.append(bits)
        return quantized_out, jnp.concatenate(all_bits, axis=-2), jnp.stack(all_losses)

    def encode_with_flips(self, f: jnp.ndarray, flip_ratio: float, rng: jax.Array):
        """Encode with random bit flips at ``flip_ratio`` (training-time
        robustness augmentation / chaos-test hook; bitwise_vae.py:244-262)."""
        t = f.shape[-2]
        residual = f
        quantized_out = jnp.zeros_like(f)
        all_bits = []
        for pt in self.scale_schedule:
            r_down = resize_area(residual, pt)
            _, bits = bsq_quantize(r_down, self.code_dim)
            rng, sub = jax.random.split(rng)
            flip = jax.random.uniform(sub, bits.shape) < flip_ratio
            bits = jnp.where(flip, 1 - bits, bits)
            q = bits_to_values(bits, self.code_dim)
            q_up = resize_linear(q, t)
            residual = residual - q_up
            quantized_out = quantized_out + q_up
            all_bits.append(bits)
        return quantized_out, jnp.concatenate(all_bits, axis=-2)

    # -- decode ------------------------------------------------------------

    def _split_levels(self, bits: jnp.ndarray) -> list:
        out, start = [], 0
        for pt in self.scale_schedule:
            out.append(bits[..., start : start + pt, :])
            start += pt
        return out

    def bits_to_feat(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Reconstruct the final (B, T, C) feature from all-level bits
        (vqidx_to_feat(multi_scale=False), bitwise_vae.py:281-288)."""
        t = self.scale_schedule[-1]
        levels = self._split_levels(bits)
        f_hat = jnp.zeros(bits.shape[:-2] + (t, self.code_dim), jnp.float32)
        for lvl, lvl_bits in enumerate(levels):
            vals = bits_to_values(lvl_bits, self.code_dim)
            f_hat = f_hat + (resize_linear(vals, t) if lvl < self.num_levels - 1 else vals)
        return f_hat

    def bits_to_ms_feat(self, bits: jnp.ndarray) -> jnp.ndarray:
        """Per-scale AR teacher inputs from all-level bits
        (vqidx_to_feat(multi_scale=True), bitwise_vae.py:269-279).

        Returns (B, sum(schedule[1:]), C): for each level l < last, the partial
        reconstruction through level l, area-resized to schedule[l+1].
        """
        t = self.scale_schedule[-1]
        levels = self._split_levels(bits)
        f_hat = jnp.zeros(bits.shape[:-2] + (t, self.code_dim), jnp.float32)
        next_scales = []
        for lvl in range(self.num_levels - 1):
            vals = bits_to_values(levels[lvl], self.code_dim)
            f_hat = f_hat + resize_linear(vals, t)
            next_scales.append(resize_area(f_hat, self.scale_schedule[lvl + 1]))
        return jnp.concatenate(next_scales, axis=-2)

    def bits_to_ar_feat(self, this_level: int, bits: jnp.ndarray) -> jnp.ndarray:
        """Next-level AR input during decode (vqidx_to_ar_vqfeat,
        bitwise_vae.py:291-305).

        ``bits`` covers levels 0..this_level (sum(schedule[:this_level+1]) tokens);
        returns the concatenated inputs for levels 1..this_level+1.
        """
        t = self.scale_schedule[-1]
        f_hat = jnp.zeros(bits.shape[:-2] + (t, self.code_dim), jnp.float32)
        start = 0
        next_scales = []
        for lvl in range(this_level + 1):
            pt = self.scale_schedule[lvl]
            vals = bits_to_values(bits[..., start : start + pt, :], self.code_dim)
            start += pt
            f_hat = f_hat + resize_linear(vals, t)
            next_scales.append(resize_area(f_hat, self.scale_schedule[lvl + 1]))
        return jnp.concatenate(next_scales, axis=-2)
