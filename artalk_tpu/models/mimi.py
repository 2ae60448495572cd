"""Mimi neural audio codec -- encoder path, TPU-native.

The reference's alternate audio frontend (``AUDIO_ENCODER='mimi'``,
app/models.py:28-30; app/modules/mimi.py:14-19): 16 kHz audio is resampled to
24 kHz, encoded by the Mimi codec (SEANet causal conv encoder -> RoPE
transformer -> 2x downsample -> split residual vector quantization), and the
RVQ codes are immediately decoded back to continuous 512-d embeddings at
12.5 Hz which serve as the AR conditioning.

This is a from-scratch JAX implementation of that encode path matching HF
``MimiModel`` semantics (verified against it in tests/test_mimi.py):
causal-pad convs with the EnCodec extra-padding rule, ELU SEANet blocks,
llama-style attention with rotary embeddings + sliding-window causal mask +
LayerScale, replicate-padded downsample, and Euclidean-codebook RVQ with
usage-normalized embeddings.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nn


@dataclasses.dataclass(frozen=True)
class MimiEncoderConfig:
    sampling_rate: int = 24000
    num_filters: int = 64
    num_residual_layers: int = 1
    ratios: Sequence[int] = (8, 6, 5, 4)   # upsampling_ratios (decoder order)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    hidden_size: int = 512
    num_hidden_layers: int = 8
    num_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    layer_scale: float = 0.01

    def num_output_frames(self, samples_24k: int) -> int:
        length = samples_24k
        for ratio in reversed(self.ratios):
            length = -(-length // ratio)
        return -(-length // 2)  # final stride-2 downsample


def _causal_pad_amounts(length: int, kernel: int, stride: int, dilation: int
                        ) -> Tuple[int, int]:
    """(left, right) causal padding with the EnCodec extra-padding rule
    (MimiConv1d._get_extra_padding_for_conv1d): left = k_eff - stride; right
    pads up to the ideal length so no sample is dropped."""
    k_eff = (kernel - 1) * dilation + 1
    padding_total = k_eff - stride
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - padding_total
    return padding_total, ideal - length


def _causal_conv(p: nn.Params, x: jnp.ndarray, stride: int = 1,
                 dilation: int = 1, pad_mode: str = "constant") -> jnp.ndarray:
    """Causal conv on (B, C, T), torch weight layout (out, in, k)."""
    k = p["w"].shape[-1]
    left, right = _causal_pad_amounts(x.shape[-1], k, stride, dilation)
    if pad_mode == "replicate":
        x = jnp.concatenate(
            [jnp.repeat(x[..., :1], left, axis=-1), x,
             jnp.repeat(x[..., -1:], right, axis=-1)] if right > 0 else
            [jnp.repeat(x[..., :1], left, axis=-1), x], axis=-1)
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (left, right)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), [(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def _rope(x: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Llama-style rotary embedding over (B, H, T, hd)."""
    hd = x.shape[-1]
    t = x.shape[-2]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    pos = jnp.arange(t, dtype=jnp.float32)
    freqs = pos[:, None] * inv_freq[None, :]          # (T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)    # (T, hd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


class MimiEncoder:
    """Mimi encode path: 24 kHz audio -> 12.5 Hz RVQ-decoded embeddings."""

    def __init__(self, cfg: MimiEncoderConfig = MimiEncoderConfig()):
        self.cfg = cfg
        # SEANet channel plan
        self.enc_ratios = list(reversed(cfg.ratios))  # encoder order

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> nn.Params:
        cfg = self.cfg
        keys = jax.random.split(key, 64)
        ki = iter(range(64))

        def conv(cin, cout, k, bias=True):
            fan_in = cin * k
            p = {"w": nn.kaiming_uniform(keys[next(ki)], (cout, cin, k), fan_in=fan_in)}
            if bias:
                p["b"] = jnp.zeros((cout,))
            return p

        blocks: List[dict] = []
        scaling = 1
        current = cfg.num_filters
        seanet = {"init_conv": conv(1, cfg.num_filters, cfg.kernel_size)}
        for ratio in self.enc_ratios:
            current = scaling * cfg.num_filters
            res = []
            for j in range(cfg.num_residual_layers):
                hidden = current // cfg.compress
                res.append({
                    "conv1": conv(current, hidden, cfg.residual_kernel_size),
                    "conv2": conv(hidden, current, 1),
                })
            blocks.append({
                "resnets": res,
                "down": conv(current, current * 2, ratio * 2),
            })
            scaling *= 2
        seanet["blocks"] = blocks
        seanet["final_conv"] = conv(scaling * cfg.num_filters, cfg.hidden_size,
                                    cfg.last_kernel_size)

        d = cfg.hidden_size

        def layer(k):
            ks = jax.random.split(k, 4)
            return {
                "q": nn.linear_init(ks[0], d, cfg.num_heads * cfg.head_dim, bias=False),
                "k": nn.linear_init(ks[1], d, cfg.num_heads * cfg.head_dim, bias=False),
                "v": nn.linear_init(ks[2], d, cfg.num_heads * cfg.head_dim, bias=False),
                "o": nn.linear_init(ks[3], cfg.num_heads * cfg.head_dim, d, bias=False),
                "norm1": nn.layer_norm_init(d),
                "norm2": nn.layer_norm_init(d),
                "fc1": nn.linear_init(jax.random.fold_in(k, 5), d,
                                      cfg.intermediate_size, bias=False),
                "fc2": nn.linear_init(jax.random.fold_in(k, 6),
                                      cfg.intermediate_size, d, bias=False),
                "ls_attn": jnp.full((d,), cfg.layer_scale),
                "ls_mlp": jnp.full((d,), cfg.layer_scale),
            }

        layers = [layer(keys[next(ki)]) for _ in range(cfg.num_hidden_layers)]

        def rvq(n):
            cb = jax.random.normal(keys[next(ki)],
                                   (n, cfg.codebook_size, cfg.codebook_dim))
            return {
                "embed_sum": cb,
                "cluster_usage": jnp.ones((n, cfg.codebook_size)),
                "input_proj": conv(cfg.hidden_size, cfg.codebook_dim, 1, bias=False),
                "output_proj": conv(cfg.codebook_dim, cfg.hidden_size, 1, bias=False),
            }

        return {
            "seanet": seanet,
            "transformer": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
            "downsample": conv(d, d, 4, bias=False),
            "semantic_rvq": rvq(cfg.num_semantic_quantizers),
            "acoustic_rvq": rvq(cfg.num_quantizers - cfg.num_semantic_quantizers),
        }

    # --------------------------------------------------------------- forward

    def seanet_encode(self, params: nn.Params, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T_samples) 24 kHz -> (B, hidden, T_frames) at 25 Hz."""
        cfg = self.cfg
        p = params["seanet"]
        x = _causal_conv(p["init_conv"], audio[:, None, :])
        for bidx, block in enumerate(p["blocks"]):
            stride = self.enc_ratios[bidx]
            for j, res in enumerate(block["resnets"]):
                h = jax.nn.elu(x)
                h = _causal_conv(res["conv1"], h,
                                 dilation=cfg.dilation_growth_rate ** j)
                h = jax.nn.elu(h)
                h = _causal_conv(res["conv2"], h)
                x = x + h
            x = jax.nn.elu(x)
            x = _causal_conv(block["down"], x, stride=stride)
        x = jax.nn.elu(x)
        return _causal_conv(p["final_conv"], x)

    def transform(self, params: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
        """RoPE transformer over (B, T, hidden) with sliding-window causal mask."""
        cfg = self.cfg
        t = x.shape[1]
        i = np.arange(t)[:, None]
        j = np.arange(t)[None, :]
        causal = (j <= i) & (i - j < cfg.sliding_window)
        bias = jnp.asarray(np.where(causal, 0.0, -np.inf).astype(np.float32))[None, None]

        # One fused (d, 3d) qkv matmul per layer (bias-free projections over
        # the same operand — column-independent, numerically identical; cuts
        # per-layer op count in the scan).
        layers = params["transformer"]
        w_qkv = jnp.concatenate(
            [layers["q"]["w"], layers["k"]["w"], layers["v"]["w"]], axis=-1)

        def body(h, inp):
            p, w_qkv_l = inp
            y = nn.layer_norm_apply(p["norm1"], h, eps=cfg.norm_eps)
            qkv = jnp.einsum("...i,io->...o", y, w_qkv_l)
            q, k, v = (nn.split_heads(t, cfg.num_heads)
                       for t in jnp.split(qkv, 3, axis=-1))
            q = _rope(q, cfg.rope_theta)
            k = _rope(k, cfg.rope_theta)
            attn = nn.merge_heads(
                nn.sdpa(q, k, v, scale=cfg.head_dim ** -0.5, bias=bias))
            h = h + nn.linear(p["o"], attn) * p["ls_attn"]
            y = nn.layer_norm_apply(p["norm2"], h, eps=cfg.norm_eps)
            h = h + nn.linear(p["fc2"], nn.gelu_erf(nn.linear(p["fc1"], y))) * p["ls_mlp"]
            return h, None

        x, _ = jax.lax.scan(body, x, (layers, w_qkv))
        return x

    # ----------------------------------------------------------------- quant

    @staticmethod
    def _codebooks(rvq: nn.Params) -> jnp.ndarray:
        """(n, codebook_size, dim): usage-normalized embeddings
        (MimiEuclideanCodebook.embed)."""
        usage = jnp.clip(rvq["cluster_usage"], 1e-5, None)
        return rvq["embed_sum"] / usage[..., None]

    def _rvq_encode(self, rvq: nn.Params, emb: jnp.ndarray) -> jnp.ndarray:
        """(B, hidden, T) -> codes (B, n, T) via residual nearest-centroid."""
        x = jnp.einsum("oik,bit->bot", rvq["input_proj"]["w"], emb)  # 1x1 conv
        books = self._codebooks(rvq)
        residual = x.transpose(0, 2, 1)                     # (B, T, D)
        codes = []
        for q in range(books.shape[0]):
            book = books[q]                                 # (K, D)
            d2 = (jnp.sum(residual ** 2, -1, keepdims=True)
                  - 2.0 * residual @ book.T
                  + jnp.sum(book ** 2, -1)[None, None])
            idx = jnp.argmin(d2, axis=-1)                   # (B, T)
            codes.append(idx)
            residual = residual - book[idx]
        return jnp.stack(codes, axis=1)                     # (B, n, T)

    def _rvq_decode(self, rvq: nn.Params, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, n, T) -> (B, hidden, T)."""
        books = self._codebooks(rvq)
        total = jnp.zeros(codes.shape[:1] + (codes.shape[-1], books.shape[-1]))
        for q in range(books.shape[0]):
            total = total + books[q][codes[:, q]]
        return jnp.einsum("oik,bti->bot", rvq["output_proj"]["w"],
                          total)                            # (B, hidden, T)

    def encode_codes(self, params: nn.Params, audio_24k: jnp.ndarray) -> jnp.ndarray:
        """(B, T_samples) -> RVQ codes (B, num_quantizers, T_frames)."""
        emb = self.seanet_encode(params, audio_24k)
        emb = self.transform(params, emb.transpose(0, 2, 1)).transpose(0, 2, 1)
        emb = _causal_conv(params["downsample"], emb, stride=2,
                           pad_mode="replicate")
        semantic = self._rvq_encode(params["semantic_rvq"], emb)
        acoustic = self._rvq_encode(params["acoustic_rvq"], emb)
        return jnp.concatenate([semantic, acoustic], axis=1)

    def decode_codes(self, params: nn.Params, codes: jnp.ndarray) -> jnp.ndarray:
        """codes -> continuous embeddings (B, hidden, T)
        (SplitRVQ.decode: semantic + acoustic sums)."""
        ns = self.cfg.num_semantic_quantizers
        return (self._rvq_decode(params["semantic_rvq"], codes[:, :ns])
                + self._rvq_decode(params["acoustic_rvq"], codes[:, ns:]))

    def __call__(self, params: nn.Params, audio_16k: jnp.ndarray) -> jnp.ndarray:
        """Reference wrapper semantics (mimi.py:14-19): 16 kHz audio ->
        (B, T_frames, hidden) embeddings at 12.5 Hz."""
        audio_24k = resample_16k_to_24k(audio_16k)
        codes = self.encode_codes(params, audio_24k)
        emb = self.decode_codes(params, codes)
        return emb.transpose(0, 2, 1)

    def num_output_frames(self, num_samples_16k: int) -> int:
        return self.cfg.num_output_frames(num_samples_16k * 3 // 2)


def resample_16k_to_24k(audio: jnp.ndarray) -> jnp.ndarray:
    """Rational 2->3 polyphase upsample (Kaiser-windowed sinc), in-graph.

    Equivalent of the reference's torchaudio.Resample(16000, 24000)
    (mimi.py:16) as a dilated convolution so it fuses into the jit graph.
    """
    up, down = 3, 2
    max_rate = max(up, down)
    half_len = 10 * max_rate
    m = np.arange(-half_len, half_len + 1, dtype=np.float64)
    cutoff = 0.5 / max_rate
    sinc = np.sinc(2 * cutoff * m)
    win = np.kaiser(2 * half_len + 1, 5.0)
    filt = (2 * cutoff * up * sinc * win).astype(np.float32)
    w = jnp.asarray(filt)[None, None, :]                 # (out=1, in=1, k)
    x = audio[:, None, :]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(down,), padding=[(half_len, half_len)],
        lhs_dilation=(up,), dimension_numbers=("NCH", "OIH", "NCH"))
    target = -(-audio.shape[-1] * up // down)
    return y[:, 0, :target]
