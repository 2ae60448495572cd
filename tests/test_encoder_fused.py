"""Fused weight-streaming encoder kernel (ops/encoder_block_stack.py) parity.

The fused path must reproduce ``Wav2VecEncoder.encode``'s XLA scan: same
pre-LN layer structure, same erf GELU, same softmax attention. It is opt-in
(cfg.fused_ar, stable-LN layout; batch 1 direct, bf16/int8 batches mapped
per window) and tiled differently (fc2 split into row chunks), so parity
is to atol, not bit-pinned.

Kernels run in interpret mode on CPU (as all Pallas kernels in CI).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models.ar_model import BitwiseARModel
from artalk_tpu.models.wav2vec import Wav2VecEncoder

SMALL = Wav2VecConfig(
    conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)

# production lane/tile geometry (1024 wide, 16 heads, 4096 hidden) on a
# short sequence + 2 layers to keep interpret mode fast
PROD_GEO = dataclasses.replace(SMALL, hidden_size=1024, num_hidden_layers=2,
                               num_attention_heads=16,
                               intermediate_size=4096)


def _setup(cfg, seq=9, batch=1, key=0):
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(key))
    feats = jax.random.normal(
        jax.random.PRNGKey(key + 1), (batch, seq, cfg.conv_dim[-1])) * 0.5
    return enc, params, feats


@pytest.mark.parametrize("cfg,seq", [(SMALL, 9), (PROD_GEO, 50)],
                         ids=["small", "prod-geo"])
def test_fused_encoder_matches_xla(cfg, seq):
    enc, params, feats = _setup(cfg, seq=seq)
    y_x = enc.encode(params, feats)
    pack = enc.pack_fused(params)
    y_f = enc.encode(params, feats, fused_pack=pack)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               atol=3e-5, rtol=3e-5)


def test_fused_encoder_bf16_close_to_f32():
    """bf16 pack: kernel output must stay within bf16 rounding of the f32
    XLA truth (the fast-mode pairing compares two different bf16 rounding
    schedules, so the bound is loose)."""
    enc, params, feats = _setup(SMALL)
    y_x = enc.encode(params, feats)
    pack = enc.pack_fused(params, dtype=jnp.bfloat16)
    y_f = enc.encode(params, feats, fused_pack=pack)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               atol=0.08, rtol=0.08)


def test_fused_encoder_int8_close_to_f32():
    """int8 weight-only pack: kernel output must stay within quantization
    noise of the f32 XLA truth (per-output-channel symmetric int8, bf16
    compute)."""
    enc, params, feats = _setup(SMALL)
    y_x = enc.encode(params, feats)
    pack = enc.pack_fused(params, dtype=jnp.int8)
    assert pack["wtiles"].dtype == jnp.int8 and "scales" in pack
    y_q = enc.encode(params, feats, fused_pack=pack)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_x),
                               atol=0.15, rtol=0.15)


def test_fused_encoder_batch_falls_back():
    """batch > 1 with an f32 pack must silently keep the XLA scan
    (bit-identical to no pack): the half-width HIGHEST-precision f32 tiles
    are a parity artifact, not a perf path."""
    enc, params, feats = _setup(SMALL, batch=2)
    pack = enc.pack_fused(params)
    y_pack = enc.encode(params, feats, fused_pack=pack)
    y_x = enc.encode(params, feats)
    assert np.array_equal(np.asarray(y_pack), np.asarray(y_x))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8],
                         ids=["bf16", "int8"])
def test_fused_encoder_batched_map(dtype):
    """batch > 1 with a bf16/int8 pack lax.maps the batch-1 kernel over the
    window axis (the offline batched-windows encode path). Each window's
    result must match running that window alone through the kernel
    bit-for-bit, and stay within quantization noise of the XLA scan."""
    enc, params, feats = _setup(SMALL, batch=3, seq=9)
    pack = enc.pack_fused(params, dtype=dtype)
    y_map = enc.encode(params, feats, fused_pack=pack)
    for i in range(feats.shape[0]):
        y_one = enc.encode(params, feats[i:i + 1], fused_pack=pack)
        np.testing.assert_array_equal(np.asarray(y_map[i]),
                                      np.asarray(y_one[0]))
    y_x = enc.encode(params, feats)
    np.testing.assert_allclose(np.asarray(y_map), np.asarray(y_x),
                               atol=0.15, rtol=0.15)


def test_fused_audio_condition_in_model():
    """End-to-end through BitwiseARModel.audio_condition: the fused_ar model
    must produce conditioning close to the exact model's (batch 1 runs the
    kernel directly; f32 packs at batch > 1 keep the XLA scan)."""
    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, prev_ratio=1, embed_dim=64,
                    style_dim=16, audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=dataclasses.replace(SMALL, hidden_size=32),
    )
    exact = BitwiseARModel(cfg)
    fused = BitwiseARModel(dataclasses.replace(cfg, fused_ar=True))
    params = exact.init(jax.random.PRNGKey(0))
    chunk = jax.random.normal(jax.random.PRNGKey(1),
                              (1, exact.window_samples)) * 0.1
    cond_x = exact.audio_condition(params, chunk)
    params_f = dict(params, fused_audio_pack=fused.pack_fused_audio(params))
    cond_f = fused.audio_condition(params_f, chunk)
    np.testing.assert_allclose(np.asarray(cond_f), np.asarray(cond_x),
                               atol=3e-5, rtol=3e-5)
    # inline-pack fallback path (no fused_audio_pack key in params)
    cond_f2 = fused.audio_condition(params, chunk)
    np.testing.assert_allclose(np.asarray(cond_f2), np.asarray(cond_f),
                               atol=0, rtol=0)


def test_pack_shapes():
    from artalk_tpu.ops.encoder_block_stack import pack_encoder_weights

    enc = Wav2VecEncoder(PROD_GEO)
    params = enc.init(jax.random.PRNGKey(0))
    layers = params["encoder"]["layers"]
    d = PROD_GEO.hidden_size
    pack_f32 = pack_encoder_weights(layers)
    # f32 at d=1024: half-width tiles; 4 kinds * 2 + (4096/512)*2 = 24 tiles
    assert pack_f32["wtiles"].shape == (2, 24, d, d // 2)
    pack_bf16 = pack_encoder_weights(layers, dtype=jnp.bfloat16)
    assert pack_bf16["wtiles"].shape == (2, 12, d, d)
    assert pack_bf16["wtiles"].dtype == jnp.bfloat16
    # bias rows: q,k,v,out + hidden/d fc1 rows + fc2 + 4 LN rows
    f = PROD_GEO.intermediate_size // d
    assert pack_f32["biases"].shape == (2, 9 + f, d)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.int8],
                         ids=["bf16", "int8"])
@pytest.mark.parametrize("slim", [False, True], ids=["f32s", "slim"])
def test_fused_encoder_grouped_batch(dtype, slim):
    """The kernel supports B>1 windows per call (one shared weight stream),
    in both scratch flavors. Every matmul/LN/attention row is window-local,
    so each window's result must be bit-identical to running it alone —
    slim (compute-dtype) scratch included, since every slim buffer is only
    ever read through a matmul that casts there anyway. (Routing keeps
    fused_batch_size()==1 for now: grouped B=2 measured a 3x regression on
    the v5e, tools/exp_encoder_group_batch.py.)"""
    from artalk_tpu.ops.encoder_block_stack import encoder_block_stack

    enc, params, feats = _setup(SMALL, batch=2, seq=9)
    pack = enc.pack_fused(params, dtype=dtype)

    def stack(x, b1=None):
        return encoder_block_stack(
            x, pack["wtiles"], pack["biases"], pack.get("scales"),
            num_heads=SMALL.num_attention_heads, eps=SMALL.layer_norm_eps,
            interpret=True, slim_scratch=slim)

    y_grp = np.asarray(stack(feats))
    for i in range(feats.shape[0]):
        np.testing.assert_array_equal(y_grp[i],
                                      np.asarray(stack(feats[i:i + 1])[0]))
