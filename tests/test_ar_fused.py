"""Fused weight-streaming decode kernel (ops/ar_block_stack.py) parity.

The fused path must reproduce the XLA `_run_level` math: same level-causal
attention against the KV cache, same AdaLN modulation, same residual
structure. It is opt-in (cfg.fused_ar) and tiled differently (fc2 split into
row chunks), so parity is to atol + bit agreement, not bit-pinned.

Kernels run in interpret mode on CPU (as all Pallas kernels in CI).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models.ar_model import BitwiseARModel

SMALL_W2V = Wav2VecConfig(
    conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
    hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=64, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)

CFG = ModelConfig(
    ar=ARConfig(depth=3, num_heads=4, prev_ratio=1, embed_dim=64, style_dim=16,
                audio_dim=32),
    vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4, hidden_dim=32,
                  patch_nums=(1, 2, 4)),
    wav2vec=SMALL_W2V,
)

# production transformer geometry (768/12 heads, real patch schedule) on a
# tiny VAE/audio stack -- exercises the kernel's real lane/tile shapes
PROD_GEO = ModelConfig(
    ar=ARConfig(depth=2, num_heads=12, prev_ratio=1, embed_dim=768,
                style_dim=16, audio_dim=32),
    vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                  hidden_dim=32, patch_nums=(1, 5, 25, 50, 100)),
    wav2vec=SMALL_W2V,
)


def _models(cfg):
    exact = BitwiseARModel(cfg)
    fused = BitwiseARModel(dataclasses.replace(cfg, fused_ar=True))
    params = exact.init(jax.random.PRNGKey(0))
    return exact, fused, params


def _decode_inputs(model, params, key, batch=1):
    k1, k2 = jax.random.split(key)
    audio_cond = jax.random.normal(
        k1, (batch, model.total_tokens, model.cfg.ar.audio_feature_dim)) * 0.3
    style_cond = model.encode_style(params, None)
    prev_feat = jax.random.normal(
        k2, (batch, model.prev_len, model.embed_dim)) * 0.2
    return audio_cond, style_cond, prev_feat


@pytest.mark.parametrize("cfg", [CFG, PROD_GEO], ids=["small", "prod-geo"])
def test_fused_decode_matches_xla(cfg):
    exact, fused, params = _models(cfg)
    audio_cond, style_cond, prev_feat = _decode_inputs(
        exact, params, jax.random.PRNGKey(1))
    bits_x = exact.decode_window(params, audio_cond, style_cond, prev_feat)
    bits_f = fused.decode_window(params, audio_cond, style_cond, prev_feat)
    agree = float(jnp.mean((bits_x == bits_f).astype(jnp.float32)))
    assert agree >= 0.999, f"fused decode bit agreement {agree}"


def test_fused_level_feats_close():
    """Per-level feature parity (tighter than bit agreement): run each scale
    level through both paths against the same caches."""
    exact, fused, params = _models(CFG)
    model = exact
    audio_cond, style_cond, prev_feat_raw = _decode_inputs(
        model, params, jax.random.PRNGKey(2))
    lvl_pos = model.lvl_pos_embed(params)
    prev_feat = prev_feat_raw + model.prev_lvl_pos_embed(params)
    w_qkv, b_qkv, scale_mul, ada_full, _ = model._fused_decode_consts(
        params, audio_cond)
    pack = model.pack_fused_decode(params)
    caches_x = model.init_cache(params, prev_feat)
    caches_f = model.init_cache_merged(params, prev_feat)

    tokens = jnp.broadcast_to(style_cond + lvl_pos[:, :1],
                              (1, 1, model.embed_dim))
    for level, pn in enumerate(model.patch_nums):
        off = model.offsets[level]
        ada = ada_full[:, :, off:off + pn]
        feats_x, caches_x = model._run_level(
            params["blocks"], tokens, ada, caches_x, level, w_qkv, b_qkv,
            scale_mul)
        feats_f, caches_f = fused._run_level_fused(pack, tokens, ada,
                                                   caches_f, level)
        np.testing.assert_allclose(np.asarray(feats_f), np.asarray(feats_x),
                                   atol=2e-5, rtol=2e-5)
        # merged cache rows must equal the head-split cache, re-merged
        end = model.prev_len + off + pn
        k_x, v_x = caches_x
        k_merged = k_x.transpose(0, 1, 3, 2, 4).reshape(
            model.depth, 1, model.cache_len, model.embed_dim)
        np.testing.assert_allclose(np.asarray(caches_f[0][:, :, :end]),
                                   np.asarray(k_merged[:, :, :end]),
                                   atol=2e-6, rtol=2e-6)
        # feed the NEXT level the exact path's tokens so errors don't compound
        if level < len(model.patch_nums) - 1:
            next_pn = model.patch_nums[level + 1]
            tokens = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(3), level),
                (1, next_pn, model.embed_dim)) * 0.3


def test_fused_decode_batched():
    exact, fused, params = _models(CFG)
    audio_cond, style_cond, prev_feat = _decode_inputs(
        exact, params, jax.random.PRNGKey(4), batch=2)
    bits_x = exact.decode_window(params, audio_cond, style_cond, prev_feat)
    bits_f = fused.decode_window(params, audio_cond, style_cond, prev_feat)
    assert bits_f.shape == bits_x.shape
    agree = float(jnp.mean((bits_x == bits_f).astype(jnp.float32)))
    assert agree >= 0.999, f"batched fused decode bit agreement {agree}"


def test_fused_bf16_decode_agrees():
    """fast-mode pairing: bf16 fused decode vs bf16 XLA decode."""
    cfg = dataclasses.replace(CFG, bf16_ar=True)
    exact, fused, params = _models(cfg)
    audio_cond, style_cond, prev_feat = _decode_inputs(
        exact, params, jax.random.PRNGKey(5))
    bits_x = exact.decode_window(params, audio_cond, style_cond, prev_feat)
    bits_f = fused.decode_window(params, audio_cond, style_cond, prev_feat)
    agree = float(jnp.mean((bits_x == bits_f).astype(jnp.float32)))
    assert agree >= 0.97, f"bf16 fused decode bit agreement {agree}"


def test_fused_decode_batch_tiled_serving():
    """Serving-size batch (B=5, odd -> exercises the batch-pad row) routes
    through the batch-tiled fused kernel (batch_tile=2, bf16 pack) and must
    agree with the bf16 XLA scan path."""
    cfg = dataclasses.replace(CFG, bf16_ar=True)
    exact, fused, params = _models(cfg)
    audio_cond, style_cond, prev_feat = _decode_inputs(
        exact, params, jax.random.PRNGKey(7), batch=5)
    bits_x = exact.decode_window(params, audio_cond, style_cond, prev_feat)
    bits_f = fused.decode_window(params, audio_cond, style_cond, prev_feat)
    assert bits_f.shape == bits_x.shape
    agree = float(jnp.mean((bits_x == bits_f).astype(jnp.float32)))
    assert agree >= 0.97, f"batch-tiled fused decode bit agreement {agree}"


def test_block_stack_batch_tile_matches_single_pass():
    """ar_block_stack(batch_tile=2) must reproduce the untiled kernel row
    for row -- tiling only changes the grid walk, not the math."""
    from artalk_tpu.ops.ar_block_stack import ar_block_stack

    model = BitwiseARModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    pack = model.pack_fused_decode(params)
    b, pn, d = 5, model.patch_nums[1], model.embed_dim
    depth, cache_len = model.depth, model.cache_len
    key = jax.random.PRNGKey(8)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, pn, d)) * 0.3
    ada = jax.random.normal(ks[1], (depth, b, pn, 6 * d)) * 0.1
    kc = jax.random.normal(ks[2], (depth, b, cache_len, d)) * 0.2
    vc = jax.random.normal(ks[3], (depth, b, cache_len, d)) * 0.2
    start = model.prev_len + model.offsets[1]
    args = dict(start=start, num_heads=model.num_heads, interpret=True)
    ref = ar_block_stack(x, ada, pack["wtiles"], pack["biases"], kc, vc,
                         **args)
    tiled = ar_block_stack(x, ada, pack["wtiles"], pack["biases"], kc, vc,
                           batch_tile=2, **args)
    for r, t in zip(ref, tiled):
        assert r.shape == t.shape
        np.testing.assert_allclose(np.asarray(t), np.asarray(r),
                                   atol=1e-6, rtol=1e-6)


def test_pack_shapes():
    from artalk_tpu.ops.ar_block_stack import pack_block_weights

    model = BitwiseARModel(PROD_GEO)
    params = model.init(jax.random.PRNGKey(0))
    pack_f32 = pack_block_weights(params["blocks"], model.num_heads)
    d = model.embed_dim
    assert pack_f32["wtiles"].shape == (model.depth, 24, d, d // 2)
    pack_bf16 = pack_block_weights(params["blocks"], model.num_heads,
                                   dtype=jnp.bfloat16)
    assert pack_bf16["wtiles"].shape == (model.depth, 12, d, d)
    assert pack_bf16["wtiles"].dtype == jnp.bfloat16
    # f32 tile pack reassembles to the original fc2 weight
    f = pack_f32["biases"].shape[1] - 6
    assert f == 4


def test_int8_pack_quantization_roundtrip():
    """int8 pack: dequantized tiles must reproduce the f32 tiles within one
    quantization step on the correct (per-output-channel) axis -- columns
    for forward tiles, rows for the transposed fc2 chunks."""
    from artalk_tpu.ops.ar_block_stack import pack_block_weights

    model = BitwiseARModel(PROD_GEO)
    params = model.init(jax.random.PRNGKey(0))
    ref = pack_block_weights(params["blocks"], model.num_heads,
                             dtype=jnp.bfloat16, tile_width=model.embed_dim)
    # rebuild the unquantized f32 tiles via the bf16 pack's layout
    f32_tiles = pack_block_weights(params["blocks"], model.num_heads,
                                   dtype=jnp.float32,
                                   tile_width=model.embed_dim)["wtiles"]
    pack = pack_block_weights(params["blocks"], model.num_heads,
                              dtype=jnp.int8)
    assert pack["wtiles"].dtype == jnp.int8
    assert pack["scales"].shape == (model.depth, 12, model.embed_dim)
    q = np.asarray(pack["wtiles"], np.float32)
    s = np.asarray(pack["scales"])
    w = np.asarray(f32_tiles)
    # forward tiles (first 4): scale per stored column; fc2 tiles (odd
    # indices past 4): scale per stored row
    for t in range(q.shape[1]):
        fc2 = t >= 4 and (t - 4) % 2 == 1
        deq = q[:, t] * (s[:, t, :, None] if fc2 else s[:, t, None, :])
        step = (s[:, t, :, None] if fc2 else s[:, t, None, :])
        assert np.all(np.abs(deq - w[:, t]) <= 0.51 * step), f"tile {t}"
    assert ref["biases"].shape == pack["biases"].shape


def test_fused_int8_decode_agrees():
    """int8 weight-only pairing: int8 fused decode vs exact decode keeps
    high bit agreement (same bound family as the bf16 mode test)."""
    cfg = dataclasses.replace(CFG, bf16_ar=True, int8_ar=True)
    exact, fused, params = _models(cfg)
    # exact reference bits: plain f32 model on the same weights
    f32_model = BitwiseARModel(CFG)
    audio_cond, style_cond, prev_feat = _decode_inputs(
        f32_model, params, jax.random.PRNGKey(6))
    bits_x = f32_model.decode_window(params, audio_cond, style_cond,
                                     prev_feat)
    pack = fused.pack_fused_decode(params)
    assert pack["wtiles"].dtype == jnp.int8 and "scales" in pack
    bits_q = fused.decode_window(dict(params, fused_pack=pack), audio_cond,
                                 style_cond, prev_feat)
    agree = float(jnp.mean((bits_x == bits_q).astype(jnp.float32)))
    assert agree >= 0.9, f"int8 fused decode bit agreement {agree}"
