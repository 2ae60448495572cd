"""BitwiseARModel: KV-cached incremental decode vs naive full-recompute decode.

The TPU redesign feeds each scale level's tokens exactly once and caches K/V,
while the reference recomputes the full prefix at every level with an explicit
VAR mask (models.py:97-104). These must produce identical bits -- this test
implements the naive algorithm (explicit mask, full recompute, literal
reference control flow) with the same parameters and checks bit equality.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models import nn
from artalk_tpu.models.ar_model import BitwiseARModel
from artalk_tpu.models.bsq import bits_to_values
from artalk_tpu.ops.resample1d import resize_area, resize_linear

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


@pytest.fixture(scope="module")
def model_and_params():
    model = BitwiseARModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def naive_decode(model, params, audio_cond, style_cond, prev_attn_feat):
    """Literal reference decode (models.py:92-107): at each level, re-embed all
    tokens of levels <= current, run the full tower with the explicit VAR mask,
    take argmax bits over every position."""
    pn = model.patch_nums
    total = model.total_tokens
    lvl_idx = np.concatenate([np.full(p, i) for i, p in enumerate(pn)])
    var_mask = np.where(lvl_idx[:, None] >= lvl_idx[None, :], 0.0, -np.inf)
    full_bias = np.concatenate(
        [np.zeros((total, model.prev_len), np.float32), var_mask.astype(np.float32)], axis=1)
    lvl_pos = model.lvl_pos_embed(params)
    prev_feat = prev_attn_feat + model.prev_lvl_pos_embed(params)
    code_dim = model.cfg.vae.code_dim

    def run_tower(tokens, cond, bias):
        x = tokens
        blocks = params["blocks"]
        for b in range(model.depth):
            block = jax.tree.map(lambda a: a[b], blocks)
            ada = nn.linear(block["ada_lin"], nn.silu(cond))
            g1, g2, s1, s2, sh1, sh2 = jnp.split(ada, 6, axis=-1)
            xm = nn.layer_norm(x, eps=1e-6) * (s1 + 1.0) + sh1
            q = nn.split_heads(nn.linear(block["q"], xm), model.num_heads)
            kv_in = jnp.concatenate([prev_feat, xm], axis=1)
            k = nn.split_heads(nn.linear(block["k"], kv_in), model.num_heads)
            v = nn.split_heads(nn.linear(block["v"], kv_in), model.num_heads)
            scale_mul = jnp.exp(jnp.minimum(block["scale_mul"], math.log(100.0)))
            q = nn.l2_normalize(q) * scale_mul
            k = nn.l2_normalize(k)
            attn = nn.sdpa(q, k, v, scale=1.0, bias=jnp.asarray(bias)[None, None])
            x = x + nn.linear(block["proj"], nn.merge_heads(attn)) * g1
            xm2 = nn.layer_norm(x, eps=1e-6) * (s2 + 1.0) + sh2
            x = x + nn.linear(block["fc2"], nn.gelu_tanh(nn.linear(block["fc1"], xm2))) * g2
        return x

    batch = audio_cond.shape[0]
    style_cond = jnp.broadcast_to(style_cond, (batch, 1, style_cond.shape[-1]))
    next_tokens = style_cond + lvl_pos[:, :1]
    bits = None
    for level in range(len(pn)):
        cur = sum(pn[: level + 1])
        cond = audio_cond[:, :cur]
        bias = full_bias[:cur, : model.prev_len + cur]
        feats = run_tower(next_tokens, cond, bias)
        bits = model._head_bits(params, feats, cond)  # (B, cur, code_dim)
        if level < len(pn) - 1:
            nxt = model.vae.bits_to_ar_feat(level, bits)
            next_tokens = jnp.concatenate(
                [style_cond, nn.linear(params["vqfeat_embed"], nxt)], axis=1)
            next_tokens = next_tokens + lvl_pos[:, : next_tokens.shape[1]]
    return bits


def test_cached_decode_equals_naive(model_and_params, rng):
    model, params = model_and_params
    b = 2
    audio_cond = jnp.asarray(
        rng.standard_normal((b, model.total_tokens, CFG.ar.audio_feature_dim)).astype(np.float32))
    style_cond = jnp.asarray(rng.standard_normal((1, 1, CFG.ar.embed_dim)).astype(np.float32))
    prev_attn_feat = jnp.asarray(
        rng.standard_normal((b, model.prev_len, CFG.ar.embed_dim)).astype(np.float32))

    fast = np.asarray(model.decode_window(params, audio_cond, style_cond, prev_attn_feat))
    slow = np.asarray(naive_decode(model, params, audio_cond, style_cond, prev_attn_feat))
    assert fast.shape == slow.shape == (b, model.total_tokens, CFG.vae.code_dim)
    np.testing.assert_array_equal(fast, slow)


def test_bf16_ar_decode_runs_and_mostly_agrees(model_and_params, rng):
    """Opt-in bf16 decode (cfg.bf16_ar): deterministic, same output
    shape/dtype, and high bit agreement with the exact f32 path (bf16
    rounding may flip low-margin bit decisions -- that's why it's opt-in)."""
    import dataclasses

    model, params = model_and_params
    model16 = BitwiseARModel(dataclasses.replace(CFG, bf16_ar=True))
    b = 2
    audio_cond = jnp.asarray(
        rng.standard_normal((b, model.total_tokens, CFG.ar.audio_feature_dim)).astype(np.float32))
    style_cond = jnp.asarray(rng.standard_normal((1, 1, CFG.ar.embed_dim)).astype(np.float32))
    prev_attn_feat = jnp.asarray(
        rng.standard_normal((b, model.prev_len, CFG.ar.embed_dim)).astype(np.float32))

    exact = np.asarray(model.decode_window(params, audio_cond, style_cond, prev_attn_feat))
    fast = np.asarray(model16.decode_window(params, audio_cond, style_cond, prev_attn_feat))
    fast2 = np.asarray(model16.decode_window(params, audio_cond, style_cond, prev_attn_feat))
    np.testing.assert_array_equal(fast, fast2)
    assert fast.shape == exact.shape and fast.dtype == exact.dtype
    agreement = float((fast == exact).mean())
    assert agreement > 0.8, f"bf16 decode diverged too far: {agreement:.3f}"


def test_ar_precision_env_knob(monkeypatch):
    """ARTALK_AR_PRECISION plumbs to config: fast sets bf16, bad values raise."""
    from artalk_tpu.engine import _resolve_ar_precision

    monkeypatch.delenv("ARTALK_AR_PRECISION", raising=False)
    cfg = _resolve_ar_precision(CFG)
    assert not cfg.bf16_ar and not cfg.bf16_audio
    monkeypatch.setenv("ARTALK_AR_PRECISION", "fast")
    cfg = _resolve_ar_precision(CFG)
    assert cfg.bf16_ar and cfg.bf16_audio
    monkeypatch.setenv("ARTALK_AR_PRECISION", "turbo")
    with pytest.raises(ValueError, match="ARTALK_AR_PRECISION"):
        _resolve_ar_precision(CFG)


def test_window_step_shapes_and_scan(model_and_params, rng):
    model, params = model_and_params
    b, n_windows = 1, 3
    chunks = jnp.asarray(
        rng.standard_normal((n_windows, b, model.window_samples)).astype(np.float32))
    style_cond = model.encode_style(params, None)
    motions = jax.jit(model.generate)(params, chunks, style_cond)
    assert motions.shape == (b, n_windows * CFG.vae.window, CFG.vae.motion_dim)
    assert np.isfinite(np.asarray(motions)).all()


def test_generate_is_deterministic(model_and_params, rng):
    model, params = model_and_params
    chunks = jnp.asarray(rng.standard_normal((2, 1, model.window_samples)).astype(np.float32))
    style_cond = model.encode_style(params, None)
    m1 = np.asarray(model.generate(params, chunks, style_cond))
    m2 = np.asarray(model.generate(params, chunks, style_cond))
    np.testing.assert_array_equal(m1, m2)


def test_style_conditioning_changes_output(model_and_params, rng):
    model, params = model_and_params
    chunks = jnp.asarray(rng.standard_normal((1, 1, model.window_samples)).astype(np.float32))
    style_motion = jnp.asarray(
        rng.standard_normal((1, 10, CFG.vae.motion_dim)).astype(np.float32))
    null = model.encode_style(params, None)
    styled = model.encode_style(params, style_motion)
    assert not np.allclose(np.asarray(null), np.asarray(styled))
    m_null = np.asarray(model.generate(params, chunks, null))
    m_styled = np.asarray(model.generate(params, chunks, styled))
    assert not np.array_equal(m_null, m_styled)


def test_prev_ratio_two(rng):
    """PREV_RATIO=2 (two previous windows as prefix, models.py:133) rolls the
    prefix correctly and generates finite motion."""
    cfg2 = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, prev_ratio=2, embed_dim=64,
                    style_dim=16, audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=SMALL_W2V)
    model = BitwiseARModel(cfg2)
    assert model.prev_len == 2 * model.total_tokens
    params = model.init(jax.random.PRNGKey(0))
    chunks = jnp.asarray(
        rng.standard_normal((3, 1, model.window_samples)).astype(np.float32))
    style = model.encode_style(params, None)
    motions = jax.jit(model.generate)(params, chunks, style)
    assert motions.shape == (1, 3 * cfg2.vae.window, cfg2.vae.motion_dim)
    assert np.isfinite(np.asarray(motions)).all()


def test_topk_topp_mask_matches_torch_reference(rng):
    """The JAX sampling filter == the reference's torch filter semantics
    (models.py:151-164: top-k keep, ascending-cumsum nucleus drop, largest
    logit always kept)."""
    import torch

    from artalk_tpu.models.ar_model import topk_topp_mask

    logits = rng.standard_normal((3, 5, 8)).astype(np.float32)
    for top_k, top_p in ((2, 0.95), (0, 0.9), (4, 0.0), (3, 0.5)):
        t = torch.tensor(logits.copy())
        if top_k > 0:
            idx_rm = t < t.topk(top_k, largest=True, sorted=False, dim=-1)[0] \
                .amin(dim=-1, keepdim=True)
            t.masked_fill_(idx_rm, -torch.inf)
        if top_p > 0:
            sorted_logits, sorted_idx = t.sort(dim=-1, descending=False)
            rm = sorted_logits.softmax(dim=-1).cumsum_(dim=-1) <= (1 - top_p)
            rm[..., -1:] = False
            t.masked_fill_(rm.scatter(sorted_idx.ndim - 1, sorted_idx, rm),
                           -torch.inf)
        got = np.asarray(topk_topp_mask(jnp.asarray(logits), top_k, top_p))
        np.testing.assert_allclose(got, t.numpy(), atol=1e-6)


def test_sampling_topk1_equals_greedy(model_and_params, rng):
    """top_k=1 sampling collapses to the greedy argmax decode bit-for-bit."""
    model, params = model_and_params
    chunks = jnp.asarray(
        rng.standard_normal((2, 1, model.window_samples)).astype(np.float32) * 0.1)
    style = model.encode_style(params, None)
    greedy = model.generate(params, chunks, style)
    sampled = model.generate(params, chunks, style,
                             sample_key=jax.random.PRNGKey(7), top_k=1, top_p=0.0)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))


def test_sampling_is_stochastic_but_valid(model_and_params, rng):
    model, params = model_and_params
    chunks = jnp.asarray(
        rng.standard_normal((1, 1, model.window_samples)).astype(np.float32) * 0.1)
    style = model.encode_style(params, None)
    a = model.generate(params, chunks, style, sample_key=jax.random.PRNGKey(0))
    b = model.generate(params, chunks, style, sample_key=jax.random.PRNGKey(1))
    assert a.shape == b.shape
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_drop_path_train_vs_eval(model_and_params, rng):
    """DropPath (stochastic depth, reference models.py:35 +
    transformer.py:82-96): eval mode (rng=None) is exactly today's output;
    train mode with dpr > 0 differs per rng key."""
    model, params = model_and_params
    b = 4
    tokens = jnp.asarray(rng.standard_normal(
        (b, model.total_tokens, model.embed_dim)).astype(np.float32))
    audio_cond = jnp.asarray(rng.standard_normal(
        (b, model.total_tokens, model.cfg.ar.audio_feature_dim)).astype(np.float32))
    prefix = jnp.asarray(rng.standard_normal(
        (b, model.prev_len, model.embed_dim)).astype(np.float32))

    # declared rates: linspace(0, 0.1*depth/24, depth), block 0 identity
    rates = np.asarray(model.drop_path_rates())
    np.testing.assert_allclose(
        rates, np.linspace(0.0, 0.1 * model.depth / 24.0, model.depth),
        atol=1e-7)
    assert rates[0] == 0.0 and rates[-1] > 0.0

    eval_a = model.forward_logits(params, tokens, audio_cond, prefix)
    eval_b = model.forward_logits(params, tokens, audio_cond, prefix,
                                  drop_path_rng=None)
    np.testing.assert_array_equal(np.asarray(eval_a), np.asarray(eval_b))

    # force large rates so a drop is certain, then: per-key variation
    model_hot = BitwiseARModel(CFG)
    model_hot.drop_path_rates = lambda: jnp.full((model.depth,), 0.5)
    t1 = model_hot.forward_logits(params, tokens, audio_cond, prefix,
                                  drop_path_rng=jax.random.PRNGKey(0))
    t2 = model_hot.forward_logits(params, tokens, audio_cond, prefix,
                                  drop_path_rng=jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(eval_a))
    assert np.isfinite(np.asarray(t1)).all()

    # rate 0 everywhere: train path must reduce to eval exactly
    model_zero = BitwiseARModel(CFG)
    model_zero.drop_path_rates = lambda: jnp.zeros((model.depth,))
    t0 = model_zero.forward_logits(params, tokens, audio_cond, prefix,
                                   drop_path_rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(eval_a), atol=1e-6)
