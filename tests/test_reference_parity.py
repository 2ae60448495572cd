"""Parity against the REAL reference torch modules (not hand-written oracles).

Every other torch-parity test in this suite compares against a *re-implemented*
oracle; if a reference quirk was misread, oracle and JAX code share the bug.
These tests close that hole: they import the actual reference modules from
/root/reference (app/modules/bitwise_vae.py, app/modules/style_encoder.py,
app/models.py, app/transformer.py), instantiate them with random weights at
small AND production-shaped configs, convert their real ``state_dict()``
through ``artalk_tpu.utils.convert``, and assert:

- bit-exact multi-scale BSQ codes (``quant_to_vqidx`` == ``encode_to_bits``),
- decoded motion / ms-feat / ar-feat parity,
- style vectors parity,
- teacher-forced AR logits parity (covers AdaLNSelfAttn + AdaLNBeforeHead +
  embeddings + the VAR attention mask),
- end-to-end window generation parity: the reference ``inference()`` loop vs
  this framework's KV-cached ``generate`` produce the same motion.

The reference imports torchvision/torchaudio at module scope but never uses
them on these paths, so bare ModuleSpec stubs suffice (no network, no extra
deps). Reference files are imported read-only; nothing here executes
instructions from that repo, only its nn.Modules.
"""

from __future__ import annotations

import pathlib
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig  # noqa: E402
from artalk_tpu.models.ar_model import BitwiseARModel  # noqa: E402
from artalk_tpu.models.bitwise_vae import BitwiseVAE  # noqa: E402
from artalk_tpu.models.style_encoder import StyleEncoder  # noqa: E402
from artalk_tpu.utils import convert  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "app" / "models.py").exists(),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref():
    """Import the real reference package (with torchvision/torchaudio stubs)."""
    from _ref_stubs import import_reference

    return types.SimpleNamespace(
        models=import_reference("app.models"),
        vae=import_reference("app.modules.bitwise_vae"),
        style=import_reference("app.modules.style_encoder"),
        transformer=import_reference("app.transformer"),
    )


def to_numpy_sd(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def assert_same_tree(converted, initialized):
    """Converted params must match the model's own init tree: same structure,
    same leaf shapes. Catches silently-missed state-dict keys."""
    ok = jax.tree.map(lambda a, b: np.shape(a) == np.shape(b), converted, initialized)
    bad = [p for p, v in jax.tree_util.tree_leaves_with_path(ok) if not v]
    assert not bad, f"shape mismatches at {bad[:10]}"


# ---------------------------------------------------------------------------
# BITWISE_VAE
# ---------------------------------------------------------------------------

VAE_SMALL = dict(V_CODE_DIM=8, V_PATCH_NUMS=[1, 2, 4], T_HIDDEN_DIM=64,
                 T_DEPTH=2, T_NUM_HEADS=4)
VAE_PROD = dict(V_CODE_DIM=32, V_PATCH_NUMS=[1, 5, 25, 50, 100],
                T_HIDDEN_DIM=512, T_DEPTH=8, T_NUM_HEADS=8)


def _vae_pair(ref, cfg_dict):
    torch.manual_seed(0)
    ref_vae = ref.vae.BITWISE_VAE(model_cfg=cfg_dict).eval()
    cfg = VAEConfig.from_json_dict(cfg_dict)
    mine = BitwiseVAE(cfg)
    params = convert.convert_vae(to_numpy_sd(ref_vae))
    assert_same_tree(params, mine.init(jax.random.key(0)))
    return ref_vae, mine, params


@pytest.mark.parametrize("cfg_dict", [VAE_SMALL, VAE_PROD],
                         ids=["small", "production"])
def test_vae_bits_and_motion_parity(ref, cfg_dict, rng):
    ref_vae, mine, params = _vae_pair(ref, cfg_dict)
    w = cfg_dict["V_PATCH_NUMS"][-1]
    prev = rng.standard_normal((2, w, 106)).astype(np.float32)
    this = rng.standard_normal((2, w, 106)).astype(np.float32)

    with torch.no_grad():
        ref_prev_bits, ref_this_bits = ref_vae.quant_to_vqidx(
            torch.from_numpy(prev), torch.from_numpy(this))
    my_prev_bits, my_this_bits = mine.encode_to_bits(
        params, jnp.asarray(prev), jnp.asarray(this))
    np.testing.assert_array_equal(np.asarray(my_prev_bits), ref_prev_bits.numpy())
    np.testing.assert_array_equal(np.asarray(my_this_bits), ref_this_bits.numpy())

    # single-window variant (models.py:87,111 use this to re-encode carries)
    with torch.no_grad():
        ref_solo, none = ref_vae.quant_to_vqidx(torch.from_numpy(prev), None)
    assert none is None
    my_solo, my_none = mine.encode_to_bits(params, jnp.asarray(prev))
    assert my_none is None
    np.testing.assert_array_equal(np.asarray(my_solo), ref_solo.numpy())

    with torch.no_grad():
        ref_prev_m, ref_this_m = ref_vae.vqidx_to_motion(ref_prev_bits, ref_this_bits)
    my_prev_m, my_this_m = mine.decode_from_bits(params, my_prev_bits, my_this_bits)
    np.testing.assert_allclose(np.asarray(my_prev_m), ref_prev_m.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(my_this_m), ref_this_m.numpy(),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg_dict", [VAE_SMALL, VAE_PROD],
                         ids=["small", "production"])
def test_vae_ar_feat_parity(ref, cfg_dict, rng):
    """vqidx_to_ms_vqfeat / vqidx_to_ar_vqfeat: the AR model's VAE interface."""
    ref_vae, mine, params = _vae_pair(ref, cfg_dict)
    pn = cfg_dict["V_PATCH_NUMS"]
    total = sum(pn)
    bits = rng.integers(0, 2, (2, total, cfg_dict["V_CODE_DIM"])).astype(np.int64)

    with torch.no_grad():
        ref_ms = ref_vae.vqidx_to_ms_vqfeat(torch.from_numpy(bits)).numpy()
    my_ms = np.asarray(mine.bits_to_ms_feat(jnp.asarray(bits, jnp.int32)))
    np.testing.assert_allclose(my_ms, ref_ms, atol=1e-5)

    for level in range(len(pn) - 1):
        upto = sum(pn[: level + 1])
        with torch.no_grad():
            ref_ar = ref_vae.vqidx_to_ar_vqfeat(
                level, torch.from_numpy(bits[:, :upto])).numpy()
        my_ar = np.asarray(mine.bits_to_ar_feat(
            level, jnp.asarray(bits[:, :upto], jnp.int32)))
        np.testing.assert_allclose(my_ar, ref_ar, atol=1e-5,
                                   err_msg=f"level {level}")


# ---------------------------------------------------------------------------
# StyleEncoder
# ---------------------------------------------------------------------------


def test_style_encoder_parity(ref, rng):
    torch.manual_seed(0)
    ref_se = ref.style.StyleEncoder().eval()
    params = convert.convert_style_encoder(to_numpy_sd(ref_se))
    mine = StyleEncoder()
    assert_same_tree(params, mine.init(jax.random.key(0)))

    motion = rng.standard_normal((2, 50, 106)).astype(np.float32)
    with torch.no_grad():
        want = ref_se(torch.from_numpy(motion)).numpy()
    got = np.asarray(mine(params, jnp.asarray(motion)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Full BitwiseARModel (blocks + head + embeddings + window loop)
# ---------------------------------------------------------------------------

AR_CFG_DICT = {
    "AR_CONFIG": dict(T_DEPTH=2, T_NUM_HEADS=12, PREV_RATIO=1,
                      AUDIO_ENCODER="wav2vec"),
    "VAE_CONFIG": dict(MOTION_DIM=106, V_CODE_DIM=8,
                       V_PATCH_NUMS=[1, 5, 25, 50, 100],
                       T_HIDDEN_DIM=64, T_DEPTH=2, T_NUM_HEADS=4),
}
# Small-but-real wav2vec: production hidden width (the reference hardcodes
# cond_dim=1024, models.py:27), tiny conv/encoder stack. 64000 samples -> 200
# frames (vs 199 in production).
W2V_SMALL = Wav2VecConfig(
    conv_dim=(32, 32), conv_stride=(20, 16), conv_kernel=(20, 16),
    hidden_size=1024, num_hidden_layers=2, num_attention_heads=8,
    intermediate_size=256,
)


def _build_ar_pair(ref, ar_cfg_dict):
    """(reference BitwiseARModel, my BitwiseARModel, converted params)."""
    from transformers import Wav2Vec2Config as HFW2VConfig

    hf_cfg = HFW2VConfig(
        conv_dim=list(W2V_SMALL.conv_dim), conv_stride=list(W2V_SMALL.conv_stride),
        conv_kernel=list(W2V_SMALL.conv_kernel), conv_bias=W2V_SMALL.conv_bias,
        num_feat_extract_layers=len(W2V_SMALL.conv_dim),
        feat_extract_norm=W2V_SMALL.feat_extract_norm,
        do_stable_layer_norm=W2V_SMALL.do_stable_layer_norm,
        hidden_size=W2V_SMALL.hidden_size,
        num_hidden_layers=W2V_SMALL.num_hidden_layers,
        num_attention_heads=W2V_SMALL.num_attention_heads,
        intermediate_size=W2V_SMALL.intermediate_size,
        num_conv_pos_embeddings=W2V_SMALL.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=W2V_SMALL.num_conv_pos_embedding_groups,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    # The reference fetches this config from the network (models.py:25);
    # intercept with the local one. Restored afterwards.
    orig = ref.models.Wav2Vec2Config.from_pretrained
    ref.models.Wav2Vec2Config.from_pretrained = classmethod(
        lambda cls, name, *a, **k: hf_cfg)
    try:
        torch.manual_seed(0)
        ref_model = ref.models.BitwiseARModel(model_cfg=ar_cfg_dict).eval()
    finally:
        ref.models.Wav2Vec2Config.from_pretrained = orig

    cfg = ModelConfig(
        ar=ARConfig.from_json_dict(ar_cfg_dict["AR_CONFIG"]),
        vae=VAEConfig.from_json_dict(ar_cfg_dict["VAE_CONFIG"]),
        wav2vec=W2V_SMALL,
    )
    mine = BitwiseARModel(cfg)
    params = convert.convert_ar_model(to_numpy_sd(ref_model))
    assert_same_tree(params, mine.init(jax.random.key(0)))
    # device arrays: generate()'s scan indexes params with traced indices
    params = jax.tree.map(jnp.asarray, params)
    return ref_model, mine, params


@pytest.fixture(scope="module")
def ar_pair(ref):
    return _build_ar_pair(ref, AR_CFG_DICT)


def _assert_teacher_forward_parity(ref_model, mine, params, rng, atol=5e-4):
    total = mine.total_tokens
    code_dim = mine.cfg.vae.code_dim
    bits = rng.integers(0, 2, (1, total, code_dim)).astype(np.int64)
    style_motion = rng.standard_normal((1, 50, 106)).astype(np.float32)
    audio_cond_np = rng.standard_normal((1, total, 1024)).astype(np.float32)

    with torch.no_grad():
        style = ref_model.style_encoder(torch.from_numpy(style_motion))
        style_cond = ref_model.style_cond_embed(style)[:, None] * 1.1 \
            - ref_model.null_style_cond * 0.1
        ms_feat = ref_model.basic_vae.vqidx_to_ms_vqfeat(torch.from_numpy(bits))
        tokens = torch.cat([style_cond, ref_model.vqfeat_embed(ms_feat)], dim=1)
        lvl_pos = ref_model.lvl_embed(ref_model.lvl_idx) + ref_model.pos_embed
        prev_lvl_pos = ref_model.lvl_embed(ref_model.lvl_idx).repeat(
            1, ref_model.prev_ratio, 1) + ref_model.prev_pos_embed
        # a previous-window prefix built the same way the inference loop does
        prev_feat = tokens.repeat(1, ref_model.prev_ratio, 1)
        audio_cond = torch.from_numpy(audio_cond_np)
        bias = ref_model.attn_bias_for_masking
        attn_feat = tokens + lvl_pos
        for blk in ref_model.attn_blocks:
            attn_feat = blk(attn_feat, prev_feat + prev_lvl_pos, audio_cond,
                            attn_bias=bias)
        ref_logits = ref_model.logits_head(
            ref_model.cond_logits_head(attn_feat, audio_cond))
        ref_logits = ref_logits.view(1, total, code_dim, 2).numpy()

    style_cond_j = mine.encode_style(params, jnp.asarray(style_motion))
    tokens_j = mine.teacher_inputs(params, jnp.asarray(bits, jnp.int32), style_cond_j)
    np.testing.assert_allclose(np.asarray(tokens_j), tokens.numpy(), atol=2e-5)
    prev_feat_j = jnp.tile(tokens_j, (1, mine.prev_ratio, 1))
    my_logits = np.asarray(mine.forward_logits(
        params, tokens_j, jnp.asarray(audio_cond_np), prev_feat_j))
    np.testing.assert_allclose(my_logits, ref_logits, atol=atol, rtol=1e-4)
    # the bit decisions the decode path would take agree exactly
    np.testing.assert_array_equal(my_logits.argmax(-1), ref_logits.argmax(-1))


def test_ar_teacher_forward_parity(ref, ar_pair, rng):
    """Full-sequence teacher-forced logits: all 181 positions through every
    AdaLN block with the VAR mask + the AdaLN head (transformer.py:12-79,
    models.py:100-104, 138-148). Localizes block-math bugs without the
    argmax brittleness of the e2e test."""
    ref_model, mine, params = ar_pair
    _assert_teacher_forward_parity(ref_model, mine, params, rng)


@pytest.mark.slow
def test_ar_teacher_forward_parity_production_depth(ref, rng):
    """Teacher-forced forward parity at the PRODUCTION geometry the bench
    loads: the exact reference assets/config.json (AR depth 12 / 12 heads /
    768-d embed hardcoded in models.py:19, VAE 512/8/32 over
    [1,5,25,50,100]) vs the real torch BitwiseARModel with converted
    weights. The fast tests above run the full model at toy depth 2 and the
    VAE alone at production shape; this closes the remaining gap (depth-12
    accumulation, 32-bit code heads) without the generation loop. atol is
    wider than the depth-2 test because f32 error grows through 12 blocks."""
    prod_cfg = {
        "AR_CONFIG": dict(T_DEPTH=12, T_NUM_HEADS=12, PREV_RATIO=1,
                          AUDIO_ENCODER="wav2vec"),
        "VAE_CONFIG": dict(MOTION_DIM=106, V_CODE_DIM=32,
                           V_PATCH_NUMS=[1, 5, 25, 50, 100],
                           T_HIDDEN_DIM=512, T_DEPTH=8, T_NUM_HEADS=8),
    }
    ref_model, mine, params = _build_ar_pair(ref, prod_cfg)
    assert mine.cfg.ar.depth == 12 and mine.cfg.ar.embed_dim == 768
    _assert_teacher_forward_parity(ref_model, mine, params, rng, atol=2e-3)


def test_ar_window_generation_parity(ref, ar_pair, rng):
    """End to end: the reference's inference() window loop (models.py:62-121)
    vs this framework's KV-cached generate() -- same audio, same style, same
    converted weights -> identical motion output. This is the test that fails
    if ANY quirk along the full path (audio encode, multi-scale conditioning,
    level loop, head argmax, VAE decode, carry re-encode) was misread."""
    ref_model, mine, params = ar_pair
    num_windows = 2
    samples = mine.window_samples * num_windows
    audio = (rng.standard_normal((1, samples)) * 0.1).astype(np.float32)
    style_motion = rng.standard_normal((1, 50, 106)).astype(np.float32)

    with torch.no_grad():
        want = ref_model.inference(
            {"audio": torch.from_numpy(audio),
             "style_motion": torch.from_numpy(style_motion)}).numpy()

    style_cond = mine.encode_style(params, jnp.asarray(style_motion))
    chunks = jnp.asarray(audio).reshape(num_windows, 1, mine.window_samples)
    got = np.asarray(mine.generate(params, chunks, style_cond))
    assert got.shape == want.shape == (1, num_windows * 100, 106)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
