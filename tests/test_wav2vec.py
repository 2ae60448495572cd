"""Parity of the JAX wav2vec2 encoder vs HF transformers (torch, random weights).

Architecture-level validation without network access: instantiate an HF
Wav2Vec2Model from a locally-constructed config (same family as
facebook/wav2vec2-xls-r-300m but small), convert its random weights, and
compare forwards.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from artalk_tpu.config import Wav2VecConfig
from artalk_tpu.models.wav2vec import Wav2VecEncoder, normalize_audio
from artalk_tpu.utils.convert import convert_wav2vec

SMALL = Wav2VecConfig(
    conv_dim=(32, 32),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def make_hf_model(cfg: Wav2VecConfig):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim),
        conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        conv_bias=cfg.conv_bias,
        num_feat_extract_layers=len(cfg.conv_dim),
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    model = Wav2Vec2Model(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def hf_and_jax():
    torch.manual_seed(0)
    hf = make_hf_model(SMALL)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_wav2vec(sd, num_layers=SMALL.num_hidden_layers,
                             num_convs=len(SMALL.conv_dim))
    return hf, Wav2VecEncoder(SMALL), params


def test_feature_extractor_parity(hf_and_jax, rng):
    hf, enc, params = hf_and_jax
    audio = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = hf.feature_extractor(torch.from_numpy(audio)).transpose(1, 2).numpy()
    got = np.asarray(enc.extract_features(params, jnp.asarray(audio)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_full_forward_parity(hf_and_jax, rng):
    """Matches the reference's custom forward (wav2vec.py:11-20): z-norm ->
    convs -> projection -> encoder, no masking."""
    hf, enc, params = hf_and_jax
    audio = rng.standard_normal((1, 3200)).astype(np.float32)
    at = torch.from_numpy(audio)
    with torch.no_grad():
        normed = (at - at.mean(dim=-1, keepdim=True)) / (at.std(dim=-1, keepdim=True) + 1e-6)
        feats = hf.feature_extractor(normed).transpose(1, 2)
        proj = hf.feature_projection(feats)[0]
        ref = hf.encoder(proj, return_dict=True)[0].numpy()
    got = np.asarray(enc(params, jnp.asarray(audio)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_normalize_audio_torch_std_semantics(rng):
    audio = rng.standard_normal((3, 500)).astype(np.float32)
    at = torch.from_numpy(audio)
    ref = ((at - at.mean(dim=-1, keepdim=True)) / (at.std(dim=-1, keepdim=True) + 1e-6)).numpy()
    got = np.asarray(normalize_audio(jnp.asarray(audio)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_output_length_formula():
    cfg = Wav2VecConfig()
    # the real xls-r conv stack maps a 4 s window (64000 samples) to 199 frames
    assert cfg.num_output_frames(64000) == 199
    assert Wav2VecEncoder(cfg).num_output_frames(64000) == 199
