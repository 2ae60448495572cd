"""HuBERT encoder parity vs HF transformers (random weights, tiny config)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from artalk_tpu.config import hubert_base_config
from artalk_tpu.models.hubert import HubertEncoder
from artalk_tpu.models.wav2vec import normalize_audio
from artalk_tpu.utils.convert import convert_wav2vec

SMALL = hubert_base_config(
    conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
    hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def make_hf(cfg):
    from transformers import HubertConfig, HubertModel

    hf_cfg = HubertConfig(
        conv_dim=list(cfg.conv_dim), conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel), conv_bias=cfg.conv_bias,
        num_feat_extract_layers=len(cfg.conv_dim),
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False, feat_extract_activation="gelu",
    )
    return HubertModel(hf_cfg).eval()


@pytest.fixture(scope="module")
def hf_and_jax():
    torch.manual_seed(0)
    hf = make_hf(SMALL)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_wav2vec(sd, num_layers=SMALL.num_hidden_layers,
                             num_convs=len(SMALL.conv_dim))
    return hf, HubertEncoder(SMALL), params


def _hf_reference_forward(hf, audio, frame_num=None):
    """The reference wrapper's forward (app/modules/hubert.py): z-norm ->
    extractor -> optional linear resize -> projection -> encoder."""
    x = torch.from_numpy(audio)
    x = (x - x.mean(dim=-1, keepdim=True)) / (x.std(dim=-1, keepdim=True) + 1e-6)
    with torch.no_grad():
        feats = hf.feature_extractor(x)
        if frame_num is not None:
            feats = torch.nn.functional.interpolate(
                feats, size=frame_num, align_corners=False, mode="linear")
        feats = feats.transpose(1, 2)
        hidden = hf.feature_projection(feats)
        out = hf.encoder(hidden, attention_mask=None, return_dict=True)[0]
    return out.numpy()


def test_full_forward_parity(hf_and_jax, rng):
    hf, enc, params = hf_and_jax
    audio = rng.standard_normal((2, 1600)).astype(np.float32)
    ref = _hf_reference_forward(hf, audio)
    got = np.asarray(enc(params, jnp.asarray(audio)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_frame_num_resize_parity(hf_and_jax, rng):
    hf, enc, params = hf_and_jax
    audio = rng.standard_normal((1, 1600)).astype(np.float32)
    ref = _hf_reference_forward(hf, audio, frame_num=40)
    got = np.asarray(enc(params, jnp.asarray(audio), frame_num=40))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
