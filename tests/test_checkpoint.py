"""Checkpoint persistence: npz round-trip, orbax round-trip, config parity."""

import json

import numpy as np
import pytest

import jax

from artalk_tpu.config import ModelConfig, VAEConfig, load_config
from artalk_tpu.models.bitwise_vae import BitwiseVAE
from artalk_tpu.utils.checkpoint import (load_params, load_params_orbax,
                                         save_params, save_params_orbax)

CFG = VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4, hidden_dim=32,
                patch_nums=(1, 2, 4))


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path):
    vae = BitwiseVAE(CFG)
    params = vae.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "vae.npz")
    save_params(params, path)
    restored = load_params(path, like=params)
    _tree_equal(params, restored)


def test_npz_shape_validation(tmp_path):
    vae = BitwiseVAE(CFG)
    params = vae.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "vae.npz")
    save_params(params, path)
    other = BitwiseVAE(VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                                 hidden_dim=64, patch_nums=(1, 2, 4)))
    template = other.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_params(path, like=template)


def test_npz_missing_key(tmp_path):
    vae = BitwiseVAE(CFG)
    params = vae.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "vae.npz")
    partial = dict(params)
    del partial["enc_pos_embed"]
    save_params(partial, path)
    with pytest.raises(KeyError):
        load_params(path, like=params)


def test_orbax_roundtrip(tmp_path):
    vae = BitwiseVAE(CFG)
    params = vae.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    save_params_orbax(params, path)
    restored = load_params_orbax(path, like=params)
    _tree_equal(params, restored)


def test_config_json_roundtrip(tmp_path):
    """Reference-format config.json loads verbatim and round-trips."""
    ref_json = {
        "AR_CONFIG": {"T_DEPTH": 12, "T_NUM_HEADS": 12, "PREV_RATIO": 1},
        "VAE_CONFIG": {"MOTION_DIM": 106, "V_CODE_DIM": 32, "T_DEPTH": 8,
                       "T_NUM_HEADS": 8, "T_HIDDEN_DIM": 512,
                       "V_PATCH_NUMS": [1, 5, 25, 50, 100]},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref_json))
    cfg = load_config(str(p))
    assert cfg.ar.depth == 12 and cfg.vae.patch_nums == (1, 5, 25, 50, 100)
    assert cfg.vae.total_tokens == 181 and cfg.window_audio_samples == 64000
    out = cfg.to_json_dict()
    assert out["AR_CONFIG"]["T_DEPTH"] == 12
    assert out["VAE_CONFIG"]["V_PATCH_NUMS"] == [1, 5, 25, 50, 100]
    assert ModelConfig.from_json_dict(out).vae == cfg.vae
