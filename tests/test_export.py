"""jax.export deployment artifact: serialize -> deserialize -> same outputs."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models.ar_model import BitwiseARModel
from tools.export_model import export_window_step, load_window_step

CFG = ModelConfig(
    ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16, audio_dim=32),
    vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                  hidden_dim=32, patch_nums=(1, 2, 4)),
    wav2vec=Wav2VecConfig(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4))


def test_exported_window_step_roundtrip(tmp_path):
    """The serialized artifact reproduces the live window step exactly and
    survives a disk round-trip (the serving-container contract)."""
    model = BitwiseARModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    blob = export_window_step(model, params, batch=2)

    path = tmp_path / "window_step_b2.stablehlo"
    path.write_bytes(blob)
    restored = load_window_step(path.read_bytes())

    rng = np.random.default_rng(0)
    style = jnp.asarray(rng.standard_normal((2, 1, CFG.ar.embed_dim))
                        .astype(np.float32) * 0.1)
    state = model.initial_state(params, style, batch_size=2)
    chunk = jnp.asarray(rng.standard_normal((2, model.window_samples))
                        .astype(np.float32) * 0.1)

    want_state, want_motion = model.window_step(params, state, chunk, style)
    got_state, got_motion = restored.call(params, state, chunk, style)

    np.testing.assert_array_equal(np.asarray(got_state.prev_bits),
                                  np.asarray(want_state.prev_bits))
    np.testing.assert_allclose(np.asarray(got_motion),
                               np.asarray(want_motion), atol=1e-6)
