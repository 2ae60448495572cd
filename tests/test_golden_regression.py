"""Golden regression: seed-0 weights + fixed audio -> committed code bits.

The fixture (tests/fixtures/golden_small.npz, written by tools/make_golden.py)
pins the exact greedy decode on the CPU backend. Any numeric drift anywhere in
the pipeline -- resize matrices, attention, BSQ quantization, KV-cache layout,
window-carry handling -- flips a bit here. (The reference-weight golden files
need the released checkpoints; this is the always-runnable analogue.)
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models.ar_model import BitwiseARModel

from test_ar_model import CFG

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small.npz")
PROD_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "golden_production.npz")

# Production geometry everywhere the token/bit layout is concerned: full AR
# (768-d, depth 12, 12 heads, 181 tokens over scales 1+5+25+50+100), full VAE
# (512/8/8, code_dim 32, 106-d motion), style_dim 128, and the REAL wav2vec
# conv stack + width (1024-d cond, 320x downsample -> 200 frames/window) --
# only the encoder depth is cut 24 -> 2 to keep CI tractable. Exercises the
# exact resize matrices, mask extents, cache layout and head shapes that
# BENCH-day runs use.
PROD_GOLDEN_CFG = ModelConfig(
    ar=ARConfig(),      # production defaults: 768/12/12, patch sums to 181
    vae=VAEConfig(),    # production defaults: 512/8/8, code 32, motion 106
    wav2vec=Wav2VecConfig(num_hidden_layers=2),
)


def test_golden_codes_and_motions():
    model = BitwiseARModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1234)
    chunks = (rng.standard_normal((3, 1, model.window_samples)) * 0.1
              ).astype(np.float32)
    style = model.encode_style(params, None)
    state = model.initial_state(params, style)
    with np.load(FIXTURE) as z:
        want_bits, want_motions = z["bits"], z["motions"]
    for i in range(chunks.shape[0]):
        cond = model.audio_condition(params, jnp.asarray(chunks[i]))
        bits = model.decode_window(params, cond, style, state.prev_attn_feat)
        state, motion = model.window_step(params, state, jnp.asarray(chunks[i]),
                                          style)
        np.testing.assert_array_equal(np.asarray(bits, np.int8), want_bits[i],
                                      err_msg=f"window {i} code bits drifted")
        np.testing.assert_allclose(np.asarray(motion), want_motions[i],
                                   atol=1e-6,
                                   err_msg=f"window {i} motions drifted")


def test_golden_codes_and_motions_production_shape():
    """Bit-pin the PRODUCTION geometry (768/12/12 AR over 181 tokens, 512/8/8
    VAE, code_dim 32, real wav2vec conv stack at 1024-d cond). Per-level
    comparison localizes any drift to the scale level that first diverges
    (SURVEY 7.3 hard-part #1)."""
    model = BitwiseARModel(PROD_GOLDEN_CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(20260816)
    chunks = (rng.standard_normal((2, 1, model.window_samples)) * 0.1
              ).astype(np.float32)
    style = model.encode_style(params, None)
    state = model.initial_state(params, style)
    with np.load(PROD_FIXTURE) as z:
        want_bits, want_motions = z["bits"], z["motions"]
    for i in range(chunks.shape[0]):
        cond = model.audio_condition(params, jnp.asarray(chunks[i]))
        bits = np.asarray(
            model.decode_window(params, cond, style, state.prev_attn_feat),
            np.int8)
        state, motion = model.window_step(params, state, jnp.asarray(chunks[i]),
                                          style)
        for level, (pn, off) in enumerate(zip(model.patch_nums, model.offsets)):
            np.testing.assert_array_equal(
                bits[:, off:off + pn], want_bits[i][:, off:off + pn],
                err_msg=f"window {i} level {level} (pn={pn}) code bits drifted")
        np.testing.assert_allclose(
            np.asarray(motion), want_motions[i], atol=1e-5,
            err_msg=f"window {i} motions drifted")
