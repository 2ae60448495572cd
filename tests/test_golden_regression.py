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

from artalk_tpu.models.ar_model import BitwiseARModel

from test_ar_model import CFG

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small.npz")


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
