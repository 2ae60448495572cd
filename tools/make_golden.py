#!/usr/bin/env python
"""Generate the committed golden-regression fixture: seed-0 random weights +
deterministic synthetic audio -> greedy motion codes and motions on the CPU
backend. Any future change that flips a single code bit (numeric drift in the
resizes, attention, BSQ, or the KV-cache layout) fails the regression test.

Run from the repo root: python tools/make_golden.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_ar_model import CFG  # noqa: E402  (the small test config)
from artalk_tpu.models.ar_model import BitwiseARModel  # noqa: E402


def main():
    model = BitwiseARModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1234)
    chunks = (rng.standard_normal((3, 1, model.window_samples)) * 0.1
              ).astype(np.float32)
    style = model.encode_style(params, None)
    state = model.initial_state(params, style)
    all_bits, motions = [], []
    import jax.numpy as jnp

    for i in range(chunks.shape[0]):
        cond = model.audio_condition(params, jnp.asarray(chunks[i]))
        bits = model.decode_window(params, cond, style, state.prev_attn_feat)
        state, motion = model.window_step(params, state, jnp.asarray(chunks[i]),
                                          style)
        all_bits.append(np.asarray(bits, np.int8))
        motions.append(np.asarray(motion, np.float32))
    out = os.path.join("tests", "fixtures", "golden_small.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, bits=np.stack(all_bits), motions=np.stack(motions))
    print("wrote", out, np.stack(all_bits).shape, np.stack(motions).shape)




def main_production():
    """Production-geometry fixture (see tests/test_golden_regression.py's
    PROD_GOLDEN_CFG): full AR/VAE shapes, 2-layer wav2vec encoder."""
    # tests/ on sys.path so intra-test imports resolve like under pytest
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_golden_regression import PROD_GOLDEN_CFG
    import jax.numpy as jnp

    model = BitwiseARModel(PROD_GOLDEN_CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(20260816)
    chunks = (rng.standard_normal((2, 1, model.window_samples)) * 0.1
              ).astype(np.float32)
    style = model.encode_style(params, None)
    state = model.initial_state(params, style)
    all_bits, motions = [], []
    for i in range(chunks.shape[0]):
        cond = model.audio_condition(params, jnp.asarray(chunks[i]))
        bits = model.decode_window(params, cond, style, state.prev_attn_feat)
        state, motion = model.window_step(params, state, jnp.asarray(chunks[i]),
                                          style)
        all_bits.append(np.asarray(bits, np.int8))
        motions.append(np.asarray(motion, np.float32))
    out = os.path.join("tests", "fixtures", "golden_production.npz")
    np.savez_compressed(out, bits=np.stack(all_bits), motions=np.stack(motions))
    print("wrote", out, np.stack(all_bits).shape, np.stack(motions).shape)


if __name__ == "__main__":
    main()
    main_production()
