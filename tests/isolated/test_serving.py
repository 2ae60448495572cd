"""StreamPool: batched multi-session streaming equals independent streams."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
from artalk_tpu.models.ar_model import BitwiseARModel
from artalk_tpu.serving import StreamPool

CFG = ModelConfig(
    ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16, audio_dim=32),
    vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                  hidden_dim=32, patch_nums=(1, 2, 4)),
    wav2vec=Wav2VecConfig(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4))


from conftest import no_persistent_compile_cache_fixture

_no_persistent_compile_cache = no_persistent_compile_cache_fixture()


@pytest.fixture(scope="module")
def model_and_params():
    model = BitwiseARModel(CFG)
    return model, model.init(jax.random.PRNGKey(0))


def _single_stream(model, params, style_motion, chunks):
    """Reference: one session decoded alone at batch 1."""
    style = (model.encode_style(params, None) if style_motion is None
             else model.encode_style(params, jnp.asarray(style_motion)[None]))
    state = model.initial_state(params, style, batch_size=1)
    outs = []
    for chunk in chunks:
        buf = np.zeros(model.window_samples, np.float32)
        buf[:len(chunk)] = chunk
        state, motion = model.window_step(params, state, jnp.asarray(buf[None]),
                                          style)
        outs.append(np.asarray(motion[0]))
    return outs


def test_pool_matches_independent_streams(model_and_params):
    """Two concurrent sessions (one styled, one joining late, one idle tick)
    produce the same motions as each stream decoded alone."""
    model, params = model_and_params
    rng = np.random.default_rng(0)
    ws = model.window_samples
    a_chunks = [rng.standard_normal(ws).astype(np.float32) * 0.1
                for _ in range(3)]
    b_chunks = [rng.standard_normal(ws).astype(np.float32) * 0.1
                for _ in range(2)]
    style_b = rng.standard_normal((50, CFG.vae.motion_dim)).astype(np.float32)

    pool = StreamPool(model, params, max_sessions=3)
    sa = pool.open_session()
    got_a, got_b = [], []

    got_a.append(pool.step({sa: a_chunks[0]})[sa])          # b not joined yet
    sb = pool.open_session(style_motion=style_b)
    out = pool.step({sa: a_chunks[1], sb: b_chunks[0]})
    got_a.append(out[sa]); got_b.append(out[sb])
    got_a.append(pool.step({sa: a_chunks[2]})[sa])          # b idles this tick
    got_b.append(pool.step({sb: b_chunks[1]})[sb])          # a idles

    want_a = _single_stream(model, params, None, a_chunks)
    want_b = _single_stream(model, params, style_b, b_chunks)
    for got, want in zip(got_a, want_a):
        np.testing.assert_allclose(got, want, atol=1e-5)
    for got, want in zip(got_b, want_b):
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_slot_reuse_resets_state(model_and_params):
    """close + open reuses the slot with a fresh carry (no state leakage)."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    ws = model.window_samples
    chunk = rng.standard_normal(ws).astype(np.float32) * 0.1

    pool = StreamPool(model, params, max_sessions=1)
    s0 = pool.open_session()
    first = pool.step({s0: chunk})[s0]
    pool.step({s0: chunk})  # advance the carry away from the initial state
    pool.close_session(s0)
    s1 = pool.open_session()          # freed slot is claimable again
    with pytest.raises(RuntimeError):
        pool.open_session()           # ... and the pool is full again
    # the reused slot starts from a fresh carry, not the old session's
    np.testing.assert_allclose(pool.step({s1: chunk})[s1], first, atol=1e-6)


def test_short_chunk_frame_trim(model_and_params):
    """A final short chunk yields ceil(samples/sr*fps) frames, like
    engine.stream."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    pool = StreamPool(model, params, max_sessions=2)
    sid = pool.open_session()
    half = rng.standard_normal(model.window_samples // 2).astype(np.float32)
    out = pool.step({sid: half})[sid]
    import math
    want = math.ceil(len(half) / CFG.sample_rate * CFG.fps)
    assert out.shape == (want, CFG.vae.motion_dim)


def test_unknown_session_rejected(model_and_params):
    model, params = model_and_params
    pool = StreamPool(model, params, max_sessions=1)
    with pytest.raises(KeyError):
        pool.step({0: np.zeros(16, np.float32)})


def test_grow_preserves_live_sessions(model_and_params):
    """grow() re-pads carries into a bigger pool without perturbing live
    sessions: their post-grow windows must equal the same stream decoded
    alone, and new slots must be usable."""
    model, params = model_and_params
    rng = np.random.default_rng(7)
    ws = model.window_samples
    clip = [rng.standard_normal(ws).astype(np.float32) * 0.1 for _ in range(3)]
    want = _single_stream(model, params, None, clip)

    pool = StreamPool(model, params, max_sessions=2)
    sid = pool.open_session()
    out0 = pool.step({sid: clip[0]})[sid]
    np.testing.assert_allclose(out0, want[0], atol=1e-5)

    with pytest.raises(ValueError):
        pool.grow(2)  # must strictly increase
    pool.grow(4)
    assert pool.capacity == 4
    # live session continues bit-exactly across the resize
    out1 = pool.step({sid: clip[1]})[sid]
    np.testing.assert_allclose(out1, want[1], atol=1e-5)
    # new capacity is genuinely usable: fill all 4 slots
    others = [pool.open_session() for _ in range(3)]
    outs = pool.step({sid: clip[2], others[0]: clip[0],
                      others[1]: clip[0], others[2]: clip[0]})
    np.testing.assert_allclose(outs[sid], want[2], atol=1e-5)
    np.testing.assert_allclose(outs[others[0]], want[0], atol=1e-5)
