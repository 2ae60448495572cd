"""Multi-chip code paths on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from artalk_tpu.parallel.mesh import make_mesh
from artalk_tpu.parallel.sharding import param_shardings, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh()
    assert mesh.shape["dp"] == jax.device_count()


def test_param_sharding_rules():
    from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig

    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16, audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=Wav2VecConfig(
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4))
    from artalk_tpu.models.ar_model import BitwiseARModel

    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=2)
    shardings = param_shardings(params, mesh)
    # column-parallel q, row-parallel proj in AR blocks
    assert shardings["blocks"]["q"]["w"].spec == P(None, None, "tp")
    assert shardings["blocks"]["proj"]["w"].spec == P(None, "tp", None)
    assert shardings["blocks"]["fc1"]["w"].spec == P(None, None, "tp")
    assert shardings["blocks"]["fc2"]["w"].spec == P(None, "tp", None)
    # wav2vec encoder layers likewise; embeddings replicated
    assert shardings["audio_encoder"]["encoder"]["layers"]["q"]["w"].spec == P(None, None, "tp")
    assert shardings["pos_embed"].spec == P()

    sharded = shard_params(params, mesh)
    q = sharded["blocks"]["q"]["w"]
    assert q.sharding.spec == P(None, None, "tp")
    np.testing.assert_allclose(np.asarray(q), np.asarray(params["blocks"]["q"]["w"]))


def test_dryrun_multichip_entrypoint():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def _small_model():
    from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
    from artalk_tpu.models.ar_model import BitwiseARModel

    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16, audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=Wav2VecConfig(
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4))
    model = BitwiseARModel(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_tp_decode_bits_parity():
    """Sharding correctness, not just liveness: tp=2-sharded decode must emit
    the SAME code bits as the unsharded single-device decode. A wrong
    PartitionSpec in parallel/sharding.py corrupts outputs silently; bits are
    the crispest invariant."""
    model, params = _small_model()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, model.window_samples)).astype(np.float32))
    style = model.encode_style(params, None)
    state = model.initial_state(params, style, batch_size=2)

    def decode(p, cond, sc, prev):
        return model.decode_window(p, cond, sc, prev)

    cond = model.audio_condition(params, audio)
    want = np.asarray(jax.jit(decode)(params, cond, style, state.prev_attn_feat))

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        sharded = shard_params(params, mesh)
        got = np.asarray(jax.jit(decode)(sharded, cond, style, state.prev_attn_feat))
    np.testing.assert_array_equal(got, want)


def test_dp_generate_parity():
    """dp-sharded generate must match the unsharded result bit-for-bit in
    code space; motions are compared to tight float tolerance."""
    model, params = _small_model()
    rng = np.random.default_rng(1)
    chunks = jnp.asarray(rng.standard_normal((2, 4, model.window_samples)).astype(np.float32))
    style = model.encode_style(params, None)

    want = np.asarray(jax.jit(model.generate)(params, chunks, style))

    from artalk_tpu.parallel.sharding import batch_sharding

    mesh = make_mesh(dp=4, tp=1)
    with mesh:
        chunks_sh = jax.device_put(chunks, batch_sharding(mesh, 3, axis=1))
        got = np.asarray(jax.jit(model.generate)(params, chunks_sh, style))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_batched_clip_decode_dp():
    """Data-parallel batched decode over clips (BASELINE config #2 shape):
    the generate path works with a dp-sharded batch of 4 clips."""
    from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig, Wav2VecConfig
    from artalk_tpu.models.ar_model import BitwiseARModel
    from artalk_tpu.parallel.sharding import batch_sharding

    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16, audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=Wav2VecConfig(
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4))
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=1)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((2, 4, model.window_samples)).astype(np.float32))
    style = model.encode_style(params, None)
    with mesh:
        chunks = jax.device_put(chunks, batch_sharding(mesh, 3, axis=1))
        generate = jax.jit(model.generate)
        motions = jax.device_get(generate(params, chunks, style))
    assert motions.shape == (4, 2 * cfg.vae.window, cfg.vae.motion_dim)
    assert np.isfinite(motions).all()


def test_render_frames_dp_matches_single_device():
    """Frame-parallel mesh rendering over dp == unsharded renderer output
    (embarrassingly parallel: no collectives, bit-identical math), including
    the ragged-tail pad/trim path."""
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.renderer import MeshRenderer
    from artalk_tpu.parallel.render import render_frames_dp
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=1.0)
    renderer = MeshRenderer(image_size=128, faces=flame_data["faces"],
                            scale=1.0, interpret=True,
                            template_verts=flame_data["v_template"])
    rng = np.random.default_rng(0)
    frames = 5  # ragged vs the 4-device dp axis -> exercises pad/trim
    motions = jnp.asarray(rng.normal(0, 0.3, (frames, 106)).astype(np.float32))
    verts = flame.motion_to_verts(jnp.zeros((frames, 300)), motions,
                                  with_global=True)

    want = np.asarray(renderer(verts))
    mesh = make_mesh(dp=4, tp=1)
    got = np.asarray(render_frames_dp(renderer, verts, mesh))
    assert got.shape == want.shape == (frames, 128, 128, 3)
    np.testing.assert_array_equal(got, want)
