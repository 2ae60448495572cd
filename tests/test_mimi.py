"""Mimi encoder parity vs HF transformers MimiModel (random weights)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from artalk_tpu.models.mimi import MimiEncoder, MimiEncoderConfig, resample_16k_to_24k
from artalk_tpu.utils.convert import convert_mimi

SMALL = MimiEncoderConfig(
    num_filters=8, hidden_size=32, num_hidden_layers=2, num_heads=2,
    head_dim=16, intermediate_size=64, codebook_size=16, codebook_dim=8,
    num_quantizers=4, num_semantic_quantizers=1, sliding_window=16)


def _hf_model(cfg: MimiEncoderConfig):
    from transformers import MimiConfig, MimiModel

    hf_cfg = MimiConfig(
        num_filters=cfg.num_filters, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_heads,
        head_dim=cfg.head_dim, intermediate_size=cfg.intermediate_size,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        vector_quantization_hidden_dimension=cfg.codebook_dim,
        num_quantizers=cfg.num_quantizers,
        num_semantic_quantizers=cfg.num_semantic_quantizers,
        sliding_window=cfg.sliding_window, upsampling_ratios=list(cfg.ratios),
        attention_dropout=0.0, upsample_groups=cfg.hidden_size,
    )
    model = MimiModel(hf_cfg).eval()
    # random-ish codebooks (init is zeros, which would make argmin degenerate)
    torch.manual_seed(3)
    with torch.no_grad():
        for rvq in (model.quantizer.semantic_residual_vector_quantizer,
                    model.quantizer.acoustic_residual_vector_quantizer):
            for layer in rvq.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)
    return model


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = _hf_model(SMALL)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_mimi(sd, num_layers=SMALL.num_hidden_layers)
    return hf, MimiEncoder(SMALL), params


def test_seanet_parity(models, rng):
    hf, enc, params = models
    audio = rng.standard_normal((1, 4800)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(audio)[:, None, :]).numpy()
    got = np.asarray(enc.seanet_encode(params, jnp.asarray(audio)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_encode_codes_parity(models, rng):
    hf, enc, params = models
    audio = rng.standard_normal((1, 4800)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = hf.encode(torch.from_numpy(audio)[:, None, :]).audio_codes.numpy()
    got_codes = np.asarray(enc.encode_codes(params, jnp.asarray(audio)))
    assert got_codes.shape == ref_codes.shape
    # integer codes: identical except distance ties
    assert (got_codes != ref_codes).mean() < 0.01


def test_decode_codes_parity(models, rng):
    hf, enc, params = models
    codes = rng.integers(0, SMALL.codebook_size,
                         (1, SMALL.num_quantizers, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf.quantizer.decode(torch.from_numpy(codes)).numpy()
    got = np.asarray(enc.decode_codes(params, jnp.asarray(codes)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_full_wrapper_shape(models, rng):
    """Reference wrapper semantics: 16 kHz in, (B, T@12.5Hz, hidden) out."""
    _, enc, params = models
    audio16 = rng.standard_normal((1, 6400)).astype(np.float32) * 0.1  # 0.4 s
    out = np.asarray(enc(params, jnp.asarray(audio16)))
    expected_frames = enc.num_output_frames(6400)
    assert out.shape == (1, expected_frames, SMALL.hidden_size)
    assert np.isfinite(out).all()


def test_resampler_tone():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(resample_16k_to_24k(jnp.asarray(tone[None])))[0]
    assert abs(len(out) - 24000) <= 1
    spec = np.abs(np.fft.rfft(out[2000:-2000]))
    freq = np.fft.rfftfreq(len(out) - 4000, 1.0 / 24000)
    assert abs(freq[spec.argmax()] - 440.0) < 2.0


def test_mimi_conditioned_ar_generation(rng):
    """AUDIO_ENCODER='mimi' drives the full AR generate path (app/models.py:28-30)."""
    import jax

    from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig
    from artalk_tpu.models.ar_model import BitwiseARModel

    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16,
                    audio_encoder="mimi", audio_dim=32),
        vae=VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        mimi=SMALL)
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    chunks = jnp.asarray(
        rng.standard_normal((2, 1, model.window_samples)).astype(np.float32))
    style = model.encode_style(params, None)
    motions = jax.jit(model.generate)(params, chunks, style)
    assert motions.shape == (1, 2 * cfg.vae.window, cfg.vae.motion_dim)
    assert np.isfinite(np.asarray(motions)).all()
