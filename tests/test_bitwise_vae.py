"""BITWISE_VAE parity vs a torch oracle + structural invariants."""

import numpy as np
import pytest
import torch
import torch.nn as nn_t
import torch.nn.functional as F_t

import jax
import jax.numpy as jnp

from artalk_tpu.config import VAEConfig
from artalk_tpu.models.bitwise_vae import BitwiseVAE
from artalk_tpu.utils.convert import convert_vae

CFG = VAEConfig(motion_dim=12, code_dim=8, depth=2, num_heads=4, hidden_dim=32,
                patch_nums=(1, 2, 4))


class TorchVAEOracle(nn_t.Module):
    """Same encoder/decoder tower structure as the reference
    (bitwise_vae.py:128-215): pre-LN attention with hidden_dim**-0.5 scale,
    residual FFN without pre-norm, LeakyReLU input mapping."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        h, d = cfg.hidden_dim, cfg.depth
        self.cfg = cfg
        self.heads = cfg.num_heads

        def tower():
            blocks = nn_t.ModuleList()
            for _ in range(d):
                attn = nn_t.ModuleDict({
                    "norm": nn_t.LayerNorm(h, eps=1e-5),
                    "to_qkv": nn_t.Linear(h, 3 * h, bias=False),
                    "to_out": nn_t.Linear(h, h),
                })
                ffn = nn_t.Sequential(
                    nn_t.Linear(h, int(1.5 * h)), nn_t.GELU(approximate="tanh"),
                    nn_t.Linear(int(1.5 * h), h))
                blocks.append(nn_t.ModuleDict({"attn": attn, "ffn": ffn}))
            return blocks

        self.enc_inp = nn_t.Linear(cfg.motion_dim, h)
        self.enc_blocks = tower()
        self.enc_out = nn_t.Linear(h, cfg.code_dim)
        self.dec_inp = nn_t.Linear(cfg.code_dim, h)
        self.dec_blocks = tower()
        self.dec_out = nn_t.Linear(h, cfg.motion_dim)

    def _attn(self, block, x, mask):
        h = self.cfg.hidden_dim
        qkv = block["to_qkv"](block["norm"](x))
        q, k, v = qkv.chunk(3, dim=-1)
        def heads(t):
            b, l, _ = t.shape
            return t.view(b, l, self.heads, -1).transpose(1, 2)
        out = F_t.scaled_dot_product_attention(
            heads(q), heads(k), heads(v), scale=h ** -0.5, attn_mask=mask)
        b, nh, l, hd = out.shape
        return block["to_out"](out.transpose(1, 2).reshape(b, l, nh * hd))

    def _tower(self, blocks, x, mask):
        for block in blocks:
            x = x + self._attn(block["attn"], x, mask)
            x = x + block["ffn"](x)
        return x

    def encode(self, x, mask=None):
        feat = F_t.leaky_relu(self.enc_inp(x), 0.2)
        return self.enc_out(self._tower(self.enc_blocks, feat, mask))

    def decode(self, x, mask=None):
        feat = F_t.leaky_relu(self.dec_inp(x), 0.2)
        return self.dec_out(self._tower(self.dec_blocks, feat, mask))


def _state_dict_in_reference_layout(oracle: TorchVAEOracle, vae: BitwiseVAE, rng):
    """Serialize the oracle under the reference's state-dict key names."""
    sd = {}
    for coder, inp, blocks, out in [
        ("encoder", oracle.enc_inp, oracle.enc_blocks, oracle.enc_out),
        ("decoder", oracle.dec_inp, oracle.dec_blocks, oracle.dec_out),
    ]:
        tower_name = f"{coder}.{'encoder' if coder == 'encoder' else 'decoder'}_transformer"
        sd[f"{coder}.inp_mapping.0.weight"] = inp.weight.detach().numpy()
        sd[f"{coder}.inp_mapping.0.bias"] = inp.bias.detach().numpy()
        out_name = "code_mapping" if coder == "encoder" else "out_mapping"
        sd[f"{coder}.{out_name}.weight"] = out.weight.detach().numpy()
        sd[f"{coder}.{out_name}.bias"] = out.bias.detach().numpy()
        for i, block in enumerate(blocks):
            a = block["attn"]
            sd[f"{tower_name}.{2*i}.norm.weight"] = a["norm"].weight.detach().numpy()
            sd[f"{tower_name}.{2*i}.norm.bias"] = a["norm"].bias.detach().numpy()
            sd[f"{tower_name}.{2*i}.to_qkv.weight"] = a["to_qkv"].weight.detach().numpy()
            sd[f"{tower_name}.{2*i}.to_out.weight"] = a["to_out"].weight.detach().numpy()
            sd[f"{tower_name}.{2*i}.to_out.bias"] = a["to_out"].bias.detach().numpy()
            f = block["ffn"]
            sd[f"{tower_name}.{2*i+1}.0.weight"] = f[0].weight.detach().numpy()
            sd[f"{tower_name}.{2*i+1}.0.bias"] = f[0].bias.detach().numpy()
            sd[f"{tower_name}.{2*i+1}.2.weight"] = f[2].weight.detach().numpy()
            sd[f"{tower_name}.{2*i+1}.2.bias"] = f[2].bias.detach().numpy()
    w = vae.window
    sd["enc_pos_embed"] = rng.standard_normal((1, 2 * w, CFG.motion_dim)).astype(np.float32) * 0.1
    sd["dec_pos_embed"] = rng.standard_normal((1, 2 * w, CFG.code_dim)).astype(np.float32) * 0.1
    sd["motion_mean"] = np.zeros(CFG.motion_dim, np.float32)
    sd["motion_std"] = np.ones(CFG.motion_dim, np.float32)
    return sd


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(2)
    vae = BitwiseVAE(CFG)
    oracle = TorchVAEOracle(CFG).eval()
    rng = np.random.default_rng(3)
    sd = _state_dict_in_reference_layout(oracle, vae, rng)
    params = convert_vae(sd, depth=CFG.depth)
    return vae, oracle, params, sd


def test_encode_to_bits_matches_oracle(setup, rng):
    vae, oracle, params, sd = setup
    w = vae.window
    prev = rng.standard_normal((2, w, CFG.motion_dim)).astype(np.float32)
    this = rng.standard_normal((2, w, CFG.motion_dim)).astype(np.float32)
    prev_bits, this_bits = vae.encode_to_bits(params, jnp.asarray(prev), jnp.asarray(this))

    # torch oracle path: two-window mask + pyramid quantization
    mask = torch.zeros(2 * w, 2 * w)
    mask[:w, w:] = float("-inf")
    x = torch.from_numpy(np.concatenate([prev, this], axis=1))
    x = x + torch.from_numpy(sd["enc_pos_embed"])
    with torch.no_grad():
        enc_out = oracle.encode(x, mask[None, None])
    # quantize each window with the jax pyramid (already oracle-tested in test_bsq)
    _, ref_prev = vae.quantizer.encode(jnp.asarray(enc_out[:, :w].numpy()))
    _, ref_this = vae.quantizer.encode(jnp.asarray(enc_out[:, w:].numpy()))
    assert (np.asarray(prev_bits) != np.asarray(ref_prev)).mean() < 1e-3
    assert (np.asarray(this_bits) != np.asarray(ref_this)).mean() < 1e-3


def test_decode_matches_oracle(setup, rng):
    vae, oracle, params, sd = setup
    w = vae.window
    n_tokens = sum(CFG.patch_nums)
    prev_bits = (rng.random((2, n_tokens, CFG.code_dim)) > 0.5).astype(np.int32)
    this_bits = (rng.random((2, n_tokens, CFG.code_dim)) > 0.5).astype(np.int32)
    prev_m, this_m = vae.decode_from_bits(params, jnp.asarray(prev_bits), jnp.asarray(this_bits))

    feat = np.concatenate([
        np.asarray(vae.quantizer.bits_to_feat(jnp.asarray(prev_bits))),
        np.asarray(vae.quantizer.bits_to_feat(jnp.asarray(this_bits))),
    ], axis=1)
    mask = torch.zeros(2 * w, 2 * w)
    mask[:w, w:] = float("-inf")
    with torch.no_grad():
        ref = oracle.decode(
            torch.from_numpy(feat) + torch.from_numpy(sd["dec_pos_embed"]),
            mask[None, None]).numpy()
    got = np.concatenate([np.asarray(prev_m), np.asarray(this_m)], axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_prev_window_blind_to_current(setup, rng):
    """The block mask must make prev-window codes independent of the current
    window's content (bitwise_vae.py:68-76)."""
    vae, _, params, _ = setup
    w = vae.window
    prev = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    this_a = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    this_b = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    bits_a, _ = vae.encode_to_bits(params, jnp.asarray(prev), jnp.asarray(this_a))
    bits_b, _ = vae.encode_to_bits(params, jnp.asarray(prev), jnp.asarray(this_b))
    np.testing.assert_array_equal(np.asarray(bits_a), np.asarray(bits_b))


def test_single_window_encode_matches_prev_of_pair(setup, rng):
    """encode(prev) without a pair must equal the prev half of encode(prev, this)
    -- the property the AR bootstrap relies on (models.py:86-87 vs 111)."""
    vae, _, params, _ = setup
    w = vae.window
    prev = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    this = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    solo, none = vae.encode_to_bits(params, jnp.asarray(prev))
    assert none is None
    pair_prev, _ = vae.encode_to_bits(params, jnp.asarray(prev), jnp.asarray(this))
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(pair_prev))


def test_reconstruct_training_path(setup, rng):
    vae, _, params, _ = setup
    w = vae.window
    prev = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    this = rng.standard_normal((1, w, CFG.motion_dim)).astype(np.float32)
    rp, rt, aux = vae.reconstruct(params, jnp.asarray(prev), jnp.asarray(this))
    assert rp.shape == (1, w, CFG.motion_dim) and rt.shape == (1, w, CFG.motion_dim)
    assert aux.shape == (2, len(CFG.patch_nums))
    # gradients flow through the straight-through quantizer
    def loss_fn(p):
        a, b, _ = vae.reconstruct(p, jnp.asarray(prev), jnp.asarray(this))
        return jnp.mean((a - prev) ** 2) + jnp.mean((b - this) ** 2)
    grads = jax.grad(loss_fn)(params)
    g = np.asarray(grads["encoder"]["inp"]["w"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
