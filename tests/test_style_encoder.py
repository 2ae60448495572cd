"""StyleEncoder parity vs a torch nn.TransformerEncoder oracle."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn_t

import jax.numpy as jnp

from artalk_tpu.models.style_encoder import StyleEncoder
from artalk_tpu.utils.convert import convert_style_encoder


class TorchOracle(nn_t.Module):
    """Same architecture the reference builds (style_encoder.py:10-43):
    motion proj -> single-position sinusoidal PE -> 4-layer post-LN
    transformer -> mean pool. Built from standard torch modules."""

    def __init__(self, motion_dim=106, d=128, heads=4, layers=4, ff=512, max_len=600):
        super().__init__()
        layer = nn_t.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, activation="gelu",
            batch_first=True, dropout=0.0,
        )
        self.encoder = nn_t.ModuleDict({
            "motion_proj": nn_t.Linear(motion_dim, d),
            "transformer": nn_t.TransformerEncoder(layer, num_layers=layers),
        })
        pe = torch.zeros(max_len, d)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe.unsqueeze(0))
        self.register_buffer("motion_mean", torch.zeros(motion_dim))
        self.register_buffer("motion_std", torch.ones(motion_dim))

    def forward(self, motion):
        x = (motion - self.motion_mean) / self.motion_std
        x = self.encoder["motion_proj"](x)
        x = x + self.pe[:, x.shape[1], :]  # the reference's PE quirk
        x = self.encoder["transformer"](x)
        return x.mean(dim=1)


@pytest.mark.parametrize("seq_len", [50, 30])
def test_style_encoder_parity(seq_len, rng):
    torch.manual_seed(1)
    oracle = TorchOracle().eval()
    sd = {("PE.pe" if k == "pe" else k): v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    params = convert_style_encoder(sd)
    enc = StyleEncoder()

    motion = rng.standard_normal((2, seq_len, 106)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(motion)).numpy()
    got = np.asarray(enc(params, jnp.asarray(motion)))
    np.testing.assert_allclose(got, ref, atol=2e-5)
