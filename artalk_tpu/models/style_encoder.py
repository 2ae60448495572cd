"""Style encoder: a 50-frame (2 s) motion clip -> 128-d style vector.

Post-LN transformer encoder over projected motion features, mean-pooled
(reference: app/modules/style_encoder.py:10-43). Replicates the reference's
positional-encoding quirk exactly: a *single* position's sinusoidal encoding
(index = sequence length) is broadcast-added to all frames
(style_encoder.py:59) -- checkpoint parity requires keeping it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import nn
from .data_stats import ALLTALKEMICA_MEAN, ALLTALKEMICA_STD


class StyleEncoder:
    def __init__(self, motion_dim: int = 106, feature_dim: int = 128,
                 num_heads: int = 4, num_layers: int = 4, ffn_dim: int = 512,
                 max_len: int = 600):
        self.motion_dim = motion_dim
        self.feature_dim = feature_dim
        self.num_heads = num_heads
        self.num_layers = num_layers
        self.ffn_dim = ffn_dim
        self.max_len = max_len

    def init(self, key: jax.Array) -> nn.Params:
        keys = jax.random.split(key, self.num_layers + 1)

        def layer(k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            d = self.feature_dim
            return {
                # torch MultiheadAttention packs q/k/v into one in-projection
                # (xavier_uniform init over the packed matrix, zero bias)
                "qkv": {
                    "w": nn.xavier_uniform(k1, (d, 3 * d), fan_in=d, fan_out=3 * d),
                    "b": jnp.zeros((3 * d,)),
                },
                "out": nn.linear_init(k2, d, d, bias=True),
                "norm1": nn.layer_norm_init(d),
                "norm2": nn.layer_norm_init(d),
                "fc1": nn.linear_init(k3, d, self.ffn_dim, bias=True),
                "fc2": nn.linear_init(k4, self.ffn_dim, d, bias=True),
            }

        layers = [layer(keys[i]) for i in range(self.num_layers)]
        if self.motion_dim == ALLTALKEMICA_MEAN.shape[0]:
            mean, std = ALLTALKEMICA_MEAN, ALLTALKEMICA_STD
        else:  # non-standard motion dim (tests / custom datasets): identity stats
            mean = jnp.zeros((self.motion_dim,))
            std = jnp.ones((self.motion_dim,))
        return {
            "proj": nn.linear_init(keys[-1], self.motion_dim, self.feature_dim),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
            "pe": jnp.asarray(nn.sinusoidal_pe(self.max_len, self.feature_dim))[None],
            "motion_mean": jnp.asarray(mean),
            "motion_std": jnp.asarray(std),
        }

    def __call__(self, params: nn.Params, motion: jnp.ndarray) -> jnp.ndarray:
        """(B, L, 106) motion clip -> (B, 128) style vector."""
        num_heads = self.num_heads
        x = (motion - params["motion_mean"]) / params["motion_std"]
        x = nn.linear(params["proj"], x)
        # reference quirk: add pe at index L (a single position) to every frame
        x = x + params["pe"][:, x.shape[1], :]

        def layer_body(h, p):
            qkv = nn.linear(p["qkv"], h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (nn.split_heads(t, num_heads) for t in (q, k, v))
            head_dim = q.shape[-1]
            attn = nn.merge_heads(nn.sdpa(q, k, v, scale=head_dim ** -0.5))
            h = nn.layer_norm_apply(p["norm1"], h + nn.linear(p["out"], attn))
            ffn = nn.linear(p["fc2"], nn.gelu_erf(nn.linear(p["fc1"], h)))
            h = nn.layer_norm_apply(p["norm2"], h + ffn)
            return h, None

        x, _ = jax.lax.scan(layer_body, x, params["layers"])
        return jnp.mean(x, axis=1)
