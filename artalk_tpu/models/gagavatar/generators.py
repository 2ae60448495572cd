"""Gaussian-parameter generators + camera/plane geometry for GAGAvatar.

Equivalents of LinearGSGenerator / ConvGSGenerator / build_points_planes /
transform_emoca_to_p3d (reference: app/GAGAvatar/models.py:141-264).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..flame import batch_rodrigues


def harmonic_embedding(x: jnp.ndarray, n_harmonic: int = 4) -> jnp.ndarray:
    """PyTorch3D HarmonicEmbedding(n, append_input=True): sin/cos of
    2^k-scaled inputs, input appended. (..., 3) -> (..., n*2*3 + 3)."""
    freqs = 2.0 ** jnp.arange(n_harmonic, dtype=jnp.float32)
    # pytorch3d layout: coordinate-major ((..., 3, n) flattened)
    scaled = x[..., :, None] * freqs
    flat = scaled.reshape(x.shape[:-1] + (x.shape[-1] * n_harmonic,))
    return jnp.concatenate([jnp.sin(flat), jnp.cos(flat), x], axis=-1)


def _mlp_init(key, dims, bias=True):
    ks = jax.random.split(key, len(dims) - 1)
    return [nn.linear_init(k, dims[i], dims[i + 1], bias=bias)
            for i, k in enumerate(ks)]


def _mlp(params, x, final_act=None):
    for i, p in enumerate(params):
        x = nn.linear(p, x)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


class LinearGSGenerator:
    """Per-FLAME-vertex gaussian head (models.py:141-193)."""

    def __init__(self, in_dim: int = 1024, dir_dim: int = 27):
        self.in_dim = in_dim
        self.dir_dim = dir_dim

    def init(self, key: jax.Array) -> nn.Params:
        ks = jax.random.split(key, 5)
        quarter = self.in_dim // 4
        mid = quarter + self.dir_dim
        return {
            "features": _mlp_init(ks[0], [self.in_dim, quarter, quarter, quarter, quarter]),
            "color": _mlp_init(ks[1], [mid, 128, 32]),
            "opacity": _mlp_init(ks[2], [mid, 128, 1]),
            "scale": _mlp_init(ks[3], [mid, 128, 3]),
            "rotation": _mlp_init(ks[4], [mid, 128, 4]),
        }

    def __call__(self, params: nn.Params, features: jnp.ndarray,
                 plane_direnc: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feat = _mlp(params["features"], features)
        # final feature layer has no trailing ReLU in the reference Sequential
        direnc = jnp.broadcast_to(plane_direnc[:, None],
                                  (feat.shape[0], feat.shape[1], plane_direnc.shape[-1]))
        feat = jnp.concatenate([feat, direnc], axis=-1)
        colors = _mlp(params["color"], feat)
        colors = colors.at[..., :3].set(jax.nn.sigmoid(colors[..., :3]))
        opacities = jax.nn.sigmoid(_mlp(params["opacity"], feat))
        scales = jax.nn.sigmoid(_mlp(params["scale"], feat)) * 0.05
        # Reference quirk (models.py:191-192): F.normalize with its DEFAULT
        # dim=1 on a (B, N, 4) tensor -- the l2-norm runs over the N vertex
        # axis, not the quaternion components (contrast ConvGSGenerator,
        # where the NCHW layout makes dim=1 the quaternion axis). Checkpoint
        # parity requires the same axis.
        rotations = nn.l2_normalize(_mlp(params["rotation"], feat), axis=1)
        return {"colors": colors, "opacities": opacities, "scales": scales,
                "rotations": rotations}


class ConvGSGenerator:
    """Dense-plane gaussian head over the 296^2 DPT map (models.py:196-233)."""

    OUT = 32 + 1 + 3 + 4 + 1

    def __init__(self, in_dim: int = 256, dir_dim: int = 27):
        self.in_dim = in_dim
        self.dir_dim = dir_dim

    def init(self, key: jax.Array) -> nn.Params:
        ks = jax.random.split(key, 4)
        cin = self.in_dim + self.dir_dim
        half = self.in_dim // 2

        def conv(k, ci, co, ksize):
            fan_in = ci * ksize * ksize
            return {"w": nn.kaiming_uniform(k, (co, ci, ksize, ksize), fan_in=fan_in),
                    "b": jnp.zeros((co,))}

        return {
            "conv1": conv(ks[0], cin, half, 3),
            "conv2": conv(ks[1], half, half, 3),
            "conv3": conv(ks[2], half, half, 3),
            "conv4": conv(ks[3], half, self.OUT, 1),
        }

    def __call__(self, params: nn.Params, features: jnp.ndarray,
                 plane_direnc: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, c, h, w = features.shape
        direnc = jnp.broadcast_to(plane_direnc[:, :, None, None],
                                  (b, plane_direnc.shape[-1], h, w))
        x = jnp.concatenate([features, direnc], axis=1)

        def conv(p, x, ksize):
            pad = ksize // 2
            return jax.lax.conv_general_dilated(
                x, p["w"], (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW")) + p["b"][None, :, None, None]

        x = jax.nn.relu(conv(params["conv1"], x, 3))
        x = jax.nn.relu(conv(params["conv2"], x, 3))
        x = jax.nn.relu(conv(params["conv3"], x, 3))
        g = conv(params["conv4"], x, 1)                      # (B, 41, H, W)

        colors = g[:, :32]
        # Reference quirk (models.py:215-216): on this NCHW map the reference
        # writes ``colors[..., :3] = sigmoid(colors[..., :3])`` -- the first 3
        # *width columns* (all 32 channels), NOT the first 3 channels as in
        # LinearGSGenerator (models.py:181-182). Checkpoints were exported
        # against that behavior, so parity requires replicating it verbatim.
        colors = colors.at[..., :3].set(jax.nn.sigmoid(colors[..., :3]))
        opacities = jax.nn.sigmoid(g[:, 32:33])
        scales = jax.nn.sigmoid(g[:, 33:36]) * 0.05
        rotations = g[:, 36:40]
        positions = jax.nn.sigmoid(g[:, 40:41])

        def to_points(t):
            return t.transpose(0, 2, 3, 1).reshape(b, h * w, t.shape[1])

        rotations = nn.l2_normalize(to_points(rotations))
        return {
            "colors": to_points(colors),
            "opacities": to_points(opacities),
            "scales": to_points(scales),
            "rotations": rotations,
            "positions": to_points(positions),
        }


def build_points_planes(plane_size: int, transform: np.ndarray) -> Dict[str, np.ndarray]:
    """Camera-ray plane through the scene (models.py:236-252).

    transform: (3, 4) or (4, 4) world->view matrix of the tracked source
    image. Returns plane_points (plane_size^2, 3) and plane_dirs (3,).
    """
    t = np.asarray(transform, np.float64)
    x, y = np.meshgrid(
        np.linspace(1, -1, plane_size), np.linspace(1, -1, plane_size), indexing="xy")
    r = t[:3, :3]
    tr = t[:3, 3:]
    cam_dir = (r @ np.array([0.0, 0.0, 1.0]))
    ray = np.stack([x / 12.0, y / 12.0, np.ones_like(x)], axis=-1).reshape(-1, 3)
    ray_dirs = ray @ r.T
    origin = -(r @ tr)[:, 0]
    distance = abs(np.dot(origin, cam_dir))
    plane_points = origin[None] + distance * ray_dirs
    return {
        "plane_points": plane_points.astype(np.float32),
        "plane_dirs": cam_dir.astype(np.float32),
    }


def transform_emoca_to_p3d(global_rotation: jnp.ndarray) -> jnp.ndarray:
    """EMOCA head rotation (axis-angle, (B, 3)) -> (B, 3, 4) camera matrix
    (models.py:255-264): the head rotation is folded into the camera so the
    gaussians never move for global rotation."""
    rot = global_rotation * jnp.asarray([-1.0, 1.0, -1.0])
    mat = batch_rodrigues(rot)
    flip = jnp.asarray([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    mat = mat @ flip
    inv = jnp.linalg.inv(mat)
    trans = jnp.asarray([0.0, 0.0, 5000.0 / 512])
    t = jnp.broadcast_to(trans[None, :, None], (rot.shape[0], 3, 1))
    return jnp.concatenate([inv, t], axis=-1)
