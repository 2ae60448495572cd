"""Pallas rasterizer (interpret mode) vs the brute-force XLA oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.ops.rasterizer import BIG, rasterize, rasterize_reference


def _random_scene(rng, num_verts=300, num_faces=512, h=64, w=256):
    verts = np.zeros((num_verts, 3), np.float32)
    verts[:, 0] = rng.uniform(-10, w + 10, num_verts)
    verts[:, 1] = rng.uniform(-10, h + 10, num_verts)
    verts[:, 2] = rng.uniform(0.5, 5.0, num_verts)
    faces = rng.integers(0, num_verts, (num_faces, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_matches_oracle(rng):
    verts, faces = _random_scene(rng)
    zb1, f1 = rasterize(verts, faces, height=64, width=256, interpret=True)
    zb2, f2 = rasterize_reference(verts, faces, height=64, width=256)
    zb1, f1, zb2, f2 = map(np.asarray, (zb1, f1, zb2, f2))
    covered = f2 >= 0
    assert covered.mean() > 0.3  # scene actually covers pixels
    # face ids: identical except where truncated-z keys tie (< 0.1%)
    assert (f1 != f2).mean() < 1e-3
    # depths: equal up to the 8 truncated mantissa bits
    np.testing.assert_allclose(zb1[covered], zb2[covered], rtol=1e-4)
    # background agrees exactly
    np.testing.assert_array_equal(f1 == -1, f2 == -1)


def test_face_padding(rng):
    """Non-multiple-of-chunk face counts are padded with degenerate faces."""
    verts, faces = _random_scene(rng, num_faces=200)
    zb, fid = rasterize(verts, faces, height=64, width=128, interpret=True)
    assert np.asarray(fid).max() < 200


def test_empty_scene():
    verts = jnp.asarray(np.zeros((3, 3), np.float32))  # degenerate triangle
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    zb, fid = rasterize(verts, faces, height=32, width=128, interpret=True)
    assert (np.asarray(fid) == -1).all()
    assert (np.asarray(zb) >= BIG / 2).all()


def test_z_order(rng):
    """Nearer of two overlapping triangles wins."""
    verts = np.array([
        [10, 10, 2.0], [100, 10, 2.0], [10, 100, 2.0],   # near
        [10, 10, 3.0], [100, 10, 3.0], [10, 100, 3.0],   # far
    ], np.float32)
    faces = np.array([[3, 4, 5], [0, 1, 2]], np.int32)  # far listed first
    zb, fid = rasterize(jnp.asarray(verts), jnp.asarray(faces),
                        height=64, width=128, interpret=True)
    fid = np.asarray(fid)
    assert (fid[fid >= 0] == 1).all()  # near triangle (index 1) wins everywhere
