"""Parity of the constant-matrix resizes vs torch F.interpolate semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from artalk_tpu.ops.resample1d import (
    area_resize_matrix,
    linear_resize_matrix,
    resize_area,
    resize_linear,
)

# (in_size, out_size) pairs that actually occur in the pipeline:
# audio features (199 or 200 frames per 4s window) -> scales; pyramid scales <-> 100.
PAIRS_DOWN = [(100, 1), (100, 5), (100, 25), (100, 50), (199, 1), (199, 5),
              (199, 25), (199, 50), (199, 100), (200, 100), (7, 3),
              (50, 100)]  # area 'upsampling': the mimi 12.5 Hz -> 100-slot path
PAIRS_UP = [(1, 100), (5, 100), (25, 100), (50, 100), (3, 7)]


@pytest.mark.parametrize("in_size,out_size", PAIRS_DOWN)
def test_area_matches_torch(in_size, out_size, rng):
    x = rng.standard_normal((2, 16, in_size)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="area").numpy()
    m = area_resize_matrix(in_size, out_size)
    got = np.einsum("oi,bci->bco", m, x)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("in_size,out_size", PAIRS_UP)
def test_linear_matches_torch(in_size, out_size, rng):
    x = rng.standard_normal((2, 16, in_size)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="linear").numpy()
    m = linear_resize_matrix(in_size, out_size)
    got = np.einsum("oi,bci->bco", m, x)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_jax_wrappers_roundtrip(rng):
    x = rng.standard_normal((2, 100, 32)).astype(np.float32)
    down = resize_area(jnp.asarray(x), 25)
    up = resize_linear(down, 100)
    assert down.shape == (2, 25, 32)
    assert up.shape == (2, 100, 32)
    # identity when sizes match
    same = resize_area(jnp.asarray(x), 100)
    np.testing.assert_array_equal(np.asarray(same), x)


def test_area_rows_sum_to_one():
    for i, o in PAIRS_DOWN + PAIRS_UP:
        m = area_resize_matrix(i, o)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
        m = linear_resize_matrix(i, o)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
