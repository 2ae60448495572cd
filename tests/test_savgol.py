"""Parity of on-device Savitzky-Golay smoothing vs scipy (mode='interp')."""

import numpy as np
import pytest
from scipy.signal import savgol_filter

import jax.numpy as jnp

from artalk_tpu.ops.savgol import savgol_smooth, smooth_motion_savgol


@pytest.mark.parametrize("window,poly", [(5, 2), (9, 3), (7, 4)])
@pytest.mark.parametrize("n", [20, 101, 750])
def test_matches_scipy(window, poly, n, rng):
    x = rng.standard_normal((n, 6)).astype(np.float32)
    ref = savgol_filter(x, window_length=window, polyorder=poly, axis=0)
    got = np.asarray(savgol_smooth(jnp.asarray(x), window, poly))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_motion_smoothing_matches_reference_recipe(rng):
    """Reference recipe (inference.py:89-95): w5/p2 everywhere, w9/p3 on dims
    100:103 computed from the raw (not pre-smoothed) motion."""
    motion = rng.standard_normal((120, 106)).astype(np.float32)
    ref = savgol_filter(motion, window_length=5, polyorder=2, axis=0)
    ref[..., 100:103] = savgol_filter(motion[..., 100:103], window_length=9, polyorder=3, axis=0)
    got = np.asarray(smooth_motion_savgol(jnp.asarray(motion)))
    np.testing.assert_allclose(got, ref, atol=1e-4)
