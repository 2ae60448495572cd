"""2-D bilinear resize parity vs torch F.interpolate (both align modes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from artalk_tpu.ops.resize2d import resize_bilinear


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("shape", [((4, 4), (8, 8)), ((8, 8), (4, 4)),
                                   ((19, 37), (74, 74)), ((16, 16), (33, 9))])
def test_matches_torch(align, shape, rng):
    (h, w), (oh, ow) = shape
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(oh, ow), mode="bilinear",
                        align_corners=align).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), oh, ow, align_corners=align))
    np.testing.assert_allclose(got, ref, atol=1e-5)
