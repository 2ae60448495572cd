"""Gaussian splatting: Pallas kernel (interpret) vs exact compositing oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.ops.gsplat import (
    build_cov3d, project_gaussians, quat_to_rotmat, rasterize_gaussians,
    rasterize_gaussians_reference)

CAM = np.array([[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 5000.0 / 512]], np.float32)


def _scene(rng, n=400, spread=0.08):
    xyz = rng.normal(0, spread, (n, 3)).astype(np.float32)
    colors = rng.random((n, 32)).astype(np.float32)
    opac = rng.random((n, 1)).astype(np.float32)
    scales = (rng.random((n, 3)) * 0.03 + 0.005).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return [jnp.asarray(a) for a in (xyz, colors, opac, scales, q, CAM)]


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
    # identity quaternion (w=1) -> identity matrix
    ident = np.asarray(quat_to_rotmat(jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))))
    np.testing.assert_allclose(ident[0], np.eye(3), atol=1e-6)


def test_cov3d_isotropic_for_uniform_scale(rng):
    q = rng.normal(size=(4, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s = np.full((4, 3), 0.02, np.float32)
    cov = np.asarray(build_cov3d(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(
        cov, np.broadcast_to(np.eye(3) * 4e-4, cov.shape), atol=1e-7)


def test_projection_depth_and_center():
    # a gaussian at the world origin projects to the image center
    xyz = jnp.asarray(np.zeros((1, 3), np.float32))
    scales = jnp.asarray(np.full((1, 3), 0.01, np.float32))
    q = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
    mean2d, depth, conic, radius, in_front = project_gaussians(
        xyz, scales, q, jnp.asarray(CAM), 12.0, 512)
    np.testing.assert_allclose(np.asarray(mean2d)[0], [256.0, 256.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth)[0], 5000.0 / 512, atol=1e-5)
    assert bool(np.asarray(in_front)[0])
    assert float(np.asarray(radius)[0]) >= 2.0  # low-pass floor


def test_kernel_matches_oracle(rng):
    args = _scene(rng)
    ref = np.asarray(rasterize_gaussians_reference(*args, focal=12.0, size=128))
    got = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128, interpret=True))
    assert (ref[0] > 0.01).mean() > 0.02  # scene hits pixels
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_kernel_empty_scene():
    xyz = jnp.asarray(np.array([[0.0, 0.0, 100.0]], np.float32))  # behind camera
    colors = jnp.asarray(np.ones((1, 32), np.float32))
    opac = jnp.asarray(np.ones((1, 1), np.float32))
    scales = jnp.asarray(np.full((1, 3), 0.01, np.float32))
    q = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
    out = np.asarray(rasterize_gaussians(xyz, colors, opac, scales, q,
                                         jnp.asarray(CAM), focal=12.0, size=128,
                                         interpret=True))
    np.testing.assert_array_equal(out, 0.0)


def test_front_to_back_order(rng):
    """An opaque near gaussian must fully hide a far one at the same spot."""
    xyz = jnp.asarray(np.array([[0, 0, 0.5], [0, 0, -0.5]], np.float32))
    colors = jnp.asarray(np.stack([np.ones(32), np.zeros(32)]).astype(np.float32))
    opac = jnp.asarray(np.array([[0.999], [0.999]], np.float32))
    scales = jnp.asarray(np.full((2, 3), 0.02, np.float32))
    q = jnp.asarray(np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (2, 1)))
    out = np.asarray(rasterize_gaussians(xyz, colors, opac, scales, q,
                                         jnp.asarray(CAM), focal=12.0, size=128,
                                         interpret=True))
    # camera looks along -z from z=+9.77: z=+0.5 is nearer; its color is 1
    center = out[:, 64, 64]
    assert center.min() > 0.9, center[:4]


def test_oversized_splat_renders_centered_crop():
    """A splat wider than the 2x4 duplication budget must degrade as a
    centered crop around its mean (emission radius clamped to MAX_RX/MAX_RY),
    not vanish or lose whole sides to bbox-anchor underflow."""
    from artalk_tpu.ops.gsplat import MAX_RY

    xyz = jnp.asarray(np.zeros((1, 3), np.float32))
    colors = jnp.asarray(np.ones((1, 32), np.float32))
    opac = jnp.asarray(np.array([[0.9]], np.float32))
    scales = jnp.asarray(np.full((1, 3), 0.7, np.float32))  # ~165 px radius
    q = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
    args = (xyz, colors, opac, scales, q, jnp.asarray(CAM))

    _, _, _, radius, _ = project_gaussians(xyz, scales, q, jnp.asarray(CAM),
                                           12.0, 128)
    assert float(np.asarray(radius)[0]) > 2 * MAX_RY  # genuinely oversized

    ref = np.asarray(rasterize_gaussians_reference(*args, focal=12.0, size=128))
    got = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                         interpret=True))
    # center pixel composites exactly like the untruncated oracle
    np.testing.assert_allclose(got[:, 64, 64], ref[:, 64, 64], atol=1e-4)
    # rows within +/-MAX_RY of the mean are fully covered
    np.testing.assert_allclose(got[:, 64 - MAX_RY + 1, 64],
                               ref[:, 64 - MAX_RY + 1, 64], atol=1e-4)
    # far rows are the documented centered truncation: oracle sees the tail,
    # the tiled kernel does not
    assert ref[0, 0, 64] > 0.01
    np.testing.assert_array_equal(got[:, 0, 64], 0.0)


def test_budgeted_instances_exact_when_sufficient(rng):
    """max_instances >= the scene's valid count -> bit-identical output."""
    from artalk_tpu.ops.gsplat import count_valid_instances

    args = _scene(rng)
    valid = int(count_valid_instances(args[0], args[2], args[3], args[4],
                                      args[5], focal=12.0, size=128))
    assert valid > 0
    exact = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                           interpret=True))
    budgeted = np.asarray(rasterize_gaussians(
        *args, focal=12.0, size=128, interpret=True, max_instances=valid))
    np.testing.assert_array_equal(budgeted, exact)


def test_budgeted_instances_truncates_gracefully(rng):
    """An insufficient budget drops instances but still renders (no crash,
    output bounded, retained tiles unaffected)."""
    args = _scene(rng)
    out = np.asarray(rasterize_gaussians(
        *args, focal=12.0, size=128, interpret=True, max_instances=1))
    assert np.isfinite(out).all()
    exact = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                           interpret=True))
    # the first chunk's worth of instances is still composited exactly where
    # segments survived; everything else is zero (dropped tiles render black)
    assert (out != 0).sum() <= (exact != 0).sum()


def test_slot_cap_exact_at_measured_max(rng):
    """slots_per_gaussian >= the scene's per-gaussian max -> bit-identical
    output, and the bound helper really bounds the per-gaussian valid count."""
    from artalk_tpu.ops.gsplat import (
        _project_components, _slot_validity, max_valid_slots_per_gaussian)

    args = _scene(rng)
    cap = int(max_valid_slots_per_gaussian(args[0], args[2], args[3], args[4],
                                           args[5], focal=12.0, size=128))
    # the helper's alignment-independent bound dominates the actual counts
    comp = _project_components(args[0], args[3], args[4], args[5], 12.0, 128)
    opac = jnp.where(comp["in_front"], args[2][..., 0], 0.0)
    _, _, valid = _slot_validity(comp["mx"], comp["my"], comp["radius"],
                                 opac, 128)
    actual_max = int(np.asarray(valid.astype(np.int32).sum(0)).max())
    assert 1 <= actual_max <= cap <= 8

    exact = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                           interpret=True))
    capped = np.asarray(rasterize_gaussians(
        *args, focal=12.0, size=128, interpret=True, slots_per_gaussian=cap))
    np.testing.assert_array_equal(capped, exact)


def test_slot_cap_truncates_centered():
    """A splat forced below its slot need keeps its most-central tiles: the
    pixel at the mean still composites exactly; far rows go black."""
    xyz = jnp.asarray(np.zeros((1, 3), np.float32))
    colors = jnp.asarray(np.ones((1, 32), np.float32))
    opac = jnp.asarray(np.array([[0.9]], np.float32))
    scales = jnp.asarray(np.full((1, 3), 0.08, np.float32))  # ~20 px radius
    q = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
    args = (xyz, colors, opac, scales, q, jnp.asarray(CAM))

    exact = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                           interpret=True))
    capped = np.asarray(rasterize_gaussians(
        *args, focal=12.0, size=128, interpret=True, slots_per_gaussian=2))
    assert exact[0, 64, 64] > 0.1
    np.testing.assert_allclose(capped[:, 64, 64], exact[:, 64, 64], atol=1e-6)
    # strictly a subset of the exact coverage, and something was dropped
    assert ((capped != 0) <= (exact != 0)).all()
    assert (capped != 0).sum() < (exact != 0).sum()


def test_bf16_colors_close_to_f32(rng):
    """bf16 color storage changes only color quantization (~3e-3 relative);
    geometry/alpha stay f32, so structure is identical."""
    args = _scene(rng)
    f32 = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                         interpret=True))
    bf16 = np.asarray(rasterize_gaussians(*args, focal=12.0, size=128,
                                          interpret=True, bf16_colors=True))
    assert bf16.dtype == np.float32
    # pixels hit are the same set (alpha path untouched)
    np.testing.assert_array_equal(f32 == 0.0, bf16 == 0.0)
    np.testing.assert_allclose(bf16, f32, atol=2e-2, rtol=2e-2)
    assert np.abs(bf16 - f32).mean() < 2e-3
