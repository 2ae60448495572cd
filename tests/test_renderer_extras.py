"""PointRenderer / TextureRenderer (debug renderers, renderer_utils.py:88-238)."""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.models.renderer_extras import (
    PointRenderer, TextureRenderer, _bilinear_sample, add_sh_light,
    look_at_camera)

# camera in pytorch3d row-vector convention: pv = X @ R + T
CAM = np.concatenate([np.diag([-1.0, 1.0, -1.0]),
                      np.array([[0.0], [0.0], [2.0]])], axis=1).astype(np.float32)


def test_look_at_camera_center_projection():
    """The origin lands at the image center at depth == dist, any angles."""
    for d, e, a in ((3.0, 15.0, 30.0), (8.0, 30.0, 30.0), (4.0, -20.0, 135.0)):
        cam = look_at_camera(d, e, a)
        p = np.zeros(3)
        pv = (p @ cam[:, :3] + cam[:, 3]) * np.array([-1.0, -1.0, 1.0])
        np.testing.assert_allclose(pv[:2], 0.0, atol=1e-6)
        np.testing.assert_allclose(pv[2], d, atol=1e-6)


def test_point_renderer_shapes_and_coverage(rng):
    pts = rng.normal(0, 0.2, (2, 500, 3)).astype(np.float32)
    pr = PointRenderer(image_size=128, interpret=True)
    img = np.asarray(pr(jnp.asarray(pts), coords=True))
    assert img.shape == (2, 3, 128, 128)
    assert np.isfinite(img).all() and img.max() <= 255.0 + 1e-3
    assert (img.max(axis=1) > 1.0).mean() > 0.005  # points hit pixels

    img2 = np.asarray(pr(jnp.asarray(pts[:1]), coords=False,
                         ex_points=jnp.asarray(pts[0, :10])))
    assert img2.shape == (1, 3, 128, 128)


def test_add_sh_light_matches_numpy_oracle(rng):
    images = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    sh = rng.standard_normal((2, 9, 3)).astype(np.float32)

    pi = np.pi
    const = np.array([
        1 / np.sqrt(4 * pi),
        ((2 * pi) / 3) * np.sqrt(3 / (4 * pi)),
        ((2 * pi) / 3) * np.sqrt(3 / (4 * pi)),
        ((2 * pi) / 3) * np.sqrt(3 / (4 * pi)),
        (pi / 4) * 3 * np.sqrt(5 / (12 * pi)),
        (pi / 4) * 3 * np.sqrt(5 / (12 * pi)),
        (pi / 4) * 3 * np.sqrt(5 / (12 * pi)),
        (pi / 4) * (3 / 2) * np.sqrt(5 / (12 * pi)),
        (pi / 4) * (1 / 2) * np.sqrt(5 / (4 * pi)),
    ], dtype=np.float32)
    n = images
    basis = np.stack([
        n[:, 0] * 0 + 1, n[:, 0], n[:, 1], n[:, 2], n[:, 0] * n[:, 1],
        n[:, 0] * n[:, 2], n[:, 1] * n[:, 2], n[:, 0] ** 2 - n[:, 1] ** 2,
        3 * (n[:, 2] ** 2) - 1,
    ], axis=1) * const[None, :, None, None]
    want = (sh[:, :, :, None, None] * basis[:, :, None]).sum(axis=1)

    got = np.asarray(add_sh_light(jnp.asarray(images), jnp.asarray(sh)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_sample_corners_and_flat(rng):
    tex = rng.random((7, 9, 3)).astype(np.float32)
    t = jnp.asarray(tex)
    # (0,0) = bottom-left, (1,1) = top-right (pytorch3d TexturesUV convention)
    got = np.asarray(_bilinear_sample(t, jnp.asarray([[0.0, 0.0], [1.0, 1.0],
                                                      [0.0, 1.0], [1.0, 0.0]])))
    np.testing.assert_allclose(got[0], tex[-1, 0], atol=1e-6)
    np.testing.assert_allclose(got[1], tex[0, -1], atol=1e-6)
    np.testing.assert_allclose(got[2], tex[0, 0], atol=1e-6)
    np.testing.assert_allclose(got[3], tex[-1, -1], atol=1e-6)
    flat = jnp.asarray(np.full((4, 4, 3), 0.6, np.float32))
    uv = jnp.asarray(rng.random((10, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_bilinear_sample(flat, uv)), 0.6,
                               atol=1e-6)


@pytest.fixture
def quad():
    """Two triangles covering [-0.4, 0.4]^2 at z=0, full UV range."""
    verts = np.array([[-0.4, -0.4, 0.0], [0.4, -0.4, 0.0],
                      [0.4, 0.4, 0.0], [-0.4, 0.4, 0.0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32)
    tuv = {"verts_uvs": uvs, "textures_idx": faces, "verts_idx": faces}
    return verts, faces, tuv


def test_texture_renderer_flat_texture(quad):
    verts, faces, tuv = quad
    tr = TextureRenderer(tuv, interpret=True)
    tex = jnp.asarray(np.full((3, 8, 8), 0.7, np.float32))
    images, masks_all, masks_face = tr(
        jnp.asarray(verts[None]), tex, image_size=128,
        transform_matrix=jnp.asarray(CAM), focal_length=2.0)
    images, masks_all = np.asarray(images), np.asarray(masks_all)
    assert masks_face is None
    assert images.shape == (1, 3, 128, 128) and masks_all.shape == (1, 1, 128, 128)
    assert masks_all[0, 0, 64, 64]          # quad covers the center
    assert masks_all.mean() > 0.1
    # covered pixels show the flat texture color; background is 0
    np.testing.assert_allclose(images[0, :, masks_all[0, 0]], 0.7, atol=1e-4)
    assert np.all(images[0, :, ~masks_all[0, 0]] == 0.0)


def test_texture_renderer_face_mask_and_lights(quad):
    verts, faces, tuv = quad
    # only the first triangle's vertices {0, 1, 2} are in the mask
    tr = TextureRenderer(tuv, flame_mask=[0, 1, 2], interpret=True)
    tex = jnp.asarray(np.full((3, 8, 8), 1.0, np.float32))
    # SH coeff with only the constant band: shading = c * 1/sqrt(4 pi)
    sh = np.zeros((1, 9, 3), np.float32)
    sh[:, 0] = 2.0
    images, masks_all, masks_face = tr(
        jnp.asarray(verts[None]), tex, lights=jnp.asarray(sh), image_size=128,
        transform_matrix=jnp.asarray(CAM), focal_length=2.0)
    images = np.asarray(images)
    masks_all, masks_face = np.asarray(masks_all), np.asarray(masks_face)
    # face mask is a strict subset of the full mask (one of two triangles)
    assert masks_face.sum() < masks_all.sum()
    assert 0.3 < masks_face.sum() / masks_all.sum() < 0.7
    expected = 2.0 * float(1 / np.sqrt(4 * np.pi))
    np.testing.assert_allclose(images[0, :, masks_all[0, 0]], expected, atol=1e-4)
    assert np.all(images[0, :, ~masks_all[0, 0]] == 0.0)


def test_texture_renderer_default_camera(quad):
    """No transform_matrix -> the reference's fixed default camera
    (renderer_utils.py:59-64) instead of a crash."""
    verts, faces, tuv = quad
    tr = TextureRenderer(tuv, interpret=True)
    tex = jnp.asarray(np.full((3, 4, 4), 0.5, np.float32))
    images, masks_all, _ = tr(jnp.asarray(verts[None]), tex, image_size=128,
                              focal_length=2.0)
    assert np.asarray(masks_all).any()
    np.testing.assert_allclose(
        np.asarray(images)[0, :, np.asarray(masks_all)[0, 0]], 0.5, atol=1e-4)
