"""FLAME LBS parity vs an independent NumPy oracle + geometric invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from artalk_tpu.models.flame import FlameModel, batch_rodrigues
from artalk_tpu.utils.assets import synthetic_flame


@pytest.fixture(scope="module")
def flame():
    data = synthetic_flame(num_verts=500, num_faces=600, seed=1)
    return FlameModel(data, n_shape=300, n_exp=100), data


def numpy_rodrigues(r):
    angle = np.linalg.norm(r + 1e-8, axis=-1, keepdims=True)
    axis = r / angle
    c, s = np.cos(angle)[..., None], np.sin(angle)[..., None]
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = np.zeros_like(kx)
    k = np.stack([zeros, -kz, ky, kz, zeros, -kx, -ky, kx, zeros], -1)
    k = k.reshape(r.shape[:-1] + (3, 3))
    eye = np.eye(3)
    return eye + s * k + (1 - c) * (k @ k)


def numpy_lbs_oracle(data, betas, full_pose):
    """Straight NumPy implementation of SMPL-style LBS."""
    v = data["v_template"] + np.einsum("bl,mkl->bmk", betas,
                                       np.concatenate([
                                           data["shapedirs"][:, :, :300],
                                           data["shapedirs"][:, :, 300:400]], axis=2))
    joints = np.einsum("jv,bvk->bjk", data["J_regressor"], v)
    rots = numpy_rodrigues(full_pose.reshape(len(betas), -1, 3))
    pose_feat = (rots[:, 1:] - np.eye(3)).reshape(len(betas), -1)
    v_posed = v + (pose_feat @ data["posedirs"]).reshape(len(betas), -1, 3)

    parents = data["parents"]
    num_j = joints.shape[1]
    rel = joints.copy()
    rel[:, 1:] -= joints[:, parents[1:]]
    mats = np.zeros((len(betas), num_j, 4, 4))
    mats[:, :, :3, :3] = rots
    mats[:, :, :3, 3] = rel
    mats[:, :, 3, 3] = 1.0
    chain = [mats[:, 0]]
    for i in range(1, num_j):
        chain.append(chain[parents[i]] @ mats[:, i])
    transforms = np.stack(chain, axis=1)
    jh = np.concatenate([joints, np.zeros_like(joints[..., :1])], -1)
    corr = np.einsum("bjmn,bjn->bjm", transforms, jh)
    rel_t = transforms.copy()
    rel_t[:, :, :, 3] -= corr
    t = np.einsum("vj,bjmn->bvmn", data["lbs_weights"], rel_t)
    vh = np.concatenate([v_posed, np.ones_like(v_posed[..., :1])], -1)
    return np.einsum("bvmn,bvn->bvm", t, vh)[..., :3]


def test_rodrigues_matches_numpy(rng):
    r = rng.standard_normal((10, 3)).astype(np.float32) * 0.5
    got = np.asarray(batch_rodrigues(jnp.asarray(r)))
    ref = numpy_rodrigues(r)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # orthonormality
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)


def test_lbs_matches_numpy_oracle(flame, rng):
    model, data = flame
    b = 4
    shape = rng.standard_normal((b, 300)).astype(np.float32) * 0.5
    expr = rng.standard_normal((b, 100)).astype(np.float32) * 0.5
    pose6 = rng.standard_normal((b, 6)).astype(np.float32) * 0.3
    got = np.asarray(model(jnp.asarray(shape), jnp.asarray(expr), jnp.asarray(pose6)))

    betas = np.concatenate([shape, expr], axis=1)
    full_pose = np.concatenate([
        pose6[:, :3], np.zeros((b, 3), np.float32), pose6[:, 3:],
        np.zeros((b, 6), np.float32)], axis=1)
    ref = numpy_lbs_oracle(data, betas, full_pose)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_zero_pose_is_blendshaped_template(flame, rng):
    model, data = flame
    shape = rng.standard_normal((1, 300)).astype(np.float32) * 0.5
    expr = np.zeros((1, 100), np.float32)
    verts = np.asarray(model(jnp.asarray(shape), jnp.asarray(expr)))
    expected = data["v_template"][None] + np.einsum(
        "bl,mkl->bmk", shape, data["shapedirs"][:, :, :300])
    # zero rotations -> identity transforms; vertices stay at shaped positions
    np.testing.assert_allclose(verts, expected, atol=1e-5)


def test_scale_applied(flame, rng):
    model, data = flame
    scaled = FlameModel(data, scale=5.0)
    shape = rng.standard_normal((1, 300)).astype(np.float32) * 0.1
    expr = rng.standard_normal((1, 100)).astype(np.float32) * 0.1
    v1 = np.asarray(model(jnp.asarray(shape), jnp.asarray(expr)))
    v5 = np.asarray(scaled(jnp.asarray(shape), jnp.asarray(expr)))
    np.testing.assert_allclose(v5, 5.0 * v1, atol=1e-5)


def test_motion_to_verts_layout(flame, rng):
    """106-d motion: [0:100] expression, [100:103] global rot, [103:106] jaw
    (SURVEY 2.2); with_global=False must zero the global rotation only."""
    model, _ = flame
    motion = rng.standard_normal((3, 106)).astype(np.float32) * 0.3
    shape = np.zeros((3, 300), np.float32)
    v_global = np.asarray(model.motion_to_verts(jnp.asarray(shape), jnp.asarray(motion), True))
    motion_fixed = motion.copy()
    motion_fixed[:, 100:103] = 0.0
    v_fixed_ref = np.asarray(
        model.motion_to_verts(jnp.asarray(shape), jnp.asarray(motion_fixed), True))
    v_fixed = np.asarray(model.motion_to_verts(jnp.asarray(shape), jnp.asarray(motion), False))
    np.testing.assert_allclose(v_fixed, v_fixed_ref, atol=1e-6)
    assert not np.allclose(v_global, v_fixed)
