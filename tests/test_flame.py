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


def test_dynamic_landmarks_match_numpy_oracle(flame, rng):
    """Dynamic contour selection (FLAME.py:71-115): yaw-indexed table lookup
    + barycentric interpolation, vs an independent scipy/NumPy oracle."""
    from scipy.spatial.transform import Rotation

    model, data = flame
    b = 9
    # pose layout [global(3), jaw(3)]; include pure-yaw extremes that hit the
    # clamp (+39), the negative remap (40..78) and the below--39 bucket (78)
    yaw_deg = np.array([-60.0, -39.4, -12.2, -0.4, 0.0, 0.4, 12.7, 39.4, 60.0])
    pose = rng.standard_normal((b, 6)).astype(np.float32) * 0.05
    pose[:, 1] = np.deg2rad(yaw_deg)  # axis-angle y component ~ yaw
    verts = model(jnp.zeros((b, 300)), jnp.zeros((b, 100)),
                  jnp.asarray(pose)) / model.scale

    got = np.asarray(model.dynamic_landmarks(verts, jnp.asarray(pose)))

    # oracle: relative rotation over chain [neck, global] with neck = 0
    v = np.asarray(verts)
    rel = Rotation.from_rotvec(pose[:, :3]).as_matrix()  # global @ I(neck)
    sy = np.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
    deg = np.degrees(np.arctan2(-rel[:, 2, 0], sy))
    angle = np.round(np.minimum(deg, 39.0)).astype(np.int64)
    idx = np.where(angle < 0,
                   np.where(angle < -39, 78, 39 - angle), angle)
    exp_lmks = np.zeros((b, 17, 3), np.float32)
    for i in range(b):
        fidx = data["dynamic_lmk_faces_idx"][idx[i]]
        bary = data["dynamic_lmk_bary_coords"][idx[i]]
        tri = data["faces"][fidx]                       # (17, 3)
        exp_lmks[i] = np.einsum("lfi,lf->li", v[i][tri], bary)
    np.testing.assert_allclose(got, exp_lmks, atol=1e-5)

    # index-level checks of the remap
    from artalk_tpu.models.flame import find_dynamic_lmk_idx_and_bcoords

    full_pose = np.zeros((b, 15), np.float32)
    full_pose[:, :3] = pose[:, :3]
    fidx_got, _ = find_dynamic_lmk_idx_and_bcoords(
        jnp.asarray(full_pose), data["dynamic_lmk_faces_idx"],
        data["dynamic_lmk_bary_coords"], model.neck_kin_chain)
    np.testing.assert_array_equal(
        np.asarray(fidx_got), data["dynamic_lmk_faces_idx"][idx])


def test_dynamic_landmarks_neck_composes(flame, rng):
    """The chain composes global @ neck: a yaw split across both joints must
    select the same table as the summed yaw on one joint."""
    import jax.numpy as jnp2

    from artalk_tpu.models.flame import find_dynamic_lmk_idx_and_bcoords

    model, data = flame
    full_a = np.zeros((1, 15), np.float32)
    full_a[0, 1] = np.deg2rad(20.0)   # global yaw 20
    full_a[0, 4] = np.deg2rad(10.0)   # neck yaw 10
    full_b = np.zeros((1, 15), np.float32)
    full_b[0, 1] = np.deg2rad(30.0)   # all on global
    fa, _ = find_dynamic_lmk_idx_and_bcoords(
        jnp2.asarray(full_a), data["dynamic_lmk_faces_idx"],
        data["dynamic_lmk_bary_coords"], model.neck_kin_chain)
    fb, _ = find_dynamic_lmk_idx_and_bcoords(
        jnp2.asarray(full_b), data["dynamic_lmk_faces_idx"],
        data["dynamic_lmk_bary_coords"], model.neck_kin_chain)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
