"""FLAME 3DMM head model: blendshapes + linear blend skinning, batched XLA.

Functional JAX re-implementation of the FLAME forward pass used by the
reference (app/flame_model/FLAME.py:117-149, app/flame_model/lbs.py:142-232):
shape/expression blendshapes, axis-angle joint rotations (Rodrigues), pose
correctives, a 5-joint kinematic chain, and LBS skinning. Everything is
einsums/matmuls batched over *all frames at once* -- the reference renders
per-frame; here a 750-frame clip is one (T, 5023, 3) batch on the MXU.

Model data (template, bases, regressor, weights) comes from a converted
checkpoint pytree; see utils/assets.py for the .pt converter and the
synthetic-asset generator used in tests.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) (lbs.py:279-310)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    k = jnp.stack([
        zeros, -rz, ry,
        rz, zeros, -rx,
        -ry, rx, zeros,
    ], axis=-1).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * k + (1.0 - cos) * (k @ k)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) -> (B, V, 3) (lbs.py:255-276)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3) (lbs.py:235-252)."""
    return jnp.einsum("bik,ji->bjk", vertices, j_regressor)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kinematic-chain composition (lbs.py:326-383).

    rot_mats (B, J, 3, 3), joints (B, J, 3); the parent table is a static
    numpy array so the chain unrolls at trace time (J=5 for FLAME).
    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).
    """
    num_joints = joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    def make_transform(r, t):
        # (B, 3, 3), (B, 3) -> (B, 4, 4)
        top = jnp.concatenate([r, t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], r.dtype), top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    transforms_mat = make_transform(rot_mats, rel_joints)  # (B, J, 4, 4)
    chain = [transforms_mat[:, 0]]
    for i in range(1, num_joints):
        chain.append(chain[parents[i]] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)
    posed_joints = transforms[:, :, :3, 3]
    # subtract the rest-pose joint position rotated into the posed frame
    joints_homo = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    correction = jnp.einsum("bjmn,bjn->bjm", transforms, joints_homo)
    rel_transforms = transforms.at[:, :, :, 3].add(-correction)
    return posed_joints, rel_transforms


def lbs(betas: jnp.ndarray, pose: jnp.ndarray, v_template: jnp.ndarray,
        shapedirs: jnp.ndarray, posedirs: jnp.ndarray, j_regressor: jnp.ndarray,
        parents: np.ndarray, lbs_weights: jnp.ndarray
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning (lbs.py:142-232), fully batched.

    betas (B, n_betas), pose (B, J*3) axis-angle, v_template (V, 3).
    Returns (verts (B, V, 3), posed_joints (B, J, 3)).
    """
    batch = betas.shape[0]
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(j_regressor, v_shaped)
    rot_mats = batch_rodrigues(pose.reshape(batch, -1, 3))
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(batch, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(batch, -1, 3)
    v_posed = v_shaped + pose_offsets
    posed_joints, rel_transforms = batch_rigid_transform(rot_mats, joints, parents)
    # skinning: per-vertex blended transform
    t = jnp.einsum("vj,bjmn->bvmn", lbs_weights, rel_transforms)
    v_homo = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", t, v_homo)[..., :3]
    return verts, posed_joints


class FlameModel:
    """FLAME with n_shape shape + n_exp expression components.

    ``data`` is a dict of arrays: v_template (V,3), shapedirs (V,3,300+E),
    posedirs (P, V*3), J_regressor (J,V), parents (J,), lbs_weights (V,J),
    faces (F,3). Matches the reference constructor's slicing
    (FLAME.py:27-66).
    """

    NUM_SHAPE_TOTAL = 300

    def __init__(self, data: Dict[str, np.ndarray], n_shape: int = 300,
                 n_exp: int = 100, scale: float = 1.0):
        self.scale = scale
        self.n_shape, self.n_exp = n_shape, n_exp
        shapedirs = np.asarray(data["shapedirs"], np.float32)
        total = shapedirs.shape[-1]
        n_exp_avail = total - self.NUM_SHAPE_TOTAL
        assert n_shape <= self.NUM_SHAPE_TOTAL and n_exp <= n_exp_avail, (
            f"requested {n_shape}+{n_exp}, available {self.NUM_SHAPE_TOTAL}+{n_exp_avail}")
        self.shapedirs = jnp.asarray(np.concatenate([
            shapedirs[:, :, :n_shape],
            shapedirs[:, :, self.NUM_SHAPE_TOTAL : self.NUM_SHAPE_TOTAL + n_exp],
        ], axis=2))
        self.v_template = jnp.asarray(data["v_template"], dtype=jnp.float32)
        posedirs = np.asarray(data["posedirs"], np.float32)
        if posedirs.ndim == 3:  # (V, 3, P) raw layout -> (P, V*3)
            posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
        self.posedirs = jnp.asarray(posedirs)
        self.j_regressor = jnp.asarray(data["J_regressor"], dtype=jnp.float32)
        self.parents = np.asarray(data["parents"], np.int32).copy()
        self.parents[0] = 0  # root composes with itself; chain uses index 0 directly
        self.lbs_weights = jnp.asarray(data["lbs_weights"], dtype=jnp.float32)
        self.faces = np.asarray(data["faces"], np.int32)
        self.num_joints = int(self.j_regressor.shape[0])
        # optional landmark tables (converted from the FLAME checkpoint's
        # lmk_embeddings; FLAME.py:50-57)
        self.lmk_faces_idx = data.get("full_lmk_faces_idx")
        self.lmk_bary_coords = data.get("full_lmk_bary_coords")
        # optional dynamic contour tables: 79 yaw-indexed variants of the
        # 17-point jaw contour (FLAME.py:52-53)
        self.dynamic_lmk_faces_idx = data.get("dynamic_lmk_faces_idx")
        self.dynamic_lmk_bary_coords = data.get("dynamic_lmk_bary_coords")
        # neck->root joint chain for the relative yaw (FLAME.py:59-66)
        parents_orig = np.asarray(data["parents"], np.int64)
        chain, cur = [], 1  # NECK_IDX = 1
        while True:
            chain.append(cur)
            if cur == 0:
                break
            cur = int(parents_orig[cur])
        self.neck_kin_chain = np.asarray(chain, np.int64)

    def landmarks(self, vertices: jnp.ndarray, refine_eyes: bool = True) -> jnp.ndarray:
        """(B, V, 3) verts -> (B, 70, 3) landmarks (FLAME.py:150-156).
        Requires converted landmark tables in the asset."""
        assert self.lmk_faces_idx is not None, "asset has no landmark tables"
        lmks = vertices2landmarks(vertices, self.faces,
                                  self.lmk_faces_idx, self.lmk_bary_coords)
        if refine_eyes and vertices.shape[1] == 5023:
            lmks = reselect_eyes(vertices, lmks)
        return lmks

    def dynamic_landmarks(self, vertices: jnp.ndarray,
                          pose_params: jnp.ndarray) -> jnp.ndarray:
        """Pose-dependent 17-point face contour (FLAME.py:71-115): the
        relative y-rotation of the neck kinematic chain selects one of 79
        precomputed contour tables (yaw -39..+39 deg in 1-deg steps, extremes
        clamped), then barycentric interpolation on the selected faces.

        vertices (B, V, 3); pose_params (B, 6 | 3) in the reference layout
        [global(3), jaw(3)] (3-d means jaw-only, like ``__call__``).
        Returns (B, 17, 3) contour landmarks (unscaled, like ``landmarks``).
        """
        assert self.dynamic_lmk_faces_idx is not None, \
            "asset has no dynamic landmark tables"
        batch = vertices.shape[0]
        if pose_params.shape[-1] == 3:
            pose_params = jnp.concatenate(
                [jnp.zeros((batch, 3), pose_params.dtype), pose_params], axis=-1)
        neck = jnp.zeros((batch, 3), pose_params.dtype)
        eyes = jnp.zeros((batch, 6), pose_params.dtype)
        full_pose = jnp.concatenate(
            [pose_params[:, :3], neck, pose_params[:, 3:], eyes], axis=1)
        fidx, bary = find_dynamic_lmk_idx_and_bcoords(
            full_pose, self.dynamic_lmk_faces_idx,
            self.dynamic_lmk_bary_coords, self.neck_kin_chain)
        return vertices2landmarks_batched(vertices, self.faces, fidx, bary)

    def __call__(self, shape_params: jnp.ndarray,
                 expression_params: jnp.ndarray,
                 pose_params: Optional[jnp.ndarray] = None,
                 eye_pose_params: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, n_shape), (B, n_exp), (B, 6 | 3) -> verts (B, V, 3) * scale.

        pose = [global(3), jaw(3)]; neck and eyes are fixed at zero like the
        reference (FLAME.py:47-48, 134-141). A 3-d pose is treated as jaw-only.
        """
        batch = shape_params.shape[0]
        if pose_params is None:
            pose_params = jnp.zeros((batch, 6), shape_params.dtype)
        if pose_params.shape[-1] == 3:
            pose_params = jnp.concatenate(
                [jnp.zeros((batch, 3), pose_params.dtype), pose_params], axis=-1)
        if eye_pose_params is None:
            eye_pose_params = jnp.zeros((batch, 6), shape_params.dtype)
        betas = jnp.concatenate([shape_params, expression_params], axis=1)
        neck = jnp.zeros((batch, 3), pose_params.dtype)
        full_pose = jnp.concatenate(
            [pose_params[:, :3], neck, pose_params[:, 3:], eye_pose_params], axis=1)
        verts, _ = lbs(betas, full_pose, self.v_template, self.shapedirs,
                       self.posedirs, self.j_regressor, self.parents, self.lbs_weights)
        return verts * self.scale

    def motion_to_verts(self, shape_params: jnp.ndarray, motion: jnp.ndarray,
                        with_global: bool = True) -> jnp.ndarray:
        """106-d motion -> verts (reference: bitwise_vae.py:43-57):
        [0:100] expression, [100:103] global rotation, [103:106] jaw."""
        exp = motion[..., :100]
        pose = motion[..., 100:]
        if not with_global:
            pose = jnp.concatenate([jnp.zeros_like(pose[..., :3]), pose[..., 3:]], axis=-1)
        return self(shape_params, exp, pose)


def vertices2landmarks(vertices: jnp.ndarray, faces: np.ndarray,
                       lmk_faces_idx: np.ndarray,
                       lmk_bary_coords: jnp.ndarray) -> jnp.ndarray:
    """Barycentric landmark interpolation (lbs.py:103-139).

    vertices (B, V, 3); faces (F, 3); lmk_faces_idx (L,); bary (L, 3).
    """
    tri = faces[np.asarray(lmk_faces_idx, np.int64)]     # (L, 3) static gather
    lmk_verts = vertices[:, tri]                         # (B, L, 3, 3)
    return jnp.einsum("blfi,lf->bli", lmk_verts, jnp.asarray(lmk_bary_coords))


def vertices2landmarks_batched(vertices: jnp.ndarray, faces: np.ndarray,
                               lmk_faces_idx: jnp.ndarray,
                               lmk_bary_coords: jnp.ndarray) -> jnp.ndarray:
    """Barycentric landmark interpolation with per-batch face indices
    (lbs.py:103-139 as used by the dynamic contour path).

    vertices (B, V, 3); faces (F, 3); lmk_faces_idx (B, L); bary (B, L, 3).
    """
    tri = jnp.asarray(faces, jnp.int32)[lmk_faces_idx]   # (B, L, 3)

    def one(v, t, bc):
        return jnp.einsum("lfi,lf->li", v[t], bc)

    return jax.vmap(one)(vertices, tri, lmk_bary_coords)


def find_dynamic_lmk_idx_and_bcoords(full_pose: jnp.ndarray,
                                     dynamic_lmk_faces_idx,
                                     dynamic_lmk_bary_coords,
                                     neck_kin_chain: np.ndarray
                                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the yaw-dependent face contour table (FLAME.py:71-115).

    full_pose (B, J*3) axis-angle; the chain joints' rotations compose into a
    relative rotation whose y-euler angle (deg, clamped to max 39, negatives
    mapped to indices 40..78, below -39 to 78) indexes the 79-entry tables.
    Returns (faces_idx (B, L), bary (B, L, 3)).
    """
    b = full_pose.shape[0]
    aa = full_pose.reshape(b, -1, 3)[:, np.asarray(neck_kin_chain)]
    rots = batch_rodrigues(aa)                           # (B, C, 3, 3)
    rel = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype), (b, 3, 3))
    for i in range(len(neck_kin_chain)):
        rel = jnp.matmul(rots[:, i], rel)
    sy = jnp.sqrt(rel[:, 0, 0] ** 2 + rel[:, 1, 0] ** 2)
    deg = jnp.arctan2(-rel[:, 2, 0], sy) * (180.0 / np.pi)
    angle = jnp.round(jnp.minimum(deg, 39.0)).astype(jnp.int32)
    neg_vals = jnp.where(angle < -39, 78, 39 - angle)
    idx = jnp.where(angle < 0, neg_vals, angle)
    faces = jnp.asarray(dynamic_lmk_faces_idx, jnp.int32)[idx]
    bary = jnp.asarray(dynamic_lmk_bary_coords, jnp.float32)[idx]
    return faces, bary


# 70-landmark eye refinement (FLAME.py:194-204): specific eyeball vertices
# replace the coarse eye landmarks.
_EYE_IN_SHAPE = np.array([2422, 2422, 2452, 2454, 2471, 3638, 2276, 2360, 3835,
                          1292, 1217, 1146, 1146, 999, 827], np.int64)
_EYE_REDUCE = np.array([0, 2, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14], np.int64)
_EYE_TARGET = np.array([37, 38, 40, 41, 43, 44, 46, 47], np.int64)
_EYE_SOURCE = np.array([1, 2, 4, 5, 7, 8, 10, 11], np.int64)


def reselect_eyes(vertices: jnp.ndarray, lmks70: jnp.ndarray) -> jnp.ndarray:
    """Replace eye landmarks with eyeball-vertex positions (FLAME.py:194-204).
    Requires the full 5023-vertex FLAME topology."""
    eye = vertices[:, _EYE_IN_SHAPE]
    eye = eye.at[:, 0].set((eye[:, 0] + eye[:, 1]) * 0.5)
    eye = eye.at[:, 2].set((eye[:, 2] + eye[:, 3]) * 0.5)
    eye = eye.at[:, 11].set((eye[:, 11] + eye[:, 12]) * 0.5)
    eye = eye[:, _EYE_REDUCE]
    return lmks70.at[:, _EYE_TARGET].set(eye[:, _EYE_SOURCE])
