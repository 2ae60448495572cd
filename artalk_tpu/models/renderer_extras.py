"""Auxiliary debug renderers: point clouds and UV-textured meshes.

TPU-native equivalents of the reference's PointRenderer and TextureRenderer
(app/flame_model/renderer_utils.py:88-238). Neither is used by the reference
inference pipeline (SURVEY §2.1 "unused"); they are debug/visualization tools
and are reproduced here for full component coverage:

- ``PointRenderer`` (renderer_utils.py:88-119): orbiting look-at camera
  (dist/elev/azim), 10k-point subsample, optional coordinate-axes points,
  random colors, alpha-composited point splats. Rendered through the Pallas
  gaussian-splat kernel (ops/gsplat.py) with small isotropic footprints
  instead of PyTorch3D's hard discs -- same visual purpose.
- ``TextureRenderer`` (renderer_utils.py:122-238): UV-textured mesh under a
  PerspectiveCameras-style (R | T, focal, principal point) camera, optional
  spherical-harmonics relighting (the reference applies the DECA SH formula
  to the rendered images; reproduced verbatim), full-mesh and face-region
  silhouette masks. Rasterized by the Pallas z-buffer kernel
  (ops/rasterizer.py) with barycentric UV interpolation and bilinear texture
  sampling.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gsplat import rasterize_gaussians
from ..ops.rasterizer import face_planes, rasterize

# -----------------------------------------------------------------------------
# PointRenderer
# -----------------------------------------------------------------------------


def look_at_camera(dist: float, elev_deg: float, azim_deg: float) -> np.ndarray:
    """(dist, elev, azim) orbit camera looking at the origin (+Y up) -> (3, 4)
    matrix in the gsplat kernel's convention (utils_renderer.py:61-69 layout:
    p_view = (p @ R + t) with the kernel's internal (-1, -1, 1) flip folded
    in). Angle semantics follow pytorch3d.look_at_view_transform."""
    elev = math.radians(elev_deg)
    azim = math.radians(azim_deg)
    eye = np.array([
        dist * math.cos(elev) * math.sin(azim),
        dist * math.sin(elev),
        dist * math.cos(elev) * math.cos(azim),
    ])
    z = -eye / np.linalg.norm(eye)                       # toward the origin
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / max(np.linalg.norm(x), 1e-9)
    y = np.cross(z, x)
    r_cols = np.stack([x, y, z], axis=1)                 # world->view columns
    # fold the kernel's (-1, -1, 1) view flip into R and t
    r = r_cols * np.array([-1.0, -1.0, 1.0])[None, :]
    t = -(eye @ r_cols) * np.array([-1.0, -1.0, 1.0])
    return np.concatenate([r, t[:, None]], axis=1).astype(np.float32)


class PointRenderer:
    """Debug point-cloud renderer (renderer_utils.py:88-119): subsample 10k
    points, optionally append extra points and RGB coordinate-axis ticks,
    splat with random colors from an orbiting camera."""

    POINT_FOV_FOCAL = 1.0 / math.tan(math.radians(30.0))  # FoV 60 deg
    MAX_POINTS = 10000
    POINT_RADIUS = 0.005                                   # NDC, like pytorch3d

    def __init__(self, image_size: int = 256, interpret: bool = False):
        assert image_size % 128 == 0, "splat kernel tiles are 128 px wide"
        self.image_size = int(image_size)
        self.interpret = interpret

    def __call__(self, points, d: float = 3.0, e: float = 15.0, a: float = 30.0,
                 coords: bool = True, ex_points=None,
                 key: Optional[jax.Array] = None) -> jnp.ndarray:
        """points: (B, N, 3) -> (B, 3, H, W) in [0, 255]."""
        if key is None:
            key = jax.random.PRNGKey(0)
        pts = jnp.asarray(points, jnp.float32)
        b, n = pts.shape[0], pts.shape[1]
        k_perm, k_col = jax.random.split(key)
        sel = jax.random.permutation(k_perm, n)[: min(n, self.MAX_POINTS)]
        pts = pts[:, sel]
        if ex_points is not None:
            ex = jnp.broadcast_to(jnp.asarray(ex_points, jnp.float32),
                                  (b,) + jnp.asarray(ex_points).shape[-2:])
            pts = jnp.concatenate([pts, ex], axis=1)
        if coords:
            # RGB axis ticks: N/10 points along each unit axis
            cs = pts.shape[1] // 10
            li = jnp.linspace(0.0, 1.0, cs)
            cod = jnp.zeros((cs * 3, 3))
            cod = cod.at[:cs, 0].set(li).at[cs:2 * cs, 1].set(li) \
                .at[2 * cs:, 2].set(li)
            pts = jnp.concatenate(
                [pts, jnp.broadcast_to(cod[None], (b, cs * 3, 3))], axis=1)

        num = pts.shape[1]
        cam = jnp.asarray(look_at_camera(d, e, a))
        colors32 = jnp.zeros((num, 32)).at[:, :3].set(
            jax.random.uniform(k_col, (num, 3)))
        opac = jnp.full((num, 1), 0.9)
        # world radius that projects to ~POINT_RADIUS in NDC at the orbit dist
        scales = jnp.full((num, 3), self.POINT_RADIUS * d / self.POINT_FOV_FOCAL)
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (num, 1))

        frames = []
        for i in range(b):  # debug tool: tiny batches, host loop is fine
            img = rasterize_gaussians(
                pts[i], colors32, opac, scales, quats, cam,
                focal=self.POINT_FOV_FOCAL, size=self.image_size,
                interpret=self.interpret)[:3]
            frames.append(img)
        return jnp.stack(frames) * 255.0


# -----------------------------------------------------------------------------
# TextureRenderer
# -----------------------------------------------------------------------------

_SH_CONST = np.array([
    1 / np.sqrt(4 * np.pi),
    ((2 * np.pi) / 3) * (np.sqrt(3 / (4 * np.pi))),
    ((2 * np.pi) / 3) * (np.sqrt(3 / (4 * np.pi))),
    ((2 * np.pi) / 3) * (np.sqrt(3 / (4 * np.pi))),
    (np.pi / 4) * 3 * (np.sqrt(5 / (12 * np.pi))),
    (np.pi / 4) * 3 * (np.sqrt(5 / (12 * np.pi))),
    (np.pi / 4) * 3 * (np.sqrt(5 / (12 * np.pi))),
    (np.pi / 4) * (3 / 2) * (np.sqrt(5 / (12 * np.pi))),
    (np.pi / 4) * (1 / 2) * (np.sqrt(5 / (4 * np.pi))),
], dtype=np.float32)


def add_sh_light(images: jnp.ndarray, sh_coeff: jnp.ndarray) -> jnp.ndarray:
    """DECA-style SH shading (renderer_utils.py:176-186), applied exactly as
    the reference does -- to the rendered images. images: (B, 3, H, W),
    sh_coeff: (B, 9, 3) -> (B, 3, H, W)."""
    n = images
    sh = jnp.stack([
        n[:, 0] * 0.0 + 1.0, n[:, 0], n[:, 1],
        n[:, 2], n[:, 0] * n[:, 1], n[:, 0] * n[:, 2],
        n[:, 1] * n[:, 2], n[:, 0] ** 2 - n[:, 1] ** 2,
        3.0 * (n[:, 2] ** 2) - 1.0,
    ], axis=1)                                            # (B, 9, H, W)
    sh = sh * jnp.asarray(_SH_CONST)[None, :, None, None]
    return jnp.sum(sh_coeff[:, :, :, None, None] * sh[:, :, None, :, :], axis=1)


def _bilinear_sample(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """tex (Ht, Wt, 3), uv (..., 2) in [0, 1] with (0, 0) = bottom-left
    (pytorch3d TexturesUV convention, align_corners=True, border padding)."""
    ht, wt = tex.shape[0], tex.shape[1]
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (wt - 1)
    y = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (ht - 1)
    x0 = jnp.clip(jnp.floor(x), 0, wt - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, ht - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, wt - 1)
    y1 = jnp.minimum(y0 + 1, ht - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    c00, c01 = tex[y0, x0], tex[y0, x1]
    c10, c11 = tex[y1, x0], tex[y1, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


class TextureRenderer:
    """UV-textured mesh renderer (renderer_utils.py:122-238).

    tuv: dict with ``verts_uvs`` (Vt, 2), ``textures_idx`` (F, 3),
    ``verts_idx`` (F, 3) -- the same fields the reference loads from an .obj
    or a tuv dict. flame_mask: optional iterable of vertex ids; faces whose
    three vertices are all in the mask form the face-region silhouette.
    """

    def __init__(self, tuv: Dict[str, np.ndarray],
                 flame_mask=None, interpret: bool = False):
        self.uvverts = jnp.asarray(np.asarray(tuv["verts_uvs"], np.float32))
        self.uvfaces = jnp.asarray(np.asarray(tuv["textures_idx"], np.int32))
        self.faces = jnp.asarray(np.asarray(tuv["verts_idx"], np.int32))
        self.interpret = interpret
        if flame_mask is not None:
            mask = set(int(v) for v in flame_mask)
            reduced = np.array([all(int(v) in mask for v in f)
                                for f in np.asarray(tuv["verts_idx"])])
            self.flame_mask = jnp.asarray(reduced)
        else:
            self.flame_mask = None

    def _project(self, verts: jnp.ndarray, transform: jnp.ndarray,
                 focal: float, principal_point: jnp.ndarray,
                 size: int) -> jnp.ndarray:
        """(V, 3) world -> (V, 3) screen (x_pix, y_pix, z_cam), pytorch3d
        PerspectiveCameras semantics (row-vector X @ R + T, NDC +X left,
        screen px 0 at NDC +1)."""
        pv = verts @ transform[:3, :3] + transform[:3, 3]
        z = pv[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        x_ndc = focal * pv[:, 0] / zs + principal_point[0]
        y_ndc = focal * pv[:, 1] / zs + principal_point[1]
        px = (size / 2.0) * (1.0 - x_ndc)
        py = (size / 2.0) * (1.0 - y_ndc)
        return jnp.stack([px, py, z], axis=-1)

    def __call__(self, vertices_world: jnp.ndarray, texture_images: jnp.ndarray,
                 lights: Optional[jnp.ndarray] = None, image_size: int = 512,
                 transform_matrix: Optional[jnp.ndarray] = None,
                 focal_length: float = 12.0,
                 principal_point=(0.0, 0.0)
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """vertices_world (B, V, 3), texture_images (3, Ht, Wt) or
        (B, 3, Ht, Wt) -> (images (B, 3, H, W), masks_all (B, 1, H, W) bool,
        masks_face (B, 1, H, W) bool or None)."""
        b = vertices_world.shape[0]
        pp = jnp.asarray(principal_point, jnp.float32).reshape(-1)
        tex = jnp.asarray(texture_images)
        if tex.ndim == 3:
            tex = jnp.broadcast_to(tex[None], (b,) + tex.shape)
        if transform_matrix is None:
            # the reference's fixed default camera (renderer_utils.py:59-64):
            # R = diag(-1, 1, -1), T = (0, 0, 2)
            transform_matrix = jnp.asarray(
                [[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
            transform_matrix = jnp.concatenate(
                [transform_matrix, jnp.asarray([[0.0], [0.0], [2.0]])], axis=1)
        transform = jnp.asarray(transform_matrix, jnp.float32)
        if transform.ndim == 2:
            transform = jnp.broadcast_to(transform[None], (b, 3, 4))

        images, masks_all, masks_face = [], [], []
        face_uv = self.uvverts[self.uvfaces]              # (F, 3, 2)
        for i in range(b):
            vs = self._project(vertices_world[i], transform[i], focal_length,
                               pp, image_size)
            zbuf, fid = rasterize(vs, self.faces, height=image_size,
                                  width=image_size, interpret=self.interpret)
            covered = fid >= 0
            fid_safe = jnp.maximum(fid, 0)
            a0, a1, _ = face_planes(vs, self.faces)
            # perspective-corrected barycentrics (same recipe as MeshRenderer)
            table = jnp.concatenate([
                a0, a1,
                vs[self.faces[:, 0], 2:3], vs[self.faces[:, 1], 2:3],
                vs[self.faces[:, 2], 2:3],
                face_uv.reshape(-1, 6),
            ], axis=-1)                                   # (F, 15)
            d = table[fid_safe]                           # (H, W, 15)
            ys = jnp.arange(image_size, dtype=jnp.float32) + 0.5
            xs = jnp.arange(image_size, dtype=jnp.float32) + 0.5
            px, py = jnp.meshgrid(xs, ys)
            w0 = d[..., 0] * px + d[..., 1] * py + d[..., 2]
            w1 = d[..., 3] * px + d[..., 4] * py + d[..., 5]
            w2 = 1.0 - w0 - w1
            bary = jnp.stack([w0, w1, w2], axis=-1)
            bw = bary / jnp.maximum(d[..., 6:9], 1e-12)
            bary = bw / jnp.maximum(jnp.sum(bw, axis=-1, keepdims=True), 1e-12)
            uv = jnp.einsum("hwk,hwkc->hwc", bary, d[..., 9:15].reshape(
                image_size, image_size, 3, 2))
            rgb = _bilinear_sample(tex[i].transpose(1, 2, 0), uv)
            rgb = jnp.where(covered[..., None], rgb, 0.0)
            images.append(rgb.transpose(2, 0, 1))
            masks_all.append(covered[None])
            if self.flame_mask is not None:
                # excluded faces collapse to a degenerate (v0, v0, v0)
                # triangle -- zero area, never covers a pixel
                sub = jnp.where(self.flame_mask[:, None], self.faces,
                                self.faces[:, :1])
                _, fid_m = rasterize(vs, sub, height=image_size,
                                     width=image_size, interpret=self.interpret)
                masks_face.append((fid_m >= 0)[None])
        out_images = jnp.stack(images)
        if lights is not None:
            out_images = add_sh_light(out_images, jnp.asarray(lights))
            out_images = jnp.where(jnp.stack(masks_all), out_images, 0.0)
        return (out_images, jnp.stack(masks_all),
                jnp.stack(masks_face) if masks_face else None)
