"""Mesh preview renderer: camera, vertex normals, Phong shading, batched frames.

TPU-native equivalent of the reference's PyTorch3D RenderMesh
(app/flame_model/renderer_utils.py:23-85): fixed perspective camera
(R = diag(-1, 1, -1), T = (0, 0, 2*scale), focal 12 NDC units), uniform
vertex color (142, 179, 247)/255, point light at (0, 1, 3), Hard Phong
shading, white background, 512x512 output.

Visibility is resolved by the Pallas z-buffer kernel (ops/rasterizer.py);
normals + shading are dense batched XLA. Unlike the reference's per-frame
Python loop with a .cpu() per frame (inference.py:70-72), frames here are
vmapped and transferred once.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rasterizer import face_planes, rasterize

# PyTorch3D default light/material constants used by the reference
AMBIENT = 0.5
DIFFUSE = 0.3
SPECULAR = 0.2
MAT_SPECULAR = 0.6     # renderer_utils.py:74
SHININESS = 10.0       # renderer_utils.py:74
LIGHT_LOC = (0.0, 1.0, 3.0)   # renderer_utils.py:72
VERT_COLOR = (142 / 255.0, 179 / 255.0, 247 / 255.0)  # renderer_utils.py:67
FOCAL = 12.0           # renderer_utils.py:64


def _morton2(v: np.ndarray) -> np.ndarray:
    """Interleave the low 10 bits of ``v`` with zeros (Morton/Z-order)."""
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


class MeshRenderer:
    """Batched mesh renderer with the reference's fixed-camera setup."""

    def __init__(self, image_size: int = 512, faces: np.ndarray | None = None,
                 scale: float = 1.0, interpret: bool = False,
                 template_verts: np.ndarray | None = None):
        assert faces is not None, "faces required"
        self.image_size = int(image_size)
        self.scale = scale
        faces = np.asarray(faces, np.int32)
        if template_verts is not None:
            # 2D spatial face ordering (Morton code on template centroid
            # x, y) makes the Pallas rasterizer's chunk-bbox culling
            # effective: chunks become compact in BOTH axes, so each image
            # tile overlaps fewer chunks. Measured on the bench head at
            # 512^2 / TILE_H=8: 2 988 tile-chunk visits with a y-only sort
            # -> 1 935 with Morton (vs ~30k unordered).
            cxy = np.asarray(template_verts)[faces].mean(axis=1)
            gx = ((cxy[:, 0] - cxy[:, 0].min())
                  / (np.ptp(cxy[:, 0]) + 1e-9) * 1023).astype(np.int64)
            gy = ((cxy[:, 1] - cxy[:, 1].min())
                  / (np.ptp(cxy[:, 1]) + 1e-9) * 1023).astype(np.int64)
            faces = faces[np.argsort(_morton2(gx) | (_morton2(gy) << 1))]
        self.faces = jnp.asarray(faces)
        self.interpret = interpret
        self._render_batch = jax.jit(self._render_batch_impl)

    # -- geometry ------------------------------------------------------------

    def camera_transform(self, verts: jnp.ndarray) -> jnp.ndarray:
        """World -> screen-space verts (..., V, 3) = (x_pix, y_pix, z_cam).

        Reference camera (renderer_utils.py:59-64): row-vector convention
        X_view = X @ R + T with R = diag(-1, 1, -1), T = (0, 0, 2 * scale);
        NDC x = f * x/z with +X left / +Y up, mapped to pixels so that NDC +1
        lands at pixel 0.
        """
        s = self.image_size
        x = -verts[..., 0]
        y = verts[..., 1]
        z = -verts[..., 2] + 2.0 * self.scale
        x_ndc = FOCAL * x / z
        y_ndc = FOCAL * y / z
        px = (s / 2.0) * (1.0 - x_ndc)
        py = (s / 2.0) * (1.0 - y_ndc)
        return jnp.stack([px, py, z], axis=-1)

    def vertex_normals(self, verts: jnp.ndarray) -> jnp.ndarray:
        """Area-weighted vertex normals (B, V, 3) in world space."""
        f = self.faces
        v0, v1, v2 = verts[:, f[:, 0]], verts[:, f[:, 1]], verts[:, f[:, 2]]
        fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normals (B, F, 3)
        num_v = verts.shape[1]
        acc = jnp.zeros_like(verts)
        for i in range(3):
            acc = acc.at[:, f[:, i]].add(fn)
        norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
        return acc / jnp.maximum(norm, 1e-12)

    # -- shading -------------------------------------------------------------

    def _shade_points(self, pos: jnp.ndarray, nrm: jnp.ndarray,
                      fid: jnp.ndarray) -> jnp.ndarray:
        """Phong shading of interpolated surface points/normals (H, W, 3)."""
        light = jnp.asarray(LIGHT_LOC)
        cam = jnp.asarray([0.0, 0.0, 2.0 * self.scale])  # camera center in world
        l_dir = light - pos
        l_dir = l_dir / jnp.maximum(jnp.linalg.norm(l_dir, axis=-1, keepdims=True), 1e-12)
        v_dir = cam - pos
        v_dir = v_dir / jnp.maximum(jnp.linalg.norm(v_dir, axis=-1, keepdims=True), 1e-12)
        ndl = jnp.maximum(jnp.sum(nrm * l_dir, axis=-1, keepdims=True), 0.0)
        # Phong reflection
        r_dir = 2.0 * jnp.sum(nrm * l_dir, axis=-1, keepdims=True) * nrm - l_dir
        rdv = jnp.maximum(jnp.sum(r_dir * v_dir, axis=-1, keepdims=True), 0.0)
        spec = SPECULAR * MAT_SPECULAR * jnp.power(rdv, SHININESS)

        texel = jnp.asarray(VERT_COLOR)
        color = (AMBIENT + DIFFUSE * ndl) * texel + spec
        covered = (fid >= 0)[..., None]
        white = jnp.ones(3)
        return jnp.where(covered, jnp.clip(color, 0.0, 1.0), white)

    # -- public API ----------------------------------------------------------

    def _render_one(self, verts: jnp.ndarray) -> jnp.ndarray:
        """One frame: rasterize, then shade with a single packed per-face
        gather.

        The naive path (gather faces -> gather verts -> gather normals ->
        gather plane coeffs, 5 dependent 512^2-sized gathers) dominated the
        frame time; instead all per-face data -- barycentric planes, vertex
        depths, positions, normals -- is packed into one (F, 28) table so
        each pixel does exactly one gather, and the rest is elementwise.
        """
        vs = self.camera_transform(verts)
        zbuf, fid = rasterize(vs, self.faces, height=self.image_size,
                              width=self.image_size, interpret=self.interpret)
        f = self.faces
        normals = self.vertex_normals(verts[None])[0]
        a0, a1, _ = face_planes(vs, f)
        table = jnp.concatenate([
            a0, a1,                                        # 6: bary planes
            vs[f[:, 0], 2:3], vs[f[:, 1], 2:3], vs[f[:, 2], 2:3],  # 3: depths
            verts[f[:, 0]], verts[f[:, 1]], verts[f[:, 2]],        # 9: positions
            normals[f[:, 0]], normals[f[:, 1]], normals[f[:, 2]],  # 9: normals
        ], axis=-1)                                        # (F, 27)

        fid_safe = jnp.maximum(fid, 0)
        d = table[fid_safe]                                # (H, W, 27): ONE gather
        h = w = self.image_size
        ys = jnp.arange(h, dtype=jnp.float32) + 0.5
        xs = jnp.arange(w, dtype=jnp.float32) + 0.5
        px, py = jnp.meshgrid(xs, ys)
        w0 = d[..., 0] * px + d[..., 1] * py + d[..., 2]
        w1 = d[..., 3] * px + d[..., 4] * py + d[..., 5]
        w2 = 1.0 - w0 - w1
        bary = jnp.stack([w0, w1, w2], axis=-1)
        zs = d[..., 6:9]
        bw = bary / jnp.maximum(zs, 1e-12)                 # perspective correction
        bary = bw / jnp.maximum(jnp.sum(bw, axis=-1, keepdims=True), 1e-12)
        pos = jnp.einsum("hwk,hwkc->hwc", bary, d[..., 9:18].reshape(h, w, 3, 3))
        nrm = jnp.einsum("hwk,hwkc->hwc", bary, d[..., 18:27].reshape(h, w, 3, 3))
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        return self._shade_points(pos, nrm, fid)

    def _render_batch_impl(self, verts: jnp.ndarray) -> jnp.ndarray:
        # lax.scan, NOT vmap: the per-pixel shading gather reads a per-frame
        # (F, 27) attribute table. Scanned frames gather from a 1 MB table
        # that stays on-chip (0.77 ms/frame measured on v5e); a vmapped
        # batched gather reads one (B, F, 27) HBM-resident table with frame-
        # crossing random access and costs 3.1 ms/frame. Same math, ~4x.
        def step(carry, v):
            return carry, self._render_one(v)

        _, imgs = jax.lax.scan(step, 0.0, verts)
        return imgs

    def __call__(self, verts: jnp.ndarray) -> jnp.ndarray:
        """(B, V, 3) world-space verts -> (B, H, W, 3) float RGB in [0, 1]."""
        return self._render_batch(verts)

    def render_frames(self, verts: jnp.ndarray, chunk: int = 25,
                      colorspace: str = "rgb") -> np.ndarray:
        """Render a long clip in fixed-size chunks (one compile), returning
        uint8 frames on host with a single transfer per chunk: (T, H, W, 3)
        RGB, or (T, H * 3 // 2, W) yuv420p planes when `colorspace ==
        "yuv420"` (half the host-link bytes, zero host conversion work).

        The fetch of chunk k overlaps the device compute of chunk k + 1."""
        from ..ops.colorspace import rgb_to_yuv420p

        if not hasattr(self, "_frames_fn"):
            self._frames_fn = {}
        fn = self._frames_fn.get(colorspace)
        if fn is None:
            if colorspace == "yuv420":
                fn = jax.jit(lambda v: rgb_to_yuv420p(
                    jnp.clip(self._render_batch_impl(v), 0.0, 1.0),
                    channel_axis=-1))
            else:
                fn = jax.jit(lambda v: jnp.clip(
                    self._render_batch_impl(v) * 255.0, 0, 255).astype(jnp.uint8))
            self._frames_fn[colorspace] = fn
        t = verts.shape[0]
        out, pending, pending_n = [], None, 0
        for start in range(0, t, chunk):
            batch = verts[start : start + chunk]
            pad = chunk - batch.shape[0]
            if pad:
                batch = jnp.concatenate([batch, jnp.tile(batch[-1:], (pad, 1, 1))])
            imgs = fn(batch)
            if pending is not None:  # fetch previous chunk while this one runs
                out.append(np.asarray(pending)[:pending_n])
            pending, pending_n = imgs, chunk - pad
        out.append(np.asarray(pending)[:pending_n])
        return np.concatenate(out, axis=0)
