"""Pallas TPU triangle rasterizer (z-buffer visibility resolve).

TPU-native replacement for the PyTorch3D CUDA MeshRasterizer the reference
uses for mesh preview rendering (app/flame_model/renderer_utils.py:41,77-81).

Design (no atomics, no gathers in the hot loop -- VPU-friendly dense math):

1. XLA precomputes, per face, affine screen-space coefficients: two
   barycentric planes w0(x,y), w1(x,y) (w2 = 1 - w0 - w1) and a depth plane
   z(x,y), plus a per-chunk screen bounding box.
2. A Pallas kernel iterates over image tiles (grid) and face chunks (inner
   loop). A chunk whose bbox misses the tile is skipped (`pl.when`), which --
   with spatially-ordered faces -- prunes most work. For overlapping chunks it
   evaluates the three planes for all (pixel, face) pairs with broadcasted
   FMAs, tests coverage + validity, and keeps a running (min-z, face-id)
   per pixel in VMEM scratch.
3. XLA then shades only winning pixels (barycentric gather + Phong) outside
   the kernel.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.

Tile-size choice (512^2 bench head, Morton-ordered faces, measured on v5e):
frame time decomposes as ~0.69 us per (tile, chunk) bbox-overlap visit plus
~12.5 us fixed per tile (scratch init, scalar chunk loop, cross-lane
min/argmin epilogue). Growing TILE_H trades visit count against per-visit
work almost 1:1 but divides the fixed term: TILE_H 8 -> 32 measured
4.54 -> 3.00 ms/frame (TILE_H=16: 3.59). TILE_H=64 would raise total visit
work (~350 visits x 8 rows > 565 x 4) for a negligible fixed saving, and
doubles the 2 MB scratch again -- 32 is the knee.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32        # pixel tile rows (sublane-aligned; see below)
TILE_W = 128       # pixel tile cols (lane-aligned)
FACE_CHUNK = 128   # faces processed per inner step
BIG = 3.4e38  # plain float: jnp constants cannot be captured inside pallas kernels


def face_planes(verts_screen: jnp.ndarray, faces: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-face affine plane coefficients from screen-space vertices.

    verts_screen: (V, 3) with (x_pix, y_pix, z_cam); faces: (F, 3) int32.
    Returns (a0, a1, az): each (F, 3) rows [coef_x, coef_y, const] such that
    w0 = a0 . (x, y, 1), w1 = a1 . (x, y, 1), z = az . (x, y, 1).
    Degenerate faces get a0 = 0, const -1 => never covered.
    """
    v0 = verts_screen[faces[:, 0]]
    v1 = verts_screen[faces[:, 1]]
    v2 = verts_screen[faces[:, 2]]
    x0, y0, z0 = v0[:, 0], v0[:, 1], v0[:, 2]
    x1, y1, z1 = v1[:, 0], v1[:, 1], v1[:, 2]
    x2, y2, z2 = v2[:, 0], v2[:, 1], v2[:, 2]
    # signed double area of the triangle
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    ok = jnp.abs(area) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)
    # w0: barycentric of v0 = edge function of (v1 -> v2) / area
    a0x = (y1 - y2) * inv
    a0y = (x2 - x1) * inv
    a0c = (x1 * y2 - x2 * y1) * inv
    # w1: barycentric of v1 = edge function of (v2 -> v0) / area
    a1x = (y2 - y0) * inv
    a1y = (x0 - x2) * inv
    a1c = (x2 * y0 - x0 * y2) * inv
    # z plane: z = w0 z0 + w1 z1 + w2 z2 = w0 (z0 - z2) + w1 (z1 - z2) + z2
    dz0, dz1 = z0 - z2, z1 - z2
    azx = a0x * dz0 + a1x * dz1
    azy = a0y * dz0 + a1y * dz1
    azc = a0c * dz0 + a1c * dz1 + z2
    a0 = jnp.stack([a0x, a0y, jnp.where(ok, a0c, -1.0)], axis=1)
    a0 = jnp.where(ok[:, None], a0, jnp.array([0.0, 0.0, -1.0]))
    a1 = jnp.where(ok[:, None], jnp.stack([a1x, a1y, a1c], axis=1), 0.0)
    az = jnp.stack([azx, azy, azc], axis=1)
    return a0, a1, az


def chunk_bboxes(verts_screen: jnp.ndarray, faces: jnp.ndarray,
                 num_chunks: int) -> jnp.ndarray:
    """(num_chunks, 4) [xmin, xmax, ymin, ymax] over each FACE_CHUNK of faces."""
    fx = verts_screen[faces, 0].reshape(num_chunks, FACE_CHUNK, 3)
    fy = verts_screen[faces, 1].reshape(num_chunks, FACE_CHUNK, 3)
    return jnp.stack([
        fx.min(axis=(1, 2)), fx.max(axis=(1, 2)),
        fy.min(axis=(1, 2)), fy.max(axis=(1, 2)),
    ], axis=1)


MAX_CHUNKS = 256   # chunk id packs into the low 8 bits of the z key
_KEY_MASK = ~0xFF


def _raster_kernel(a0_ref, a1_ref, az_ref, bbox_ref, zbuf_ref, fid_ref,
                   best_ref, *, num_chunks: int):
    """Per-tile z-resolve with packed keys.

    To avoid a cross-lane reduction per chunk, the per-(pixel, lane) running
    minimum is kept over *all* chunks as an int32 key = (z_bits & ~0xFF) |
    chunk_id (positive-float bits compare like ints, so integer min == depth
    min; the low 8 mantissa bits are sacrificed to remember which chunk won).
    Each chunk step is then pure elementwise FMA+min; the single cross-lane
    min/argmin happens once per tile at the end.
    """
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    py = (ty * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          ).astype(jnp.float32) + 0.5
    px = (tx * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          ).astype(jnp.float32) + 0.5
    pxf = px[:, :, None]  # (TILE_H, TILE_W, 1)
    pyf = py[:, :, None]

    big_key = (0x7F000000 & _KEY_MASK) | 0xFF  # huge float, sentinel chunk
    best_ref[:] = jnp.full((TILE_H, TILE_W, FACE_CHUNK), big_key, jnp.int32)

    tile_x0 = tx.astype(jnp.float32) * TILE_W
    tile_y0 = ty.astype(jnp.float32) * TILE_H

    def chunk_body(c, _):
        overlaps = jnp.logical_and(
            jnp.logical_and(bbox_ref[c, 1] >= tile_x0, bbox_ref[c, 0] <= tile_x0 + TILE_W),
            jnp.logical_and(bbox_ref[c, 3] >= tile_y0, bbox_ref[c, 2] <= tile_y0 + TILE_H),
        )

        @pl.when(overlaps)
        def _():
            sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
            a0 = a0_ref[:, sl]  # (3, C)
            a1 = a1_ref[:, sl]
            az = az_ref[:, sl]
            # pairwise plane evaluation over (pixels, faces): (TH, TW, C)
            w0 = pxf * a0[0, :] + pyf * a0[1, :] + a0[2, :]
            w1 = pxf * a1[0, :] + pyf * a1[1, :] + a1[2, :]
            z = pxf * az[0, :] + pyf * az[1, :] + az[2, :]
            covered = (w0 >= 0.0) & (w1 >= 0.0) & (w0 + w1 <= 1.0) & (z > 0.0)
            zbits = jnp.bitwise_and(jax.lax.bitcast_convert_type(z, jnp.int32), _KEY_MASK)
            key = jnp.where(covered, jnp.bitwise_or(zbits, c), big_key)
            best_ref[:] = jnp.minimum(best_ref[:], key)

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    # all keys are positive-float bit patterns, so reduce in f32 (Mosaic's
    # argmin only supports f32) -- float order == int order here
    bestf = jax.lax.bitcast_convert_type(best_ref[:], jnp.float32)  # (TH, TW, C)
    key_min = jax.lax.bitcast_convert_type(jnp.min(bestf, axis=-1), jnp.int32)
    lane = jnp.argmin(bestf, axis=-1).astype(jnp.int32)             # (TH, TW)
    chunk = jnp.bitwise_and(key_min, 0xFF)
    hit = key_min < big_key
    zbuf_ref[:] = jnp.where(
        hit,
        jax.lax.bitcast_convert_type(jnp.bitwise_and(key_min, _KEY_MASK), jnp.float32),
        BIG)
    fid_ref[:] = jnp.where(hit, chunk * FACE_CHUNK + lane, -1)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize(verts_screen: jnp.ndarray, faces: jnp.ndarray, *,
              height: int, width: int, interpret: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Z-buffer rasterization of one mesh.

    verts_screen: (V, 3) pixel-space x, y and camera-space z (z > 0 in front).
    faces: (F, 3) int32 vertex indices (F padded to FACE_CHUNK internally).
    Returns (zbuf (H, W) f32 with BIG for background, face_id (H, W) int32
    with -1 for background).
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    num_faces = faces.shape[0]
    padded = ((num_faces + FACE_CHUNK - 1) // FACE_CHUNK) * FACE_CHUNK
    if padded != num_faces:
        faces = jnp.concatenate(
            [faces, jnp.zeros((padded - num_faces, 3), faces.dtype)], axis=0)
    num_chunks = padded // FACE_CHUNK
    assert num_chunks <= MAX_CHUNKS, (
        f"{num_faces} faces exceed the {MAX_CHUNKS * FACE_CHUNK}-face kernel limit")

    a0, a1, az = face_planes(verts_screen, faces)
    if padded != num_faces:  # mark padding faces degenerate
        pad_mask = (jnp.arange(padded) >= num_faces)[:, None]
        a0 = jnp.where(pad_mask, jnp.array([0.0, 0.0, -1.0]), a0)
    bbox = chunk_bboxes(verts_screen, faces, num_chunks)

    kernel = functools.partial(_raster_kernel, num_chunks=num_chunks)
    grid = (height // TILE_H, width // TILE_W)
    zbuf, fid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, padded), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, padded), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, padded), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_chunks, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W, FACE_CHUNK), jnp.int32),
        ],
        interpret=interpret,
    )(a0.T, a1.T, az.T, bbox)
    return zbuf, fid


def rasterize_reference(verts_screen: jnp.ndarray, faces: jnp.ndarray, *,
                        height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force XLA oracle of the same semantics (tests / tiny images)."""
    a0, a1, az = face_planes(verts_screen, faces)
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    p = jnp.stack([px.ravel(), py.ravel(), jnp.ones_like(px.ravel())], axis=1)  # (P, 3)
    w0 = p @ a0.T
    w1 = p @ a1.T
    z = p @ az.T
    covered = (w0 >= 0.0) & (w1 >= 0.0) & (w0 + w1 <= 1.0) & (z > 0.0)
    zm = jnp.where(covered, z, BIG)
    fid = jnp.where(zm.min(axis=1) < BIG, jnp.argmin(zm, axis=1), -1)
    return zm.min(axis=1).reshape(height, width), fid.reshape(height, width).astype(jnp.int32)
