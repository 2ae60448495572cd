"""3D Gaussian splatting, TPU-native (32 feature channels).

Replaces the reference's ``diff_gaussian_rasterization_32d`` CUDA extension
(app/GAGAvatar/utils_renderer.py:6-47, NUM_CHANNELS=32). Same math as the
original 3DGS rasterizer -- EWA projection of anisotropic 3D gaussians to 2D
conics, front-to-back alpha compositing per pixel -- re-architected for TPU:

1. **XLA prepass** (dense, batched): quaternion -> covariance, perspective
   projection, 2D conic + radius, and *budgeted tile duplication*: each
   gaussian emits up to 2x4 tile instances (bounded => static shapes). One
   payload-free int32 key sort (tile id | depth rank) orders instances
   tile-major/depth-minor; a searchsorted on the sorted keys gives per-tile
   segment offsets and one packed gather materializes the instance data
   (see _build_instances).
2. **Pallas kernel**: one grid step per 16x128-pixel tile; walks its segment
   in chunks of GCHUNK gaussians stored group-interleaved. Per chunk the
   alpha of every (pixel, gaussian) pair is a dense VPU evaluation; the
   front-to-back compositing order is restored with a two-level exclusive
   cumulative product of (1 - alpha): a sequential combine over GMEMBERS
   depth-consecutive gaussians per group (parallel across groups) + a
   log-step scan across the GGROUPS lane axis. The 32-channel color
   accumulation is (pixels x group) @ (group x 32) MXU matmuls. No atomics,
   no dynamic lists.

CUDA's per-pixel sequential loop becomes scan + matmul -- the natural TPU
formulation of the same sum: C(p) = sum_i c_i a_i prod_{j<i} (1 - a_j).

PREPASS STRUCTURAL FLOOR (r05, every avenue measured): the prepass is bound
by XLA's data-dependent-permutation primitives, which Mosaic cannot replace
(no vectorized gather/scatter exists in Pallas TPU -- per-element DMA is the
only mechanism, orders of magnitude too slow at 1M instances):

- gather runs at ~3 ns/index/pass independent of row width and table
  residency (tools/exp_gather_split.py; a 1 MB fully-VMEM table gathers at
  the same per-index rate), so the budgeted instance gather is index-pass
  bound; the pipeline already uses the minimum number of passes (one packed
  f32 pass, or two overlapping passes when colors are bf16 -- fusing them
  was measured and LOSES 3.7 ms/frame in-context).
- the 1.44M-key instance sort: lax.sort unstable = 2.3-3.0 ms. Alternatives
  all measured and rejected: XLA counting/radix (scatter 8.5 ms, one-hot
  ranks 37 ms, r02), VMEM-resident Pallas bitonic network
  (tools/exp_pallas_sort.py, r05: ~15 min Mosaic compile then scoped-vmem
  OOM at 2^19 under the 16 MB default; raising the limit does not rescue
  the production 2^21 size, and server-side TPU compiles are uncacheable
  over this tunnel, so the compile time alone disqualifies it).
- projection/validity/compaction are elementwise and already fused.

With the splat kernel itself at ~20% of bf16 peak (hand-computed model in
utils/roofline.py) and StyleUNet SR at its own measured ~10 ms structural
floor, the exact-budget GAGA frame lands at ~26 ms on the saturating
random-init bench scene; sub-20 ms frames come from the per-avatar budget
buckets (trained checkpoints measure ~1.7 valid instances/gaussian ->
18.4 ms, BENCH_r04), not from further prepass work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHANNELS = 32
GTILE_H = 16       # pixel tile for the splat kernel
GTILE_W = 128
# Compositing chunk: GCHUNK gaussians per step, stored interleaved as
# GMEMBERS depth-consecutive gaussians per lane group (see _build_instances).
# The in-chunk front-to-back scan is two-level: an O(GMEMBERS) sequential
# combine inside each group (elementwise, all groups in parallel across a
# full 128-lane register) + a log2(GGROUPS)-pass Hillis-Steele scan across
# groups. vs the flat 256-lane scan this is ~2.8x less vector work per
# gaussian (7 passes over (npix,128) + 6 combine ops per 512 gaussians,
# instead of 2x8 passes over (npix,256)).
GMEMBERS = 4       # depth-consecutive gaussians combined per group
GGROUPS = 128      # groups per chunk = one full lane register
GCHUNK = GMEMBERS * GGROUPS
DUP_X = 2          # tile slots per gaussian in x (128-px tiles)
DUP_Y = 4          # tile slots per gaussian in y (16-px tiles)
DUP = DUP_X * DUP_Y
# Guaranteed full-coverage radius of the bbox-anchored DUP_Y x DUP_X window:
# the anchor tile eats up to one tile of slack, so a 2r-wide bbox always fits
# iff 2r <= (DUP-1) * tile. Splats larger than this are clamped at emission
# time (centered truncation beyond +/-MAX_R* of the mean; alpha there is
# <= exp(-4.5) of peak at the 3-sigma radius, so the cut is invisible for
# realistic opacities). The reference CUDA rasterizer instead duplicates into
# every overlapped tile (dynamic instance counts -- not static-shape friendly).
MAX_RX = (DUP_X - 1) * GTILE_W // 2    # 64 px
MAX_RY = (DUP_Y - 1) * GTILE_H // 2    # 24 px
ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (..., 4) in (w, x, y, z) -> rotation (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) scales + (N, 4) quats -> (N, 3, 3) covariance R S S^T R^T."""
    r = quat_to_rotmat(rotations)
    m = r * scales[..., None, :]          # R @ diag(s)
    return m @ m.transpose(0, 2, 1)


def _project_components(xyz, scales, rotations, cam_matrix, focal: float,
                        size: int) -> dict:
    """Projection math in structure-of-arrays form: every intermediate is an
    (N,) array. The naive (N,2,3)/(N,3,3) tensor formulation leaves 125 of
    128 lanes idle on TPU (profiled ~9 ms at 180k gaussians vs ~2 ms here);
    the camera matrix is constant so every small matmul expands into scalar
    linear combinations."""
    r = cam_matrix[:3, :3]
    t = cam_matrix[:3, 3]
    flip = jnp.array([-1.0, -1.0, 1.0])
    # p_view = p @ V[:3,:3] + t, with the first two output columns negated
    x0, x1, x2 = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    pv = [(x0 * r[0, i] + x1 * r[1, i] + x2 * r[2, i] + t[i]) * flip[i]
          for i in range(3)]
    depth = pv[2]
    in_front = depth > 0.01

    fpix = focal * (size / 2.0)  # focal in NDC units -> pixels
    zs = jnp.maximum(depth, 0.01)
    # pixel centers: ndc = f * x/z; pix = (ndc + 1) * size/2
    mx = (focal * pv[0] / zs + 1.0) * (size / 2.0)
    my = (focal * pv[1] / zs + 1.0) * (size / 2.0)

    # cov3d = M M^T with M = R(q) diag(s): 6 unique components, elementwise
    w, qx, qy, qz = (rotations[:, 0], rotations[:, 1], rotations[:, 2],
                     rotations[:, 3])
    rot = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - w * qz), 2 * (qx * qz + w * qy)],
        [2 * (qx * qy + w * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - w * qx)],
        [2 * (qx * qz - w * qy), 2 * (qy * qz + w * qx), 1 - 2 * (qx * qx + qy * qy)],
    ]
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    m = [[rot[i][0] * s0, rot[i][1] * s1, rot[i][2] * s2] for i in range(3)]
    cov = {(i, j): m[i][0] * m[j][0] + m[i][1] * m[j][1] + m[i][2] * m[j][2]
           for i in range(3) for j in range(3) if i <= j}

    # EWA: cov2d = (J W) cov3d (J W)^T; J rows are [f/z, 0, -f tx/z^2] and
    # [0, f/z, -f ty/z^2]; W = view rotation incl. the xy flip is CONSTANT,
    # so each (J W) component is a scalar combination per gaussian.
    lim = 1.3 / focal  # clamp like 3DGS (1.3 * tan(fov/2) frustum limit)
    txz = jnp.clip(pv[0] / zs, -lim, lim) * zs
    tyz = jnp.clip(pv[1] / zs, -lim, lim) * zs
    j00 = fpix / zs
    j02 = -fpix * txz / (zs * zs)
    j12 = -fpix * tyz / (zs * zs)
    wrow = [[r[k, 0] * flip[0], r[k, 1] * flip[1], r[k, 2] * flip[2]]
            for k in range(3)]  # w_rot = r.T * flip[:, None], indexed [row][col]
    # jw[i][k] = sum_j J[i][j] * w_rot[j][k]  (J[0] = [j00, 0, j02], J[1] = [0, j00, j12])
    jw0 = [j00 * wrow[0][k] + j02 * wrow[2][k] for k in range(3)]
    jw1 = [j00 * wrow[1][k] + j12 * wrow[2][k] for k in range(3)]

    def quad(a, b):
        """a . cov3d . b for 3-component per-gaussian vectors a, b."""
        return (a[0] * b[0] * cov[(0, 0)] + a[1] * b[1] * cov[(1, 1)]
                + a[2] * b[2] * cov[(2, 2)]
                + (a[0] * b[1] + a[1] * b[0]) * cov[(0, 1)]
                + (a[0] * b[2] + a[2] * b[0]) * cov[(0, 2)]
                + (a[1] * b[2] + a[2] * b[1]) * cov[(1, 2)])

    # low-pass: ensure each splat is at least ~1px (3DGS convention)
    c00 = quad(jw0, jw0) + 0.3
    c01 = quad(jw0, jw1)
    c11 = quad(jw1, jw1) + 0.3

    det = jnp.maximum(c00 * c11 - c01 * c01, 1e-12)
    ca = c11 / det
    cb = -c01 / det
    cc = c00 / det
    mid = 0.5 * (c00 + c11)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    return {"mx": mx, "my": my, "depth": depth, "ca": ca, "cb": cb, "cc": cc,
            "radius": radius, "in_front": in_front}


def project_gaussians(xyz: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
                      cam_matrix: jnp.ndarray, focal: float, size: int
                      ) -> Tuple[jnp.ndarray, ...]:
    """Project gaussians through the reference camera.

    cam_matrix: (3, 4) world->view in the reference's row-vector convention
    (utils_renderer.py:61-69: view = [R | t] with x,y negated, applied as
    p_view = p @ V). Returns (mean2d (N,2) pixels, depth (N,), conic (N,3)
    [a,b,c] of the inverse 2D covariance, radius (N,) pixels, in_front (N,)).
    """
    c = _project_components(xyz, scales, rotations, cam_matrix, focal, size)
    mean2d = jnp.stack([c["mx"], c["my"]], axis=-1)
    conic = jnp.stack([c["ca"], c["cb"], c["cc"]], axis=-1)
    return mean2d, c["depth"], conic, c["radius"], c["in_front"]


def _alpha(mean2d, conic, opacity, px, py):
    """Gaussian falloff alpha at pixel centers (broadcast-friendly)."""
    dx = px - mean2d[..., 0]
    dy = py - mean2d[..., 1]
    power = -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) \
        - conic[..., 1] * dx * dy
    alpha = jnp.minimum(0.99, opacity * jnp.exp(power))
    return jnp.where(power > 0, 0.0, alpha)


def rasterize_gaussians_reference(xyz, colors, opacities, scales, rotations,
                                  cam_matrix, focal: float = 12.0,
                                  size: int = 512) -> jnp.ndarray:
    """Brute-force XLA oracle: exact front-to-back compositing, O(N * pixels).

    For tests and tiny scenes only. Returns (CHANNELS, size, size).
    """
    mean2d, depth, conic, radius, in_front = project_gaussians(
        xyz, scales, rotations, cam_matrix, focal, size)
    order = jnp.argsort(jnp.where(in_front, depth, jnp.inf))
    mean2d, conic, radius = mean2d[order], conic[order], radius[order]
    opac = jnp.where(in_front, opacities[..., 0], 0.0)[order]
    cols = colors[order]

    ys = jnp.arange(size, dtype=jnp.float32) + 0.5
    xs = jnp.arange(size, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)
    p = px.size

    def body(carry, g):
        color, t = carry
        mean, con, op, col = g
        a = _alpha(mean, con, op, px.reshape(-1), py.reshape(-1))
        a = jnp.where(a < ALPHA_EPS, 0.0, a)
        w = (t * a)[:, None]
        color = color + w * col[None]
        t = t * (1.0 - a)
        return (color, t), None

    init = (jnp.zeros((p, CHANNELS)), jnp.ones((p,)))
    (color, t), _ = jax.lax.scan(body, init, (mean2d, conic, opac, cols))
    return color.T.reshape(CHANNELS, size, size)


# ---------------------------------------------------------------------------
# Tiled pipeline: duplication + sort (XLA) -> compositing kernel (Pallas)
# ---------------------------------------------------------------------------


def _slot_validity(mx, my, radius, opac, size: int):
    """Bbox-anchored tile slots: DUP_Y x DUP_X tiles starting at the bbox's
    top-left tile, clipped against the pixel bbox (radius); invalid slots are
    masked out. (Anchoring at the bbox corner covers tall splats that a
    center-anchored neighborhood would truncate.) Emission radii are clamped
    to the duplication budget per axis (MAX_RX/MAX_RY) so splats larger than
    the window degrade as a centered crop instead of losing whole sides.

    Inputs are (N,) per-gaussian arrays; returns (tx, ty, valid) of shape
    (DUP, N)."""
    tiles_x = size // GTILE_W
    tiles_y = size // GTILE_H
    rx = jnp.minimum(radius, float(MAX_RX))
    ry = jnp.minimum(radius, float(MAX_RY))
    cx0 = jnp.floor((mx - rx) / GTILE_W)
    cy0 = jnp.floor((my - ry) / GTILE_H)
    offs = [(dy, dx) for dy in range(DUP_Y) for dx in range(DUP_X)]
    ty = jnp.stack([cy0 + dy for dy, _ in offs])           # (DUP, N)
    tx = jnp.stack([cx0 + dx for _, dx in offs])
    # tile pixel bounds
    x0, x1 = tx * GTILE_W, (tx + 1) * GTILE_W
    y0, y1 = ty * GTILE_H, (ty + 1) * GTILE_H
    overlap = ((mx + rx >= x0) & (mx - rx <= x1)
               & (my + ry >= y0) & (my - ry <= y1))
    valid = overlap & (tx >= 0) & (tx < tiles_x) & (ty >= 0) & (ty < tiles_y) \
        & (opac > 0) & (radius > 0)
    return tx, ty, valid


def _compact_slots(tile_id, tx, ty, mx, my, num_tiles: int, slot_cap: int):
    """Per-gaussian slot compaction: keep each gaussian's ``slot_cap`` most
    central valid slots of its DUP emitted ones.

    The instance-key sort is the prepass's largest fixed cost and scales with
    the emitted slot count, but the DUP = 2x4 window is sized for the LARGEST
    clamped splat -- most gaussians validate only 1-2 slots. Compacting to a
    per-scene cap (``max_valid_slots_per_gaussian``) shrinks the sort input
    by DUP/slot_cap with zero output change when no gaussian exceeds the cap.

    When a gaussian DOES exceed the cap, it keeps the slots whose tile
    centers are nearest its mean -- the same centered-truncation degradation
    contract as the MAX_RX/MAX_RY emission clamp (farthest tiles carry the
    lowest-alpha tail), and strictly more graceful than the global prefix
    budget's drop-whole-bottom-tiles behavior.

    Selection runs as a Batcher odd-even 8-sorting network along the DUP
    axis: 19 elementwise min/max stages over (n,) lanes -- fully fused by
    XLA, no lane shuffles, ~free next to the 1.44M-key sort it shrinks.
    Priority packs (tile-normalized L1 center distance, tile_id) into one
    int32; invalid slots sort last as INT32_MAX.
    """
    assert 1 <= slot_cap <= DUP
    if slot_cap == DUP:
        return tile_id  # bit-exact default: set of (tile, rank) keys unchanged
    tile_bits = (num_tiles + 1).bit_length()  # tile_id may equal num_tiles
    dx = jnp.abs((tx + 0.5) * GTILE_W - mx) * (1.0 / GTILE_W)
    dy = jnp.abs((ty + 0.5) * GTILE_H - my) * (1.0 / GTILE_H)
    qd = jnp.minimum((dx + dy) * 64.0, 4095.0).astype(jnp.int32)
    invalid = tile_id >= num_tiles
    c = jnp.where(invalid, jnp.iinfo(jnp.int32).max,
                  (qd << tile_bits) | tile_id)
    rows = [c[d] for d in range(DUP)]
    # Batcher odd-even mergesort network for 8 inputs (19 compare-exchanges)
    net = [(0, 1), (2, 3), (4, 5), (6, 7),
           (0, 2), (1, 3), (4, 6), (5, 7), (1, 2), (5, 6),
           (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
           (1, 2), (3, 4), (5, 6)]
    for a, b in net:
        lo = jnp.minimum(rows[a], rows[b])
        hi = jnp.maximum(rows[a], rows[b])
        rows[a], rows[b] = lo, hi
    kept = jnp.stack(rows[:slot_cap])
    return jnp.where(kept == jnp.iinfo(jnp.int32).max, num_tiles,
                     kept & ((1 << tile_bits) - 1))


def _build_instances(comp: dict, opac, colors, size: int,
                     max_instances: int | None = None,
                     slot_cap: int = DUP):
    """Budgeted tile duplication + tile-major/depth-minor ordering.

    comp: the (N,)-component dict from ``_project_components``. Returns
    per-instance packed arrays sorted so each tile's gaussians are contiguous
    and front-to-back, plus per-tile segment offsets.

    The instance sort is latency-bound on a tunneled TPU, so every 1.44M-row
    pass is minimized to exactly three: one payload-free ``lax.sort`` of
    int32 keys, one searchsorted for the segment offsets, and ONE packed
    (geo+color) gather (when colors are bfloat16 the packed table splits
    into an f32 geo gather + a half-traffic bf16 color gather -- positions
    must stay f32, bf16 at 512 px quantizes to ~2 px). Fusing the split
    pair into a single (48, n) int16 table via bitcasting the f32 geo rows
    was measured and REJECTED: standalone the one-gather variant wins
    (tools/exp_gather_split.py: 3.98 vs 5.19 ms at 720k indices), but
    in-program XLA overlaps the two gathers and the int16 gather plus the
    bitcast/transpose recovery LOSES 3.7 ms/frame on the bench scene
    (8.39 -> 12.12 ms whole-rasterize). Depth order is folded
    into the key -- gaussians are
    depth-sorted once (N elements, DUP x smaller), and each instance's key is
    ``tile_id << rank_bits | depth_rank`` where the rank is just the row
    index after the permutation, so both the tile segment boundaries and the
    source row are recoverable from the sorted key alone with no carried
    payload and no inverse-permutation gather. All per-slot math runs in
    slot-major (DUP, N) layout -- N on lanes -- not (N, DUP), which would
    leave 120 of 128 lanes idle.
    """
    n = comp["depth"].shape[0]
    tiles_x = size // GTILE_W
    tiles_y = size // GTILE_H
    num_tiles = tiles_x * tiles_y
    rank_bits = max((n - 1).bit_length(), 1)
    assert (num_tiles + 1) < (1 << (31 - rank_bits)), "key overflow"

    # depth order once; instances are emitted in this order so the in-tile
    # key order (by row index) is front-to-back.
    perm = jnp.argsort(comp["depth"])
    # packed per-gaussian table, depth-ordered, feature-major for the final
    # lane-aligned gather: rows 0..7 = [mx, my, ca, cb, cc, op, radius, 0]
    # (padded to 8 for sublane-aligned kernel DMA; the kernel reads rows 0..5
    # only, so radius rides the padding row instead of paying its own
    # 180k-index permute pass), rows 8..39 = colors.
    #
    # NOTE on gather structure (measured, tools/exp_gather_split.py +
    # whole-rasterize A/B): standalone microbenchmarks say gather cost is
    # per index pass (row width/table size barely matter), suggesting the
    # split pair should fuse into one int16 table -- but in-program the two
    # gathers overlap and the fused int16 variant LOSES 3.7 ms/frame, so
    # the split layout stays. Radius rides geo row 6 (the kernel only reads
    # rows 0..5) instead of paying its own 180k-index permute.
    zeros = jnp.zeros((n,), jnp.float32)
    geo_rows = jnp.stack([comp["mx"], comp["my"], comp["ca"], comp["cb"],
                          comp["cc"], opac, comp["radius"], zeros])
    split = colors.dtype != geo_rows.dtype
    if split:  # bf16 colors: separate tables, one gather each
        table = geo_rows[:, perm]                         # (8, n) f32
        col_table = colors.T[:, perm]                     # (CHANNELS, n) bf16
    else:
        table = jnp.concatenate([geo_rows, colors.T], axis=0)[:, perm]
    mx_s, my_s = table[0], table[1]
    opac_s, radius_s = table[5], table[6]

    tx, ty, valid = _slot_validity(mx_s, my_s, radius_s, opac_s, size)
    tile_id = jnp.where(valid, (ty * tiles_x + tx).astype(jnp.int32), num_tiles)
    tile_id = _compact_slots(tile_id, tx, ty, mx_s, my_s, num_tiles, slot_cap)

    # key = tile << rank_bits | depth rank; the rank of every slot of
    # depth-ranked gaussian g is just g (one gaussian never emits two slots
    # into the same real tile, and trash-tile duplicates are never read).
    rank = jax.lax.broadcasted_iota(jnp.int32, (slot_cap, n), 1)
    key = (tile_id << rank_bits) | rank

    total = n * slot_cap
    padded = ((total + GCHUNK - 1) // GCHUNK) * GCHUNK
    key = jnp.pad(key.reshape(-1), (0, padded - total),
                  constant_values=jnp.iinfo(jnp.int32).max)
    # payload-free UNSTABLE sort: real keys are unique (a gaussian never
    # emits two slots into one tile, so (tile, rank) pairs are distinct);
    # only trash/pad duplicates reorder, and the kernel never reads those.
    # is_stable=False is ~1.4x faster on TPU (3.4 -> 2.3 ms at 1.44M keys).
    sorted_key = jax.lax.sort(key, is_stable=False)
    if max_instances is not None:
        # Budgeted gather: valid instances form a prefix of the sorted keys
        # (trash/pad keys sort last), and for realistic splat sizes they are
        # a small fraction of the DUP * N slot budget (~1.7 slots/gaussian
        # measured on the GAGAvatar workload vs DUP=8 emitted). Gathering
        # only the first `max_instances` columns cuts the dominant prepass
        # cost (the packed gather + HBM materialization) proportionally.
        # CALLER CONTRACT: if the scene's valid count (see
        # count_valid_instances) exceeds the budget, instances are dropped in
        # tile-major order -- the highest tile ids (bottom image rows) lose
        # their farthest gaussians first, then whole tiles. Size the budget
        # with margin.
        budget = max(GCHUNK, ((max_instances + GCHUNK - 1) // GCHUNK) * GCHUNK)
        sorted_key = sorted_key[:min(padded, budget)]
    # per-tile segment starts; [num_tiles] = start of trash (pad keys sort
    # after every trash key) = end of the last real segment. searchsorted on
    # the (possibly budget-truncated) keys clamps every offset to its length.
    offsets = jnp.searchsorted(
        sorted_key,
        (jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits)).astype(jnp.int32)

    # ONE gather materializes all per-instance data; rows past the trash
    # start hold clamped-index garbage the kernel never reads. (feature,
    # instance) layout keeps per-chunk DMA slices lane-aligned.
    src = sorted_key & ((1 << rank_bits) - 1)             # depth-ranked row
    # Interleave within each chunk: stored lane l holds depth rank
    # (l % GGROUPS) * GMEMBERS + (l // GGROUPS), so the kernel's member
    # slice m = lanes [m*GGROUPS, (m+1)*GGROUPS) carries ranks {GMEMBERS*i+m}
    # across groups i — depth-consecutive gaussians sit at the same lane of
    # consecutive member slices, enabling the two-level in-chunk scan.
    src = src.reshape(-1, GGROUPS, GMEMBERS).swapaxes(1, 2).reshape(-1)
    if split:
        return table[:, src], col_table[:, src], offsets
    data = table[:, src]                                  # (8 + CHANNELS, P)
    return data[:8], data[8:], offsets


def _cumprod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along the last axis as a log-step
    Hillis-Steele scan (Mosaic has no cumprod primitive)."""
    c = x.shape[-1]
    step = 1
    while step < c:
        shifted = jnp.concatenate(
            [jnp.ones_like(x[:, :step]), x[:, :-step]], axis=-1)
        x = x * shifted
        step *= 2
    return x


def _splat_kernel(offsets_ref, geo_ref, cols_ref, out_ref,
                  geo_vmem, cols_vmem, sems, *, tiles_x: int):
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x
    npix_all = GTILE_H * GTILE_W
    # pixel coords built directly in the flattened (npix, 1) layout (Mosaic
    # cannot shape-cast (TH, TW) -> (TH*TW, 1))
    pidx = jax.lax.broadcasted_iota(jnp.int32, (npix_all, 1), 0)
    py = (ty * GTILE_H + pidx // GTILE_W).astype(jnp.float32) + 0.5
    px = (tx * GTILE_W + pidx % GTILE_W).astype(jnp.float32) + 0.5

    start = offsets_ref[tile]
    end = offsets_ref[tile + 1]
    first_chunk = start // GCHUNK
    last_chunk = (end + GCHUNK - 1) // GCHUNK

    npix = GTILE_H * GTILE_W

    def dmas(c, slot):
        base = c * GCHUNK
        return (
            pltpu.make_async_copy(
                geo_ref.at[:, pl.ds(base, GCHUNK)], geo_vmem.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                cols_ref.at[:, pl.ds(base, GCHUNK)], cols_vmem.at[slot],
                sems.at[slot, 1]),
        )

    def start_fetch(c, slot):
        g, k = dmas(c, slot)
        g.start()
        k.start()

    def wait_fetch(c, slot):
        g, k = dmas(c, slot)
        g.wait()
        k.wait()

    @pl.when(first_chunk < last_chunk)
    def _():
        start_fetch(first_chunk, first_chunk % 2)

    def chunk_body(state):
        c, color, t = state
        slot = c % 2
        # overlap: start the next chunk's DMA before waiting on this one
        @pl.when(c + 1 < last_chunk)
        def _():
            start_fetch(c + 1, (c + 1) % 2)

        wait_fetch(c, slot)
        base = c * GCHUNK
        geo = geo_vmem[slot]                                # (8, GCHUNK)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, GGROUPS), 1)
        # per-member alpha over (npix, GGROUPS) slices — the (npix, GCHUNK)
        # array is never materialized (VMEM stays bounded at GCHUNK=512)
        alphas = []
        for m in range(GMEMBERS):
            g = geo[:, m * GGROUPS:(m + 1) * GGROUPS]
            dx = px - g[0:1, :]
            dy = py - g[1:2, :]
            power = -0.5 * (g[2:3, :] * dx * dx + g[4:5, :] * dy * dy) \
                - g[3:4, :] * dx * dy
            alpha = jnp.minimum(0.99, g[5:6, :] * jnp.exp(power))
            alpha = jnp.where((power > 0) | (alpha < ALPHA_EPS), 0.0, alpha)
            # mask instances outside this tile's segment (depth-rank index of
            # member m at group lane i is base + GMEMBERS*i + m)
            idx = base + m + GMEMBERS * lane
            alphas.append(jnp.where((idx >= start) & (idx < end), alpha, 0.0))
        # two-level front-to-back scan. Level 1: sequential combine inside
        # each group (members are depth-consecutive): w_m = a_m prod_{j<m}
        # (1-a_j) and the group transmittance tg = prod_m (1-a_m).
        weights = []
        prefix = None                                       # prod (1-a_j), j<m
        for m in range(GMEMBERS):
            a = alphas[m]
            weights.append(a if prefix is None else prefix * a)
            u = 1.0 - a
            prefix = u if prefix is None else prefix * u
        # Level 2: exclusive cumprod of tg across the GGROUPS lane axis.
        cum = _cumprod_lanes(prefix)
        excl = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=-1)
        e = excl * t                                        # (P, GGROUPS)
        cols = cols_vmem[slot].astype(jnp.float32)          # (32, GCHUNK)
        for m in range(GMEMBERS):
            color = color + jax.lax.dot_general(
                weights[m] * e, cols[:, m * GGROUPS:(m + 1) * GGROUPS],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        t = t * cum[:, -1:]
        return c + 1, color, t

    def cond(state):
        c, _, t = state
        return jnp.logical_and(c < last_chunk, jnp.max(t) > T_EPS)

    color0 = jnp.zeros((npix, CHANNELS), jnp.float32)
    t0 = jnp.ones((npix, 1), jnp.float32)
    c_final, color, _ = jax.lax.while_loop(cond, chunk_body, (first_chunk, color0, t0))

    # drain: on early exit (transmittance saturated) the next chunk's DMA is
    # already in flight -- wait it so semaphores are clean for the next tile
    @pl.when(c_final < last_chunk)
    def _():
        wait_fetch(c_final, c_final % 2)

    out_ref[:] = color.reshape(1, npix_all, CHANNELS)


@functools.partial(jax.jit,
                   static_argnames=("focal", "size", "interpret",
                                    "max_instances", "bf16_colors",
                                    "slots_per_gaussian"))
def rasterize_gaussians(xyz, colors, opacities, scales, rotations, cam_matrix,
                        focal: float = 12.0, size: int = 512,
                        interpret: bool = False,
                        max_instances: int | None = None,
                        bf16_colors: bool = False,
                        slots_per_gaussian: int | None = None) -> jnp.ndarray:
    """Full tiled gaussian rasterization -> (CHANNELS, size, size).

    Single scene (no batch); vmap/loop at a higher level. Matches the CUDA
    rasterizer's semantics (per-tile depth order, alpha threshold 1/255,
    transmittance early-out, black background).

    max_instances: optional static cap on materialized (gaussian, tile)
    instances -- a large prepass speedup when set well below the DUP * N slot
    budget. Exact as long as it exceeds the scene's valid instance count
    (``count_valid_instances``); beyond that, far gaussians of high tile ids
    are dropped (see _build_instances). None = exact for any scene.

    bf16_colors: store/gather/DMA the 32-channel colors in bfloat16 (the
    geometry stays f32). Halves the dominant color-gather traffic; the
    compositing matmul still accumulates in f32, so the output error is
    bf16-quantization of the inputs (~3e-3 relative) -- at the 8-bit video
    quantization floor downstream. Default off = bit-exact reference path.

    slots_per_gaussian: static cap on emitted tile slots per gaussian (of
    the DUP = 8 window). The instance-key sort scales with it, so capping at
    the scene's measured ``max_valid_slots_per_gaussian`` halves-or-better
    the sort with zero output change; below that, each oversized gaussian
    keeps its most-central slots (see _compact_slots). None = DUP = exact.
    """
    assert size % GTILE_H == 0 and size % GTILE_W == 0
    if bf16_colors:
        colors = colors.astype(jnp.bfloat16)
    comp = _project_components(xyz, scales, rotations, cam_matrix, focal, size)
    opac = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
    geo, cols, offsets = _build_instances(comp, opac, colors, size,
                                          max_instances,
                                          slot_cap=slots_per_gaussian or DUP)
    tiles_x = size // GTILE_W
    tiles_y = size // GTILE_H
    num_tiles = tiles_x * tiles_y

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # geo (8, P) stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),   # cols (32, P)
        ],
        out_specs=pl.BlockSpec(
            (1, GTILE_H * GTILE_W, CHANNELS),
            lambda i, *_: (i, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, GCHUNK), jnp.float32),
            pltpu.VMEM((2, CHANNELS, GCHUNK), cols.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_splat_kernel, tiles_x=tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, GTILE_H * GTILE_W, CHANNELS),
                                       jnp.float32),
        interpret=interpret,
    )(offsets, geo, cols)
    # (tiles, npix, ch) -> (ch, H, W)
    out = out.reshape(tiles_y, tiles_x, GTILE_H, GTILE_W, CHANNELS)
    return out.transpose(4, 0, 2, 1, 3).reshape(CHANNELS, size, size)


@functools.partial(jax.jit, static_argnames=("focal", "size"))
def count_valid_instances(xyz, opacities, scales, rotations, cam_matrix,
                          focal: float = 12.0, size: int = 512) -> jnp.ndarray:
    """Number of valid (gaussian, tile) instances the scene emits -- use to
    size ``rasterize_gaussians(max_instances=...)`` with margin. Runs only
    the cheap projection/duplication math (no sort, no gather)."""
    comp = _project_components(xyz, scales, rotations, cam_matrix, focal, size)
    opac = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
    _, _, valid = _slot_validity(comp["mx"], comp["my"], comp["radius"], opac,
                                 size)
    return jnp.sum(valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("focal", "size"))
def max_valid_slots_per_gaussian(xyz, opacities, scales, rotations, cam_matrix,
                                 focal: float = 12.0,
                                 size: int = 512) -> jnp.ndarray:
    """Alignment-independent upper bound on tile slots any one gaussian can
    validate -- use to size ``rasterize_gaussians(slots_per_gaussian=...)``
    exactly. Computed from the emission-clamped radii alone: a closed
    interval of length 2r intersects at most floor(2r/tile) + 2 tiles of the
    grid (both endpoints can sit on boundaries; the overlap test in
    _slot_validity is inclusive), clamped to the DUP window. A 5% radius
    margin keeps pose-driven depth changes from crossing a tile-count
    threshold between the calibration pose and a driven frame (measured
    total-count excursion is +0.18%; see avatar.py)."""
    comp = _project_components(xyz, scales, rotations, cam_matrix, focal, size)
    opac = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
    live = (opac > 0) & (comp["radius"] > 0) & comp["in_front"]
    r = comp["radius"] * 1.05
    rx = jnp.minimum(r, float(MAX_RX))
    ry = jnp.minimum(r, float(MAX_RY))
    cols = jnp.minimum(jnp.floor(2.0 * rx / GTILE_W) + 2, DUP_X)
    rows = jnp.minimum(jnp.floor(2.0 * ry / GTILE_H) + 2, DUP_Y)
    slots = jnp.where(live, (cols * rows).astype(jnp.int32), 0)
    return jnp.max(slots, initial=1)
