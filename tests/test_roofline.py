"""utils/roofline.py: the hand-computed Pallas kernel cost models feeding
bench.py's utilization keys (VERDICT r4 weak #3 — cost_analysis counts
custom-call interiors as zero flops, so these models must be self-checking
against the ops they describe)."""

import numpy as np

import jax.numpy as jnp

from artalk_tpu.ops.gsplat import DUP, GCHUNK, count_valid_instances
from artalk_tpu.ops.rasterizer import FACE_CHUNK, TILE_H, TILE_W, chunk_bboxes
from artalk_tpu.utils.roofline import (_VISIT_FLOPS, gsplat_kernel_cost,
                                       gsplat_tile_histogram, mesh_kernel_cost)


def _scene(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    opac = (rng.random((n, 1)) * 0.9 + 0.05).astype(np.float32)
    scales = (rng.random((n, 3)) * 0.004 + 0.001).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cam = np.array([[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 5000.0 / 512]],
                   np.float32)
    return xyz, opac, scales, q, cam


def test_gsplat_histogram_matches_instance_count():
    # At the exact settings (cap=DUP, no budget) the histogram must total
    # exactly the op's own valid-instance count.
    xyz, opac, scales, q, cam = _scene()
    hist = gsplat_tile_histogram(xyz, opac, scales, q, cam, focal=12.0,
                                 size=512, slot_cap=DUP, max_instances=None)
    count = int(count_valid_instances(
        jnp.asarray(xyz), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(q), jnp.asarray(cam), focal=12.0, size=512))
    assert hist.sum() == count
    assert hist.shape == (128,)  # 4 x 32 tiles at 512^2


def test_gsplat_budget_truncates_tile_major():
    xyz, opac, scales, q, cam = _scene()
    full = gsplat_tile_histogram(xyz, opac, scales, q, cam, focal=12.0,
                                 size=512, slot_cap=DUP, max_instances=None)
    budget = int(full.sum()) // 2
    cut = gsplat_tile_histogram(xyz, opac, scales, q, cam, focal=12.0,
                                size=512, slot_cap=DUP, max_instances=budget)
    rounded = max(GCHUNK, -(-budget // GCHUNK) * GCHUNK)
    assert cut.sum() == min(full.sum(), rounded)
    # truncation eats the END (high tile ids): prefixes are untouched
    nz = np.nonzero(full)[0]
    assert (cut[nz[0]:nz[0] + 1] == full[nz[0]:nz[0] + 1]).all()
    assert (cut <= full).all()


def test_gsplat_cost_is_visit_scaled():
    xyz, opac, scales, q, cam = _scene()
    hist = gsplat_tile_histogram(xyz, opac, scales, q, cam, focal=12.0,
                                 size=512, slot_cap=4, max_instances=None)
    cost = gsplat_kernel_cost(hist)
    visits = int(np.sum(-(-hist // GCHUNK)))
    assert cost["visits"] == visits
    assert cost["flops"] == visits * _VISIT_FLOPS
    assert _VISIT_FLOPS > 2 * 2048 * 128 * 32 * 4  # at least the MXU share


def test_mesh_cost_matches_bruteforce_overlaps():
    rng = np.random.default_rng(1)
    v = rng.normal(256, 80, (400, 3)).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) / 50 + 1
    faces = rng.integers(0, 400, (700, 3)).astype(np.int32)
    cost = mesh_kernel_cost(v, faces, 512, 512)

    padded = -(-700 // FACE_CHUNK) * FACE_CHUNK
    f = np.concatenate([faces, np.zeros((padded - 700, 3), np.int32)])
    bbox = np.asarray(chunk_bboxes(jnp.asarray(v), jnp.asarray(f),
                                   padded // FACE_CHUNK))
    visits = 0
    for c in range(bbox.shape[0]):
        for ty in range(512 // TILE_H):
            for tx in range(512 // TILE_W):
                x0, y0 = tx * TILE_W, ty * TILE_H
                if (bbox[c, 1] >= x0 and bbox[c, 0] <= x0 + TILE_W
                        and bbox[c, 3] >= y0 and bbox[c, 2] <= y0 + TILE_H):
                    visits += 1
    assert cost["visits"] == visits
    assert cost["flops"] > visits * TILE_H * TILE_W * FACE_CHUNK  # > 1 op/pair
