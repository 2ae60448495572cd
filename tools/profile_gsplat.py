#!/usr/bin/env python
"""Stage-level device timing of the gaussian-splat prepass + kernel.

Times cumulative prefixes of the ops/gsplat.py pipeline (each a separate jit,
scalar-reduced, pipelined over ~20 async dispatches per CLAUDE.md tunnel
rules); consecutive differences localize the cost of each stage:

    S0 projection (+ slot validity)
    S1 + depth argsort + packed-table permute
    S2 + 1.44M-key lax.sort + searchsorted offsets
    S3 + budgeted per-instance gather
    S4 full rasterize_gaussians (adds the Pallas compositing kernel)

Run on the real TPU:  python tools/profile_gsplat.py [--iters 20]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artalk_tpu.ops import gsplat as G
from artalk_tpu.utils.timing import timed as _timed


def timed(name, fn, *args, iters=20):
    return _timed(name, fn, *args, iters=iters, label_width=52)


def make_scene(rng, n_extra):
    """GAGAvatar-shaped workload: 5023 head gaussians + dense plane sheets."""
    n = 5023 + n_extra
    xyz = rng.normal(0, 0.12, (n, 3)).astype(np.float32)
    xyz[:, 2] += 0.15
    colors = rng.uniform(0, 1, (n, G.CHANNELS)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)
    scales = np.exp(rng.normal(-5.2, 0.3, (n, 3))).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cam = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1.0]], np.float32)
    return tuple(jnp.asarray(a) for a in (xyz, colors, opac, scales, q, cam))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--slot-cap", type=int, default=0,
                    help="slots_per_gaussian (0 = measured exact bound)")
    args = ap.parse_args()
    it = args.iters
    size = args.size
    focal = 12.0

    rng = np.random.default_rng(0)
    xyz, colors, opac, scales, rots, cam = make_scene(rng, 2 * 296 * 296)
    n = xyz.shape[0]
    budget = G.GCHUNK * ((4 * n + G.GCHUNK - 1) // G.GCHUNK)
    cap = args.slot_cap or int(G.max_valid_slots_per_gaussian(
        xyz, opac, scales, rots, cam, focal=focal, size=size))
    print(f"device: {jax.devices()[0]}  n={n}  instance budget={budget}  "
          f"slot cap={cap}\n")

    def s0(xyz, scales, rots, opacities):
        comp = G._project_components(xyz, scales, rots, cam, focal, size)
        op = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
        tx, ty, valid = G._slot_validity(comp["mx"], comp["my"],
                                         comp["radius"], op, size)
        return (sum(jnp.sum(v) for v in comp.values())
                + jnp.sum(tx) + jnp.sum(ty) + jnp.sum(valid))

    def _through_keys(xyz, scales, rots, opacities, stop):
        """Re-trace of _build_instances up to `stop` (kept in sync by the
        S3-vs-production sanity line the tool prints at the end)."""
        comp = G._project_components(xyz, scales, rots, cam, focal, size)
        op = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
        tiles_x = size // G.GTILE_W
        num_tiles = (size // G.GTILE_H) * tiles_x
        rank_bits = max((n - 1).bit_length(), 1)
        perm = jnp.argsort(comp["depth"])
        zeros = jnp.zeros((n,), colors.dtype)
        table = jnp.concatenate([
            jnp.stack([comp["mx"], comp["my"], comp["ca"], comp["cb"],
                       comp["cc"], op, comp["radius"], zeros]),
            colors.T,
        ], axis=0)[:, perm]
        if stop == "table":
            return jnp.sum(table)
        tx, ty, valid = G._slot_validity(table[0], table[1], table[6],
                                         table[5], size)
        tile_id = jnp.where(valid, (ty * tiles_x + tx).astype(jnp.int32),
                            num_tiles)
        tile_id = G._compact_slots(tile_id, tx, ty, table[0], table[1],
                                   num_tiles, cap)
        rank = jax.lax.broadcasted_iota(jnp.int32, (tile_id.shape[0], n), 1)
        key = (tile_id << rank_bits) | rank
        total = n * tile_id.shape[0]
        padded = ((total + G.GCHUNK - 1) // G.GCHUNK) * G.GCHUNK
        key = jnp.pad(key.reshape(-1), (0, padded - total),
                      constant_values=jnp.iinfo(jnp.int32).max)
        sorted_key = jax.lax.sort(key, is_stable=False)  # match production
        sorted_key = sorted_key[:min(padded, budget)]
        offsets = jnp.searchsorted(
            sorted_key,
            (jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits)
        ).astype(jnp.int32)
        if stop == "sort":
            return jnp.sum(offsets) + jnp.sum(sorted_key)
        src = sorted_key & ((1 << rank_bits) - 1)
        src = src.reshape(-1, G.GGROUPS, G.GMEMBERS).swapaxes(1, 2).reshape(-1)
        data = table[:, src]
        return jnp.sum(data) + jnp.sum(offsets)

    t0 = timed("S0 projection + slot validity", jax.jit(s0),
               xyz, scales, rots, opac, iters=it)
    t1 = timed("S1 + depth argsort + table permute",
               jax.jit(lambda *a: _through_keys(*a, stop="table")),
               xyz, scales, rots, opac, iters=it)
    t2 = timed("S2 + instance-key sort + offsets",
               jax.jit(lambda *a: _through_keys(*a, stop="sort")),
               xyz, scales, rots, opac, iters=it)
    t3 = timed("S3 + budgeted instance gather",
               jax.jit(lambda *a: _through_keys(*a, stop="gather")),
               xyz, scales, rots, opac, iters=it)
    t4 = timed("S4 full rasterize (adds Pallas kernel)",
               jax.jit(lambda x, s, r, o: jnp.sum(G.rasterize_gaussians(
                   x, colors, o, s, r, cam, focal=focal, size=size,
                   max_instances=budget, slots_per_gaussian=cap))),
               xyz, scales, rots, opac, iters=it)

    print("\n--- per-stage deltas ---")
    for name, d in [("projection/validity", t0),
                    ("argsort + table permute", t1 - t0),
                    ("key sort + offsets", t2 - t1),
                    ("instance gather", t3 - t2),
                    ("compositing kernel", t4 - t3)]:
        print(f"{name:<52s} {d:9.2f} ms")

    # sanity: the hand-copied S3 re-trace must reproduce production
    # _build_instances exactly, or the stage numbers above are fiction
    def s3_production(xyz, scales, rots, opacities):
        comp = G._project_components(xyz, scales, rots, cam, focal, size)
        op = jnp.where(comp["in_front"], opacities[..., 0], 0.0)
        geo, cols, offsets = G._build_instances(comp, op, colors, size,
                                                max_instances=budget,
                                                slot_cap=cap)
        return jnp.sum(geo) + jnp.sum(cols) + jnp.sum(offsets)

    retraced = float(jax.device_get(
        jax.jit(lambda *a: _through_keys(*a, stop="gather"))(
            xyz, scales, rots, opac)))
    production = float(jax.device_get(jax.jit(s3_production)(
        xyz, scales, rots, opac)))
    rel = abs(retraced - production) / max(abs(production), 1e-9)
    status = "OK" if rel < 1e-5 else "DRIFT -- fix _through_keys"
    print(f"\nS3 sanity vs production _build_instances: {status} "
          f"(re-trace {retraced:.8g} vs production {production:.8g})")


if __name__ == "__main__":
    main()
