"""Experiment: is the per-frame gsplat prepass faster batched across frames?

The GAGA chunk scan re-runs the full prepass (projection, key build, 1.44M-key
sort, budgeted gather) per frame. This measures whether batching the prepass
for K frames into one vmapped dispatch (then scanning only the compositing
kernel) buys wall-clock on the real chip, and isolates the batched-vs-scanned
sort in a third probe. Informs round-3 verdict item #4 (gaga < 20 ms/frame).

    python tools/exp_batched_prepass.py [--n 180255] [--k 8]

Round-3 results on the v5e (n=180255, k=8, budget=721408) -- all three
restructures REJECTED:
  scanned prepass 8.08 ms/frame vs vmap-batched 49.9 ms/frame (6x WORSE:
    XLA's batched sort/gather layouts fall apart at (8, 1.44M));
  sort scanned 1.78 vs batched 1.65 ms/frame (within noise, not worth it);
  gather col-from-(40,n) 16.3 vs row-from-(n,40)+transpose 17.1 ms
    (layout-neutral on TPU);
  permute+gather 16.8 vs composed perm[src] 25.9 ms (double indirection
    LOSES; keep the explicit table permute).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import artalk_tpu.ops.gsplat as G  # noqa: E402


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def make_scene(n, k, rng):
    """Avatar-like scene: static gaussians, per-frame camera rotations."""
    xyz = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    scales = (rng.random((n, 3)).astype(np.float32) * 0.004 + 0.001)
    rots = rng.standard_normal((n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    opac = rng.random((n, 1)).astype(np.float32) * 0.8
    colors = rng.random((n, G.CHANNELS)).astype(np.float32)
    cams = []
    for f in range(k):
        a = 0.05 * f
        rot = np.array([[np.cos(a), 0, np.sin(a)],
                        [0, 1, 0],
                        [-np.sin(a), 0, np.cos(a)]], np.float32)
        cams.append(np.concatenate([rot, np.array([[0, 0, 9.765625]],
                                                  np.float32).T], axis=1))
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(opac), jnp.asarray(colors),
            jnp.asarray(np.stack(cams)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=180255)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args(argv)
    n, k = args.n, args.k
    focal, size = 12.0, 512
    budget = G.GCHUNK * ((4 * n + G.GCHUNK - 1) // G.GCHUNK)
    rng = np.random.default_rng(0)
    xyz, scales, rots, opac, colors, cams = make_scene(n, k, rng)
    print(f"device: {jax.devices()[0]}  n={n} k={k} budget={budget}")

    def prepass(cam):
        comp = G._project_components(xyz, scales, rots, cam, focal, size)
        op = jnp.where(comp["in_front"], opac[..., 0], 0.0)
        return G._build_instances(comp, op, colors, size, budget)

    # (a) current shape: scan of per-frame prepass (sum to keep outputs tiny)
    def scanned(cams):
        def body(c, cam):
            geo, cols, offs = prepass(cam)
            return c + jnp.sum(geo[:2]) + jnp.sum(offs), None

        c, _ = jax.lax.scan(body, jnp.float32(0), cams)
        return c

    # (b) batched: one vmapped prepass for all k frames
    def batched(cams):
        geo, cols, offs = jax.vmap(prepass)(cams)
        return jnp.sum(geo[:, :2]) + jnp.sum(offs)

    ms_a = timed(jax.jit(scanned), cams)
    print(f"scanned  prepass x{k}: {ms_a:8.2f} ms  ({ms_a / k:.2f}/frame)")
    ms_b = timed(jax.jit(batched), cams)
    print(f"batched  prepass x{k}: {ms_b:8.2f} ms  ({ms_b / k:.2f}/frame)")

    # (c) sort-only probe
    total = n * G.DUP
    padded = ((total + G.GCHUNK - 1) // G.GCHUNK) * G.GCHUNK
    keys = jnp.asarray(rng.integers(0, 2 ** 26, (k, padded), dtype=np.int32))

    def sort_scanned(keys):
        def body(c, row):
            return c + jax.lax.sort(row, is_stable=False)[0], None

        c, _ = jax.lax.scan(body, jnp.int32(0), keys)
        return c

    def sort_batched(keys):
        return jnp.sum(jax.lax.sort(keys, dimension=1, is_stable=False)[:, 0])

    ms_sa = timed(jax.jit(sort_scanned), keys)
    ms_sb = timed(jax.jit(sort_batched), keys)
    print(f"sort scanned x{k}: {ms_sa:8.2f} ms ({ms_sa / k:.2f}/frame)   "
          f"batched: {ms_sb:8.2f} ms ({ms_sb / k:.2f}/frame)")

    # (d) gather layout probe: column gather from (40, n) vs contiguous row
    # gather from the transposed (n, 40) table (+ transpose back)
    table = jnp.asarray(rng.standard_normal((40, n)).astype(np.float32))
    table_t = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))
    src = jnp.asarray(rng.integers(0, n, (budget,), dtype=np.int32))

    def g_cols(table, src):
        return jnp.sum(table[:, src][:2]) + jnp.sum(table[:, src][8:, ::97])

    def g_rows(table_t, src):
        d = table_t[src, :].T
        return jnp.sum(d[:2]) + jnp.sum(d[8:, ::97])

    ms_gc = timed(jax.jit(g_cols), table, src)
    ms_gr = timed(jax.jit(g_rows), table_t, src)
    print(f"gather col-from-(40,n): {ms_gc:8.2f} ms   "
          f"row-from-(n,40)+T: {ms_gr:8.2f} ms")

    # (e) composed-permute probe: permute (40,n) table then gather, vs gather
    # straight from the unpermuted table through perm[src]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def permute_then_gather(table, perm, src):
        t2 = table[:, perm]
        return jnp.sum(t2[:, src][:2]) + jnp.sum(t2[:, src][8:, ::97])

    def composed_gather(table, perm, src):
        d = table[:, perm[src]]
        return jnp.sum(d[:2]) + jnp.sum(d[8:, ::97])

    ms_p = timed(jax.jit(permute_then_gather), table, perm, src)
    ms_c = timed(jax.jit(composed_gather), table, perm, src)
    print(f"permute+gather: {ms_p:8.2f} ms   composed perm[src]: {ms_c:8.2f} ms")


if __name__ == "__main__":
    main()
