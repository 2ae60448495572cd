#!/usr/bin/env python
"""Experiment: does splitting the gsplat instance-gather table keep it on-chip?

CLAUDE.md's gather rule says XLA column-gather speed is set by whether the
TABLE stays on-chip. The budgeted instance gather (ops/gsplat.py
_build_instances) is the biggest prepass line (4.0 ms of 11.2 at the
profiler scene): it gathers P=720k columns from an f32 (8, N) geo table
(5.8 MB) plus a bf16 (32, N) color table (11.5 MB at N=180k). The color
table alone is within a whisker of the 16 MB VMEM budget, so the gather
may be spilling to an HBM-resident strategy.

Probes (N=180224 gaussians, P=720k instances, axis-1 gathers as in prod):

  geo8_f32       (8, N) f32 gather                      (5.8 MB table)
  col32_bf16     (32, N) bf16 gather — production       (11.5 MB)
  col2x16_bf16   two (16, N) bf16 gathers               (5.8 MB each)
  col4x8_bf16    four (8, N) bf16 gathers               (2.9 MB each)
  col32_rowmaj   (N, 32) bf16 row gather + transpose    (layout control)
  pack40_f32     (40, N) f32 single packed gather       (28.8 MB; the
                 pre-split-era layout, for the split=False path)
  fused48_i16    ONE (48, N) int16 gather: f32 geo rows bitcast to 2x
                 int16 rows + bf16 colors bitcast to int16, gathered
                 together, then sliced/bitcast back (bit-exact) — trades
                 the second index pass for a cheap post-slice

All split variants are parity-checked against col32_bf16.

Run on the real TPU:  python tools/exp_gather_split.py

MEASURED (v5e, 2026-08-18), standalone per-op ms at P=720k indices:

  geo8_f32       3.10   col32_bf16    3.07   col2x16_bf16  5.91
  col4x8_bf16   10.15   rowmaj+T      3.33   pack40_f32    3.19
  fused48_i16    3.98   geo8+col32 pair in one jit        5.19

Standalone story: cost is per INDEX PASS — row width and table size barely
matter (8-row 5.8 MB == 32-row 11.5 MB == 40-row 28.8 MB), splitting a
gather multiplies it, and the fused48 single gather beats the pair by 23%.

In-context story (whole rasterize_gaussians A/B on the bench scene, budget
4/gaussian): REJECTED — the production program overlaps the two split
gathers with everything else, and the fused int16 variant (gather + bitcast
/transpose recovery) is 3.7 ms/frame WORSE (8.39 -> 12.12 ms bf16 path).
The split two-gather layout stays; only the radius row-6 fold (one fewer
180k-index permute) was kept. Lesson: single-op gather microbenchmarks
mislead here exactly like the single-op conv ones (CLAUDE.md) — only
whole-program A/Bs count.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from artalk_tpu.utils.timing import timed


def main():
    rng = np.random.default_rng(0)
    n, p = 180224, 720896
    src = jnp.asarray(rng.integers(0, n, size=p, dtype=np.int32))
    geo = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    col = jnp.asarray(rng.standard_normal((32, n)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    col_row = col.T.copy()
    pack = jnp.concatenate([geo, col.astype(jnp.float32)], axis=0)
    print(f"device: {jax.devices()[0]}  N={n}  P={p}\n")

    def g(table, idx):
        return jnp.take(table, idx, axis=1)

    def col2x16(col, idx):
        return jnp.concatenate([g(col[:16], idx), g(col[16:], idx)], axis=0)

    def col4x8(col, idx):
        return jnp.concatenate([g(col[i * 8:(i + 1) * 8], idx)
                                for i in range(4)], axis=0)

    def rowmaj(col_row, idx):
        return jnp.take(col_row, idx, axis=0).T

    def fuse48(geo, col):
        g16 = jax.lax.bitcast_convert_type(geo, jnp.int16)   # (8, N, 2)
        g16 = g16.transpose(0, 2, 1).reshape(16, -1)          # (16, N)
        c16 = jax.lax.bitcast_convert_type(col, jnp.int16)    # (32, N)
        return jnp.concatenate([g16, c16], axis=0)            # (48, N)

    def fused48(fused, idx):
        out = jnp.take(fused, idx, axis=1)                    # (48, P)
        g16 = out[:16].reshape(8, 2, -1).transpose(0, 2, 1)   # (8, P, 2)
        geo_o = jax.lax.bitcast_convert_type(g16, jnp.float32)
        col_o = jax.lax.bitcast_convert_type(out[16:], jnp.bfloat16)
        return geo_o, col_o

    ref = np.asarray(jax.jit(g)(col, src))
    for name, fn, tab in (("col2x16", col2x16, col), ("col4x8", col4x8, col),
                          ("rowmaj", rowmaj, col_row)):
        got = np.asarray(jax.jit(fn)(tab, src))
        ok = np.array_equal(ref, got)
        print(f"  parity {name:<8s} {'OK' if ok else 'MISMATCH'}")
    fused = jax.jit(fuse48)(geo, col)
    geo_o, col_o = jax.jit(fused48)(fused, src)
    ok = (np.array_equal(np.asarray(jax.jit(g)(geo, src)), np.asarray(geo_o))
          and np.array_equal(ref, np.asarray(col_o)))
    print(f"  parity {'fused48':<8s} {'OK (bit-exact)' if ok else 'MISMATCH'}")
    print()

    s = lambda f: jax.jit(lambda t, i: jnp.sum(f(t, i).astype(jnp.float32)))
    timed("geo8_f32", s(g), geo, src, iters=20)
    timed("col32_bf16 (production)", s(g), col, src, iters=20)
    timed("col2x16_bf16", s(col2x16), col, src, iters=20)
    timed("col4x8_bf16", s(col4x8), col, src, iters=20)
    timed("col32_rowmaj+T", s(rowmaj), col_row, src, iters=20)
    timed("pack40_f32", s(g), pack, src, iters=20)
    sf = jax.jit(lambda t, i: sum(jnp.sum(o.astype(jnp.float32))
                                  for o in fused48(t, i)))
    timed("fused48_i16 (one gather)", sf, fused, src, iters=20)
    timed("geo8+col32 (production pair)",
          jax.jit(lambda geo, col, i: jnp.sum(g(geo, i))
                  + jnp.sum(g(col, i).astype(jnp.float32))),
          geo, col, src, iters=20)


if __name__ == "__main__":
    main()
