#!/usr/bin/env python
"""Experiment: split the gsplat instance-gather table so each piece stays
on-chip.

CLAUDE.md's gather rule: XLA gather speed is set by whether the TABLE stays
on-chip, not by row width. The budgeted instance gather reads a (40, n) f32
packed table (28.8 MB at n=180k -- way off-chip) or an (8, n) f32 geo +
(32, n) bf16 color pair (5.8 + 11.5 MB). This probes the same total gather
split into row chunks of r rows each (table chunk r*0.72 MB at f32), to find
the on-chip threshold and whether chunking beats one big gather.

Run on the real TPU:  python tools/exp_gather_split.py [--n 180255]

Round-3 results on the v5e (n=180255, budget=721408): splitting LOSES,
linearly in the number of gather ops -- each gather of 721k indices costs
~12.9 ms here regardless of whether its table is 28.8 MB or 1.4 MB:
  packed f32 40 rows: 1x40 13.9 | 5x8 53.9 | 10x4 102.3 ms
  colors bf16 32 rows: 1x32 12.9 | 2x16 23.2 | 4x8 43.6 | 8x4 83.5 ms
At this index count the gather is bound by per-row issue cost, not table
residency (the CLAUDE.md on-chip-table rule applies to ~1 MB tables with
~260k indices, not here). Verdict: keep the single packed gather in
ops/gsplat._build_instances; do not chunk.
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artalk_tpu.utils.timing import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=180255)
    ap.add_argument("--budget", type=int, default=721408)
    args = ap.parse_args()
    n, budget = args.n, args.budget
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, n, (budget,), dtype=np.int32))

    print(f"device: {jax.devices()[0]}  n={n} budget={budget}\n")

    def probe(rows, dtype, name):
        itemsize = jnp.dtype(dtype).itemsize
        table = jnp.asarray(
            rng.standard_normal((rows, n)).astype(np.float32)).astype(dtype)
        mb = rows * n * itemsize / 1e6
        for r in [rows, 16, 8, 4]:
            if r > rows or rows % r:
                continue

            def split_gather(table, src, r=r):
                outs = [table[i:i + r][:, src]
                        for i in range(0, table.shape[0], r)]
                return sum(jnp.sum(o[:2, ::97].astype(jnp.float32))
                           for o in outs)

            cm = r * n * itemsize / 1e6
            timed(f"  {name} ({mb:5.1f} MB) chunks of {r:2d} rows "
                  f"({cm:5.1f} MB each)",
                  jax.jit(split_gather), table, src, iters=10,
                  label_width=56)

    probe(40, jnp.float32, "packed f32 (exact path)")
    print()
    probe(32, jnp.bfloat16, "colors bf16 (fast path)")
    print()
    probe(8, jnp.float32, "geo f32")


if __name__ == "__main__":
    main()
