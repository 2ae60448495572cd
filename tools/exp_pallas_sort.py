#!/usr/bin/env python
"""Experiment: VMEM-resident Pallas bitonic sort vs lax.sort for the gsplat
instance keys (VERDICT r3 ask #1: replace the 2.3-3.0 ms lax.sort with an
on-chip sort; the radix/bucket family was measured-and-rejected in r2 --
XLA scatter 8.5 ms, one-hot-cumsum ranks 37 ms -- so the remaining candidate
is a fully VMEM-resident compare-exchange network, which wins only if
avoiding lax.sort's per-stage HBM round trips beats XLA's own fused
multi-substage passes).

The kernel sorts M = 2^m int32 keys laid out (M/128, 128), flattened index
i = row*128 + lane. Bitonic network: for k in 2,4,..,M; for j in k/2,..,1:
partner(i) = i XOR j via two pltpu.rolls (the non-wrapped side is always the
one selected), direction from bit k of i. All 210 substages (M=2^20) run on
one VMEM-resident array: zero HBM traffic between stages.

Why this can lose: lax.sort on TPU is already a bitonic network at the HBM
roofline, and it fuses all lane-local substages of each k-stage into one
pass; the VMEM-resident version pays 2 rolls + selects per substage at VPU
rate, and at 2^20 x i32 the working set (4 MB x ~3 live copies) presses the
16 MB VMEM limit.

Usage (real TPU): python tools/exp_pallas_sort.py [--log2 19 20] [--iters 20]
Correctness (any host): python tools/exp_pallas_sort.py --check

RESULT (v5e, 2026-08-19, r05) -- REJECTED:
  - m=19 (524k keys, default 16 MB scoped-vmem limit): ~15 min Mosaic
    compile, then VMEM OOM -- "Scoped allocation with size 17.68M and limit
    16.00M exceeded": the unrolled 190-substage network keeps ~9 live copies
    of the 2 MB array.
  - m=19 with vmem_limit raised to 100 MB (--vmem_mb 100): compiles and runs
    -- pallas bitonic 2.17 ms vs lax.sort 2.14 ms (20 pipelined iters). A
    measured TIE, XLA marginally ahead: the zero-HBM-traffic VMEM network
    buys nothing because lax.sort's fused multi-substage passes are already
    at the same roofline, and the raised scoped-vmem limit spills to HBM
    anyway once the live-copy footprint passes 16 MB.
  - Even a winning runtime cannot save it: TPU executables are compiled
    server-side and cannot be captured by the persistent compile cache
    (CLAUDE.md), so EVERY process restart would pay the ~15 min compile; the
    production scenes also need m=21 (1.44M keys at slot cap 8), where the
    live-copy footprint (~8 MB x 9) far exceeds any VMEM limit.
  The sort avenue (radix/counting in r02, bitonic here) is now closed with
  numbers; lax.sort (2.3-3.0 ms unstable) stays.
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _bitonic_kernel(x_ref, o_ref, *, m: int):
    n = 1 << m
    rows = n // LANES
    x = x_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx = row * LANES + lane
    k = 2
    while k <= n:
        asc = (idx & k) == 0 if k < n else jnp.full(idx.shape, True)
        j = k // 2
        while j >= 1:
            if j >= LANES:
                s, axis, sel = j // LANES, 0, row
            else:
                s, axis, sel = j, 1, lane
            dim = x.shape[axis]
            # pltpu.roll requires shift >= 0; dim - s == roll by -s (wrap
            # values are never selected)
            fwd = pltpu.roll(x, dim - s, axis)  # value at index i + j
            bwd = pltpu.roll(x, s, axis)        # value at index i - j
            lower = (sel & s) == 0
            partner = jnp.where(lower, fwd, bwd)
            take_min = lower == asc
            x = jnp.where(take_min, jnp.minimum(x, partner),
                          jnp.maximum(x, partner))
            j //= 2
        k *= 2
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("m", "interpret", "vmem_mb"))
def bitonic_sort(keys: jnp.ndarray, m: int, interpret: bool = False,
                 vmem_mb: int = 0):
    """Sort 2^m int32 keys ascending (keys must already be padded to 2^m).

    vmem_mb > 0 raises Mosaic's scoped-vmem limit: at the default 16 MB the
    m=19 kernel OOMs (the unrolled network holds ~9 live array copies)."""
    n = 1 << m
    assert keys.shape == (n,) and n % LANES == 0
    x = keys.reshape(n // LANES, LANES)
    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20)
    out = pl.pallas_call(
        functools.partial(_bitonic_kernel, m=m),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(x)
    return out.reshape(-1)


def check():
    rng = np.random.default_rng(0)
    for m in (10, 13):
        keys = rng.integers(-(2**31), 2**31 - 1, size=(1 << m), dtype=np.int32)
        got = np.asarray(bitonic_sort(jnp.asarray(keys), m=m, interpret=True))
        np.testing.assert_array_equal(got, np.sort(keys))
        print(f"m={m}: OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--log2", type=int, nargs="*", default=[19, 20])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--vmem_mb", type=int, default=0)
    args = ap.parse_args()
    if args.check:
        check()
        return

    from artalk_tpu.utils.timing import timed

    rng = np.random.default_rng(0)
    for m in args.log2:
        n = 1 << m
        keys = jnp.asarray(
            rng.integers(0, 2**30, size=(n,), dtype=np.int32))
        f_pallas = jax.jit(lambda ks, m=m: jnp.sum(
            bitonic_sort(ks, m=m, vmem_mb=args.vmem_mb)))
        f_xla = jax.jit(lambda ks: jnp.sum(jax.lax.sort(ks, is_stable=False)))
        a = float(jax.device_get(f_pallas(keys)))
        b = float(jax.device_get(f_xla(keys)))
        assert a == b, (a, b)
        t_p = timed(f"pallas bitonic 2^{m}", f_pallas, keys, iters=args.iters)
        t_x = timed(f"lax.sort       2^{m}", f_xla, keys, iters=args.iters)
        print(f"  -> {'PALLAS' if t_p < t_x else 'XLA'} wins "
              f"({t_p:.2f} vs {t_x:.2f} ms)\n")


if __name__ == "__main__":
    main()
