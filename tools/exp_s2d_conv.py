#!/usr/bin/env python
"""Experiment: space-to-depth rewrites of StyleUNet's low-channel 512^2 convs.

The SR network is layout/VPU-bound, not MXU-bound (CLAUDE.md): its hottest
convs run 16-32 channels at 512^2, wasting 4-8x of every 128-lane register
and MXU tile. The classic TPU cure is space-to-depth: a 3x3 conv on
(512^2, C) is exactly expressible on the (256^2, 4C) space-to-depth layout,
quadrupling the channel dim. Probes, for C in {16, 32}:

  direct        production 3x3 conv, NCHW
  direct_nhwc   same, NHWC
  s2d_4conv     4 parity outputs, each a 2x2 block conv on the s2d input
                (same FLOPs as direct, 4x the channels)
  s2d_3x3       one 3x3 block conv with structural zeros (4x FLOPs, one op)

All s2d variants are f32 parity-checked against direct (same math).

Run on the real TPU:  python tools/exp_s2d_conv.py

MEASURED (v5e, 2026-08-18) — REJECTED. Parity exact (9.5e-7). Per-op ms
(floor-bound microbench; compare relatively only):

            C=16 f32  bf16  | C=32 f32  bf16
  direct NCHW   1.89  1.80  |     2.19  2.16
  direct NHWC   1.57  1.54  |     1.86  2.38
  s2d_4conv     1.68  3.01  |     1.95  2.87
  s2d_3x3       1.74  2.18  |     2.18  2.27

s2d never beats direct NHWC and is badly worse at bf16 (the 2x2-strided
relayout + 4x-channel kernels defeat XLA's conv tiling instead of helping
it). Together with the XLA cost-analysis floor (~10 ms for 178 GFLOP +
4.7 GB/frame), this closes the layout avenue for StyleUNet SR: remaining
gains need architecture changes, not data layout.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from artalk_tpu.utils.timing import timed


def s2d(x):
    """(B, C, 2H, 2W) -> (B, 4C, H, W); channel c*4 + py*2 + px."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)


def d2s(y):
    """(B, 4C, H, W) -> (B, C, 2H, 2W); inverse of s2d with out channel
    o*4 + qy*2 + qx."""
    b, c4, h, w = y.shape
    c = c4 // 4
    y = y.reshape(b, c, 2, 2, h, w).transpose(0, 1, 4, 2, 5, 3)
    return y.reshape(b, c, h * 2, w * 2)


def build_parity_kernels(w):
    """w (O, C, 3, 3) -> {(qy, qx): (O, 4C, 2, 2)} block kernels.

    For output parity (qy, qx) at block (i, j): input row r = qy + dy - 1
    lands in block i + floor(r/2) at in-block parity r mod 2; with the
    2-block window starting at i-1 (qy=0) or i (qy=1), tap dy maps to
    (block tap b_y, parity p_y) below; same in x."""
    o, c, _, _ = w.shape

    def tap(q, d):
        r = q + d - 1
        start_block = -1 if q == 0 else 0   # first block the 2-window reads
        return r // 2 - start_block, r % 2

    kernels = {}
    for qy in range(2):
        for qx in range(2):
            wp = np.zeros((o, c, 2, 2, 2, 2), np.float32)  # (O,C,py,px,by,bx)
            for dy in range(3):
                by, py = tap(qy, dy)
                for dx in range(3):
                    bx, px = tap(qx, dx)
                    wp[:, :, py, px, by, bx] = np.asarray(w[:, :, dy, dx])
            # (O, C, py, px, by, bx) -> (O, C*4, 2, 2) matching s2d channels
            wp = wp.reshape(o, c * 4, 2, 2)
            kernels[(qy, qx)] = jnp.asarray(wp)
    return kernels


def build_block3_kernel(w):
    """w (O, C, 3, 3) -> (4O, 4C, 3, 3) block conv with structural zeros:
    one conv produces all four parities at once (block window i-1..i+1)."""
    o, c, _, _ = w.shape
    wb = np.zeros((o, 2, 2, c, 2, 2, 3, 3), np.float32)
    for qy in range(2):
        for qx in range(2):
            for dy in range(3):
                ry = qy + dy - 1
                by, py = (ry - (-2)) // 2, ry % 2  # window starts at block i-1
                for dx in range(3):
                    rx = qx + dx - 1
                    bx, px = (rx - (-2)) // 2, rx % 2
                    wb[:, qy, qx, :, py, px, by, bx] = np.asarray(w[:, :, dy, dx])
    return jnp.asarray(wb.reshape(o * 4, c * 4, 3, 3))


def main():
    rng = np.random.default_rng(0)
    size = 512
    print(f"device: {jax.devices()[0]}  {size}^2\n")
    for c in (16, 32):
        x = jnp.asarray(rng.standard_normal((1, c, size, size)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((c, c, 3, 3)) / (3 * np.sqrt(c)))
                        .astype(np.float32))

        def direct(w, x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        def direct_nhwc(w, x):
            y = jax.lax.conv_general_dilated(
                x.transpose(0, 2, 3, 1), w.transpose(2, 3, 1, 0), (1, 1),
                [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.transpose(0, 3, 1, 2)

        kp = build_parity_kernels(w)
        kb = build_block3_kernel(w)

        def s2d_4conv(kp, x):
            xs = s2d(x)
            outs = np.empty((2, 2), object)
            for (qy, qx), wq in kp.items():
                pad_y = (1, 0) if qy == 0 else (0, 1)
                pad_x = (1, 0) if qx == 0 else (0, 1)
                outs[qy][qx] = jax.lax.conv_general_dilated(
                    xs, wq, (1, 1), [pad_y, pad_x],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
            # stack parities into d2s channel order o*4 + qy*2 + qx
            y = jnp.stack([outs[0][0], outs[0][1], outs[1][0], outs[1][1]],
                          axis=2)  # (B, O, 4, H, W)
            b, o, _, h, wd = y.shape
            return d2s(y.reshape(b, o * 4, h, wd))

        def s2d_3x3(kb, x):
            y = jax.lax.conv_general_dilated(
                s2d(x), kb, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return d2s(y)

        ref = np.asarray(jax.jit(direct)(w, x))
        for name, fn, ww in (("s2d_4conv", s2d_4conv, kp),
                             ("s2d_3x3", s2d_3x3, kb),
                             ("direct_nhwc", direct_nhwc, w)):
            got = np.asarray(jax.jit(fn)(ww, x))
            print(f"  C={c} parity {name:<12s} max|d| = "
                  f"{np.max(np.abs(ref - got)):.3e}")

        for mode in ("f32", "bf16"):
            cast = (lambda a: a.astype(jnp.bfloat16)) if mode == "bf16" \
                else (lambda a: a)
            xx = cast(x)
            print(f"  --- C={c} {mode} ---")
            timed(f"  direct NCHW", jax.jit(
                lambda w, x: jnp.sum(direct(w, x))), cast(w), xx, iters=20)
            timed(f"  direct NHWC", jax.jit(
                lambda w, x: jnp.sum(direct_nhwc(w, x))), cast(w), xx, iters=20)
            timed(f"  s2d_4conv", jax.jit(
                lambda kp, x: jnp.sum(s2d_4conv(kp, x))),
                jax.tree.map(cast, kp), xx, iters=20)
            timed(f"  s2d_3x3", jax.jit(
                lambda kb, x: jnp.sum(s2d_3x3(kb, x))), cast(kb), xx, iters=20)
        print()


if __name__ == "__main__":
    main()
