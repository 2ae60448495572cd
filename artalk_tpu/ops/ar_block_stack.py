"""Weight-streaming fused AR block-stack kernel (Pallas TPU).

Runs one VAR scale level's new tokens through ALL transformer blocks in a
single ``pallas_call``, replacing ``BitwiseARModel._run_level``'s 12-block
``lax.scan`` (reference semantics: app/transformer.py:46-96 executed per
level by app/models.py:97-104).

Why: decode is latency/HBM-bound, not FLOP-bound. Each level multiplies
1-100 tokens against ~7.1M params/block; the XLA scan round-trips every
intermediate through HBM and leaves the 28 MB/block weight read poorly
overlapped, so a window costs ~7.9 ms against a ~1-2 ms weight-stream floor.
This kernel:

- streams block weights HBM->VMEM as uniform ``(d, TW)`` tiles on a
  ``(depth, num_tiles)`` grid -- Mosaic double-buffers the tile fetches, so
  the weight read overlaps compute instead of serializing with it;
- keeps the activation carry ``x`` and every intermediate (LN output, q/k/v,
  attention, FFN partials) resident in VMEM scratch across all blocks --
  zero HBM traffic for activations;
- computes attention against the level's KV-cache prefix in-kernel (two-part
  streaming softmax over [cached prefix | this level's keys], so the
  level-causal mask stays implicit, exactly like the XLA path).

Every matmul in a block decomposes into the same ``(rows, d) @ (d, TW)``
tile shape: qkv (3 column tiles of the fused projection), attention output
projection (1), fc1 (hidden/d column tiles), fc2 (row chunks, stored
transposed). The kernel is therefore a tile-stream loop with a static stage
plan and glue (LN/AdaLN, attention, residuals) attached to the stage
boundaries.

VMEM note: with f32 weights and TW=d the working set exceeds the ~16 MB
budget at the 100-token level, so f32 packs default to TW=d//2 and bf16
packs (the fast-mode pairing, ``cfg.bf16_ar``) to TW=d. Batch is supported
but scratch grows with B*tokens; callers should fall back to the XLA path
for large B (the engine only uses this for B<=2).

Numerics: all accumulation f32 (LN stats, softmax, matmul
``preferred_element_type``); f32 weights use HIGHEST matmul precision. The
fc2 contraction is split into row chunks, so f32 results differ from the
XLA path at rounding level -- this path is opt-in (``cfg.fused_ar``) and
parity-tested to atol, not bit-pinned.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tile_plan(d: int, hidden: int, tw: int):
    """Static per-grid-step stage plan: list of (kind, chunk_index)."""
    kw = d // tw
    plan = []
    for kind in ("q", "k", "v", "proj"):
        plan += [(kind, j) for j in range(kw)]
    for c in range(hidden // tw):
        plan += [("fc1", c), ("fc2", c)]
    return plan


# bias-pack row indices (rows of the (depth, 6 + hidden/d, d) bias array)
def _bias_rows(f: int):
    return {"q": 0, "k": 1, "v": 2, "proj": 3, "fc1": 4, "fc2": 4 + f,
            "scale": 5 + f}


def quantize_tiles(wtiles: jnp.ndarray, output_axis: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a stacked tile
    pack (depth, NT, A, B). ``output_axis[t]`` says which tile axis holds
    OUTPUT units for tile t (3 = stored columns for forward tiles, 2 =
    stored rows for transposed fc2 chunks); the scale is the absmax over
    the other (contraction) axis. Returns (int8 tiles, (depth, NT, TW) f32
    scales aligned with each tile's output units) -- requires square tiles
    (TW == d) so both axes map onto the same scale width.
    """
    depth, nt, a, b = wtiles.shape
    assert a == b, "int8 pack requires square tiles (tile_width == d)"
    amax_col = jnp.max(jnp.abs(wtiles), axis=2)          # per stored column
    amax_row = jnp.max(jnp.abs(wtiles), axis=3)          # per stored row
    sel = (output_axis == 3)[None, :, None]
    amax = jnp.where(sel, amax_col, amax_row)
    scales = jnp.maximum(amax, 1e-12) / 127.0
    div = jnp.where(sel[..., None],
                    scales[:, :, None, :], scales[:, :, :, None])
    q = jnp.clip(jnp.round(wtiles / div), -127, 127).astype(jnp.int8)
    return q, scales


def pack_block_weights(blocks, num_heads: int, dtype=jnp.float32,
                       tile_width: int | None = None) -> dict:
    """Pack stacked per-block params (the ``params["blocks"]`` pytree of
    BitwiseARModel) into the kernel's tile-stream layout.

    Returns ``{"wtiles": (depth, NT, d, TW) dtype, "biases": (depth, NB, d)
    f32}``; with ``dtype=jnp.int8`` (weight-only quantization, symmetric
    per-output-channel) an additional ``"scales": (depth, NT, d) f32`` the
    kernel folds into each tile's matmul result. fc2 row chunks are stored
    transposed so every tile has the same shape. The bias pack also carries
    the exp'd per-head attention scale (transformer.py:53-56) repeated
    across each head's lane group.
    """
    wq = blocks["q"]["w"]
    depth, d, _ = wq.shape
    hidden = blocks["fc1"]["w"].shape[2]
    if tile_width is None:
        # f32 at d=768 with TW=d overruns the ~16MB VMEM budget at the
        # 100-token level (weight tiles + caches + AdaLN blocks), so f32
        # defaults to half-width tiles; bf16/int8 fit at full width (int8
        # additionally requires TW == d for the scale layout).
        tile_width = d if (dtype in (jnp.bfloat16, jnp.int8) or d <= 512) \
            else d // 2
    tw = tile_width
    if d % tw or hidden % tw:
        raise ValueError(f"tile_width {tw} must divide d={d} and hidden={hidden}")

    def cols(w):
        return [w[:, :, j * tw:(j + 1) * tw] for j in range(w.shape[2] // tw)]

    tiles = cols(wq) + cols(blocks["k"]["w"]) + cols(blocks["v"]["w"]) \
        + cols(blocks["proj"]["w"])
    out_axis = [3] * len(tiles)
    fc1 = cols(blocks["fc1"]["w"])
    fc2 = [blocks["fc2"]["w"][:, c * tw:(c + 1) * tw, :].transpose(0, 2, 1)
           for c in range(hidden // tw)]
    for a, b in zip(fc1, fc2):
        tiles += [a, b]
        out_axis += [3, 2]
    wtiles = jnp.stack(tiles, axis=1)
    scales = None
    if dtype == jnp.int8:
        wtiles, scales = quantize_tiles(wtiles, jnp.asarray(out_axis))
    else:
        wtiles = wtiles.astype(dtype)

    f = hidden // d
    hd = d // num_heads
    scale = jnp.exp(jnp.minimum(blocks["scale_mul"], math.log(100.0)))
    scale_row = jnp.repeat(scale.reshape(depth, num_heads), hd, axis=1)
    rows = [blocks["q"]["b"], jnp.zeros_like(blocks["q"]["b"]),
            blocks["v"]["b"], blocks["proj"]["b"]]
    rows += [blocks["fc1"]["b"][:, c * d:(c + 1) * d] for c in range(f)]
    rows += [blocks["fc2"]["b"], scale_row]
    biases = jnp.stack([r.astype(jnp.float32) for r in rows], axis=1)
    pack = {"wtiles": wtiles, "biases": biases}
    if scales is not None:
        pack["scales"] = scales
    return pack


def _kernel(x_ref, ada_ref, w_ref, b_ref, sc_ref, kc_ref, vc_ref,
            feats_ref, kn_ref, vn_ref,
            x_s, xm_s, q_s, k_s, v_s, at_s, h1_s, ac_s, *,
            plan, depth: int, d: int, tw: int, num_heads: int, start: int,
            pn: int, pn_pad: int, batch: int, f: int, precision,
            quantized: bool):
    # grid = (batch tiles, depth, tiles); every ref below is already the
    # current batch tile's block, so the kernel body never sees bb.
    dblk = pl.program_id(1)
    t = pl.program_id(2)
    rows = batch * pn_pad
    hd = d // num_heads
    cache_len = kc_ref.shape[2]
    rowmap = _bias_rows(f)
    cdt = jnp.bfloat16 if quantized else w_ref.dtype

    def wmm(a, w, contract_rhs=0):
        """Weight-tile matmul; int8 tiles dequantize via the tile's
        per-output-channel scale row folded into the f32 result."""
        y = jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (contract_rhs,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if quantized:
            y = y * sc_ref[0, 0, 0]
        return y

    def mm(a, w, contract_rhs=0):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (contract_rhs,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def ada(i):  # i-th 6-way split of the AdaLN params: (rows, d) f32
        full = ada_ref[0].reshape(rows, 6 * d)
        return full[:, i * d:(i + 1) * d].astype(jnp.float32)

    def ln_mod(x, s, sh, eps=1e-6):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * (s + 1.0) + sh

    def l2n(v):  # F.normalize semantics: v / max(||v||, eps)
        n = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True))
        return v / jnp.maximum(n, 1e-12)

    @pl.when((dblk == 0) & (t == 0))
    def _init_x():
        x_s[...] = x_ref[...].reshape(rows, d).astype(jnp.float32)

    def attention():
        """Two-part streaming softmax over [cache prefix | level keys]."""
        ctx_valid = jax.lax.broadcasted_iota(
            jnp.int32, (pn_pad, cache_len), 1) < start
        new_valid = jax.lax.broadcasted_iota(
            jnp.int32, (pn_pad, pn_pad), 1) < pn
        for b in range(batch):
            rs = slice(b * pn_pad, (b + 1) * pn_pad)
            for h in range(num_heads):
                ls = slice(h * hd, (h + 1) * hd)
                qn = l2n(q_s[rs, ls]) * b_ref[0, rowmap["scale"], ls]
                kn = l2n(k_s[rs, ls])
                k_s[rs, ls] = kn
                kc = kc_ref[0, b, :, ls]
                vc = vc_ref[0, b, :, ls]
                l_ctx = jnp.where(ctx_valid, mm(qn, kc, contract_rhs=1),
                                  NEG_INF)
                l_new = jnp.where(new_valid, mm(qn, kn, contract_rhs=1),
                                  NEG_INF)
                m = jnp.maximum(jnp.max(l_ctx, axis=-1, keepdims=True),
                                jnp.max(l_new, axis=-1, keepdims=True))
                p_ctx = jnp.exp(l_ctx - m)
                p_new = jnp.exp(l_new - m)
                z = (jnp.sum(p_ctx, axis=-1, keepdims=True)
                     + jnp.sum(p_new, axis=-1, keepdims=True))
                out = mm(p_ctx, vc) + mm(p_new, v_s[rs, ls])
                at_s[rs, ls] = out / z
        kn_ref[0] = k_s[...].reshape(batch, pn_pad, d).astype(kn_ref.dtype)
        vn_ref[0] = v_s[...].reshape(batch, pn_pad, d).astype(vn_ref.dtype)

    for t_idx, (kind, j) in enumerate(plan):
        @pl.when(t == t_idx)
        def _stage(kind=kind, j=j):
            w = w_ref[0, 0]
            ls = slice(j * tw, (j + 1) * tw)
            if kind == "q":
                if j == 0:
                    xm_s[...] = ln_mod(x_s[...], ada(2), ada(4))
                q_s[:, ls] = wmm(xm_s[...], w) + b_ref[0, rowmap["q"], ls]
            elif kind == "k":
                k_s[:, ls] = wmm(xm_s[...], w)
            elif kind == "v":
                v_s[:, ls] = wmm(xm_s[...], w) + b_ref[0, rowmap["v"], ls]
                if (j + 1) * tw == d:       # last v tile -> attention glue
                    attention()
            elif kind == "proj":
                xm_s[:, ls] = wmm(at_s[...], w) + b_ref[0, rowmap["proj"], ls]
                if (j + 1) * tw == d:       # last proj tile -> residual + LN2
                    x = x_s[...] + xm_s[...] * ada(0)
                    x_s[...] = x
                    xm_s[...] = ln_mod(x, ada(3), ada(5))
                    ac_s[...] = jnp.zeros_like(ac_s)
            elif kind == "fc1":
                brow = rowmap["fc1"] + (j * tw) // d
                boff = (j * tw) % d
                h1_s[...] = jax.nn.gelu(
                    wmm(xm_s[...], w) + b_ref[0, brow, boff:boff + tw],
                    approximate=True)
            else:                            # fc2 row chunk (stored transposed)
                ac_s[...] += wmm(h1_s[...], w, contract_rhs=1)

    @pl.when(t == len(plan) - 1)
    def _finish_block():
        x_s[...] = x_s[...] + (ac_s[...] + b_ref[0, rowmap["fc2"]]) * ada(1)

    @pl.when((t == len(plan) - 1) & (dblk == depth - 1))
    def _emit():
        feats_ref[...] = x_s[...].reshape(batch, pn_pad, d).astype(
            feats_ref.dtype)


@functools.partial(jax.jit, static_argnames=("start", "num_heads",
                                             "interpret", "batch_tile"))
def ar_block_stack(x: jnp.ndarray, ada: jnp.ndarray, wtiles: jnp.ndarray,
                   biases: jnp.ndarray, k_cache: jnp.ndarray,
                   v_cache: jnp.ndarray, scales: jnp.ndarray | None = None,
                   *, start: int, num_heads: int,
                   interpret: bool = False, batch_tile: int | None = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run one level's tokens through the whole block stack.

    Args:
      x:        (B, pn, d) level tokens (pos/lvl/AdaLN inputs pre-applied).
      ada:      (depth, B, pn, 6d) per-block AdaLN params at these positions.
      wtiles:   (depth, NT, d, TW) packed weight tiles (pack_block_weights).
      biases:   (depth, NB, d) packed biases + attention scale rows.
      k_cache:  (depth, B, cache_len, d) merged-head key cache; rows
                [0, start) hold valid (already L2-normalized) prefix keys.
      v_cache:  (depth, B, cache_len, d) merged-head value cache.
      scales:   (depth, NT, d) f32 per-output-channel dequant scales --
                required iff ``wtiles`` is int8 (weight-only quantization;
                compute runs bf16, scales fold into the f32 tile results).
      start:    level token offset in the cache (prev_len + level offset).
      batch_tile: rows of B processed per batch-grid step. The activation
                scratch scales with ``batch_tile * pn_pad``, so large
                batches (the serving StreamPool) tile the batch as the
                OUTER grid dimension: weights re-stream once per tile
                (B/batch_tile times total), which is still far cheaper
                than the XLA scan's activation round-trips -- measured in
                tools/bench_streampool.py. None = single tile of the whole
                batch (the B<=2 engine paths).

    Returns (feats (B, pn, d) f32, k_new (depth, B, pn, d), v_new (depth,
    B, pn, d)) -- k_new is L2-normalized, both in the cache dtype; the
    caller appends them to the caches at ``start``.
    """
    depth, nt, d, tw = wtiles.shape
    b, pn, _ = x.shape
    f = biases.shape[1] - 6
    hidden = f * d
    plan = _tile_plan(d, hidden, tw)
    assert len(plan) == nt, (len(plan), nt)
    quantized = wtiles.dtype == jnp.int8
    assert quantized == (scales is not None), \
        "int8 wtiles require scales (and scales require int8 wtiles)"
    if scales is None:
        scales = jnp.ones((depth, nt, d), jnp.float32)  # never read
    # 4-D so the block's last two dims equal the array's (Mosaic block-shape
    # rule: second-minor must divide by 8 or equal the array dimension)
    scales4 = scales.reshape(depth, nt, 1, d)
    pn_pad = -(-pn // 16) * 16
    pad = pn_pad - pn
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        ada = jnp.pad(ada, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bt = b if batch_tile is None else min(batch_tile, b)
    bpad = (-b) % bt
    if bpad:  # pad B to a tile multiple; zero rows are numerically inert
        x = jnp.pad(x, ((0, bpad), (0, 0), (0, 0)))
        ada = jnp.pad(ada, ((0, 0), (0, bpad), (0, 0), (0, 0)))
        k_cache = jnp.pad(k_cache, ((0, 0), (0, bpad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, bpad), (0, 0), (0, 0)))
    nb = (b + bpad) // bt
    cache_len = k_cache.shape[2]
    cdt = wtiles.dtype
    odt = k_cache.dtype
    precision = (jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None)

    kernel = functools.partial(
        _kernel, plan=plan, depth=depth, d=d, tw=tw, num_heads=num_heads,
        start=start, pn=pn, pn_pad=pn_pad, batch=bt, f=f, precision=precision,
        quantized=quantized)
    rows = bt * pn_pad
    feats, k_new, v_new = pl.pallas_call(
        kernel,
        grid=(nb, depth, nt),
        in_specs=[
            pl.BlockSpec((bt, pn_pad, d), lambda bb, i, t: (bb, 0, 0)),
            pl.BlockSpec((1, bt, pn_pad, 6 * d),
                         lambda bb, i, t: (i, bb, 0, 0)),
            pl.BlockSpec((1, 1, d, tw), lambda bb, i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, biases.shape[1], d), lambda bb, i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda bb, i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, bt, cache_len, d), lambda bb, i, t: (i, bb, 0, 0)),
            pl.BlockSpec((1, bt, cache_len, d), lambda bb, i, t: (i, bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, pn_pad, d), lambda bb, i, t: (bb, 0, 0)),
            pl.BlockSpec((1, bt, pn_pad, d), lambda bb, i, t: (i, bb, 0, 0)),
            pl.BlockSpec((1, bt, pn_pad, d), lambda bb, i, t: (i, bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b + bpad, pn_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((depth, b + bpad, pn_pad, d), odt),
            jax.ShapeDtypeStruct((depth, b + bpad, pn_pad, d), odt),
        ],
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.float32)] * 6
        + [pltpu.VMEM((rows, tw), jnp.float32),
           pltpu.VMEM((rows, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, ada, wtiles, biases, scales4, k_cache, v_cache)
    return feats[:b, :pn], k_new[:, :b, :pn], v_new[:, :b, :pn]
