"""Weight-streaming fused encoder-stack kernel (Pallas TPU).

Runs one window's audio tokens through ALL wav2vec2 transformer layers in a
single ``pallas_call``, replacing ``Wav2VecEncoder.encode``'s 24-layer
``lax.scan`` on the streaming (batch-1) path. Reference semantics: the HF
stable-layer-norm wav2vec2 encoder layer the reference wraps
(app/modules/wav2vec.py:11-27; pre-LN attention + pre-LN FFN, erf GELU).

Why: at 199 tokens the 300M-param encoder is HBM-bound, not FLOP-bound --
each layer multiplies a (199, 1024) activation against ~12.6M params, and
the XLA scan round-trips every intermediate through HBM while the ~25
MB/layer (bf16) weight read serializes against compute. Same cure as the AR
decode kernel (ops/ar_block_stack.py):

- stream layer weights HBM->VMEM as uniform ``(d, TW)`` tiles on a
  ``(depth, num_tiles)`` grid (Mosaic double-buffers the tile fetches);
- keep the activation carry and every intermediate in VMEM scratch across
  all 24 layers -- zero HBM traffic for activations;
- compute full bidirectional softmax attention in-kernel (no cache, no
  mask beyond the sequence-length pad).

Every matmul decomposes into the same ``(rows, d) @ (d, TW)`` tile shape:
q/k/v (d/TW column tiles each), attention output projection, fc1
(hidden/TW column tiles), fc2 (row chunks, stored transposed).

VMEM: at d=1024 the B=1 working set (~7 (208, 1024) f32 scratch arrays +
one double-buffered weight tile) is ~11 MB; B=2 overruns the ~16 MB budget,
so callers gate on batch 1 in a single call. The batched offline encode
``lax.map``s the batch-1 kernel over windows instead -- measured FASTER
than the weight-amortizing XLA scan despite re-streaming the weights per
window (b=8 stack: scan bf16 12.3 ms vs map int8 9.9 / map bf16 10.5;
tools/exp_encoder_batched_fused.py), because the mapped kernels keep
activations in VMEM and pipeline back-to-back.

Numerics: accumulation f32 (LN stats, softmax, matmul
``preferred_element_type``); f32 weights use HIGHEST matmul precision and
half-width tiles. The fc2 contraction is chunked, so results differ from
the XLA path at rounding level -- this path is opt-in (``cfg.fused_ar``)
and parity-tested to atol, not bit-pinned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _gelu_erf(x):
    """Exact-GELU via the Abramowitz-Stegun 7.1.26 erf approximation
    (max |erf err| ~1.5e-7, i.e. ~1e-6 absolute in the GELU at these
    activation ranges). Mosaic has no erf/erfc lowering, so
    ``jax.nn.gelu(approximate=False)`` cannot be used in-kernel; tanh-GELU
    would differ from the XLA erf path by ~1e-3."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x) * (2.0 ** -0.5)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    erf_ax = 1.0 - poly * jnp.exp(-ax * ax)
    erf = jnp.where(x >= 0, erf_ax, -erf_ax)
    return 0.5 * x * (1.0 + erf)


def _tile_plan(d: int, hidden: int, tw: int):
    """Static per-grid-step stage plan: list of (kind, chunk_index)."""
    kw = d // tw
    plan = []
    for kind in ("q", "k", "v", "out"):
        plan += [(kind, j) for j in range(kw)]
    for c in range(hidden // tw):
        plan += [("fc1", c), ("fc2", c)]
    return plan


def _bias_rows(f: int):
    return {"q": 0, "k": 1, "v": 2, "out": 3, "fc1": 4, "fc2": 4 + f,
            "ln1s": 5 + f, "ln1b": 6 + f, "ln2s": 7 + f, "ln2b": 8 + f}


def pack_encoder_weights(layers, dtype=jnp.float32,
                         tile_width: int | None = None) -> dict:
    """Pack stacked per-layer params (``params["encoder"]["layers"]`` of
    Wav2VecEncoder) into the kernel's tile-stream layout.

    Returns ``{"wtiles": (depth, NT, d, TW) dtype, "biases": (depth, NB, d)
    f32}``; with ``dtype=jnp.int8`` (weight-only quantization, symmetric
    per-output-channel) an additional ``"scales": (depth, NT, d) f32`` the
    kernel folds into each tile's matmul result. fc2 row chunks are stored
    transposed so every tile has the same shape; biases also carry the two
    LayerNorms' scale/bias rows (norms stay f32 regardless of the weight
    dtype).
    """
    wq = layers["q"]["w"]
    depth, d, _ = wq.shape
    hidden = layers["fc1"]["w"].shape[2]
    if tile_width is None:
        # same rule as the AR pack: f32 full-width tiles overrun the ~16MB
        # VMEM budget at d=1024, so f32 defaults to half width; bf16/int8
        # fit (int8 additionally requires TW == d for the scale layout).
        tile_width = d if (dtype in (jnp.bfloat16, jnp.int8) or d <= 512) \
            else d // 2
    tw = tile_width
    if d % tw or hidden % tw:
        raise ValueError(f"tile_width {tw} must divide d={d} and hidden={hidden}")

    def cols(w):
        return [w[:, :, j * tw:(j + 1) * tw] for j in range(w.shape[2] // tw)]

    tiles = cols(wq) + cols(layers["k"]["w"]) + cols(layers["v"]["w"]) \
        + cols(layers["out"]["w"])
    out_axis = [3] * len(tiles)
    fc1 = cols(layers["fc1"]["w"])
    fc2 = [layers["fc2"]["w"][:, c * tw:(c + 1) * tw, :].transpose(0, 2, 1)
           for c in range(hidden // tw)]
    for a, b in zip(fc1, fc2):
        tiles += [a, b]
        out_axis += [3, 2]
    wtiles = jnp.stack(tiles, axis=1)
    scales = None
    if dtype == jnp.int8:
        from .ar_block_stack import quantize_tiles

        wtiles, scales = quantize_tiles(wtiles, jnp.asarray(out_axis))
    else:
        wtiles = wtiles.astype(dtype)

    f = hidden // d
    rows = [layers["q"]["b"], layers["k"]["b"], layers["v"]["b"],
            layers["out"]["b"]]
    rows += [layers["fc1"]["b"][:, c * d:(c + 1) * d] for c in range(f)]
    rows += [layers["fc2"]["b"],
             layers["norm1"]["scale"], layers["norm1"]["bias"],
             layers["norm2"]["scale"], layers["norm2"]["bias"]]
    biases = jnp.stack([r.astype(jnp.float32) for r in rows], axis=1)
    pack = {"wtiles": wtiles, "biases": biases}
    if scales is not None:
        pack["scales"] = scales
    return pack


def pack_batched_ok(pack) -> bool:
    """Routing rule, stated once: may this pack be ``lax.map``-ed over a
    batch of windows (the offline batched-windows encode)?

    bf16/int8 packs stream full-width tiles and measured FASTER mapped
    per-window than the weight-amortizing XLA scan
    (tools/exp_encoder_batched_fused.py); f32 packs use half-width
    HIGHEST-precision tiles -- a parity artifact, not a perf path -- so
    callers must keep the XLA scan at batch > 1. Keyed off the tile dtype
    because that is exactly what forces the half-width layout; a future
    f32-but-full-width pack should flip this rule explicitly here.
    """
    return pack["wtiles"].dtype != jnp.float32


def fused_batch_size(pack) -> int:
    """Windows per kernel call for the batched offline encode.

    In principle each extra window shares ONE weight stream where the
    lax.map-per-window path re-reads all ~600 MB (bf16) of layer weights
    per window. MEASURED (v5e, r05, tools/exp_encoder_group_batch.py):
    B=2 grouped is a ~3x REGRESSION over the per-window map (full __call__
    14.5 -> 46.9 ms bf16 / 14.1 -> 47.0 int8 with slim bf16 scratch) --
    see the tool header for the variable isolation. Until a grouped config
    measures a win, everything maps per window.
    """
    return 1


def _kernel(x_ref, w_ref, b_ref, sc_ref, y_ref,
            x_s, xm_s, q_s, k_s, v_s, at_s, h1_s, ac_s, *,
            plan, depth: int, d: int, tw: int, num_heads: int, pn: int,
            pn_pad: int, batch: int, f: int, eps: float, precision,
            quantized: bool):
    # q/k/v/at/h1 scratch may be bf16 (see encoder_block_stack): every read
    # feeds a matmul that casts to the compute dtype anyway, so storing in
    # it is bit-identical while halving those buffers -- that VMEM headroom
    # is what lets B>1 windows share one weight stream.
    t = pl.program_id(1)
    rows = batch * pn_pad
    hd = d // num_heads
    rowmap = _bias_rows(f)
    cdt = jnp.bfloat16 if quantized else w_ref.dtype
    scale = hd ** -0.5

    def mm(a, w, contract_rhs=0):
        return jax.lax.dot_general(
            a.astype(cdt), w.astype(cdt), (((1,), (contract_rhs,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def wmm(a, w, contract_rhs=0):
        """Weight-tile matmul; int8 tiles dequantize via the tile's
        per-output-channel scale row folded into the f32 result."""
        y = mm(a, w, contract_rhs)
        if quantized:
            y = y * sc_ref[0, 0, 0]
        return y

    def ln(x, srow, brow):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + eps)
                * b_ref[0, srow] + b_ref[0, brow])

    @pl.when((pl.program_id(0) == 0) & (t == 0))
    def _init_x():
        x_s[...] = x_ref[...].reshape(rows, d).astype(jnp.float32)

    def attention():
        """Full bidirectional softmax attention; pad columns masked."""
        valid = jax.lax.broadcasted_iota(
            jnp.int32, (pn_pad, pn_pad), 1) < pn
        for b in range(batch):
            rs = slice(b * pn_pad, (b + 1) * pn_pad)
            for h in range(num_heads):
                ls = slice(h * hd, (h + 1) * hd)
                logits = mm(q_s[rs, ls], k_s[rs, ls], contract_rhs=1) * scale
                logits = jnp.where(valid, logits, NEG_INF)
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                z = jnp.sum(p, axis=-1, keepdims=True)
                at_s[rs, ls] = (mm(p, v_s[rs, ls]) / z).astype(at_s.dtype)

    for t_idx, (kind, j) in enumerate(plan):
        @pl.when(t == t_idx)
        def _stage(kind=kind, j=j):
            w = w_ref[0, 0]
            ls = slice(j * tw, (j + 1) * tw)
            if kind == "q":
                if j == 0:
                    xm_s[...] = ln(x_s[...], rowmap["ln1s"], rowmap["ln1b"])
                q_s[:, ls] = (wmm(xm_s[...], w)
                              + b_ref[0, rowmap["q"], ls]).astype(q_s.dtype)
            elif kind == "k":
                k_s[:, ls] = (wmm(xm_s[...], w)
                              + b_ref[0, rowmap["k"], ls]).astype(k_s.dtype)
            elif kind == "v":
                v_s[:, ls] = (wmm(xm_s[...], w)
                              + b_ref[0, rowmap["v"], ls]).astype(v_s.dtype)
                if (j + 1) * tw == d:       # last v tile -> attention glue
                    attention()
            elif kind == "out":
                xm_s[:, ls] = wmm(at_s[...], w) + b_ref[0, rowmap["out"], ls]
                if (j + 1) * tw == d:       # last out tile -> residual + LN2
                    x = x_s[...] + xm_s[...]
                    x_s[...] = x
                    xm_s[...] = ln(x, rowmap["ln2s"], rowmap["ln2b"])
                    ac_s[...] = jnp.zeros_like(ac_s)
            elif kind == "fc1":
                brow = rowmap["fc1"] + (j * tw) // d
                boff = (j * tw) % d
                h1_s[...] = _gelu_erf(
                    wmm(xm_s[...], w)
                    + b_ref[0, brow, boff:boff + tw]).astype(h1_s.dtype)
            else:                            # fc2 row chunk (stored transposed)
                ac_s[...] += wmm(h1_s[...], w, contract_rhs=1)

    @pl.when(t == len(plan) - 1)
    def _finish_layer():
        x_s[...] = x_s[...] + ac_s[...] + b_ref[0, rowmap["fc2"]]

    @pl.when((t == len(plan) - 1) & (pl.program_id(0) == depth - 1))
    def _emit():
        y_ref[...] = x_s[...].reshape(batch, pn_pad, d).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret",
                                             "slim_scratch"))
def encoder_block_stack(x: jnp.ndarray, wtiles: jnp.ndarray,
                        biases: jnp.ndarray,
                        scales: jnp.ndarray | None = None, *, num_heads: int,
                        eps: float = 1e-5, interpret: bool = False,
                        slim_scratch: bool | None = None) -> jnp.ndarray:
    """Run (B, T, d) tokens through the whole pre-LN encoder stack.

    Input is the post-(projection + positional-conv) hidden state; the final
    LayerNorm after the stack stays with the caller. ``scales`` is required
    iff ``wtiles`` is int8 (weight-only quantization; compute runs bf16,
    per-output-channel scales fold into the f32 tile results). Returns
    (B, T, d) f32.
    """
    depth, nt, d, tw = wtiles.shape
    b, pn, _ = x.shape
    f = biases.shape[1] - 9
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
    cdt = wtiles.dtype
    precision = (jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None)

    kernel = functools.partial(
        _kernel, plan=plan, depth=depth, d=d, tw=tw, num_heads=num_heads,
        pn=pn, pn_pad=pn_pad, batch=b, f=f, eps=eps, precision=precision,
        quantized=quantized)
    rows = b * pn_pad
    # matmul-feeder scratch (q/k/v/at/h1) may live in the compute dtype:
    # every read is cast there at the matmul anyway, so this is value-
    # identical and shrinks the B>1 working set -- but each store pays a
    # Mosaic f32->bf16 retiling, so it is OFF unless the batch needs the
    # room (slim_scratch=None -> auto: only when b > 1 on a bf16/int8 pack)
    if slim_scratch is None:
        slim_scratch = b > 1 and cdt != jnp.float32
    slim = jnp.bfloat16 if (slim_scratch and cdt != jnp.float32) \
        else jnp.float32
    scratch = [
        pltpu.VMEM((rows, d), jnp.float32),   # x_s  (residual carry)
        pltpu.VMEM((rows, d), jnp.float32),   # xm_s (LN out / attn-out acc)
        pltpu.VMEM((rows, d), slim),          # q_s
        pltpu.VMEM((rows, d), slim),          # k_s
        pltpu.VMEM((rows, d), slim),          # v_s
        pltpu.VMEM((rows, d), slim),          # at_s
        pltpu.VMEM((rows, tw), slim),         # h1_s
        pltpu.VMEM((rows, d), jnp.float32),   # ac_s (fc2 accumulator)
    ]
    slim_b = 2 if slim == jnp.bfloat16 else 4
    vmem_bytes = (rows * d * (3 * 4 + 4 * slim_b) + rows * tw * slim_b
                  + 2 * d * tw * wtiles.dtype.itemsize      # 2 tile buffers
                  + 2 * b * pn_pad * d * 4                  # x block + y
                  + biases.shape[1] * d * 4 + d * 4)
    y = pl.pallas_call(
        kernel,
        grid=(depth, nt),
        in_specs=[
            pl.BlockSpec((b, pn_pad, d), lambda i, t: (0, 0, 0)),
            pl.BlockSpec((1, 1, d, tw), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, biases.shape[1], d), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda i, t: (i, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, pn_pad, d), lambda i, t: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, pn_pad, d), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=max(int(vmem_bytes * 1.15) + (1 << 21),
                                 16 << 20)),
        interpret=interpret,
    )(x, wtiles, biases, scales4)
    return y[:, :pn]
