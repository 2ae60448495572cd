#!/usr/bin/env python
"""Benchmark: the BASELINE.md headline metrics on one chip, ONE JSON line.

Sections (all on-device, tunnel-RTT-corrected: every measurement enqueues a
pipeline of async dispatches and fetches only the last result, so the ~27 ms
host<->TPU round trip is amortized out — see CLAUDE.md):

- ``motion_frames_per_sec`` (headline): full speech->motion path (wav2vec2-300M
  audio encode -> KV-cached multi-scale AR decode -> BITWISE_VAE decode) over
  an 8-window (32 s) clip. Device throughput, pipelined + scalar-reduced like
  every other section; the single-dispatch number (one full motion-track
  fetch + tunnel RTT included) is reported separately as
  ``clip_e2e_latency_ms``. Baseline = 500 frames/s/chip (>10x real-time).
- ``stream_p50_ms``: true streaming latency — median per-step device time of
  ``BitwiseARModel.window_step`` (the ``engine.stream()`` step) with a donated
  carry. BASELINE.md target: p50 < 200 ms per window.
- ``mesh_ms_per_frame``: Phong mesh render (ops/rasterizer.py) per 512^2 frame.
- ``gsplat_ms_per_frame``: 32-channel gaussian splat (ops/gsplat.py) per 512^2
  frame at the GAGAvatar workload size (5023 + 2*296^2 = 180 255 gaussians).
- ``batched6_frames_per_sec``: BASELINE config #2 — 6 clips decoded in one
  batch (device throughput, scalar-reduced so the dev-tunnel fetch of 6
  motion tracks does not masquerade as compute time).
- ``gaga_ms_per_frame``: BASELINE config #5 — full GAGAvatar device frame on
  the production 25-frame chunk path (FLAME re-pose + EMA + 180k-gaussian
  splat + StyleUNet SR + watermark + yuv420 pack), synthetic avatar/weights
  under the PRODUCTION selector (escalated exact budget + measured
  per-gaussian slot cap — no dropped splats on ANY scene, including this
  pessimal one). Headline since r05 (ADVICE r04): what-you-render-is-what-
  you-time; the utilization keys are measured on this same run.
- ``gaga_b4cap4_ms_per_frame``: the same frame FORCED to the 4 instances/
  gaussian budget bucket + slot cap 4 — the historical r02-r04 headline,
  kept for cross-round comparability. Documented-lossy on this saturating
  random-init scene (trained avatars fit that budget with 2.3x margin).
- ``gaga_trained_ms_per_frame``: the same frame at the budget bucket the
  per-avatar auto-budgeter selects for trained checkpoints (measured ~1.7
  valid instances/gaussian, slot cap 4).
- ``motion_fast_frames_per_sec``: the headline path in the opt-in bf16 mode
  (ARTALK_AR_PRECISION=fast: bf16 audio encoder + bf16 AR blocks; changes
  code bits, see README).
- ``motion_fused_frames_per_sec``: fast mode + the fused weight-streaming
  Pallas decode kernel (ARTALK_AR_FUSED=1, ops/ar_block_stack.py) — one
  pallas_call per scale level instead of the 12-block XLA scan.
- ``motion_fusedx_frames_per_sec``: the fused kernel at f32 (exact-precision
  pairing, half-width weight tiles).
- ``stream_fused_p50_ms``: the streaming window step in the production fused
  bf16 mode -- both weight-streaming kernels engaged (batch-1 encoder,
  ops/encoder_block_stack.py, + decode, ops/ar_block_stack.py).
- ``motion_int8_frames_per_sec`` / ``stream_int8_p50_ms``: weight-only int8
  quantized fused kernels (ARTALK_AR_PRECISION=int8; per-output-channel
  symmetric scales, bf16 compute).

Spread keys: the tunnel-noisy single-shot sections (stream*, mesh, gsplat,
gaga) repeat their measurement 5x and report the median plus a
``*_spread_ms`` key (max - min across repeats), so cross-round deltas inside
the spread are identifiable as noise from the JSON alone.

Utilization keys: the motion/mesh/gsplat/gaga sections also emit
``<section>_mfu`` / ``<section>_membw_frac`` / ``<section>_gflop_per_call``
/ ``<section>_gb_per_call`` from XLA's compiled cost model against v5e
single-chip peaks (197 TFLOP/s bf16, 819 GB/s HBM). These are LOWER bounds:
Pallas custom-call interiors count as operand/output traffic with zero
flops (see the comment at V5E_PEAK_FLOPS). They exist so "is this section
structurally slow?" is answerable from the bench JSON alone.

Set ARTALK_BENCH_SECTIONS=motion (comma list of
{motion,stream,mesh,gsplat,batched,gaga,fast,fused,fusedx,fstream,int8}) to
restrict sections (e.g. to bound compile time when iterating).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_KNOWN_SECTIONS = ("motion", "stream", "mesh", "gsplat", "batched", "gaga",
                   "fast", "fused", "fusedx", "fstream", "int8")
SECTIONS = {
    s.strip() for s in os.environ.get(
        "ARTALK_BENCH_SECTIONS", ",".join(_KNOWN_SECTIONS)).split(",")
    if s.strip()}
_bad = SECTIONS - set(_KNOWN_SECTIONS)
if _bad:
    raise SystemExit(
        f"unknown ARTALK_BENCH_SECTIONS {sorted(_bad)}; "
        f"known: {','.join(_KNOWN_SECTIONS)}")


from artalk_tpu.utils.timing import pipelined_ms as _device_ms  # noqa: E402

# v5e single-chip peaks for the utilization keys: 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM. The flops/bytes come from XLA's compiled cost model
# (Compiled.cost_analysis): Pallas custom-call interiors count as their
# operand/output traffic with ZERO flops, and f32 matmuls are counted at
# nominal flops though the MXU runs them as multiple bf16 passes -- so
# *_mfu / *_membw_frac are LOWER bounds on hardware utilization, good for
# "is this section structurally slow?" (the StyleUNet ~10 ms floor came
# from exactly this accounting), not for cross-accelerator marketing.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM = 819e9


def _repeat_ms(enqueue, n: int, repeats: int = 5):
    """Median-of-repeats device time + spread (max - min) for the tunnel-
    noisy single-shot sections (VERDICT r4 weak #6: stream_int8_p50_ms
    wobbled 5.6->7.8->5.7 across rounds with nothing in the JSON to say
    which is signal). Each repeat is a full pipelined measurement; the
    spread key lets the README mark deltas inside noise."""
    vals = sorted(_device_ms(enqueue, n=n) for _ in range(repeats))
    return vals[len(vals) // 2], vals[-1] - vals[0]


def _aot(jitf, *args):
    """AOT-compile a jitted callable so the SAME executable serves the
    timing loop and the cost analysis (a second trace would recompile
    server-side, minutes over the dev tunnel)."""
    return jitf.lower(*args).compile()


def _util(compiled, ms_per_call: float, extra_flops: float = 0.0) -> dict:
    """MFU / HBM-fraction keys for one compiled program at a measured
    per-call device time.

    extra_flops: hand-computed Pallas kernel-interior work
    (utils/roofline.py) -- cost_analysis counts custom-call interiors as
    zero flops, so the mostly-Pallas sections (gsplat/mesh/gaga) pass their
    static tile math here. Bytes stay as counted: operand/output traffic
    already equals those kernels' true HBM traffic (each instance chunk /
    plane table is DMA'd exactly once per call)."""
    ca = compiled.cost_analysis()
    if not isinstance(ca, dict):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) + float(extra_flops)
    byt = float(ca.get("bytes accessed", 0.0))
    sec = ms_per_call / 1e3
    return {
        "mfu": round(flops / sec / V5E_PEAK_FLOPS, 4),
        "membw_frac": round(byt / sec / V5E_PEAK_HBM, 4),
        "gflop_per_call": round(flops / 1e9, 2),
        "gb_per_call": round(byt / 1e9, 3),
    }


def bench_motion(model, params):
    n_windows = 8  # 32 s clip = the default --clip_length 750 workload (padded)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((n_windows, 1, model.window_samples)).astype(np.float32) * 0.1)
    style_cond = model.encode_style(params, None)

    # Throughput (the headline): pipelined clip decodes, scalar-reduced on
    # device -- the same measurement discipline as every other section
    # (CLAUDE.md: a single dispatch->device_get cycle pays ~27 ms of
    # dev-tunnel RTT plus the 340 KB motion-track fetch at ~10-40 MB/s,
    # neither of which is chip time).
    gen_sum = _aot(jax.jit(lambda p, c, s: jnp.sum(model.generate(p, c, s))),
                   params, chunks, style_cond)
    jax.device_get(gen_sum(params, chunks, style_cond))  # warmup
    ms = _device_ms(lambda i, prev: gen_sum(params, chunks, style_cond), n=7)
    total_frames = n_windows * model.cfg.vae.window
    fps = total_frames / (ms / 1000.0)
    util = _util(gen_sum, ms)

    # E2E clip latency: ONE dispatch + the full motion-track fetch (the
    # number a caller waiting on a whole 32 s clip over this dev tunnel
    # experiences; kept as its own key so the tunnel tax stays visible).
    generate = jax.jit(model.generate)
    jax.device_get(generate(params, chunks, style_cond))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(generate(params, chunks, style_cond))
        times.append(time.perf_counter() - t0)
    times.sort()
    e2e_ms = times[len(times) // 2] * 1000.0
    return fps, e2e_ms, n_windows, util


def bench_stream(model, params):
    """Median device latency of one streaming window step (donated carry)."""
    style_cond = model.encode_style(params, None)
    step = jax.jit(model.window_step, donate_argnums=(1,))
    rng = np.random.default_rng(1)
    chunk = jnp.asarray(
        rng.standard_normal((1, model.window_samples)).astype(np.float32) * 0.1)

    state = model.initial_state(params, style_cond)
    state, motion = step(params, state, chunk, style_cond)  # compile
    jax.device_get(motion)

    holder = {"state": state}

    def enqueue(i, prev):
        holder["state"], motion = step(params, holder["state"], chunk, style_cond)
        return motion[0, 0, 0]

    return _repeat_ms(enqueue, n=16)


def bench_mesh():
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.renderer import MeshRenderer
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=1.0)
    renderer = MeshRenderer(image_size=512, faces=flame_data["faces"], scale=1.0,
                            template_verts=flame_data["v_template"])
    rng = np.random.default_rng(2)
    frames = 25
    motions = jnp.asarray(rng.normal(0, 0.3, (frames, 106)).astype(np.float32))
    shape = jnp.zeros((frames, 300), jnp.float32)
    verts = flame.motion_to_verts(shape, motions, with_global=True)

    f = _aot(jax.jit(lambda v: jnp.sum(renderer(v))), verts)
    jax.device_get(f(verts))  # warmup
    ms_call, spread = _repeat_ms(lambda i, prev: f(verts), n=8)
    # hand-computed kernel flops (utils/roofline.py): exact bbox-overlap
    # visit count per frame, summed over the 25-frame batch
    from artalk_tpu.utils.roofline import mesh_kernel_cost

    extra = sum(
        mesh_kernel_cost(renderer.camera_transform(verts[i]),
                         flame_data["faces"], 512, 512)["flops"]
        for i in range(frames))
    return ms_call / frames, spread / frames, _util(f, ms_call, extra_flops=extra)


def bench_gsplat():
    from artalk_tpu.ops.gsplat import (
        max_valid_slots_per_gaussian, rasterize_gaussians)

    # GAGAvatar workload: 5023 FLAME-vertex gaussians (head-sized) + 2 dense
    # 296^2 ray-plane sheets of small splats (avatar.py / SURVEY §3.4)
    n_head, n_plane = 5023, 296 * 296
    n = n_head + 2 * n_plane
    rng = np.random.default_rng(3)
    xyz = np.concatenate([
        rng.normal(0, 0.09, (n_head, 3)),
        rng.normal(0, 0.12, (2 * n_plane, 3)),
    ]).astype(np.float32)
    colors = rng.random((n, 32)).astype(np.float32)
    opac = (rng.random((n, 1)) * 0.9 + 0.05).astype(np.float32)
    scales = (rng.random((n, 3)) * 0.004 + 0.001).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cam = np.array([[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 5000.0 / 512]],
                   np.float32)
    args = [jnp.asarray(a) for a in (xyz, colors, opac, scales, q, cam)]

    # same instance budget as the GAGAvatar frame path (avatar.py), plus the
    # production per-gaussian slot cap at the scene's measured exact bound
    # (small splats -> the 8-slot emission window compacts to `cap`, which
    # shrinks the instance-key sort by 8/cap with bit-identical output)
    cap = int(max_valid_slots_per_gaussian(
        args[0], args[2], args[3], args[4], args[5], focal=12.0, size=512))
    f = _aot(jax.jit(lambda *a: jnp.sum(rasterize_gaussians(
        *a, focal=12.0, size=512, max_instances=4 * n,
        slots_per_gaussian=cap))), *args)
    jax.device_get(f(*args))  # warmup
    ms, spread = _repeat_ms(lambda i, prev: f(*args), n=10)
    # hand-computed splat-kernel flops from the exact per-tile instance
    # histogram (utils/roofline.py; upper bound -- no early-out credit)
    from artalk_tpu.utils.roofline import (gsplat_kernel_cost,
                                           gsplat_tile_histogram)

    hist = gsplat_tile_histogram(args[0], args[2], args[3], args[4], args[5],
                                 focal=12.0, size=512, slot_cap=cap,
                                 max_instances=4 * n)
    extra = gsplat_kernel_cost(hist)["flops"]
    return ms, spread, _util(f, ms, extra_flops=extra)


def bench_batched(model, params):
    """BASELINE config #2: 6 clips, 8 windows each, one batched decode.

    Device aggregate throughput: the generate output is scalar-reduced on
    device (fetching 6 motion tracks over the ~10 MB/s dev tunnel would
    dominate the measurement; see CLAUDE.md).
    """
    n_windows, b = 8, 6
    rng = np.random.default_rng(4)
    chunks = jnp.asarray(rng.standard_normal(
        (n_windows, b, model.window_samples)).astype(np.float32) * 0.1)
    style_cond = model.encode_style(params, None)
    gen = jax.jit(lambda p, c, s: jnp.sum(model.generate(p, c, s)))
    jax.device_get(gen(params, chunks, style_cond))  # compile
    ms = _device_ms(lambda i, prev: gen(params, chunks, style_cond), n=5)
    total_frames = b * n_windows * model.cfg.vae.window
    return total_frames / (ms / 1000.0)


def bench_gaga():
    """BASELINE config #5: full GAGAvatar frame on the production chunk path
    (avatar._chunk_step: batched FLAME re-pose, forehead EMA scan, 180k-
    gaussian splat, StyleUNet SR, watermark, yuv420 packing).

    Pessimistic workload: random-init generators put the scale heads at
    sigmoid(~0)*0.05, i.e. ~24 px splats that SATURATE the 4/gaussian
    instance budget (the avatar build prints the overflow warning); trained
    reference avatars measure ~1.7 instances/gaussian, so real-checkpoint
    frames are cheaper than this number.

    Measures the avatar's DEFAULT precision mode ("fast": bf16 SR compute +
    bf16 splat color storage, both at the 8-bit video quantization floor;
    ARTALK_GAGA_PRECISION=exact restores full f32). The separate ``gsplat``
    section stays on the exact f32 kernel path."""
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.gagavatar.avatar import (
        CAM_PARAMS, FOREHEAD_INDICES, NUM_FLAME_VERTS, GAGAvatar)
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=5.0)
    gaga = GAGAvatar(assets_dir="assets")
    gaga.set_avatar_id(sorted(gaga.all_gagavatar_id)[0])
    gaga._build_gs_params()
    fn = gaga._get_chunk_fn(flame, "yuv420")

    k = 25  # production transfer_chunk

    def splat_extra_flops():
        """Hand-computed splat-kernel work of one chunk call (k frames) at
        the production budget/cap — the Pallas share cost_analysis misses
        (utils/roofline.py). Neutral-pose scene: pose excursion moves the
        instance count <0.2% (tools/exp_budget_margin.py)."""
        from artalk_tpu.models.gagavatar.generators import transform_emoca_to_p3d
        from artalk_tpu.utils.roofline import (gsplat_kernel_cost,
                                               gsplat_tile_histogram)

        gs = gaga._gs_params
        neutral = flame(gaga._feature_cache["shapecode"],
                        jnp.zeros((1, 100)), jnp.zeros((1, 6)))
        xyz = gs["xyz"].at[:, :NUM_FLAME_VERTS].set(neutral)
        cam = jnp.concatenate([
            transform_emoca_to_p3d(jnp.zeros((1, 3)))[0][:, :3],
            gaga._feature_cache["transform"][:, 3:4]], axis=-1)
        hist = gsplat_tile_histogram(
            xyz[0], gs["opacities"][0], gs["scales"][0], gs["rotations"][0],
            cam, focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"],
            slot_cap=gaga._slot_cap, max_instances=gaga._budget)
        return k * gsplat_kernel_cost(hist)["flops"]
    rng = np.random.default_rng(5)
    motions = jnp.asarray(rng.normal(0, 0.3, (k, 106)).astype(np.float32))
    carry = jnp.zeros((len(FOREHEAD_INDICES), 3), jnp.float32)
    is_first = jnp.float32(0.0)
    shapecode = gaga._feature_cache["shapecode"]
    base = gaga._feature_cache["transform"]

    def timed(chunk_fn, want_util=False):
        cargs = (gaga._gs_params, gaga.params["upsampler"], shapecode,
                 base, motions, carry, is_first, jnp.int32(k))
        jf = _aot(jax.jit(lambda *a: jnp.sum(
            chunk_fn(*a)[0][:, ::64, ::64].astype(jnp.int32))), *cargs)
        jax.device_get(jf(*cargs))  # warmup
        if want_util:
            ms_call, spread = _repeat_ms(lambda i, prev: jf(*cargs), n=6)
            return (ms_call / k, spread / k,
                    _util(jf, ms_call, extra_flops=splat_extra_flops()))
        return _device_ms(lambda i, prev: jf(*cargs), n=6) / k

    # Production selector: escalated exact budget + measured slot cap (no
    # dropped splats; the honest what-you-render-is-what-you-time key).
    ms_exact, spread_exact, util = timed(fn, want_util=True)

    n_gauss = int(gaga._gs_params["xyz"].shape[1])
    # Historical headline (r02/r03-comparable, the VERDICT r3 target): the
    # 4 instances/gaussian budget bucket with the matching per-gaussian slot
    # cap. On this saturating random-init scene that budget is documented-
    # lossy (trained avatars fit in it with 2.3x margin); the cap makes the
    # loss centered-per-gaussian instead of dropping whole bottom tiles.
    gaga._budget = 4 * n_gauss
    gaga._slot_cap = 4
    ms_b4 = timed(gaga._get_chunk_fn(flame, "yuv420"))

    # Trained-avatar bucket: feed the auto-budgeter (avatar._select_budget)
    # the measured trained-checkpoint workload (~1.7 instances/gaussian) so
    # this key times the frame a real avatar gets under whatever bucket the
    # production selector assigns it. Slot cap 4 matches that workload too:
    # 1.7 valid/gaussian means sub-8 px splats, whose alignment-independent
    # bound is 2 rows x 2 cols (ops/gsplat.max_valid_slots_per_gaussian).
    from artalk_tpu.models.gagavatar.avatar import _select_budget

    gaga._budget = _select_budget(int(1.7 * n_gauss), n_gauss)
    gaga._slot_cap = 4
    ms_trained = timed(gaga._get_chunk_fn(flame, "yuv420"))
    return ms_b4, ms_exact, spread_exact, ms_trained, util


def main():
    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.ar_model import BitwiseARModel

    cfg = ModelConfig()
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    out = {"metric": "motion_frames_per_sec", "value": None, "unit": "frames/s",
           "vs_baseline": None, "device": str(jax.devices()[0])}

    def section(name, fn):
        """One failing section must cost its key, not the whole JSON line."""
        if name not in SECTIONS:
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            import traceback

            traceback.print_exc()
            out.setdefault("errors", {})[name] = f"{type(e).__name__}: {e}"

    def _record_util(prefix, util):
        out[f"{prefix}_mfu"] = util["mfu"]
        out[f"{prefix}_membw_frac"] = util["membw_frac"]
        out[f"{prefix}_gflop_per_call"] = util["gflop_per_call"]
        out[f"{prefix}_gb_per_call"] = util["gb_per_call"]

    def _motion():
        fps, e2e_ms, n_windows, util = bench_motion(model, params)
        out.update(value=round(fps, 1), vs_baseline=round(fps / 500.0, 3),
                   real_time_factor=round(fps / cfg.fps, 2), windows=n_windows,
                   clip_e2e_latency_ms=round(e2e_ms, 1))
        _record_util("motion", util)

    section("motion", _motion)

    def _stream_keys(prefix, model_, params_):
        p50, spread = bench_stream(model_, params_)
        out[f"{prefix}_p50_ms"] = round(p50, 1)
        out[f"{prefix}_spread_ms"] = round(spread, 1)

    section("stream", lambda: _stream_keys("stream", model, params))

    def _mesh():
        ms, spread, util = bench_mesh()
        out["mesh_ms_per_frame"] = round(ms, 2)
        out["mesh_spread_ms"] = round(spread, 2)
        _record_util("mesh", util)

    section("mesh", _mesh)

    def _gsplat():
        ms, spread, util = bench_gsplat()
        out["gsplat_ms_per_frame"] = round(ms, 1)
        out["gsplat_spread_ms"] = round(spread, 2)
        _record_util("gsplat", util)

    section("gsplat", _gsplat)
    section("batched", lambda: out.__setitem__(
        "batched6_frames_per_sec", round(bench_batched(model, params), 1)))
    def _gaga():
        ms_b4, ms_exact, spread_exact, ms_trained, util = bench_gaga()
        # Headline = the production selector's frame (ADVICE r04: the forced
        # 4/g+cap-4 config is one the selector never chooses on this scene);
        # util was measured on this same run, so the README pairing is honest.
        out["gaga_ms_per_frame"] = round(ms_exact, 1)
        out["gaga_spread_ms"] = round(spread_exact, 2)
        out["gaga_b4cap4_ms_per_frame"] = round(ms_b4, 1)
        out["gaga_trained_ms_per_frame"] = round(ms_trained, 1)
        _record_util("gaga", util)

    section("gaga", _gaga)

    def _fast():
        import dataclasses

        fast_model = BitwiseARModel(
            dataclasses.replace(cfg, bf16_audio=True, bf16_ar=True))
        fps, _, _, _ = bench_motion(fast_model, params)  # same weights, bf16 trace
        out["motion_fast_frames_per_sec"] = round(fps, 1)

    section("fast", _fast)

    def _fused_model(**overrides):
        import dataclasses

        fused_model = BitwiseARModel(
            dataclasses.replace(cfg, fused_ar=True, **overrides))
        packed = dict(params,
                      fused_pack=fused_model.pack_fused_decode(params))
        audio_pack = fused_model.pack_fused_audio(params)
        if audio_pack is not None:
            packed["fused_audio_pack"] = audio_pack
        return fused_model, packed

    def _fused(key, **overrides):
        fused_model, packed = _fused_model(**overrides)
        fps, _, _, _ = bench_motion(fused_model, packed)
        out[key] = round(fps, 1)

    section("fused", lambda: _fused("motion_fused_frames_per_sec",
                                    bf16_audio=True, bf16_ar=True))
    section("fusedx", lambda: _fused("motion_fusedx_frames_per_sec"))

    def _fstream():
        # production streaming mode (fused bf16): per-window latency with
        # BOTH weight-streaming kernels engaged (batch-1 encoder + decode)
        fused_model, packed = _fused_model(bf16_audio=True, bf16_ar=True)
        _stream_keys("stream_fused", fused_model, packed)

    section("fstream", _fstream)

    def _int8():
        # weight-only int8 fused kernels (ARTALK_AR_PRECISION=int8): halves
        # the streamed weight bytes again vs bf16; changes code bits
        int8_model, packed = _fused_model(bf16_audio=True, bf16_ar=True,
                                          int8_ar=True)
        fps, _, _, _ = bench_motion(int8_model, packed)
        out["motion_int8_frames_per_sec"] = round(fps, 1)
        _stream_keys("stream_int8", int8_model, packed)

    section("int8", _int8)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
