"""GAGAvatar: one-shot Gaussian-splat head avatar (engine-facing wrapper).

Equivalent of the reference GAGAvatar module (app/GAGAvatar/models.py:16-138):
on avatar selection, a single source image is encoded once (DINOv2+DPT ->
global + dense features -> gaussian generators) and cached; per frame only the
5023 FLAME-vertex gaussians are re-posed, the head rotation is folded into the
camera (transform_emoca_to_p3d), the 32-channel splat render is super-resolved
by StyleUNet.

TPU redesign: the per-frame path is one jit-compiled step; frames stream
through it with the forehead-EMA state threaded functionally, and device->host
transfer happens once per clip chunk (vs the reference's per-frame .cpu()).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.colorspace import rgb_to_yuv420p
from ...ops.gsplat import rasterize_gaussians
from ...ops.resize2d import resize_antialias
from .. import nn
from .dino import DinoDPT
from .generators import (ConvGSGenerator, LinearGSGenerator, build_points_planes,
                         harmonic_embedding, transform_emoca_to_p3d)
from .style_unet import StyleUNet
from .watermark import apply_watermark, load_watermark

# FLAME forehead vertex indices smoothed with an EMA (models.py:326-331)
FOREHEAD_INDICES = np.array([
    2168, 2165, 3068, 2199, 2196, 3720, 2091, 2088, 3524, 625, 628, 3871, 705,
    708, 2030, 667, 670, 3708, 3706, 3729, 3721, 3773, 3789, 3735, 3732, 3786,
    3876, 3878, 3913, 3899, 3872, 3874, 3864, 3865, 3158, 3157, 336, 335, 3153,
    3705, 2177, 2176, 3540, 671, 672, 3863, 2134, 16, 17, 2138, 2139, 2567,
    2566, 337, 338, 3154, 3712, 2178, 2179, 3495, 674, 673, 3868, 2135, 27, 18,
    1429, 1430,
], dtype=np.int32)

NUM_FLAME_VERTS = 5023
PLANE_SIZE = 296
CAM_PARAMS = {"focal": 12.0, "size": 512}


def _instance_budget(n_gaussians: int) -> Optional[int]:
    """Default static (gaussian, tile) instance cap for rasterize_gaussians.

    The avatar workload emits ~1.7 valid instances per gaussian (measured via
    count_valid_instances on the 180 255-gaussian scene); 4 per gaussian is a
    ~2.3x margin and still halves the prepass gather vs the full 8-slot
    budget. Override with ARTALK_GSPLAT_MAX_INSTANCES (0 = exact/unbudgeted).

    Per-avatar auto-budgeting (``_select_budget``) tightens this to the
    smallest bucket that fits the avatar's measured neutral-pose count with
    headroom -- the prepass gather scales with the budget, so trained
    avatars (~1.7/gaussian) run with half the gather traffic of this
    worst-case default.
    """
    env = os.environ.get("ARTALK_GSPLAT_MAX_INSTANCES")
    if env is not None:
        return int(env) or None
    return 4 * n_gaussians


BUDGET_BUCKETS = (2, 3, 4)  # instances/gaussian; bucketed so at most
                            # len(BUDGET_BUCKETS) compiled frame shapes exist


def _select_budget(neutral_count: int, n_gaussians: int,
                   headroom: float = 1.1) -> Optional[int]:
    """Smallest budget bucket covering ``headroom * neutral_count``.

    Poses move only the 5 023 head gaussians plus the camera, so the
    neutral-pose instance count is a good predictor. The headroom factor is
    MEASURED, not guessed (tools/exp_budget_margin.py): 200 random driven
    frames at exaggerated motion sigma move the count at most +0.18% above
    neutral (poses mostly shrink it), so 1.1x is ~55x the observed worst
    excursion while costing ~0.9 ms/frame less prepass gather than the old
    1.4x on the saturating bench avatar. Falls back to the env override /
    worst-case default semantics of ``_instance_budget``. Counts beyond the
    largest bucket ESCALATE to the GCHUNK-rounded need rather than clamping:
    the CUDA reference rasterizer (GAGAvatar/utils_renderer.py:10-47) is
    exact by construction (dynamic instance lists), so ours must be
    exact-or-explicit — a silently clamped budget would drop far gaussians
    of the bottom image rows. (Escalated budgets are NOT rounded up to whole
    instances-per-gaussian steps: the gather scales with the budget and
    _build_instances accepts any count; the jit cache is keyed by budget, so
    an off-bucket avatar costs one extra compile, not a recompile per
    frame.)
    """
    env = os.environ.get("ARTALK_GSPLAT_MAX_INSTANCES")
    if env is not None:
        return int(env) or None
    need = headroom * neutral_count
    for per_g in BUDGET_BUCKETS:
        if per_g * n_gaussians >= need:
            return per_g * n_gaussians
    from ...ops.gsplat import GCHUNK

    return int(math.ceil(need / GCHUNK)) * GCHUNK


def prep_frame_chunk(flame_model, shapecode, base_transform, motions_k,
                     carry, is_first, valid):
    """Batched per-frame prep for a K-frame chunk (the sequential part of
    GAGAvatar/models.py:98-128, restructured as scans).

    motions_k: (K, 106). carry: (F, 3) forehead EMA state. is_first: scalar
    >0 on the very first chunk of a stream (EMA seeds from frame 0). valid:
    frames beyond this count render but leave the carry untouched (clip
    padding must not leak into cross-call state).

    Returns (t_points (K, 5023, 3), cams (K, 3, 4), carry_out (F, 3)).
    """
    k = motions_k.shape[0]
    exp = motions_k[:, :100]
    jaw = jnp.concatenate([jnp.zeros((k, 3)), motions_k[:, 103:106]], axis=-1)
    shp = jnp.broadcast_to(shapecode, (k, shapecode.shape[-1]))
    t_points = flame_model(shp, exp, jaw)               # (K, 5023, 3)

    # forehead EMA smoothing (models.py:120-125)
    cur = t_points[:, FOREHEAD_INDICES]                 # (K, F, 3)
    carry0 = jnp.where(is_first > 0, cur[0], carry)

    def ema(state, x):
        c, i = state
        new = jnp.where(i < valid, 0.98 * c + 0.02 * x, c)
        return (new, i + 1), new

    (carry_out, _), smoothed = jax.lax.scan(ema, (carry0, jnp.int32(0)), cur)
    t_points = t_points.at[:, FOREHEAD_INDICES].set(smoothed)

    # head rotation folded into the camera; translation from the avatar's
    # base transform (models.py:127, :255-264)
    cams = transform_emoca_to_p3d(motions_k[:, 100:103])  # (K, 3, 4)
    cams = jnp.concatenate([
        cams[:, :, :3],
        jnp.broadcast_to(base_transform[None, :, 3:4], (k, 3, 1)),
    ], axis=-1)
    return t_points, cams, carry_out


class GAGAvatar:
    def __init__(self, assets_dir: str = "assets", params: Optional[dict] = None,
                 seed: int = 0, interpret: bool = False,
                 bf16_sr: Optional[bool] = None):
        self.assets_dir = assets_dir
        self.interpret = interpret
        # Precision mode. "fast" (default): bf16 StyleUNet compute + bf16
        # splat color storage -- both feed 8-bit video, where the bf16 noise
        # sits at the quantization floor; measured ~1.9 ms/frame on a v5e
        # (tools/profile_gaga.py). "exact": full f32, bit-stable vs the
        # reference semantics. ARTALK_BF16_SR (legacy env) still overrides
        # the SR leg alone.
        precision = os.environ.get("ARTALK_GAGA_PRECISION", "fast")
        assert precision in ("fast", "exact"), precision
        if bf16_sr is None:
            env_sr = os.environ.get("ARTALK_BF16_SR")
            if env_sr is not None:
                bf16_sr = env_sr not in ("0", "")
            else:
                bf16_sr = precision == "fast"
        self.bf16_sr = bf16_sr
        self.bf16_colors = precision == "fast"
        self.base_model = DinoDPT(output_dim=256)
        self.gs_generator_g = LinearGSGenerator(in_dim=1024, dir_dim=27)
        self.gs_generator_l0 = ConvGSGenerator(in_dim=256, dir_dim=27)
        self.gs_generator_l1 = ConvGSGenerator(in_dim=256, dir_dim=27)
        self.upsampler = StyleUNet(in_size=512, out_size=512, in_dim=32, out_dim=3)

        if params is None:
            ckpt = os.path.join(assets_dir, "gagavatar_params.npz")
            if os.path.exists(ckpt):
                from ...utils.checkpoint import load_params

                params = load_params(ckpt, like=jax.eval_shape(
                    self.init, jax.random.PRNGKey(0)))
            else:
                print(f"[artalk_tpu] no GAGAvatar checkpoint at {ckpt}; "
                      "initializing random weights")
                params = self.init(jax.random.PRNGKey(seed))
        self.params = params

        self.all_gagavatar_id = self._load_avatar_bank()
        # logo watermark, blended into every frame when the asset exists
        # (reference applies it unconditionally, models.py:95,131-138)
        self._watermark = load_watermark(assets_dir)
        self._tracked: Optional[Dict[str, np.ndarray]] = None
        self._gs_params = None
        self._feature_cache = None
        self._upper_points = None
        # compiled step caches are keyed by the active instance budget: the
        # budget is a trace-time constant, so reusing an executable compiled
        # for another avatar's budget would silently mis-size the prepass
        self._budget: Optional[int] = None
        self._slot_cap: Optional[int] = None
        self._frame_fns = {}
        self._chunk_fns = {}
        self._gs_compute_fn = None

    # ----------------------------------------------------------------- params

    def init(self, key: jax.Array) -> nn.Params:
        ks = jax.random.split(key, 6)
        return {
            "base_model": self.base_model.init(ks[0]),
            "head_base": jax.random.normal(ks[1], (NUM_FLAME_VERTS, 256)),
            "gs_generator_g": self.gs_generator_g.init(ks[2]),
            "gs_generator_l0": self.gs_generator_l0.init(ks[3]),
            "gs_generator_l1": self.gs_generator_l1.init(ks[4]),
            "upsampler": self.upsampler.init(ks[5]),
        }

    # ------------------------------------------------------------ avatar bank

    def _load_avatar_bank(self) -> Dict[str, str]:
        """Map avatar id -> npz path (converted from the reference's
        tracked.pt by tools/convert_checkpoint.py, or synthetic)."""
        from ...utils.assets import ensure_synthetic_avatars

        ensure_synthetic_avatars(self.assets_dir)
        bank_dir = os.path.join(self.assets_dir, "avatars")
        if not os.path.isdir(bank_dir):
            return {}
        return {
            os.path.splitext(f)[0]: os.path.join(bank_dir, f)
            for f in sorted(os.listdir(bank_dir)) if f.endswith(".npz")
        }

    def set_avatar_id(self, avatar_id: str) -> None:
        path = self.all_gagavatar_id.get(avatar_id)
        if path is None:
            raise KeyError(
                f"unknown avatar {avatar_id!r}; available: {sorted(self.all_gagavatar_id)}")
        with np.load(path) as z:
            self._tracked = {k: z[k].astype(np.float32) for k in z.files}
        self._gs_params = None
        self._feature_cache = None
        self._upper_points = None
        self._budget = None  # re-selected on the next _build_gs_params
        self._slot_cap = None

    # ------------------------------------------------------------- build once

    def _gs_params_compute(self, params, image, plane_dirs, plane_points):
        """Pure jittable part of the one-time avatar encode (models.py:65-87);
        compiled so an avatar switch is one dispatch, not hundreds."""
        f_image = resize_antialias(image, 518, 518)
        f_feature0, f_feature1 = self.base_model(params["base_model"], f_image)
        direnc = harmonic_embedding(plane_dirs)
        head = jnp.concatenate([
            jnp.broadcast_to(params["head_base"][None], (1, NUM_FLAME_VERTS, 256)),
            jnp.broadcast_to(f_feature1[:, None], (1, NUM_FLAME_VERTS, f_feature1.shape[-1])),
        ], axis=-1)
        gs_g = self.gs_generator_g(params["gs_generator_g"], head, direnc)
        gs_g["xyz"] = jnp.zeros((1, NUM_FLAME_VERTS, 3))
        gs_l0 = self.gs_generator_l0(params["gs_generator_l0"], f_feature0, direnc)
        gs_l1 = self.gs_generator_l1(params["gs_generator_l1"], f_feature0, direnc)
        gs_l0["xyz"] = plane_points + gs_l0.pop("positions") * plane_dirs[:, None]
        gs_l1["xyz"] = plane_points - gs_l1.pop("positions") * plane_dirs[:, None]
        return {
            k: jnp.concatenate([gs_g[k], gs_l0[k], gs_l1[k]], axis=1)
            for k in gs_g.keys()
        }

    def _build_gs_params(self):
        """Encode the source image once -> cached gaussian parameters
        (models.py:65-87)."""
        tracked = self._tracked
        assert tracked is not None, "call set_avatar_id first"
        image = jnp.asarray(tracked["image"])[None]            # (1, 3, H, W)
        transform = tracked["transform_matrix"]
        planes = build_points_planes(PLANE_SIZE, transform)
        plane_dirs = jnp.asarray(planes["plane_dirs"])[None]
        plane_points = jnp.asarray(planes["plane_points"])[None]

        if self._gs_compute_fn is None:
            self._gs_compute_fn = jax.jit(self._gs_params_compute)
        self._gs_params = self._gs_compute_fn(self.params, image, plane_dirs,
                                              plane_points)
        self._feature_cache = {
            "transform": jnp.asarray(
                transform[:3] if transform.shape[0] >= 3 else transform),
            "shapecode": jnp.asarray(tracked["shapecode"]).reshape(1, -1),
        }
        self._check_instance_budget()

    def _check_instance_budget(self):
        """Once per avatar: count neutral-pose valid instances, auto-select
        the per-avatar budget bucket (``_select_budget``), and warn loudly
        when even the largest bucket is tight. The budgeted gather drops far
        gaussians of the bottom image rows when exceeded
        (ops/gsplat.py _build_instances)."""
        from ...ops.gsplat import count_valid_instances, max_valid_slots_per_gaussian

        gs = self._gs_params
        n = int(gs["xyz"].shape[1])
        if not _instance_budget(n):  # env requested the exact/unbudgeted path
            self._budget = None
            self._slot_cap = None
            return
        cam = jnp.concatenate([
            transform_emoca_to_p3d(jnp.zeros((1, 3)))[0][:, :3],
            self._feature_cache["transform"][:, 3:4]], axis=-1)
        # The cached gs xyz has zeros in the head rows (replaced per frame by
        # re-posed FLAME vertices in _frame_step); substitute the
        # neutral-pose vertices so head splats count toward the budget.
        xyz = gs["xyz"]
        flame = None
        try:
            from ...models.flame import FlameModel
            from ...utils.assets import load_or_synthesize_flame

            flame = FlameModel(load_or_synthesize_flame(self.assets_dir),
                               n_shape=300, n_exp=100, scale=5.0)
            neutral = flame(self._feature_cache["shapecode"],
                            jnp.zeros((1, 100)), jnp.zeros((1, 6)))
            xyz = xyz.at[:, :NUM_FLAME_VERTS].set(neutral)
        except Exception as exc:  # count without the head rows (~3% low)
            print(f"[artalk_tpu] instance-budget check: no FLAME assets "
                  f"({exc}); head splats excluded from the count")
        count = int(count_valid_instances(
            xyz[0], gs["opacities"][0], gs["scales"][0],
            gs["rotations"][0], cam,
            focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"]))
        self._budget = _select_budget(count, n)
        budget = self._budget
        if flame is None:
            # The cap is a MAX over gaussians (unlike the count, a sum that
            # is merely ~3% low without head rows): if any head splat is the
            # largest on screen, a cap computed from a head-less scene would
            # silently truncate head geometry every frame. Skip the
            # optimization (DUP window = exact) rather than guess.
            self._slot_cap = None
            print(f"[artalk_tpu] avatar budget: {count} neutral-pose "
                  f"instances -> {budget} ({budget / n:.2f} inst/gaussian, "
                  f"slot cap skipped: no FLAME assets)")
            self._warn_if_tight(count, budget)
            return
        # Per-gaussian slot cap: the instance-key sort scales with emitted
        # slots (DUP = 8 worst case), but the alignment-independent bound on
        # any one gaussian's valid slots is usually much lower (trained
        # avatars: small splats -> 2-4). Exact by construction: the bound
        # dominates every per-gaussian count (ops/gsplat.py). Calibrated
        # over DRIVEN poses, not neutral alone: head rotation folds into the
        # camera, changing per-gaussian depth and hence radius, and the cap
        # silently truncates a splat's edge tiles if exceeded (ADVICE r04).
        # The sample reuses the exaggerated sigma-0.3 motion distribution of
        # tools/exp_budget_margin.py; max_valid_slots_per_gaussian keeps its
        # 5% radius margin on top. Same array shapes as the neutral call, so
        # the per-frame evals hit the already-compiled executable.
        cap = int(max_valid_slots_per_gaussian(
            xyz[0], gs["opacities"][0], gs["scales"][0],
            gs["rotations"][0], cam,
            focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"]))
        rng = np.random.default_rng(11)
        k = 16
        motions = jnp.asarray(
            rng.normal(0.0, 0.3, (k, 106)).astype(np.float32))
        t_points = flame(
            jnp.broadcast_to(self._feature_cache["shapecode"], (k, 300)),
            motions[:, :100],
            jnp.concatenate([jnp.zeros((k, 3)), motions[:, 103:106]],
                            axis=-1))
        cams = transform_emoca_to_p3d(motions[:, 100:103])
        cams = jnp.concatenate([
            cams[:, :, :3],
            jnp.broadcast_to(
                self._feature_cache["transform"][None, :, 3:4], (k, 3, 1)),
        ], axis=-1)
        caps = [max_valid_slots_per_gaussian(
            xyz[0].at[:NUM_FLAME_VERTS].set(t_points[i]),
            gs["opacities"][0], gs["scales"][0], gs["rotations"][0], cams[i],
            focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"])
            for i in range(k)]
        self._slot_cap = max(cap, max(int(c) for c in caps))
        print(f"[artalk_tpu] avatar budget: {count} neutral-pose instances "
              f"-> {budget} ({budget / n:.2f} inst/gaussian, "
              f"slot cap {self._slot_cap}: neutral {cap}, "
              f"{k}-driven-pose max {max(int(c) for c in caps)})")
        self._warn_if_tight(count, budget)

    @staticmethod
    def _warn_if_tight(count: int, budget: Optional[int]) -> None:
        # Measured pose-driven excursion is at most +0.18% over neutral
        # (tools/exp_budget_margin.py), so a budget within 2% of the count
        # is the only genuinely tight case.
        if budget is not None and count > budget / 1.02:
            rel = ("exceeds" if count > budget else "is within 2% of")
            print(f"[artalk_tpu] WARNING: avatar emits {count} splat "
                  f"instances at neutral pose, which {rel} the per-frame "
                  f"budget {budget}; far gaussians of the bottom image rows "
                  "may be dropped. Raise ARTALK_GSPLAT_MAX_INSTANCES (0 = exact).")

    def _active_budget(self, n_gaussians: int) -> Optional[int]:
        return (self._budget if self._budget is not None
                else _instance_budget(n_gaussians))

    # -------------------------------------------------------------- per frame

    def _frame_step(self, gs_params, t_points, cam_matrix, upsampler_params):
        xyz = gs_params["xyz"].at[:, :NUM_FLAME_VERTS].set(t_points)
        render = rasterize_gaussians(
            xyz[0], gs_params["colors"][0], gs_params["opacities"][0],
            gs_params["scales"][0], gs_params["rotations"][0], cam_matrix,
            focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"],
            interpret=self.interpret,
            max_instances=self._active_budget(xyz.shape[1]),
            bf16_colors=self.bf16_colors,
            slots_per_gaussian=self._slot_cap)
        sr = self.upsampler(upsampler_params, render[None],
                            compute_dtype=jnp.bfloat16 if self.bf16_sr else None)
        return apply_watermark(jnp.clip(sr, 0.0, 1.0), self._watermark)

    def build_forward_batch(self, motion: jnp.ndarray, flame_model):
        """(1, 106) motion -> dict for forward_expression (models.py:98-128).

        flame_model: a FlameModel with scale=5.0 (the GAGAvatar world scale).
        """
        if self._tracked is None:
            first = sorted(self.all_gagavatar_id)[0]
            self.set_avatar_id(first)
        if self._gs_params is None:
            self._build_gs_params()
        exp = motion[:, :100]
        jaw_pose = jnp.concatenate([jnp.zeros((1, 3)), motion[:, 103:106]], axis=-1)
        t_points = flame_model(self._feature_cache["shapecode"], exp, jaw_pose)
        # forehead EMA smoothing (models.py:120-125)
        current = t_points[:, FOREHEAD_INDICES]
        if self._upper_points is None:
            self._upper_points = current
        else:
            self._upper_points = 0.98 * self._upper_points + 0.02 * current
            t_points = t_points.at[:, FOREHEAD_INDICES].set(self._upper_points)
        cam = transform_emoca_to_p3d(motion[:, 100:103])[0]
        base = self._feature_cache["transform"]
        cam = jnp.concatenate([cam[:, :3], base[:, 3:4]], axis=-1)
        return {"t_points": t_points, "t_transform": cam}

    def forward_expression(self, batch) -> jnp.ndarray:
        """One frame: re-posed gaussians -> splat -> SR (models.py:64-95)."""
        if self._gs_params is None:
            self._build_gs_params()
        fkey = (self._budget, self._slot_cap)
        fn = self._frame_fns.get(fkey)
        if fn is None:  # budget/cap are trace-time constants: one jit each
            fn = self._frame_fns[fkey] = jax.jit(self._frame_step)
        return fn(self._gs_params, batch["t_points"],
                  batch["t_transform"], self.params["upsampler"])

    # ------------------------------------------------------------- per chunk

    def _chunk_step(self, flame_model, colorspace, gs_params, upsampler_params,
                    shapecode, base_transform, motions_k, carry, is_first, valid):
        """K frames in one compiled step: batched FLAME + EMA scan + per-frame
        splat/SR scan + on-device uint8 packing.

        Replaces the reference's per-frame host loop (inference.py:76-79,
        GAGAvatar/models.py:98-128): FLAME LBS runs batched over the chunk,
        the forehead EMA is a lax.scan linear recurrence, and only uint8
        frames ever cross the device boundary -- as yuv420p (half the bytes)
        when `colorspace == "yuv420"`.
        """
        t_points, cams, carry_out = prep_frame_chunk(
            flame_model, shapecode, base_transform, motions_k, carry,
            is_first, valid)

        def frame(_, inp):
            tp, cam = inp
            xyz = gs_params["xyz"][0].at[:NUM_FLAME_VERTS].set(tp)
            render = rasterize_gaussians(
                xyz, gs_params["colors"][0], gs_params["opacities"][0],
                gs_params["scales"][0], gs_params["rotations"][0], cam,
                focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"],
                interpret=self.interpret,
                max_instances=self._active_budget(xyz.shape[0]),
                bf16_colors=self.bf16_colors,
                slots_per_gaussian=self._slot_cap)
            sr = self.upsampler(
                upsampler_params, render[None],
                compute_dtype=jnp.bfloat16 if self.bf16_sr else None)
            sr = jnp.clip(sr, 0.0, 1.0)
            sr = apply_watermark(sr, self._watermark)
            if colorspace == "yuv420":
                return _, rgb_to_yuv420p(sr, channel_axis=1)[0]
            rgb = jnp.clip(sr[0].transpose(1, 2, 0) * 255.0, 0.0, 255.0)
            return _, rgb.astype(jnp.uint8)

        _, frames = jax.lax.scan(frame, 0, (t_points, cams))
        return frames, carry_out

    def _get_chunk_fn(self, flame_model, colorspace: str):
        # keyed cache: alternating colorspace / flame model / instance budget
        # must not discard compiled executables (each TPU recompile is
        # minutes over a tunnel); the budget is a trace-time constant, so it
        # MUST be part of the key or a budget change would silently reuse a
        # wrong-shaped executable
        key = (id(flame_model), colorspace, self._budget, self._slot_cap)
        fn = self._chunk_fns.get(key)
        if fn is None:
            step = functools.partial(self._chunk_step, flame_model, colorspace)
            fn = self._chunk_fns[key] = jax.jit(step)
        return fn

    def render_motion_sequence(self, avatar_id: str, motions: jnp.ndarray,
                               flame_model, transfer_chunk: int = 25,
                               colorspace: str = "rgb") -> np.ndarray:
        """(T, 106) motions -> uint8 frames: (T, 512, 512, 3) RGB, or
        (T, 768, 512) yuv420p planes when `colorspace == "yuv420"`.

        The clip runs through `_chunk_step` in fixed-size chunks (one compiled
        shape); the host fetch of chunk k overlaps the device compute of chunk
        k+1 (the reference moves every frame with .cpu(), inference.py:76-79).
        """
        if self._tracked is None or avatar_id not in (None, ""):
            self.set_avatar_id(avatar_id)
        if self._gs_params is None:
            self._build_gs_params()
        fn = self._get_chunk_fn(flame_model, colorspace)
        t_total = int(motions.shape[0])
        motions = jnp.asarray(motions)
        pad = (-t_total) % transfer_chunk
        if pad:
            motions = jnp.concatenate(
                [motions, jnp.repeat(motions[-1:], pad, axis=0)], axis=0)
        carry = (jnp.zeros((len(FOREHEAD_INDICES), 3), jnp.float32)
                 if self._upper_points is None else self._upper_points[0])
        is_first = jnp.float32(1.0 if self._upper_points is None else 0.0)
        shapecode = self._feature_cache["shapecode"]
        base = self._feature_cache["transform"]
        outs, pending = [], None
        for i in range(0, motions.shape[0], transfer_chunk):
            valid = jnp.int32(min(transfer_chunk, max(t_total - i, 0)))
            frames_k, carry = fn(self._gs_params, self.params["upsampler"],
                                 shapecode, base, motions[i:i + transfer_chunk],
                                 carry, is_first, valid)
            is_first = jnp.float32(0.0)
            if pending is not None:  # fetch previous chunk while this one runs
                outs.append(np.asarray(pending))
            pending = frames_k
        outs.append(np.asarray(pending))
        self._upper_points = carry[None]
        return np.concatenate(outs, axis=0)[:t_total]
