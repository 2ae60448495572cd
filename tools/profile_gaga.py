"""Decompose the GAGA production frame (bench `gaga_ms_per_frame`).

Times the k-frame chunk scan in variants on the real chip:
  full        production path (splat + SR + watermark + yuv420)
  no-SR       splat only (upsampler replaced by a slice)
  SR-only     upsampler scan over a constant render
  full-bf16   production path with bf16 StyleUNet compute

    python tools/profile_gaga.py [--k 8]
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


def device_ms(fn, *args, iters=6):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args(argv)
    k = args.k

    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.gagavatar.avatar import (
        CAM_PARAMS, FOREHEAD_INDICES, NUM_FLAME_VERTS, GAGAvatar,
        _instance_budget, prep_frame_chunk)
    from artalk_tpu.ops.colorspace import rgb_to_yuv420p
    from artalk_tpu.ops.gsplat import rasterize_gaussians
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=5.0)
    gaga = GAGAvatar(assets_dir="assets")
    gaga.set_avatar_id(sorted(gaga.all_gagavatar_id)[0])
    gaga._build_gs_params()
    gs = gaga._gs_params
    budget = _instance_budget(int(gs["xyz"].shape[1]))
    print(f"device: {jax.devices()[0]}  k={k}  budget={budget}")

    rng = np.random.default_rng(5)
    motions = jnp.asarray(rng.normal(0, 0.3, (k, 106)).astype(np.float32))
    carry = jnp.zeros((len(FOREHEAD_INDICES), 3), jnp.float32)
    shapecode = gaga._feature_cache["shapecode"]
    base = gaga._feature_cache["transform"]

    def chunk(frame_body):
        def step(up_params):
            t_points, cams, _ = prep_frame_chunk(
                flame, shapecode, base, motions, carry, jnp.float32(0.0),
                jnp.int32(k))

            def frame(c, inp):
                tp, cam = inp
                return c, frame_body(tp, cam, up_params)

            _, frames = jax.lax.scan(frame, 0, (t_points, cams))
            return jnp.sum(frames[:, ::64, ::64].astype(jnp.int32))

        return jax.jit(step)

    def splat(tp, cam):
        xyz = gs["xyz"][0].at[:NUM_FLAME_VERTS].set(tp)
        return rasterize_gaussians(
            xyz, gs["colors"][0], gs["opacities"][0], gs["scales"][0],
            gs["rotations"][0], cam, focal=CAM_PARAMS["focal"],
            size=CAM_PARAMS["size"], max_instances=budget)

    def full_body(dtype):
        def body(tp, cam, up):
            render = splat(tp, cam)
            sr = gaga.upsampler(up, render[None], compute_dtype=dtype)
            return rgb_to_yuv420p(jnp.clip(sr, 0, 1), channel_axis=1)[0]
        return body

    def nosr_body(tp, cam, up):
        render = splat(tp, cam)
        return (render[:3] * 255).astype(jnp.uint8)

    const_render = jnp.asarray(
        rng.random((32, 512, 512)).astype(np.float32))

    def sronly_body(tp, cam, up):
        sr = gaga.upsampler(up, const_render[None] + tp[0, 0] * 1e-12,
                            compute_dtype=None)
        return rgb_to_yuv420p(jnp.clip(sr, 0, 1), channel_axis=1)[0]

    up = gaga.params["upsampler"]
    for name, fn in [
        ("full      ", chunk(full_body(None))),
        ("no-SR     ", chunk(nosr_body)),
        ("SR-only   ", chunk(sronly_body)),
        ("full-bf16 ", chunk(full_body(jnp.bfloat16))),
    ]:
        ms = device_ms(fn, up)
        print(f"{name} {ms:8.2f} ms/chunk  ({ms / k:6.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
