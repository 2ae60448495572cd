#!/usr/bin/env python
"""Per-stage device timing of the speech->motion->render pipeline.

Times each stage of the flagship path in isolation (pipelined async dispatch,
scalar-reduced outputs — see CLAUDE.md for why single dispatch+fetch cycles
cannot be timed over the dev tunnel) and prints a breakdown table. Run on the
real TPU:

    python tools/profile_pipeline.py [--iters 10]

Each stage is a separate jit (expect one compile per stage on first run).
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--precision",
                    choices=("exact", "fast", "fused", "fusedx", "int8"),
                    default="exact",
                    help="fast = bf16 audio encoder + bf16 AR blocks "
                         "(the ARTALK_AR_PRECISION=fast engine mode); "
                         "fused = fast + the weight-streaming Pallas decode "
                         "kernel (ARTALK_AR_FUSED=1); fusedx = the fused "
                         "kernel at f32; int8 = fused with weight-only "
                         "int8 tiles (ARTALK_AR_PRECISION=int8)")
    args = ap.parse_args()
    it = args.iters

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.models.ar_model import BitwiseARModel
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.renderer import MeshRenderer
    from artalk_tpu.ops.savgol import smooth_motion_savgol
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    import dataclasses

    cfg = ModelConfig()
    if args.precision in ("fast", "fused", "int8"):
        cfg = dataclasses.replace(cfg, bf16_audio=True, bf16_ar=True)
    if args.precision in ("fused", "fusedx", "int8"):
        cfg = dataclasses.replace(cfg, fused_ar=True)
    if args.precision == "int8":
        cfg = dataclasses.replace(cfg, int8_ar=True)
    model = BitwiseARModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if cfg.fused_ar:
        params = dict(params, fused_pack=model.pack_fused_decode(params))
        audio_pack = model.pack_fused_audio(params)
        if audio_pack is not None:
            params = dict(params, fused_audio_pack=audio_pack)
    rng = np.random.default_rng(0)
    n_windows = 8
    chunks = jnp.asarray(rng.standard_normal(
        (n_windows, 1, model.window_samples)).astype(np.float32) * 0.1)
    chunk1 = chunks[0]
    style_cond = model.encode_style(params, None)
    state = model.initial_state(params, style_cond)
    window = cfg.vae.window

    print(f"device: {jax.devices()[0]}   iters: {it}\n")
    print("--- speech -> motion (per 4 s window unless noted) ---")
    # NOTE every jit takes ``params`` as an ARGUMENT. Closing over the 300M-
    # param pytree in a lambda inlines it into the lowered module, and the
    # remote compile service chokes on the multi-GB constant payload (40+ min
    # then a broken pipe — observed twice before this fix).
    enc1 = timed("audio_condition (wav2vec, 1 window)",
                 jax.jit(lambda p, c: jnp.sum(model.audio_condition(p, c))),
                 params, chunk1, iters=it)
    encN = timed(f"audio_condition (batched {n_windows} windows)",
                 jax.jit(lambda p, c: jnp.sum(model.audio_condition(
                     p, c.reshape(-1, model.window_samples)))),
                 params, chunks, iters=it)
    print(f"{'  -> batched encode per window':<44s} {encN / n_windows:9.2f} ms")

    audio_cond = jax.jit(model.audio_condition)(params, chunk1)
    timed("decode_window (AR only, cond precomputed)",
          jax.jit(lambda p, ac: jnp.sum(model.decode_window(
              p, ac, style_cond, state.prev_attn_feat))),
          params, audio_cond, iters=it)

    bits = jax.jit(model.decode_window)(params, audio_cond, style_cond,
                                        state.prev_attn_feat)
    timed("VAE decode_from_bits (200-frame pair)",
          jax.jit(lambda p, b: jnp.sum(model.vae.decode_from_bits(
              p["vae"], state.prev_bits, b)[1])),
          params, bits, iters=it)
    motion = jax.jit(model.vae.decode_from_bits)(
        params["vae"], state.prev_bits, bits)[1]
    timed("VAE re-encode (encode_to_bits)",
          jax.jit(lambda p, m: jnp.sum(model.vae.encode_to_bits(
              p["vae"], m)[0])),
          params, motion, iters=it)
    timed("full window_step (stream step)",
          jax.jit(lambda p, s, c: jnp.sum(model.window_step(
              p, s, c, style_cond)[1])),
          params, state, chunk1, iters=it)
    timed(f"savgol postprocess ({n_windows * window} frames)",
          jax.jit(lambda m: jnp.sum(smooth_motion_savgol(m))),
          jnp.tile(motion[:, :window], (1, n_windows, 1)), iters=it)

    print("\n--- motion -> pixels (per frame unless noted) ---")
    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=1.0)
    motions_t = jnp.asarray(rng.normal(0, 0.3, (window, 106)).astype(np.float32))
    shape = jnp.zeros((window, 300), jnp.float32)
    fl = timed(f"FLAME motion_to_verts ({window} frames)",
               jax.jit(lambda s, m: jnp.sum(flame.motion_to_verts(
                   s, m, with_global=True))),
               shape, motions_t, iters=it)
    print(f"{'  -> per frame':<44s} {fl / window:9.3f} ms")
    renderer = MeshRenderer(image_size=512, faces=flame_data["faces"],
                            scale=1.0, template_verts=flame_data["v_template"])
    verts = flame.motion_to_verts(shape, motions_t, with_global=True)[:25]
    mr = timed("mesh render (25 frames, 512^2 Phong)",
               jax.jit(lambda v: jnp.sum(renderer(v))), verts, iters=it)
    print(f"{'  -> per frame':<44s} {mr / 25:9.3f} ms")


if __name__ == "__main__":
    main()
