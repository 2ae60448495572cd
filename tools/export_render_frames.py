#!/usr/bin/env python
"""Export rendered frames + camera metadata for cross-renderer pixel parity.

The mesh/GAGA camera conventions (NDC, focal, handedness) are pinned only by
this repo's own oracles; comparing against the reference's PyTorch3D/CUDA
stack (app/flame_model/renderer_utils.py:23-85, GAGAvatar/utils_renderer.py:
10-47) needs frames rendered from IDENTICAL inputs on both sides. This tool
renders a motion track through this framework and writes everything the
reference side needs to reproduce the shot:

    python tools/export_render_frames.py --out /tmp/ours \
        [--motion track.npz] [--frames 8] [--gaga]

Writes <out>/frames.npz with:
    frames   (T, H, W, 3) uint8 (mesh path) and/or gaga_frames
    motion   (T, 106) f32 — the exact FLAME motion rendered
    shape    (T, 300) f32
    meta     json: image size, focal, camera convention notes

Compare on the reference machine with PSNR (see PARITY.md runbook §2);
conventions match when PSNR > ~35 dB (antialiasing/shading differ slightly
by construction).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--motion", default=None,
                    help="npz with motion (T,106) [+ shape (T,300)]; "
                         "synthesized when omitted")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--gaga", action="store_true",
                    help="also render the GAGAvatar path (needs avatar assets)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.renderer import MeshRenderer
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    if args.motion:
        data = np.load(args.motion)
        motion = np.asarray(data["motion"], np.float32)[:args.frames]
        shape = (np.asarray(data["shape"], np.float32)[:args.frames]
                 if "shape" in data else np.zeros((len(motion), 300), np.float32))
    else:
        rng = np.random.default_rng(0)
        motion = rng.normal(0, 0.3, (args.frames, 106)).astype(np.float32)
        shape = np.zeros((args.frames, 300), np.float32)

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=1.0)
    renderer = MeshRenderer(image_size=512, faces=flame_data["faces"],
                            scale=1.0, template_verts=flame_data["v_template"])
    verts = flame.motion_to_verts(jnp.asarray(shape), jnp.asarray(motion),
                                  with_global=True)
    imgs = np.asarray(renderer(verts))
    frames = np.clip(imgs * 255.0, 0, 255).astype(np.uint8)

    out = {"frames": frames, "motion": motion, "shape": shape}
    if args.gaga:
        from artalk_tpu.models.gagavatar.avatar import GAGAvatar

        gaga = GAGAvatar(assets_dir="assets")
        flame5 = FlameModel(flame_data, n_shape=300, n_exp=100, scale=5.0)
        gf = gaga.render_motion_sequence(
            sorted(gaga.all_gagavatar_id)[0], jnp.asarray(motion), flame5,
            transfer_chunk=min(25, len(motion)))
        out["gaga_frames"] = gf

    os.makedirs(args.out, exist_ok=True)
    meta = {
        "image_size": 512,
        "mesh_camera": "app/flame_model/renderer_utils.py conventions: "
                       "row-vector view [R|t] with x,y negated; focal 12.0 "
                       "NDC units (see models/renderer.py camera_transform)",
        "gaga_camera": "transform_emoca_to_p3d(motion[100:103]) rotation + "
                       "avatar base-transform translation (avatar.py)",
        "note": "synthetic weights unless assets/artalk_params.npz exists; "
                "pixel parity runs need real checkpoints on BOTH sides",
    }
    np.savez_compressed(os.path.join(args.out, "frames.npz"), **out)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {args.out}/frames.npz: " +
          ", ".join(f"{k} {v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
