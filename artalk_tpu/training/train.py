"""Training entry point for both stages.

    # stage 1: motion tokenizer
    python -m artalk_tpu.training.train --stage vae --data clips/ --steps 10000

    # stage 2: audio-conditioned AR generator (frozen VAE inside the loss)
    python -m artalk_tpu.training.train --stage ar --data clips/ --steps 10000 \
        --init assets/artalk_params.npz --tp 1

`--data` is a directory of .npz clips ({'audio': (S,), 'motion': (T, 106)});
`--synthetic` trains on generated clips (smoke test). Checkpoints are written
as flat-npz archives compatible with the inference engine. `--eval` (AR
stage) closes the loop after training: clip 0 is decoded free-running with
the trained weights and scored with evaluation.py (LVE/FDD/beat-align at the
106-d FLAME layout; motion-space L2 otherwise).
"""

from __future__ import annotations

import argparse
import time

import jax


from ..config import ModelConfig
from ..models.ar_model import BitwiseARModel
from ..models.bitwise_vae import BitwiseVAE
from ..parallel.mesh import make_mesh
from ..parallel.sharding import shard_params
from ..utils.checkpoint import load_params, save_params
from .data import MotionAudioDataset, prefetch_to_device, synthetic_clips
from .trainer import init_state, make_ar_train_step, make_optimizer, \
    make_vae_train_step


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", choices=["vae", "ar"], required=True)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--init", type=str, default=None,
                   help="warm-start params (.npz)")
    p.add_argument("--out", type=str, default="checkpoints/trained.npz")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-process job (jax.distributed.initialize; "
                        "topology from TPU metadata or JAX_* env vars) before "
                        "building the pod-wide mesh")
    p.add_argument("--eval", action="store_true",
                   help="after AR training: free-running decode of clip 0 "
                        "scored with evaluation.py metrics (LVE/FDD/BA)")
    args = p.parse_args(argv)

    if args.multihost:
        from ..parallel.distributed import initialize_multihost

        info = initialize_multihost()
        print(f"[train] multihost: process {info['process_id']}/"
              f"{info['num_processes']}, {info['local_devices']} local / "
              f"{info['global_devices']} global devices")

    cfg = ModelConfig()
    if args.synthetic or args.data is None:
        print("[train] using synthetic clips")
        ds = MotionAudioDataset(synthetic_clips(num_clips=8, frames=500))
    else:
        ds = MotionAudioDataset.from_directory(args.data)

    mesh = make_mesh(tp=args.tp)
    model = BitwiseARModel(cfg) if args.stage == "ar" else BitwiseVAE(cfg.vae)
    optimizer = make_optimizer(lr=args.lr, total_steps=args.steps)

    with mesh:
        params = model.init(jax.random.PRNGKey(args.seed))
        if args.init:
            params = load_params(args.init, like=params)
        params = shard_params(params, mesh)
        state = init_state(params, optimizer)
        if args.stage == "ar":
            step = make_ar_train_step(model, optimizer, mesh=mesh, with_style=True)
        else:
            step = make_vae_train_step(model, optimizer, mesh=mesh)

        batches = prefetch_to_device(
            ds.batches(args.batch_size, seed=args.seed, num_batches=args.steps))
        t0 = time.time()
        for i, batch in enumerate(batches):
            if args.stage == "ar":
                state, metrics = step(state, batch["audio"], batch["prev_motion"],
                                      batch["this_motion"], batch["style_motion"])
            else:
                state, metrics = step(state, batch["prev_motion"], batch["this_motion"])
            if (i + 1) % args.log_every == 0 or i == 0:
                m = {k: round(float(v), 4) for k, v in
                     jax.device_get(metrics).items()}
                rate = (i + 1) / (time.time() - t0)
                print(f"[train] step {i + 1}/{args.steps} {m} "
                      f"({rate:.2f} steps/s)", flush=True)

        save_params(jax.device_get(state.params), args.out)
        print(f"[train] saved {args.out}")

    if args.eval and args.stage == "ar":
        _eval_decode(model, jax.device_get(state.params), ds, cfg)


def _eval_decode(model, params, ds, cfg):
    """Free-running decode of clip 0 with the trained weights, scored with
    the evaluation metrics -- ties the teacher-forced loss to the actual
    inference path (the overfit test pins this formally; here it's a
    training-run health readout)."""
    import json
    import math

    import jax.numpy as jnp
    import numpy as np

    from ..evaluation import evaluate_motion
    from ..models.flame import FlameModel
    from ..utils.assets import load_or_synthesize_flame

    audio, gt = ds.clips[0]
    # jit every device call: op-by-op dispatch on the TPU backend compiles
    # each primitive as its own executable (observed: >20 min for what the
    # jitted path does in seconds)
    style = jax.jit(model.encode_style)(params, jnp.asarray(gt[:50])[None])
    state = jax.jit(model.initial_state)(params, style)
    step = jax.jit(model.window_step)
    ws = model.window_samples
    n_windows = max(1, math.ceil(len(gt) / cfg.vae.window))
    padded = np.zeros(n_windows * ws, np.float32)
    padded[: len(audio)] = audio[: n_windows * ws]
    outs = []
    for k in range(n_windows):
        state, motion = step(
            params, state, jnp.asarray(padded[k * ws:(k + 1) * ws])[None],
            style)
        outs.append(np.asarray(motion)[0])
    pred = np.concatenate(outs)[: len(gt)]
    if cfg.vae.motion_dim == 106:  # FLAME layout -> full geometry metrics
        flame = FlameModel(load_or_synthesize_flame("assets"),
                           n_shape=300, n_exp=100, scale=1.0)
        metrics = evaluate_motion(pred, gt, flame, audio=audio)
    else:  # non-FLAME motion dim (tiny test configs): motion-space readout
        from ..evaluation import beat_alignment

        metrics = {"frames": int(len(gt)),
                   "motion_l2": float(np.linalg.norm(pred - gt, axis=-1).mean()),
                   "beat_align": beat_alignment(pred, audio)}
    print(f"[train] eval (clip 0): {json.dumps(metrics)}", flush=True)
    return metrics


if __name__ == "__main__":
    main()
