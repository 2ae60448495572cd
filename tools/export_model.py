#!/usr/bin/env python
"""Export the streaming window step as a serialized StableHLO artifact.

Production-deployment path the reference lacks entirely: ``jax.export``
lowers ``BitwiseARModel.window_step`` (audio chunk -> motion window + carry)
once, and the serialized artifact can be loaded and executed by a serving
process that ships NO model source — only ``jax.export.deserialize`` plus the
params pytree (saved alongside as npz). The artifact embeds the StableHLO
module, the input/output trees (including the WindowState carry), and the
lowering platform(s).

    python tools/export_model.py --out exported/ [--batch 8] \
        [--platforms cpu,tpu]

Produces ``<out>/window_step_b<B>.stablehlo`` + ``<out>/params.npz``.
Round-trip is pinned by tests/test_export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import export as jexport

from artalk_tpu.models.ar_model import BitwiseARModel, WindowState

_REGISTERED = False


def _register():
    """WindowState must be registered for (de)serialization; idempotent."""
    global _REGISTERED
    if not _REGISTERED:
        jexport.register_namedtuple_serialization(
            WindowState, serialized_name="artalk_tpu.WindowState")
        _REGISTERED = True


def export_window_step(model: BitwiseARModel, params, batch: int = 1,
                       platforms=None) -> bytes:
    """Serialize the batched window step for ``batch`` concurrent streams.

    platforms: optional list like ["cpu", "tpu"] to make one artifact
    loadable on several backends (default: the lowering platform).
    """
    _register()
    style = jnp.zeros((batch, 1, model.cfg.ar.embed_dim), jnp.float32)
    state = model.initial_state(params, style, batch_size=batch)
    chunk = jnp.zeros((batch, model.window_samples), jnp.float32)
    fn = jax.jit(model.window_step)
    exported = jexport.export(fn, platforms=platforms)(
        params, state, chunk, style)
    return exported.serialize()


def load_window_step(blob: bytes):
    """Deserialize an artifact; returns an object whose ``.call(params,
    state, chunk, style)`` runs the step (jit-compatible)."""
    _register()
    return jexport.deserialize(blob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exported")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--checkpoint", default="assets/artalk_params.npz",
                    help="converted params npz (tools/convert_checkpoint.py)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. cpu,tpu (default: current)")
    args = ap.parse_args()

    from artalk_tpu.config import ModelConfig
    from artalk_tpu.utils.checkpoint import load_params, save_params

    model = BitwiseARModel(ModelConfig())
    if os.path.exists(args.checkpoint):
        params = load_params(args.checkpoint, like=jax.eval_shape(
            model.init, jax.random.PRNGKey(0)))
    else:
        print(f"WARNING: no checkpoint at {args.checkpoint}; exporting "
              "RANDOM-INIT weights (smoke-test artifact only, do not deploy)")
        params = model.init(jax.random.PRNGKey(0))
    platforms = args.platforms.split(",") if args.platforms else None
    blob = export_window_step(model, params, batch=args.batch,
                              platforms=platforms)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"window_step_b{args.batch}.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    save_params(params, os.path.join(args.out, "params.npz"))
    print(f"wrote {path} ({len(blob) / 1e6:.1f} MB) + params.npz")


if __name__ == "__main__":
    main()
