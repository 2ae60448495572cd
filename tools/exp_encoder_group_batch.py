#!/usr/bin/env python
"""Experiment: grouped-window fused encoder kernel — does sharing one weight
stream across B windows beat the per-window lax.map?

Per-window map re-streams all 24 layers' weights per window (bf16 ~600 MB,
int8 ~300 MB); B windows per kernel call stream them once. The catch is
VMEM: B=2 needs either compute-dtype (bf16) scratch for the matmul feeders
(value-identical, but every store pays a Mosaic f32->bf16 retile) or a
raised vmem limit with full f32 scratch. This measures the 2x2 grid
(B in {1,2}) x (slim scratch on/off) per pack dtype, stack-only:

    python tools/exp_encoder_group_batch.py [--iters 20] [--dtypes int8 bf16]

A grouped config wins iff t(B=2) < 2 * t(B=1, f32 scratch).

RESULT (v5e, 2026-08-19, prod geometry 24x1024/4096, 199 tokens) — REJECTED:
  full-__call__ A/B first (profile_encoder --fused, 8 windows): per-window
  map 14.47 ms bf16 / 14.12 int8; grouped B=2 slim 46.85 / 47.02 ms (3.2x
  regression). Isolation (this tool, int8 stack-only, standalone dispatch):
      B=1 slim=0  2.36 ms      B=1 slim=1  2.31 ms
      B=2 slim=0 11.43 ms      B=2 slim=1 11.33 ms
  Verdict: the slim (compute-dtype) scratch is FREE (B=1 identical both
  flavors — the retiling theory is dead), and B=2 itself is ~4.8x slower
  per call in BOTH scratch flavors, i.e. doubling the row count degrades
  every stage far beyond its 2x work growth (the B=2 working set exceeds
  what Mosaic keeps resident, spilling stage intermediates). The shared
  weight stream cannot pay for that: per-window lax.map stays
  (fused_batch_size() == 1) and the batched-encode floor is set by the
  B=1 kernel's in-pipeline ~1.24 ms/window (tools/
  exp_encoder_batched_fused.py: map int8 9.9 ms for 8 windows).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from artalk_tpu.config import ModelConfig
from artalk_tpu.models.wav2vec import Wav2VecEncoder
from artalk_tpu.ops.encoder_block_stack import encoder_block_stack
from artalk_tpu.utils.timing import timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtypes", nargs="*", default=["int8", "bf16"])
    args = ap.parse_args()

    cfg = ModelConfig().wav2vec
    enc = Wav2VecEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    name2dt = {"int8": jnp.int8, "bf16": jnp.bfloat16}

    for name in args.dtypes:
        pack = enc.pack_fused(params, dtype=name2dt[name])
        print(f"--- {name} pack ---")
        for b, slim in ((1, False), (1, True), (2, False), (2, True)):
            x = jnp.asarray(rng.standard_normal(
                (b, 199, cfg.hidden_size)).astype(np.float32) * 0.3)

            def run(xx, wt, bi, sc, slim=slim):
                return jnp.sum(encoder_block_stack(
                    xx, wt, bi, sc, num_heads=cfg.num_attention_heads,
                    eps=cfg.layer_norm_eps, slim_scratch=slim))

            try:
                t = timed(f"B={b} slim={int(slim)} stack", jax.jit(
                    run, static_argnames=()), x, pack["wtiles"],
                    pack["biases"], pack.get("scales"), iters=args.iters)
                print(f"    per-window: {t / b:.2f} ms")
            except Exception as e:  # noqa: BLE001 — VMEM OOM is a data point
                print(f"  B={b} slim={int(slim)}: {type(e).__name__}: "
                      f"{str(e)[:200]}")
        print()


if __name__ == "__main__":
    main()
