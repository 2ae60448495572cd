"""Train states and pjit-sharded train steps for both stages."""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..models.ar_model import BitwiseARModel
from ..models.bitwise_vae import BitwiseVAE
from ..parallel.sharding import batch_sharding
from .losses import ar_loss, vae_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup_steps: int = 1000, total_steps: int = 100_000):
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def init_state(params: Any, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_vae_train_step(vae: BitwiseVAE, optimizer, mesh: Optional[Mesh] = None):
    """Stage-1 step: (state, prev_motion, this_motion) -> (state, metrics).

    With a mesh, params follow the tp rules (replicated for the small VAE) and
    the batch is dp-sharded; gradients sync via XLA's automatic psum.
    """

    def step(state: TrainState, prev_motion, this_motion):
        def loss_fn(p):
            return vae_loss(vae, p, prev_motion, this_motion)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    data_sh = batch_sharding(mesh, 3)
    return jax.jit(step, donate_argnums=(0,), in_shardings=(None, data_sh, data_sh))


def make_ar_train_step(model: BitwiseARModel, optimizer, mesh: Optional[Mesh] = None,
                       with_style: bool = False, drop_path: bool = True,
                       seed: int = 1234):
    """Stage-2 step: (state, audio_chunk, prev_motion, this_motion[, style])
    -> (state, metrics). dp-sharded batch, tp-sharded transformer weights.

    ``drop_path`` applies the reference's stochastic depth (models.py:35)
    with a per-step rng derived deterministically from the step counter."""

    def step(state: TrainState, audio_chunk, prev_motion, this_motion,
             style_motion=None):
        dp_rng = (jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
                  if drop_path else None)

        def loss_fn(p):
            return ar_loss(model, p, audio_chunk, prev_motion, this_motion,
                           style_motion, drop_path_rng=dp_rng)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    data3 = batch_sharding(mesh, 3)
    shardings = [None, batch_sharding(mesh, 2), data3, data3]  # audio is (B, T)
    if with_style:
        shardings.append(data3)
    return jax.jit(step, donate_argnums=(0,), in_shardings=tuple(shardings))
