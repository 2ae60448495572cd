"""Loss functions for the two training stages."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.ar_model import BitwiseARModel
from ..models.bitwise_vae import BitwiseVAE


def vae_loss(vae: BitwiseVAE, params, prev_motion: jnp.ndarray,
             this_motion: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-1 tokenizer loss: L2 reconstruction of both windows + the BSQ
    entropy/commit aux terms (weights as in bitwise_vae.py:312-324)."""
    recon_prev, recon_this, aux = vae.reconstruct(params, prev_motion, this_motion)
    rec = (jnp.mean((recon_prev - prev_motion) ** 2)
           + jnp.mean((recon_this - this_motion) ** 2))
    aux_total = jnp.sum(aux) / aux.shape[0]  # mean over the two windows
    total = rec + aux_total
    return total, {"loss": total, "recon": rec, "aux": aux_total}


def ar_loss(model: BitwiseARModel, params, audio_chunk: jnp.ndarray,
            prev_motion: jnp.ndarray, this_motion: jnp.ndarray,
            style_motion: Optional[jnp.ndarray] = None,
            drop_path_rng: Optional[jax.Array] = None
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-2 generator loss: teacher-forced per-bit cross-entropy.

    The VAE (frozen for this stage -- gradients stopped) encodes the motion
    pair into target bits; the AR model predicts every scale level's bits from
    the previous-window prefix + audio condition under the VAR mask.
    ``drop_path_rng`` enables stochastic depth in the transformer (the
    regularizer the reference architecture declares, models.py:35).
    """
    vae_params = jax.lax.stop_gradient(params["vae"])
    prev_bits, this_bits = model.vae.encode_to_bits(vae_params, prev_motion, this_motion)

    # style conditioning (no CFG extrapolation at train time; the null token
    # learns from unconditioned batches)
    if style_motion is None:
        style_cond = params["null_style_cond"]
    else:
        from ..models import nn

        style = model.style_encoder(params["style_encoder"], style_motion)
        style_cond = nn.linear(params["style_cond_embed"], style)[:, None]

    prefix = model._prefix_from_bits(params, style_cond, prev_bits, tile=True)
    tokens = model.teacher_inputs(params, this_bits, style_cond)
    # the reference detaches the audio condition (frozen audio encoder,
    # models.py:95) -- keep the encoder out of the gradient path
    audio_cond = jax.lax.stop_gradient(model.audio_condition(params, audio_chunk))
    logits = model.forward_logits(params, tokens, audio_cond, prefix,
                                  drop_path_rng=drop_path_rng)  # (B,181,C,2)

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    target = this_bits  # (B, 181, C) in {0, 1}
    nll = -jnp.take_along_axis(log_probs, target[..., None], axis=-1)[..., 0]
    loss = jnp.mean(nll)
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == target).astype(jnp.float32))
    return loss, {"loss": loss, "bit_accuracy": acc}
