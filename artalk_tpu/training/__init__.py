"""Training: losses, optimizer states, and pjit-sharded train steps.

The reference ships no training code (README: 'in preparation'); this package
provides the natural training recipes for both model stages -- the BITWISE_VAE
motion tokenizer (recon + BSQ entropy/commit aux, mirroring the quantizer's
loss terms at bitwise_vae.py:316-327) and the audio-conditioned AR generator
(teacher-forced per-bit cross-entropy over the VAR mask) -- built for
multi-chip data/tensor parallelism over a jax.sharding.Mesh.
"""

from .losses import ar_loss, vae_loss
from .trainer import TrainState, make_ar_train_step, make_vae_train_step

__all__ = [
    "ar_loss",
    "vae_loss",
    "TrainState",
    "make_ar_train_step",
    "make_vae_train_step",
]
