"""ARTalk-TPU: a TPU-native (JAX/XLA/Pallas) speech-driven 3D head animation framework.

A ground-up re-design of the capabilities of the ARTalk reference system
(speech -> multi-scale autoregressive BSQ motion codes -> FLAME motion ->
rendered talking-head video), built TPU-first:

- all compute-path models are pure-functional JAX (jit/scan/vmap friendly,
  static shapes per 4-second window),
- hot kernels (fused attention, rasterization) are Pallas TPU kernels,
- multi-chip scaling goes through ``jax.sharding.Mesh`` + XLA collectives,
- the host runtime (audio/video I/O, checkpoint conversion) stays host-side
  behind the same engine interface the reference exposes
  (reference: /root/reference/inference.py:18-95).
"""

__version__ = "0.1.0"

from .config import ARConfig, VAEConfig, ModelConfig, load_config

__all__ = [
    "ARConfig",
    "VAEConfig",
    "ModelConfig",
    "load_config",
    "__version__",
]
