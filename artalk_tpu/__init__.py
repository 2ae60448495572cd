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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: remote-TPU compiles of the full pipeline
# run minutes per jit shape, and every CLI/bench invocation is a fresh
# process. Opt out with ARTALK_NO_COMPILE_CACHE=1; an already-configured
# cache dir (env or explicit jax.config) is left untouched.
if not _os.environ.get("ARTALK_NO_COMPILE_CACHE") and \
        _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jax_artalk"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from .config import ARConfig, VAEConfig, ModelConfig, load_config

__all__ = [
    "ARConfig",
    "VAEConfig",
    "ModelConfig",
    "load_config",
    "__version__",
]
