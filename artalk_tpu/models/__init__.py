"""Model zoo: motion tokenizer (BITWISE_VAE), AR generator, audio frontends,
style encoder, FLAME geometry, renderers."""

from .bitwise_vae import BitwiseVAE
from .style_encoder import StyleEncoder
from .wav2vec import Wav2VecEncoder
from .hubert import HubertEncoder
from .ar_model import BitwiseARModel
from .flame import FlameModel

_LAZY = {
    # renderers pull in the Pallas kernels; import only on use so audio-only
    # and training paths don't pay for them
    "MeshRenderer": ".renderer",
    "PointRenderer": ".renderer_extras",
    "TextureRenderer": ".renderer_extras",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "BitwiseVAE",
    "StyleEncoder",
    "Wav2VecEncoder",
    "HubertEncoder",
    "BitwiseARModel",
    "FlameModel",
    "MeshRenderer",
    "PointRenderer",
    "TextureRenderer",
]
