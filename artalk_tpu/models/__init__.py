"""Model zoo: motion tokenizer (BITWISE_VAE), AR generator, audio frontends,
style encoder, FLAME geometry, renderers."""

from .bitwise_vae import BitwiseVAE
from .style_encoder import StyleEncoder
from .wav2vec import Wav2VecEncoder
from .hubert import HubertEncoder
from .ar_model import BitwiseARModel
from .flame import FlameModel
from .renderer import MeshRenderer
from .renderer_extras import PointRenderer, TextureRenderer

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
