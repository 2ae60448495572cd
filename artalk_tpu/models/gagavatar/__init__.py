"""GAGAvatar: one-shot Gaussian-splat photoreal head avatars.

TPU-native rebuild of the reference avatar stack (app/GAGAvatar/):
DINOv2-B/14 + DPT feature pyramid -> gaussian generators over FLAME vertices
and two camera-ray planes -> Pallas 32-channel gaussian splatting ->
StyleGAN2-CSFT super-resolution.
"""

from .avatar import GAGAvatar

__all__ = ["GAGAvatar"]
