"""HuBERT audio encoder (third audio-encoder variant).

Equivalent of the reference's HubertModel wrapper (app/modules/hubert.py:
z-norm -> conv extractor -> optional linear resize of the conv features to a
target frame count -> feature projection -> encoder). The wrapper is dead
code in the reference (never exported/imported, SURVEY §2.1); it is
reproduced here so every audio-encoder family is available.

The architecture is the wav2vec2 "base" layout (group-norm conv0, post-LN
encoder), so this is a thin configuration of Wav2VecEncoder; HF HubertModel
state dicts convert through the same ``convert_wav2vec`` mapping (identical
parameter naming).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Wav2VecConfig, hubert_base_config
from ..ops.resample1d import resize_linear
from . import nn
from .wav2vec import Wav2VecEncoder, normalize_audio


class HubertEncoder:
    def __init__(self, cfg: Optional[Wav2VecConfig] = None):
        self.cfg = cfg if cfg is not None else hubert_base_config()
        self.inner = Wav2VecEncoder(self.cfg)

    def init(self, key: jax.Array) -> nn.Params:
        return self.inner.init(key)

    def __call__(self, params: nn.Params, audio: jnp.ndarray,
                 frame_num: Optional[int] = None) -> jnp.ndarray:
        """(B, T_samples) -> (B, frames, hidden). With ``frame_num`` the conv
        features are linearly resized to that length before the encoder
        (reference hubert.py: F.interpolate(..., mode='linear',
        align_corners=False) on the (N, C, L) features)."""
        audio = normalize_audio(audio)
        feats = self.inner.extract_features(params, audio)  # (B, T, C)
        if frame_num is not None:
            feats = resize_linear(feats, frame_num)
        return self.inner.encode(params, feats)

    def num_output_frames(self, num_samples: int) -> int:
        return self.cfg.num_output_frames(num_samples)
