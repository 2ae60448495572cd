"""Typed configuration for ARTalk-TPU.

Mirrors the reference JSON schema (reference: assets/config.json, consumed raw
at app/models.py:17-45 and app/modules/bitwise_vae.py:19-26) so reference
config files load verbatim, while giving this framework typed, validated
dataclasses and TPU-specific knobs the reference does not have.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """BITWISE_VAE motion tokenizer config (reference: assets/config.json VAE_CONFIG)."""

    motion_dim: int = 106
    code_dim: int = 32
    depth: int = 8
    num_heads: int = 8
    hidden_dim: int = 512
    patch_nums: Sequence[int] = (1, 5, 25, 50, 100)

    @property
    def window(self) -> int:
        """Frames per AR window = finest scale (reference: app/models.py:78)."""
        return int(self.patch_nums[-1])

    @property
    def total_tokens(self) -> int:
        """Sum of all scales = AR slots per window (181 for the default schedule)."""
        return int(sum(self.patch_nums))

    @classmethod
    def from_json_dict(cls, d: dict) -> "VAEConfig":
        return cls(
            motion_dim=d.get("MOTION_DIM", 106),
            code_dim=d.get("V_CODE_DIM", 32),
            depth=d.get("T_DEPTH", 8),
            num_heads=d.get("T_NUM_HEADS", 8),
            hidden_dim=d.get("T_HIDDEN_DIM", 512),
            patch_nums=tuple(d.get("V_PATCH_NUMS", (1, 5, 25, 50, 100))),
        )

    def to_json_dict(self) -> dict:
        return {
            "MOTION_DIM": self.motion_dim,
            "V_CODE_DIM": self.code_dim,
            "T_DEPTH": self.depth,
            "T_NUM_HEADS": self.num_heads,
            "T_HIDDEN_DIM": self.hidden_dim,
            "V_PATCH_NUMS": list(self.patch_nums),
        }


@dataclasses.dataclass(frozen=True)
class ARConfig:
    """Autoregressive generator config (reference: assets/config.json AR_CONFIG)."""

    depth: int = 12
    num_heads: int = 12
    prev_ratio: int = 1
    audio_encoder: str = "wav2vec"  # 'wav2vec' | 'mimi' (app/models.py:24-32)
    embed_dim: int = 768            # fixed in the reference (app/models.py:19)
    style_dim: int = 128            # StyleEncoder output dim (style_encoder.py:16)
    mlp_ratio: float = 4.0
    audio_dim: int | None = None    # override conditioning width (tests/small models)

    @property
    def audio_feature_dim(self) -> int:
        """Conditioning width per audio encoder (reference: app/models.py:27,30)."""
        if self.audio_dim is not None:
            return self.audio_dim
        return {"wav2vec": 1024, "mimi": 512}[self.audio_encoder]

    @classmethod
    def from_json_dict(cls, d: dict) -> "ARConfig":
        return cls(
            depth=d.get("T_DEPTH", 12),
            num_heads=d.get("T_NUM_HEADS", 12),
            prev_ratio=d.get("PREV_RATIO", 1),
            audio_encoder=d.get("AUDIO_ENCODER", "wav2vec"),
        )

    def to_json_dict(self) -> dict:
        return {
            "T_DEPTH": self.depth,
            "T_NUM_HEADS": self.num_heads,
            "PREV_RATIO": self.prev_ratio,
            "AUDIO_ENCODER": self.audio_encoder,
        }


@dataclasses.dataclass(frozen=True)
class Wav2VecConfig:
    """wav2vec2-xls-r-300m architecture constants.

    The reference builds HF ``Wav2Vec2Model`` from the facebook/wav2vec2-xls-r-300m
    config (app/models.py:25-27); these are that model's architecture hyper-params,
    pinned here so no network access is needed.
    """

    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"   # per-conv-layer LayerNorm (HF enum value)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    layer_norm_eps: float = 1e-5
    # Pallas blockwise attention in the encoder (full-f32 softmax path; the
    # encoder is frozen/inference-only in this framework so no VJP is needed)
    use_flash_attention: bool = False

    def num_output_frames(self, num_samples: int) -> int:
        """Output sequence length of the conv feature extractor."""
        length = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


def hubert_base_config(**overrides) -> Wav2VecConfig:
    """facebook/hubert-base-ls960 architecture constants (the config behind
    the reference's HubertModel wrapper, app/modules/hubert.py): group-norm
    conv0, bias-free convs, post-LN 12-layer 768-wide encoder."""
    kwargs = dict(
        conv_dim=(512, 512, 512, 512, 512, 512, 512),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_bias=False,
        feat_extract_norm="group",
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False,
    )
    kwargs.update(overrides)
    return Wav2VecConfig(**kwargs)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Top-level model config bundling AR + VAE (+ audio) sub-configs."""

    ar: ARConfig = dataclasses.field(default_factory=ARConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    wav2vec: Wav2VecConfig = dataclasses.field(default_factory=Wav2VecConfig)
    mimi: "object" = None  # MimiEncoderConfig; lazy default to avoid import cycle
    fps: float = 25.0
    sample_rate: int = 16000
    # run the wav2vec2 encoder in bfloat16 (MXU-native; ~2x faster audio
    # conditioning). Off by default: f32 keeps code bits reference-exact.
    bf16_audio: bool = False
    # run the AR transformer blocks in bfloat16 during window decode. The
    # decode re-reads every block weight once per scale level (5x per
    # window), so halving weight bytes cuts the HBM traffic that bounds the
    # latency-dominated small-matmul chain. Norms/softmax stay f32 (the nn
    # helpers upcast internally); logits and the bit head stay f32. Off by
    # default: f32 keeps code bits reference-exact.
    bf16_ar: bool = False
    # decode the AR block walk with the fused weight-streaming Pallas kernel
    # (ops/ar_block_stack.py): one pallas_call per scale level instead of a
    # 12-block XLA scan -- weights stream HBM->VMEM double-buffered while
    # activations stay VMEM-resident. Opt-in (ARTALK_AR_FUSED=1): results
    # are parity-tested to atol against the XLA path but not bit-pinned
    # (the fc2 contraction is tiled). Pairs best with bf16_ar. Also engages
    # the batch-1 encoder kernel (ops/encoder_block_stack.py).
    fused_ar: bool = False
    # weight-only int8 quantization of BOTH fused kernels' weight packs
    # (symmetric per-output-channel; compute stays bf16, scales fold into
    # each tile's f32 result): halves the streamed weight bytes again vs
    # bf16. Only affects the fused Pallas paths -- the XLA fallbacks keep
    # the bf16_ar/bf16_audio dtype. Opt-in (ARTALK_AR_PRECISION=int8).
    int8_ar: bool = False

    def __post_init__(self):
        if self.mimi is None:
            from .models.mimi import MimiEncoderConfig

            object.__setattr__(self, "mimi", MimiEncoderConfig())

    @property
    def window_audio_samples(self) -> int:
        """Audio samples per AR window (reference: app/models.py:80)."""
        return int(self.vae.window / self.fps * self.sample_rate)

    @classmethod
    def from_json_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            ar=ARConfig.from_json_dict(d.get("AR_CONFIG", {})),
            vae=VAEConfig.from_json_dict(d.get("VAE_CONFIG", {})),
        )

    def to_json_dict(self) -> dict:
        return {"AR_CONFIG": self.ar.to_json_dict(), "VAE_CONFIG": self.vae.to_json_dict()}


def load_config(path: str) -> ModelConfig:
    """Load a reference-format config.json into a typed ModelConfig."""
    with open(path) as f:
        return ModelConfig.from_json_dict(json.load(f))
