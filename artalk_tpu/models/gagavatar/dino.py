"""DINOv2 ViT-B/14 backbone + DPT feature pyramid, in JAX.

Equivalent of the reference's DINOBase (app/GAGAvatar/modules/dino_base.py:8-87):
a frozen DINOv2 vision transformer whose last four blocks feed a DPT-style
pyramid (1x1 projections, resize layers, image-concat, fusion blocks) that
produces a dense 256-channel feature map plus a global token.

Faithfully kept quirk: the torch-hub ``get_intermediate_layers`` strips the
CLS token, so the reference's "global" feature (dino_base.py:86:
``image_features[-1][:, 0]``) is actually the *first patch token* -- we
replicate that exactly for checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...ops.resize2d import resize_antialias, resize_bilinear
from .. import nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    patch_size: int = 14
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    image_size: int = 518           # pos embed pretrained at 37x37 patches
    layer_norm_eps: float = 1e-6


class DinoViT:
    def __init__(self, cfg: DinoConfig = DinoConfig()):
        self.cfg = cfg
        self.num_patches = (cfg.image_size // cfg.patch_size) ** 2

    def init(self, key: jax.Array) -> nn.Params:
        cfg = self.cfg
        d = cfg.hidden_size
        keys = jax.random.split(key, cfg.depth + 4)

        def block(k):
            ks = jax.random.split(k, 4)
            return {
                "norm1": nn.layer_norm_init(d),
                "qkv": nn.linear_init(ks[0], d, 3 * d),
                "proj": nn.linear_init(ks[1], d, d),
                "ls1": jnp.full((d,), 1.0),   # LayerScale gamma
                "norm2": nn.layer_norm_init(d),
                "fc1": nn.linear_init(ks[2], d, int(d * cfg.mlp_ratio)),
                "fc2": nn.linear_init(ks[3], int(d * cfg.mlp_ratio), d),
                "ls2": jnp.full((d,), 1.0),
            }

        blocks = [block(keys[i]) for i in range(cfg.depth)]
        fan_in = 3 * cfg.patch_size ** 2
        return {
            "patch_embed": {
                "w": nn.kaiming_uniform(keys[-1], (d, 3, cfg.patch_size, cfg.patch_size),
                                        fan_in=fan_in),
                "b": jnp.zeros((d,)),
            },
            "cls_token": jnp.zeros((1, 1, d)),
            "pos_embed": nn.trunc_normal(keys[-2], (1, self.num_patches + 1, d), std=0.02),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
            "norm": nn.layer_norm_init(d),
        }

    def _embed(self, params: nn.Params, images: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) -> (B, 1 + N, d) with cls + pos embeddings."""
        cfg = self.cfg
        pe = params["patch_embed"]
        x = jax.lax.conv_general_dilated(
            images, pe["w"], window_strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        b, d, gh, gw = x.shape
        x = x.reshape(b, d, gh * gw).transpose(0, 2, 1) + pe["b"]
        cls = jnp.broadcast_to(params["cls_token"], (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
        return x + params["pos_embed"]

    def _block(self, p: nn.Params, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        h = nn.layer_norm_apply(p["norm1"], x, eps=eps)
        qkv = nn.linear(p["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (nn.split_heads(t, cfg.num_heads) for t in (q, k, v))
        attn = nn.merge_heads(nn.sdpa(q, k, v, scale=q.shape[-1] ** -0.5))
        x = x + nn.linear(p["proj"], attn) * p["ls1"]
        h = nn.layer_norm_apply(p["norm2"], x, eps=eps)
        x = x + nn.linear(p["fc2"], nn.gelu_erf(nn.linear(p["fc1"], h))) * p["ls2"]
        return x

    def intermediate_layers(self, params: nn.Params, images: jnp.ndarray,
                            n: int = 4) -> List[jnp.ndarray]:
        """Last-n block outputs, final-norm applied, CLS stripped
        (torch-hub get_intermediate_layers(norm=True) semantics)."""
        cfg = self.cfg
        x = self._embed(params, images)
        take_from = cfg.depth - n
        outs = []
        for i in range(cfg.depth):
            x = self._block(jax.tree.map(lambda a: a[i], params["blocks"]), x)
            if i >= take_from:
                outs.append(x)
        eps = cfg.layer_norm_eps
        return [nn.layer_norm_apply(params["norm"], o, eps=eps)[:, 1:] for o in outs]


class DinoDPT:
    """DINOBase: DINOv2 + DPT pyramid -> (dense 256-ch map, global token)."""

    OUT_DIMS = (256, 512, 1024, 1024)
    HIDDEN = 256

    def __init__(self, output_dim: int = 256, dino_cfg: DinoConfig = DinoConfig()):
        self.output_dim = output_dim
        self.vit = DinoViT(dino_cfg)

    def init(self, key: jax.Array) -> nn.Params:
        keys = jax.random.split(key, 24)
        d = self.vit.cfg.hidden_size
        hid = self.HIDDEN

        def conv(k, cin, cout, ksize, bias=True):
            fan_in = cin * ksize * ksize
            p = {"w": nn.kaiming_uniform(k, (cout, cin, ksize, ksize), fan_in=fan_in)}
            if bias:
                p["b"] = jnp.zeros((cout,))
            return p

        def fusion(k):
            ks = jax.random.split(k, 5)
            return {
                "res1": {"conv1": conv(ks[0], hid, hid, 3), "conv2": conv(ks[1], hid, hid, 3)},
                "res2": {"conv1": conv(ks[2], hid, hid, 3), "conv2": conv(ks[3], hid, hid, 3)},
                "out": conv(ks[4], hid, hid, 1),
            }

        return {
            "dino": self.vit.init(keys[0]),
            "projects": [conv(keys[1 + i], d, od, 1) for i, od in enumerate(self.OUT_DIMS)],
            "resize0": conv(keys[5], self.OUT_DIMS[0], self.OUT_DIMS[0], 4),  # convT stride 4
            "resize1": conv(keys[6], self.OUT_DIMS[1], self.OUT_DIMS[1], 2),  # convT stride 2
            "resize3": conv(keys[7], self.OUT_DIMS[3], self.OUT_DIMS[3], 3),  # conv stride 2
            "layer_rn": [conv(keys[8 + i], od + 3, hid, 3, bias=False)
                         for i, od in enumerate(self.OUT_DIMS)],
            "refine": [fusion(keys[12 + i]) for i in range(4)],
            "output_conv": conv(keys[16], hid, self.output_dim, 3),
        }

    @staticmethod
    def _conv2d(p, x, stride=1, padding=0):
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride, stride),
            padding=[(padding, padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if "b" in p:
            y = y + p["b"][None, :, None, None]
        return y

    @staticmethod
    def _conv_transpose2d(p, x, stride):
        # torch ConvTranspose2d(k=stride, stride=stride, padding=0) weight
        # layout (in, out, k, k). transpose_kernel=True gives torch's
        # gradient-of-conv semantics (spatial flip + in/out channel swap), and
        # with it the torch weight reads as OIHW (O=in, I=out). Verified exact
        # (0.0 abs diff) vs torch in tests/test_reference_parity_gaga.py.
        y = jax.lax.conv_transpose(
            x, p["w"], strides=(stride, stride), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
        if "b" in p:
            y = y + p["b"][None, :, None, None]
        return y

    def _residual_unit(self, p, x):
        out = jax.nn.relu(x)
        out = self._conv2d(p["conv1"], out, padding=1)
        out = jax.nn.relu(out)
        out = self._conv2d(p["conv2"], out, padding=1)
        return out + x

    def _fusion(self, p, x, skip=None, size=None):
        if skip is not None:
            x = x + self._residual_unit(p["res1"], skip)
        x = self._residual_unit(p["res2"], x)
        if size is None:
            size = (x.shape[-2] * 2, x.shape[-1] * 2)
        x = resize_bilinear(x, size[0], size[1], align_corners=True)
        return self._conv2d(p["out"], x)

    def __call__(self, params: nn.Params, images: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, 3, 518, 518) in [0,1] -> (dense (B,256,H,W), global (B,768))."""
        mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
        std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
        normed = (images - mean) / std
        ph = images.shape[-2] // self.vit.cfg.patch_size
        pw = images.shape[-1] // self.vit.cfg.patch_size

        feats = self.vit.intermediate_layers(params["dino"], normed, n=4)
        out_feats = []
        for i, f in enumerate(feats):
            b, n, d = f.shape
            fmap = f.transpose(0, 2, 1).reshape(b, d, ph, pw)
            fmap = self._conv2d(params["projects"][i], fmap)
            if i == 0:
                fmap = self._conv_transpose2d(params["resize0"], fmap, stride=4)
            elif i == 1:
                fmap = self._conv_transpose2d(params["resize1"], fmap, stride=2)
            elif i == 3:
                fmap = self._conv2d(params["resize3"], fmap, stride=2, padding=1)
            img_small = resize_antialias(normed, fmap.shape[-2], fmap.shape[-1])
            fmap = jnp.concatenate([img_small, fmap], axis=1)
            out_feats.append(self._conv2d(params["layer_rn"][i], fmap, padding=1))

        r = params["refine"]
        path4 = self._fusion(r[0], out_feats[3], size=out_feats[2].shape[-2:])
        path3 = self._fusion(r[1], path4, out_feats[2], size=out_feats[1].shape[-2:])
        path2 = self._fusion(r[2], path3, out_feats[1], size=out_feats[0].shape[-2:])
        path1 = self._fusion(r[3], path2, out_feats[0])
        dense = self._conv2d(params["output_conv"], path1, padding=1)
        # reference quirk: "global" = first *patch* token of the last layer
        out_global = feats[-1][:, 0]
        return dense, out_global
