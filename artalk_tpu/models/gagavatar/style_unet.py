"""StyleUNet super-resolver: UNet SFT conditions + StyleGAN2 generator.

Equivalent of the reference's GFPGAN-style upsampler
(app/GAGAvatar/modules/style_unet.py:13-252, style_clean.py:168-313): a UNet
over the 32-channel splat render produces a 512-d style code and per-scale
SFT scale/shift maps; a StyleGAN2 generator with weight (de)modulation renders
the final RGB, modulated by those conditions.

TPU notes: torch's per-sample grouped-conv trick for modulated conv
(style_clean.py:249-259) becomes a vmap over the batch of a plain conv with
per-sample modulated weights -- XLA folds the modulation into the conv.
Noise injection uses the stored per-layer noise buffers (the deterministic
``randomize_noise=False`` path) so inference is reproducible.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

from ...ops.resize2d import resize_bilinear, resize_bilinear_nhwc
from .. import nn

UNET_CHANNELS = {4: 256, 8: 256, 16: 256, 32: 256, 64: 128, 128: 64, 256: 32,
                 512: 16, 1024: 8}
GAN_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128, 256: 64,
                512: 32, 1024: 16}


def _conv_init(key, cin, cout, k, bias=True):
    fan_in = cin * k * k
    p = {"w": nn.kaiming_uniform(key, (cout, cin, k, k), fan_in=fan_in)}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _conv(p, x, stride=1, pad=0, nhwc=False):
    """Conv with params stored in torch (cout, cin, k, k) layout; the NHWC
    path transposes the weight at trace time (XLA folds the transpose)."""
    if nhwc:
        y = jax.lax.conv_general_dilated(
            x, p["w"].transpose(2, 3, 1, 0), (stride, stride),
            [(pad, pad)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "b" in p:
            y = y + p["b"][None, None, None, :]
        return y
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _resize2x(x, up: bool, nhwc=False):
    h, w = (x.shape[1], x.shape[2]) if nhwc else x.shape[-2:]
    oh, ow = (h * 2, w * 2) if up else (h // 2, w // 2)
    y = (resize_bilinear_nhwc(x, oh, ow) if nhwc
         else resize_bilinear(x, oh, ow))
    return y.astype(x.dtype)  # f32 resize matrices must not upcast bf16 paths


class StyleUNet:
    def __init__(self, in_size: int = 512, out_size: int = 512,
                 in_dim: int = 32, out_dim: int = 3, num_style_feat: int = 512,
                 num_mlp: int = 8, layout: str = "nchw"):
        assert in_size <= out_size, "downscaling front-end not implemented"
        assert layout in ("nchw", "nhwc")
        self.in_size, self.out_size = in_size, out_size
        self.in_dim, self.out_dim = in_dim, out_dim
        self.num_style_feat = num_style_feat
        self.num_mlp = num_mlp
        self.log_size = int(math.log2(out_size))
        # layout: internal compute layout. The public interface (input,
        # output, params) is always the torch-convention NCHW; "nhwc"
        # transposes once at entry/exit and runs every conv channels-last.
        self.layout = layout
        self.nhwc = layout == "nhwc"
        self.gan = StyleGAN2GeneratorCSFT(out_size, out_dim, num_style_feat,
                                          num_mlp, layout=layout)

    def init(self, key: jax.Array) -> nn.Params:
        keys = jax.random.split(key, 128)
        ch = UNET_CHANNELS
        k = iter(range(128))

        def res_block(cin, cout):
            return {
                "conv1": _conv_init(keys[next(k)], cin, cin, 3),
                "conv2": _conv_init(keys[next(k)], cin, cout, 3),
                "skip": _conv_init(keys[next(k)], cin, cout, 1, bias=False),
            }

        down, up, to_rgb, cond_scale, cond_shift = [], [], [], [], []
        cin = ch[self.out_size]
        for i in range(self.log_size, 2, -1):
            down.append(res_block(cin, ch[2 ** (i - 1)]))
            cin = ch[2 ** (i - 1)]
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            up.append(res_block(cin, cout))
            to_rgb.append(_conv_init(keys[next(k)], cout, 3, 1))
            cond_scale.append({
                "c1": _conv_init(keys[next(k)], cout, cout, 3),
                "c2": _conv_init(keys[next(k)], cout, 2 * cout, 3),
            })
            cond_shift.append({
                "c1": _conv_init(keys[next(k)], cout, cout, 3),
                "c2": _conv_init(keys[next(k)], cout, 2 * cout, 3),
            })
            cin = cout
        return {
            "first": _conv_init(keys[next(k)], self.in_dim, ch[self.out_size], 1),
            "down": down,
            "final_conv": _conv_init(keys[next(k)], ch[8], ch[4], 3),
            "up": up,
            "to_rgb": to_rgb,
            "cond_scale": cond_scale,
            "cond_shift": cond_shift,
            "final_linear": nn.linear_init(keys[next(k)], ch[4] * 16, self.num_style_feat),
            "gan": self.gan.init(keys[next(k)]),
        }

    def _res(self, p, x, up: bool):
        c = self.nhwc
        out = _lrelu(_conv(p["conv1"], x, pad=1, nhwc=c))
        out = _resize2x(out, up, nhwc=c)
        out = _lrelu(_conv(p["conv2"], out, pad=1, nhwc=c))
        return out + _conv(p["skip"], _resize2x(x, up, nhwc=c), nhwc=c)

    def __call__(self, params: nn.Params, x: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
        """(B, in_dim, S, S) -> (B, out_dim, out_size, out_size), sigmoid.

        compute_dtype: optional jnp.bfloat16 runs every conv/matmul in bf16
        (weights cast at trace time; XLA folds the casts) and returns to f32
        for the final sigmoid. Measured ~5% on a v5e (10.6 -> 10.1 ms at
        512^2): these low-channel convs are layout/VPU-bound, not MXU-bound,
        so halving matmul width barely moves the total. Kept because it is
        free and compounds with any future layout work; the output feeds
        8-bit video, where the ~1e-2 relative noise is at the quantization
        floor. Default f32 = reference parity.
        """
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == jnp.float32 else a, params)
            x = x.astype(compute_dtype)
        if x.shape[-1] < self.out_size:
            # cast back: the f32 resize matrices must not silently promote a
            # bf16 compute path to f32 for the entire network
            x = resize_bilinear(x, self.out_size, self.out_size).astype(x.dtype)
        c = self.nhwc
        if c:
            x = x.transpose(0, 2, 3, 1)
        feat = _lrelu(_conv(params["first"], x, nhwc=c))
        skips: List[jnp.ndarray] = []
        for p in params["down"]:
            feat = self._res(p, feat, up=False)
            skips.insert(0, feat)
        feat = _lrelu(_conv(params["final_conv"], feat, pad=1, nhwc=c))
        # final_linear expects the torch C-major flatten of (B, C, 4, 4)
        flat = feat.transpose(0, 3, 1, 2) if c else feat
        style = nn.linear(params["final_linear"], flat.reshape(flat.shape[0], -1))
        conditions = []
        for i, p in enumerate(params["up"]):
            feat = feat + skips[i]
            feat = self._res(p, feat, up=True)
            cs = params["cond_scale"][i]
            conditions.append(_conv(cs["c2"], _lrelu(_conv(cs["c1"], feat, pad=1, nhwc=c)),
                                    pad=1, nhwc=c))
            ct = params["cond_shift"][i]
            conditions.append(_conv(ct["c2"], _lrelu(_conv(ct["c1"], feat, pad=1, nhwc=c)),
                                    pad=1, nhwc=c))
        image = self.gan(params["gan"], style, conditions)
        if c:
            image = image.transpose(0, 3, 1, 2)
        return jax.nn.sigmoid(image.astype(jnp.float32))


class StyleGAN2GeneratorCSFT:
    def __init__(self, out_size: int, out_dim: int = 3,
                 num_style_feat: int = 512, num_mlp: int = 8,
                 layout: str = "nchw"):
        self.out_size = out_size
        self.out_dim = out_dim
        self.num_style_feat = num_style_feat
        self.num_mlp = num_mlp
        self.log_size = int(math.log2(out_size))
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.num_latent = self.log_size * 2 - 2
        self.nhwc = layout == "nhwc"  # params stay NCHW-shaped either way

    def _modconv_init(self, key, cin, cout, k, demodulate=True):
        k1, k2 = jax.random.split(key)
        return {
            "modulation": {
                "w": nn.kaiming_uniform(k1, (self.num_style_feat, cin),
                                        fan_in=self.num_style_feat, a=0.0),
                "b": jnp.ones((cin,)),  # bias_fill=1 (style_clean.py:233)
            },
            "weight": jax.random.normal(k2, (1, cout, cin, k, k)) / math.sqrt(cin * k * k),
        }

    def init(self, key: jax.Array) -> nn.Params:
        keys = jax.random.split(key, 80)
        ch = GAN_CHANNELS
        k = iter(range(80))
        mlp = [nn.linear_init(keys[next(k)], self.num_style_feat, self.num_style_feat)
               for _ in range(self.num_mlp)]

        def style_conv(cin, cout, ksize):
            return {
                "mod": self._modconv_init(keys[next(k)], cin, cout, ksize),
                "noise_weight": jnp.zeros(()),
                "bias": jnp.zeros((1, cout, 1, 1)),
            }

        def to_rgb(cin):
            return {
                "mod": self._modconv_init(keys[next(k)], cin, self.out_dim, 1,
                                          demodulate=False),
                "bias": jnp.zeros((1, self.out_dim, 1, 1)),
            }

        convs, rgbs, noises = [], [], []
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            convs.append(style_conv(cin, cout, 3))   # upsample conv
            convs.append(style_conv(cout, cout, 3))  # regular conv
            rgbs.append(to_rgb(cout))
            cin = cout
        for layer_idx in range(self.num_layers):
            res = 2 ** ((layer_idx + 5) // 2)
            noises.append(jax.random.normal(keys[next(k)], (1, 1, res, res)))
        return {
            "style_mlp": mlp,
            "constant_input": jax.random.normal(keys[next(k)], (1, ch[4], 4, 4)),
            "conv1": style_conv(ch[4], ch[4], 3),
            "to_rgb1": to_rgb(ch[4]),
            "convs": convs,
            "to_rgbs": rgbs,
            "noises": noises,
        }

    def _modulated_conv(self, p, x, style, demodulate=True, upsample=False):
        """StyleGAN2 weight (de)modulation (style_clean.py:240-260)."""
        s = nn.linear(p["modulation"], style)               # (B, cin)
        weight = p["weight"] * s[:, None, :, None, None]    # (B, cout, cin, k, k)
        if demodulate:
            # f32 accumulation: a bf16 sum over cin*k*k squares is too lossy
            demod = jax.lax.rsqrt(
                jnp.sum(weight.astype(jnp.float32) ** 2, axis=(2, 3, 4)) + 1e-8)
            weight = weight * demod[:, :, None, None, None].astype(weight.dtype)
        if upsample:
            x = _resize2x(x, up=True, nhwc=self.nhwc)
        pad = p["weight"].shape[-1] // 2

        if self.nhwc:
            def conv_one(xi, wi):
                return jax.lax.conv_general_dilated(
                    xi[None], wi.transpose(2, 3, 1, 0), (1, 1),
                    [(pad, pad)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        else:
            def conv_one(xi, wi):
                return jax.lax.conv_general_dilated(
                    xi[None], wi, (1, 1), [(pad, pad)] * 2,
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]

        return jax.vmap(conv_one)(x, weight)

    def _chan_last(self, a):
        """(1, C, H, W)-shaped param -> compute layout."""
        return a.transpose(0, 2, 3, 1) if self.nhwc else a

    def _style_conv(self, p, x, style, noise, upsample=False):
        out = self._modulated_conv(p["mod"], x, style, True, upsample) * (2 ** 0.5)
        out = out + p["noise_weight"] * self._chan_last(noise)
        out = out + self._chan_last(p["bias"])
        return _lrelu(out)

    def _to_rgb(self, p, x, style, skip=None):
        out = self._modulated_conv(p["mod"], x, style, demodulate=False)
        out = out + self._chan_last(p["bias"])
        if skip is not None:
            out = out + _resize2x(skip, up=True, nhwc=self.nhwc)
        return out

    def __call__(self, params: nn.Params, style: jnp.ndarray,
                 conditions: List[jnp.ndarray]) -> jnp.ndarray:
        # normalize + MLP (norm accumulated in f32 regardless of compute dtype)
        s = style * jax.lax.rsqrt(
            jnp.mean(style.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            + 1e-8).astype(style.dtype)
        for p in params["style_mlp"]:
            s = _lrelu(nn.linear(p, s))
        noises = params["noises"]
        b = style.shape[0]
        const = self._chan_last(params["constant_input"])
        out = jnp.broadcast_to(const, (b,) + const.shape[1:])
        out = self._style_conv(params["conv1"], out, s, noises[0])
        skip = self._to_rgb(params["to_rgb1"], out, s)
        i = 1
        for idx in range(len(params["to_rgbs"])):
            out = self._style_conv(params["convs"][2 * idx], out, s,
                                   noises[2 * idx + 1], upsample=True)
            if i < len(conditions):
                out = out * conditions[i - 1] + conditions[i]
            out = self._style_conv(params["convs"][2 * idx + 1], out, s,
                                   noises[2 * idx + 2])
            skip = self._to_rgb(params["to_rgbs"][idx], out, s, skip)
            i += 2
        return skip
