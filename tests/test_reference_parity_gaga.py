"""GAGAvatar parity against the REAL reference torch classes.

Companion to test_reference_parity.py for the renderer stack: imports the
actual reference modules (app/GAGAvatar/models.py, modules/style_unet.py,
modules/dino_base.py), instantiates them with random weights, converts their
real ``state_dict()`` via ``utils/convert``, and asserts forward parity and
the exact ``GAGAvatar.pt['model']`` key layout end-to-end.

The only non-reference torch code here is ``_DinoVitStandIn``: the reference
builds its backbone with ``torch.hub.load('facebookresearch/dinov2',
'dinov2_vitb14')`` (dino_base.py:12), which needs network access. The
stand-in replicates that hub model's module layout (patch_embed.proj,
cls_token/pos_embed/mask_token, blocks.N.{norm1,attn.qkv,attn.proj,
ls1.gamma,norm2,mlp.fc1,mlp.fc2,ls2.gamma}, norm) and its
``get_intermediate_layers(norm=True, strip cls)`` semantics; the ViT *math*
itself is independently pinned against HF's real Dinov2Model in
tests/test_gagavatar_modules.py.
"""

from __future__ import annotations

import pathlib
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artalk_tpu.models.gagavatar.dino import DinoConfig, DinoDPT  # noqa: E402
from artalk_tpu.models.gagavatar.generators import (  # noqa: E402
    ConvGSGenerator, LinearGSGenerator)
from artalk_tpu.models.gagavatar.style_unet import StyleUNet  # noqa: E402
from artalk_tpu.utils import convert  # noqa: E402

from test_reference_parity import assert_same_tree, to_numpy_sd  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "app" / "GAGAvatar" / "models.py").exists(),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref():
    from _ref_stubs import import_reference

    return types.SimpleNamespace(
        models=import_reference("app.GAGAvatar.models"),
        style_unet=import_reference("app.GAGAvatar.modules.style_unet"),
        dino_base=import_reference("app.GAGAvatar.modules.dino_base"),
    )


# ---------------------------------------------------------------------------
# torch-hub dinov2 stand-in (layout-faithful, see module docstring)
# ---------------------------------------------------------------------------


class _LayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), 1e-5))

    def forward(self, x):
        return x * self.gamma


class _Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, c // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        out = nn.functional.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(b, n, c))


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, num_heads)
        self.ls1 = _LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, dim * 4)
        self.ls2 = _LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _PatchEmbed(nn.Module):
    def __init__(self, dim, patch_size):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch_size, stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _DinoVitStandIn(nn.Module):
    def __init__(self, dim=768, depth=12, num_heads=12, patch_size=14,
                 img_size=518):
        super().__init__()
        n = (img_size // patch_size) ** 2
        self.patch_embed = _PatchEmbed(dim, patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.mask_token = nn.Parameter(torch.zeros(1, dim))  # layout only
        self.blocks = nn.ModuleList(_Block(dim, num_heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def get_intermediate_layers(self, x, n=1):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i >= len(self.blocks) - n:
                outs.append(x)
        # hub semantics: final norm applied, cls stripped
        return tuple(self.norm(o)[:, 1:] for o in outs)


# ---------------------------------------------------------------------------
# GS generators (real reference classes, models.py:141-233)
# ---------------------------------------------------------------------------


def test_linear_gs_generator_parity(ref, rng):
    torch.manual_seed(0)
    ref_gen = ref.models.LinearGSGenerator(in_dim=64, dir_dim=27).eval()
    params = convert.convert_gs_generator_linear(to_numpy_sd(ref_gen))
    mine = LinearGSGenerator(in_dim=64, dir_dim=27)
    assert_same_tree(params, mine.init(jax.random.key(0)))

    feats = rng.standard_normal((2, 10, 64)).astype(np.float32)
    direnc = rng.standard_normal((2, 27)).astype(np.float32)
    with torch.no_grad():
        want = ref_gen(torch.from_numpy(feats), torch.from_numpy(direnc))
    got = mine(params, jnp.asarray(feats), jnp.asarray(direnc))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                   atol=1e-5, err_msg=k)


def test_conv_gs_generator_parity(ref, rng):
    """Includes the reference's colors[..., :3] width-column sigmoid quirk
    (models.py:214-216)."""
    torch.manual_seed(0)
    ref_gen = ref.models.ConvGSGenerator(in_dim=64, dir_dim=27).eval()
    params = convert.convert_gs_generator_conv(to_numpy_sd(ref_gen))
    mine = ConvGSGenerator(in_dim=64, dir_dim=27)
    assert_same_tree(params, mine.init(jax.random.key(0)))

    feats = rng.standard_normal((2, 64, 8, 8)).astype(np.float32)
    direnc = rng.standard_normal((2, 27)).astype(np.float32)
    with torch.no_grad():
        want = ref_gen(torch.from_numpy(feats), torch.from_numpy(direnc))
    got = mine(params, jnp.asarray(feats), jnp.asarray(direnc))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                   atol=1e-5, err_msg=k)


# ---------------------------------------------------------------------------
# StyleUNet (real reference class, style_unet.py:13-118 + style_clean.py)
# ---------------------------------------------------------------------------


def test_style_unet_parity(ref, rng):
    torch.manual_seed(0)
    ref_unet = ref.style_unet.StyleUNet(
        in_size=32, out_size=32, in_dim=8, out_dim=3).eval()
    params = convert.convert_style_unet(to_numpy_sd(ref_unet))
    mine = StyleUNet(in_size=32, out_size=32, in_dim=8, out_dim=3)
    assert_same_tree(params, mine.init(jax.random.key(0)))

    x = rng.standard_normal((2, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_unet(torch.from_numpy(x), randomize_noise=False).numpy()
    got = np.asarray(mine(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# DINOBase DPT head (real reference class, dino_base.py:8-88)
# ---------------------------------------------------------------------------

DINO_SMALL = dict(dim=96, depth=4, num_heads=4, patch_size=14, img_size=70)


def test_dino_dpt_parity(ref, rng, monkeypatch):
    torch.manual_seed(0)
    standin = _DinoVitStandIn(**DINO_SMALL)
    monkeypatch.setattr(torch.hub, "load",
                        lambda repo, model, pretrained=False: standin)
    ref_dino = ref.dino_base.DINOBase(output_dim=16).eval()

    cfg = DinoConfig(hidden_size=DINO_SMALL["dim"], depth=DINO_SMALL["depth"],
                     num_heads=DINO_SMALL["num_heads"],
                     image_size=DINO_SMALL["img_size"])
    mine = DinoDPT(output_dim=16, dino_cfg=cfg)
    params = convert.convert_dino_dpt(to_numpy_sd(ref_dino))
    assert_same_tree(params, mine.init(jax.random.key(0)))

    images = rng.random((1, 3, 70, 70)).astype(np.float32)
    with torch.no_grad():
        want_dense, want_global = ref_dino(torch.from_numpy(images))
    got_dense, got_global = mine(params, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(got_global), want_global.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dense), want_dense.numpy(),
                               atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Full GAGAvatar.pt['model'] key layout end-to-end
# ---------------------------------------------------------------------------


def test_full_gagavatar_checkpoint_layout(ref, monkeypatch, tmp_path):
    """Builds the exact module composition of GAGAvatar.__init__
    (models.py:19-32) out of the REAL reference classes (hub backbone
    stand-in at full dinov2_vitb14 geometry) and proves convert_gagavatar
    maps its complete state dict onto this framework's parameter tree --
    the key-layout check BENCH-day assets will exercise."""
    torch.manual_seed(0)
    monkeypatch.setattr(
        torch.hub, "load",
        lambda repo, model, pretrained=False: _DinoVitStandIn())

    class _GagaLayout(nn.Module):
        # attribute names exactly as models.py:19-32
        def __init__(self):
            super().__init__()
            self.base_model = ref.dino_base.DINOBase(output_dim=256)
            self.head_base = nn.Parameter(torch.randn(5023, 256))
            self.gs_generator_g = ref.models.LinearGSGenerator(
                in_dim=1024, dir_dim=27)
            self.gs_generator_l0 = ref.models.ConvGSGenerator(
                in_dim=256, dir_dim=27)
            self.gs_generator_l1 = ref.models.ConvGSGenerator(
                in_dim=256, dir_dim=27)
            self.upsampler = ref.style_unet.StyleUNet(
                in_size=512, out_size=512, in_dim=32, out_dim=3)

    sd = to_numpy_sd(_GagaLayout())
    params = convert.convert_gagavatar(sd)

    from artalk_tpu.models.gagavatar.avatar import GAGAvatar

    gaga = GAGAvatar(assets_dir=str(tmp_path), params={})
    shapes = jax.eval_shape(gaga.init, jax.random.PRNGKey(0))
    assert_same_tree(params, shapes)
