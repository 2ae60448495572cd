"""GAGAvatar sub-module tests: DINOv2 parity vs HF, generators, StyleUNet."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from artalk_tpu.models.gagavatar.dino import DinoConfig, DinoViT
from artalk_tpu.models.gagavatar.generators import (
    ConvGSGenerator, LinearGSGenerator, build_points_planes, harmonic_embedding,
    transform_emoca_to_p3d)
from artalk_tpu.models.gagavatar.style_unet import StyleUNet

SMALL_DINO = DinoConfig(patch_size=14, hidden_size=64, depth=2, num_heads=4,
                        image_size=56)


def _hf_dinov2(cfg: DinoConfig):
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, mlp_ratio=4,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        layerscale_value=1.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
    )
    return Dinov2Model(hf_cfg).eval()


def _convert_hf_dino(model, cfg: DinoConfig):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    blocks = []
    for i in range(cfg.depth):
        pre = f"encoder.layer.{i}"
        qw = sd[f"{pre}.attention.attention.query.weight"]
        kw = sd[f"{pre}.attention.attention.key.weight"]
        vw = sd[f"{pre}.attention.attention.value.weight"]
        qb = sd[f"{pre}.attention.attention.query.bias"]
        kb = sd[f"{pre}.attention.attention.key.bias"]
        vb = sd[f"{pre}.attention.attention.value.bias"]
        blocks.append({
            "norm1": {"scale": sd[f"{pre}.norm1.weight"], "bias": sd[f"{pre}.norm1.bias"]},
            "qkv": {"w": np.concatenate([qw, kw, vw], 0).T.copy(),
                    "b": np.concatenate([qb, kb, vb], 0)},
            "proj": {"w": sd[f"{pre}.attention.output.dense.weight"].T.copy(),
                     "b": sd[f"{pre}.attention.output.dense.bias"]},
            "ls1": sd[f"{pre}.layer_scale1.lambda1"],
            "norm2": {"scale": sd[f"{pre}.norm2.weight"], "bias": sd[f"{pre}.norm2.bias"]},
            "fc1": {"w": sd[f"{pre}.mlp.fc1.weight"].T.copy(),
                    "b": sd[f"{pre}.mlp.fc1.bias"]},
            "fc2": {"w": sd[f"{pre}.mlp.fc2.weight"].T.copy(),
                    "b": sd[f"{pre}.mlp.fc2.bias"]},
            "ls2": sd[f"{pre}.layer_scale2.lambda1"],
        })
    return {
        "patch_embed": {"w": sd["embeddings.patch_embeddings.projection.weight"],
                        "b": sd["embeddings.patch_embeddings.projection.bias"]},
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks),
        "norm": {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]},
    }


def test_dino_vit_matches_hf(rng):
    torch.manual_seed(0)
    hf = _hf_dinov2(SMALL_DINO)
    vit = DinoViT(SMALL_DINO)
    params = _convert_hf_dino(hf, SMALL_DINO)
    images = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(images)).last_hidden_state.numpy()
    # HF last_hidden_state = final-norm applied, cls included; ours strips cls
    got = np.asarray(vit.intermediate_layers(params, jnp.asarray(images), n=1)[-1])
    np.testing.assert_allclose(got, ref[:, 1:], atol=3e-5)


def test_harmonic_embedding_matches_pytorch3d_layout(rng):
    """Coordinate-major sin/cos + appended input, matching pytorch3d's
    HarmonicEmbedding (used at GAGAvatar/models.py:25,70)."""
    x = rng.standard_normal((2, 3)).astype(np.float32)
    out = np.asarray(harmonic_embedding(jnp.asarray(x), n_harmonic=4))
    assert out.shape == (2, 4 * 2 * 3 + 3)
    freqs = 2.0 ** np.arange(4)
    expected_sin = np.sin((x[..., :, None] * freqs).reshape(2, -1))
    np.testing.assert_allclose(out[:, :12], expected_sin, atol=1e-6)
    np.testing.assert_allclose(out[:, 24:], x, atol=1e-6)


def test_linear_gs_generator_shapes(rng):
    gen = LinearGSGenerator(in_dim=64, dir_dim=27)
    params = gen.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((1, 10, 64)).astype(np.float32))
    direnc = jnp.asarray(rng.standard_normal((1, 27)).astype(np.float32))
    out = gen(params, feats, direnc)
    assert out["colors"].shape == (1, 10, 32)
    assert out["opacities"].shape == (1, 10, 1)
    assert out["scales"].shape == (1, 10, 3)
    assert out["rotations"].shape == (1, 10, 4)
    o = np.asarray(out["opacities"])
    s = np.asarray(out["scales"])
    r = np.asarray(out["rotations"])
    assert (0 <= o).all() and (o <= 1).all()
    assert (0 <= s).all() and (s <= 0.05).all()
    # reference quirk (models.py:191-192): F.normalize runs over the VERTEX
    # axis (dim=1), so the unit norm is per quaternion-component column
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)


def test_conv_gs_generator_shapes(rng):
    gen = ConvGSGenerator(in_dim=16, dir_dim=27)
    params = gen.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((1, 16, 8, 8)).astype(np.float32))
    direnc = jnp.asarray(rng.standard_normal((1, 27)).astype(np.float32))
    out = gen(params, feats, direnc)
    for key, ch in [("colors", 32), ("opacities", 1), ("scales", 3),
                    ("rotations", 4), ("positions", 1)]:
        assert out[key].shape == (1, 64, ch), key


def test_build_points_planes_geometry():
    """Plane points lie at the camera distance along the rays; identity-ish
    transform gives a centered plane."""
    transform = np.array([[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 5000.0 / 512]],
                         np.float32)
    planes = build_points_planes(8, transform)
    assert planes["plane_points"].shape == (64, 3)
    assert planes["plane_dirs"].shape == (3,)
    np.testing.assert_allclose(planes["plane_dirs"], [0, 0, -1], atol=1e-6)
    # central ray point sits near the origin plane at distance |origin . dir|
    center = planes["plane_points"].reshape(8, 8, 3)
    assert abs(center[:, :, 2].mean()) < 1e-3


def test_transform_emoca_to_p3d_identity():
    rot = jnp.zeros((1, 3))
    t = np.asarray(transform_emoca_to_p3d(rot))
    assert t.shape == (1, 3, 4)
    # zero rotation -> just the axis flip diag(-1, 1, -1), inverted = itself
    np.testing.assert_allclose(t[0, :3, :3], np.diag([-1.0, 1.0, -1.0]), atol=1e-6)
    np.testing.assert_allclose(t[0, :, 3], [0, 0, 5000.0 / 512], atol=1e-6)


def test_style_unet_small(rng):
    """End-to-end StyleUNet at 64px: shape, range, determinism."""
    unet = StyleUNet(in_size=64, out_size=64, in_dim=8, out_dim=3)
    params = unet.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 64)).astype(np.float32))
    out = unet(params, x)
    assert out.shape == (1, 3, 64, 64)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (0 <= o).all() and (o <= 1).all()
    np.testing.assert_array_equal(o, np.asarray(unet(params, x)))


def test_prep_frame_chunk_matches_sequential(rng):
    """Chunked FLAME+EMA+camera prep == the sequential per-frame reference
    path (build_forward_batch semantics), incl. carry threading across chunks
    and padding frames frozen out of the EMA state."""
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.gagavatar.avatar import FOREHEAD_INDICES, prep_frame_chunk
    from artalk_tpu.utils.assets import synthetic_flame

    data = synthetic_flame(num_verts=5023, num_faces=600, seed=3)
    flame = FlameModel(data, n_shape=300, n_exp=100, scale=5.0)
    shapecode = jnp.asarray(rng.standard_normal((1, 300)).astype(np.float32) * 0.1)
    base = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
    t_total = 11
    motions = jnp.asarray(rng.standard_normal((t_total, 106)).astype(np.float32) * 0.1)

    # sequential reference (mirrors avatar.build_forward_batch per frame)
    from artalk_tpu.models.gagavatar.generators import transform_emoca_to_p3d
    upper = None
    seq_points, seq_cams = [], []
    for t in range(t_total):
        m = motions[t : t + 1]
        jaw = jnp.concatenate([jnp.zeros((1, 3)), m[:, 103:106]], axis=-1)
        tp = flame(shapecode, m[:, :100], jaw)
        cur = tp[:, FOREHEAD_INDICES]
        if upper is None:
            upper = cur
        else:
            upper = 0.98 * upper + 0.02 * cur
            tp = tp.at[:, FOREHEAD_INDICES].set(upper)
        cam = transform_emoca_to_p3d(m[:, 100:103])[0]
        seq_cams.append(jnp.concatenate([cam[:, :3], base[:, 3:4]], axis=-1))
        seq_points.append(tp[0])
    seq_points = jnp.stack(seq_points)
    seq_cams = jnp.stack(seq_cams)

    # chunked path: two chunks of 8 (second has 5 padding frames)
    k = 8
    padded = jnp.concatenate([motions, jnp.repeat(motions[-1:], 2 * k - t_total, axis=0)])
    carry = jnp.zeros((len(FOREHEAD_INDICES), 3), jnp.float32)
    got_points, got_cams = [], []
    is_first = jnp.float32(1.0)
    for i in range(0, 2 * k, k):
        valid = jnp.int32(min(k, max(t_total - i, 0)))
        tp, cams, carry = prep_frame_chunk(
            flame, shapecode, base, padded[i : i + k], carry, is_first, valid)
        is_first = jnp.float32(0.0)
        got_points.append(tp)
        got_cams.append(cams)
    got_points = jnp.concatenate(got_points)[:t_total]
    got_cams = jnp.concatenate(got_cams)[:t_total]

    np.testing.assert_allclose(np.asarray(got_points), np.asarray(seq_points),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cams), np.asarray(seq_cams), atol=1e-6)
    # the carry equals the EMA state after exactly t_total real frames
    np.testing.assert_allclose(np.asarray(carry), np.asarray(upper[0]), atol=1e-5)


def test_style_unet_bf16_close_to_f32(rng):
    """Opt-in bf16 compute tracks the f32 output within 8-bit-video noise."""
    unet = StyleUNet(in_size=64, out_size=64, in_dim=8, out_dim=3)
    params = unet.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 64)).astype(np.float32))
    f32 = np.asarray(unet(params, x))
    bf16 = np.asarray(unet(params, x, compute_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32  # returns f32 after the final sigmoid
    # post-sigmoid values feed uint8 video; stay well inside ~2 LSB
    assert np.abs(bf16 - f32).max() < 2e-2
    assert np.abs(bf16 - f32).mean() < 3e-3


def test_render_motion_sequence_chunk_path(monkeypatch, tmp_path):
    """The production chunk path (render_motion_sequence -> _chunk_step) is
    orchestration-tested with a stub splat kernel (the 180k-gaussian Pallas
    kernel cannot run on CPU): frame shapes/count, EMA carry threading, and
    that the per-frame instance budget reaches the kernel call
    (avatar.py _chunk_step -- the real kernel is oracle-tested in
    tests/test_gsplat.py and driven e2e by the CLI on TPU)."""
    from artalk_tpu.models import gagavatar
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.models.gagavatar import avatar as avatar_mod
    from artalk_tpu.models.gagavatar.avatar import (
        FOREHEAD_INDICES, NUM_FLAME_VERTS, GAGAvatar, _instance_budget)
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    seen_budgets = []
    small = 64  # stub render size: full-size StyleUNet is minutes on CPU

    def stub_rasterize(xyz, colors, opacities, scales, rotations, cam,
                       focal=12.0, size=512, interpret=False,
                       max_instances=None, bf16_colors=False,
                       slots_per_gaussian=None):
        seen_budgets.append(max_instances)
        # deterministic, frame-dependent output (cam varies per frame)
        base = jnp.mean(cam) + jnp.mean(xyz) * 1e-3
        return jnp.full((32, small, small), base, jnp.float32) * 0.05

    monkeypatch.setattr(avatar_mod, "rasterize_gaussians", stub_rasterize)

    unet = StyleUNet(in_size=small, out_size=small, in_dim=32, out_dim=3)
    gaga = GAGAvatar(assets_dir="assets",
                     params={"upsampler": unet.init(jax.random.PRNGKey(0))})
    gaga.upsampler = unet
    n = NUM_FLAME_VERTS + 64
    rng = np.random.default_rng(0)
    gaga._tracked = {"stub": np.zeros(1)}  # skip set_avatar_id
    gaga._gs_params = {
        "xyz": jnp.asarray(rng.normal(0, 0.1, (1, n, 3)).astype(np.float32)),
        "colors": jnp.asarray(rng.random((1, n, 32)).astype(np.float32)),
        "opacities": jnp.asarray(rng.random((1, n, 1)).astype(np.float32)),
        "scales": jnp.asarray(rng.random((1, n, 3)).astype(np.float32) * 0.01),
        "rotations": jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32)),
    }
    gaga._feature_cache = {
        "transform": jnp.asarray(np.eye(3, 4, dtype=np.float32)),
        "shapecode": jnp.zeros((1, 300), jnp.float32),
    }

    flame_data = load_or_synthesize_flame("assets")
    flame = FlameModel(flame_data, n_shape=300, n_exp=100, scale=5.0)
    t_total = 3
    motions = rng.normal(0, 0.3, (t_total, 106)).astype(np.float32)

    frames = gaga.render_motion_sequence("", jnp.asarray(motions), flame,
                                         transfer_chunk=2, colorspace="yuv420")
    assert frames.shape == (t_total, small * 3 // 2, small)  # yuv420p planes
    assert frames.dtype == np.uint8
    # the budgeted gather must be active on the chunk path
    assert seen_budgets and all(b == _instance_budget(n) for b in seen_budgets)
    # EMA carry threads across chunks: state was persisted for resume
    assert gaga._upper_points is not None
    assert gaga._upper_points.shape == (1, len(FOREHEAD_INDICES), 3)


def test_style_unet_nhwc_layout_equivalence(rng):
    """The NHWC internal layout produces the same output as NCHW from the
    same (NCHW-shaped) params — the layout is a pure compute-order change."""
    nchw = StyleUNet(in_size=64, out_size=64, in_dim=8, out_dim=3)
    nhwc = StyleUNet(in_size=64, out_size=64, in_dim=8, out_dim=3,
                     layout="nhwc")
    params = nchw.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 64, 64)).astype(np.float32))
    a = np.asarray(nchw(params, x))
    b = np.asarray(nhwc(params, x))
    assert b.shape == a.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(b, a, atol=2e-5)


def test_select_budget_buckets(monkeypatch):
    from artalk_tpu.models.gagavatar.avatar import (
        BUDGET_BUCKETS, _select_budget)

    from artalk_tpu.ops.gsplat import GCHUNK

    n = 100_000
    monkeypatch.delenv("ARTALK_GSPLAT_MAX_INSTANCES", raising=False)
    # 1.7/gaussian (the measured trained-avatar workload) -> 2/g bucket
    # (headroom 1.1, measured in tools/exp_budget_margin.py)
    assert _select_budget(170_000, n) == 2 * n
    # small scene -> smallest bucket
    assert _select_budget(50_000, n) == 2 * n
    # saturating scene (synthetic avatars) -> ESCALATES past the largest
    # bucket instead of clamping, so the budgeted gather never silently
    # drops splats; escalated budgets round to GCHUNK, not to whole
    # instances-per-gaussian steps (the gather scales with the budget)
    esc = _select_budget(900_000, n)
    assert esc >= int(1.1 * 900_000)
    assert esc < int(1.1 * 900_000) + GCHUNK and esc % GCHUNK == 0
    assert esc > BUDGET_BUCKETS[-1] * n
    # just past the largest bucket: GCHUNK-rounded need
    esc2 = _select_budget(400_000, n)
    assert esc2 >= int(1.1 * 400_000) and esc2 % GCHUNK == 0
    # env override wins; 0 = exact/unbudgeted
    monkeypatch.setenv("ARTALK_GSPLAT_MAX_INSTANCES", "123456")
    assert _select_budget(170_000, n) == 123456
    monkeypatch.setenv("ARTALK_GSPLAT_MAX_INSTANCES", "0")
    assert _select_budget(170_000, n) is None


def test_check_instance_budget_slot_cap_paths(monkeypatch):
    """Slot-cap calibration (ADVICE r04): with FLAME assets the cap is the
    max over the neutral pose AND a driven-pose sample (head rotation folds
    into the camera and can grow per-gaussian radii past a tile-count
    threshold); without FLAME assets the cap optimization is SKIPPED (the
    cap is a MAX over gaussians, so a head-less scene can understate it and
    silently truncate head geometry)."""
    from artalk_tpu.models.gagavatar import avatar as avatar_mod
    from artalk_tpu.models.gagavatar.avatar import (
        CAM_PARAMS, NUM_FLAME_VERTS, GAGAvatar)
    from artalk_tpu.models.gagavatar.generators import transform_emoca_to_p3d
    from artalk_tpu.ops.gsplat import DUP, max_valid_slots_per_gaussian

    monkeypatch.delenv("ARTALK_GSPLAT_MAX_INSTANCES", raising=False)
    n = NUM_FLAME_VERTS + 64
    rng = np.random.default_rng(3)
    gaga = GAGAvatar(assets_dir="assets", params={})
    gaga._tracked = {"stub": np.zeros(1)}
    gaga._gs_params = {
        "xyz": jnp.asarray(rng.normal(0, 0.1, (1, n, 3)).astype(np.float32)),
        "colors": jnp.asarray(rng.random((1, n, 32)).astype(np.float32)),
        "opacities": jnp.asarray(rng.random((1, n, 1)).astype(np.float32)),
        "scales": jnp.asarray(rng.random((1, n, 3)).astype(np.float32) * 0.01),
        "rotations": jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32)),
    }
    gaga._feature_cache = {
        "transform": jnp.asarray(np.eye(3, 4, dtype=np.float32)),
        "shapecode": jnp.zeros((1, 300), jnp.float32),
    }

    gaga._check_instance_budget()
    assert gaga._budget is not None
    assert isinstance(gaga._slot_cap, int) and 1 <= gaga._slot_cap <= DUP

    # the calibrated cap covers (at least) the neutral pose's exact bound
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    flame = FlameModel(load_or_synthesize_flame("assets"),
                       n_shape=300, n_exp=100, scale=5.0)
    neutral = flame(gaga._feature_cache["shapecode"], jnp.zeros((1, 100)),
                    jnp.zeros((1, 6)))
    cam = jnp.concatenate([
        transform_emoca_to_p3d(jnp.zeros((1, 3)))[0][:, :3],
        gaga._feature_cache["transform"][:, 3:4]], axis=-1)
    gs = gaga._gs_params
    neutral_cap = int(max_valid_slots_per_gaussian(
        gs["xyz"].at[:, :NUM_FLAME_VERTS].set(neutral)[0],
        gs["opacities"][0], gs["scales"][0], gs["rotations"][0], cam,
        focal=CAM_PARAMS["focal"], size=CAM_PARAMS["size"]))
    assert gaga._slot_cap >= neutral_cap

    # FLAME-missing fallback: budget still selected, cap optimization OFF
    def boom(*a, **k):
        raise FileNotFoundError("no FLAME assets in this test")

    monkeypatch.setattr("artalk_tpu.utils.assets.load_or_synthesize_flame",
                        boom)
    gaga._check_instance_budget()
    assert gaga._budget is not None
    assert gaga._slot_cap is None
