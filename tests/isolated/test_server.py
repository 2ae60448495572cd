"""HTTP serving layer: endpoints, tick batching, parity with direct decode."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artalk_tpu.config import ARConfig, ModelConfig, VAEConfig
from artalk_tpu.engine import ARTAvatarInferEngine
from artalk_tpu.server import MotionServer

from test_serving import CFG


from conftest import no_persistent_compile_cache_fixture

_no_persistent_compile_cache = no_persistent_compile_cache_fixture()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    engine = ARTAvatarInferEngine(
        load_gaga=False, config=CFG, seed=0, image_size=128, interpret=True,
        output_dir=str(tmp_path_factory.mktemp("render")))
    server = MotionServer(engine=engine, capacity=2, max_sessions=4,
                          tick_ms=30.0)
    port = server.start(port=0)
    yield server, engine, f"http://127.0.0.1:{port}"
    server.close()


def _req(url, method="GET", data=None, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", ctype)
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def _req_err(url, method="GET", data=None, ctype="application/octet-stream"):
    try:
        return _req(url, method, data, ctype)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_healthz(served):
    _, _, base = served
    code, body = _req(f"{base}/healthz")
    assert code == 200
    assert body["status"] == "ok"
    assert body["capacity"] >= 2
    assert body["sample_rate"] == 16000


def test_stream_session_matches_direct_decode(served):
    """HTTP chunk responses == model.window_step run directly (bit-exact)."""
    server, engine, base = served
    model, params = engine.model, engine.params
    rng = np.random.default_rng(7)
    ws = model.window_samples
    chunks = [rng.standard_normal(ws).astype(np.float32) * 0.1,
              rng.standard_normal(ws // 2).astype(np.float32) * 0.1]

    code, body = _req(f"{base}/v1/sessions", "POST", b"{}", "application/json")
    assert code == 200
    sid = body["sid"]

    got = []
    for chunk in chunks:
        code, body = _req(f"{base}/v1/sessions/{sid}/audio", "POST",
                          chunk.tobytes())
        assert code == 200
        assert body["frames"] == len(body["motion"])
        got.append(np.asarray(body["motion"], np.float32))

    style = model.encode_style(params, None)
    state = model.initial_state(params, style, batch_size=1)
    for chunk, motion in zip(chunks, got):
        buf = np.zeros(ws, np.float32)
        buf[: len(chunk)] = chunk
        state, want = model.window_step(params, state,
                                        jnp.asarray(buf[None]), style)
        frames = int(np.ceil(len(chunk) / 16000 * model.cfg.fps))
        assert motion.shape == (frames, model.cfg.vae.motion_dim)
        np.testing.assert_allclose(motion, np.asarray(want)[0, :frames],
                                   atol=1e-5)

    code, body = _req(f"{base}/v1/sessions/{sid}", "DELETE")
    assert code == 200
    code, body = _req_err(f"{base}/v1/sessions/{sid}/audio", "POST",
                          chunks[0].tobytes())
    assert code == 404


def test_concurrent_chunks_share_one_tick(served):
    """Two clients posting together ride ONE batched pool step."""
    server, engine, base = served
    sids = []
    for _ in range(2):
        _, body = _req(f"{base}/v1/sessions", "POST", b"{}",
                       "application/json")
        sids.append(body["sid"])

    steps_before = getattr(server, "_test_steps", 0)
    orig_step = server.pool.step

    def counting_step(chunks):
        server._test_steps = getattr(server, "_test_steps", 0) + 1
        return orig_step(chunks)

    server.pool.step = counting_step
    try:
        rng = np.random.default_rng(11)
        ws = server.pool.window_samples
        payloads = {s: rng.standard_normal(ws).astype(np.float32) * 0.1
                    for s in sids}
        results, errors = {}, []

        def post(s):
            try:
                results[s] = _req(f"{base}/v1/sessions/{s}/audio", "POST",
                                  payloads[s].tobytes())
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=post, args=(s,)) for s in sids]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert all(results[s][0] == 200 for s in sids)
        # both requests were served by a single batched step
        assert server._test_steps - steps_before == 1
    finally:
        server.pool.step = orig_step
        for s in sids:
            _req(f"{base}/v1/sessions/{s}", "DELETE")


def test_auto_grow_and_full(served):
    server, engine, base = served
    sids = []
    for _ in range(4):  # capacity 2, max 4: two opens trigger one grow
        code, body = _req(f"{base}/v1/sessions", "POST", b"{}",
                          "application/json")
        assert code == 200
        sids.append(body["sid"])
    assert server.pool.capacity == 4
    code, body = _req_err(f"{base}/v1/sessions", "POST", b"{}",
                          "application/json")
    assert code == 503
    for s in sids:
        _req(f"{base}/v1/sessions/{s}", "DELETE")


def test_chunk_validation(served):
    server, engine, base = served
    _, body = _req(f"{base}/v1/sessions", "POST", b"{}", "application/json")
    sid = body["sid"]
    ws = server.pool.window_samples
    too_long = np.zeros(ws + 1, np.float32)
    code, body = _req_err(f"{base}/v1/sessions/{sid}/audio", "POST",
                          too_long.tobytes())
    assert code == 413
    code, body = _req_err(f"{base}/v1/sessions/{sid}/audio", "POST", b"")
    assert code == 400
    _req(f"{base}/v1/sessions/{sid}", "DELETE")


def test_one_shot_matches_engine_inference(served):
    server, engine, base = served
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(int(1.5 * server.pool.window_samples)
                                ).astype(np.float32) * 0.1
    code, body = _req(f"{base}/v1/motion", "POST", audio.tobytes())
    assert code == 200
    got = np.asarray(body["motion"], np.float32)
    want = np.asarray(engine.inference(audio))
    assert body["frames"] == want.shape[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def _req_raw(url, data):
    """POST returning (status, headers, raw bytes) -- for the video route."""
    req = urllib.request.Request(url, data=data, method="POST")
    req.add_header("Content-Type", "application/octet-stream")
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, dict(resp.headers), resp.read()


@pytest.fixture(scope="module")
def served_render(tmp_path_factory):
    """A server whose model is render-capable (motion_dim=106 feeds FLAME);
    the shared `served` fixture uses motion_dim=12, which can stream motion
    but cannot drive the mesh renderer."""
    from artalk_tpu.utils.assets import save_flame_npz, synthetic_flame

    assets = tmp_path_factory.mktemp("assets_render")
    save_flame_npz(synthetic_flame(num_verts=400, num_faces=512, seed=2),
                   str(assets / "flame_synthetic.npz"))
    cfg = ModelConfig(
        ar=ARConfig(depth=2, num_heads=4, embed_dim=64, style_dim=16,
                    audio_dim=32),
        vae=VAEConfig(motion_dim=106, code_dim=8, depth=2, num_heads=4,
                      hidden_dim=32, patch_nums=(1, 2, 4)),
        wav2vec=CFG.wav2vec)
    engine = ARTAvatarInferEngine(
        load_gaga=False, config=cfg, seed=0, image_size=128, interpret=True,
        assets_dir=str(assets),
        output_dir=str(tmp_path_factory.mktemp("render_http")))
    server = MotionServer(engine=engine, capacity=1, tick_ms=30.0)
    port = server.start(port=0)
    yield server, engine, f"http://127.0.0.1:{port}"
    server.close()


def test_video_returns_playable_file(served_render):
    """POST /v1/video: audio in, rendered talking-head video bytes out (the
    reference UX, inference.py:119-125). This image has no av/ffmpeg, so the
    writer falls back to Y4M (or npz); assert the advertised format's magic
    and that the server-side file exists with the same bytes."""
    server, engine, base = served_render
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1  # 0.5 s
    code, headers, body = _req_raw(f"{base}/v1/video", audio.tobytes())
    assert code == 200
    fmt = headers["X-Video-Format"]
    assert fmt in ("mp4", "y4m", "npz")
    assert len(body) > 0
    if fmt == "y4m":
        assert body.startswith(b"YUV4MPEG2")
        assert headers["Content-Type"] == "video/x-yuv4mpeg"
    path = headers["X-Video-Path"]
    with open(path, "rb") as f:
        assert f.read() == body
    # 0.5 s at 25 fps -> 13 frames of 128x128 yuv420 (y4m: 6 header-ish
    # bytes per frame marker + 1.5 bytes/px); just sanity-check the scale
    if fmt == "y4m":
        assert len(body) > 13 * 128 * 128  # more than 13 Y planes

    # an avatar shape_id without GAGA loaded maps to a clear 400
    try:
        _req_raw(f"{base}/v1/video?shape_id=someone.jpg", audio.tobytes())
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "GAGAvatar" in json.loads(e.read().decode())["error"]


def test_json_pcm_and_bad_routes(served):
    server, engine, base = served
    audio = (np.zeros(100, np.float32) + 0.01)
    code, body = _req(f"{base}/v1/motion", "POST",
                      json.dumps({"pcm": audio.tolist()}).encode(),
                      "application/json")
    assert code == 200 and body["frames"] >= 1
    code, _ = _req_err(f"{base}/nope")
    assert code == 404
    code, _ = _req_err(f"{base}/v1/unknown", "POST", b"{}")
    assert code == 404
