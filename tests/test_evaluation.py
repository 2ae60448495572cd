"""Evaluation metrics: LVE / FDD / beat alignment / diversity semantics."""

import json
import subprocess
import sys

import numpy as np
import pytest

from artalk_tpu import evaluation as ev


def test_lve_zero_for_identical_and_positive_for_offset():
    rng = np.random.default_rng(0)
    verts = rng.standard_normal((6, 50, 3)).astype(np.float32)
    lips = np.arange(10)
    assert ev.lip_vertex_error(verts, verts, lips) == 0.0
    shifted = verts.copy()
    shifted[:, :10] += 0.25
    got = ev.lip_vertex_error(shifted, verts, lips)
    # every lip vertex moved by exactly 0.25*sqrt(3); max == mean == that
    np.testing.assert_allclose(got, 0.25 * np.sqrt(3.0), rtol=1e-5)
    # non-lip offsets are invisible to LVE
    shifted2 = verts.copy()
    shifted2[:, 20:] += 9.0
    assert ev.lip_vertex_error(shifted2, verts, lips) == 0.0


def test_fdd_penalizes_dead_upper_face():
    rng = np.random.default_rng(1)
    t = 50
    gt = np.zeros((t, 30, 3), np.float32)
    gt[:, :, 1] = np.sin(np.linspace(0, 6 * np.pi, t))[:, None] * 0.1
    dead = np.zeros_like(gt)  # no dynamics at all
    upper = np.arange(30)
    assert ev.upper_face_dynamics_deviation(gt, gt, upper) == 0.0
    d = ev.upper_face_dynamics_deviation(dead, gt, upper)
    assert d > 0.02  # missing ~0.03 std of |motion| (std(|sin|) * 0.1)
    # FDD is frame-alignment-free: a time-shifted copy scores ~0
    rolled = np.roll(gt, 7, axis=0)
    assert ev.upper_face_dynamics_deviation(rolled, gt, upper) < 1e-6


def _click_track(times, sr=16000, length_s=4.0):
    audio = np.zeros(int(sr * length_s), np.float32)
    rng = np.random.default_rng(2)
    for t in times:
        i = int(t * sr)
        audio[i : i + 200] = rng.standard_normal(200) * 0.9
    return audio


def test_beat_alignment_rewards_aligned_motion():
    times = [0.5, 1.5, 2.5, 3.5]
    audio = _click_track(times)
    onsets = ev.audio_onsets(audio)
    assert len(onsets) >= len(times)
    # motion whose velocity dips exactly at the clicks
    fps = 25.0
    t = int(4.0 * fps)
    vel_profile = np.ones(t, np.float32)
    for tt in times:
        vel_profile[int(tt * fps)] = 0.0
    motion = np.cumsum(vel_profile, axis=0)[:, None] * np.ones((1, 4),
                                                               np.float32)
    aligned = ev.beat_alignment(motion, audio)
    # motion with beats far from every click
    vel2 = np.ones(t, np.float32)
    for tt in [1.0, 2.0, 3.0]:
        vel2[int(tt * fps)] = 0.0
    motion2 = np.cumsum(vel2, axis=0)[:, None] * np.ones((1, 4), np.float32)
    misaligned = ev.beat_alignment(motion2, audio)
    assert aligned > 0.8
    assert aligned > misaligned


def test_beat_alignment_empty_inputs():
    assert ev.beat_alignment(np.zeros((2, 4)), np.zeros(100)) == 0.0


def test_diversity():
    rng = np.random.default_rng(3)
    same = np.tile(rng.standard_normal((1, 10, 6)), (3, 1, 1))
    assert ev.diversity(same) == 0.0
    different = rng.standard_normal((3, 10, 6))
    assert ev.diversity(different) > 0.0
    assert ev.diversity(different[:1]) == 0.0


@pytest.fixture(scope="module")
def flame():
    from artalk_tpu.models.flame import FlameModel
    from artalk_tpu.utils.assets import load_or_synthesize_flame

    return FlameModel(load_or_synthesize_flame("assets"),
                      n_shape=300, n_exp=100, scale=1.0)


def test_region_indices(flame):
    lips = ev.lip_vertex_indices(flame)
    upper = ev.upper_face_vertex_indices(flame)
    n = flame.v_template.shape[0]
    assert 0 < len(lips) < n
    assert 0 < len(upper) < n
    # deterministic
    np.testing.assert_array_equal(lips, ev.lip_vertex_indices(flame))


def test_evaluate_motion_end_to_end(flame):
    rng = np.random.default_rng(4)
    gt = (rng.standard_normal((8, 106)) * 0.1).astype(np.float32)
    out = ev.evaluate_motion(gt, gt, flame, audio=_click_track([0.1]))
    assert out["frames"] == 8
    assert out["lve"] == 0.0
    assert out["fdd"] == 0.0
    assert "beat_align" in out
    pred = gt + 0.05
    out2 = ev.evaluate_motion(pred, gt, flame)
    assert out2["lve"] > 0.0


def test_cli_prints_json(tmp_path, flame):
    import os

    rng = np.random.default_rng(5)
    gt = (rng.standard_normal((5, 106)) * 0.1).astype(np.float32)
    p1, p2 = tmp_path / "pred.npy", tmp_path / "gt.npy"
    np.save(p1, gt)
    np.save(p2, gt)
    # force the CPU platform BEFORE the module imports: the JAX_PLATFORMS env
    # var is ignored by the axon TPU plugin (CLAUDE.md), and a subprocess
    # that seizes the one-holder TPU would hang every later jit
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; runpy.run_module('artalk_tpu.evaluation', "
            "run_name='__main__', alter_sys=True)")
    proc = subprocess.run(
        [sys.executable, "-c", code, str(p1), str(p2)],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["lve"] == 0.0 and out["frames"] == 5
