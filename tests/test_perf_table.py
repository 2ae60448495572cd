"""The README perf table is generated, not hand-edited: one source of truth."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import update_perf_table as upt  # noqa: E402


def _write_bench(root, rnd, parsed):
    with open(os.path.join(root, f"BENCH_r{rnd:02d}.json"), "w") as f:
        json.dump({"n": rnd, "parsed": parsed}, f)


def test_table_renders_latest_and_spread(tmp_path):
    _write_bench(tmp_path, 1, {"value": 8000.0, "stream_p50_ms": 12.0})
    _write_bench(tmp_path, 2, {"value": 9000.0, "stream_p50_ms": 14.0,
                               "gaga_ms_per_frame": 20.0})
    hist = upt.load_history(str(tmp_path))
    assert list(hist) == [1, 2]
    table = upt.render_table(hist)
    assert "**9,000 frames/s** (r02)" in table
    assert "median 8,500, range 8,000–9,000" in table
    assert "**14.0 ms** (r02)" in table
    assert "**20.0 ms/frame device** (r02)" in table
    assert "single measurement" in table  # gaga has one data point


def test_p50_key_alias_r01():
    """Round 1 used p50_window_latency_ms; later rounds stream_p50_ms."""
    hist = {1: {"p50_window_latency_ms": 11.9}, 2: {"stream_p50_ms": 13.8}}
    vals = upt._values(hist, ("stream_p50_ms", "p50_window_latency_ms"))
    assert vals == [(1, 11.9), (2, 13.8)]


def test_check_mode_flags_stale_readme(tmp_path):
    _write_bench(tmp_path, 1, {"value": 8000.0})
    readme = tmp_path / "README.md"
    readme.write_text(f"# x\n\n{upt.START}\nstale\n{upt.END}\n")
    assert upt.update_readme(str(tmp_path), check=True)  # stale, unchanged
    assert "stale" in readme.read_text()
    assert upt.update_readme(str(tmp_path), check=False)  # rewrites
    assert "stale" not in readme.read_text()
    assert not upt.update_readme(str(tmp_path), check=True)  # now current


def test_check_ignores_rounds_newer_than_readme(tmp_path):
    """A driver-dropped BENCH_r{N+1}.json must not flag the committed README
    (the start-of-round race that failed the suite every round through r03)."""
    _write_bench(tmp_path, 1, {"value": 8000.0})
    readme = tmp_path / "README.md"
    readme.write_text(f"# x\n\n{upt.START}\nstale\n{upt.END}\n")
    upt.update_readme(str(tmp_path), check=False)  # README now covers r01
    _write_bench(tmp_path, 2, {"value": 9000.0})   # driver drop, post-commit
    assert not upt.update_readme(str(tmp_path), check=True)
    # a rewrite (non-check) does pick the new round up
    assert upt.update_readme(str(tmp_path), check=False)
    assert "9,000" in readme.read_text()
    assert not upt.update_readme(str(tmp_path), check=True)


def test_repo_readme_matches_bench_history():
    """The committed README must agree with the committed BENCH history."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not upt.load_history(root):
        return  # no bench rounds captured yet (fresh clone)
    assert not upt.update_readme(root, check=True), (
        "README.md perf table is stale; run python tools/update_perf_table.py")
