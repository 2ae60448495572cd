"""bench.py driver-facing contract: section validation fails loudly."""

import os
import subprocess
import sys


def test_unknown_section_rejected_before_any_device_work():
    """A typo'd ARTALK_BENCH_SECTIONS must error with the known list instead
    of silently skipping sections (the driver records whatever JSON prints)."""
    env = dict(os.environ, ARTALK_BENCH_SECTIONS="gpslat, mesh")
    # force the CPU platform BEFORE bench imports: the JAX_PLATFORMS env var
    # is ignored by the axon TPU plugin (CLAUDE.md), and a subprocess that
    # seizes the one-holder TPU would hang every later jit in the session
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; runpy.run_path('bench.py', run_name='__main__')")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode != 0
    err = proc.stdout + proc.stderr
    assert "gpslat" in err and "known:" in err
