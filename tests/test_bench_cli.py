"""bench.py driver-facing contract: section validation fails loudly."""

import os
import subprocess
import sys


def test_unknown_section_rejected_before_any_device_work():
    """A typo'd ARTALK_BENCH_SECTIONS must error with the known list instead
    of silently skipping sections (the driver records whatever JSON prints)."""
    env = dict(os.environ, ARTALK_BENCH_SECTIONS="gpslat, mesh",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=300, env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode != 0
    err = proc.stdout + proc.stderr
    assert "gpslat" in err and "known:" in err
