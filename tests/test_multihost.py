"""Multi-host smoke: 2 real processes, one coordination service, one mesh.

Launches two subprocesses on localhost, each holding 2 virtual CPU devices;
both call ``parallel.distributed.initialize_multihost`` against the same
coordinator, build a pod-wide (dp=4, tp=1) mesh, assemble a global
dp-sharded batch from per-process local shards, and run a jitted global
reduction whose result depends on BOTH processes' data. This is the running
code behind docs/DEPLOYMENT.md's multi-host section.
"""

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["ARTALK_REPO"])
from artalk_tpu.parallel.distributed import initialize_multihost, local_batch_to_global
from artalk_tpu.parallel.mesh import make_mesh

info = initialize_multihost()
assert info["num_processes"] == 2, info
assert info["global_devices"] == 4, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(tp=1)
assert mesh.shape == {"dp": 4, "tp": 1}, mesh.shape

# per-process local shard: process p contributes rows filled with p+1
local = np.full((2, 4), info["process_id"] + 1, np.float32)
with mesh:
    batch = local_batch_to_global(mesh, local)
    assert batch.shape == (4, 4)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(batch)
print("MULTIHOST_SUM", float(jax.device_get(total)), flush=True)
"""


def test_two_process_localhost_smoke(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["ARTALK_REPO"] = repo
        # the persistent compile cache is keyed per-process topology; keep the
        # children away from the shared cache to avoid cross-test pollution
        env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / f"cache{pid}")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        # rows: 2x4 of 1.0 (proc 0) + 2x4 of 2.0 (proc 1) -> sum 24
        assert "MULTIHOST_SUM 24.0" in out, f"process {pid} output:\n{out}"
