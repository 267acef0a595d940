"""Multi-host (2-process) distributed fit test.

Launches two REAL processes with 4 virtual CPU devices each, joined via
``gpboost_tpu.distributed.initialize`` (the ``Network::Init`` replacement,
network.h:99), builds the 8-device global mesh spanning both processes, runs
``GPModel(gp_approx='vecchia').fit()`` under it, and asserts both processes
converge to the single-process reference parameters.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import gpboost_tpu as gpb

coord, pid, ref_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
gpb.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert gpb.distributed.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

rng = np.random.default_rng(3)
n = 120
coords = rng.uniform(size=(n, 2))
D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
L = np.linalg.cholesky(1.2 * np.exp(-D / 0.3) + 0.1 * np.eye(n))
y = L @ rng.standard_normal(n)

with gpb.use_mesh(gpb.distributed.global_mesh()):
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=8,
                     vecchia_ordering="none")
    # the sharded structure spans BOTH processes
    nshards = len(gp._approx._shard_nb.sharding.device_set)
    assert nshards == 8, nshards
    gp.fit(y=y, params={"maxit": 10, "trace": False})

ref = np.load(ref_file)
np.testing.assert_allclose(gp.cov_pars_, ref, rtol=1e-9)
gpb.distributed.shutdown()
print("WORKER_OK", pid)
"""


def test_two_process_mesh_fit(tmp_path):
    # single-process reference (this process, no mesh)
    import gpboost_tpu as gpb
    rng = np.random.default_rng(3)
    n = 120
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(1.2 * np.exp(-D / 0.3) + 0.1 * np.eye(n))
    y = L @ rng.standard_normal(n)
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=8,
                     vecchia_ordering="none")
    gp.fit(y=y, params={"maxit": 10, "trace": False})
    ref_file = str(tmp_path / "ref.npy")
    np.save(ref_file, np.asarray(gp.cov_pars_))

    wfile = str(tmp_path / "worker.py")
    with open(wfile, "w") as f:
        f.write(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, wfile, coord, str(pid), ref_file],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out
