"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Sharding/collective tests use the virtual devices
(``xla_force_host_platform_device_count``, the JAX multi-device test pattern);
numerical-parity tests need float64 which TPUs lack natively, so all tests run
on CPU. Env vars must be set before jax initializes.
"""
import os

# NB: the machine may export JAX_PLATFORMS=axon (TPU tunnel); tests must run
# on CPU, so force-assign (setdefault is not enough) AND set the config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu"

# Persistent compilation cache: per-module jit compile overhead dominates the
# suite wall-clock (round-3 note); cached executables from previous runs cut
# repeat-run time sharply. Disable with GPBOOST_TPU_NO_TEST_CACHE=1.
if not os.environ.get("GPBOOST_TPU_NO_TEST_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal  # noqa: E402

# Slow-fit gating (the reference's own pattern:
# test_GPModel_gaussian_process.R:4 gates on GPBOOST_ALL_TESTS): tests
# marked @pytest.mark.slow only run when GPBOOST_ALL_TESTS is set, keeping
# the default suite's wall-clock bounded.
RUN_ALL = os.environ.get("GPBOOST_ALL_TESTS", "") not in ("", "0", "false")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running fit/parity test; runs only with "
        "GPBOOST_ALL_TESTS=1 (reference R-suite gating pattern)")


def pytest_collection_modifyitems(config, items):
    if RUN_ALL:
        return
    skip = pytest.mark.skip(reason="slow; set GPBOOST_ALL_TESTS=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# ---------------------------------------------------------------------------
# XLA CPU-client segfault workaround. Reproduced trigger (observed three
# times in full-suite runs, twice in round 2 at test_parallel's SPMD
# compiles and once in round 3 at test_ng_matrix_golden's ordinary Laplace
# jits): after ~300 tests' worth of accumulated compiled executables the
# long-lived CPU client segfaults INSIDE
# jax/_src/compiler.py:362 backend_compile_and_load on the next compile —
# module content is irrelevant (non-SPMD modules crash too), memory is not
# exhausted (128 GB box, <1 GB used), and every module passes standalone.
# Periodically recreating the client reproduces the standalone conditions.
_TESTS_SINCE_RESET = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_xla_client_reset():
    _TESTS_SINCE_RESET["n"] += 1
    if _TESTS_SINCE_RESET["n"] >= 150:
        import jax._src.xla_bridge as xb
        jax.clear_caches()
        xb._clear_backends()
        _TESTS_SINCE_RESET["n"] = 0
    yield


@pytest.fixture(scope="session")
def gp_fixture_data():
    """The n=100 simulated dataset of the reference's R test suite
    (``test_GPModel_gaussian_process.R:38-72``), bit-identical via the LCG."""
    n = 100
    d = 2
    # R fills matrices column-major: matrix(x, ncol=2) -> col j = x[j*n:(j+1)*n]
    x = sim_rand_unif(n * d, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    sigma2_1, rho = 1.0, 0.1
    Sigma = sigma2_1 * np.exp(-D / rho) + np.eye(n) * 1e-20
    C = np.linalg.cholesky(Sigma)
    b_1 = sim_rand_normal(n, init_c=0.8)
    eps = C @ b_1
    Z_SVC = sim_rand_unif(n * 2, init_c=0.6)
    Z_SVC = np.column_stack([Z_SVC[:n], Z_SVC[n:]])
    b_2 = sim_rand_normal(n, init_c=0.17)
    b_3 = sim_rand_normal(n, init_c=0.42)
    eps_svc = C @ b_1 + Z_SVC[:, 0] * (C @ b_2) + Z_SVC[:, 1] * (C @ b_3)
    xi = sim_rand_normal(n, init_c=0.1) / 5.0
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    beta = np.array([2.0, 2.0])
    cluster_ids = np.concatenate([np.ones(40), 2 * np.ones(60)])
    return dict(n=n, coords=coords, D=D, eps=eps, eps_svc=eps_svc, xi=xi,
                X=X, beta=beta, cluster_ids=cluster_ids, Z_SVC=Z_SVC)
