"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction
from gpboost_tpu.parallel.mesh import (make_mesh, sharded_histogram_fn,
                                       sharded_training_step_fn,
                                       sharded_vecchia_nll_fn)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_vecchia_nll_matches_single(mesh):
    n, m = 128, 8
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(rng.standard_normal(n))
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    cp = jnp.asarray([0.1, 1.0, 0.2])
    a, d = vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)
    ref = vops.vecchia_nll(a, d, nb, y)
    nll_sh = sharded_vecchia_nll_fn(cov_fn, mesh)
    got = nll_sh(cp, coords, nb, y)
    assert abs(float(got) - float(ref)) < 1e-8


def test_sharded_gradient_matches(mesh):
    n, m = 64, 6
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(rng.standard_normal(n))
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    nll_sh = sharded_vecchia_nll_fn(cov_fn, mesh)
    lp = jnp.log(jnp.asarray([0.1, 1.0, 0.2]))

    def f_sh(lp):
        return nll_sh(jnp.exp(lp), coords, nb, y)

    def f_ref(lp):
        cp = jnp.exp(lp)
        a, d = vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)
        return vops.vecchia_nll(a, d, nb, y)

    g_sh = jax.grad(f_sh)(lp)
    g_ref = jax.grad(f_ref)(lp)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8)


def test_sharded_histogram_matches(mesh):
    n, F, B = 256, 4, 16
    rng = np.random.default_rng(2)
    binned = jnp.asarray(rng.integers(0, B, size=(n, F)), dtype=jnp.int32)
    grad = jnp.asarray(rng.standard_normal(n))
    hess = jnp.abs(jnp.asarray(rng.standard_normal(n)))
    mask = jnp.asarray(rng.random(n) < 0.8)
    hist_sh = sharded_histogram_fn(mesh, B)
    hg, hh, hc = hist_sh(binned, grad, hess, mask)
    from gpboost_tpu.boosting.tree import build_histogram
    rg, rh, rc = build_histogram(binned, grad, hess, mask, B)
    np.testing.assert_allclose(np.asarray(hg), np.asarray(rg), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(rh), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(rc), atol=1e-10)


def test_full_training_step(mesh):
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_cluster_nll_matches_batched(mesh):
    """Cluster-axis sharding (SURVEY §2.5 item 8) reproduces the batched
    per-cluster NLL, including gradients, with C not divisible by 8."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpboost_tpu.models import clustered
    from gpboost_tpu.parallel.mesh import (pad_cluster_blocks,
                                           sharded_cluster_nll_fn)
    rng = np.random.default_rng(3)
    C_real, m_max = 13, 12
    codes = np.repeat(np.arange(C_real), rng.integers(4, m_max, size=C_real))
    n = len(codes)
    coords = rng.uniform(size=(n, 2))
    r = rng.standard_normal(n)
    cov_fn = CovFunction.create("exponential")
    blocks = clustered.prepare_blocks(codes, coords)
    cov_pars = jnp.asarray([0.1, 1.0, 0.2])
    ref = clustered.nll_gaussian(cov_fn, cov_pars, blocks, jnp.asarray(r))

    coords_p, valid_p, rb_p = pad_cluster_blocks(blocks, jnp.asarray(r), 8)
    sharding = NamedSharding(mesh, P("data"))
    coords_p = jax.device_put(coords_p, sharding)
    valid_p = jax.device_put(valid_p, sharding)
    rb_p = jax.device_put(rb_p, sharding)
    nll_fn = sharded_cluster_nll_fn(cov_fn, mesh)
    got = nll_fn(cov_pars, coords_p, valid_p, rb_p, blocks.num_data)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)

    # gradients agree too
    g_ref = jax.grad(lambda cp: clustered.nll_gaussian(
        cov_fn, cp, blocks, jnp.asarray(r)))(cov_pars)
    g_sh = jax.grad(lambda cp: nll_fn(cp, coords_p, valid_p, rb_p,
                                      blocks.num_data))(cov_pars)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-10)
