"""No-replication ("halo") sharded Vecchia layout.

``sharded_vecchia_nll_halo_fn`` keeps EVERY input row-sharded — neighbor
coordinates and y values are pre-gathered into per-row halo arrays
(``gather_vecchia_halo``), so no chip holds a replicated global table. The
fallback past the replication envelope documented in ``parallel/mesh.py``;
must match the replicated builder and the single-device factors exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction
from gpboost_tpu.parallel.mesh import (gather_vecchia_halo, make_mesh,
                                       sharded_vecchia_nll_fn,
                                       sharded_vecchia_nll_halo_fn)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _data(n, d, seed):
    rng = np.random.default_rng(seed)
    coords = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.standard_normal(n))
    return coords, y


@pytest.mark.parametrize("cov,cp", [
    ("exponential", [0.1, 1.0, 0.2]),
    ("matern_ard", [0.1, 1.0, 0.2, 0.05]),   # exercises the scaled path
])
def test_halo_nll_matches_single_device(mesh, cov, cp):
    n, m = 128, 8
    coords, y = _data(n, 2, 0)
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = (CovFunction.create(cov, shape=1.5, dim_coords=2)
              if cov == "matern_ard" else CovFunction.create(cov))
    cp = jnp.asarray(cp)
    a, d = vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)
    ref = vops.vecchia_nll(a, d, nb, y)
    nb_coords, y_nb = gather_vecchia_halo(coords, nb, y)
    nll_halo = sharded_vecchia_nll_halo_fn(cov_fn, mesh)
    got = nll_halo(cp, nb, nb_coords, y_nb, coords, y)
    assert abs(float(got) - float(ref)) < 1e-8
    # and against the replicated sharded builder
    nll_rep = sharded_vecchia_nll_fn(cov_fn, mesh)
    rep = nll_rep(cp, coords, nb, y)
    assert abs(float(got) - float(rep)) < 1e-10


def test_halo_gradient_matches(mesh):
    n, m = 64, 6
    coords, y = _data(n, 2, 1)
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    nb_coords, y_nb = gather_vecchia_halo(coords, nb, y)
    nll_halo = sharded_vecchia_nll_halo_fn(cov_fn, mesh)
    nll_rep = sharded_vecchia_nll_fn(cov_fn, mesh)
    lp = jnp.log(jnp.asarray([0.1, 1.0, 0.2]))

    g_halo = jax.grad(lambda p: nll_halo(jnp.exp(p), nb, nb_coords, y_nb,
                                         coords, y))(lp)
    g_rep = jax.grad(lambda p: nll_rep(jnp.exp(p), coords, nb, y))(lp)
    np.testing.assert_allclose(np.asarray(g_halo), np.asarray(g_rep),
                               rtol=1e-9)


def test_prebuilt_nb_coords_factor_parity():
    """build_factors(nb_coords=...) with coords=None equals the gathering
    build — including padded (-1) neighbor rows."""
    n, m = 50, 5
    coords, _ = _data(n, 3, 2)
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("gaussian")
    cp = jnp.asarray([1.3, 0.4])
    a1, d1 = vops.build_factors(cov_fn, cp, coords, nb, 0.2, True)
    nbc = coords[jnp.maximum(nb, 0)]
    a2, d2 = vops.build_factors(cov_fn, cp, None, nb, 0.2, True,
                                row_coords=coords, nb_coords=nbc)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)
