"""Transposed (structure-of-arrays) Vecchia factor build.

The [n, m, m] batched sweep pads m~20 to (24, 128) TPU tiles (~29x HBM
traffic); ``_build_factors_transposed`` stores lower-triangle entries as [n]
vectors instead (see ops/vecchia.py). These tests pin it to the standard
path bit-for-bit (values AND gradients) across kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, m = 400, 9
    coords = jnp.asarray(rng.uniform(size=(n, 2)))
    neighbors = vops.find_neighbors(coords, m, method="exact")
    y = jnp.asarray(rng.standard_normal(n))
    return coords, neighbors, y


@pytest.mark.parametrize("name,kwargs,pars", [
    ("exponential", {}, [1.3, 0.15]),
    ("matern", {"shape": 1.5}, [1.3, 0.15]),
    ("matern", {"shape": 2.5}, [0.8, 0.3]),
    ("gaussian", {}, [1.1, 0.2]),
    ("powered_exponential", {"shape": 1.3}, [1.1, 0.2]),
])
def test_transposed_matches_standard(setup, name, kwargs, pars):
    coords, neighbors, _ = setup
    cov_fn = CovFunction.create(name, **kwargs)
    cp = jnp.asarray(pars)
    a1, d1 = vops._build_factors_transposed(
        cov_fn, cp, coords, neighbors, jnp.float64(0.1), True, coords, False)
    a2, d2 = vops.build_factors(cov_fn, cp, coords, neighbors,
                                jnp.float64(0.1), True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_transposed_gradients_match(setup):
    coords, neighbors, y = setup
    cov_fn = CovFunction.create("exponential")
    cp = jnp.asarray([0.1, 1.3, 0.15])

    def f_t(cp):
        a, d = vops._build_factors_transposed(
            cov_fn, cp[1:], coords, neighbors, cp[0], True, coords, False)
        return vops.vecchia_nll(a, d, neighbors, y)

    def f_s(cp):
        a, d = vops.build_factors(cov_fn, cp[1:], coords, neighbors, cp[0],
                                  True)
        return vops.vecchia_nll(a, d, neighbors, y)

    np.testing.assert_allclose(float(f_t(cp)), float(f_s(cp)), rtol=1e-13)
    g_t = jax.grad(f_t)(cp)
    g_s = jax.grad(f_s)(cp)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_s), rtol=1e-9)


def test_transposed_ard_scaled_path(setup):
    coords, neighbors, y = setup
    cov_fn = CovFunction.create("matern_ard", shape=1.5, dim_coords=2)
    cp = jnp.asarray([1.2, 0.2, 0.4])
    scaled_coords = cov_fn.scale_coords(coords, cp)
    a1, d1 = vops._build_factors_transposed(
        cov_fn, cp, scaled_coords, neighbors, jnp.float64(0.1), True,
        scaled_coords, True)
    a2, d2 = vops.build_factors(cov_fn, cp, coords, neighbors,
                                jnp.float64(0.1), True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)
