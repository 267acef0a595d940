"""Woodbury grouped-RE path: consistency with the dense path + scale."""
import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu import GPModel


@pytest.fixture(scope="module")
def grouped_data():
    rng = np.random.default_rng(7)
    n, m = 500, 20
    groups = rng.integers(0, m, size=n)
    groups2 = rng.integers(0, 7, size=n)
    x_slope = rng.uniform(-1, 1, size=n)
    b1 = 0.8 * rng.standard_normal(m)
    b2 = 0.5 * rng.standard_normal(7)
    b3 = 0.4 * rng.standard_normal(m)
    y = b1[groups] + b2[groups2] + x_slope * b3[groups] \
        + 0.3 * rng.standard_normal(n)
    return dict(n=n, groups=groups, groups2=groups2, x_slope=x_slope, y=y)


def _dense_nll(groups, groups2, x_slope, y, cov_pars):
    """Reference dense computation in numpy."""
    n = len(y)
    s2, v1, v2, v3 = cov_pars
    Z1 = (groups[:, None] == np.arange(groups.max() + 1)[None, :]).astype(float)
    Z2 = (groups2[:, None] == np.arange(groups2.max() + 1)[None, :]).astype(float)
    Z3 = Z1 * x_slope[:, None]
    psi = (s2 * np.eye(n) + v1 * Z1 @ Z1.T + v2 * Z2 @ Z2.T
           + v3 * Z3 @ Z3.T)
    L = np.linalg.cholesky(psi)
    al = np.linalg.solve(L, y)
    return 0.5 * (al @ al + 2 * np.log(np.diag(L)).sum()
                  + n * np.log(2 * np.pi))


def test_woodbury_nll_matches_dense(grouped_data):
    d = grouped_data
    m = GPModel(group_data=np.column_stack([d["groups"], d["groups2"]]),
                group_rand_coef_data=d["x_slope"],
                ind_effect_group_rand_coef=[1])
    cov_pars = [0.1, 0.6, 0.3, 0.2]
    nll = m.neg_log_likelihood(cov_pars=cov_pars, y=d["y"])
    ref = _dense_nll(d["groups"], d["groups2"], d["x_slope"], d["y"],
                     cov_pars)
    assert abs(nll - ref) < 1e-7


def test_woodbury_fit_and_predict_consistency(grouped_data):
    d = grouped_data
    m = GPModel(group_data=d["groups"])
    m.fit(y=d["y"], params={"optimizer_cov": "lbfgs"})
    pred = m.predict(y=d["y"], group_data_pred=d["groups"][:10],
                     predict_var=True, predict_response=False)
    # compare with brute-force posterior of b
    s2, v1 = m.get_cov_pars()
    mlev = d["groups"].max() + 1
    Z1 = (d["groups"][:, None] == np.arange(mlev)[None, :]).astype(float)
    M = Z1.T @ Z1 + (s2 / v1) * np.eye(mlev)
    b_post = np.linalg.solve(M, Z1.T @ d["y"])
    postcov = s2 * np.linalg.inv(M)
    np.testing.assert_allclose(pred["mu"], b_post[d["groups"][:10]],
                               atol=1e-6)
    np.testing.assert_allclose(
        pred["var"], np.diag(postcov)[d["groups"][:10]], atol=1e-6)


def test_woodbury_poisson_nll_matches_golden(grouped_data):
    """Cross-check: the earlier poisson grouped golden value also passes via
    the Woodbury Laplace path (it is the default for grouped-only models)."""
    from scipy.stats import poisson as spoisson
    from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal
    n, mm = 100, 10
    group = np.repeat(np.arange(1, mm + 1), n // mm)
    b_gr_1 = sim_rand_normal(mm, 0.565)
    mu = np.exp(b_gr_1[group - 1])
    y = spoisson.ppf(sim_rand_unif(n, 0.04532), mu)
    m = GPModel(group_data=group, likelihood="poisson")
    assert m._grouped_only
    nll = m.neg_log_likelihood(cov_pars=[0.9], y=y)
    assert abs(nll - 140.4554806) < 1e-3


def test_scale_100k():
    rng = np.random.default_rng(0)
    n, m = 100_000, 300
    groups = rng.integers(0, m, size=n)
    y = 0.8 * rng.standard_normal(m)[groups] + 0.5 * rng.standard_normal(n)
    mod = GPModel(group_data=groups)
    import time
    t0 = time.time()
    mod.fit(y=y, params={"optimizer_cov": "lbfgs"})
    assert time.time() - t0 < 60
    np.testing.assert_allclose(mod.get_cov_pars(), [0.25, 0.64], rtol=0.15)
