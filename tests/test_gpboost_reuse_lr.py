"""GPBoost covariance-parameter trajectory parity with the reference package
(train_gp_model_cov_pars=true): the per-iteration refits must warm-start and
carry optimizer state like the reference (reuse_learning_rates_gp_model,
``re_model_template.h:841-883`` / ``InitializeOptimSettings`` :7463-7488).

Goldens generated from the reference v1.6.5 (/tmp/refpkg pattern); data
reproduced with np.random.default_rng, identical in both runs.

Tolerances: the refit PLACEMENT (end-of-iteration, gbdt.cpp:536-542), the
warm starts, and the lr/L-BFGS-memory reuse are matched exactly, but the
inner GD stopping point differs by ~0.1% per refit (CLAUDE.md: optimizer
trajectories are not bit-reproducible vs the reference's C++ loop), which
compounds to a few percent over 10 boosting iterations — hence relative
tolerances in the percent range. Before the end-of-iteration refit +
reuse-state fixes the deviation was 15%+.
"""
import json
import os

import numpy as np
import pytest

import gpboost_tpu as gpb

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                      "gpboost_traj_goldens.json")))


def sim(seed=0, n=200):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, 3))
    f = 2.0 * np.sin(5.0 * X[:, 0]) + X[:, 1] ** 2
    group = rng.integers(0, 20, size=n)
    b = 0.6 * rng.standard_normal(20)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(0.8 * np.exp(-D / 0.2) + 1e-10 * np.eye(n))
    gp = L @ rng.standard_normal(n)
    eps = 0.3 * rng.standard_normal(n)
    return X, f, group, b[group], coords, gp, eps


BP = {"objective": "regression", "num_leaves": 4, "learning_rate": 0.1,
      "min_data_in_leaf": 5, "verbose": -1}


def traj(gp_model, X, y, boost_params, nrounds=10):
    ds = gpb.Dataset(X, label=y)
    trajs = []

    def cb(env):
        trajs.append(np.asarray(gp_model.get_cov_pars()).ravel())

    gpb.train(boost_params, ds, gp_model=gp_model, num_boost_round=nrounds,
              callbacks=[cb])
    return np.asarray(trajs)


@pytest.fixture(scope="module")
def data():
    return sim()


def _check(got, key, rtol):
    want = np.asarray(GOLDENS[key])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-6)


def test_grouped_gd_reuse_trajectory(data):
    X, f, group, bg, coords, gpv, eps = data
    y = f + bg + eps
    m = gpb.GPModel(group_data=group, likelihood="gaussian")
    m.set_optim_params({"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
                        "use_nesterov_acc": True, "maxit": 1000})
    _check(traj(m, X, y, BP), "grouped_gd_reuse", 3e-2)


def test_grouped_gd_noreuse_trajectory(data):
    X, f, group, bg, coords, gpv, eps = data
    y = f + bg + eps
    m = gpb.GPModel(group_data=group, likelihood="gaussian")
    m.set_optim_params({"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
                        "use_nesterov_acc": True, "maxit": 1000})
    _check(traj(m, X, y, dict(BP, reuse_learning_rates_gp_model=False)),
           "grouped_gd_noreuse", 3e-2)


def test_vecchia_gd_reuse_trajectory(data):
    X, f, group, bg, coords, gpv, eps = data
    y2 = f + gpv + eps
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=10,
                    vecchia_ordering="none", likelihood="gaussian")
    m.set_optim_params({"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
                        "use_nesterov_acc": True, "maxit": 1000})
    _check(traj(m, X, y2, BP), "vecchia_gd_reuse", 2e-1)


def test_grouped_lbfgs_memory_reuse_trajectory(data):
    """L-BFGS inner refits with persistent curvature memory: the optimum each
    refit converges to is optimizer-path independent."""
    X, f, group, bg, coords, gpv, eps = data
    y = f + bg + eps
    m = gpb.GPModel(group_data=group, likelihood="gaussian")
    m.set_optim_params({"optimizer_cov": "lbfgs", "maxit": 1000})
    _check(traj(m, X, y, BP), "grouped_lbfgs_reuse", 3e-2)
