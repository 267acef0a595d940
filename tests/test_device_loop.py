"""Whole-training-loop-on-device GPBoost (boosting/device_loop.py).

The fused driver compiles refit + pseudo-gradient + tree growth + score
update for every round into one lax.fori_loop dispatch. These tests hold the
fused program to a step-by-step host orchestration of the SAME primitives
(lbfgs_loop / _grow_tree_jit) — validating the fusion itself — plus
end-to-end engagement and eligibility gating through ``gpb.train``.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting import device_loop

N = 600
R = 5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    coords = rng.uniform(size=(N, 2))
    X = rng.uniform(size=(N, 3))
    f = 2.0 * np.sin(5 * X[:, 0]) + X[:, 1] ** 2
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(0.8 * np.exp(-D / 0.3) + 0.05 * np.eye(N))
    y = f + L @ rng.standard_normal(N)
    return coords, X, y


PARAMS = {"objective": "regression", "num_leaves": 15,
          "learning_rate": 0.1, "min_data_in_leaf": 10, "verbose": -1}


def _make_gp(coords):
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=8,
                     vecchia_ordering="none")
    gp.set_optim_params({"optimizer_cov": "lbfgs",
                         "init_cov_pars": [0.25, 1.0, 0.1]})
    return gp


def _train_fused(coords, X, y, monkeypatch, rounds=R):
    monkeypatch.setenv("GPBOOST_TPU_FORCE_DEVICE_LOOP", "1")
    gp = _make_gp(coords)
    bst = gpb.train(dict(PARAMS), gpb.Dataset(X, label=y), gp_model=gp,
                    num_boost_round=rounds)
    return bst, gp


def test_fused_matches_stepwise_orchestration(data, monkeypatch):
    """The one-dispatch fori_loop == a python loop over the same jitted
    primitives, round for round (same refits, same trees, same score)."""
    from gpboost_tpu.boosting.tree import _grow_tree_jit
    from gpboost_tpu.models.optimizers import lbfgs_loop

    coords, X, y = data
    bst, gp = _train_fused(coords, X, y, monkeypatch)
    assert len(bst.trees) == R

    # step-by-step replication with the same primitives
    gp2 = _make_gp(coords)
    ds = gpb.Dataset(X, label=y)
    monkeypatch.setenv("GPBOOST_TPU_NO_DEVICE_LOOP", "1")
    monkeypatch.setenv("GPBOOST_TPU_FORCE_DEVICE_LOOP", "0")
    from gpboost_tpu.boosting.booster import Booster
    b2 = Booster(params=dict(PARAMS), train_set=ds, gp_model=gp2)
    vec = gp2._approx
    vg, psi, dt = device_loop._vg_psi_for(vec, gp2.dtype)
    cfg = gp2.optim_cfg
    th = jnp.asarray(np.log(np.asarray(cfg.init_cov_pars)), dt)
    F = jnp.asarray(b2._score[:N], jnp.float64)
    yj = jnp.asarray(y)
    lr = PARAMS["learning_rate"]
    g2 = b2.grower
    num_bins = jnp.asarray(np.asarray(ds.num_bins))
    efb = getattr(ds, "efb", None)
    efb_maps = (None if efb is None else
                (efb.src_col, efb.src_bin, efb.default_bin, efb.fix_mask))
    step = jax.jit(lambda t, r: lbfgs_loop(
        vg, int(cfg.maxit), float(cfg.delta_rel_conv), dt, psi, t, r,
        vec.neighbors))
    leaf_seq = []
    for r in range(R):
        resid = (yj - F).astype(dt)
        th, v, k, aux = step(th, resid)
        gr = (-aux).astype(jnp.float32)
        out = _grow_tree_jit(
            ds.binned, num_bins, gr, jnp.ones(N, jnp.float32),
            int(ds.max_num_bins), g2.num_leaves, g2.max_depth,
            jnp.ones(N, bool), g2.lambda_l1, g2.lambda_l2,
            float(g2.min_data_in_leaf), g2.min_sum_hessian_in_leaf,
            g2.min_gain_to_split, efb_maps=efb_maps,
            hist_B=0 if efb is None else int(efb.max_bins_hist),
            hist_binned=None if efb is None else efb.binned_hist)
        lv = out[4]
        F = F + (lr * lv)[out[-1]].astype(F.dtype)
        leaf_seq.append(np.asarray(lv))

    np.testing.assert_allclose(np.asarray(bst._score[:N]), np.asarray(F),
                               atol=1e-10)
    np.testing.assert_allclose(gp.cov_pars_[:2],
                               np.exp(np.asarray(th, np.float64))[:2],
                               rtol=0.2)  # fused does one MORE refit at F_R
    for r in range(R):
        np.testing.assert_allclose(
            bst.trees[r].leaf_value, lr * leaf_seq[r], atol=1e-8)


def test_device_loop_quality_and_predict(data, monkeypatch):
    coords, X, y = data
    bst, gp = _train_fused(coords, X, y, monkeypatch, rounds=10)
    pred = bst.predict(X, gp_coords_pred=coords)
    arr = np.asarray(pred["response_mean"] if isinstance(pred, dict)
                     else pred)
    assert arr.shape == (N,)
    rmse = float(np.sqrt(np.mean((np.asarray(bst._score[:N]) - y) ** 2)))
    base = float(np.std(y))
    assert rmse < 0.9 * base, (rmse, base)   # actually learned something
    assert np.all(np.asarray(gp.cov_pars_) > 0)
    info = bst.device_training_info_
    assert info["cov_nll"].shape == (10,)
    assert np.all(np.isfinite(info["cov_nll"]))
    # refits warm-start from the previous round: NLL mostly decreasing
    assert info["cov_nll"][-1] < info["cov_nll"][0]
    assert np.all(info["refit_iterations"] >= 0)
    # save/load round trip keeps the fused-trained trees usable
    s = bst.model_to_string()
    bst2 = gpb.Booster(model_str=s)
    np.testing.assert_allclose(np.asarray(bst2.predict(X)),
                               np.asarray(bst.predict(X)), atol=1e-10)


def test_eligibility_gates(data, monkeypatch):
    coords, X, y = data
    monkeypatch.setenv("GPBOOST_TPU_FORCE_DEVICE_LOOP", "1")
    calls = {"n": 0}
    orig = device_loop.train_device

    def spy(b, r):
        calls["n"] += 1
        return orig(b, r)

    monkeypatch.setattr(device_loop, "train_device", spy)

    # bagging forces the host loop
    gp = _make_gp(coords)
    gpb.train(dict(PARAMS, bagging_fraction=0.8, bagging_freq=1),
              gpb.Dataset(X, label=y), gp_model=gp, num_boost_round=2)
    assert calls["n"] == 0
    # plain objective (no gp_model) forces the host loop
    gpb.train(dict(PARAMS), gpb.Dataset(X, label=y), num_boost_round=2)
    assert calls["n"] == 0
    # the common GPBoost case engages it
    gp = _make_gp(coords)
    gpb.train(dict(PARAMS), gpb.Dataset(X, label=y), gp_model=gp,
              num_boost_round=2)
    assert calls["n"] == 1
    # kill switch
    monkeypatch.setenv("GPBOOST_TPU_NO_DEVICE_LOOP", "1")
    gp = _make_gp(coords)
    gpb.train(dict(PARAMS), gpb.Dataset(X, label=y), gp_model=gp,
              num_boost_round=2)
    assert calls["n"] == 1
