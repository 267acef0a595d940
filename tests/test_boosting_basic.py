"""Boosting engine mechanics (mirrors the reference's python test_basic.py /
test_engine.py coverage: Dataset, Booster, objectives, cv, callbacks)."""
import jax.numpy as jnp
import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def reg_data():
    rng = np.random.default_rng(42)
    n, F = 2000, 10
    X = rng.uniform(size=(n, F))
    y = (2 * X[:, 0] + np.sin(5 * X[:, 1]) + (X[:, 2] > 0.6) * 1.5
         + 0.1 * rng.standard_normal(n))
    return X, y


def test_dataset_binning(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y, max_bin=63)
    assert ds.binned.shape == X.shape
    assert int(ds.num_bins.max()) <= 63
    # bin monotonicity: larger raw value -> bin >= smaller's bin
    col = np.asarray(ds.binned)[:, 0]
    order = np.argsort(X[:, 0])
    assert np.all(np.diff(col[order]) >= 0)


def test_regression_learns(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=60)
    mse = np.mean((bst.predict(X) - y) ** 2)
    assert mse < 0.05 * np.var(y)


def test_objectives_run(reg_data):
    X, y = reg_data
    ypos = np.abs(y) + 0.1
    for obj, label in [("regression_l1", y), ("huber", y), ("poisson",
                       np.round(ypos)), ("gamma", ypos), ("quantile", y),
                       ("tweedie", ypos)]:
        ds = gpb.Dataset(X, label=label)
        bst = gpb.train({"objective": obj, "verbose": -1}, ds,
                        num_boost_round=10)
        pred = bst.predict(X)
        assert np.all(np.isfinite(pred)), obj


def test_binary_auc(reg_data):
    X, y = reg_data
    yb = (y > np.median(y)).astype(float)
    ds = gpb.Dataset(X, label=yb)
    bst = gpb.train({"objective": "binary", "metric": "auc", "verbose": -1},
                    ds, num_boost_round=30)
    from gpboost_tpu.boosting.metrics import auc
    assert auc(yb, bst.predict(X)) > 0.95


def test_multiclass(reg_data):
    X, y = reg_data
    yc = np.digitize(y, np.quantile(y, [0.33, 0.66])).astype(float)
    ds = gpb.Dataset(X, label=yc)
    bst = gpb.train({"objective": "multiclass", "num_class": 3,
                     "verbose": -1}, ds, num_boost_round=20)
    prob = bst.predict(X)
    n = X.shape[0]
    p = prob.reshape(3, n)
    np.testing.assert_allclose(p.sum(axis=0), 1.0, atol=1e-9)
    assert np.mean(p.argmax(axis=0) == yc) > 0.85


def test_early_stopping_and_eval(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X[:1500], label=y[:1500])
    dv = ds.create_valid(X[1500:], label=y[1500:])
    ev = {}
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=500, valid_sets=[dv],
                    early_stopping_rounds=5, evals_result=ev,
                    verbose_eval=False)
    assert bst.best_iteration > 0
    assert len(ev["valid_0"]["l2"]) < 500


def test_bagging_feature_fraction(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "bagging_fraction": 0.7,
                     "bagging_freq": 1, "feature_fraction": 0.7,
                     "verbose": -1}, ds, num_boost_round=30)
    mse = np.mean((bst.predict(X) - y) ** 2)
    assert mse < 0.2 * np.var(y)


def test_cv(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    res = gpb.cv({"objective": "regression", "verbose": -1}, ds,
                 num_boost_round=20, nfold=3, seed=1)
    assert "l2-mean" in res
    assert len(res["l2-mean"]) == 20
    assert res["l2-mean"][-1] < res["l2-mean"][0]


def test_model_roundtrip(reg_data, tmp_path):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=10)
    p = tmp_path / "model.json"
    bst.save_model(str(p))
    bst2 = gpb.Booster(model_file=str(p))
    np.testing.assert_allclose(bst2.predict(X), bst.predict(X))
    s = bst.model_to_string()
    bst3 = gpb.Booster(model_str=s)
    np.testing.assert_allclose(bst3.predict(X), bst.predict(X))


def test_feature_importance(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=20)
    imp = bst.feature_importance()
    # informative features 0,1,2 dominate
    assert set(np.argsort(imp)[-3:]) == {0, 1, 2}


def test_pred_leaf(reg_data):
    X, y = reg_data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1}, ds, num_boost_round=5)
    leaves = bst.predict(X[:50], pred_leaf=True)
    assert leaves.shape == (50, 5)
    assert leaves.max() < 7


def test_weights(reg_data):
    X, y = reg_data
    w = np.ones_like(y)
    w[:100] = 10.0
    ds = gpb.Dataset(X, label=y, weight=w)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=10)
    assert np.all(np.isfinite(bst.predict(X)))


def test_nan_features(reg_data):
    X, y = reg_data
    Xn = X.copy()
    Xn[::7, 0] = np.nan
    ds = gpb.Dataset(Xn, label=y)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=10)
    assert np.all(np.isfinite(bst.predict(Xn)))


def test_cv_gpboost_oos(reg_data):
    """GPBoostOOS: covariance parameters fitted on out-of-sample errors
    (reference gpb.cv(fit_GP_cov_pars_OOS=True))."""
    X, y = reg_data
    rng = np.random.default_rng(3)
    groups = rng.integers(0, 20, size=len(y))
    y2 = y + 0.6 * rng.standard_normal(20)[groups]
    gp = gpb.GPModel(group_data=groups)
    gpb.cv({"objective": "regression", "verbose": -1},
           gpb.Dataset(X, label=y2), num_boost_round=20, nfold=3,
           gp_model=gp, fit_GP_cov_pars_OOS=True, seed=2)
    pars = gp.get_cov_pars()
    assert pars is not None and np.all(np.isfinite(pars))
    assert 0.1 < pars[1] < 1.0  # near true 0.36


def test_crps_gaussian_metric():
    from gpboost_tpu.boosting.metrics import crps_gaussian
    rng = np.random.default_rng(0)
    y = rng.standard_normal(500)
    tight = crps_gaussian(y, y, 0.01 * np.ones(500))
    calibrated = crps_gaussian(y, np.zeros(500), np.ones(500))
    wide = crps_gaussian(y, np.zeros(500), 25 * np.ones(500))
    assert tight < calibrated < wide


class TestForcedSplitsAndOVA:
    def test_forced_splits(self, tmp_path):
        import json
        import gpboost_tpu as gpb
        rng = np.random.default_rng(0)
        X = rng.normal(size=(500, 4))
        y = (X[:, 2] > 0.3) * 2.0 + 0.1 * rng.normal(size=500)
        fs = {"feature": 1, "threshold": 0.0,
              "left": {"feature": 0, "threshold": 0.5}}
        fpath = tmp_path / "forced.json"
        fpath.write_text(json.dumps(fs))
        ds = gpb.Dataset(X, label=y)
        bst = gpb.train({"objective": "regression", "verbose": -1,
                         "forcedsplits_filename": str(fpath),
                         "min_data_in_leaf": 5},
                        ds, num_boost_round=30)
        # every tree's root splits on feature 1, its left child on feature 0
        for k in range(3):
            t = bst.trees[k]
            assert t.split_feature[0] == 1
            assert not t.is_leaf[0]
            lid = t.left[0]
            assert t.split_feature[lid] == 0 and not t.is_leaf[lid]
        pred = bst.predict(X)
        assert np.sqrt(np.mean((pred - y) ** 2)) < 0.5

    def test_multiclass_ova(self):
        import gpboost_tpu as gpb
        rng = np.random.default_rng(1)
        n = 600
        X = rng.normal(size=(n, 3))
        y = (X[:, 0] > 0.5).astype(int) + (X[:, 1] > 0.0).astype(int)
        ds = gpb.Dataset(X, label=y.astype(float))
        bst = gpb.train({"objective": "multiclassova", "num_class": 3,
                         "verbose": -1, "min_data_in_leaf": 5},
                        ds, num_boost_round=30)
        prob = bst.predict(X).reshape(3, n)
        acc = np.mean(prob.argmax(axis=0) == y)
        assert acc > 0.85

    def test_libsvm_loader(self, tmp_path):
        from gpboost_tpu.native import load_libsvm
        f = tmp_path / "data.svm"
        f.write_text("1.5 1:0.5 3:2.0\n-0.5 2:1.0\n2.0 1:1.0 2:-1 3:0.5\n")
        X, y = load_libsvm(str(f))
        assert X.shape == (3, 3)
        np.testing.assert_allclose(y, [1.5, -0.5, 2.0])
        np.testing.assert_allclose(X[0], [0.5, 0.0, 2.0])
        np.testing.assert_allclose(X[1], [0.0, 1.0, 0.0])

    def test_timer(self):
        from gpboost_tpu.utils import timer
        timer.enable(True)
        with timer.timed("phase_a"):
            pass
        rep = timer.report(reset=True)
        assert "phase_a" in rep
        timer.enable(False)


def test_fast_grower_matches_host_grower():
    """The single-dispatch jitted grower (used on accelerators) reproduces
    the host-driven grower exactly: same splits, partitions, leaf values."""
    from gpboost_tpu.boosting.tree import (GrowerParams, grow_tree,
                                           grow_tree_fast)
    rng = np.random.default_rng(0)
    n, F, B = 3000, 8, 32
    binned = jnp.asarray(rng.integers(0, B, size=(n, F)), jnp.int32)
    nb = jnp.full(F, B, jnp.int32)
    grad = jnp.asarray(rng.standard_normal(n))
    hess = jnp.ones(n)
    params = GrowerParams(num_leaves=15, max_depth=5, min_data_in_leaf=20,
                          min_sum_hessian_in_leaf=1e-3, lambda_l1=0.0,
                          lambda_l2=0.1, min_gain_to_split=0.0)
    t1, rl1 = grow_tree(binned, nb, grad, hess, B, params)
    t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params)
    assert t1.num_leaves == t2.num_leaves
    np.testing.assert_array_equal(np.asarray(t1.split_feature),
                                  np.asarray(t2.split_feature))
    np.testing.assert_array_equal(np.asarray(t1.threshold_bin),
                                  np.asarray(t2.threshold_bin))
    np.testing.assert_allclose(np.asarray(t1.leaf_value),
                               np.asarray(t2.leaf_value), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(rl1), np.asarray(rl2))
