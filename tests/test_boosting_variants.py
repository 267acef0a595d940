"""DART / GOSS / RF boosting variants, SHAP, refit."""
import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    n, F = 2000, 8
    X = rng.uniform(size=(n, F))
    y = (2 * X[:, 0] + np.sin(5 * X[:, 1]) + (X[:, 2] > 0.5)
         + 0.1 * rng.standard_normal(n))
    return X, y


def test_dart(data):
    X, y = data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "boosting": "dart",
                     "drop_rate": 0.2, "verbose": -1}, ds,
                    num_boost_round=50)
    pred = bst.predict(X)
    assert np.mean((pred - y) ** 2) < 0.3 * np.var(y)
    # DART must have renormalized some trees (shrinkage != lr for some)
    shr = {round(t.shrinkage, 6) for t in bst.trees}
    assert len(shr) > 1


def test_goss(data):
    X, y = data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "boosting": "goss",
                     "top_rate": 0.2, "other_rate": 0.1, "verbose": -1}, ds,
                    num_boost_round=60)
    pred = bst.predict(X)
    assert np.mean((pred - y) ** 2) < 0.15 * np.var(y)


def test_rf(data):
    X, y = data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "boosting": "rf",
                     "bagging_fraction": 0.6, "bagging_freq": 1,
                     "feature_fraction": 0.8, "verbose": -1}, ds,
                    num_boost_round=40)
    pred = bst.predict(X)
    # RF prediction is the average of unshrunk trees
    assert np.mean((pred - y) ** 2) < 0.3 * np.var(y)
    assert abs(np.mean(pred) - np.mean(y)) < 0.2
    # save/load keeps averaging semantics
    s = bst.model_to_string()
    bst2 = gpb.Booster(model_str=s)
    np.testing.assert_allclose(bst2.predict(X), pred)


def test_shap_sums_to_prediction(data):
    X, y = data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1}, ds, num_boost_round=5)
    sub = X[:20]
    contrib = bst.predict(sub, pred_contrib=True)
    assert contrib.shape == (20, X.shape[1] + 1)
    raw = bst.predict(sub, raw_score=True)
    np.testing.assert_allclose(contrib.sum(axis=1), raw, atol=1e-6)
    # informative features get most attribution
    imp = np.abs(contrib[:, :-1]).mean(axis=0)
    assert set(np.argsort(imp)[-3:]) == {0, 1, 2}


def test_refit(data):
    X, y = data
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "verbose": -1}, ds,
                    num_boost_round=20)
    rng = np.random.default_rng(9)
    X2 = rng.uniform(size=(1000, X.shape[1]))
    y2 = (2 * X2[:, 0] + np.sin(5 * X2[:, 1]) + (X2[:, 2] > 0.5)
          + 0.1 * rng.standard_normal(1000)) + 1.0  # shifted target
    before = np.mean((bst.predict(X2) - y2) ** 2)
    bst.refit(X2, y2, decay_rate=0.5)
    after = np.mean((bst.predict(X2) - y2) ** 2)
    assert after < before


def test_categorical_splits():
    rng = np.random.default_rng(3)
    n = 3000
    cat = rng.integers(0, 12, size=n).astype(float)
    cat_effect = np.array([2.0, -1.5, 0.5, 3.0, -2.0, 0.0, 1.0, -0.5, 2.5,
                           -3.0, 0.7, -1.0])
    y = cat_effect[cat.astype(int)] + 0.05 * rng.standard_normal(n)
    X = cat[:, None]
    # single 4-leaf tree: subset splits must beat contiguous thresholds
    ds_plain = gpb.Dataset(X, label=y)
    bst_plain = gpb.train({"objective": "regression", "num_leaves": 4,
                           "min_data_in_leaf": 5, "learning_rate": 1.0,
                           "verbose": -1}, ds_plain, num_boost_round=1)
    mse_plain = np.mean((bst_plain.predict(X) - y) ** 2)
    ds_cat = gpb.Dataset(X, label=y, categorical_feature=[0])
    bst_cat = gpb.train({"objective": "regression", "num_leaves": 4,
                         "min_data_in_leaf": 5, "learning_rate": 1.0,
                         "verbose": -1}, ds_cat, num_boost_round=1)
    mse_cat = np.mean((bst_cat.predict(X) - y) ** 2)
    assert mse_cat < 0.5 * mse_plain
    assert any(bst_cat._tree_has_cat(t) for t in bst_cat.trees)
    # save/load round trip with categorical splits
    bst2 = gpb.Booster(model_str=bst_cat.model_to_string())
    np.testing.assert_allclose(bst2.predict(X), bst_cat.predict(X))


def test_monotone_constraints():
    rng = np.random.default_rng(11)
    n = 3000
    x = rng.uniform(size=(n, 2))
    # increasing in x0 with bumps, plus noise
    y = 2 * x[:, 0] + 0.3 * np.sin(8 * x[:, 0]) + x[:, 1] \
        + 0.05 * rng.standard_normal(n)
    ds = gpb.Dataset(x, label=y)
    bst = gpb.train({"objective": "regression",
                     "monotone_constraints": [1, 0], "num_leaves": 31,
                     "verbose": -1}, ds, num_boost_round=50)
    grid = np.linspace(0.01, 0.99, 60)
    for x1 in (0.2, 0.8):
        Xg = np.column_stack([grid, np.full_like(grid, x1)])
        pred = bst.predict(Xg)
        assert np.all(np.diff(pred) >= -1e-10), "monotonicity violated"
    # still fits reasonably
    assert np.mean((bst.predict(x) - y) ** 2) < 0.15 * np.var(y)


def test_tobit():
    rng = np.random.default_rng(0)
    n = 1000
    X = rng.uniform(size=(n, 5))
    latent = 2 * X[:, 0] - 1 + 0.3 * rng.standard_normal(n)
    y = np.clip(latent, 0.0, 1.0)
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "tobit", "sigma": 0.3, "yl": 0.0,
                     "yu": 1.0, "verbose": -1}, ds, num_boost_round=30)
    corr = np.corrcoef(bst.predict(X), latent)[0, 1]
    assert corr > 0.85


def test_lambdarank_and_ndcg():
    rng = np.random.default_rng(1)
    nq, per = 50, 20
    rel = rng.integers(0, 4, size=nq * per).astype(float)
    Xr = rng.uniform(size=(nq * per, 4))
    Xr[:, 0] = rel + 0.3 * rng.standard_normal(nq * per)
    group = np.full(nq, per)
    dsr = gpb.Dataset(Xr, label=rel, group=group)
    bstr = gpb.train({"objective": "lambdarank", "verbose": -1}, dsr,
                     num_boost_round=20)
    from gpboost_tpu.boosting.metrics import ndcg_at_k
    sc = bstr.predict(Xr)
    assert ndcg_at_k(rel, sc, group) > 0.9
    # sklearn ranker wrapper
    est = gpb.GPBoostRanker(n_estimators=10)
    est.fit(Xr, rel, group=group)
    assert ndcg_at_k(rel, est.predict(Xr), group) > 0.85


def test_linear_tree():
    """Linear leaf models (reference LinearTreeLearner) beat constant leaves
    on piecewise-linear targets."""
    rng = np.random.default_rng(0)
    n = 2000
    X = rng.uniform(size=(n, 4))
    y = np.where(X[:, 0] > 0.5, 3 * X[:, 1] + 1, -2 * X[:, 1]) \
        + 0.05 * rng.standard_normal(n)
    ds = gpb.Dataset(X, label=y)
    common = {"objective": "regression", "num_leaves": 7,
              "learning_rate": 0.5, "verbose": -1}
    b_plain = gpb.train(common, ds, num_boost_round=30)
    b_lin = gpb.train({**common, "linear_tree": True}, ds,
                      num_boost_round=30)
    mse_p = np.mean((b_plain.predict(X) - y) ** 2)
    mse_l = np.mean((b_lin.predict(X) - y) ** 2)
    assert mse_l < 0.6 * mse_p
    # round trip with linear leaves
    b2 = gpb.Booster(model_str=b_lin.model_to_string())
    np.testing.assert_allclose(b2.predict(X), b_lin.predict(X))
