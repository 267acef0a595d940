"""Round-4 config-tail behaviors (reference ``include/LightGBM/config.h``):
early_stopping_round / first_metric_only / metric_freq /
is_provide_training_metric, max_delta_step, feature_contri, seeds,
reg_sqrt, poisson_max_delta_step, label_gain + lambdarank_norm,
multi_error_top_k, max_bin_by_feature, use_missing / zero_as_missing,
start_iteration prediction."""
import numpy as np
import pytest

import gpboost_tpu as gpb


def _data(n=500, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = X[:, 0] + 0.5 * X[:, 1] ** 2 + 0.1 * rng.normal(size=n)
    return X, y


def test_early_stopping_round_param():
    X, y = _data()
    Xv, yv = _data(seed=1)
    ds = gpb.Dataset(X[:400], label=y[:400])
    dv = ds.create_valid(Xv, label=yv)
    res = {}
    bst = gpb.train({"objective": "regression", "num_leaves": 31,
                     "learning_rate": 0.5, "verbose": -1,
                     "early_stopping_round": 3}, ds, num_boost_round=200,
                    valid_sets=[dv], valid_names=["v"],
                    callbacks=[gpb.record_evaluation(res)],
                    verbose_eval=False)
    # overfits quickly at lr 0.5 -> must stop well before 200
    assert bst.best_iteration > 0
    assert len(res["v"]["l2"]) < 200


def test_max_delta_step_caps_leaves():
    X, y = _data()
    y = y * 100.0  # large outputs without a cap
    ds = gpb.Dataset(X, label=y)
    mds = 0.05
    bst = gpb.train({"objective": "regression", "num_leaves": 15,
                     "verbose": -1, "max_delta_step": mds,
                     "boost_from_average": False}, ds, num_boost_round=3)
    for t in bst.trees:
        lv = t.leaf_value[np.asarray(t.is_leaf)]
        # leaf values are shrunk by the learning rate after capping
        assert np.max(np.abs(lv)) <= mds * 0.1 + 1e-12


def test_feature_contri_steers_splits():
    rng = np.random.default_rng(0)
    n = 600
    X = rng.normal(size=(n, 2))
    # both features informative; kill feature 0's gain
    y = X[:, 0] + X[:, 1] + 0.01 * rng.normal(size=n)
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1, "feature_contri": [1e-8, 1.0]},
                    ds, num_boost_round=3)
    imp = bst.feature_importance(importance_type="split")
    assert imp[1] > 0 and imp[0] == 0


def test_reg_sqrt_roundtrip():
    rng = np.random.default_rng(2)
    n = 400
    X = rng.uniform(size=(n, 2))
    y = (5.0 * X[:, 0]) ** 2  # heavy-tailed positive target
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 31,
                     "verbose": -1, "reg_sqrt": True, "min_data_in_leaf": 5},
                    ds, num_boost_round=50)
    pred = bst.predict(X)
    assert np.all(pred >= -1e-6)
    assert float(np.mean((pred - y) ** 2)) < 0.05 * float(np.var(y))


def test_poisson_max_delta_step_hessian():
    from gpboost_tpu.boosting.objectives import Poisson
    obj = Poisson(max_delta_step=0.7)
    obj.init(np.array([1.0, 2.0]), None)
    score = np.array([0.0, 1.0])
    g, h = obj.get_gradients(score)
    np.testing.assert_allclose(h, np.exp(score + 0.7))
    np.testing.assert_allclose(g, np.exp(score) - obj.label)


def test_lambdarank_label_gain_and_norm():
    from gpboost_tpu.boosting.objectives import LambdaRank
    rng = np.random.default_rng(0)
    n, q = 40, 4
    label = rng.integers(0, 3, size=n).astype(float)
    group = [10] * q
    score = rng.normal(size=n)
    base = LambdaRank(norm=False)
    base.init(label, None, group=group)
    g0, h0 = base.get_gradients(score)
    normed = LambdaRank(norm=True)
    normed.init(label, None, group=group)
    g1, h1 = normed.get_gradients(score)
    # normalization shrinks per-query lambdas (log2(1+s)/s < 1 for s > 1)
    assert np.sum(np.abs(g1)) < np.sum(np.abs(g0))
    custom = LambdaRank(norm=False, label_gain=[0.0, 1.0, 10.0])
    custom.init(label, None, group=group)
    g2, _ = custom.get_gradients(score)
    assert not np.allclose(g2, g0)


def test_multi_error_top_k():
    from gpboost_tpu.boosting.metrics import multi_error
    y = np.array([0.0, 1.0, 2.0])
    # [C, n] scores: per-column true-class ranks are 1, 1, 2
    p = np.array([[0.3, 0.1, 0.7],
                  [0.5, 0.3, 0.5],
                  [0.2, 0.6, 0.2]]).reshape(-1)
    assert multi_error(y, p, num_class=3, top_k=1) == pytest.approx(1.0)
    assert multi_error(y, p, num_class=3, top_k=2) == pytest.approx(1.0 / 3.0)
    assert multi_error(y, p, num_class=3, top_k=3) == pytest.approx(0.0)


def test_max_bin_by_feature():
    X, y = _data()
    ds = gpb.Dataset(X, label=y, params={"max_bin_by_feature": [5, 0, 9, 0]})
    assert ds.num_bins[0] <= 5
    assert ds.num_bins[2] <= 9
    assert ds.num_bins[1] > 9 and ds.num_bins[3] > 9


def test_zero_as_missing_and_use_missing():
    rng = np.random.default_rng(3)
    n = 300
    X = rng.normal(size=(n, 2))
    X[:150, 0] = 0.0
    y = np.where(X[:, 0] == 0.0, 5.0, 0.0) + 0.01 * rng.normal(size=n)
    ds = gpb.Dataset(X, label=y, params={"zero_as_missing": True})
    assert ds.has_nan[0]
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1, "zero_as_missing": True,
                     "learning_rate": 0.5}, ds, num_boost_round=30)
    pred = bst.predict(X)
    assert float(np.mean((pred - y) ** 2)) < 0.05 * float(np.var(y))
    # use_missing=False: NaN behaves like 0.0
    Xn = X.copy()
    Xn[:150, 0] = np.nan
    ds2 = gpb.Dataset(Xn, label=y, params={"use_missing": False})
    assert not ds2.has_nan[0]


def test_separate_seed_streams():
    X, y = _data()
    params = {"objective": "regression", "num_leaves": 7, "verbose": -1,
              "bagging_fraction": 0.5, "bagging_freq": 1,
              "feature_fraction": 0.5}
    p1 = dict(params, bagging_seed=11, feature_fraction_seed=7)
    p2 = dict(params, bagging_seed=12, feature_fraction_seed=7)
    r1 = gpb.train(p1, gpb.Dataset(X, label=y), num_boost_round=5).predict(X)
    r1b = gpb.train(p1, gpb.Dataset(X, label=y), num_boost_round=5).predict(X)
    r2 = gpb.train(p2, gpb.Dataset(X, label=y), num_boost_round=5).predict(X)
    np.testing.assert_allclose(r1, r1b)   # reproducible
    assert not np.allclose(r1, r2)        # bagging seed matters


def test_start_iteration_predict():
    X, y = _data()
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1}, ds, num_boost_round=10)
    full = bst.predict(X, raw_score=True)
    head = bst.predict(X, num_iteration=4, raw_score=True)
    tail = bst.predict(X, start_iteration=4, raw_score=True)
    np.testing.assert_allclose(head + tail, full, rtol=1e-10, atol=1e-12)


def test_forcedbins_filename(tmp_path):
    import json
    X, y = _data()
    fb = tmp_path / "forced.json"
    fb.write_text(json.dumps(
        [{"feature": 0, "bin_upper_bound": [-0.5, 0.0, 0.5]}]))
    ds = gpb.Dataset(X, label=y, max_bin=8,
                     params={"forcedbins_filename": str(fb)})
    for edge in (-0.5, 0.0, 0.5):
        assert edge in ds.bin_upper_bounds[0]
    assert len(ds.bin_upper_bounds[0]) <= 8


def test_training_metric_and_metric_freq():
    X, y = _data()
    ds = gpb.Dataset(X, label=y)
    res = {}
    gpb.train({"objective": "regression", "num_leaves": 7, "verbose": -1,
               "is_provide_training_metric": True, "metric_freq": 2},
              ds, num_boost_round=6, valid_sets=[],
              callbacks=[gpb.record_evaluation(res)], verbose_eval=False)
    assert "training" in res
    assert len(res["training"]["l2"]) == 3  # every 2nd of 6 iterations
