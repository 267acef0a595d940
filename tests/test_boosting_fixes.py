"""Behavioral tests for boosting-loop parity fixes (VERDICT round-1 item 5/6):

- bagging_freq semantics: re-bag every ``bagging_freq`` iterations, REUSE the
  bag in between (``GBDT::Bagging``, gbdt.cpp:255)
- Nesterov-accelerated boosting (nesterov_boosting.h:20, gbdt.cpp:414,
  gbdt_prediction.cpp:20-35)
- gain-based feature importance
- NaN default-direction learning (LightGBM NA bin + ``default_left``)
- GP-aware validation metrics (random_effects_metric.hpp:25,69;
  regression_metric.hpp:373,499) + early stopping on them
"""
import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting.booster import Booster, nesterov_schedule
from gpboost_tpu.boosting.dataset import Dataset


def _make_reg(n=300, F=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, F))
    y = 2.0 * X[:, 0] - X[:, 1] + 0.3 * rng.normal(size=n)
    return X, y


def test_bagging_freq_reuses_bag():
    X, y = _make_reg()
    ds = Dataset(X, label=y)
    b = Booster(params={"bagging_fraction": 0.5, "bagging_freq": 2,
                        "min_data_in_leaf": 5}, train_set=ds)
    masks = []
    for _ in range(4):
        b.update()
        masks.append(np.asarray(b._bag_mask))
    # redraw at it 0 and 2; reuse at 1 and 3
    assert np.array_equal(masks[0], masks[1])
    assert not np.array_equal(masks[1], masks[2])
    assert np.array_equal(masks[2], masks[3])


def test_no_bagging_when_freq_zero():
    X, y = _make_reg()
    ds = Dataset(X, label=y)
    b = Booster(params={"bagging_fraction": 0.5, "bagging_freq": 0,
                        "min_data_in_leaf": 5}, train_set=ds)
    b.update()
    assert b._bag_mask is None


def test_nesterov_training_trajectory():
    X, y = _make_reg()
    ds = Dataset(X, label=y)
    b = Booster(params={"learning_rate": 0.1, "use_nesterov_acc": True,
                        "num_leaves": 7, "min_data_in_leaf": 5},
                train_set=ds)
    tree_preds = []
    for _ in range(3):
        b.update()
        tree_preds.append(b._tree_train_pred(b.trees[-1]))
    # manual replay of gbdt.cpp:414: momentum step BEFORE each iteration,
    # lag1 initialized to the init score
    n = ds.num_data
    score = np.full(n, b.init_score[0])
    lag = score.copy()
    for it in range(3):
        mu = nesterov_schedule(it, 1, 0.5, 0)
        new = (mu + 1.0) * score - mu * lag
        lag = score.copy()
        score = new + tree_preds[it]
    np.testing.assert_allclose(np.asarray(b._score), score, rtol=1e-10)


def test_nesterov_prediction_replay():
    import jax.numpy as jnp
    X, y = _make_reg()
    ds = Dataset(X, label=y)
    params = {"learning_rate": 0.3, "use_nesterov_acc": True,
              "num_leaves": 7, "min_data_in_leaf": 5, "verbose": -1}
    b = gpb.train(params, ds, num_boost_round=4)
    Xj = jnp.asarray(X)
    cat0 = jnp.asarray(np.zeros_like(X, dtype=np.int32))
    tp = [np.asarray(b._tree_raw_pred(t, Xj, cat0)[0]) for t in b.trees]
    # gbdt_prediction.cpp recurrence: lag set at i==1 (no momentum there),
    # momentum from i==2 on
    out = np.full(len(y), b.init_score[0])
    lag = None
    for i in range(4):
        if i == 1:
            lag = out.copy()
        elif i > 1:
            mu = nesterov_schedule(i, 1, 0.5, 0)
            new = (mu + 1.0) * out - mu * lag
            lag = out.copy()
            out = new
        out = out + tp[i]
    np.testing.assert_allclose(b.predict(X, raw_score=True), out, rtol=1e-10)
    # momentum model differs from plain boosting
    params2 = dict(params, use_nesterov_acc=False)
    b2 = gpb.train(params2, Dataset(X, label=y), num_boost_round=4)
    assert not np.allclose(b.predict(X), b2.predict(X))


def test_nesterov_save_load_roundtrip(tmp_path):
    X, y = _make_reg()
    ds = Dataset(X, label=y)
    b = gpb.train({"use_nesterov_acc": True, "num_leaves": 7,
                   "min_data_in_leaf": 5, "verbose": -1}, ds,
                  num_boost_round=4)
    f = str(tmp_path / "m.json")
    b.save_model(f)
    b2 = Booster(model_file=f)
    np.testing.assert_allclose(b2.predict(X), b.predict(X), rtol=1e-12)


def test_gain_importance():
    X, y = _make_reg(n=500)
    ds = Dataset(X, label=y)
    b = gpb.train({"num_leaves": 15, "min_data_in_leaf": 5, "verbose": -1},
                  ds, num_boost_round=10)
    gain = b.feature_importance(importance_type="gain")
    split = b.feature_importance(importance_type="split")
    assert gain.shape == (4,) and split.shape == (4,)
    assert np.all(gain >= 0) and gain.sum() > 0
    # informative features dominate the gain ranking
    assert gain[0] > gain[2] and gain[0] > gain[3]
    assert gain[1] > gain[2] and gain[1] > gain[3]


def test_nan_default_direction_informative_missingness():
    rng = np.random.default_rng(1)
    n = 1000
    x0 = rng.normal(size=n)
    x1 = rng.normal(size=n)
    miss = rng.random(n) < 0.4
    X = np.column_stack([np.where(miss, np.nan, x0), x1])
    # missingness itself is the signal: mean 3 when missing, ~0 otherwise
    y = np.where(miss, 3.0, 0.1 * x0)
    ds = Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 8,
                     "min_data_in_leaf": 5, "verbose": -1}, ds,
                    num_boost_round=30)
    pred = bst.predict(np.array([[np.nan, 0.0], [0.0, 0.0]]))
    assert abs(pred[0] - 3.0) < 0.2
    assert abs(pred[1]) < 0.3
    # training (binned) path and raw prediction path route NaN identically
    np.testing.assert_allclose(bst.predict(X, raw_score=True),
                               np.asarray(bst._score[:n]), atol=1e-8)


def test_nan_default_direction_host_grower():
    # same check through the host (non-jit) grower: monotone constraints
    # force the slow path
    rng = np.random.default_rng(2)
    n = 600
    x0 = rng.normal(size=n)
    miss = rng.random(n) < 0.3
    X = np.column_stack([np.where(miss, np.nan, x0)])
    y = np.where(miss, -2.0, 0.05 * x0)
    ds = Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 6,
                     "min_data_in_leaf": 5, "verbose": -1,
                     "monotone_constraints": [1]}, ds, num_boost_round=20)
    pred = bst.predict(np.array([[np.nan], [0.0]]))
    assert abs(pred[0] - (-2.0)) < 0.2
    np.testing.assert_allclose(bst.predict(X, raw_score=True),
                               np.asarray(bst._score[:n]), atol=1e-8)


def test_nan_exclusive_bin_layout():
    X = np.array([[1.0], [2.0], [np.nan], [3.0], [np.nan]])
    ds = Dataset(X, label=np.zeros(5))
    assert bool(ds.has_nan[0])
    binned = np.asarray(ds.binned[:, 0])
    assert binned[2] == 0 and binned[4] == 0
    assert np.all(binned[[0, 1, 3]] >= 1)  # real values never share the NA bin
    # valid set built against this reference keeps the layout
    dv = ds.create_valid(np.array([[np.nan], [2.0]]), label=np.zeros(2))
    bv = np.asarray(dv.binned[:, 0])
    assert bv[0] == 0 and bv[1] == binned[1]


def _grouped_boost_data(seed=0, n=240, n_groups=24):
    rng = np.random.default_rng(seed)
    group = np.arange(n) % n_groups
    b_re = 0.8 * rng.normal(size=n_groups)
    X = rng.uniform(size=(n, 2))
    f = 2.0 * np.sin(4.0 * X[:, 0])
    y = f + b_re[group] + 0.3 * rng.normal(size=n)
    return X, y, group


def test_gp_metric_neg_log_likelihood_train():
    X, y, group = _grouped_boost_data()
    gp = gpb.GPModel(group_data=group, likelihood="gaussian")
    ds = Dataset(X, label=y)
    b = gpb.train({"objective": "regression", "verbose": -1,
                   "min_data_in_leaf": 10}, ds, gp_model=gp,
                  num_boost_round=3)
    res = b._eval(ds, "training", b._score)
    # metric registry routes neg_log_likelihood through the gp model
    b.metric_names = ["neg_log_likelihood"]
    res = b.eval_train()
    assert res[0][1] == "neg_log_likelihood"
    expected = float(gp.neg_log_likelihood(
        cov_pars=gp.cov_pars_, y=y - np.asarray(b._score[:len(y)])))
    assert abs(res[0][2] - expected) < 1e-8
    # validation-only guard
    with pytest.raises(ValueError):
        b.metric_names = ["test_neg_log_likelihood"]
        b.eval_train()


def test_gp_metric_test_nll_early_stopping():
    X, y, group = _grouped_boost_data()
    tr = np.arange(len(y)) % 4 != 0
    va = ~tr
    gp = gpb.GPModel(group_data=group[tr], likelihood="gaussian")
    gp.set_prediction_data(group_data_pred=group[va])
    dtrain = Dataset(X[tr], label=y[tr])
    dvalid = dtrain.create_valid(X[va], label=y[va])
    evals = {}
    bst = gpb.train({"objective": "regression",
                     "metric": "test_neg_log_likelihood",
                     "min_data_in_leaf": 10, "learning_rate": 0.2,
                     "verbose": -1},
                    dtrain, gp_model=gp, valid_sets=[dvalid],
                    num_boost_round=50, early_stopping_rounds=5,
                    evals_result=evals, verbose_eval=False)
    curve = evals["valid_0"]["test_neg_log_likelihood"]
    assert len(curve) >= 6
    assert min(curve) < curve[0]  # boosting improves the predictive NLL
    assert bst.best_iteration == int(np.argmin(curve)) + 1


def test_gp_metric_crps_gaussian():
    X, y, group = _grouped_boost_data(seed=3)
    tr = np.arange(len(y)) % 4 != 0
    va = ~tr
    gp = gpb.GPModel(group_data=group[tr], likelihood="gaussian")
    gp.set_prediction_data(group_data_pred=group[va])
    dtrain = Dataset(X[tr], label=y[tr])
    dvalid = dtrain.create_valid(X[va], label=y[va])
    evals = {}
    gpb.train({"objective": "regression", "metric": "crps_gaussian",
               "min_data_in_leaf": 10, "verbose": -1},
              dtrain, gp_model=gp, valid_sets=[dvalid], num_boost_round=10,
              evals_result=evals, verbose_eval=False)
    curve = evals["valid_0"]["crps_gaussian"]
    assert len(curve) == 10
    assert np.all(np.isfinite(curve))
    assert curve[-1] < curve[0]


def test_gp_metric_test_nll_non_gaussian():
    rng = np.random.default_rng(5)
    n, n_groups = 300, 30
    group = np.arange(n) % n_groups
    b_re = 0.6 * rng.normal(size=n_groups)
    X = rng.uniform(size=(n, 2))
    f = 1.2 * np.sin(4.0 * X[:, 0]) - 0.5
    lam = np.exp(f + b_re[group])
    y = rng.poisson(lam).astype(float)
    tr = np.arange(n) % 4 != 0
    va = ~tr
    gp = gpb.GPModel(group_data=group[tr], likelihood="poisson")
    gp.set_prediction_data(group_data_pred=group[va])
    dtrain = Dataset(X[tr], label=y[tr])
    dvalid = dtrain.create_valid(X[va], label=y[va])
    evals = {}
    gpb.train({"objective": "poisson",
               "metric": "test_neg_log_likelihood",
               "min_data_in_leaf": 10, "verbose": -1},
              dtrain, gp_model=gp, valid_sets=[dvalid], num_boost_round=8,
              evals_result=evals, verbose_eval=False)
    curve = evals["valid_0"]["test_neg_log_likelihood"]
    assert len(curve) == 8 and np.all(np.isfinite(curve))
    assert curve[-1] < curve[0]


def test_test_nll_gh_quadrature_matches_exact_gaussian():
    # for a gaussian likelihood the GH integral has the closed form
    # N(y; mu, var + sigma^2): check the quadrature machinery against it
    import jax.numpy as jnp
    from gpboost_tpu.models.laplace import test_nll_adaptive_gh
    y = jnp.asarray([0.3, -1.2, 2.0])
    mu = jnp.asarray([0.0, -1.0, 1.5])
    var = jnp.asarray([0.5, 0.2, 1.0])
    sigma2 = 0.25
    nll = np.asarray(test_nll_adaptive_gh(
        "gaussian", y, mu, var, jnp.asarray([sigma2])))
    tot = np.asarray(var) + sigma2
    exact = 0.5 * ((np.asarray(y) - np.asarray(mu)) ** 2 / tot
                   + np.log(tot) + np.log(2 * np.pi))
    np.testing.assert_allclose(nll, exact, rtol=1e-8)


def test_line_search_closed_form_matches_golden_section():
    """Gaussian GP line search: the closed-form quadratic minimizer equals
    the golden-section argmin of the same NLL (to search tolerance)."""
    rng = np.random.default_rng(9)
    n, n_groups = 200, 20
    group = np.arange(n) % n_groups
    b_re = 0.7 * rng.standard_normal(n_groups)
    X = rng.uniform(size=(n, 2))
    y = 2.0 * X[:, 0] + b_re[group] + 0.3 * rng.standard_normal(n)
    gp = gpb.GPModel(group_data=group, likelihood="gaussian")
    ds = Dataset(X, label=y)
    bst = gpb.train({"objective": "regression",
                     "line_search_step_length": True,
                     "min_data_in_leaf": 10, "verbose": -1},
                    ds, gp_model=gp, num_boost_round=2)
    # the applied coefficient is alpha * learning_rate (the reference also
    # applies shrinkage ON TOP of the line-search step, gbdt.cpp:485-487);
    # check alpha is the argmin of the exact NLL along the raw-tree ray
    tree = bst.trees[-1]
    vals = bst._tree_train_pred(tree)
    alpha = tree.shrinkage / bst.learning_rate
    t_raw = vals / tree.shrinkage  # unscaled tree direction
    base = np.asarray(bst._score[:n]) - vals  # score before this tree
    losses = [float(gp.neg_log_likelihood(cov_pars=gp.cov_pars_,
                                          y=y - base - a * t_raw))
              for a in (alpha - 0.05, alpha, alpha + 0.05)]
    assert losses[1] <= losses[0] + 1e-9
    assert losses[1] <= losses[2] + 1e-9


def test_early_stopped_tree_importance_counts_real_splits_only():
    """A tree that stops below num_leaves must not report its UNALLOCATED
    flat-array nodes (is_leaf=False, left==self) as feature-0 splits
    (Tree.internal_nodes); feature_importance / split-value histograms were
    inflated before."""
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(50, 3))
    y = X[:, 2] * 3 + 0.1 * rng.normal(size=50)
    ds = Dataset(X, label=y)
    # min_data_in_leaf=20 on n=50 stops growth after 1 split of 8 requested
    bst = gpb.train({"objective": "regression", "num_leaves": 8,
                     "min_data_in_leaf": 20, "verbose": -1},
                    ds, num_boost_round=1)
    tree = bst.trees[0]
    assert tree.num_leaves == 2
    assert list(tree.internal_nodes()) == [0]
    imp = bst.feature_importance("split")
    assert imp.sum() == 1 and imp[2] == 1
    # split-value histogram sees only the real split's feature
    assert len(bst.get_split_value_histogram(2)[0]) > 0
    counts, _ = bst.get_split_value_histogram(0)
    assert np.sum(counts) == 0
