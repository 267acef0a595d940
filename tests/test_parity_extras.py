"""Small parity items from VERDICT round 1: rank_xendcg objective, auc_mu
metric, tree digraph/plotting, snapshot_freq, cover_tree inducing points."""
import os

import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting.dataset import Dataset


def _rank_data(seed=0):
    rng = np.random.default_rng(seed)
    n_q, per_q = 30, 10
    n = n_q * per_q
    X = rng.uniform(size=(n, 3))
    rel = np.clip((3 * X[:, 0] + rng.normal(size=n) * 0.3).astype(int), 0, 3)
    group = [per_q] * n_q
    return X, rel.astype(float), group


def test_rank_xendcg_trains_and_improves_ndcg():
    X, rel, group = _rank_data()
    ds = Dataset(X, label=rel, group=group)
    evals = {}
    bst = gpb.train({"objective": "rank_xendcg", "metric": "ndcg",
                     "min_data_in_leaf": 5, "verbose": -1,
                     "learning_rate": 0.2},
                    ds, num_boost_round=20,
                    valid_sets=[Dataset(X, label=rel, group=group,
                                        reference=ds)],
                    evals_result=evals, verbose_eval=False)
    # ndcg reports every eval_at position (reference rank_metric.hpp)
    curve = evals["valid_0"]["ndcg@5"]
    assert curve[-1] > curve[0]
    # distinct from lambdarank (different lambdas)
    bst2 = gpb.train({"objective": "lambdarank", "min_data_in_leaf": 5,
                      "verbose": -1, "learning_rate": 0.2},
                     Dataset(X, label=rel, group=group), num_boost_round=5)
    p1 = bst.predict(X, raw_score=True)
    p2 = bst2.predict(X, raw_score=True)
    assert not np.allclose(p1[:50], p2[:50])


def test_auc_mu_metric():
    from gpboost_tpu.boosting.metrics import auc_mu
    rng = np.random.default_rng(1)
    n, C = 300, 3
    y = rng.integers(0, C, size=n).astype(float)
    # perfect scores -> auc_mu = 1
    perfect = np.zeros((C, n))
    perfect[y.astype(int), np.arange(n)] = 5.0
    assert auc_mu(y, perfect.reshape(-1), num_class=C) == pytest.approx(1.0)
    # random scores -> ~0.5
    noise = rng.normal(size=(C, n))
    v = auc_mu(y, noise.reshape(-1), num_class=C)
    assert 0.35 < v < 0.65
    # binary case agrees with plain AUC
    from gpboost_tpu.boosting.metrics import auc
    yb = (y > 0.5).astype(float) % 2
    s = rng.normal(size=n)
    two = np.vstack([-s / 2, s / 2])
    assert auc_mu(yb, two.reshape(-1), num_class=2) == pytest.approx(
        auc(yb, s), abs=1e-10)


def test_auc_mu_in_training_eval():
    rng = np.random.default_rng(2)
    n, C = 300, 3
    X = rng.uniform(size=(n, 3))
    y = (X[:, 0] * 3).astype(int).clip(0, C - 1).astype(float)
    ds = Dataset(X, label=y)
    evals = {}
    gpb.train({"objective": "multiclass", "num_class": C, "metric": "auc_mu",
               "min_data_in_leaf": 5, "verbose": -1}, ds, num_boost_round=8,
              valid_sets=[Dataset(X, label=y, reference=ds)],
              evals_result=evals, verbose_eval=False)
    curve = evals["valid_0"]["auc_mu"]
    assert curve[-1] > 0.9  # separable problem


def test_tree_digraph_and_plot(tmp_path):
    rng = np.random.default_rng(3)
    X = rng.uniform(size=(200, 2))
    y = np.where(X[:, 0] > 0.5, 2.0, -1.0) + 0.01 * rng.normal(size=200)
    X[rng.random(200) < 0.2, 1] = np.nan
    ds = Dataset(X, label=y, feature_name=["f_a", "f_b"])
    bst = gpb.train({"verbose": -1, "min_data_in_leaf": 5}, ds,
                    num_boost_round=3)
    g = gpb.create_tree_digraph(bst, tree_index=0)
    src = getattr(g, "source")
    assert "digraph" in src and "f_a" in src and "leaf" in src
    assert "->" in src
    import matplotlib
    matplotlib.use("Agg")
    ax = gpb.plot_tree(bst, tree_index=1)
    assert ax is not None


def test_snapshot_freq(tmp_path):
    rng = np.random.default_rng(4)
    X = rng.uniform(size=(120, 2))
    y = X[:, 0] + 0.1 * rng.normal(size=120)
    ds = Dataset(X, label=y)
    stem = str(tmp_path / "model.json")
    gpb.train({"verbose": -1, "min_data_in_leaf": 5, "snapshot_freq": 2,
               "output_model": stem}, ds, num_boost_round=5)
    assert os.path.exists(stem + ".snapshot_iter_2")
    assert os.path.exists(stem + ".snapshot_iter_4")
    assert not os.path.exists(stem + ".snapshot_iter_5")
    b = gpb.Booster(model_file=stem + ".snapshot_iter_4")
    assert b.current_iteration() == 4


def test_cover_tree_inducing_points():
    from gpboost_tpu.ops.inducing import select_inducing_points
    rng = np.random.default_rng(5)
    coords = rng.uniform(size=(800, 2))
    ip = select_inducing_points(coords, 500, "cover_tree", seed=0,
                                cover_tree_radius=0.15)
    # every point is covered within the radius
    d = np.sqrt(((coords[:, None] - ip[None]) ** 2).sum(-1)).min(1)
    assert d.max() <= 0.15 + 1e-12
    # radius controls the count
    ip2 = select_inducing_points(coords, 500, "cover_tree", seed=0,
                                 cover_tree_radius=0.3)
    assert len(ip2) < len(ip) <= 500
    # end-to-end through the GPModel constructor
    y = rng.normal(size=800)
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="fitc", ind_points_selection="cover_tree",
                    cover_tree_radius=0.2, num_ind_points=400)
    assert np.isfinite(m.neg_log_likelihood(cov_pars=[0.1, 1.0, 0.2], y=y))


def test_likelihood_approximation_suffixes():
    """Approximation-type suffix parsing (likelihoods.h:8052): lss_laplace
    is rejected loudly (the reference's own compute paths all reject it),
    fisher_laplace suffixes parse for supported families."""
    rng = np.random.default_rng(6)
    group = np.arange(40) % 8
    with pytest.raises(NotImplementedError, match="lss_laplace"):
        gpb.GPModel(group_data=group, likelihood="gamma_lls_laplace")
    with pytest.raises(NotImplementedError, match="fisher_laplace"):
        gpb.GPModel(group_data=group, likelihood="poisson_fisher_laplace")
    m = gpb.GPModel(group_data=group, likelihood="t_fisher_laplace")
    assert m.likelihood == "t"


def test_dataset_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    X = rng.uniform(size=(150, 3))
    X[rng.random(150) < 0.2, 1] = np.nan
    y = X[:, 0] + 0.1 * rng.normal(size=150)
    ds = Dataset(X, label=y, weight=np.ones(150),
                 feature_name=["a", "b", "c"])
    fn = str(tmp_path / "train.bin")
    ds.save_binary(fn)
    ds2 = Dataset(fn)
    np.testing.assert_array_equal(np.asarray(ds2.binned),
                                  np.asarray(ds.binned))
    np.testing.assert_array_equal(ds2.num_bins, ds.num_bins)
    np.testing.assert_array_equal(ds2.has_nan, ds.has_nan)
    np.testing.assert_allclose(ds2.label, y)
    assert ds2.feature_name == ["a", "b", "c"]
    # training from the reloaded binary gives the identical model
    b1 = gpb.train({"verbose": -1, "min_data_in_leaf": 5}, ds,
                   num_boost_round=5)
    b2 = gpb.train({"verbose": -1, "min_data_in_leaf": 5}, ds2,
                   num_boost_round=5)
    np.testing.assert_allclose(b2.predict(X), b1.predict(X), atol=1e-12)


def test_dataset_field_api():
    rng = np.random.default_rng(8)
    X = rng.uniform(size=(50, 2))
    ds = Dataset(X, label=np.zeros(50))
    ds.set_field("weight", np.ones(50))
    assert np.all(ds.get_field("weight") == 1.0)
    ds.set_init_score(np.full(50, 0.3))
    assert np.all(ds.get_init_score() == 0.3)
    ds.set_group([25, 25])
    assert list(ds.get_group()) == [25, 25]
    with pytest.raises(ValueError):
        ds.set_field("nonsense", None)


def test_register_logger_redirects_library_output():
    import logging
    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    lg = logging.getLogger("gpb_test_logger")
    lg.setLevel(logging.DEBUG)
    lg.addHandler(H())
    gpb.register_logger(lg)
    try:
        rng = np.random.default_rng(13)
        X = rng.uniform(size=(80, 2))
        y = X[:, 0] + 0.1 * rng.normal(size=80)
        ds = Dataset(X, label=y)
        vs = Dataset(X, label=y, reference=ds)
        gpb.train({"verbose": 1, "min_data_in_leaf": 5}, ds,
                  num_boost_round=2, valid_sets=[vs], verbose_eval=True)
    finally:
        from gpboost_tpu.utils import log as _log
        _log._LOGGER = _log._DummyLogger()
    assert any("[1]" in r for r in records)  # eval lines went to the logger
    with pytest.raises(TypeError):
        gpb.register_logger("not a logger")


def test_get_nested_categories():
    outer = np.array([1, 1, 1, 2, 2, 2])
    inner = np.array([1, 1, 2, 1, 1, 2])
    nested = gpb.get_nested_categories(outer, inner)
    # same (outer, inner) pair -> same level; pairs across outers differ
    assert nested[0] == nested[1] != nested[2]
    assert nested[3] == nested[4] != nested[5]
    assert nested[0] != nested[3]
    assert len(np.unique(nested)) == 4
