"""Behavioral tests for the LightGBM config tail (VERDICT round-2 item 7):
extra_trees, feature_fraction_bynode, path_smooth, interaction_constraints,
cat_l2 / cat_smooth / max_cat_to_onehot, min_data_in_bin / min_data_per_group,
is_unbalance / scale_pos_weight, pos/neg_bagging_fraction, and the
intermediate monotone method + monotone_penalty.
"""
import numpy as np
import pytest

import gpboost_tpu as gpb


def simdata(n=500, F=6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, F))
    y = 2 * X[:, 0] - X[:, 1] + 0.5 * np.sin(6 * X[:, 2]) \
        + 0.2 * rng.standard_normal(n)
    return X, y


BASE = {"objective": "regression", "num_leaves": 8, "verbose": -1,
        "min_data_in_leaf": 5, "learning_rate": 0.2}


def leaf_paths(tree):
    """(leaf_id, set of split features on the path) pairs."""
    out = []

    def walk(node, feats):
        if tree.is_leaf[node]:
            out.append((node, feats))
            return
        f = int(tree.split_feature[node])
        walk(int(tree.left[node]), feats | {f})
        walk(int(tree.right[node]), feats | {f})

    walk(0, frozenset())
    return out


def test_extra_trees_randomizes_thresholds():
    X, y = simdata()
    b0 = gpb.train(BASE, gpb.Dataset(X, label=y), num_boost_round=3)
    be = gpb.train(dict(BASE, extra_trees=True),
                   gpb.Dataset(X, label=y), num_boost_round=3)
    t0 = [int(t.threshold_bin[n]) for t in b0.trees
          for n in t.internal_nodes()]
    te = [int(t.threshold_bin[n]) for t in be.trees
          for n in t.internal_nodes()]
    assert t0 != te  # random single-candidate bins change the thresholds
    pred = be.predict(X)
    assert float(np.mean((y - pred) ** 2)) < float(np.var(y))


def test_feature_fraction_bynode_varies_candidates_within_tree():
    X, y = simdata()
    b = gpb.train(dict(BASE, feature_fraction_bynode=0.34, num_leaves=16),
                  gpb.Dataset(X, label=y), num_boost_round=4)
    # per-NODE sampling: a single tree must still reach several features
    # (per-TREE sampling at 0.34 would allow at most 2 of 6)
    feats_per_tree = [len({int(t.split_feature[n])
                           for n in t.internal_nodes()}) for t in b.trees]
    assert max(feats_per_tree) > 2


def test_path_smooth_shrinks_leaves_toward_parent():
    X, y = simdata()
    b0 = gpb.train(BASE, gpb.Dataset(X, label=y), num_boost_round=1)
    bs = gpb.train(dict(BASE, path_smooth=100.0),
                   gpb.Dataset(X, label=y), num_boost_round=1)
    v0 = np.abs(b0.trees[0].leaf_value[b0.trees[0].is_leaf])
    vs = np.abs(bs.trees[0].leaf_value[bs.trees[0].is_leaf])
    # smoothing pulls leaf outputs toward the (near-zero) root output
    assert np.mean(vs[vs > 0]) < np.mean(v0[v0 > 0])


def test_interaction_constraints_respected_on_every_path():
    X, y = simdata(n=800)
    groups = [[0, 1], [2, 3, 4, 5]]
    b = gpb.train(dict(BASE, interaction_constraints=groups, num_leaves=16),
                  gpb.Dataset(X, label=y), num_boost_round=5)
    gsets = [frozenset(g) for g in groups]
    for t in b.trees:
        for _, feats in leaf_paths(t):
            assert any(feats <= g for g in gsets), feats


def test_min_data_in_bin_merges_small_bins():
    rng = np.random.default_rng(3)
    x = np.repeat(np.arange(50.0), 4)  # 50 distinct values, 4 rows each
    ds1 = gpb.Dataset(x[:, None], label=rng.normal(size=len(x)),
                      params={"min_data_in_bin": 1})
    ds8 = gpb.Dataset(x[:, None], label=rng.normal(size=len(x)),
                      params={"min_data_in_bin": 8})
    assert int(ds8.num_bins[0]) < int(ds1.num_bins[0])
    assert int(ds8.num_bins[0]) <= 25 + 1


def test_max_cat_to_onehot_gives_single_category_splits():
    rng = np.random.default_rng(4)
    n = 600
    cat = rng.integers(0, 3, size=n).astype(np.float64)  # 3 categories
    X = np.column_stack([cat, rng.uniform(size=n)])
    y = np.where(cat == 1, 2.0, 0.0) + 0.1 * rng.standard_normal(n)
    params = dict(BASE, max_cat_to_onehot=4, min_data_per_group=1,
                  cat_smooth=1, num_leaves=4)
    b = gpb.train(params, gpb.Dataset(X, label=y, categorical_feature=[0],
                                      params=params), num_boost_round=1)
    t = b.trees[0]
    cat_nodes = [nd for nd in t.internal_nodes() if t.is_categorical[nd]]
    assert cat_nodes
    # one-hot: the left set of the first categorical split is ONE category
    assert int(np.sum(t.cat_mask[cat_nodes[0]])) == 1


def test_min_data_per_group_blocks_small_category_splits():
    rng = np.random.default_rng(5)
    n = 400
    cat = rng.integers(0, 8, size=n).astype(np.float64)
    X = np.column_stack([cat, rng.uniform(size=n)])
    y = np.where(cat == 2, 1.5, 0.0) + 0.1 * rng.standard_normal(n)
    loose = dict(BASE, min_data_per_group=1, cat_smooth=1,
                 max_cat_to_onehot=1)
    tight = dict(loose, min_data_per_group=399)
    bl = gpb.train(loose, gpb.Dataset(X, label=y, categorical_feature=[0],
                                      params=loose), num_boost_round=1)
    bt = gpb.train(tight, gpb.Dataset(X, label=y, categorical_feature=[0],
                                      params=tight), num_boost_round=1)
    ncat = lambda b: sum(bool(b.trees[0].is_categorical[nd])  # noqa: E731
                         for nd in b.trees[0].internal_nodes())
    assert ncat(bl) > 0
    assert ncat(bt) == 0  # no group can reach 399 of 400 on both sides


def test_cat_smooth_excludes_sparse_categories():
    rng = np.random.default_rng(6)
    n = 300
    cat = np.concatenate([np.zeros(140), np.ones(140),
                          np.full(20, 2.0)])  # category 2 has 20 rows
    rng.shuffle(cat)
    X = np.column_stack([cat, rng.uniform(size=n)])
    y = np.where(cat == 0, 1.0, -1.0) + 0.1 * rng.standard_normal(n)
    params = dict(BASE, cat_smooth=50, min_data_per_group=1,
                  max_cat_to_onehot=1, num_leaves=4)
    b = gpb.train(params, gpb.Dataset(X, label=y, categorical_feature=[0],
                                      params=params), num_boost_round=1)
    t = b.trees[0]
    for nd in t.internal_nodes():
        if t.is_categorical[nd]:
            # category 2 (count 20 < cat_smooth 50) is ineligible for the
            # left set — it always falls right
            assert not t.cat_mask[nd][2]


def test_is_unbalance_and_scale_pos_weight_shift_probabilities():
    rng = np.random.default_rng(7)
    n = 1000
    X = rng.uniform(size=(n, 4))
    yb = (rng.uniform(size=n) < 0.1).astype(np.float64)  # 10% positives
    p0 = {"objective": "binary", "num_leaves": 4, "verbose": -1}
    preds = {}
    for name, extra in [("plain", {}), ("unb", {"is_unbalance": True}),
                        ("spw", {"scale_pos_weight": 9.0})]:
        params = dict(p0, **extra)
        b = gpb.train(params, gpb.Dataset(X, label=yb, params=params),
                      num_boost_round=5)
        preds[name] = float(np.mean(b.predict(X)))
    # up-weighting positives raises the mean predicted probability
    assert preds["unb"] > preds["plain"] + 0.1
    assert preds["spw"] > preds["plain"] + 0.1
    with pytest.raises(ValueError):
        gpb.train(dict(p0, is_unbalance=True, scale_pos_weight=2.0),
                  gpb.Dataset(X, label=yb), num_boost_round=1)


def test_pos_neg_bagging_fractions_sample_by_class():
    rng = np.random.default_rng(8)
    n = 1000
    X = rng.uniform(size=(n, 4))
    yb = (rng.uniform(size=n) < 0.5).astype(np.float64)
    params = {"objective": "binary", "num_leaves": 4, "verbose": -1,
              "bagging_freq": 1, "pos_bagging_fraction": 0.2,
              "neg_bagging_fraction": 0.9}
    b = gpb.train(params, gpb.Dataset(X, label=yb, params=params),
                  num_boost_round=1)
    mask = np.asarray(b._bag_mask)
    pos_rate = mask[yb > 0].mean()
    neg_rate = mask[yb <= 0].mean()
    assert abs(pos_rate - 0.2) < 0.08
    assert abs(neg_rate - 0.9) < 0.08


def _monotone_check(params, sign):
    rng = np.random.default_rng(9)
    n = 800
    X = rng.uniform(size=(n, 3))
    y = 1.5 * X[:, 0] ** 2 - X[:, 1] + 0.1 * rng.standard_normal(n)
    p = dict(BASE, monotone_constraints=[sign, 0, 0], num_leaves=16, **params)
    b = gpb.train(p, gpb.Dataset(X, label=y, params=p), num_boost_round=10)
    grid = np.linspace(0.01, 0.99, 40)
    probe = np.column_stack([grid, np.full(40, 0.5), np.full(40, 0.5)])
    pred = b.predict(probe)
    d = np.diff(pred) * sign
    assert np.all(d >= -1e-10)


def test_monotone_intermediate_enforces_monotonicity():
    _monotone_check({"monotone_constraints_method": "intermediate"}, 1)
    _monotone_check({"monotone_constraints_method": "intermediate"}, -1)


def test_monotone_advanced_accepted_and_monotone():
    _monotone_check({"monotone_constraints_method": "advanced"}, 1)


def test_monotone_penalty_discourages_root_monotone_split():
    rng = np.random.default_rng(10)
    n = 800
    X = rng.uniform(size=(n, 2))
    # feature 0 slightly stronger: without penalty it wins the root split
    y = 1.2 * X[:, 0] + X[:, 1] + 0.05 * rng.standard_normal(n)
    p0 = dict(BASE, monotone_constraints=[1, 0], num_leaves=4)
    b0 = gpb.train(p0, gpb.Dataset(X, label=y, params=p0), num_boost_round=1)
    assert int(b0.trees[0].split_feature[0]) == 0
    p1 = dict(p0, monotone_penalty=1.0)
    b1 = gpb.train(p1, gpb.Dataset(X, label=y, params=p1), num_boost_round=1)
    assert int(b1.trees[0].split_feature[0]) == 1
