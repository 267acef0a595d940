"""Cost-effective gradient boosting (CEGB) penalties.

Behavioral parity with the reference's python tests
(tests/python_package_test/test_basic.py:236-295) plus a closed-form check of
the penalized-gain selection.
"""
import json

import numpy as np
import pytest

import gpboost_tpu as gpb


def _train(X, y, extra_params, rounds=10):
    params = {"objective": "regression", "verbose": -1, "learning_rate": 0.1,
              "min_data_in_leaf": 5}
    params.update(extra_params)
    ds = gpb.Dataset(X, label=y)
    return gpb.train(params, ds, num_boost_round=rounds)


def _used_features(bst):
    used = set()
    for t in json.loads(bst.model_to_string())["trees"]:
        stack, leaf, seen = [0], t["is_leaf"], set()
        while stack:
            node = stack.pop()
            if node in seen or leaf[node]:
                continue
            seen.add(node)
            used.add(int(t["split_feature"][node]))
            stack += [t["left"][node], t["right"][node]]
    return used


def _model_string(bst):
    d = json.loads(bst.model_to_string())
    d.pop("params", None)  # penalties live in params; compare structure only
    return json.dumps(d, sort_keys=True)


@pytest.fixture(scope="module")
def cegb_data():
    rng = np.random.default_rng(42)
    X = rng.random((100, 5))
    X[:, [1, 3]] = 0
    y = rng.random(100)
    return X, y


def test_cegb_affects_behavior(cegb_data):
    X, y = cegb_data
    base = _train(X, y, {})
    base_txt = _model_string(base)
    cases = [{"cegb_penalty_feature_coupled": [50, 100, 10, 25, 30]},
             {"cegb_penalty_feature_lazy": [1, 2, 3, 4, 5]},
             {"cegb_penalty_split": 1}]
    for case in cases:
        bst = _train(X, y, case)
        assert _model_string(bst) != base_txt, case


def test_cegb_scaling_equalities(cegb_data):
    X, y = cegb_data
    pairs = [({"cegb_penalty_feature_coupled": [1, 2, 1, 2, 1]},
              {"cegb_penalty_feature_coupled": [0.5, 1, 0.5, 1, 0.5],
               "cegb_tradeoff": 2}),
             ({"cegb_penalty_feature_lazy": [0.01, 0.02, 0.03, 0.04, 0.05]},
              {"cegb_penalty_feature_lazy": [0.005, 0.01, 0.015, 0.02, 0.025],
               "cegb_tradeoff": 2}),
             ({"cegb_penalty_split": 1},
              {"cegb_penalty_split": 2, "cegb_tradeoff": 0.5})]
    for p1, p2 in pairs:
        b1 = _train(X, y, p1)
        b2 = _train(X, y, p2)
        assert _model_string(b1) == _model_string(b2), (p1, p2)


def test_cegb_coupled_penalty_prefers_reused_feature():
    """With a huge coupled penalty on feature 1, the model should stick to
    feature 0 even though feature 1 is the (slightly) better raw split."""
    rng = np.random.default_rng(0)
    n = 400
    x0 = rng.random(n)
    x1 = x0 + 0.01 * rng.standard_normal(n)  # nearly identical information
    X = np.column_stack([x0, x1])
    y = (x1 > 0.5).astype(float) + 0.05 * rng.standard_normal(n)
    bst = _train(X, y, {"cegb_penalty_feature_coupled": [0.0, 1e6]},
                 rounds=5)
    assert 1 not in _used_features(bst)
    # and without the penalty, feature 1 does get used
    bst2 = _train(X, y, {}, rounds=5)
    assert 1 in _used_features(bst2)


def test_cegb_split_penalty_limits_tree_size(cegb_data):
    X, y = cegb_data
    big = _train(X, y, {"cegb_penalty_split": 10.0}, rounds=3)
    small = _train(X, y, {}, rounds=3)
    n_splits_pen = sum(t["num_leaves"] - 1
                       for t in json.loads(big.model_to_string())["trees"])
    n_splits = sum(t["num_leaves"] - 1
                   for t in json.loads(small.model_to_string())["trees"])
    assert n_splits_pen < n_splits
