"""Reference model-text interop (VERDICT r3 item 7).

Round-trips with the actual reference implementation at /tmp/refpkg
(``gbdt_model_text.cpp:314/:420`` SaveModelToString / LoadModelFromString):
reference-trained ``.txt`` models load here and predict identically, and
our boosters save text models the reference loads and serves.
"""
import os
import sys
import types

import numpy as np
import pytest

import gpboost_tpu as gpb

REF = "/tmp/refpkg"


def _ref_gpboost():
    if not os.path.isdir(REF):
        pytest.skip("reference package harness not present")
    sys.modules.setdefault("optuna", types.ModuleType("optuna"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import gpboost as ref
    return ref


def _data(n=400, seed=0, with_cat=False):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    if with_cat:
        X[:, 3] = rng.integers(0, 6, size=n)
    y = (X[:, 0] + 0.5 * np.sin(3 * X[:, 1])
         + (np.where(X[:, 3] >= 3, 1.5, -0.5) if with_cat else 0.0)
         + 0.05 * rng.normal(size=n))
    return X, y


def test_load_reference_regression_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data()
    ds = ref.Dataset(X, label=y, params={"verbose": -1})
    bst = ref.train({"objective": "regression", "num_leaves": 15,
                     "learning_rate": 0.2, "min_data_in_leaf": 5,
                     "verbose": -1}, ds, num_boost_round=20)
    path = str(tmp_path / "ref_model.txt")
    bst.save_model(path)
    ref_pred = bst.predict(X)
    ours = gpb.Booster(model_file=path)
    np.testing.assert_allclose(ours.predict(X), ref_pred, rtol=1e-10,
                               atol=1e-10)
    # num_iteration subsets agree too
    np.testing.assert_allclose(ours.predict(X, num_iteration=7),
                               bst.predict(X, num_iteration=7),
                               rtol=1e-10, atol=1e-10)


def test_load_reference_binary_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data(seed=1)
    yb = (y > 0).astype(float)
    ds = ref.Dataset(X, label=yb, params={"verbose": -1})
    bst = ref.train({"objective": "binary", "num_leaves": 7,
                     "min_data_in_leaf": 5, "verbose": -1}, ds,
                    num_boost_round=15)
    path = str(tmp_path / "ref_binary.txt")
    bst.save_model(path)
    ours = gpb.Booster(model_file=path)
    np.testing.assert_allclose(ours.predict(X), bst.predict(X),
                               rtol=1e-10, atol=1e-10)


def test_load_reference_categorical_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data(seed=2, with_cat=True)
    ds = ref.Dataset(X, label=y, categorical_feature=[3],
                     params={"verbose": -1})
    bst = ref.train({"objective": "regression", "num_leaves": 7,
                     "min_data_in_leaf": 5, "verbose": -1,
                     "min_data_per_group": 5, "cat_smooth": 1.0,
                     "max_cat_to_onehot": 2}, ds, num_boost_round=10)
    path = str(tmp_path / "ref_cat.txt")
    bst.save_model(path)
    ours = gpb.Booster(model_file=path)
    np.testing.assert_allclose(ours.predict(X), bst.predict(X),
                               rtol=1e-10, atol=1e-10)


def test_load_reference_multiclass_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data(seed=3)
    ym = np.digitize(y, [-0.5, 0.7]).astype(float)
    ds = ref.Dataset(X, label=ym, params={"verbose": -1})
    bst = ref.train({"objective": "multiclass", "num_class": 3,
                     "num_leaves": 7, "min_data_in_leaf": 5,
                     "verbose": -1}, ds, num_boost_round=8)
    path = str(tmp_path / "ref_mc.txt")
    bst.save_model(path)
    ours = gpb.Booster(model_file=path)
    ref_pred = bst.predict(X)            # [n, 3] probabilities
    our_pred = ours.predict(X)           # flat [3 * n]
    our_mat = np.asarray(our_pred).reshape(3, -1).T
    np.testing.assert_allclose(our_mat, ref_pred, rtol=1e-9, atol=1e-10)


def test_reference_loads_our_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data(seed=4)
    ds = gpb.Dataset(X, label=y)
    ours = gpb.train({"objective": "regression", "num_leaves": 15,
                      "learning_rate": 0.2, "min_data_in_leaf": 5,
                      "verbose": -1}, ds, num_boost_round=20)
    path = str(tmp_path / "our_model.txt")
    ours.save_model(path)                 # .txt -> text format
    theirs = ref.Booster(model_file=path)
    np.testing.assert_allclose(theirs.predict(X), ours.predict(X),
                               rtol=1e-10, atol=1e-10)


def test_reference_loads_our_binary_model(tmp_path):
    ref = _ref_gpboost()
    X, y = _data(seed=5)
    yb = (y > 0).astype(float)
    ds = gpb.Dataset(X, label=yb)
    ours = gpb.train({"objective": "binary", "num_leaves": 7,
                      "min_data_in_leaf": 5, "verbose": -1}, ds,
                     num_boost_round=12)
    path = str(tmp_path / "our_binary.txt")
    ours.save_model(path)
    theirs = ref.Booster(model_file=path)
    np.testing.assert_allclose(theirs.predict(X), ours.predict(X),
                               rtol=1e-9, atol=1e-10)


def test_text_roundtrip_without_reference(tmp_path):
    """Self round-trip through the text format (no reference needed)."""
    X, y = _data(seed=6, with_cat=True)
    ds = gpb.Dataset(X, label=y, categorical_feature=[3])
    ours = gpb.train({"objective": "regression", "num_leaves": 9,
                      "min_data_in_leaf": 5, "verbose": -1,
                      "min_data_per_group": 5}, ds, num_boost_round=10)
    s = ours.model_to_string(format="text")
    again = gpb.Booster(model_str=s)
    np.testing.assert_allclose(again.predict(X), ours.predict(X),
                               rtol=1e-10, atol=1e-10)
