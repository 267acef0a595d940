"""Convenience-surface parity with the reference python Booster/Dataset
(basic.py:1180,2323): the small accessor/mutator methods applications rely
on."""
import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting.dataset import Dataset


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(300, 3))
    y = 2 * X[:, 0] - X[:, 1] + 0.1 * rng.normal(size=300)
    ds = Dataset(X, label=y, feature_name=["a", "b", "c"])
    bst = gpb.train({"verbose": -1, "min_data_in_leaf": 5,
                     "num_leaves": 7}, ds, num_boost_round=5)
    return X, y, ds, bst


def test_booster_accessors(trained):
    X, y, ds, bst = trained
    assert bst.num_trees() == 5
    assert bst.num_model_per_iteration() == 1
    assert bst.feature_name() == ["a", "b", "c"]
    assert bst.lower_bound() < bst.upper_bound()
    preds = bst.predict(X, raw_score=True)
    assert preds.min() >= bst.lower_bound() - 1e-9
    assert preds.max() <= bst.upper_bound() + 1e-9
    v = bst.get_leaf_output(0, 0)
    assert np.isfinite(v)
    counts, edges = bst.get_split_value_histogram(0)
    assert counts.sum() > 0
    df = bst.trees_to_dataframe()
    assert len(df) > 5 and "split_feature" in df.columns


def test_booster_attrs_roundtrip(trained, tmp_path):
    _, _, _, bst = trained
    bst.set_attr(note="hello", version="2")
    assert bst.attr("note") == "hello"
    f = str(tmp_path / "m.json")
    bst.save_model(f)
    b2 = gpb.Booster(model_file=f)
    assert b2.attr("note") == "hello"
    bst.set_attr(note=None)
    assert bst.attr("note") is None


def test_rollback_one_iter(trained):
    rng = np.random.default_rng(1)
    X = rng.uniform(size=(200, 2))
    y = X[:, 0] + 0.1 * rng.normal(size=200)
    ds = Dataset(X, label=y)
    b = gpb.Booster(params={"verbose": -1, "min_data_in_leaf": 5},
                    train_set=ds)
    b.update()
    score_after_1 = np.asarray(b._score).copy()
    b.update()
    b.rollback_one_iter()
    assert b.num_trees() == 1
    np.testing.assert_allclose(np.asarray(b._score), score_after_1,
                               atol=1e-12)


def test_reset_parameter_and_eval(trained):
    X, y, ds, bst = trained
    bst.reset_parameter({"learning_rate": 0.42})
    assert bst.learning_rate == 0.42
    res = bst.eval(ds, "training")
    assert res[0][1] in ("l2",)
    with pytest.raises(NotImplementedError):
        bst.set_network([])


def test_model_from_string(trained):
    X, _, _, bst = trained
    s = bst.model_to_string()
    b2 = gpb.Booster.model_from_string(s)
    np.testing.assert_allclose(b2.predict(X), bst.predict(X), atol=1e-12)


def test_dataset_accessors():
    rng = np.random.default_rng(2)
    X = rng.uniform(size=(100, 2))
    y = X[:, 0]
    ds = Dataset(X, label=y, feature_name=["u", "v"])
    assert ds.get_feature_name() == ["u", "v"]
    assert ds.get_data() is ds.raw_data
    assert ds.get_params()["max_bin"] == 255
    ds.set_feature_name(["p", "q"])
    assert ds.feature_name == ["p", "q"]
    sub = ds.subset([0, 2, 4, 6])
    assert sub.num_data == 4
    np.testing.assert_array_equal(np.asarray(sub.binned),
                                  np.asarray(ds.binned)[[0, 2, 4, 6]])
    assert ds in sub.get_ref_chain()


def test_dataset_add_features_from():
    rng = np.random.default_rng(3)
    X1 = rng.uniform(size=(150, 2))
    X2 = rng.uniform(size=(150, 2))
    d1 = Dataset(X1, label=X1[:, 0], feature_name=["a", "b"])
    d2 = Dataset(X2, label=None, feature_name=["c", "d"])
    d1.add_features_from(d2)
    assert d1.num_features == 4
    assert d1.get_feature_name() == ["a", "b", "c", "d"]
    bst = gpb.train({"verbose": -1, "min_data_in_leaf": 5}, d1,
                    num_boost_round=3)
    assert bst.num_feature() == 4


def test_set_categorical_feature():
    rng = np.random.default_rng(4)
    X = np.column_stack([rng.integers(0, 5, 120).astype(float),
                         rng.uniform(size=120)])
    ds = Dataset(X, label=rng.normal(size=120))
    ds.set_categorical_feature([0])
    assert ds.categorical_feature == [0]
    assert 0 in ds.cat_maps


def test_cli_refit_task(tmp_path):
    from gpboost_tpu.cli import main
    rng = np.random.default_rng(5)
    X = rng.uniform(size=(150, 2))
    y = X[:, 0] + 0.1 * rng.normal(size=150)
    data = np.column_stack([y, X])
    train_f = str(tmp_path / "train.csv")
    np.savetxt(train_f, data, delimiter=",")
    model_f = str(tmp_path / "model.json")
    assert main(["task=train", f"data={train_f}", "num_iterations=5",
                 f"output_model={model_f}", "verbose=-1",
                 "min_data_in_leaf=5"]) == 0
    refit_f = str(tmp_path / "model_refit.json")
    assert main(["task=refit", f"data={train_f}",
                 f"input_model={model_f}",
                 f"output_model={refit_f}"]) == 0
    b = gpb.Booster(model_file=refit_f)
    assert b.num_trees() == 5
