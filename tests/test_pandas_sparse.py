"""pandas DataFrame / scipy.sparse input marshalling.

Mirrors the reference's behavior (``python-package/gpboost/basic.py:543``
``_data_from_pandas``: category dtypes -> codes with training-time levels
remembered; ``basic.py:847,:1396``: CSR/CSC accepted for train and predict).
"""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import gpboost_tpu as gpb


def _make_df(n=400, seed=0):
    rng = np.random.default_rng(seed)
    x0 = rng.normal(size=n)
    x1 = rng.uniform(size=n)
    cat = pd.Categorical(rng.choice(["a", "b", "c"], size=n),
                         categories=["a", "b", "c"])
    df = pd.DataFrame({"x0": x0, "x1": x1, "kind": cat})
    y = (x0 + np.where(np.asarray(cat) == "b", 2.0, 0.0)
         + 0.1 * rng.normal(size=n))
    return df, y


def test_dataframe_categorical_train_predict():
    df, y = _make_df()
    ds = gpb.Dataset(df, label=y)
    # column names become feature names; category column auto-detected
    assert ds.feature_name == ["x0", "x1", "kind"]
    assert ds.categorical_feature == [2]
    assert ds.pandas_categorical == [["a", "b", "c"]]
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "learning_rate": 0.5, "min_data_in_leaf": 5,
                     "verbose": -1}, ds, num_boost_round=20)
    pred_df = bst.predict(df)
    # identical data as a plain codes array must predict identically
    arr = df.copy()
    arr["kind"] = df["kind"].cat.codes.astype(float)
    pred_np = bst.predict(arr.to_numpy())
    np.testing.assert_allclose(pred_df, pred_np, rtol=1e-12)
    # the categorical split must have been useful
    resid = y - pred_df
    assert float(np.mean(resid ** 2)) < 0.2 * float(np.var(y))


def test_dataframe_predict_reordered_levels():
    """A prediction frame whose Categorical declares the levels in another
    order must map through the TRAINING levels (pandas_categorical)."""
    df, y = _make_df()
    ds = gpb.Dataset(df, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1, "min_data_in_leaf": 5}, ds,
                    num_boost_round=10)
    base = bst.predict(df)
    df2 = df.copy()
    df2["kind"] = pd.Categorical(np.asarray(df["kind"]),
                                 categories=["c", "a", "b"])
    np.testing.assert_allclose(bst.predict(df2), base, rtol=1e-12)


def test_dataframe_bad_dtype_raises():
    df = pd.DataFrame({"x": [1.0, 2.0], "s": ["u", "v"]})
    with pytest.raises(ValueError, match="DataFrame.dtypes"):
        gpb.Dataset(df, label=[0.0, 1.0])


def test_dataframe_label_series():
    df, y = _make_df(n=120)
    ds = gpb.Dataset(df, label=pd.Series(y))
    np.testing.assert_allclose(ds.label, y)


def test_sparse_csr_train_predict():
    rng = np.random.default_rng(1)
    n, F = 500, 8
    dense = rng.normal(size=(n, F)) * (rng.uniform(size=(n, F)) < 0.3)
    y = dense[:, 0] + 2.0 * dense[:, 3] + 0.05 * rng.normal(size=n)
    for maker in (sp.csr_matrix, sp.csc_matrix):
        X = maker(dense)
        ds = gpb.Dataset(X, label=y)
        assert ds.num_features == F
        bst = gpb.train({"objective": "regression", "num_leaves": 15,
                         "verbose": -1, "min_data_in_leaf": 5}, ds,
                        num_boost_round=20)
        pred_sp = bst.predict(sp.csr_matrix(dense))
        pred_d = bst.predict(dense)
        np.testing.assert_allclose(pred_sp, pred_d, rtol=1e-12)
        resid = y - pred_d
        assert float(np.mean(resid ** 2)) < 0.3 * float(np.var(y))


def test_dataframe_valid_set_shares_levels():
    df, y = _make_df(n=300, seed=2)
    dfv, yv = _make_df(n=100, seed=3)
    ds = gpb.Dataset(df, label=y)
    dv = gpb.Dataset(dfv, label=yv, reference=ds)
    assert dv.pandas_categorical == ds.pandas_categorical
    res = {}
    gpb.train({"objective": "regression", "num_leaves": 7, "verbose": -1,
               "min_data_in_leaf": 5}, ds, num_boost_round=5,
              valid_sets=[dv], valid_names=["v"],
              callbacks=[gpb.record_evaluation(res)])
    assert "v" in res


def test_model_roundtrip_keeps_pandas_categorical():
    df, y = _make_df(n=200, seed=4)
    ds = gpb.Dataset(df, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": -1, "min_data_in_leaf": 5}, ds,
                    num_boost_round=10)
    base = bst.predict(df)
    bst2 = gpb.Booster(model_str=bst.model_to_string())
    np.testing.assert_allclose(bst2.predict(df), base, rtol=1e-12)


def test_sklearn_dataframe():
    from gpboost_tpu.sklearn import GPBoostRegressor
    df, y = _make_df(n=300, seed=5)
    est = GPBoostRegressor(n_estimators=15, num_leaves=7,
                           min_data_in_leaf=5, verbose=-1)
    est.fit(df, y)
    p = est.predict(df)
    assert p.shape == (300,)
