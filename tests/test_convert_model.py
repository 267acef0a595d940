"""convert_model: generated C source must reproduce booster.predict.

Capability parity with the reference's if-else converter
(``Tree::ToIfElse`` io/tree.cpp:527, CLI ``task=convert_model``
config.h:240-244); we compile the emitted C with the system compiler and
compare against the in-framework prediction path.
"""
import ctypes
import json
import subprocess
import sys

import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.boosting.convert import booster_to_c


def _compile_and_load(src: str, tmp_path, tag: str):
    cfile = tmp_path / f"model_{tag}.c"
    sofile = tmp_path / f"model_{tag}.so"
    cfile.write_text(src)
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", str(sofile),
                    str(cfile), "-lm"], check=True)
    lib = ctypes.CDLL(str(sofile))
    for fn in (lib.predict_raw, lib.predict):
        fn.argtypes = [ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double)]
        fn.restype = None
    return lib


def _c_predict(lib, X, num_outputs, raw=False):
    out = np.zeros((X.shape[0], num_outputs))
    row = (ctypes.c_double * X.shape[1])()
    res = (ctypes.c_double * num_outputs)()
    fn = lib.predict_raw if raw else lib.predict
    for i in range(X.shape[0]):
        row[:] = [float(v) for v in X[i]]
        fn(row, res)
        out[i] = list(res)
    return out


@pytest.fixture(scope="module")
def reg_data():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 6))
    y = X[:, 0] * 2 + np.sin(X[:, 1] * 3) + 0.1 * rng.standard_normal(300)
    return X, y


def test_convert_regression(reg_data, tmp_path):
    X, y = reg_data
    bst = gpb.train({"objective": "regression", "verbose": -1},
                    gpb.Dataset(X, label=y), num_boost_round=8)
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "reg")
    got = _c_predict(lib, X[:50], 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(X[:50]), rtol=1e-10)


def test_convert_handles_nan(reg_data, tmp_path):
    X, y = reg_data
    bst = gpb.train({"objective": "regression", "verbose": -1},
                    gpb.Dataset(X, label=y), num_boost_round=5)
    Xm = X[:20].copy()
    Xm[::2, 0] = np.nan
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "nan")
    got = _c_predict(lib, Xm, 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(Xm), rtol=1e-10)


def test_convert_binary_sigmoid(reg_data, tmp_path):
    X, y = reg_data
    yb = (y > np.median(y)).astype(float)
    bst = gpb.train({"objective": "binary", "verbose": -1},
                    gpb.Dataset(X, label=yb), num_boost_round=8)
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "bin")
    got = _c_predict(lib, X[:50], 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(X[:50]), rtol=1e-10)
    raw = _c_predict(lib, X[:50], 1, raw=True)[:, 0]
    np.testing.assert_allclose(raw, bst.predict(X[:50], raw_score=True),
                               rtol=1e-10)


def test_convert_multiclass(tmp_path):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((300, 4))
    y = (X[:, 0] + 0.3 * rng.standard_normal(300) > 0).astype(int) \
        + (X[:, 1] > 0.8).astype(int)
    bst = gpb.train({"objective": "multiclass", "num_class": 3,
                     "verbose": -1}, gpb.Dataset(X, label=y),
                    num_boost_round=6)
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "mc")
    got = _c_predict(lib, X[:40], 3)
    ref = np.asarray(bst.predict(X[:40])).reshape(3, 40).T
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_convert_categorical(tmp_path):
    rng = np.random.default_rng(6)
    n = 400
    cat = rng.integers(0, 6, size=n).astype(float)
    x1 = rng.standard_normal(n)
    X = np.column_stack([cat, x1])
    y = np.where(np.isin(cat, [1, 4]), 2.0, -1.0) + 0.5 * x1 \
        + 0.05 * rng.standard_normal(n)
    bst = gpb.train({"objective": "regression", "verbose": -1,
                     "min_data_in_leaf": 5},
                    gpb.Dataset(X, label=y, categorical_feature=[0]),
                    num_boost_round=8)
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "cat")
    got = _c_predict(lib, X[:60], 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(X[:60]), rtol=1e-10)


def test_convert_linear_tree(reg_data, tmp_path):
    X, y = reg_data
    bst = gpb.train({"objective": "regression", "verbose": -1,
                     "linear_tree": True},
                    gpb.Dataset(X, label=y), num_boost_round=5)
    lib = _compile_and_load(booster_to_c(bst), tmp_path, "lin")
    got = _c_predict(lib, X[:50], 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(X[:50]), rtol=1e-9)


def test_convert_model_cli(reg_data, tmp_path):
    X, y = reg_data
    bst = gpb.train({"objective": "regression", "verbose": -1},
                    gpb.Dataset(X, label=y), num_boost_round=4)
    model_file = tmp_path / "m.json"
    bst.save_model(str(model_file))
    out_c = tmp_path / "model.c"
    from gpboost_tpu.cli import main
    rc = main([f"task=convert_model", f"input_model={model_file}",
               f"convert_model={out_c}"])
    assert rc == 0
    lib = _compile_and_load(out_c.read_text(), tmp_path, "cli")
    got = _c_predict(lib, X[:30], 1)[:, 0]
    np.testing.assert_allclose(got, bst.predict(X[:30]), rtol=1e-10)
