"""Prediction early stopping (pred_early_stop / _freq / _margin).

Reference: ``src/LightGBM/boosting/prediction_early_stop.cpp`` (binary margin
2|score|, multiclass margin top1-top2, checked every round_period
iterations), config keys at ``config.h:778-788``. The mechanism is verified
by emulating it from per-iteration raw scores and requiring exact agreement.
"""
import numpy as np

import gpboost_tpu as gpb


def _emulate(bst, X, n_iter, num_models, kind, freq, margin):
    """Reference early-stop semantics from per-iteration raw predictions."""
    n = X.shape[0]
    base = np.broadcast_to(np.asarray(bst.init_score)[:, None],
                           (num_models, n)).copy()
    raws = [base] + [
        np.asarray(bst.predict(X, raw_score=True, num_iteration=i)
                   ).reshape(num_models, n)
        for i in range(1, n_iter + 1)]
    smat = base.copy()
    active = np.ones(n, dtype=bool)
    for i in range(1, n_iter + 1):
        delta = raws[i] - raws[i - 1]
        smat[:, active] += delta[:, active]
        if i % freq == 0:
            if kind == "binary":
                m = 2.0 * np.abs(smat[0])
            else:
                top2 = np.sort(smat, axis=0)[-2:]
                m = top2[1] - top2[0]
            active &= m <= margin
    return smat


def test_binary_early_stop_matches_reference_semantics():
    rng = np.random.default_rng(9)
    X = rng.standard_normal((400, 5))
    y = (X[:, 0] + 0.2 * rng.standard_normal(400) > 0).astype(float)
    bst = gpb.train({"objective": "binary", "verbose": -1},
                    gpb.Dataset(X, label=y), num_boost_round=60)
    full = bst.predict(X, raw_score=True)
    bst.params.update(pred_early_stop=True, pred_early_stop_freq=5,
                      pred_early_stop_margin=1.0)
    es = bst.predict(X, raw_score=True)
    assert not np.allclose(full, es)  # confident rows stopped early
    bst.params["pred_early_stop"] = False
    expected = _emulate(bst, X, 60, 1, "binary", 5, 1.0)[0]
    np.testing.assert_allclose(es, expected, rtol=1e-12)
    # huge margin -> identical to the full prediction
    bst.params.update(pred_early_stop=True, pred_early_stop_margin=1e300)
    np.testing.assert_allclose(bst.predict(X, raw_score=True), full)


def test_multiclass_early_stop_matches_reference_semantics():
    rng = np.random.default_rng(11)
    X = rng.standard_normal((300, 4))
    y = np.clip((X[:, 0] > 0).astype(int) + (X[:, 1] > 0.5), 0, 2)
    bst = gpb.train({"objective": "multiclass", "num_class": 3,
                     "verbose": -1}, gpb.Dataset(X, label=y),
                    num_boost_round=40)
    full = np.asarray(bst.predict(X, raw_score=True)).reshape(3, -1)
    bst.params.update(pred_early_stop=True, pred_early_stop_freq=5,
                      pred_early_stop_margin=0.5)
    es = np.asarray(bst.predict(X, raw_score=True)).reshape(3, -1)
    assert not np.allclose(full, es)
    bst.params["pred_early_stop"] = False
    expected = _emulate(bst, X, 40, 3, "multiclass", 5, 0.5)
    np.testing.assert_allclose(es, expected, rtol=1e-12)
