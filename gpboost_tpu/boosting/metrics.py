"""Evaluation metrics (reference ``src/LightGBM/metric/*``)."""
from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def l2(y, pred, weight=None):
    d = (y - pred) ** 2
    return float(np.average(d, weights=weight))


def rmse(y, pred, weight=None):
    return float(np.sqrt(l2(y, pred, weight)))


def l1(y, pred, weight=None):
    return float(np.average(np.abs(y - pred), weights=weight))


def mape(y, pred, weight=None):
    denom = np.maximum(np.abs(y), 1.0)
    return float(np.average(np.abs(y - pred) / denom, weights=weight))


def quantile(y, pred, weight=None, alpha=0.9):
    r = y - pred
    v = np.where(r >= 0, alpha * r, (alpha - 1.0) * r)
    return float(np.average(v, weights=weight))


def huber(y, pred, weight=None, alpha=0.9):
    r = np.abs(y - pred)
    v = np.where(r <= alpha, 0.5 * r * r, alpha * (r - 0.5 * alpha))
    return float(np.average(v, weights=weight))


def poisson_deviance(y, pred, weight=None):
    eps = 1e-10
    pred = np.maximum(pred, eps)
    v = pred - y * np.log(pred)
    return float(np.average(v, weights=weight))


def gamma_deviance(y, pred, weight=None):
    eps = 1e-10
    pred = np.maximum(pred, eps)
    v = np.log(pred) + y / pred
    return float(np.average(v, weights=weight))


def tweedie_metric(y, pred, weight=None, rho=1.5):
    eps = 1e-10
    pred = np.maximum(pred, eps)
    v = -y * np.power(pred, 1 - rho) / (1 - rho) + np.power(pred, 2 - rho) / (2 - rho)
    return float(np.average(v, weights=weight))


def binary_logloss(y, prob, weight=None):
    p = np.clip(prob, 1e-15, 1 - 1e-15)
    v = -(y * np.log(p) + (1 - y) * np.log(1 - p))
    return float(np.average(v, weights=weight))


def binary_error(y, prob, weight=None):
    return float(np.average((prob > 0.5) != (y > 0.5), weights=weight))


def _weighted_auc(d, w, pos):
    """Weighted AUC of discriminant ``d`` (positives should score high) with
    0.5 credit for cross-class ties."""
    order = np.argsort(d, kind="mergesort")
    dp, wp, pp = d[order], w[order], pos[order]
    cum_neg = np.cumsum(np.where(~pp, wp, 0.0))
    auc_num = 0.0
    k = 0
    while k < len(dp):
        k2 = k
        while k2 < len(dp) and dp[k2] == dp[k]:
            k2 += 1
        neg_before = cum_neg[k - 1] if k > 0 else 0.0
        neg_tied = cum_neg[k2 - 1] - neg_before
        w_pos_tied = np.sum(np.where(pp[k:k2], wp[k:k2], 0.0))
        auc_num += w_pos_tied * (neg_before + 0.5 * neg_tied)
        k = k2
    w_pos = np.sum(np.where(pp, wp, 0.0))
    w_neg = np.sum(np.where(~pp, wp, 0.0))
    if w_pos == 0 or w_neg == 0:
        return 0.5
    return float(auc_num / (w_pos * w_neg))


def auc(y, score, weight=None):
    pos = y > 0
    if weight is None:
        # rank-based with average-rank tie handling
        from scipy.stats import rankdata
        n_pos = pos.sum()
        n_neg = (~pos).sum()
        if n_pos == 0 or n_neg == 0:
            return 0.5
        r = rankdata(score)
        return float((np.sum(r[pos]) - n_pos * (n_pos + 1) / 2)
                     / (n_pos * n_neg))
    return _weighted_auc(np.asarray(score), np.asarray(weight), pos)


def multi_logloss(y, prob_flat, weight=None, num_class=2):
    n = len(y)
    p = prob_flat.reshape(num_class, n)
    pc = np.clip(p[y.astype(int), np.arange(n)], 1e-15, 1.0)
    return float(np.average(-np.log(pc), weights=weight))


def multi_error(y, prob_flat, weight=None, num_class=2, top_k=1):
    """Multiclass error; a row counts as correct when the true class is
    within the ``top_k`` highest scores (``multi_error_top_k``,
    config.h:1002, multiclass_metric.hpp)."""
    n = len(y)
    p = prob_flat.reshape(num_class, n)
    yi = y.astype(int)
    if top_k <= 1:
        wrong = p.argmax(axis=0) != yi
    else:
        # rank of the true class among the scores (ties count as within
        # top_k like the reference's ">= threshold" comparison)
        true_p = p[yi, np.arange(n)]
        rank = np.sum(p > true_p[None, :], axis=0)
        wrong = rank >= top_k
    return float(np.average(wrong, weights=weight))


def auc_mu(y, score_flat, weight=None, num_class=2, class_weights=None):
    """Multiclass AUC-mu (Kleiman & Page 2019; reference ``AucMuMetric``,
    multiclass_metric.hpp:183): mean over class pairs (i, j) of the AUC of
    the weighted-score discriminant t1 * (W_i - W_j)' s(x), ties 0.5."""
    n = len(y)
    S = score_flat[:num_class * n].reshape(num_class, n)
    yi = y.astype(int)
    if class_weights is None:
        W = np.ones((num_class, num_class)) - np.eye(num_class)
    else:
        W = np.asarray(class_weights, dtype=np.float64).reshape(num_class,
                                                                num_class)
    w = np.ones(n) if weight is None else np.asarray(weight)
    total = 0.0
    for i in range(num_class):
        for j in range(i + 1, num_class):
            v = W[i] - W[j]
            t1 = v[i] - v[j]
            sel = (yi == i) | (yi == j)
            if not np.any(yi == i) or not np.any(yi == j):
                continue
            d = t1 * (v @ S[:, sel])
            total += _weighted_auc(d, w[sel], yi[sel] == i)
    return float(2.0 * total / num_class / (num_class - 1))


def crps_gaussian(y, mean, var, weight=None):
    """Continuous ranked probability score for Gaussian predictive
    distributions (``random_effects_metric.hpp`` crps_gaussian)."""
    from scipy.stats import norm
    sd = np.sqrt(np.maximum(var, 1e-300))
    z = (y - mean) / sd
    v = sd * (z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z)
              - 1.0 / np.sqrt(np.pi))
    return float(np.average(v, weights=weight))


def ndcg_at_k(y, score, group, k=5):
    """NDCG@k averaged over queries (``dcg_calculator.cpp``)."""
    starts = np.concatenate([[0], np.cumsum(group)]).astype(int)
    vals = []
    for q in range(len(starts) - 1):
        a, b = starts[q], starts[q + 1]
        rel = y[a:b]
        sc = score[a:b]
        order = np.argsort(-sc)
        gains = 2.0 ** rel[order[:k]] - 1.0
        disc = 1.0 / np.log2(np.arange(2, len(gains) + 2))
        dcg = np.sum(gains * disc)
        iorder = np.argsort(-rel)
        igains = 2.0 ** rel[iorder[:k]] - 1.0
        idcg = np.sum(igains * disc[:len(igains)])
        vals.append(dcg / idcg if idcg > 0 else 1.0)
    return float(np.mean(vals))


# GP-model-aware metrics: need the attached GPModel / predictive variances
# and are dispatched specially in ``Booster._eval`` (reference
# ``random_effects_metric.hpp:25,69``; ``regression_metric.hpp:373,499``).
# The first two are training-data-only, the last two validation-only.
GP_METRICS = ("neg_log_likelihood", "approx_neg_marginal_log_likelihood",
              "test_neg_log_likelihood", "crps_gaussian")

# metric registry: name -> (fn(label, converted_pred, weight), higher_better)
METRICS = {
    "l2": (l2, False), "mse": (l2, False),
    "rmse": (rmse, False), "l1": (l1, False), "mae": (l1, False),
    "mape": (mape, False),
    "quantile": (quantile, False), "huber": (huber, False),
    "poisson": (poisson_deviance, False),
    "gamma": (gamma_deviance, False), "gamma_deviance": (gamma_deviance, False),
    "tweedie": (tweedie_metric, False),
    "binary_logloss": (binary_logloss, False),
    "binary_error": (binary_error, False),
    "auc": (auc, True),
    "multi_logloss": (multi_logloss, False),
    "multi_error": (multi_error, False),
}

_DEFAULT_METRIC = {
    "multiclassova": "multi_logloss",
    "regression": "l2", "regression_l1": "l1", "huber": "huber",
    "fair": "l1", "poisson": "poisson", "gamma": "gamma",
    "tweedie": "tweedie", "quantile": "quantile", "mape": "mape",
    "binary": "binary_logloss", "cross_entropy": "binary_logloss",
    "multiclass": "multi_logloss", "regression_gp": "l2",
    "lambdarank": "ndcg", "rank_xendcg": "ndcg",
}


def default_metric_for(objective_name: str) -> str:
    return _DEFAULT_METRIC.get(objective_name, "l2")
