"""Plotting utilities (reference ``python-package/gpboost/plotting.py``).

matplotlib-based importance/metric plots and partial-dependence helpers;
matplotlib is imported lazily so headless/core-only installs don't need it.
"""
from __future__ import annotations

import numpy as np


def _get_plt():
    try:
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("plotting requires matplotlib") from e


def plot_importance(booster, ax=None, max_num_features=None,
                    importance_type="split", title="Feature importance",
                    xlabel="Feature importance", ylabel="Features", **kwargs):
    """Bar plot of feature importances (``plotting.py:25``)."""
    plt = _get_plt()
    imp = booster.feature_importance(importance_type)
    names = (booster.train_set.feature_name if booster.train_set is not None
             else [f"Column_{i}" for i in range(len(imp))])
    order = np.argsort(imp)
    if max_num_features:
        order = order[-max_num_features:]
    if ax is None:
        _, ax = plt.subplots()
    ax.barh(range(len(order)), imp[order])
    ax.set_yticks(range(len(order)))
    ax.set_yticklabels([names[i] for i in order])
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    return ax


def plot_metric(eval_result, metric=None, dataset_names=None, ax=None,
                title="Metric during training", xlabel="Iterations",
                ylabel="auto", **kwargs):
    """Plot recorded eval curves (``plotting.py:247``)."""
    plt = _get_plt()
    if ax is None:
        _, ax = plt.subplots()
    for name, metrics in eval_result.items():
        if dataset_names and name not in dataset_names:
            continue
        for mname, curve in metrics.items():
            if metric and mname != metric:
                continue
            ax.plot(range(1, len(curve) + 1), curve, label=f"{name} {mname}")
    ax.legend()
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    return ax


def partial_dependence_plot(booster, data, feature, num_points=50,
                            ax=None, **predict_kwargs):
    """1-D partial dependence of the ensemble on one feature."""
    plt = _get_plt()
    data = np.asarray(data, dtype=np.float64)
    f = feature if isinstance(feature, int) else \
        booster.train_set.feature_name.index(feature)
    grid = np.linspace(np.nanmin(data[:, f]), np.nanmax(data[:, f]),
                       num_points)
    vals = []
    for g in grid:
        d = data.copy()
        d[:, f] = g
        p = booster.predict(d, **predict_kwargs)
        if isinstance(p, dict):
            p = p["fixed_effect"]
        vals.append(float(np.mean(p)))
    if ax is None:
        _, ax = plt.subplots()
    ax.plot(grid, vals)
    ax.set_xlabel(f"feature {feature}")
    ax.set_ylabel("partial dependence")
    return ax
