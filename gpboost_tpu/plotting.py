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


def partial_dependence_plot_2d(booster, data, features, num_points=20,
                               ax=None, **predict_kwargs):
    """2-D partial dependence of the ensemble on a feature pair
    (reference ``gpb.plot.part.dep.interact``,
    R-package/R/gpb.plot.partial.dependence.R): filled-contour of the mean
    prediction over the two features' value grid."""
    plt = _get_plt()
    data = np.asarray(data, dtype=np.float64)

    def fidx(feature):
        return (feature if isinstance(feature, int)
                else booster.train_set.feature_name.index(feature))

    f1, f2 = fidx(features[0]), fidx(features[1])
    g1 = np.linspace(np.nanmin(data[:, f1]), np.nanmax(data[:, f1]),
                     num_points)
    g2 = np.linspace(np.nanmin(data[:, f2]), np.nanmax(data[:, f2]),
                     num_points)
    Z = np.zeros((num_points, num_points))
    for i, a in enumerate(g1):
        for j, b in enumerate(g2):
            d = data.copy()
            d[:, f1] = a
            d[:, f2] = b
            p = booster.predict(d, **predict_kwargs)
            if isinstance(p, dict):
                p = p["fixed_effect"]
            Z[j, i] = float(np.mean(p))
    if ax is None:
        _, ax = plt.subplots()
    cs = ax.contourf(g1, g2, Z)
    plt.colorbar(cs, ax=ax)
    ax.set_xlabel(f"feature {features[0]}")
    ax.set_ylabel(f"feature {features[1]}")
    return ax


def _tree_dot_source(tree, tree_index, feature_names, precision=3):
    """Graphviz DOT source for one tree (reference ``_to_graphviz``,
    ``plotting.py:468``). Dependency-free: the DOT text is built directly."""
    lines = [f'digraph Tree{tree_index} {{',
             'graph [rankdir=TB];',
             'node [shape=box, style="filled, rounded", '
             'fillcolor="#e8f4fa", fontname="helvetica"];',
             'edge [fontname="helvetica"];']
    M = len(tree.is_leaf)
    reachable = {0}
    stack = [0]
    while stack:
        node = stack.pop()
        if not tree.is_leaf[node]:
            for ch in (int(tree.left[node]), int(tree.right[node])):
                if ch not in reachable:
                    reachable.add(ch)
                    stack.append(ch)
    for node in sorted(reachable):
        if tree.is_leaf[node]:
            val = round(float(tree.leaf_value[node]), precision)
            cnt = (int(tree.node_count[node])
                   if tree.node_count is not None else None)
            label = f"leaf: {val}"
            if cnt is not None:
                label += f"\\ncount: {cnt}"
            lines.append(f'n{node} [label="{label}", '
                         'fillcolor="#d5ecd0"];')
        else:
            f = int(tree.split_feature[node])
            fname = (feature_names[f] if feature_names
                     and f < len(feature_names) else f"Column_{f}")
            if tree.is_categorical is not None and tree.is_categorical[node]:
                cond = f"{fname} in left set"
            else:
                thr = round(float(tree.threshold[node]), precision)
                cond = f"{fname} <= {thr}"
            gain = (round(float(tree.split_gain[node]), precision)
                    if tree.split_gain is not None else None)
            label = cond if gain is None else f"{cond}\\ngain: {gain}"
            lines.append(f'n{node} [label="{label}"];')
            yes_lbl = "yes"
            if tree.default_left is not None and tree.default_left[node]:
                yes_lbl = "yes / NA"
            no_lbl = ("no" if tree.default_left is None
                      or tree.default_left[node] else "no / NA")
            lines.append(f'n{node} -> n{int(tree.left[node])} '
                         f'[label="{yes_lbl}"];')
            lines.append(f'n{node} -> n{int(tree.right[node])} '
                         f'[label="{no_lbl}"];')
    lines.append('}')
    return "\n".join(lines)


class TreeDigraph:
    """Minimal graphviz.Digraph stand-in holding DOT ``source``; renders via
    the ``graphviz`` python package when installed."""

    def __init__(self, source: str):
        self.source = source

    def render(self, filename=None, **kwargs):
        import graphviz
        return graphviz.Source(self.source).render(filename=filename,
                                                   **kwargs)

    def _repr_image_svg_xml(self):  # jupyter display hook
        import graphviz
        return graphviz.Source(self.source)._repr_image_svg_xml()


def create_tree_digraph(booster, tree_index=0, show_info=None, precision=3,
                        **kwargs):
    """DOT digraph of one tree (``create_tree_digraph``, reference
    ``plotting.py:468``). Returns a ``graphviz.Digraph`` when the graphviz
    package is available, else a :class:`TreeDigraph` exposing ``.source``."""
    tree = booster.trees[tree_index]
    names = (booster.train_set.feature_name
             if booster.train_set is not None else None)
    src = _tree_dot_source(tree, tree_index, names, precision)
    try:
        import graphviz
        g = graphviz.Source(src)
        return g
    except ImportError:
        return TreeDigraph(src)


def plot_tree(booster, tree_index=0, ax=None, figsize=(12, 6), precision=3,
              **kwargs):
    """Matplotlib rendering of one tree (``plot_tree``, reference
    ``plotting.py:247``). Drawn natively (recursive layout) — no graphviz
    binary required."""
    plt = _get_plt()
    tree = booster.trees[tree_index]
    names = (booster.train_set.feature_name
             if booster.train_set is not None else None)
    if ax is None:
        _, ax = plt.subplots(figsize=figsize)

    # leaf x-positions by in-order traversal; internal nodes centered
    pos = {}
    next_x = [0.0]

    def layout(node, depth):
        if tree.is_leaf[node]:
            pos[node] = (next_x[0], -depth)
            next_x[0] += 1.0
        else:
            layout(int(tree.left[node]), depth + 1)
            layout(int(tree.right[node]), depth + 1)
            xl = pos[int(tree.left[node])][0]
            xr = pos[int(tree.right[node])][0]
            pos[node] = (0.5 * (xl + xr), -depth)

    layout(0, 0)

    def draw(node):
        x, y = pos[node]
        if tree.is_leaf[node]:
            txt = f"{round(float(tree.leaf_value[node]), precision)}"
            box = dict(boxstyle="round", fc="#d5ecd0", ec="#4a7a42")
        else:
            f = int(tree.split_feature[node])
            fname = (names[f] if names and f < len(names)
                     else f"Column_{f}")
            if tree.is_categorical is not None and tree.is_categorical[node]:
                txt = f"{fname} in set"
            else:
                txt = f"{fname} <= {round(float(tree.threshold[node]), precision)}"
            box = dict(boxstyle="round", fc="#e8f4fa", ec="#33709c")
            for ch, lbl in ((int(tree.left[node]), "yes"),
                            (int(tree.right[node]), "no")):
                cx, cy = pos[ch]
                ax.plot([x, cx], [y, cy], "-", color="#888888", zorder=1)
                ax.annotate(lbl, ((x + cx) / 2, (y + cy) / 2), fontsize=7,
                            color="#555555")
                draw(ch)
        ax.annotate(txt, (x, y), ha="center", va="center", fontsize=8,
                    bbox=box, zorder=2)

    draw(0)
    ax.axis("off")
    return ax
