"""Inducing-point selection: kmeans++ / random (``GP_utils.cpp:269-310``).

TPU-first: kmeans++ seeding + Lloyd iterations as batched distance matmuls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def select_inducing_points(coords: np.ndarray, num_ind_points: int,
                           method: str = "kmeans++", seed: int = 0,
                           max_lloyd_iter: int = 20,
                           cover_tree_radius: float = 1.0) -> np.ndarray:
    """Return [k, d] inducing-point locations.

    'random': subsample of unique coords; 'kmeans++': seeded centers refined
    by Lloyd iterations (reference: kmeans++ in ``GP_utils.cpp:269``);
    'cover_tree': greedy radius cover — every data point ends up within
    ``cover_tree_radius`` of a center, so the NUMBER of inducing points is
    determined by the radius (capped at ``num_ind_points``), matching the
    semantics of the reference's multilevel ``CoverTree``
    (``GP_utils.cpp:310-449``; the hierarchical refinement is replaced by a
    single seeded greedy sweep — same covering guarantee, O(n k) distances).
    """
    uniq = np.unique(coords, axis=0)
    k = min(num_ind_points, uniq.shape[0])
    rng = np.random.default_rng(seed)
    if method == "cover_tree":
        order = rng.permutation(uniq.shape[0])
        centers = [uniq[order[0]]]
        r2 = float(cover_tree_radius) ** 2
        for i in order[1:]:
            d2 = np.sum((np.asarray(centers) - uniq[i]) ** 2, axis=1)
            if np.min(d2) > r2:
                centers.append(uniq[i])
                if len(centers) >= num_ind_points:
                    break
        return np.asarray(centers)
    if method == "random" or k == uniq.shape[0]:
        idx = rng.choice(uniq.shape[0], size=k, replace=False)
        return uniq[idx]
    if method != "kmeans++":
        raise ValueError(f"ind_points_selection '{method}' not supported")
    # kmeans++ seeding
    centers = np.empty((k, coords.shape[1]))
    centers[0] = uniq[rng.integers(uniq.shape[0])]
    d2 = np.sum((uniq - centers[0]) ** 2, axis=1)
    for j in range(1, k):
        probs = d2 / max(d2.sum(), 1e-300)
        centers[j] = uniq[rng.choice(uniq.shape[0], p=probs)]
        d2 = np.minimum(d2, np.sum((uniq - centers[j]) ** 2, axis=1))
    # Lloyd refinement on device
    X = jnp.asarray(uniq)
    C = jnp.asarray(centers)

    @jax.jit
    def lloyd(C):
        d2 = (jnp.sum(X * X, 1)[:, None] + jnp.sum(C * C, 1)[None, :]
              - 2.0 * jnp.matmul(X, C.T, precision=jax.lax.Precision.HIGHEST))
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, C.shape[0], dtype=X.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ X
        newC = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], C)
        return newC

    for _ in range(max_lloyd_iter):
        C = lloyd(C)
    return np.asarray(C)
