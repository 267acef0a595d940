"""Batched per-cluster solves for ``cluster_ids`` models.

The reference stores independent realizations (``cluster_ids``) as separate
blocks in per-cluster ``std::map``s and loops them SERIALLY
(``re_model_template.h:5020-5144``). The dense fallback here masks the
[n, n] covariance block-diagonally (``covariance.py``), which wastes
O(n^2) work when there are many clusters.

This module is the TPU-native answer (SURVEY §2.5 item 8): clusters are
padded to a common size and batched into [C, m, m] blocks — one vmapped
Cholesky instead of C serial factorizations — and the leading cluster axis
is the natural mesh-sharding axis (embarrassingly parallel; shard with
``jax.device_put(blocks, NamedSharding(mesh, P('data')))`` and the same
jitted functions run SPMD without modification).

Scope: Gaussian likelihood, single GP component, ``gp_approx='none'`` —
the common "independent spatial replications" case.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = math.log(2.0 * math.pi)


class ClusterBlocks(NamedTuple):
    """Static per-cluster padded layout."""
    idx: jnp.ndarray      # [C, m] int32 row indices into the data (pad -1)
    valid: jnp.ndarray    # [C, m] bool
    coords: jnp.ndarray   # [C, m, dim] padded coordinates
    num_data: int


def prepare_blocks(cluster_codes: np.ndarray, coords: np.ndarray,
                   dtype=jnp.float64) -> ClusterBlocks:
    codes = np.asarray(cluster_codes)
    order = np.argsort(codes, kind="stable")
    uniq, counts = np.unique(codes, return_counts=True)
    C = len(uniq)
    m = int(counts.max())
    idx = np.full((C, m), -1, dtype=np.int32)
    start = 0
    for ci, cnt in enumerate(counts):
        idx[ci, :cnt] = order[start:start + cnt]
        start += cnt
    valid = idx >= 0
    coords_pad = np.zeros((C, m, coords.shape[1]))
    coords_pad[valid] = np.asarray(coords)[idx[valid]]
    # spread padded coordinates far apart so their covariance is ~0 (they are
    # masked anyway; this just keeps the blocks well-conditioned)
    return ClusterBlocks(jnp.asarray(idx), jnp.asarray(valid),
                         jnp.asarray(coords_pad, dtype=dtype),
                         num_data=len(codes))


def _gather_blocks(blocks: ClusterBlocks, v: jnp.ndarray) -> jnp.ndarray:
    """[n] -> [C, m] with zeros at padding."""
    safe = jnp.maximum(blocks.idx, 0)
    return jnp.where(blocks.valid, v[safe], 0.0)


@partial(jax.jit, static_argnums=(0,))
def _psi_blocks(cov_fn, gp_pars, noise_over, blocks: ClusterBlocks):
    """[C, m, m] per-cluster Psi with identity rows/cols at padding.

    ``noise_over`` is the diagonal noise (sigma2, or 1 for the tilde form).
    """
    c = blocks.coords
    diffs = c[:, :, None, :] - c[:, None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diffs * diffs, -1), 0.0))
    cov = cov_fn.cov_matrix(gp_pars, dist=d)
    m = c.shape[1]
    eye = jnp.eye(m, dtype=c.dtype)
    psi = cov + noise_over * eye[None]
    pair_valid = blocks.valid[:, :, None] & blocks.valid[:, None, :]
    return jnp.where(pair_valid, psi, eye[None])


def block_quad_logdet(cov_fn, cov_pars, coords_pad, valid, rb):
    """(sum alpha'alpha, sum logdet) over a batch of padded cluster blocks.

    Shared by the single-device batched path (:func:`nll_gaussian`) and the
    mesh-sharded path (``parallel/mesh.py`` ``sharded_cluster_nll_fn``): the
    leading cluster axis is embarrassingly parallel, so both reduce the same
    per-block quantities.
    """
    diffs = coords_pad[:, :, None, :] - coords_pad[:, None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diffs * diffs, -1), 0.0))
    cov = cov_fn.cov_matrix(cov_pars[1:], dist=d)
    m = coords_pad.shape[1]
    eye = jnp.eye(m, dtype=coords_pad.dtype)
    psi = cov + cov_pars[0] * eye[None]
    pair_valid = valid[:, :, None] & valid[:, None, :]
    psi = jnp.where(pair_valid, psi, eye[None])
    chol = jnp.linalg.cholesky(psi)
    alpha = jax.scipy.linalg.solve_triangular(chol, rb[..., None],
                                              lower=True)[..., 0]
    # padded rows have identity diagonal -> log contribution 0 and alpha 0
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)))
    quad = jnp.sum(alpha * alpha)
    return quad, logdet


@partial(jax.jit, static_argnums=(0,))
def nll_gaussian(cov_fn, cov_pars, blocks: ClusterBlocks, r: jnp.ndarray):
    """Exact Gaussian NLL via batched per-cluster Cholesky.

    cov_pars = [nugget, gp pars...]; r = centered residual [n].
    """
    rb = _gather_blocks(blocks, r)
    quad, logdet = block_quad_logdet(cov_fn, cov_pars, blocks.coords,
                                     blocks.valid, rb)
    return 0.5 * (quad + logdet + blocks.num_data * LOG_2PI)


@partial(jax.jit, static_argnums=(0,))
def nll_profiled(cov_fn, ratio_pars, blocks: ClusterBlocks, r: jnp.ndarray):
    """Profiled-nugget NLL (sigma2_hat = r'Psi_t^-1 r / n) batched.

    ratio_pars = gp pars with variance relative to the nugget.
    """
    psi_t = _psi_blocks(cov_fn, ratio_pars, 1.0, blocks)
    rb = _gather_blocks(blocks, r)
    chol = jnp.linalg.cholesky(psi_t)
    alpha = jax.scipy.linalg.solve_triangular(chol, rb[..., None],
                                              lower=True)[..., 0]
    n = blocks.num_data
    yt = jnp.sum(alpha * alpha)
    sigma2_hat = yt / n
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)))
    nll = 0.5 * n * (jnp.log(sigma2_hat) + LOG_2PI + 1.0) + 0.5 * logdet
    return nll, sigma2_hat


@partial(jax.jit, static_argnums=(0,))
def psi_inv_blocks_mul(cov_fn, cov_pars, blocks: ClusterBlocks,
                       V: jnp.ndarray) -> jnp.ndarray:
    """Psi^-1 V for [n] or [n, q] V via batched block solves."""
    psi = _psi_blocks(cov_fn, cov_pars[1:], cov_pars[0], blocks)
    chol = jnp.linalg.cholesky(psi)
    single = V.ndim == 1
    if single:
        V = V[:, None]
    safe = jnp.maximum(blocks.idx, 0)
    Vb = jnp.where(blocks.valid[..., None], V[safe], 0.0)   # [C, m, q]
    sol = jax.scipy.linalg.cho_solve((chol, True), Vb)
    out = jnp.zeros_like(V)
    out = out.at[safe.reshape(-1)].add(
        jnp.where(blocks.valid[..., None], sol, 0.0).reshape(-1, V.shape[1]))
    return out[:, 0] if single else out


def wls_coefficients(cov_fn, cov_pars, blocks: ClusterBlocks,
                     y: jnp.ndarray, X: jnp.ndarray,
                     fixed_effects=None) -> jnp.ndarray:
    yv = y if fixed_effects is None else y - fixed_effects
    pi_X = psi_inv_blocks_mul(cov_fn, cov_pars, blocks, X)
    pi_y = psi_inv_blocks_mul(cov_fn, cov_pars, blocks, yv)
    return jnp.linalg.solve(X.T @ pi_X, X.T @ pi_y)


@partial(jax.jit, static_argnums=(0,))
def nll_profiled_value_and_grad(cov_fn, log_ratio_pars,
                                blocks: ClusterBlocks, r: jnp.ndarray):
    def f(th):
        return nll_profiled(cov_fn, jnp.exp(th), blocks, r)

    (v, s2), g = jax.value_and_grad(f, has_aux=True)(log_ratio_pars)
    return v, g, s2
