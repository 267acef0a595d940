"""FITC / predictive-process and full-scale-tapering approximations.

TPU-native equivalent of the reference's FITC/FSA machinery
(``CreateREComponentsFITC_FSA`` ``re_model_template.h:6919``,
``CalcCovFactorFITC_FSA`` :8770, ``CalcPredFITC_FSA`` :10600):

- FITC (Gaussian): Psi = Q + Lambda,  Q = C_nm C_mm^-1 C_mn,
  Lambda = diag(sigma1^2 - diag(Q)) + sigma2 I. All solves go through the
  Woodbury identity with one dense [k, k] Cholesky on the MXU.
- full_scale_tapering: Psi = Q + T o (Sigma - Q) with a compact-support
  Wendland taper T (dense path; the blocked-sparse large-n path is the
  iterative upgrade).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gpboost_tpu.ops.cov_fns import (CovFunction, euclidean_distance,
                                     wendland_correlation)

LOG_2PI = math.log(2.0 * math.pi)

JITTER = 1e-8


@partial(jax.jit, static_argnums=(0,))
def fitc_parts(cov_fn: CovFunction, cov_pars: jnp.ndarray,
               coords: jnp.ndarray, ind_points: jnp.ndarray,
               nugget: jnp.ndarray):
    """Common FITC pieces: (C_nm, L_mm (chol of C_mm), lambda_diag).

    cov_pars = GP parameters [sigma1^2, range, ...]; nugget = error variance.
    """
    # cov_between dispatches distances (isotropic) vs raw coordinates
    # (ARD / space-time / estimate-shape anisotropic scaling)
    c_nm = cov_fn.cov_between(cov_pars, coords, ind_points)
    c_mm = cov_fn.cov_between(cov_pars, ind_points, ind_points)
    k = ind_points.shape[0]
    c_mm = c_mm + JITTER * cov_pars[0] * jnp.eye(k, dtype=coords.dtype)
    l_mm = jnp.linalg.cholesky(c_mm)
    # diag(Q) = rowsum(solve(L, C_mn)^2)
    v = jax.scipy.linalg.solve_triangular(l_mm, c_nm.T, lower=True)  # [k, n]
    q_diag = jnp.sum(v * v, axis=0)
    lam = cov_pars[0] - q_diag + nugget
    return c_nm, l_mm, lam, v


def fitc_nll(cov_fn: CovFunction, cov_pars_full: jnp.ndarray,
             coords: jnp.ndarray, ind_points: jnp.ndarray,
             r: jnp.ndarray, row_w=None, num_data=None) -> jnp.ndarray:
    """Gaussian FITC NLL via Woodbury.

    cov_pars_full = [nugget, sigma1^2, range, ...].
    logdet(Psi) = logdet(M) - logdet(C_mm) + sum log lambda,
    M = C_mm + C_mn Lambda^-1 C_nm.

    ``row_w`` (0/1) + ``num_data``: mesh-sharded padded layout — padding
    rows' cross-covariances are zeroed and their lambda set to 1, so they
    drop out of every reduction exactly.
    """
    nugget = cov_pars_full[0]
    c_nm, l_mm, lam, v = fitc_parts(cov_fn, cov_pars_full[1:], coords,
                                    ind_points, nugget)
    if row_w is not None:
        c_nm = c_nm * row_w[:, None]
        lam = jnp.where(row_w > 0, lam, 1.0)
        r = r * row_w
    n = num_data if num_data is not None else r.shape[0]
    k = ind_points.shape[0]
    cl = c_nm / lam[:, None]                     # Lambda^-1 C_nm
    M = (jnp.matmul(l_mm, l_mm.T, precision=jax.lax.Precision.HIGHEST)
         + jnp.matmul(c_nm.T, cl, precision=jax.lax.Precision.HIGHEST))
    l_M = jnp.linalg.cholesky(M)
    # quadratic form r' Psi^-1 r = r'Lam^-1 r - ||L_M^-1 C_mn Lam^-1 r||^2
    rl = r / lam
    t = jax.scipy.linalg.solve_triangular(l_M, c_nm.T @ rl, lower=True)
    quad = jnp.dot(r, rl) - jnp.dot(t, t)
    logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(l_M)))
              - 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_mm)))
              + jnp.sum(jnp.log(lam)))
    return 0.5 * (quad + logdet + n * LOG_2PI)


def fitc_psi_inv_mul(cov_fn, cov_pars_full, coords, ind_points, R):
    """Psi^-1 R for FITC via Woodbury (R can be a matrix [n, q])."""
    nugget = cov_pars_full[0]
    c_nm, l_mm, lam, v = fitc_parts(cov_fn, cov_pars_full[1:], coords,
                                    ind_points, nugget)
    M = (jnp.matmul(l_mm, l_mm.T, precision=jax.lax.Precision.HIGHEST)
         + jnp.matmul(c_nm.T, c_nm / lam[:, None],
                      precision=jax.lax.Precision.HIGHEST))
    l_M = jnp.linalg.cholesky(M)
    Rl = R / lam[:, None] if R.ndim == 2 else R / lam
    inner = c_nm.T @ Rl
    sol = jax.scipy.linalg.cho_solve((l_M, True), inner)
    corr = c_nm @ sol
    corr = corr / lam[:, None] if R.ndim == 2 else corr / lam
    return Rl - corr


def fitc_predict(cov_fn: CovFunction, cov_pars_full: jnp.ndarray,
                 coords: jnp.ndarray, ind_points: jnp.ndarray,
                 coords_pred: jnp.ndarray, r: jnp.ndarray,
                 predict_response: bool, predict_var: bool,
                 predict_cov: bool = False):
    """FITC prediction: cross-covariance Q_pn = C_pm C_mm^-1 C_mn
    (``CalcPredFITC_FSA``, re_model_template.h:10600).

    mean = Q_pn Psi^-1 r;  cov = (Q_pp + diag corr) - Q_pn Psi^-1 Q_np.
    """
    nugget = cov_pars_full[0]
    cov_pars = cov_pars_full[1:]
    psi_inv_r = fitc_psi_inv_mul(cov_fn, cov_pars_full, coords, ind_points, r)
    c_pm = cov_fn.cov_between(cov_pars, coords_pred, ind_points)
    c_nm = cov_fn.cov_between(cov_pars, coords, ind_points)
    c_mm = cov_fn.cov_between(cov_pars, ind_points,
                              ind_points) + JITTER * cov_pars[0] * jnp.eye(
        ind_points.shape[0], dtype=coords.dtype)
    l_mm = jnp.linalg.cholesky(c_mm)
    # Q_pn = C_pm C_mm^-1 C_mn
    sol = jax.scipy.linalg.cho_solve((l_mm, True), c_nm.T)  # [k, n]
    q_pn = c_pm @ sol
    mean = q_pn @ psi_inv_r
    var = None
    cov = None
    if predict_var or predict_cov:
        # prior at pred points: Q_pp with FITC diag correction = sigma1^2 diag
        vp = jax.scipy.linalg.solve_triangular(l_mm, c_pm.T, lower=True)
        q_pp_diag = jnp.sum(vp * vp, axis=0)
        prior_diag = cov_pars[0] * jnp.ones(coords_pred.shape[0], coords.dtype)
        psi_inv_qnp = fitc_psi_inv_mul(cov_fn, cov_pars_full, coords,
                                       ind_points, q_pn.T)
        if predict_cov:
            q_pp = jnp.matmul(vp.T, vp, precision=jax.lax.Precision.HIGHEST)
            prior = q_pp + jnp.diag(prior_diag - q_pp_diag)
            cov = prior - q_pn @ psi_inv_qnp
            if predict_response:
                cov = cov + nugget * jnp.eye(cov.shape[0], dtype=cov.dtype)
            var = jnp.diagonal(cov)
        else:
            var = prior_diag - jnp.einsum('pn,np->p', q_pn, psi_inv_qnp)
            if predict_response:
                var = var + nugget
    return mean, var, cov


# ---------------------------------------------------------------------------
# full-scale tapering (dense path)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def fsa_psi(cov_fn: CovFunction, taper_range: float, taper_shape: float,
            taper_mu: float, cov_pars_full: jnp.ndarray, coords: jnp.ndarray,
            ind_points: jnp.ndarray) -> jnp.ndarray:
    """Full-scale approximation covariance (dense):
    Psi = Q + T o (Sigma - Q) + nugget I (``CalcCovFactorFITC_FSA``)."""
    nugget = cov_pars_full[0]
    cov_pars = cov_pars_full[1:]
    n = coords.shape[0]
    d_nn = euclidean_distance(coords, coords)
    # exact zero self-distance: the matmul distance trick leaves ~1e-8
    # noise on the diagonal, which the taper slope amplifies and whose
    # rounding is compile-context dependent (mesh vs single-device parity)
    eye_n = jnp.eye(n, dtype=bool)
    d_nn = jnp.where(eye_n, 0.0, d_nn)
    sigma = (cov_fn.cov_matrix(cov_pars, dist=d_nn) if cov_fn.is_isotropic
             else cov_fn.cov_matrix(cov_pars, coords1=coords,
                                    coords2=coords))
    c_nm = cov_fn.cov_between(cov_pars, coords, ind_points)
    c_mm = cov_fn.cov_between(cov_pars, ind_points,
                              ind_points) + JITTER * cov_pars[0] * jnp.eye(
        ind_points.shape[0], dtype=coords.dtype)
    sol = jnp.linalg.solve(c_mm, c_nm.T)
    Q = c_nm @ sol
    T = wendland_correlation(d_nn, taper_range, taper_shape, taper_mu)
    return Q + T * (sigma - Q) + nugget * jnp.eye(n, dtype=coords.dtype)


def fsa_psi_rows(cov_fn: CovFunction, taper_range: float, taper_shape: float,
                 taper_mu: float, cov_pars_full: jnp.ndarray,
                 row_coords: jnp.ndarray, coords: jnp.ndarray,
                 ind_points: jnp.ndarray, row_w: jnp.ndarray) -> jnp.ndarray:
    """Row-panel FSA covariance for the mesh-sharded layout: the O(n^2)
    assembly (distances, covariance transcendentals, taper product, Q panel)
    partitions over ROW-sharded ``row_coords`` while ``coords`` stays the
    replicated padded gather table; ``row_w`` weights padding rows out
    (pad block -> identity), so the result equals the padded dense
    ``fsa_psi`` exactly. The [n', n'] output is what the (gathering)
    Cholesky consumes."""
    nugget = cov_pars_full[0]
    cov_pars = cov_pars_full[1:]
    n = row_coords.shape[0]
    d_rn = euclidean_distance(row_coords, coords)
    # the row panel is index-aligned with the padded table, so its diagonal
    # IS the self-distance — zero it exactly (see fsa_psi)
    eye_n = jnp.eye(n, dtype=bool)
    d_rn = jnp.where(eye_n, 0.0, d_rn)
    sigma = (cov_fn.cov_matrix(cov_pars, dist=d_rn) if cov_fn.is_isotropic
             else cov_fn.cov_matrix(cov_pars, coords1=row_coords,
                                    coords2=coords))
    c_rm = cov_fn.cov_between(cov_pars, row_coords, ind_points)
    c_nm = cov_fn.cov_between(cov_pars, coords, ind_points)
    c_mm = cov_fn.cov_between(cov_pars, ind_points,
                              ind_points) + JITTER * cov_pars[0] * jnp.eye(
        ind_points.shape[0], dtype=coords.dtype)
    sol = jnp.linalg.solve(c_mm, c_nm.T)
    Q = c_rm @ sol
    T = wendland_correlation(d_rn, taper_range, taper_shape, taper_mu)
    psi = Q + T * (sigma - Q) + nugget * jnp.eye(n, dtype=coords.dtype)
    return (psi * (row_w[:, None] * row_w[None, :])
            + jnp.diag(1.0 - row_w))


# ---------------------------------------------------------------------------
# taper-sparse full-scale tapering (iterative large-n path)
#
# The tapered residual T o (Sigma - Q) has compact support: row i touches
# only the points within the taper radius. On TPU that irregular sparsity is
# stored Vecchia-style as dense [n, k_t] index/value arrays (k_t = max
# in-radius count, -1 padded) — residual matvecs are gathers, the
# inducing-point part is one [n, k] matmul, and NLL/solves go through CG +
# stochastic Lanczos logdet with the FITC preconditioner
# (reference ``CGFSA``/``CGFSA_MULTI_RHS``/``LogDetStochTridiag``,
# ``CG_utils.h:507-900``).
# ---------------------------------------------------------------------------


def taper_neighbors(coords: jnp.ndarray, taper_range: float,
                    chunk: int = 1024):
    """[n, k_t] int32 indices of the OTHER points within the taper support
    of each point (d < taper_range, excluding self), -1 padded. k_t is the
    max in-radius count — a static property of (coords, taper_range)."""
    import numpy as np
    n = coords.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    cp = jnp.pad(coords, ((0, n_pad - n), (0, 0)),
                 constant_values=jnp.inf)
    sq = jnp.sum(coords * coords, axis=1)

    @jax.jit
    def count_chunk(start):
        rows = jax.lax.dynamic_slice(cp, (start, 0), (chunk, cp.shape[1]))
        d2 = (jnp.sum(rows * rows, axis=1)[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(rows, coords.T,
                                 precision=jax.lax.Precision.HIGHEST))
        row_ids = start + jnp.arange(chunk)[:, None]
        col_ids = jnp.arange(n)[None, :]
        ok = (d2 < taper_range * taper_range) & (row_ids != col_ids)
        return jnp.sum(ok, axis=1)

    counts = jnp.concatenate([count_chunk(jnp.asarray(s))
                              for s in range(0, n_pad, chunk)])[:n]
    k_t = max(int(jnp.max(counts)), 1)

    @partial(jax.jit, static_argnums=(1,))
    def idx_chunk(start, kt):
        rows = jax.lax.dynamic_slice(cp, (start, 0), (chunk, cp.shape[1]))
        d2 = (jnp.sum(rows * rows, axis=1)[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(rows, coords.T,
                                 precision=jax.lax.Precision.HIGHEST))
        row_ids = start + jnp.arange(chunk)[:, None]
        col_ids = jnp.arange(n)[None, :]
        ok = (d2 < taper_range * taper_range) & (row_ids != col_ids)
        d2 = jnp.where(ok, d2, jnp.inf)
        neg_d, idx = jax.lax.top_k(-d2, kt)
        return jnp.where(jnp.isfinite(neg_d), idx, -1).astype(jnp.int32)

    out = jnp.concatenate([idx_chunk(jnp.asarray(s), k_t)
                           for s in range(0, n_pad, chunk)], axis=0)[:n]
    return np.asarray(out)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 7))
def fsa_taper_values(cov_fn: CovFunction, taper_range: float,
                     taper_shape: float, taper_mu: float,
                     gp_pars: jnp.ndarray, coords: jnp.ndarray,
                     idx: jnp.ndarray, chunk: int, v: jnp.ndarray):
    """Tapered-residual entries for the [n, k_t] taper structure.

    vals[i, j] = T(d_ij) * (k(d_ij) - p_i . p_j) for j = idx[i, :]
    (0 where idx < 0), diag[i] = gp_var - |p_i|^2 (T(0) = 1);
    p_i = v[:, i] = L_mm^-1 K_m,i. The p_i . p_j inner products come from a
    chunked [c, n] matmul + gather (never materializing [n, k_t, k])."""
    n, k_t = idx.shape
    n_pad = ((n + chunk - 1) // chunk) * chunk
    cp = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    idx_pad = jnp.pad(idx, ((0, n_pad - n), (0, 0)), constant_values=-1)
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n)))

    def one_chunk(start):
        rows = jax.lax.dynamic_slice(cp, (start, 0), (chunk, cp.shape[1]))
        ix = jax.lax.dynamic_slice(idx_pad, (start, 0), (chunk, k_t))
        mask = ix >= 0
        ixs = jnp.maximum(ix, 0)
        nb = coords[ixs]                                    # [c, k_t, d]
        d2 = jnp.sum((rows[:, None, :] - nb) ** 2, axis=-1)
        d2 = jnp.maximum(d2, 0.0)
        pos = d2 > 0.0
        dist = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
        k_val = cov_fn.cov_matrix(gp_pars, dist=dist)
        t_val = wendland_correlation(dist, taper_range, taper_shape,
                                     taper_mu)
        v_rows = jax.lax.dynamic_slice(vp, (0, start), (v.shape[0], chunk))
        G = jnp.matmul(v_rows.T, v,
                       precision=jax.lax.Precision.HIGHEST)   # [c, n]
        pq = jnp.take_along_axis(G, ixs, axis=1)              # [c, k_t]
        return jnp.where(mask, t_val * (k_val - pq), 0.0)

    starts = jnp.arange(0, n_pad, chunk)
    _, vals = jax.lax.scan(lambda _, s: (None, one_chunk(s)), None, starts)
    vals = vals.reshape(n_pad, k_t)[:n]
    diag = gp_pars[0] - jnp.sum(v * v, axis=0)
    return vals, diag


@jax.jit
def fsa_resid_mv(vals: jnp.ndarray, diag: jnp.ndarray, idx: jnp.ndarray,
                 x: jnp.ndarray):
    """(T o (Sigma - Q) + diag) x via gathers; x [n] or [n, q]. The taper
    structure is symmetric (d_ij < range is symmetric), so no scatter."""
    ixs = jnp.maximum(idx, 0)
    if x.ndim == 1:
        gathered = jnp.where(idx >= 0, x[ixs], 0.0)
        return diag * x + jnp.sum(vals * gathered, axis=1)
    gathered = jnp.where((idx >= 0)[:, :, None], x[ixs], 0.0)
    return diag[:, None] * x + jnp.einsum('nk,nkq->nq', vals, gathered)
