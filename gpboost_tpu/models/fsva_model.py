"""Full-scale Vecchia (VIF) approximation: inducing points + Vecchia residual.

TPU-native implementation of the reference's ``gp_approx="full_scale_vecchia"``
(Vecchia-inducing-points full-scale approximation; ``re_model_template.h:4647``
``CreateREComponents*``, logdet assembly at ``re_model_template.h:2698-2712``,
Gyger/Furrer/Sigrist arXiv:2405.14492):

    Psi = U S^-1 U' + Lambda,
    U = K_nm (cross-covariance to m inducing points), S = K_mm,
    Lambda = Vecchia-approx of (K - U S^-1 U' + nugget I), Lambda^-1 = B'D^-1 B.

All solves use the Woodbury identity; Lambda^-1 products are matrix-free
O(n m_nb) scatter/gather ops, the inducing-point block is one [m, m] Cholesky
on the MXU — no sparse triangular solves anywhere.

Neighbor selection: Euclidean (default) or residual correlation
(``full_scale_vecchia_correlation_based``, ``vecchia_neighbor_selection =
"residual_correlation"``, ``Vecchia_utils.cpp:1254``); correlation-based
neighbors are (re)determined lazily from the current covariance parameters at
power-of-2 optimizer iterations (``re_model_template.h:4630-4656``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction, euclidean_distance
from gpboost_tpu.ops.inducing import select_inducing_points

LOG_2PI = math.log(2.0 * math.pi)
JITTER = 1e-8


class FSVAGP:
    """State holder for a full-scale-Vecchia-approximated GP."""

    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 num_neighbors: int = 30, num_ind_points: int = 200,
                 ind_points_selection: str = "kmeans++",
                 ordering: str = "none", seed: int = 0,
                 likelihood: str = "gaussian",
                 neighbor_selection: str = "nearest",
                 dtype=jnp.float64):
        n = coords.shape[0]
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = likelihood
        self.num_neighbors = min(num_neighbors, n - 1)
        self.num_neighbors_pred = self.num_neighbors
        self.neighbor_selection = neighbor_selection
        self.perm = vops.apply_ordering(n, ordering, seed)
        self.inv_perm = np.argsort(self.perm)
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.coords_perm = jnp.asarray(coords[self.perm], dtype=dtype)
        self.ind_points = jnp.asarray(
            select_inducing_points(coords, num_ind_points,
                                   ind_points_selection, seed), dtype=dtype)
        self.dtype = dtype
        self._corr_neighbors_pars = None  # cov pars of last redetermination
        if neighbor_selection == "nearest":
            self.neighbors = vops.find_neighbors(self.coords_perm,
                                                 self.num_neighbors)
        else:
            self.neighbors = None  # determined lazily from cov_pars
        # neighbors are a traced argument (not a baked-in constant) so
        # correlation-based redetermination does not stale the jit cache
        self._vg_gaussian_jit = jax.jit(
            lambda th, y, fp, nb: jax.value_and_grad(
                lambda t: self.nll_gaussian(jnp.exp(t), y, fp, nb))(th))

    def _vg_gaussian(self, th, y, fp):
        return self._vg_gaussian_jit(th, y, fp, self.neighbors)

    # ---- structure ----------------------------------------------------
    def _lr_cols(self, gp_pars):
        """chol_ip_cross_cov: L_mm^-1 K_m,n over the permuted points. [k, n]"""
        d_mm = euclidean_distance(self.ind_points, self.ind_points)
        c_mm = self.cov_fn.cov_matrix(gp_pars, dist=d_mm)
        k = self.ind_points.shape[0]
        c_mm = c_mm + JITTER * gp_pars[0] * jnp.eye(k, dtype=self.dtype)
        l_mm = jnp.linalg.cholesky(c_mm)
        d_nm = euclidean_distance(self.coords_perm, self.ind_points)
        u = self.cov_fn.cov_matrix(gp_pars, dist=d_nm)        # [n, k]
        v = jax.scipy.linalg.solve_triangular(l_mm, u.T, lower=True)
        return u, l_mm, v

    def ensure_neighbors(self, cov_pars_full: np.ndarray):
        """(Re)determine residual-correlation neighbors for the current
        parameters (``RedetermineNearestNeighborsVecchiaInducingPointsFITC``).
        No-op for Euclidean selection."""
        if self.neighbor_selection == "nearest":
            return
        pars = np.asarray(cov_pars_full, dtype=np.float64)
        if (self._corr_neighbors_pars is not None
                and np.allclose(pars, self._corr_neighbors_pars)):
            return
        gp_pars = jnp.asarray(pars[1:], self.dtype)
        _, _, v = self._lr_cols(gp_pars)
        self.neighbors = self._find_neighbors_residual_corr(gp_pars, v)
        self._corr_neighbors_pars = pars

    def _find_neighbors_residual_corr(self, gp_pars, v, chunk: int = 512):
        """Previous points with the largest |residual correlation|
        (``find_nearest_neighbors_Vecchia_FSA_fast``, Vecchia_utils.cpp:311)."""
        n = self.n
        m = self.num_neighbors
        r_diag = gp_pars[0] - jnp.sum(v * v, axis=0)          # [n]
        r_diag = jnp.maximum(r_diag, 1e-12)
        coords = self.coords_perm
        n_pad = ((n + chunk - 1) // chunk) * chunk
        coords_pad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
        v_pad = jnp.pad(v, ((0, 0), (0, n_pad - n)))

        @jax.jit
        def one_chunk(start):
            rows = jax.lax.dynamic_slice(
                coords_pad, (start, 0), (chunk, coords.shape[1]))
            v_rows = jax.lax.dynamic_slice(
                v_pad, (0, start), (v.shape[0], chunk))
            d = jnp.sqrt(jnp.maximum(
                jnp.sum(rows * rows, 1)[:, None]
                + jnp.sum(coords_pad * coords_pad, 1)[None, :]
                - 2.0 * jnp.matmul(rows, coords_pad.T,
                                   precision=jax.lax.Precision.HIGHEST), 0.0))
            k_rows = self.cov_fn.cov_matrix(gp_pars, dist=d[:, None, :])[:, 0, :]
            r_rows = k_rows - jnp.matmul(v_rows.T, v_pad,
                                         precision=jax.lax.Precision.HIGHEST)
            rd_rows = gp_pars[0] - jnp.sum(v_rows * v_rows, axis=0)
            corr2 = (r_rows * r_rows) / (
                jnp.maximum(rd_rows, 1e-12)[:, None]
                * jnp.pad(r_diag, (0, n_pad - n), constant_values=1.0)[None, :])
            row_ids = start + jnp.arange(chunk)[:, None]
            col_ids = jnp.arange(n_pad)[None, :]
            corr2 = jnp.where(col_ids < jnp.minimum(row_ids, n), corr2, -jnp.inf)
            val, idx = jax.lax.top_k(corr2, m)
            idx = jnp.where(jnp.isfinite(val), idx, -1)
            return idx.astype(jnp.int32)

        chunks = [one_chunk(jnp.asarray(s)) for s in range(0, n_pad, chunk)]
        return jnp.concatenate(chunks, axis=0)[:n]

    def _factors(self, cov_pars_full, neighbors=None):
        """(U, L_mm, A, D) for cov_pars_full = [nugget, gp pars...]."""
        if neighbors is None:
            neighbors = self.neighbors
        gp_pars = cov_pars_full[1:]
        u, l_mm, v = self._lr_cols(gp_pars)
        a, d = vops.build_factors_residual(
            self.cov_fn, gp_pars, self.coords_perm, neighbors, v,
            cov_pars_full[0], True)
        return u, l_mm, a, d

    # ---- Gaussian likelihood ------------------------------------------
    def nll_gaussian(self, cov_pars: jnp.ndarray, y: jnp.ndarray,
                     fixed_part: Optional[jnp.ndarray] = None,
                     neighbors=None) -> jnp.ndarray:
        """Woodbury NLL: logdet(Psi) = logdet(Lambda) + logdet(M) - logdet(S),
        M = S + U' Lambda^-1 U (``re_model_template.h:2698-2712``)."""
        nb = self.neighbors if neighbors is None else neighbors
        r = y if fixed_part is None else y - fixed_part
        r = r[self.perm]
        u, l_mm, a, d = self._factors(cov_pars, nb)

        def lam_inv(x):
            if x.ndim == 1:
                return vops.precision_matvec(a, nb, d, x)
            return jax.vmap(lambda col: vops.precision_matvec(a, nb, d, col),
                            in_axes=1, out_axes=1)(x)

        li_r = lam_inv(r)
        li_u = lam_inv(u)                                    # [n, k]
        ut_li_u = jnp.matmul(u.T, li_u,
                             precision=jax.lax.Precision.HIGHEST)
        M = jnp.matmul(l_mm, l_mm.T,
                       precision=jax.lax.Precision.HIGHEST) + ut_li_u
        l_M = jnp.linalg.cholesky(M)
        w = u.T @ li_r                                       # [k]
        t = jax.scipy.linalg.solve_triangular(l_M, w, lower=True)
        quad = jnp.dot(r, li_r) - jnp.dot(t, t)
        logdet = (jnp.sum(jnp.log(d))
                  + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_M)))
                  - 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_mm))))
        return 0.5 * (quad + logdet + self.n * LOG_2PI)

    def psi_inv_mul(self, cov_pars, R):
        """Psi^-1 R (R [n] or [n, q], permuted order) via Woodbury."""
        u, l_mm, a, d = self._factors(cov_pars)
        nb = self.neighbors

        def lam_inv(x):
            if x.ndim == 1:
                return vops.precision_matvec(a, nb, d, x)
            return jax.vmap(lambda col: vops.precision_matvec(a, nb, d, col),
                            in_axes=1, out_axes=1)(x)

        li_R = lam_inv(R)
        li_u = lam_inv(u)
        M = jnp.matmul(l_mm, l_mm.T,
                       precision=jax.lax.Precision.HIGHEST) + u.T @ li_u
        l_M = jnp.linalg.cholesky(M)
        inner = u.T @ li_R
        sol = jax.scipy.linalg.cho_solve((l_M, True), inner)
        return li_R - lam_inv(u @ sol)

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        """GLS coefficients (X' Psi^-1 X)^-1 X' Psi^-1 y, all matrix-free."""
        yv = y if fixed_effects is None else y - fixed_effects
        yp = yv[self.perm]
        Xp = X[self.perm]
        pi_X = self.psi_inv_mul(cov_pars, Xp)
        A = Xp.T @ pi_X
        b = pi_X.T @ yp
        return jnp.linalg.solve(A, b)

    # ---- non-Gaussian (Laplace with the FSVA latent covariance) -------
    def _latent_sigma_dense(self, gp_pars, neighbors=None):
        """Dense latent Sigma = U S^-1 U' + Lambda_0 (exact small-n path;
        ``FindModePostRandEffCalcMLLFSVA``, likelihoods.h:2765 role).
        Lambda_0 = B^-1 D B^-T is the nugget-free Vecchia residual; B is
        unit lower triangular in the permuted order."""
        nb = self.neighbors if neighbors is None else neighbors
        u, l_mm, v = self._lr_cols(gp_pars)
        a, d = vops.build_factors_residual(
            self.cov_fn, gp_pars, self.coords_perm, nb, v, None, False)
        n = self.n
        Bmat = (jnp.eye(n, dtype=self.dtype)
                - jnp.zeros((n, n), self.dtype)
                .at[jnp.arange(n)[:, None], jnp.maximum(nb, 0)]
                .add(jnp.where(nb >= 0, a, 0.0)))
        Binv = jax.scipy.linalg.solve_triangular(
            Bmat, jnp.eye(n, dtype=self.dtype), lower=True)
        lam = Binv @ (d[:, None] * Binv.T)
        return jnp.matmul(v.T, v, precision=jax.lax.Precision.HIGHEST) + lam

    def nll_laplace(self, cov_pars, y, aux_pars, fixed_part=None,
                    neighbors=None):
        """Laplace-approximate NLL; cov_pars = [var, range, ...] (no
        nugget for non-Gaussian likelihoods)."""
        from gpboost_tpu.models.laplace import _laplace_nll_from_sigma
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        sigma = self._latent_sigma_dense(cov_pars, neighbors)
        return _laplace_nll_from_sigma(self.likelihood, sigma, yp, Fp, aux)

    def predict_laplace(self, cov_pars, y, aux_pars, coords_pred,
                        fixed_part=None, fixed_part_pred=None,
                        predict_response=True, predict_var=False):
        """Laplace prediction with exact cross-covariance K_po (matching
        the Gaussian FSVA prediction path)."""
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import find_mode, _response_moments
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        sigma = self._latent_sigma_dense(cov_pars)
        b = find_mode(self.likelihood, sigma, yp, Fp, aux)
        loc = Fp + b
        d1 = fam.d_loc(yp, loc, aux)
        w = -fam.d2_loc(yp, loc, aux)
        cp = jnp.asarray(coords_pred, self.dtype)
        d_po = euclidean_distance(cp, self.coords_perm)
        cross = self.cov_fn.cov_matrix(cov_pars, dist=d_po)
        mean = cross @ d1
        if fixed_part_pred is not None:
            mean = mean + fixed_part_pred
        var = None
        if predict_var or predict_response:
            M = jnp.eye(self.n, dtype=self.dtype) + sigma * w[None, :]
            z = jnp.linalg.solve(M, cross.T)
            prior = cov_pars[0] * jnp.ones(cp.shape[0], self.dtype)
            var = jnp.maximum(prior - jnp.einsum(
                'pn,np->p', cross, w[:, None] * z), 1e-12)
        if predict_response:
            mr, vr = _response_moments(self.likelihood, mean, var, aux)
            return mr, (vr if predict_var else None)
        return mean, (var if predict_var else None)

    def grad_F_laplace(self, cov_pars, y, aux_pars, fixed_part):
        """d NLL / dF for LaGaBoost with FSVA (autodiff)."""
        def f(fe):
            return self.nll_laplace(cov_pars, y, aux_pars, fe)
        return jax.grad(f)(fixed_part)

    def predict_gaussian(self, cov_pars, y, coords_pred,
                         fixed_part=None, predict_response=True,
                         predict_var=False):
        """Predictions with exact cross-covariance K_po and the approximate
        Psi^-1 (the ``order_obs_first_cond_all``-type variant: the residual
        cross-covariance is kept exact, so K_po = U_p S^-1 U' + resid_po)."""
        r = y if fixed_part is None else y - fixed_part
        rp = r[self.perm]
        pi_r = self.psi_inv_mul(cov_pars, rp)
        gp_pars = cov_pars[1:]
        cp = jnp.asarray(coords_pred, self.dtype)
        d_po = euclidean_distance(cp, self.coords_perm)
        k_po = self.cov_fn.cov_matrix(gp_pars, dist=d_po)
        mean = k_po @ pi_r
        var = None
        if predict_var:
            pi_k = self.psi_inv_mul(cov_pars, k_po.T)
            var = gp_pars[0] - jnp.einsum('pn,np->p', k_po, pi_k)
            if predict_response:
                var = var + cov_pars[0]
            var = jnp.maximum(var, 0.0)
        return mean, var
