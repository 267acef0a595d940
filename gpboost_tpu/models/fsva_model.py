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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction, euclidean_distance
from gpboost_tpu.ops.inducing import select_inducing_points

LOG_2PI = math.log(2.0 * math.pi)
JITTER = 1e-8


# ---------------------------------------------------------------------------
# Matrix-free FSVA latent covariance: Sigma = U S^-1 U' + Lambda with
# Lambda^-1 = B' D^-1 B (Vecchia residual). Sigma^-1 via Woodbury is
# O(n m + n k) per matvec — the TPU-native replacement for the reference's
# CGVIF machinery (``CG_utils.h:208-282``, arXiv:2405.14492).
# ---------------------------------------------------------------------------


def _lam_inv_fn(a, neighbors, d):
    def lam_inv(x):
        if x.ndim == 1:
            return vops.precision_matvec(a, neighbors, d, x)
        return jax.vmap(lambda col: vops.precision_matvec(a, neighbors, d,
                                                          col),
                        in_axes=1, out_axes=1)(x)
    return lam_inv


def _sigma_inv_pieces(a, d, neighbors, u, l_mm):
    """(sigma_inv_mv, li_u, l_M): Sigma^-1 x = Lambda^-1 x - (Lambda^-1 U)
    M^-1 U' Lambda^-1 x with M = S + U' Lambda^-1 U (all differentiable)."""
    lam_inv = _lam_inv_fn(a, neighbors, d)
    li_u = lam_inv(u)                                     # [n, k]
    M = (jnp.matmul(l_mm, l_mm.T, precision=jax.lax.Precision.HIGHEST)
         + jnp.matmul(u.T, li_u, precision=jax.lax.Precision.HIGHEST))
    l_M = jnp.linalg.cholesky(M)

    def sigma_inv_mv(x):
        t = lam_inv(x)
        sol = jax.scipy.linalg.cho_solve((l_M, True), u.T @ t)
        return t - li_u @ sol

    return sigma_inv_mv, li_u, l_M


def _sigma_inv_diag(a, d, neighbors, li_u, l_M):
    """diag(Sigma^-1) = diag(Lambda^-1) - rowsum((Lambda^-1 U) L_M^-T)^2."""
    from gpboost_tpu.models.vecchia_model import _precision_diag
    X = jax.scipy.linalg.solve_triangular(l_M, li_u.T, lower=True)  # [k, n]
    return _precision_diag(a, neighbors, d) - jnp.sum(X * X, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _find_mode_cg_fsva(lik_name, a, d, neighbors, u, l_mm, y, F, aux):
    """Matrix-free FSVA posterior mode: Newton-CG on
    Sigma^-1 b = d1(y, F+b); implicit differentiation w.r.t.
    (a, d, u, l_mm, F, aux) via one adjoint CG solve."""
    return _find_mode_cg_fsva_impl(lik_name, a, d, neighbors, u, l_mm, y, F,
                                   aux)


def _find_mode_cg_fsva_impl(lik_name, a, d, neighbors, u, l_mm, y, F, aux):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    n = y.shape[0]
    sigma_inv_mv, li_u, l_M = _sigma_inv_pieces(a, d, neighbors, u, l_mm)
    diag_si = _sigma_inv_diag(a, d, neighbors, li_u, l_M)

    def obj(b):
        return jnp.sum(fam.log_lik(y, F + b, aux)) - 0.5 * jnp.dot(
            b, sigma_inv_mv(b))

    def newton(state):
        b, psi, it, conv = state
        loc = F + b
        d1 = fam.d_loc(y, loc, aux)
        w = jnp.maximum(-fam.d2_loc(y, loc, aux), 1e-10)
        g = d1 - sigma_inv_mv(b)
        pre_d = jnp.maximum(diag_si + w, 1e-10)

        def amv(V):  # [n, q]
            return sigma_inv_mv(V) + w[:, None] * V

        delta, _ = cgops.pcg(amv, g, lambda r: r / pre_d[:, None],
                             tol=1e-6, max_iter=1000)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, obj(b + 0.5 * t * delta), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < 60)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, obj(b + delta), 0))
        b_new = b + t * delta
        conv = jnp.abs(psi_new - psi) < 1e-9 * (jnp.abs(psi) + 1e-10)
        return b_new, psi_new, it + 1, conv

    def cond(state):
        _, _, it, conv = state
        return jnp.logical_and(it < 100, jnp.logical_not(conv))

    b0 = jnp.zeros(n, d.dtype)
    b, _, _, _ = jax.lax.while_loop(cond, newton, (b0, obj(b0), 0, False))
    return b


def _find_mode_cg_fsva_fwd(lik_name, a, d, neighbors, u, l_mm, y, F, aux):
    b = _find_mode_cg_fsva_impl(lik_name, a, d, neighbors, u, l_mm, y, F,
                                aux)
    return b, (a, d, neighbors, u, l_mm, y, F, aux, b)


def _find_mode_cg_fsva_bwd(lik_name, res, v):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    a, d, neighbors, u, l_mm, y, F, aux, b = res
    loc = F + b
    w = -fam.d2_loc(y, loc, aux)
    sigma_inv_mv, li_u, l_M = _sigma_inv_pieces(a, d, neighbors, u, l_mm)
    pre_d = jnp.maximum(_sigma_inv_diag(a, d, neighbors, li_u, l_M) + w,
                        1e-10)

    def amv(V):
        return sigma_inv_mv(V) + w[:, None] * V

    lam, _ = cgops.pcg(amv, v, lambda r: r / pre_d[:, None],
                       tol=1e-8, max_iter=1000)

    def g(a_, d_, u_, l_mm_, F_, aux_):
        lam_inv_ = _lam_inv_fn(a_, neighbors, d_)
        t = lam_inv_(b)
        li_u_ = lam_inv_(u_)
        M_ = (jnp.matmul(l_mm_, l_mm_.T,
                         precision=jax.lax.Precision.HIGHEST)
              + jnp.matmul(u_.T, li_u_,
                           precision=jax.lax.Precision.HIGHEST))
        sib = t - li_u_ @ jnp.linalg.solve(M_, u_.T @ t)
        return sib - fam.d_loc(y, F_ + b, aux_)

    _, vjp = jax.vjp(g, a, d, u, l_mm, F, aux)
    ga, gd, gu, glmm, gF, gaux = vjp(-lam)
    return ga, gd, None, gu, glmm, jnp.zeros_like(y), gF, gaux


_find_mode_cg_fsva.defvjp(_find_mode_cg_fsva_fwd, _find_mode_cg_fsva_bwd)


class FSVAGP:
    """State holder for a full-scale-Vecchia-approximated GP."""

    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 num_neighbors: int = 30, num_ind_points: int = 200,
                 ind_points_selection: str = "kmeans++",
                 ordering: str = "none", seed: int = 0,
                 cover_tree_radius: float = 1.0,
                 likelihood: str = "gaussian",
                 neighbor_selection: str = "nearest",
                 dtype=jnp.float64):
        n = coords.shape[0]
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = likelihood
        self.num_neighbors = min(num_neighbors, n - 1)
        # reference default: 2 * num_neighbors (re_model_template.h:299)
        self.num_neighbors_pred = 2 * self.num_neighbors
        self.neighbor_selection = neighbor_selection
        self.perm = vops.apply_ordering(n, ordering, seed)
        self.inv_perm = np.argsort(self.perm)
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.coords_perm = jnp.asarray(coords[self.perm], dtype=dtype)
        self.ind_points = jnp.asarray(
            select_inducing_points(coords, num_ind_points,
                                   ind_points_selection, seed,
                                   cover_tree_radius=cover_tree_radius),
            dtype=dtype)
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

    def nll_laplace_iterative(self, cov_pars, y, aux_pars, fixed_part=None,
                              num_rand_vec_trace: int = 50,
                              lanczos_steps: int = 50,
                              cg_tol: float = 1e-3, cg_max_iter: int = 1000,
                              seed_rand_vec_trace: int = 1,
                              preconditioner: str = "",
                              piv_chol_rank: int = 50):
        """Laplace NLL with matrix-free Newton-CG + preconditioned Lanczos
        stochastic logdet — the TPU answer to the reference's CGVIF iterative
        path for the full-scale Vecchia approximation
        (``CG_utils.h:208-282`` CGVIFLaplace*, arXiv:2405.14492): Sigma^-1
        matvecs are O(n m + n k) via Woodbury over the Vecchia-residual
        precision, no dense [n, n] matrices anywhere.

        logdet(Sigma) is EXACT (= sum log D + logdet M - logdet S); only
        logdet(Sigma^-1 + W) is stochastic, with Hutchinson-surrogate
        gradients and a Jacobi preconditioner on diag(Sigma^-1) + W.
        """
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.ops import cg as cgops
        # FSVA regime names (reference default 'fitc', alternative 'vifdu',
        # basic.py:5421-5447): the logdet split below already handles the
        # inducing-point low-rank block EXACTLY (the k x k correction term),
        # which is precisely the work the reference's fitc preconditioner
        # approximates — so both names map to this scheme; anything else
        # raises rather than being silently ignored
        pn = str(preconditioner or "").lower()
        if pn not in ("", "default", "fitc", "vifdu",
                      "predictive_process_plus_diagonal"):
            raise ValueError(
                f"unsupported cg_preconditioner_type {preconditioner!r} for "
                "full_scale_vecchia; options: fitc (default) or vifdu "
                "(both served by the exact low-rank logdet split + Jacobi "
                "residual preconditioner)")
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        nb = self.neighbors
        u, l_mm, v = self._lr_cols(cov_pars)
        a, d = vops.build_factors_residual(
            self.cov_fn, cov_pars, self.coords_perm, nb, v, None, False)
        b = _find_mode_cg_fsva(self.likelihood, a, d, nb, u, l_mm, yp, Fp,
                               aux)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux)
        loglik = jnp.sum(fam.log_lik(yp, loc, aux))
        sigma_inv_mv, li_u, l_M = _sigma_inv_pieces(a, d, nb, u, l_mm)
        quad = jnp.dot(b, sigma_inv_mv(b))

        # Split logdet (matching the reference's Woodbury logdet assembly,
        # ``re_model_template.h:2698-2712``): with Q = Lambda^-1,
        #   logdet(Sigma^-1 + W) = logdet(Q + W)
        #       + logdet(I_k - M^-1 U'Q (Q+W)^-1 Q U)
        # The k x k term is EXACT given one batched CG solve; only the pure
        # Vecchia-residual part logdet(Q + W) is stochastic — strictly lower
        # variance than estimating the full low-rank-shifted operator.
        from gpboost_tpu.models.vecchia_model import _precision_diag

        def qw_mv(V):
            if V.ndim == 1:
                return vops.precision_matvec(a, nb, d, V) + w * V
            return (jax.vmap(lambda col: vops.precision_matvec(a, nb, d,
                                                               col),
                             in_axes=1, out_axes=1)(V) + w[:, None] * V)

        pre = cgops.JacobiPreconditioner(
            jax.lax.stop_gradient(jnp.maximum(
                _precision_diag(a, nb, d) + w, 1e-10)))

        def qw_of(th, V):
            a_, d_, w_ = th
            qv = jax.vmap(lambda col: vops.precision_matvec(a_, nb, d_, col),
                          in_axes=1, out_axes=1)(V)
            return qv + w_[:, None] * V

        X = cgops.pcg_implicit(qw_of, (a, d, w), li_u, pre.d,
                               min(cg_tol, 1e-6), cg_max_iter)
        k = u.shape[1]
        M = jnp.matmul(l_mm, l_mm.T, precision=jax.lax.Precision.HIGHEST) \
            + jnp.matmul(u.T, li_u, precision=jax.lax.Precision.HIGHEST)
        K2 = jnp.eye(k, dtype=self.dtype) - jnp.linalg.solve(
            M, jnp.matmul(li_u.T, X, precision=jax.lax.Precision.HIGHEST))
        _, logdet_k = jnp.linalg.slogdet(K2)
        key = jax.random.PRNGKey(seed_rand_vec_trace)
        k1, k2 = jax.random.split(key)
        Z = pre.sample_probes(k1, num_rand_vec_trace)
        Zg = cgops.rademacher_probes(k2, self.n, num_rand_vec_trace,
                                     self.dtype)
        logdet_qw = cgops.stochastic_logdet_grad(
            qw_mv, None, Z, lanczos_steps, pre.solve, pre.logdet(),
            cg_tol, cg_max_iter, probes_grad=Zg)
        logdet_A = logdet_qw + logdet_k
        # logdet(Sigma) = sum log D + logdet(M) - logdet(S)  (exact)
        logdet_sigma = (jnp.sum(jnp.log(d))
                        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_M)))
                        - 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_mm))))
        return -(loglik - 0.5 * quad - 0.5 * (logdet_A + logdet_sigma))

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

    supports_sim_pred_var = True

    def predict_gaussian(self, cov_pars, y, coords_pred,
                         fixed_part=None, predict_response=True,
                         predict_var=False, nsim_var_pred=None):
        """Predictions with exact cross-covariance K_po and the approximate
        Psi^-1 (the ``order_obs_first_cond_all``-type variant: the residual
        cross-covariance is kept exact, so K_po = U_p S^-1 U' + resid_po)."""
        r = y if fixed_part is None else y - fixed_part
        rp = r[self.perm]
        pi_r = self.psi_inv_mul(cov_pars, rp)
        gp_pars = cov_pars[1:]
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        # stochastic predictive variances (re_model_template.h:10839 role):
        # Bekas diag estimator through psi_inv_mul, chunked cross rows
        use_sim = predict_var and (
            nsim_var_pred is not None or n_p * self.n > 50_000_000)
        if use_sim:
            from gpboost_tpu.models.predvar import sim_pred_mean_var

            def cross_of(cpc):
                d_c = euclidean_distance(cpc, self.coords_perm)
                return self.cov_fn.cov_matrix(gp_pars, dist=d_c)

            mean, quad = sim_pred_mean_var(
                cross_of, cp, lambda W: self.psi_inv_mul(cov_pars, W), pi_r,
                int(nsim_var_pred or 1000),
                seed=getattr(self, "seed_rand_vec_trace", 1))
            var = gp_pars[0] - quad
            if predict_response:
                var = var + cov_pars[0]
            return mean, jnp.maximum(var, 0.0)
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
