"""Vecchia-approximated GP model paths (Gaussian response + Vecchia-Laplace).

Dispatch target of ``GPModel`` for ``gp_approx="vecchia"``. Mirrors the
reference's ``CreateREComponentsVecchia`` (``Vecchia_utils.cpp:1060``) +
Gaussian/Laplace Vecchia branches of ``REModelTemplate``.

Cost structure: factor build O(n m^3) batched Cholesky on the MXU, solves
O(n m); gradients by autodiff through the factor build (replacing
``CalcCovFactorGradientVecchiaLaplace`` and friends).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction

LOG_2PI = math.log(2.0 * math.pi)


class VecchiaGP:
    """State holder for a Vecchia-approximated GP component.

    Static structure (ordering permutation + neighbor indices) is computed
    once at construction — like the reference, neighbors stay fixed during
    optimization (redetermination for ARD kernels comes later).
    """

    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 num_neighbors: int = 20, ordering: str = "random",
                 seed: int = 0, likelihood: str = "gaussian",
                 num_neighbors_pred: Optional[int] = None,
                 dtype=jnp.float64):
        n = coords.shape[0]
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = likelihood
        self.num_neighbors = min(num_neighbors, n - 1)
        self.num_neighbors_pred = num_neighbors_pred or self.num_neighbors
        self.perm = vops.apply_ordering(n, ordering, seed)
        self.inv_perm = np.argsort(self.perm)
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.coords_perm = jnp.asarray(coords[self.perm], dtype=dtype)
        self.neighbors = vops.find_neighbors(self.coords_perm,
                                             self.num_neighbors)
        self.dtype = dtype
        # persistent jitted value+grad kernels (reused across fit() calls,
        # e.g. per-boosting-iteration refits)
        self._vg_gaussian = jax.jit(jax.value_and_grad(
            lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))

    # ---- Gaussian response-scale Vecchia ------------------------------
    def nll_gaussian(self, cov_pars: jnp.ndarray, y: jnp.ndarray,
                     fixed_part: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """cov_pars = [nugget, var, range, ...]; Vecchia on Sigma + nugget I."""
        r = y if fixed_part is None else y - fixed_part
        r = r[self.perm]
        a, d = vops.build_factors(self.cov_fn, cov_pars[1:], self.coords_perm,
                                  self.neighbors, cov_pars[0], True)
        return vops.vecchia_nll(a, d, self.neighbors, r)

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        """GLS coefficients with the Vecchia precision: solve
        (X'B'D^-1BX) beta = X'B'D^-1B y — all matrix-free O(n m p)."""
        a, d = vops.build_factors(self.cov_fn, cov_pars[1:], self.coords_perm,
                                  self.neighbors, cov_pars[0], True)
        yv = y if fixed_effects is None else y - fixed_effects
        yp = yv[self.perm]
        Xp = X[self.perm]
        BX = jax.vmap(lambda col: vops.apply_B(a, self.neighbors, col),
                      in_axes=1, out_axes=1)(Xp)
        By = vops.apply_B(a, self.neighbors, yp)
        Xw = BX / d[:, None]
        A = BX.T @ Xw
        b = Xw.T @ By
        return jnp.linalg.solve(A, b)

    def predict_gaussian(self, cov_pars, y, coords_pred,
                         fixed_part=None, predict_response=True,
                         predict_var=False):
        """Local-kriging prediction conditioning on observed neighbors."""
        r = y if fixed_part is None else y - fixed_part
        nb_pred = vops.find_neighbors_cross(
            jnp.asarray(coords_pred, self.dtype), self.coords,
            self.num_neighbors_pred)
        mean, var = vops.predict_vecchia_response(
            self.cov_fn, cov_pars[1:], cov_pars[0], self.coords,
            jnp.asarray(coords_pred, self.dtype), nb_pred, r,
            bool(predict_response))
        return mean, (var if predict_var else None)

    # ---- Vecchia-Laplace (non-Gaussian) -------------------------------
    def _latent_factors(self, cov_pars):
        """Latent-process factors (no nugget): Sigma^-1 ~ B' D^-1 B."""
        return vops.build_factors(self.cov_fn, cov_pars, self.coords_perm,
                                  self.neighbors, None, False)

    def nll_laplace(self, cov_pars: jnp.ndarray, y: jnp.ndarray,
                    aux_pars, fixed_part=None) -> jnp.ndarray:
        """Laplace-approximate NLL with the Vecchia latent precision
        (``FindModePostRandEffCalcMLLVecchia``, likelihoods.h:2765).

        cov_pars = [var, range, ...] (no nugget for non-Gaussian).
        Dense logdet/solve path (exact); the CG + stochastic-trace path is the
        iterative upgrade (matrix_inversion_method='iterative').
        """
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import find_mode_prec
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        Q, d = self._dense_precision(cov_pars)
        b = find_mode_prec(self.likelihood, Q, yp, Fp, aux)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux)
        loglik = jnp.sum(fam.log_lik(yp, loc, aux))
        quad = jnp.dot(b, Q @ b)
        # logdet(Sigma^-1 + W) - logdet(Sigma^-1); logdet(Sigma^-1) = -sum log d
        sign, ld1 = jnp.linalg.slogdet(Q + jnp.diag(w))
        ld0 = -jnp.sum(jnp.log(d))
        return -(loglik - 0.5 * quad - 0.5 * (ld1 - ld0))

    def _dense_precision(self, cov_pars):
        """Dense Sigma^-1 = B' D^-1 B (exact small-n path). Returns (Q, d)."""
        a, d = self._latent_factors(cov_pars)
        n = self.n
        Bmat = (jnp.eye(n, dtype=self.dtype)
                - jnp.zeros((n, n), self.dtype)
                .at[jnp.arange(n)[:, None], jnp.maximum(self.neighbors, 0)]
                .add(jnp.where(self.neighbors >= 0, a, 0.0)))
        Q = Bmat.T @ (Bmat / d[:, None])
        return Q, d

    def predict_laplace(self, cov_pars, y, aux_pars, coords_pred,
                        fixed_part=None, fixed_part_pred=None,
                        predict_response=True, predict_var=False):
        """Vecchia-Laplace prediction: find mode, then local kriging on the
        latent mode values with latent covariance."""
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import _response_moments
        fam = lk.get_family(self.likelihood)
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        b_perm, w_perm, Q = self._find_mode_dense(cov_pars, y, aux, fixed_part)
        # latent mean at pred points: local kriging on the mode
        b_orig = b_perm[self.inv_perm]
        nb_pred = vops.find_neighbors_cross(
            jnp.asarray(coords_pred, self.dtype), self.coords,
            self.num_neighbors_pred)
        mean_lat, var_prior = vops.predict_vecchia_response(
            self.cov_fn, cov_pars, 0.0, self.coords,
            jnp.asarray(coords_pred, self.dtype), nb_pred, b_orig, False)
        if fixed_part_pred is not None:
            mean_lat = mean_lat + fixed_part_pred
        var = None
        if predict_var or predict_response:
            # posterior var ~ prior kriging var + propagate mode uncertainty:
            # full formula Sigma_pp - Sigma_po (Sigma + W^-1)^-1 Sigma_op;
            # dense fallback via the observed-point posterior covariance
            n = self.n
            M = Q + jnp.diag(w_perm)
            # cross-cov pred->obs (permuted order for obs)
            cp = jnp.asarray(coords_pred, self.dtype)
            d_cross = jnp.sqrt(jnp.maximum(
                jnp.sum((cp[:, None, :] - self.coords_perm[None, :, :]) ** 2,
                        -1), 0.0))
            c_po = self.cov_fn.cov_matrix(cov_pars, dist=d_cross)
            # (Sigma + W^-1)^-1 = W (I + Sigma W)^-1 = W M^-1 Q  (M = Q + W)
            # solve M z = Q c_op  -> var = prior - c_po W z ... use stable form:
            z = jnp.linalg.solve(M, c_po.T * w_perm[:, None])
            quad = jnp.einsum('pn,np->p', c_po, z)
            d_self = jnp.zeros((cp.shape[0], 1))
            prior_var = cov_pars[0] * jnp.ones(cp.shape[0], self.dtype)
            var = jnp.maximum(prior_var - quad, 1e-12)
        if predict_response:
            mean_resp, var_resp = _response_moments(
                self.likelihood, mean_lat, var, aux)
            return mean_resp, (var_resp if predict_var else None)
        return mean_lat, (var if predict_var else None)

    def _find_mode_dense(self, cov_pars, y, aux, fixed_part):
        from gpboost_tpu import likelihoods as lk
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        a, d = self._latent_factors(cov_pars)
        n = self.n
        Bmat = (jnp.eye(n, dtype=self.dtype)
                - jnp.zeros((n, n), self.dtype)
                .at[jnp.arange(n)[:, None], jnp.maximum(self.neighbors, 0)]
                .add(jnp.where(self.neighbors >= 0, a, 0.0)))
        Q = Bmat.T @ (Bmat / d[:, None])
        b = jnp.zeros(n, self.dtype)
        for _ in range(50):
            loc = Fp + b
            d1 = fam.d_loc(yp, loc, aux)
            w = jnp.maximum(-fam.d2_loc(yp, loc, aux), 1e-10)
            M = Q + jnp.diag(w)
            b = b + jnp.linalg.solve(M, d1 - Q @ b)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux)
        return b, w, Q

    def grad_F_laplace(self, cov_pars, y, aux_pars, fixed_part):
        """d NLL / dF for LaGaBoost with Vecchia (autodiff)."""
        def f(fe):
            return self.nll_laplace(cov_pars, y, aux_pars, fe)
        return jax.grad(f)(fixed_part)
