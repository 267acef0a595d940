"""Vecchia approximation for COMBINED GP + grouped random-effects models.

The reference supports grouped REs alongside a Vecchia-approximated GP
(``CreateREComponentsVecchia``, ``Vecchia_utils.cpp:1060`` keeps the grouped
components as ordinary ``RECompGroup`` blocks next to the Vecchia GP). The
TPU-native formulation reuses the full-scale-Woodbury pattern of
``fsva_model.py``:

    Psi = Lambda + U U',
    Lambda = Vecchia(K_gp + nugget I),  Lambda^-1 = B' D^-1 B (matrix-free),
    U[:, level] = sqrt(sigma2_comp) * z_i 1{code_i = level}   [n, q_total],

so every solve is O(n m_nb) scatter/gather plus one [q, q] Cholesky —
the grouped part never materializes beyond its incidence columns.

Gaussian likelihood only (the reference's own test suite has no
Vecchia+grouped coverage; correctness here is pinned against the dense
combined path with num_neighbors = n-1).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction

LOG_2PI = math.log(2.0 * math.pi)


class VecchiaGroupedGP:
    """Vecchia GP + grouped REs (Gaussian response)."""

    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 group_codes: np.ndarray, slope_cols: list,
                 num_neighbors: int = 20, ordering: str = "random",
                 seed: int = 0, dtype=jnp.float64):
        """``group_codes`` [n, n_comp] int codes per grouped component;
        ``slope_cols`` list (len n_comp) of None or [n] slope covariates."""
        n = coords.shape[0]
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = "gaussian"
        self.num_neighbors = min(num_neighbors, n - 1)
        self.num_neighbors_pred = self.num_neighbors
        self.perm = vops.apply_ordering(n, ordering, seed)
        self.inv_perm = np.argsort(self.perm)
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.coords_perm = jnp.asarray(coords[self.perm], dtype=dtype)
        self.neighbors = vops.find_neighbors(self.coords_perm,
                                             self.num_neighbors)
        self.dtype = dtype
        self.n_comp = group_codes.shape[1]
        self.level_counts = [int(group_codes[:, j].max()) + 1
                             for j in range(self.n_comp)]
        self.q_total = int(sum(self.level_counts))
        # dense incidence [n, q_total] in PERMUTED order (z values for slopes)
        Z = np.zeros((n, self.q_total))
        off = 0
        for j in range(self.n_comp):
            z = (np.ones(n) if slope_cols[j] is None
                 else np.asarray(slope_cols[j], dtype=np.float64))
            Z[np.arange(n), off + group_codes[:, j]] = z
            off += self.level_counts[j]
        self.Z_perm = jnp.asarray(Z[self.perm], dtype=dtype)
        self._comp_slices = []
        off = 0
        for j in range(self.n_comp):
            self._comp_slices.append((off, off + self.level_counts[j]))
            off += self.level_counts[j]
        self._vg_gaussian_jit = jax.jit(
            lambda th, y, fp, nb: jax.value_and_grad(
                lambda t: self.nll_gaussian(jnp.exp(t), y, fp, nb))(th))

    def _vg_gaussian(self, th, y, fp):
        return self._vg_gaussian_jit(th, y, fp, self.neighbors)

    def _split_pars(self, cov_pars):
        """[nugget, group vars..., gp pars...] (declaration order)."""
        nugget = cov_pars[0]
        gvars = cov_pars[1:1 + self.n_comp]
        gp_pars = cov_pars[1 + self.n_comp:]
        return nugget, gvars, gp_pars

    def _U(self, gvars):
        """U with U U' = Z Sigma_b Z': scale each component's columns."""
        scale = jnp.concatenate([
            jnp.full((self.level_counts[j],), jnp.sqrt(gvars[j]))
            for j in range(self.n_comp)])
        return self.Z_perm * scale[None, :]

    def _factors(self, cov_pars, neighbors=None):
        nb = self.neighbors if neighbors is None else neighbors
        nugget, gvars, gp_pars = self._split_pars(cov_pars)
        a, d = vops.build_factors(self.cov_fn, gp_pars, self.coords_perm,
                                  nb, nugget, True)
        return a, d, self._U(gvars), nb

    def nll_gaussian(self, cov_pars, y, fixed_part=None, neighbors=None):
        """Woodbury NLL: logdet(Psi) = sum log d + logdet(I_q + U' Lam^-1 U)."""
        a, d, U, nb = self._factors(cov_pars, neighbors)
        r = y if fixed_part is None else y - fixed_part
        r = r[self.perm]

        def lam_inv(x):
            if x.ndim == 1:
                return vops.precision_matvec(a, nb, d, x)
            return jax.vmap(lambda col: vops.precision_matvec(a, nb, d, col),
                            in_axes=1, out_axes=1)(x)

        li_r = lam_inv(r)
        li_U = lam_inv(U)
        q = U.shape[1]
        M = jnp.eye(q, dtype=U.dtype) + U.T @ li_U
        l_M = jnp.linalg.cholesky(M)
        w = U.T @ li_r
        t = jax.scipy.linalg.solve_triangular(l_M, w, lower=True)
        quad = jnp.dot(r, li_r) - jnp.dot(t, t)
        logdet = (jnp.sum(jnp.log(d))
                  + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_M))))
        return 0.5 * (quad + logdet + self.n * LOG_2PI)

    def psi_inv_mul(self, cov_pars, R):
        """Psi^-1 R for permuted-order R [n] or [n, k]."""
        a, d, U, nb = self._factors(cov_pars)

        def lam_inv(x):
            if x.ndim == 1:
                return vops.precision_matvec(a, nb, d, x)
            return jax.vmap(lambda col: vops.precision_matvec(a, nb, d, col),
                            in_axes=1, out_axes=1)(x)

        li_R = lam_inv(R)
        li_U = lam_inv(U)
        q = U.shape[1]
        M = jnp.eye(q, dtype=U.dtype) + U.T @ li_U
        l_M = jnp.linalg.cholesky(M)
        inner = U.T @ li_R
        sol = jax.scipy.linalg.cho_solve((l_M, True), inner)
        return li_R - lam_inv(U @ sol)

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        yv = y if fixed_effects is None else y - fixed_effects
        yp = yv[self.perm]
        Xp = X[self.perm]
        pi_X = self.psi_inv_mul(cov_pars, Xp)
        return jnp.linalg.solve(Xp.T @ pi_X, pi_X.T @ yp)

    def predict_gaussian(self, cov_pars, y, coords_pred, fixed_part=None,
                         predict_response=True, predict_var=False,
                         Z_pred=None, prior_z=None):
        """Exact cross-covariance (GP + matching groups) with the
        approximate Psi^-1. ``Z_pred`` [n_p, q_total] is the UNscaled
        incidence of the prediction points (zero rows for new groups);
        ``prior_z`` [n_p, n_comp] carries the slope/1 values used for the
        PRIOR variance (new groups still contribute prior variance)."""
        from gpboost_tpu.ops.cov_fns import euclidean_distance
        nugget, gvars, gp_pars = self._split_pars(cov_pars)
        r = y if fixed_part is None else y - fixed_part
        rp = r[self.perm]
        pi_r = self.psi_inv_mul(cov_pars, rp)
        cp = jnp.asarray(coords_pred, self.dtype)
        d_po = euclidean_distance(cp, self.coords_perm)
        k_po = self.cov_fn.cov_matrix(gp_pars, dist=d_po)
        U = self._U(gvars)
        cross = k_po
        if Z_pred is not None:
            scale = jnp.concatenate([
                jnp.full((self.level_counts[j],), jnp.sqrt(gvars[j]))
                for j in range(self.n_comp)])
            Up = jnp.asarray(Z_pred, self.dtype) * scale[None, :]
            cross = cross + Up @ U.T
        mean = cross @ pi_r
        var = None
        if predict_var:
            pi_c = self.psi_inv_mul(cov_pars, cross.T)
            prior = gp_pars[0] * jnp.ones(cp.shape[0], self.dtype)
            if prior_z is not None:
                pz = jnp.asarray(prior_z, self.dtype)
                for j in range(self.n_comp):
                    prior = prior + gvars[j] * pz[:, j] ** 2
            var = prior - jnp.einsum('pn,np->p', cross, pi_c)
            if predict_response:
                var = var + nugget
            var = jnp.maximum(var, 0.0)
        return mean, var
