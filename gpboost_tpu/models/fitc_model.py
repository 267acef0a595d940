"""FITC / full-scale-tapering model paths (same interface as VecchiaGP).

Dispatch target of ``GPModel`` for ``gp_approx="fitc"`` and
``"full_scale_tapering"``. Gaussian NLL/solves go through Woodbury
(``ops/fitc.py``); non-Gaussian uses the FITC latent covariance with the
dense Laplace engine (exact small-n path; iterative large-n path is the
planned upgrade, cf. ``FindModePostRandEffCalcMLLFITC`` likelihoods.h:3090).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import fitc as fops
from gpboost_tpu.ops.cov_fns import CovFunction, euclidean_distance
from gpboost_tpu.ops.inducing import select_inducing_points

LOG_2PI = math.log(2.0 * math.pi)


class FITCGP:
    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 num_ind_points: int = 500,
                 ind_points_selection: str = "kmeans++", seed: int = 0,
                 cover_tree_radius: float = 1.0,
                 likelihood: str = "gaussian", gp_approx: str = "fitc",
                 cov_fct_taper_range: float = 1.0,
                 cov_fct_taper_shape: float = 1.0,
                 matrix_inversion_method: str = "cholesky",
                 dtype=jnp.float64):
        n = coords.shape[0]
        n_unique = np.unique(coords, axis=0).shape[0]
        if num_ind_points > n_unique:
            raise ValueError(
                "Cannot have more inducing points than (unique) samples")
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = likelihood
        self.gp_approx = gp_approx
        self.taper_range = cov_fct_taper_range
        self.taper_shape = cov_fct_taper_shape
        # FSA residual tapering uses apply_tapering=true in the reference
        # (re_model_template.h:7090-7092), so mu = (1+d)/2 + shape + 1/2
        # (re_comp.h:842-845)
        self.taper_mu = (1.0 + coords.shape[1]) / 2.0 + cov_fct_taper_shape + 0.5
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.ind_points = jnp.asarray(
            select_inducing_points(coords, num_ind_points,
                                   ind_points_selection, seed,
                                   cover_tree_radius=cover_tree_radius),
            dtype=dtype)
        self.dtype = dtype
        self.mesh = None
        self._shard_coords = None
        self._shard_w = None
        self.matrix_inversion_method = matrix_inversion_method
        # iterative-path knobs (reference defaults; sync_iter_cfg adopts
        # the optimizer config's values)
        self.num_rand_vec_trace = 50
        self.lanczos_steps = 50
        self.cg_tol = 1e-4
        self.cg_max_iter = 1000
        self.seed_rand_vec_trace = 1
        self._taper_idx = None  # [n, k_t] taper support (static structure)
        if self._use_iterative:
            # materialize EAGERLY: the structure search concretizes k_t
            # (int(max(counts))), which is impossible inside a jit trace
            _ = self.taper_idx
        # persistent jitted value+grad (shared fit driver expects this)
        self._vg_gaussian = jax.jit(jax.value_and_grad(
            lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))
        from gpboost_tpu import parallel as par
        if par.active_mesh() is not None and (
                gp_approx == "fitc"
                or (gp_approx == "full_scale_tapering"
                    and likelihood == "gaussian"
                    and not self._use_iterative)):
            self.shard_over(par.active_mesh())

    def shard_over(self, mesh, axis=None):
        """Shard the row panels over a device mesh.

        ``fitc``: the [n, k] cross-covariance build, the Lambda diagonal and
        the Woodbury products partition over padded row shards
        (inducing-point [k, k] work replicates) — the mesh analog of the
        reference's per-row OpenMP loops (``re_model_template.h:7000-7100``).

        ``full_scale_tapering``: the O(n^2) dense assembly (distances,
        covariance transcendentals, taper product, Q panel) partitions over
        row shards via ``fsa_psi_rows``; the Cholesky gathers — matching the
        reference where the per-entry assembly is the OpenMP-parallel part.
        Gaussian likelihood only (the reference's clustered/threaded scope)."""
        if self.gp_approx not in ("fitc", "full_scale_tapering"):
            raise NotImplementedError(
                "mesh sharding is implemented for gp_approx='fitc' and "
                f"'full_scale_tapering' (got {self.gp_approx!r})")
        from gpboost_tpu import parallel as par
        import numpy as _np
        self.mesh = mesh
        self._mesh_axis = axis
        ndev = int(_np.prod(mesh.devices.shape))
        pad = (-self.n) % ndev
        cn = _np.asarray(self.coords)
        cpad = (_np.concatenate([cn, _np.repeat(cn[:1], pad, axis=0)])
                if pad else cn)
        w = _np.concatenate([_np.ones(self.n), _np.zeros(pad)])
        self._shard_coords = par.shard_rows(
            jnp.asarray(cpad, self.dtype), mesh, axis)
        self._shard_w = par.shard_rows(jnp.asarray(w, self.dtype), mesh,
                                       axis)
        if self.gp_approx == "full_scale_tapering":
            # replicated padded gather tables for the column side
            self._pad_coords = par.replicate(
                jnp.asarray(cpad, self.dtype), mesh)
            self._pad_w = par.replicate(jnp.asarray(w, self.dtype), mesh)
        self.coords = par.replicate(self.coords, mesh)
        self.ind_points = par.replicate(self.ind_points, mesh)
        return self

    @property
    def _use_iterative(self):
        return (self.gp_approx == "full_scale_tapering"
                and self.matrix_inversion_method == "iterative")

    def sync_iter_cfg(self, cfg):
        """Adopt the optimizer config's iterative-method knobs. Rebuilds
        the jitted value+grad when they change (they are trace-time
        constants of the compiled graph)."""
        new = (max(int(cfg.num_rand_vec_trace), 1),
               min(int(cfg.cg_max_num_it_tridiag), 200),
               float(cfg.cg_delta_conv), int(cfg.cg_max_num_it),
               int(cfg.seed_rand_vec_trace))
        cur = (self.num_rand_vec_trace, self.lanczos_steps, self.cg_tol,
               self.cg_max_iter, self.seed_rand_vec_trace)
        if new != cur:
            (self.num_rand_vec_trace, self.lanczos_steps, self.cg_tol,
             self.cg_max_iter, self.seed_rand_vec_trace) = new
            self._vg_gaussian = jax.jit(jax.value_and_grad(
                lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))

    @property
    def taper_idx(self):
        if self._taper_idx is None:
            self._taper_idx = jnp.asarray(
                fops.taper_neighbors(self.coords, self.taper_range))
        return self._taper_idx

    # -- Gaussian ------------------------------------------------------
    def nll_gaussian(self, cov_pars, y, fixed_part=None):
        r = y if fixed_part is None else y - fixed_part
        if self.gp_approx == "fitc":
            if self._shard_coords is not None:
                pad = self._shard_coords.shape[0] - self.n
                r_pad = (jnp.concatenate([r, jnp.zeros(pad, r.dtype)])
                         if pad else r)
                return fops.fitc_nll(self.cov_fn, cov_pars,
                                     self._shard_coords, self.ind_points,
                                     r_pad, row_w=self._shard_w,
                                     num_data=self.n)
            return fops.fitc_nll(self.cov_fn, cov_pars, self.coords,
                                 self.ind_points, r)
        if self._use_iterative:
            return self.nll_gaussian_iterative(cov_pars, y, fixed_part)
        if self._shard_coords is not None:
            # mesh FSA: row-sharded assembly, pad rows -> identity block
            pad = self._shard_coords.shape[0] - self.n
            r_pad = (jnp.concatenate([r, jnp.zeros(pad, r.dtype)])
                     if pad else r)
            psi = fops.fsa_psi_rows(
                self.cov_fn, self.taper_range, self.taper_shape,
                self.taper_mu, cov_pars, self._shard_coords,
                self._pad_coords, self.ind_points, self._shard_w)
            chol = jnp.linalg.cholesky(psi)
            alpha = jax.scipy.linalg.solve_triangular(
                chol, r_pad * self._pad_w, lower=True)
            return 0.5 * (jnp.dot(alpha, alpha)
                          + 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
                          + self.n * LOG_2PI)
        psi = fops.fsa_psi(self.cov_fn, self.taper_range, self.taper_shape,
                           self.taper_mu, cov_pars, self.coords,
                           self.ind_points)
        chol = jnp.linalg.cholesky(psi)
        alpha = jax.scipy.linalg.solve_triangular(chol, r, lower=True)
        n = r.shape[0]
        return 0.5 * (jnp.dot(alpha, alpha)
                      + 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
                      + n * LOG_2PI)

    # -- taper-sparse iterative FSA (CGFSA role, CG_utils.h:507-900) ----
    def _fsa_iter_theta(self, cov_pars_full):
        """Differentiable matrix-free Psi pieces: (v, vals, diag + nugget)
        with Psi x = v'(v x) + resid_mv(vals, diag+nugget, idx, x)."""
        nugget = cov_pars_full[0]
        gp = cov_pars_full[1:]
        _, _, _, v = fops.fitc_parts(self.cov_fn, gp, self.coords,
                                     self.ind_points, nugget)
        vals, diag = fops.fsa_taper_values(
            self.cov_fn, self.taper_range, self.taper_shape, self.taper_mu,
            gp, self.coords, self.taper_idx, 1024, v)
        return v, vals, diag + nugget

    def _psi_of(self, theta, X):
        v, vals, dfull = theta
        return (fops.fsa_resid_mv(vals, dfull, self.taper_idx, X)
                + v.T @ (v @ X))

    def nll_gaussian_iterative(self, cov_pars, y, fixed_part=None):
        """Gaussian FSA NLL with CG solves + preconditioned stochastic
        Lanczos logdet under the FITC (low-rank + diag) preconditioner —
        the TPU-native CGFSA/CGTridiagFSA path (``CG_utils.h:507,622``,
        stochastic logdet ``LogDetStochTridiag`` :384). O(n k_t + n k) per
        matvec, no dense [n, n] matrices; differentiable (implicit-diff CG
        for the quadratic form, Hutchinson surrogate for the logdet)."""
        from gpboost_tpu.ops import cg as cgops
        r = y if fixed_part is None else y - fixed_part
        theta = self._fsa_iter_theta(cov_pars)
        v, vals, dfull = theta
        n = r.shape[0]
        pre_U = jax.lax.stop_gradient(v.T)
        pre_d = jax.lax.stop_gradient(jnp.maximum(dfull, 1e-10))
        alpha = cgops.pcg_implicit(self._psi_of, theta, r,
                                   pre_d, self.cg_tol, self.cg_max_iter,
                                   pre_U=pre_U)
        quad = jnp.dot(r, alpha)
        pre = cgops.LowRankDiagPreconditioner.create(pre_U, pre_d)
        key = jax.random.PRNGKey(self.seed_rand_vec_trace)
        k1, k2 = jax.random.split(key)
        Z = pre.sample_probes(k1, self.num_rand_vec_trace)
        Zg = cgops.rademacher_probes(k2, n, self.num_rand_vec_trace,
                                     self.dtype)
        logdet = cgops.stochastic_logdet_grad(
            lambda V: self._psi_of(theta, V), None, Z, self.lanczos_steps,
            pre.solve, pre.logdet(), self.cg_tol, self.cg_max_iter,
            probes_grad=Zg)
        return 0.5 * (quad + logdet + n * LOG_2PI)

    def _psi_inv_mul_iterative(self, cov_pars, R):
        from gpboost_tpu.ops import cg as cgops
        theta = self._fsa_iter_theta(cov_pars)
        v, vals, dfull = theta
        pre = cgops.LowRankDiagPreconditioner.create(
            v.T, jnp.maximum(dfull, 1e-10))
        X, _ = cgops.pcg(lambda V: self._psi_of(theta, V), R, pre.solve,
                         tol=min(self.cg_tol, 1e-6),
                         max_iter=self.cg_max_iter)
        return X

    def _psi_inv_mul(self, cov_pars, R):
        if self.gp_approx == "fitc":
            return fops.fitc_psi_inv_mul(self.cov_fn, cov_pars, self.coords,
                                         self.ind_points, R)
        if self._use_iterative:
            return self._psi_inv_mul_iterative(cov_pars, R)
        psi = fops.fsa_psi(self.cov_fn, self.taper_range, self.taper_shape,
                           self.taper_mu, cov_pars, self.coords,
                           self.ind_points)
        chol = jnp.linalg.cholesky(psi)
        if R.ndim == 1:
            return jax.scipy.linalg.cho_solve((chol, True), R)
        return jax.scipy.linalg.cho_solve((chol, True), R)

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        yv = y if fixed_effects is None else y - fixed_effects
        Xw = self._psi_inv_mul(cov_pars, X)
        yw = self._psi_inv_mul(cov_pars, yv)
        return jnp.linalg.solve(X.T @ Xw, X.T @ yw)

    # gp_model passes nsim_var_pred through (set_prediction_data)
    supports_sim_pred_var = True

    def predict_gaussian(self, cov_pars, y, coords_pred, fixed_part=None,
                         predict_response=True, predict_var=False,
                         nsim_var_pred=None):
        r = y if fixed_part is None else y - fixed_part
        cp = jnp.asarray(coords_pred, self.dtype)
        if self.gp_approx == "fitc":
            mean, var, _ = fops.fitc_predict(
                self.cov_fn, cov_pars, self.coords, self.ind_points, cp, r,
                bool(predict_response), bool(predict_var))
            return mean, var
        # FSA: cross-cov = Q_pn + T o (Sigma_pn - Q_pn)
        psi_inv_r = self._psi_inv_mul(cov_pars, r)
        n_p = cp.shape[0]
        # simulation-based variances (the reference's DEFAULT for FSA
        # prediction variances, "stochastic_stable" re_model.cpp:67 /
        # re_model_template.h:10839): engage when requested or when the
        # exact path would materialize/solve an [n_p, n] system too large
        use_sim = predict_var and (
            (nsim_var_pred is not None and int(nsim_var_pred) > 0)
            or (nsim_var_pred is None and n_p * self.n > 50_000_000))
        if use_sim:
            from gpboost_tpu.models.predvar import sim_pred_mean_var
            from gpboost_tpu.utils.log import log_info
            if nsim_var_pred is None:
                # nsim_var_pred=0 forces the exact path
                log_info("Using simulation-based predictive variances "
                         "(large n_p * n; set 'nsim_var_pred=0' to force "
                         "the exact path)")
            gp_pars = cov_pars[1:]
            sol_mn = self._fsa_cross_sol(gp_pars)
            mean, quad = sim_pred_mean_var(
                lambda cpc: self._fsa_cross(gp_pars, cpc, sol_mn=sol_mn), cp,
                lambda W: self._psi_inv_mul(cov_pars, W), psi_inv_r,
                int(nsim_var_pred or 1000),
                seed=self.seed_rand_vec_trace)
            var = cov_pars[1] - quad
            if predict_response:
                var = var + cov_pars[0]
            return mean, jnp.maximum(var, 0.0)
        cross = self._fsa_cross(cov_pars[1:], cp)
        mean = cross @ psi_inv_r
        var = None
        if predict_var:
            z = self._psi_inv_mul(cov_pars, cross.T)
            prior = cov_pars[1] * jnp.ones(cp.shape[0], self.dtype)
            var = prior - jnp.einsum('pn,np->p', cross, z)
            if predict_response:
                var = var + cov_pars[0]
        return mean, var

    def _fsa_cross_sol(self, cov_pars):
        """Chunk-independent piece of the FSA cross-covariance:
        C_mm^-1 C_mn [m, n] — hoisted out of per-chunk rebuilds in the
        simulation-based variance path."""
        d_nm = euclidean_distance(self.coords, self.ind_points)
        c_nm = self.cov_fn.cov_matrix(cov_pars, dist=d_nm)
        d_mm = euclidean_distance(self.ind_points, self.ind_points)
        c_mm = self.cov_fn.cov_matrix(cov_pars, dist=d_mm) + \
            fops.JITTER * cov_pars[0] * jnp.eye(self.ind_points.shape[0],
                                                dtype=self.dtype)
        return jnp.linalg.solve(c_mm, c_nm.T)

    def _fsa_cross(self, cov_pars, coords_pred, sol_mn=None):
        d_pn = euclidean_distance(coords_pred, self.coords)
        sigma_pn = self.cov_fn.cov_matrix(cov_pars, dist=d_pn)
        d_pm = euclidean_distance(coords_pred, self.ind_points)
        c_pm = self.cov_fn.cov_matrix(cov_pars, dist=d_pm)
        if sol_mn is None:
            sol_mn = self._fsa_cross_sol(cov_pars)
        q_pn = c_pm @ sol_mn
        from gpboost_tpu.ops.cov_fns import wendland_correlation
        T = wendland_correlation(d_pn, self.taper_range, self.taper_shape,
                                 self.taper_mu)
        return q_pn + T * (sigma_pn - q_pn)

    # -- non-Gaussian (Laplace with dense FITC latent covariance) ------
    def _latent_sigma(self, cov_pars):
        d_nm = euclidean_distance(self.coords, self.ind_points)
        c_nm = self.cov_fn.cov_matrix(cov_pars, dist=d_nm)
        d_mm = euclidean_distance(self.ind_points, self.ind_points)
        c_mm = self.cov_fn.cov_matrix(cov_pars, dist=d_mm) + \
            fops.JITTER * cov_pars[0] * jnp.eye(self.ind_points.shape[0],
                                                dtype=self.dtype)
        Q = c_nm @ jnp.linalg.solve(c_mm, c_nm.T)
        if self.gp_approx == "fitc":
            diag_corr = cov_pars[0] - jnp.diagonal(Q)
            return Q + jnp.diag(diag_corr)
        d_nn = euclidean_distance(self.coords, self.coords)
        sigma = self.cov_fn.cov_matrix(cov_pars, dist=d_nn)
        from gpboost_tpu.ops.cov_fns import wendland_correlation
        T = wendland_correlation(d_nn, self.taper_range, self.taper_shape,
                                 self.taper_mu)
        return Q + T * (sigma - Q)

    def _latent_lowrank(self, cov_pars):
        """FITC latent Sigma = V'V + diag(dD), V = L_mm^-1 K_mn [m, n]."""
        d_nm = euclidean_distance(self.coords, self.ind_points)
        c_nm = self.cov_fn.cov_matrix(cov_pars, dist=d_nm)
        d_mm = euclidean_distance(self.ind_points, self.ind_points)
        c_mm = self.cov_fn.cov_matrix(cov_pars, dist=d_mm) + \
            fops.JITTER * cov_pars[0] * jnp.eye(self.ind_points.shape[0],
                                                dtype=self.dtype)
        l_mm = jnp.linalg.cholesky(c_mm)
        V = jax.scipy.linalg.solve_triangular(l_mm, c_nm.T, lower=True)
        dD = jnp.maximum(cov_pars[0] - jnp.sum(V * V, axis=0), 1e-10)
        return V, dD

    def nll_laplace(self, cov_pars, y, aux_pars, fixed_part=None):
        F = (jnp.zeros(self.n, self.dtype) if fixed_part is None
             else fixed_part)
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        if self.gp_approx == "fitc":
            # scalable O(n m^2) Woodbury path — never builds [n, n]
            V, dD = self._latent_lowrank(cov_pars)
            return fitc_laplace_nll_woodbury(self.likelihood, V, dD, y, F,
                                             aux)
        from gpboost_tpu.models.laplace import _laplace_nll_from_sigma
        sigma = self._latent_sigma(cov_pars)
        return _laplace_nll_from_sigma(self.likelihood, sigma, y, F, aux)

    def predict_laplace(self, cov_pars, y, aux_pars, coords_pred,
                        fixed_part=None, fixed_part_pred=None,
                        predict_response=True, predict_var=False):
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import find_mode, _response_moments
        fam = lk.get_family(self.likelihood)
        sigma = self._latent_sigma(cov_pars)
        F = (jnp.zeros(self.n, self.dtype) if fixed_part is None
             else fixed_part)
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        b = find_mode(self.likelihood, sigma, y, F, aux)
        loc = F + b
        d1 = fam.d_loc(y, loc, aux)
        w = -fam.d2_loc(y, loc, aux)
        cp = jnp.asarray(coords_pred, self.dtype)
        cross = self._laplace_cross(cov_pars, cp)
        mean = cross @ d1
        if fixed_part_pred is not None:
            mean = mean + fixed_part_pred
        var = None
        if predict_var or predict_response:
            n = self.n
            M = jnp.eye(n, dtype=self.dtype) + sigma * w[None, :]
            z = jnp.linalg.solve(M, cross.T)
            prior = cov_pars[0] * jnp.ones(cp.shape[0], self.dtype)
            var = jnp.maximum(prior - jnp.einsum(
                'pn,np->p', cross, w[:, None] * z), 1e-12)
        if predict_response:
            mr, vr = _response_moments(self.likelihood, mean, var, aux)
            return mr, (vr if predict_var else None)
        return mean, (var if predict_var else None)

    def _laplace_cross(self, cov_pars, coords_pred):
        d_pm = euclidean_distance(coords_pred, self.ind_points)
        c_pm = self.cov_fn.cov_matrix(cov_pars, dist=d_pm)
        d_nm = euclidean_distance(self.coords, self.ind_points)
        c_nm = self.cov_fn.cov_matrix(cov_pars, dist=d_nm)
        d_mm = euclidean_distance(self.ind_points, self.ind_points)
        c_mm = self.cov_fn.cov_matrix(cov_pars, dist=d_mm) + \
            fops.JITTER * cov_pars[0] * jnp.eye(self.ind_points.shape[0],
                                                dtype=self.dtype)
        q_pn = c_pm @ jnp.linalg.solve(c_mm, c_nm.T)
        if self.gp_approx == "fitc":
            return q_pn
        d_pn = euclidean_distance(coords_pred, self.coords)
        sigma_pn = self.cov_fn.cov_matrix(cov_pars, dist=d_pn)
        from gpboost_tpu.ops.cov_fns import wendland_correlation
        T = wendland_correlation(d_pn, self.taper_range, self.taper_shape,
                                 self.taper_mu)
        return q_pn + T * (sigma_pn - q_pn)

    def grad_F_laplace(self, cov_pars, y, aux_pars, fixed_part):
        def f(fe):
            return self.nll_laplace(cov_pars, y, aux_pars, fe)
        return jax.grad(f)(fixed_part)


# ---------------------------------------------------------------------------
# scalable FITC-Laplace: Woodbury mode finding + logdet, O(n m^2)
# (``FindModePostRandEffCalcMLLFITC``, likelihoods.h:3090 — the reference's
# FITC Laplace never builds an [n, n] matrix either; here every solve is a
# diagonal + rank-m Woodbury and the only factorization is an [m, m]
# Cholesky on the MXU)
# ---------------------------------------------------------------------------

def _fitc_sigma_mv(V, dD, x):
    """(V'V + diag(dD)) x for V [m, n]."""
    if x.ndim == 1:
        return V.T @ (V @ x) + dD * x
    return V.T @ (V @ x) + dD[:, None] * x


def _woodbury_solve(lam, U2, x):
    """(diag(lam) + U2' U2)^-1 x with U2 [m, n]."""
    m = U2.shape[0]
    xl = x / lam
    inner = jnp.eye(m, dtype=U2.dtype) + (U2 / lam[None, :]) @ U2.T
    l_in = jnp.linalg.cholesky(inner)
    t = jax.scipy.linalg.cho_solve((l_in, True), U2 @ xl)
    return xl - (U2.T @ t) / lam


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _find_mode_fitc(lik_name, V, dD, y, F, aux):
    return _find_mode_fitc_impl(lik_name, V, dD, y, F, aux)


def _find_mode_fitc_impl(lik_name, V, dD, y, F, aux):
    """Posterior mode via the stable RW Alg. 3.1 iteration with Woodbury
    solves: a = c - sqrtW B^-1 sqrtW Sigma c, B = I + sqrtW Sigma sqrtW."""
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(lik_name)
    n = y.shape[0]
    dtype = V.dtype

    def obj(b, a):
        return jnp.sum(fam.log_lik(y, F + b, aux)) - 0.5 * jnp.dot(a, b)

    def newton(state):
        b, a, psi, it, conv = state
        loc = F + b
        d1 = fam.d_loc(y, loc, aux)
        w = jnp.maximum(-fam.d2_loc(y, loc, aux), 1e-10)
        sw = jnp.sqrt(w)
        c = w * b + d1
        sc = _fitc_sigma_mv(V, dD, c)
        lam = 1.0 + w * dD
        U2 = V * sw[None, :]
        a_new = c - sw * _woodbury_solve(lam, U2, sw * sc)
        b_new = _fitc_sigma_mv(V, dD, a_new)
        db = b_new - b
        da = a_new - a

        def psi_at(t):
            return obj(b + t * db, a + t * da)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < 60)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b_out = b + t * db
        a_out = a + t * da
        conv = jnp.abs(psi_new - psi) < 1e-9 * (jnp.abs(psi) + 1e-10)
        return b_out, a_out, psi_new, it + 1, conv

    def cond(state):
        _, _, _, it, conv = state
        return jnp.logical_and(it < 100, jnp.logical_not(conv))

    b0 = jnp.zeros(n, dtype)
    psi0 = jnp.sum(fam.log_lik(y, F, aux))
    b, a, _, _, _ = jax.lax.while_loop(cond, newton, (b0, b0, psi0, 0, False))
    return b


def _find_mode_fitc_fwd(lik_name, V, dD, y, F, aux):
    b = _find_mode_fitc_impl(lik_name, V, dD, y, F, aux)
    return b, (V, dD, y, F, aux, b)


def _find_mode_fitc_bwd(lik_name, res, v):
    V, dD, y, F, aux, b = res
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(lik_name)
    loc = F + b
    w = -fam.d2_loc(y, loc, aux)
    # adjoint system (dg/db)^T lam = (I + W Sigma) lam = v;
    # I + W Sigma = diag(1 + w dD) + (V w)' V — nonsymmetric Woodbury
    A = 1.0 + w * dD
    m = V.shape[0]
    Vw = V * w[None, :]

    def solve_IpWS(r):
        rl = r / A
        inner = jnp.eye(m, dtype=V.dtype) + (V * (w / A)[None, :]) @ V.T
        t = jnp.linalg.solve(inner, V @ rl)
        return rl - (Vw.T @ t) / A

    lam = solve_IpWS(v)

    def g(V_, dD_, F_, aux_):
        d1 = fam.d_loc(y, F_ + b, aux_)
        return b - _fitc_sigma_mv(V_, dD_, d1)

    _, vjp = jax.vjp(g, V, dD, F, aux)
    gV, gdD, gF, gaux = vjp(-lam)
    return gV, gdD, jnp.zeros_like(y), gF, gaux


_find_mode_fitc.defvjp(_find_mode_fitc_fwd, _find_mode_fitc_bwd)


def fitc_laplace_nll_woodbury(lik_name, V, dD, y, F, aux):
    """Laplace NLL with FITC latent Sigma = V'V + diag(dD), O(n m^2):

    logdet(I + W Sigma) = sum log(1 + w dD)
                          + logdet(I_m + U2 diag(1/lam) U2'),  U2 = V sqrtW.
    """
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(lik_name)
    b = _find_mode_fitc(lik_name, V, dD, y, F, aux)
    loc = F + b
    d1 = fam.d_loc(y, loc, aux)
    w = -fam.d2_loc(y, loc, aux)
    loglik = jnp.sum(fam.log_lik(y, loc, aux))
    quad = jnp.dot(b, d1)  # Sigma^-1 b = d1 at the mode
    lam = 1.0 + w * dD
    sw = jnp.sqrt(jnp.maximum(w, 0.0))
    U2 = V * sw[None, :]
    m = V.shape[0]
    inner = jnp.eye(m, dtype=V.dtype) + (U2 / lam[None, :]) @ U2.T
    sign, ld_inner = jnp.linalg.slogdet(inner)
    logdet = jnp.sum(jnp.log(lam)) + ld_inner
    return -(loglik - 0.5 * quad - 0.5 * logdet)
