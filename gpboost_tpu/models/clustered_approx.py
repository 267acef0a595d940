"""``cluster_ids`` under the inducing-point / full-scale approximations.

The reference holds one approximation per ``cluster_id`` in ``std::map``s and
loops them serially (``re_model_template.h:6015`` branches cluster-wise for
fitc / full_scale_tapering / full_scale_vecchia; per-cluster inducing points
are selected from that cluster's coordinates). Here each cluster gets its own
sub-approximation object and the likelihood factorizes over the independent
clusters — one jitted program sums the per-cluster NLL graphs, so XLA still
fuses/schedules the whole thing as a single device program.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ClusteredApprox:
    """Composite approximation: one sub-model per ``cluster_id``.

    ``make_sub(coords_cluster)`` builds the per-cluster approximation
    (FITCGP / FSVAGP); every sub-model sees the same covariance parameters.
    """

    def __init__(self, coords: np.ndarray, cluster_codes: np.ndarray,
                 make_sub: Callable, likelihood: str = "gaussian",
                 dtype=jnp.float64):
        codes = np.asarray(cluster_codes, np.int32)
        self.n = coords.shape[0]
        self.likelihood = likelihood
        self.dtype = dtype
        self.codes = jnp.asarray(codes)  # signals codes_pred plumbing
        self.num_clusters = int(codes.max()) + 1
        self.idx = [np.flatnonzero(codes == c)
                    for c in range(self.num_clusters)]
        self.subs = [make_sub(np.asarray(coords)[ix]) for ix in self.idx]
        self.mesh = None
        self._vg_gaussian = jax.jit(jax.value_and_grad(
            lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))

    def sync_iter_cfg(self, cfg):
        for sub in self.subs:
            if hasattr(sub, "sync_iter_cfg"):
                sub.sync_iter_cfg(cfg)

    def _parts(self, v):
        return [None if v is None else v[jnp.asarray(ix)] for ix in self.idx]

    # -- Gaussian ------------------------------------------------------
    def nll_gaussian(self, cov_pars, y, fixed_part=None):
        ys = self._parts(y)
        fs = self._parts(fixed_part)
        tot = jnp.zeros((), self.dtype)
        for sub, yc, fc in zip(self.subs, ys, fs):
            tot = tot + sub.nll_gaussian(cov_pars, yc, fc)
        return tot

    def _psi_inv_mul(self, cov_pars, R):
        out = jnp.zeros_like(R)
        for sub, ix in zip(self.subs, self.idx):
            ixj = jnp.asarray(ix)
            out = out.at[ixj].set(sub._psi_inv_mul(cov_pars, R[ixj]))
        return out

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        yv = y if fixed_effects is None else y - fixed_effects
        Xw = self._psi_inv_mul(cov_pars, X)
        yw = self._psi_inv_mul(cov_pars, yv)
        return jnp.linalg.solve(X.T @ Xw, X.T @ yw)

    def predict_gaussian(self, cov_pars, y, coords_pred, fixed_part=None,
                         predict_response=True, predict_var=False,
                         codes_pred=None, nsim_var_pred=None):
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        if codes_pred is None:
            raise ValueError("cluster_ids_pred is required for predictions "
                             "from a model trained with cluster_ids")
        cdp = np.asarray(codes_pred, np.int32)
        mean = np.zeros(n_p)
        var = np.zeros(n_p) if predict_var else None
        r = y if fixed_part is None else y - fixed_part
        for c in np.unique(cdp):
            sel = np.flatnonzero(cdp == c)
            if c < self.num_clusters:
                sub = self.subs[c]
                m_c, v_c = sub.predict_gaussian(
                    cov_pars, r[jnp.asarray(self.idx[c])],
                    cp[jnp.asarray(sel)],
                    None, predict_response, predict_var,
                    **({"nsim_var_pred": nsim_var_pred}
                       if getattr(sub, "supports_sim_pred_var", False)
                       else {}))
                mean[sel] = np.asarray(m_c)
                if predict_var:
                    var[sel] = np.asarray(v_c)
            else:
                # unseen cluster: prior mean 0, prior variance
                mean[sel] = 0.0
                if predict_var:
                    pv = float(cov_pars[1])
                    if predict_response:
                        pv += float(cov_pars[0])
                    var[sel] = pv
        return jnp.asarray(mean), (jnp.asarray(var) if predict_var else None)

    # -- non-Gaussian (Laplace) ----------------------------------------
    def nll_laplace(self, cov_pars, y, aux_pars, fixed_part=None):
        ys = self._parts(y)
        fs = self._parts(fixed_part)
        tot = jnp.zeros((), self.dtype)
        for sub, yc, fc in zip(self.subs, ys, fs):
            tot = tot + sub.nll_laplace(cov_pars, yc, aux_pars, fc)
        return tot

    def grad_F_laplace(self, cov_pars, y, aux_pars, fixed_part):
        def f(fe):
            return self.nll_laplace(cov_pars, y, aux_pars, fe)
        return jax.grad(f)(fixed_part)

    def predict_laplace(self, cov_pars, y, aux_pars, coords_pred,
                        fixed_part=None, fixed_part_pred=None,
                        predict_response=True, predict_var=False,
                        codes_pred=None, z_pred=None):
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        if codes_pred is None:
            raise ValueError("cluster_ids_pred is required for predictions "
                             "from a model trained with cluster_ids")
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import _response_moments
        cdp = np.asarray(codes_pred, np.int32)
        mean = np.zeros(n_p)
        var = np.zeros(n_p)
        aux = (aux_pars if aux_pars is not None
               else jnp.zeros((0,), self.dtype))
        for c in np.unique(cdp):
            sel = np.flatnonzero(cdp == c)
            fpp = (None if fixed_part_pred is None
                   else fixed_part_pred[jnp.asarray(sel)])
            if c < self.num_clusters:
                sub = self.subs[c]
                ixj = jnp.asarray(self.idx[c])
                fc = None if fixed_part is None else fixed_part[ixj]
                m_c, v_c = sub.predict_laplace(
                    cov_pars, y[ixj], aux_pars, cp[jnp.asarray(sel)], fc,
                    fpp, predict_response, True)
                mean[sel] = np.asarray(m_c)
                var[sel] = np.asarray(v_c)
            else:
                mu0 = jnp.zeros(len(sel), self.dtype)
                if fpp is not None:
                    mu0 = mu0 + fpp
                v0 = cov_pars[0] * jnp.ones(len(sel), self.dtype)
                if predict_response:
                    m_c, v_c = _response_moments(self.likelihood, mu0, v0,
                                                 aux)
                else:
                    m_c, v_c = mu0, v0
                mean[sel] = np.asarray(m_c)
                var[sel] = np.asarray(v_c)
        return jnp.asarray(mean), (jnp.asarray(var) if predict_var else None)
