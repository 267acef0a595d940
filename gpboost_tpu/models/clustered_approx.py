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
        from gpboost_tpu import parallel as par
        mesh = par.active_mesh()
        # sub-models must not row-shard themselves — the cluster axis is
        # the sharding axis here (SURVEY §2.5-8: embarrassing parallelism
        # over cluster_ids)
        if mesh is not None:
            with par.use_mesh(None):
                self.subs = [make_sub(np.asarray(coords)[ix])
                             for ix in self.idx]
        else:
            self.subs = [make_sub(np.asarray(coords)[ix])
                         for ix in self.idx]
        self.mesh = None
        self._batched = None
        self._vg_gaussian = jax.jit(jax.value_and_grad(
            lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))
        if mesh is not None and likelihood == "gaussian":
            self.shard_over(mesh)

    def shard_over(self, mesh, axis=None):
        """Shard the independent clusters over a device mesh.

        The reference loops its per-cluster ``std::map`` entries serially
        (``re_model_template.h:5020-5144``); here the per-cluster NLL
        graphs become ONE vmapped computation over a padded [C, n_max]
        cluster batch whose leading axis is sharded over the mesh — XLA
        inserts the cross-device sum (GSPMD), so the Gaussian fit runs
        SPMD with each device owning a slab of clusters. Supported for
        uniform FITC / full-scale-tapering sub-models."""
        from gpboost_tpu import parallel as par
        from gpboost_tpu.models.fitc_model import FITCGP
        from gpboost_tpu.models.fsva_model import FSVAGP
        subs = self.subs
        is_fsva = bool(subs) and all(isinstance(s, FSVAGP) for s in subs)
        if not subs or not (is_fsva
                            or all(isinstance(s, FITCGP) for s in subs)):
            raise NotImplementedError(
                "cluster-axis mesh sharding requires FITC/FSA/FSVA "
                "sub-models")
        kinds = ({"full_scale_vecchia"} if is_fsva
                 else {s.gp_approx for s in subs})
        ks = {int(s.ind_points.shape[0]) for s in subs}
        if len(kinds) != 1 or len(ks) != 1:
            raise NotImplementedError(
                "cluster-axis mesh sharding requires uniform sub-models "
                "with equal inducing-point counts")
        if is_fsva and any(s.neighbor_selection != "nearest" for s in subs):
            raise NotImplementedError(
                "cluster-axis mesh sharding with full_scale_vecchia "
                "requires Euclidean neighbor selection (correlation-based "
                "neighbors re-determine mid-fit)")
        self.mesh = mesh
        self._mesh_axis = axis
        kind = kinds.pop()
        ndev = int(np.prod(mesh.devices.shape))
        C = self.num_clusters
        C_pad = ((C + ndev - 1) // ndev) * ndev
        n_max = max(len(ix) for ix in self.idx)
        d = int(subs[0].coords.shape[1])
        k = ks.pop()
        coords_b = np.zeros((C_pad, n_max, d))
        ind_b = np.zeros((C_pad, k, d))
        w_b = np.zeros((C_pad, n_max))
        idx_b = np.zeros((C_pad, n_max), np.int32)
        n_b = np.zeros(C_pad)
        m_nb = (max(int(s.neighbors.shape[1]) for s in subs) if is_fsva
                else 0)
        nb_b = np.full((C_pad, n_max, max(m_nb, 1)), -1, np.int32)
        for c, (sub, ix) in enumerate(zip(subs, self.idx)):
            m = len(ix)
            if is_fsva:
                # FSVA rows live in the sub-model's PERMUTED order
                coords_b[c, :m] = np.asarray(sub.coords_perm)
                idx_b[c, :m] = ix[np.asarray(sub.perm)]
                nbs = np.asarray(sub.neighbors)
                nb_b[c, :m, :nbs.shape[1]] = nbs
            else:
                coords_b[c, :m] = np.asarray(sub.coords)
                idx_b[c, :m] = ix
            coords_b[c, m:] = coords_b[c, :1]    # benign pad coordinates
            ind_b[c] = np.asarray(sub.ind_points)
            w_b[c, :m] = 1.0
            n_b[c] = m
        for c in range(C, C_pad):                # dummy pad clusters: NLL 0
            coords_b[c] = coords_b[0]
            ind_b[c] = ind_b[0]
        shard = lambda a: par.shard_rows(  # noqa: E731
            jnp.asarray(a, self.dtype), mesh, axis)
        self._b_kind = kind
        self._b_coords = shard(coords_b)
        self._b_ind = shard(ind_b)
        self._b_w = shard(w_b)
        self._b_idx = par.shard_rows(jnp.asarray(idx_b), mesh, axis)
        self._b_n = shard(n_b)
        self._b_nb = (par.shard_rows(jnp.asarray(nb_b), mesh, axis)
                      if is_fsva else None)
        self._batched = True
        self._vg_gaussian = jax.jit(jax.value_and_grad(
            lambda th, y, fp: self.nll_gaussian(jnp.exp(th), y, fp)))
        return self

    def _nll_gaussian_batched(self, cov_pars, y, fixed_part=None):
        from gpboost_tpu.ops import fitc as fops
        import math
        r = y if fixed_part is None else y - fixed_part
        r_b = jnp.where(self._b_w > 0, r[self._b_idx], 0.0)
        sub0 = self.subs[0]
        if self._b_kind == "full_scale_vecchia":
            # per-cluster FSVA Woodbury NLL (fsva_model.nll_gaussian math)
            # vmapped over the sharded cluster axis: pad rows get zeroed u
            # rows + unit conditional variances, pad clusters contribute 0
            import jax.scipy.linalg as jsl
            from gpboost_tpu.models.fsva_model import JITTER
            from gpboost_tpu.ops import vecchia as vops
            from gpboost_tpu.ops.cov_fns import euclidean_distance
            LOG_2PI = math.log(2.0 * math.pi)
            cov_fn = sub0.cov_fn
            gp_pars = cov_pars[1:]
            k = int(sub0.ind_points.shape[0])

            def one(c, ip, nb, rr, w, nn):
                d_mm = euclidean_distance(ip, ip)
                c_mm = cov_fn.cov_matrix(gp_pars, dist=d_mm) \
                    + JITTER * gp_pars[0] * jnp.eye(k, dtype=c.dtype)
                l_mm = jnp.linalg.cholesky(c_mm)
                d_nm = euclidean_distance(c, ip)
                u = cov_fn.cov_matrix(gp_pars, dist=d_nm)
                v = jsl.solve_triangular(l_mm, u.T, lower=True)
                a, dd = vops.build_factors_residual(
                    cov_fn, gp_pars, c, nb, v, cov_pars[0], True)
                u = u * w[:, None]
                dd = jnp.where(w > 0, dd, 1.0)
                li_r = vops.precision_matvec(a, nb, dd, rr)
                li_u = jax.vmap(
                    lambda col: vops.precision_matvec(a, nb, dd, col),
                    in_axes=1, out_axes=1)(u)
                M = jnp.matmul(l_mm, l_mm.T,
                               precision=jax.lax.Precision.HIGHEST) \
                    + u.T @ li_u
                l_M = jnp.linalg.cholesky(M)
                wv = u.T @ li_r
                t = jsl.solve_triangular(l_M, wv, lower=True)
                quad = jnp.dot(rr, li_r) - jnp.dot(t, t)
                logdet = (jnp.sum(jnp.log(dd))
                          + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_M)))
                          - 2.0 * jnp.sum(jnp.log(jnp.diagonal(l_mm))))
                return 0.5 * (quad + logdet + nn * LOG_2PI)

            nll_c = jax.vmap(one)(self._b_coords, self._b_ind, self._b_nb,
                                  r_b, self._b_w, self._b_n)
            return jnp.sum(nll_c)
        if self._b_kind == "fitc":
            nll_c = jax.vmap(
                lambda c, ip, rr, w, nn: fops.fitc_nll(
                    sub0.cov_fn, cov_pars, c, ip, rr, row_w=w,
                    num_data=nn))(self._b_coords, self._b_ind, r_b,
                                  self._b_w, self._b_n)
        else:  # full_scale_tapering: dense per-cluster Psi, pads -> I
            LOG_2PI = math.log(2.0 * math.pi)

            def one(c, ip, rr, w, nn):
                psi = fops.fsa_psi(sub0.cov_fn, sub0.taper_range,
                                   sub0.taper_shape, sub0.taper_mu,
                                   cov_pars, c, ip)
                psi = (psi * (w[:, None] * w[None, :])
                       + jnp.diag(1.0 - w))
                chol = jnp.linalg.cholesky(psi)
                alpha = jax.scipy.linalg.solve_triangular(chol, rr,
                                                          lower=True)
                return 0.5 * (jnp.dot(alpha, alpha)
                              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
                              + nn * LOG_2PI)

            nll_c = jax.vmap(one)(self._b_coords, self._b_ind, r_b,
                                  self._b_w, self._b_n)
        return jnp.sum(nll_c)

    def sync_iter_cfg(self, cfg):
        for sub in self.subs:
            if hasattr(sub, "sync_iter_cfg"):
                sub.sync_iter_cfg(cfg)

    def _parts(self, v):
        return [None if v is None else v[jnp.asarray(ix)] for ix in self.idx]

    # -- Gaussian ------------------------------------------------------
    def nll_gaussian(self, cov_pars, y, fixed_part=None):
        if self._batched:
            return self._nll_gaussian_batched(cov_pars, y, fixed_part)
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
