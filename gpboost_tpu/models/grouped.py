"""Woodbury fast path for grouped-random-effects-only models.

The reference uses sparse matrices + the Woodbury identity for grouped REs
(``use_woodbury_identity_``, ``re_model_template.h``); here the incidence
matrix Z [n, q] never materializes — Z'v is a segment-sum over group codes,
ZM a gather — and all dense work happens in the q-dimensional random-effects
space:

  Psi = sigma2 I + Z Sigma_b Z'   (Sigma_b diagonal, per-component variances)
  Psi^-1 r = (r - Z (sigma2 Sigma_b^-1 + Z'Z)^-1 Z'r) / sigma2
  logdet Psi = n log sigma2 + logdet(I + Sigma_b Z'Z / sigma2)

Non-Gaussian: Laplace mode finding runs in b-space [q] (Newton with
H = Z'WZ + Sigma_b^-1), the q-dim analog of
``FindModePostRandEffCalcMLLGroupedRE`` (likelihoods.h:1975).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.models.spec import GroupedRESpec, ModelData, ModelSpec

LOG_2PI = math.log(2.0 * math.pi)


def grouped_layout(spec: ModelSpec):
    """(offsets, sizes, total_q) for the stacked random-effects vector."""
    offsets = []
    sizes = []
    off = 0
    for comp in spec.components:
        assert isinstance(comp, GroupedRESpec)
        offsets.append(off)
        sizes.append(comp.num_groups)
        off += comp.num_groups
    return tuple(offsets), tuple(sizes), off


def _eff_weights(data: ModelData):
    """Likelihood weights combined with the mesh-padding row mask (pads get
    effective weight 0, so their likelihood terms vanish exactly)."""
    if data.row_weight is None:
        return data.weights
    if data.weights is None:
        return data.row_weight
    return data.weights * data.row_weight


def _num_real(spec: ModelSpec, r: jnp.ndarray):
    """Real (unpadded) observation count: the mesh layout pads rows to a
    device multiple, so counts must come from the static spec."""
    return spec.num_data if spec.num_data else r.shape[0]


@partial(jax.jit, static_argnums=(0,))
def _z_weights(spec: ModelSpec, data: ModelData):
    """Per-component multiplier z_i (1 for intercepts, covariate for slopes),
    stacked [ncomp, n]. Mesh-padding rows are zeroed (``data.row_weight``)
    so every Z product excludes them."""
    n = data.group_codes.shape[0]
    ws = []
    for j, comp in enumerate(spec.components):
        if comp.is_slope:
            ws.append(data.slope_data[:, comp.slope_data_idx])
        else:
            ws.append(jnp.ones(n, data.slope_data.dtype
                               if data.slope_data is not None else
                               jnp.result_type(float)))
    out = jnp.stack(ws, axis=0)
    if data.row_weight is not None:
        out = out * data.row_weight[None, :]
    return out


@partial(jax.jit, static_argnums=(0,))
def zt_mul(spec: ModelSpec, data: ModelData, v: jnp.ndarray) -> jnp.ndarray:
    """Z' v: [q] segment-sums of v per component level."""
    offsets, sizes, q = grouped_layout(spec)
    w = _z_weights(spec, data)
    parts = []
    for j, comp in enumerate(spec.components):
        codes = data.group_codes[:, comp.code_col]
        parts.append(jnp.zeros(sizes[j], v.dtype).at[codes].add(w[j] * v))
    return jnp.concatenate(parts)


@partial(jax.jit, static_argnums=(0,))
def z_mul(spec: ModelSpec, data: ModelData, b: jnp.ndarray) -> jnp.ndarray:
    """Z b: gather per component and sum. b is the stacked [q] vector."""
    offsets, sizes, q = grouped_layout(spec)
    w = _z_weights(spec, data)
    n = data.group_codes.shape[0]
    out = jnp.zeros(n, b.dtype)
    for j, comp in enumerate(spec.components):
        codes = data.group_codes[:, comp.code_col]
        out = out + w[j] * b[offsets[j] + codes]
    return out


@partial(jax.jit, static_argnums=(0,))
def ztz_matrix(spec: ModelSpec, data: ModelData) -> jnp.ndarray:
    """Dense Z'Z [q, q] via scatter-adds over component pairs."""
    offsets, sizes, q = grouped_layout(spec)
    w = _z_weights(spec, data)
    dtype = w.dtype
    ztz = jnp.zeros((q, q), dtype)
    for j1, c1 in enumerate(spec.components):
        codes1 = data.group_codes[:, c1.code_col] + offsets[j1]
        for j2, c2 in enumerate(spec.components):
            codes2 = data.group_codes[:, c2.code_col] + offsets[j2]
            ztz = ztz.at[codes1, codes2].add(w[j1] * w[j2])
    return ztz


def _sigma_b_diag(spec: ModelSpec, comp_vars: jnp.ndarray, dtype):
    """Diagonal of Sigma_b: comp_vars[j] repeated sizes[j] times."""
    offsets, sizes, q = grouped_layout(spec)
    parts = [jnp.full((sizes[j],), comp_vars[j], dtype)
             for j in range(len(sizes))]
    return jnp.concatenate(parts)


@partial(jax.jit, static_argnums=(0,))
def nll_gaussian(spec: ModelSpec, data: ModelData, cov_pars: jnp.ndarray,
                 beta: Optional[jnp.ndarray] = None,
                 fixed_effects: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Exact Gaussian NLL via Woodbury (O(n + q^3) instead of O(n^3))."""
    r = data.y
    if beta is not None and data.X is not None:
        r = r - data.X @ beta
    if fixed_effects is not None:
        r = r - fixed_effects
    sigma2 = cov_pars[0]
    comp_vars = cov_pars[1:]
    db = _sigma_b_diag(spec, comp_vars, r.dtype)
    w = data.weights
    n = _num_real(spec, r)
    rmask = data.row_weight
    if w is None:
        ztwz = ztz_matrix(spec, data)
        rw = r if rmask is None else r * rmask
        log_w_sum = 0.0
    else:
        ztwz = ztw_z(spec, data, w)
        rw = w * r if rmask is None else w * r * rmask
        log_w_sum = (jnp.sum(jnp.log(w)) if rmask is None
                     else jnp.sum(jnp.log(w) * rmask))
    # M = sigma2 Sigma_b^-1 + Z'WZ  (Psi = sigma2 diag(1/w) + Z Sigma_b Z')
    M = ztwz + jnp.diag(sigma2 / db)
    L = jnp.linalg.cholesky(M)
    ztr = zt_mul(spec, data, rw)
    t = jax.scipy.linalg.solve_triangular(L, ztr, lower=True)
    quad = (jnp.dot(r, rw) - jnp.dot(t, t)) / sigma2
    # logdet Psi = n log s2 - sum log w + logdet(M) - logdet(s2 Sigma_b^-1)
    logdet = (n * jnp.log(sigma2) - log_w_sum
              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
              - jnp.sum(jnp.log(sigma2 / db)))
    return 0.5 * (quad + logdet + n * LOG_2PI)


@partial(jax.jit, static_argnums=(0,))
def nll_profiled(spec: ModelSpec, data: ModelData, ratio_vars: jnp.ndarray,
                 beta: Optional[jnp.ndarray] = None,
                 fixed_effects: Optional[jnp.ndarray] = None):
    """Profiled-nugget Woodbury NLL: ratio_vars = comp_vars / sigma2.
    Returns (nll, sigma2_hat)."""
    r = data.y
    if beta is not None and data.X is not None:
        r = r - data.X @ beta
    if fixed_effects is not None:
        r = r - fixed_effects
    db = _sigma_b_diag(spec, ratio_vars, r.dtype)
    w = data.weights
    n = _num_real(spec, r)
    rmask = data.row_weight
    if w is None:
        ztwz = ztz_matrix(spec, data)
        rw = r if rmask is None else r * rmask
        log_w_sum = 0.0
    else:
        ztwz = ztw_z(spec, data, w)
        rw = w * r if rmask is None else w * r * rmask
        log_w_sum = (jnp.sum(jnp.log(w)) if rmask is None
                     else jnp.sum(jnp.log(w) * rmask))
    M = ztwz + jnp.diag(1.0 / db)
    L = jnp.linalg.cholesky(M)
    ztr = zt_mul(spec, data, rw)
    t = jax.scipy.linalg.solve_triangular(L, ztr, lower=True)
    yt_psit_inv_y = jnp.dot(r, rw) - jnp.dot(t, t)
    sigma2_hat = yt_psit_inv_y / n
    logdet_tilde = (2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
                    + jnp.sum(jnp.log(db)) - log_w_sum)
    nll = 0.5 * (n * (jnp.log(sigma2_hat) + LOG_2PI + 1.0) + logdet_tilde)
    return nll, sigma2_hat


@partial(jax.jit, static_argnums=(0,))
def nll_profiled_value_and_grad(spec, data, log_ratio_vars, beta=None,
                                fixed_effects=None):
    def f(th):
        nll, s2 = nll_profiled(spec, data, jnp.exp(th), beta, fixed_effects)
        return nll, s2
    (v, s2), g = jax.value_and_grad(f, has_aux=True)(log_ratio_vars)
    return v, g, s2


@partial(jax.jit, static_argnums=(0,))
def psi_inv_mul(spec: ModelSpec, data: ModelData, cov_pars: jnp.ndarray,
                R: jnp.ndarray) -> jnp.ndarray:
    """Psi^-1 R via Woodbury; R [n] or [n, k]."""
    sigma2 = cov_pars[0]
    db = _sigma_b_diag(spec, cov_pars[1:], R.dtype)
    ztz = ztz_matrix(spec, data)
    M = ztz + jnp.diag(sigma2 / db)
    L = jnp.linalg.cholesky(M)
    if R.ndim == 1:
        ztr = zt_mul(spec, data, R)
        sol = jax.scipy.linalg.cho_solve((L, True), ztr)
        return (R - z_mul(spec, data, sol)) / sigma2
    ztr = jax.vmap(lambda col: zt_mul(spec, data, col), in_axes=1,
                   out_axes=1)(R)
    sol = jax.scipy.linalg.cho_solve((L, True), ztr)
    zs = jax.vmap(lambda col: z_mul(spec, data, col), in_axes=1,
                  out_axes=1)(sol)
    return (R - zs) / sigma2


@partial(jax.jit, static_argnums=(0,))
def posterior_b_gaussian(spec: ModelSpec, data: ModelData,
                         cov_pars: jnp.ndarray, r: jnp.ndarray):
    """Posterior of the stacked random effects b | y (ridge form):

    precision = Z'Z/sigma2 + Sigma_b^-1 = M / sigma2,
    mean = M^-1 Z'r,  cov = sigma2 M^-1.
    Returns (mean [q], postcov [q, q]).
    """
    sigma2 = cov_pars[0]
    db = _sigma_b_diag(spec, cov_pars[1:], r.dtype)
    ztz = ztz_matrix(spec, data)
    M = ztz + jnp.diag(sigma2 / db)
    L = jnp.linalg.cholesky(M)
    ztr = zt_mul(spec, data, r)
    mean = jax.scipy.linalg.cho_solve((L, True), ztr)
    postcov = sigma2 * jax.scipy.linalg.cho_solve(
        (L, True), jnp.eye(M.shape[0], dtype=r.dtype))
    return mean, postcov


@partial(jax.jit, static_argnums=(0, 4))
def predict_from_posterior(spec: ModelSpec, b_mean: jnp.ndarray,
                           postcov: jnp.ndarray, comp_vars: jnp.ndarray,
                           want_cov: bool, pred_codes: jnp.ndarray,
                           pred_weights: jnp.ndarray):
    """Latent prediction at new rows given the posterior of b.

    pred_codes [np, ncomp]: level index per component (>= num_groups marks an
    unseen level -> zero mean, prior variance, independent). pred_weights
    [np, ncomp]: slope covariate multipliers (1 for intercepts).
    Returns (mean [np], var [np], cov [np, np] or None).
    """
    offsets, sizes, q = grouped_layout(spec)
    np_rows = pred_codes.shape[0]
    ncomp = len(spec.components)
    mean = jnp.zeros(np_rows, b_mean.dtype)
    seen_masks = []
    stacked_idx = []
    for j in range(ncomp):
        codes = pred_codes[:, spec.components[j].code_col]
        seen = codes < sizes[j]
        idx = offsets[j] + jnp.minimum(codes, sizes[j] - 1)
        seen_masks.append(seen)
        stacked_idx.append(idx)
        mean = mean + jnp.where(seen, pred_weights[:, j] * b_mean[idx], 0.0)
    # covariance: sum over component pairs of gathered postcov entries for
    # seen levels; unseen contribute prior variance (and correlate only with
    # the same unseen label -> handled via code equality)
    def pair_cov(p, r):
        c = jnp.zeros((), b_mean.dtype) if False else 0.0
        total = 0.0
        for j1 in range(ncomp):
            for j2 in range(ncomp):
                s1 = seen_masks[j1][p]
                s2 = seen_masks[j2][r]
                both_seen = jnp.logical_and(s1, s2)
                entry = postcov[stacked_idx[j1][p], stacked_idx[j2][r]]
                contrib = jnp.where(both_seen, entry, 0.0)
                # unseen-level prior: same component, same (unseen) label
                if j1 == j2:
                    same_unseen = jnp.logical_and(
                        jnp.logical_not(s1),
                        pred_codes[p, j1] == pred_codes[r, j1])
                    contrib = contrib + jnp.where(same_unseen,
                                                  comp_vars[j1], 0.0)
                total = total + (pred_weights[p, j1] * pred_weights[r, j2]
                                 * contrib)
        return total

    if want_cov:
        ii = jnp.arange(np_rows)
        cov = jax.vmap(lambda p: jax.vmap(lambda r: pair_cov(p, r))(ii))(ii)
        var = jnp.diagonal(cov)
        return mean, var, cov
    ii = jnp.arange(np_rows)
    var = jax.vmap(lambda p: pair_cov(p, p))(ii)
    return mean, var, None


# ---------------------------------------------------------------------------
# Laplace in b-space for grouped REs (non-Gaussian)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def find_mode_grouped(lik_name: str, spec: ModelSpec, data: ModelData,
                      db: jnp.ndarray, F: jnp.ndarray, aux: jnp.ndarray):
    """Mode of sum logp(y | F + Zb) - 1/2 b' Sigma_b^-1 b, b in R^q."""
    return _find_mode_grouped_impl(lik_name, spec, data, db, F, aux)


def _find_mode_grouped_impl(lik_name, spec, data, db, F, aux):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    fam = lk.get_family(lik_name)
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    y = data.y
    q = db.shape[0]

    def obj(b):
        loc = F + z_mul(spec, data, b)
        return jnp.sum(ll_fn(y, loc, aux)) - 0.5 * jnp.sum(b * b / db)

    def step(state):
        b, psi, it, conv = state
        loc = F + z_mul(spec, data, b)
        d1 = d1_fn(y, loc, aux)
        w = jnp.maximum(-d2_fn(y, loc, aux), 1e-10)
        g = zt_mul(spec, data, d1) - b / db
        # H = Z'WZ + Sigma_b^-1
        H = ztw_z(spec, data, w) + jnp.diag(1.0 / db)
        delta = jnp.linalg.solve(H, g)

        def psi_at(t):
            return obj(b + t * delta)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < 60)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b_new = b + t * delta
        conv = jnp.abs(psi_new - psi) < 1e-9 * (jnp.abs(psi) + 1e-10)
        return b_new, psi_new, it + 1, conv

    def cond(state):
        _, _, it, conv = state
        return jnp.logical_and(it < 100, jnp.logical_not(conv))

    b0 = jnp.zeros(q, db.dtype)
    b, _, _, _ = jax.lax.while_loop(cond, step, (b0, obj(b0), 0, False))
    return b


@partial(jax.jit, static_argnums=(0,))
def ztw_z(spec: ModelSpec, data: ModelData, w: jnp.ndarray) -> jnp.ndarray:
    """Z' diag(w) Z [q, q]."""
    offsets, sizes, q = grouped_layout(spec)
    zw = _z_weights(spec, data)
    out = jnp.zeros((q, q), w.dtype)
    for j1, c1 in enumerate(spec.components):
        codes1 = data.group_codes[:, c1.code_col] + offsets[j1]
        for j2, c2 in enumerate(spec.components):
            codes2 = data.group_codes[:, c2.code_col] + offsets[j2]
            out = out.at[codes1, codes2].add(zw[j1] * zw[j2] * w)
    return out


def _find_mode_grouped_fwd(lik_name, spec, data, db, F, aux):
    b = _find_mode_grouped_impl(lik_name, spec, data, db, F, aux)
    return b, (data, db, F, aux, b)


def _find_mode_grouped_bwd(lik_name, spec, res, v):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    fam = lk.get_family(lik_name)
    data, db, F, aux, b = res
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    y = data.y
    loc = F + z_mul(spec, data, b)
    w = -d2_fn(y, loc, aux)
    # g(b) = b/db - Z' d1(y, F+Zb); dg/db = diag(1/db) + Z'WZ (symmetric)
    H = ztw_z(spec, data, w) + jnp.diag(1.0 / db)
    lam = jnp.linalg.solve(H, v)

    def g(db_, F_, aux_):
        d1 = d1_fn(y, F_ + z_mul(spec, data, b), aux_)
        return b / db_ - zt_mul(spec, data, d1)

    _, vjp = jax.vjp(g, db, F, aux)
    gdb, gF, gaux = vjp(-lam)
    return None, gdb, gF, gaux


find_mode_grouped.defvjp(_find_mode_grouped_fwd, _find_mode_grouped_bwd)


@partial(jax.jit, static_argnums=(0,))
def nll_laplace(spec: ModelSpec, data: ModelData, cov_pars: jnp.ndarray,
                aux_pars: Optional[jnp.ndarray],
                beta: Optional[jnp.ndarray] = None,
                fixed_effects: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Laplace NLL for grouped REs in b-space:

    nll = -loglik(mode) + 1/2 b'Sigma_b^-1 b
          + 1/2 logdet(I_q + Sigma_b Z'WZ).
    """
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(spec.likelihood)
    n = data.y.shape[0]
    F = jnp.zeros(n, data.y.dtype)
    if beta is not None and data.X is not None:
        F = F + data.X @ beta
    if fixed_effects is not None:
        F = F + fixed_effects
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), data.y.dtype)
    from gpboost_tpu.models.laplace import _weighted_fns
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    db = _sigma_b_diag(spec, cov_pars, data.y.dtype)
    b = find_mode_grouped(spec.likelihood, spec, data, db, F, aux)
    loc = F + z_mul(spec, data, b)
    w = -d2_fn(data.y, loc, aux)
    loglik = jnp.sum(ll_fn(data.y, loc, aux))
    quad = jnp.sum(b * b / db)
    A = jnp.eye(db.shape[0], dtype=db.dtype) + db[:, None] * ztw_z(spec, data, w)
    sign, logdet = jnp.linalg.slogdet(A)
    return -(loglik - 0.5 * quad - 0.5 * logdet)


@partial(jax.jit, static_argnums=(0,))
def laplace_mode_and_w(spec, data, cov_pars, aux_pars, fixed_effects):
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(spec.likelihood)
    n = data.y.shape[0]
    F = (jnp.zeros(n, data.y.dtype) if fixed_effects is None
         else fixed_effects)
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), data.y.dtype)
    db = _sigma_b_diag(spec, cov_pars, data.y.dtype)
    b = find_mode_grouped(spec.likelihood, spec, data, db, F, aux)
    loc = F + z_mul(spec, data, b)
    from gpboost_tpu.models.laplace import _weighted_fns
    _, _, d2_fn = _weighted_fns(fam, _eff_weights(data))
    w = -d2_fn(data.y, loc, aux)
    return b, w, db


@partial(jax.jit, static_argnums=(0,))
def posterior_b_laplace(spec, data, cov_pars, aux_pars, fixed_effects):
    """Laplace posterior of b: mean = mode, cov = (Z'WZ + Sigma_b^-1)^-1."""
    b, w, db = laplace_mode_and_w(spec, data, cov_pars, aux_pars,
                                  fixed_effects)
    H = ztw_z(spec, data, w) + jnp.diag(1.0 / db)
    Hinv = jnp.linalg.inv(H)
    return b, Hinv


# ---------------------------------------------------------------------------
# iterative path (matrix_inversion_method="iterative"): matrix-free CG +
# stochastic Lanczos logdet in the q-dimensional random-effects space.
# TPU redesign of the reference's ``CGRandomEffectsVec`` with SSOR / zero-
# fill-in-incomplete-Cholesky preconditioning (``CG_utils.h:979,1081``):
# sparse triangular solves have no efficient TPU mapping, so the
# preconditioner is the exact DIAGONAL of the system matrix, and
# Z' diag(w) Z v is two O(n) gather/scatter passes — no [q, q] matrix, no
# O(q^3) factorization. Scales to many groups x crossed effects.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def ztw_z_diag(spec: ModelSpec, data: ModelData,
               w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """diag(Z' diag(w) Z) [q] (only same-component/level pairs hit the
    diagonal of the stacked layout)."""
    offsets, sizes, q = grouped_layout(spec)
    zw = _z_weights(spec, data)
    parts = []
    for j, comp in enumerate(spec.components):
        codes = data.group_codes[:, comp.code_col]
        contrib = zw[j] * zw[j] if w is None else zw[j] * zw[j] * w
        parts.append(jnp.zeros(sizes[j], zw.dtype).at[codes].add(contrib))
    return jnp.concatenate(parts)


def _mv_sys(spec, data, w_obs, shift, V):
    """(Z' diag(w_obs) Z + diag(shift)) V for V [q] or [q, k]."""
    def one(v):
        zv = z_mul(spec, data, v)
        if w_obs is not None:
            zv = zv * w_obs
        return zt_mul(spec, data, zv) + shift * v

    if V.ndim == 1:
        return one(V)
    return jax.vmap(one, in_axes=1, out_axes=1)(V)


def _quadform_cg(matvec, u, pre_solve, tol, max_iter):
    """Differentiable u' M^-1 u without differentiating the CG loop:
    the stationary surrogate 2 u'v - v'Mv at v = stop_grad(M^-1 u) has the
    exact value AND exact first derivatives (its v-gradient vanishes at the
    solution)."""
    from gpboost_tpu.ops import cg as cgops
    sol, _ = cgops.pcg(matvec, jax.lax.stop_gradient(u), pre_solve,
                       tol=tol, max_iter=max_iter)
    v = jax.lax.stop_gradient(sol)
    return 2.0 * jnp.dot(u, v) - jnp.dot(v, matvec(v))


@partial(jax.jit, static_argnums=(0, 5, 6))
def nll_profiled_iterative(spec: ModelSpec, data: ModelData,
                           ratio_vars: jnp.ndarray, beta=None,
                           fixed_effects=None, num_rand_vec_trace: int = 50,
                           lanczos_steps: int = 50, cg_tol: float = 1e-6,
                           cg_max_iter: int = 1000, seed: int = 1):
    """Profiled-nugget Gaussian NLL, matrix-free: CG for the Woodbury solve,
    stochastic Lanczos quadrature for logdet(M). Returns (nll, sigma2_hat).
    """
    from gpboost_tpu.ops import cg as cgops
    r = data.y
    if beta is not None and data.X is not None:
        r = r - data.X @ beta
    if fixed_effects is not None:
        r = r - fixed_effects
    db = _sigma_b_diag(spec, ratio_vars, r.dtype)
    w = data.weights
    n = _num_real(spec, r)
    rmask = data.row_weight
    rw = r if w is None else w * r
    if rmask is not None:
        rw = rw * rmask
    log_w_sum = (0.0 if w is None else
                 (jnp.sum(jnp.log(w)) if rmask is None
                  else jnp.sum(jnp.log(w) * rmask)))
    shift = 1.0 / db
    matvec = lambda V: _mv_sys(spec, data, w, shift, V)  # noqa: E731
    diag_M = ztw_z_diag(spec, data, w) + shift
    pre = cgops.JacobiPreconditioner(
        jax.lax.stop_gradient(jnp.maximum(diag_M, 1e-10)))
    ztr = zt_mul(spec, data, rw)
    quadform = _quadform_cg(matvec, ztr, pre.solve, cg_tol, cg_max_iter)
    yt_psit_inv_y = jnp.dot(r, rw) - quadform
    sigma2_hat = yt_psit_inv_y / n
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    Z = pre.sample_probes(k1, num_rand_vec_trace)
    Zg = cgops.rademacher_probes(k2, db.shape[0], num_rand_vec_trace,
                                 r.dtype)
    logdet_M = cgops.stochastic_logdet_grad(
        matvec, None, Z, lanczos_steps, pre.solve, pre.logdet(),
        cg_tol, cg_max_iter, probes_grad=Zg)
    logdet_tilde = logdet_M + jnp.sum(jnp.log(db)) - log_w_sum
    nll = 0.5 * (n * (jnp.log(sigma2_hat) + LOG_2PI + 1.0) + logdet_tilde)
    return nll, sigma2_hat


@partial(jax.jit, static_argnums=(0, 5, 6))
def nll_profiled_iterative_value_and_grad(spec, data, log_ratio_vars,
                                          beta=None, fixed_effects=None,
                                          num_rand_vec_trace: int = 50,
                                          lanczos_steps: int = 50,
                                          cg_tol: float = 1e-6,
                                          cg_max_iter: int = 1000,
                                          seed: int = 1):
    def f(th):
        nll, s2 = nll_profiled_iterative(
            spec, data, jnp.exp(th), beta, fixed_effects,
            num_rand_vec_trace, lanczos_steps, cg_tol, cg_max_iter, seed)
        return nll, s2

    (v, s2), g = jax.value_and_grad(f, has_aux=True)(log_ratio_vars)
    return v, g, s2


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def find_mode_grouped_cg(lik_name: str, spec: ModelSpec, data: ModelData,
                         db: jnp.ndarray, F: jnp.ndarray, aux: jnp.ndarray):
    """Matrix-free Newton-CG posterior mode in b-space (the iterative
    counterpart of :func:`find_mode_grouped`; reference
    ``CGRandomEffectsVec``-driven mode finding, CG_utils.h:979)."""
    return _find_mode_grouped_cg_impl(lik_name, spec, data, db, F, aux)


def _find_mode_grouped_cg_impl(lik_name, spec, data, db, F, aux):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    y = data.y
    q = db.shape[0]

    def obj(b):
        loc = F + z_mul(spec, data, b)
        return jnp.sum(ll_fn(y, loc, aux)) - 0.5 * jnp.sum(b * b / db)

    def step(state):
        b, psi, it, conv = state
        loc = F + z_mul(spec, data, b)
        d1 = d1_fn(y, loc, aux)
        w = jnp.maximum(-d2_fn(y, loc, aux), 1e-10)
        g = zt_mul(spec, data, d1) - b / db
        pre_d = jnp.maximum(ztw_z_diag(spec, data, w) + 1.0 / db, 1e-10)
        delta, _ = cgops.pcg(
            lambda V: _mv_sys(spec, data, w, 1.0 / db, V), g,
            lambda R: R / (pre_d[:, None] if R.ndim == 2 else pre_d),
            tol=1e-8, max_iter=1000)

        def psi_at(t):
            return obj(b + t * delta)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < 60)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b_new = b + t * delta
        conv = jnp.abs(psi_new - psi) < 1e-9 * (jnp.abs(psi) + 1e-10)
        return b_new, psi_new, it + 1, conv

    def cond(state):
        _, _, it, conv = state
        return jnp.logical_and(it < 100, jnp.logical_not(conv))

    b0 = jnp.zeros(q, db.dtype)
    b, _, _, _ = jax.lax.while_loop(cond, step, (b0, obj(b0), 0, False))
    return b


def _find_mode_grouped_cg_fwd(lik_name, spec, data, db, F, aux):
    b = _find_mode_grouped_cg_impl(lik_name, spec, data, db, F, aux)
    return b, (data, db, F, aux, b)


def _find_mode_grouped_cg_bwd(lik_name, spec, res, v):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    data, db, F, aux, b = res
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    y = data.y
    loc = F + z_mul(spec, data, b)
    w = -d2_fn(y, loc, aux)
    pre_d = jnp.maximum(ztw_z_diag(spec, data, w) + 1.0 / db, 1e-10)
    lam, _ = cgops.pcg(
        lambda V: _mv_sys(spec, data, w, 1.0 / db, V), v,
        lambda R: R / (pre_d[:, None] if R.ndim == 2 else pre_d),
        tol=1e-10, max_iter=1000)

    def g(db_, F_, aux_):
        d1 = d1_fn(y, F_ + z_mul(spec, data, b), aux_)
        return b / db_ - zt_mul(spec, data, d1)

    _, vjp = jax.vjp(g, db, F, aux)
    gdb, gF, gaux = vjp(-lam)
    return None, gdb, gF, gaux


find_mode_grouped_cg.defvjp(_find_mode_grouped_cg_fwd,
                            _find_mode_grouped_cg_bwd)


@partial(jax.jit, static_argnums=(0, 6, 7))
def nll_laplace_iterative(spec: ModelSpec, data: ModelData,
                          cov_pars: jnp.ndarray,
                          aux_pars: Optional[jnp.ndarray],
                          beta: Optional[jnp.ndarray] = None,
                          fixed_effects: Optional[jnp.ndarray] = None,
                          num_rand_vec_trace: int = 50,
                          lanczos_steps: int = 50, cg_tol: float = 1e-6,
                          cg_max_iter: int = 1000,
                          seed: int = 1) -> jnp.ndarray:
    """Laplace NLL for grouped REs, matrix-free: Newton-CG mode finding +
    stochastic logdet of H = Z'WZ + Sigma_b^-1
    (logdet(I + Sigma_b Z'WZ) = logdet(H) + sum log db)."""
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(spec.likelihood)
    n = data.y.shape[0]
    F = jnp.zeros(n, data.y.dtype)
    if beta is not None and data.X is not None:
        F = F + data.X @ beta
    if fixed_effects is not None:
        F = F + fixed_effects
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), data.y.dtype)
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, _eff_weights(data))
    db = _sigma_b_diag(spec, cov_pars, data.y.dtype)
    b = find_mode_grouped_cg(spec.likelihood, spec, data, db, F, aux)
    loc = F + z_mul(spec, data, b)
    w = -d2_fn(data.y, loc, aux)
    loglik = jnp.sum(ll_fn(data.y, loc, aux))
    quad = jnp.sum(b * b / db)
    matvec = lambda V: _mv_sys(spec, data, w, 1.0 / db, V)  # noqa: E731
    diag_H = ztw_z_diag(spec, data, w) + 1.0 / db
    pre = cgops.JacobiPreconditioner(
        jax.lax.stop_gradient(jnp.maximum(diag_H, 1e-10)))
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    Z = pre.sample_probes(k1, num_rand_vec_trace)
    Zg = cgops.rademacher_probes(k2, db.shape[0], num_rand_vec_trace,
                                 data.y.dtype)
    logdet_H = cgops.stochastic_logdet_grad(
        matvec, None, Z, lanczos_steps, pre.solve, pre.logdet(),
        cg_tol, cg_max_iter, probes_grad=Zg)
    logdet = logdet_H + jnp.sum(jnp.log(db))
    return -(loglik - 0.5 * quad - 0.5 * logdet)


@partial(jax.jit, static_argnums=(0, 6, 7))
def nll_laplace_iterative_value_and_grad(spec, data, cov_pars, aux_pars,
                                         beta, fixed_effects,
                                         num_rand_vec_trace: int = 50,
                                         lanczos_steps: int = 50,
                                         cg_tol: float = 1e-6,
                                         cg_max_iter: int = 1000,
                                         seed: int = 1):
    argnums = [0]
    if aux_pars is not None:
        argnums.append(1)
    if beta is not None:
        argnums.append(2)

    def f(cp, ap, b):
        return nll_laplace_iterative(
            spec, data, cp, ap, b, fixed_effects, num_rand_vec_trace,
            lanczos_steps, cg_tol, cg_max_iter, seed)

    v, grads = jax.value_and_grad(f, argnums=tuple(argnums))(
        cov_pars, aux_pars, beta)
    out = [None, None, None]
    for i, an in enumerate(argnums):
        out[an] = grads[i]
    return v, tuple(out)


@partial(jax.jit, static_argnums=(0, 3, 4))
def posterior_b_gaussian_iterative(spec: ModelSpec, data: ModelData,
                                  cov_pars: jnp.ndarray, nsim: int,
                                  seed: int, r: jnp.ndarray,
                                  cg_tol: float = 1e-8,
                                  cg_max_iter: int = 1000):
    """Iterative Gaussian posterior of b: mean = M^-1 Z'r via CG and draws
    u_k ~ N(0, sigma2 M^-1) via u = sqrt(s2) M^-1 (Z'z1 + sqrt(s2/db) z2)
    (the reference's ``Sample_Posterior_LaplaceApprox_GroupedRE`` sqrt-split
    sampling, likelihoods.h:6852, on the Gaussian Woodbury system).
    Returns (b_mean [q], draws [q, nsim])."""
    from gpboost_tpu.ops import cg as cgops
    sigma2 = cov_pars[0]
    db = _sigma_b_diag(spec, cov_pars[1:], r.dtype)
    q = db.shape[0]
    n = r.shape[0]
    shift = sigma2 / db
    matvec = lambda V: _mv_sys(spec, data, None, shift, V)  # noqa: E731
    diag_M = ztw_z_diag(spec, data) + shift
    pre = jnp.maximum(diag_M, 1e-10)
    solve = lambda B: cgops.pcg(  # noqa: E731
        matvec, B, lambda R: R / (pre[:, None] if R.ndim == 2 else pre),
        tol=cg_tol, max_iter=cg_max_iter)[0]
    b_mean = solve(zt_mul(spec, data, r))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    z1 = jax.random.normal(k1, (n, nsim), r.dtype)
    z2 = jax.random.normal(k2, (q, nsim), r.dtype)
    Z = (jax.vmap(lambda col: zt_mul(spec, data, col),
                  in_axes=1, out_axes=1)(z1)
         + jnp.sqrt(shift)[:, None] * z2)          # ~ N(0, M)
    draws = jnp.sqrt(sigma2) * solve(Z)            # ~ N(0, s2 M^-1)
    return b_mean, draws


@partial(jax.jit, static_argnums=(0, 4, 5))
def posterior_b_laplace_iterative(spec, data, cov_pars, aux_pars, nsim: int,
                                  seed: int, fixed_effects=None,
                                  cg_tol: float = 1e-8,
                                  cg_max_iter: int = 1000):
    """Iterative Laplace posterior of b: Newton-CG mode + draws
    u ~ N(0, H^-1), H = Z'WZ + Sigma_b^-1, via H^-1 (Z'sqrt(W) z1 +
    sqrt(Sigma_b^-1) z2) (likelihoods.h:6852)."""
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models.laplace import _weighted_fns
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(spec.likelihood)
    n = data.y.shape[0]
    F = (jnp.zeros(n, data.y.dtype) if fixed_effects is None
         else fixed_effects)
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), data.y.dtype)
    _, _, d2_fn = _weighted_fns(fam, _eff_weights(data))
    db = _sigma_b_diag(spec, cov_pars, data.y.dtype)
    q = db.shape[0]
    b = find_mode_grouped_cg(spec.likelihood, spec, data, db, F, aux)
    w = jnp.maximum(-d2_fn(data.y, F + z_mul(spec, data, b), aux), 1e-10)
    matvec = lambda V: _mv_sys(spec, data, w, 1.0 / db, V)  # noqa: E731
    pre = jnp.maximum(ztw_z_diag(spec, data, w) + 1.0 / db, 1e-10)
    solve = lambda B: cgops.pcg(  # noqa: E731
        matvec, B, lambda R: R / (pre[:, None] if R.ndim == 2 else pre),
        tol=cg_tol, max_iter=cg_max_iter)[0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    z1 = jax.random.normal(k1, (n, nsim), data.y.dtype)
    z2 = jax.random.normal(k2, (q, nsim), data.y.dtype)
    Z = (jax.vmap(lambda col: zt_mul(spec, data, col),
                  in_axes=1, out_axes=1)(jnp.sqrt(w)[:, None] * z1)
         + z2 / jnp.sqrt(db)[:, None])             # ~ N(0, H)
    draws = solve(Z)                               # ~ N(0, H^-1)
    return b, draws


@partial(jax.jit, static_argnums=(0,))
def predict_from_posterior_draws(spec: ModelSpec, b_mean: jnp.ndarray,
                                 draws: jnp.ndarray, comp_vars: jnp.ndarray,
                                 pred_codes: jnp.ndarray,
                                 pred_weights: jnp.ndarray):
    """Latent prediction mean/var from posterior DRAWS (simulation-based
    variances: no [q, q] posterior covariance is ever formed). Unseen levels
    contribute their prior variance. Returns (mean [np], var [np])."""
    offsets, sizes, q = grouped_layout(spec)
    np_rows = pred_codes.shape[0]
    ncomp = len(spec.components)
    mean = jnp.zeros(np_rows, b_mean.dtype)
    sims = jnp.zeros((np_rows, draws.shape[1]), b_mean.dtype)
    var_unseen = jnp.zeros(np_rows, b_mean.dtype)
    for j, comp in enumerate(spec.components):
        codes = pred_codes[:, comp.code_col]
        seen = codes < sizes[j]
        idx = offsets[j] + jnp.minimum(codes, sizes[j] - 1)
        wj = pred_weights[:, j]
        mean = mean + jnp.where(seen, wj * b_mean[idx], 0.0)
        sims = sims + jnp.where(seen, wj, 0.0)[:, None] * draws[idx]
        var_unseen = var_unseen + jnp.where(seen, 0.0,
                                            wj * wj * comp_vars[j])
    var = jnp.mean(sims * sims, axis=1) + var_unseen
    return mean, var


@partial(jax.jit, static_argnums=(0,))
def nll_laplace_value_and_grad(spec, data, cov_pars, aux_pars, beta,
                               fixed_effects):
    argnums = [0]
    if aux_pars is not None:
        argnums.append(1)
    if beta is not None:
        argnums.append(2)

    def f(cp, ap, b):
        return nll_laplace(spec, data, cp, ap, b, fixed_effects)

    v, grads = jax.value_and_grad(f, argnums=tuple(argnums))(
        cov_pars, aux_pars, beta)
    out = [None, None, None]
    for i, an in enumerate(argnums):
        out[an] = grads[i]
    return v, tuple(out)
