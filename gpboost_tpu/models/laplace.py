"""Laplace-approximation engine for non-Gaussian likelihoods (exact/dense path).

TPU-native replacement for the reference's ``Likelihood`` class mode-finding
and marginal-likelihood machinery (``include/GPBoost/likelihoods.h``):

- mode finding = Newton iterations with Armijo line search in a
  ``lax.while_loop`` (reference ``FindModePostRandEffCalcMLL_Stable``,
  ``likelihoods.h:1843-1935``), in the stable parametrization that tracks
  ``a = Sigma^-1 b`` so no explicit inverse is formed (Rasmussen & Williams
  Alg. 3.1).
- gradients w.r.t. covariance parameters, fixed effects F, and auxiliary
  likelihood parameters come from *implicit differentiation* of the mode
  equation (custom_vjp + adjoint solve) composed with plain autodiff of the
  Laplace objective — this reproduces the reference's hand-derived
  third-derivative terms (``CalcGradNegMargLikelihoodLaplaceApprox*``,
  ``likelihoods.h:3261-5560``) exactly, for every model structure.
- predictions: latent mean/variance via the (I + W Sigma) solve
  (``PredictLaplaceApprox*`` :5610-7250) and response-scale moments via
  Gauss-Hermite quadrature (``RespMeanAdaptiveGHQuadrature`` :7857).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from gpboost_tpu import likelihoods as lk
from gpboost_tpu.models.covariance import split_cov_pars, total_re_cov
from gpboost_tpu.models.spec import ModelData, ModelSpec

MAX_NEWTON_IT = 100
NEWTON_TOL = 1e-8
ARMIJO_C = 1e-4
MAX_HALVING = 60


# ---------------------------------------------------------------------------
# mode finding with implicit differentiation
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def find_mode(lik_name: str, sigma, y, F, aux, obs_weights=None):
    """Posterior mode b* of sum w_i log p(y_i|F+b) - 1/2 b' Sigma^-1 b.
    Differentiable w.r.t. (sigma, F, aux) via the implicit function theorem."""
    return _find_mode_fwd_impl(lik_name, sigma, y, F, aux, obs_weights)


def _weighted_fns(fam, obs_weights):
    if obs_weights is not None and fam.log_lik_weighted is not None:
        # binomial-type: weights are trial counts entering the density
        # non-multiplicatively (binomial coefficient / beta functions)
        def ll(y, l, a):
            return fam.log_lik_weighted(y, l, a, obs_weights)

        def d1(y, l, a):
            return jax.grad(lambda lo: jnp.sum(ll(y, lo, a)))(l)

        def d2(y, l, a):
            out = jax.grad(lambda lo: jnp.sum(d1(y, lo, a)))(l)
            if fam.clip_information:
                out = jnp.minimum(out, 0.0)
            return out

        return ll, d1, d2
    if obs_weights is None:
        return fam.log_lik, fam.d_loc, fam.d2_loc
    return (lambda y, l, a: obs_weights * fam.log_lik(y, l, a),
            lambda y, l, a: obs_weights * fam.d_loc(y, l, a),
            lambda y, l, a: obs_weights * fam.d2_loc(y, l, a))


def _find_mode_fwd_impl(lik_name, sigma, y, F, aux, obs_weights=None):
    fam = lk.get_family(lik_name)
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, obs_weights)
    n = y.shape[0]
    dtype = sigma.dtype

    def loglik_sum(b):
        return jnp.sum(ll_fn(y, F + b, aux))

    def newton_step(state):
        b, a, psi, it, step_ok = state
        loc = F + b
        d1 = d1_fn(y, loc, aux)
        w = -d2_fn(y, loc, aux)
        w_safe = jnp.maximum(w, 1e-10)  # quasi-Newton safeguard for
        # non-log-concave families (reference: fisher_laplace variant)
        sw = jnp.sqrt(w_safe)
        c = w_safe * b + d1
        sc = sigma @ c
        B = jnp.eye(n, dtype=dtype) + sw[:, None] * sigma * sw[None, :]
        L = jnp.linalg.cholesky(B)
        t0 = solve_triangular(L, sw * sc, lower=True)
        t1 = solve_triangular(L.T, t0, lower=False)
        a_new = c - sw * t1
        b_new = sigma @ a_new

        # Armijo backtracking on psi(b) = loglik - 1/2 a'b, a = Sigma^-1 b
        db = b_new - b
        da = a_new - a

        def psi_at(t):
            bt = b + t * db
            at = a + t * da
            return loglik_sum(bt) - 0.5 * jnp.dot(at, bt)

        def halving_body(hs):
            t, _, k = hs
            return (t * 0.5, psi_at(t * 0.5), k + 1)

        def halving_cond(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < MAX_HALVING)

        t_fin, psi_fin, _ = jax.lax.while_loop(
            halving_cond, halving_body, (1.0, psi_at(1.0), 0))
        b_out = b + t_fin * db
        a_out = a + t_fin * da
        converged = jnp.abs(psi_fin - psi) < NEWTON_TOL * (jnp.abs(psi) + 1e-10)
        return (b_out, a_out, psi_fin, it + 1, converged)

    def cond(state):
        _, _, _, it, converged = state
        return jnp.logical_and(it < MAX_NEWTON_IT, jnp.logical_not(converged))

    b0 = jnp.zeros(n, dtype=dtype)
    psi0 = loglik_sum(b0)
    b, a, psi, it, _ = jax.lax.while_loop(
        cond, newton_step, (b0, b0, psi0, 0, False))
    return b


def _find_mode_fwd(lik_name, sigma, y, F, aux, obs_weights=None):
    b = _find_mode_fwd_impl(lik_name, sigma, y, F, aux, obs_weights)
    return b, (sigma, y, F, aux, b, obs_weights)


def _find_mode_bwd(lik_name, res, v):
    """Adjoint: solve (I + W Sigma) lam = v, then pull back through
    g(b; sigma, F, aux) = b - Sigma d1(y, F+b, aux)."""
    sigma, y, F, aux, b, obs_weights = res
    fam = lk.get_family(lik_name)
    _, d1_fn, d2_fn = _weighted_fns(fam, obs_weights)
    n = b.shape[0]
    loc = F + b
    w = -d2_fn(y, loc, aux)
    # dg/db = I + Sigma W; its transpose is I + W Sigma
    M_T = jnp.eye(n, dtype=sigma.dtype) + w[:, None] * sigma
    lam = jnp.linalg.solve(M_T, v)

    def g(sigma_, F_, aux_):
        d1 = d1_fn(y, F_ + b, aux_)
        return b - sigma_ @ d1

    _, vjp = jax.vjp(g, sigma, F, aux)
    gs, gF, gaux = vjp(-lam)
    return gs, jnp.zeros_like(y), gF, gaux, None


find_mode.defvjp(_find_mode_fwd, _find_mode_bwd)


# ---------------------------------------------------------------------------
# precision-parametrized mode finding (Vecchia and other sparse-precision
# structures): solve  Q b = d1(y, F + b)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def find_mode_prec(lik_name: str, Q, y, F, aux):
    """Posterior mode with latent *precision* Q (= Sigma^-1). Differentiable
    w.r.t. (Q, F, aux) via implicit differentiation."""
    return _find_mode_prec_impl(lik_name, Q, y, F, aux)


def _find_mode_prec_impl(lik_name, Q, y, F, aux):
    fam = lk.get_family(lik_name)
    n = y.shape[0]
    dtype = Q.dtype

    def objective(b):
        return jnp.sum(fam.log_lik(y, F + b, aux)) - 0.5 * jnp.dot(b, Q @ b)

    def newton_step(state):
        b, psi, it, conv = state
        loc = F + b
        d1 = fam.d_loc(y, loc, aux)
        w = jnp.maximum(-fam.d2_loc(y, loc, aux), 1e-10)
        M = Q + jnp.diag(w)
        delta = jnp.linalg.solve(M, d1 - Q @ b)

        def psi_at(t):
            return objective(b + t * delta)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < MAX_HALVING)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b_new = b + t * delta
        conv = jnp.abs(psi_new - psi) < NEWTON_TOL * (jnp.abs(psi) + 1e-10)
        return b_new, psi_new, it + 1, conv

    def cond(state):
        _, _, it, conv = state
        return jnp.logical_and(it < MAX_NEWTON_IT, jnp.logical_not(conv))

    b0 = jnp.zeros(n, dtype)
    b, _, _, _ = jax.lax.while_loop(cond, newton_step,
                                    (b0, objective(b0), 0, False))
    return b


def _find_mode_prec_fwd(lik_name, Q, y, F, aux):
    b = _find_mode_prec_impl(lik_name, Q, y, F, aux)
    return b, (Q, y, F, aux, b)


def _find_mode_prec_bwd(lik_name, res, v):
    Q, y, F, aux, b = res
    fam = lk.get_family(lik_name)
    loc = F + b
    w = -fam.d2_loc(y, loc, aux)
    # g(b) = Q b - d1; dg/db = Q + W (symmetric)
    lam = jnp.linalg.solve(Q + jnp.diag(w), v)

    def g(Q_, F_, aux_):
        return Q_ @ b - fam.d_loc(y, F_ + b, aux_)

    _, vjp = jax.vjp(g, Q, F, aux)
    gQ, gF, gaux = vjp(-lam)
    return gQ, jnp.zeros_like(y), gF, gaux


find_mode_prec.defvjp(_find_mode_prec_fwd, _find_mode_prec_bwd)


# ---------------------------------------------------------------------------
# Laplace-approximate negative log marginal likelihood
# ---------------------------------------------------------------------------

def _laplace_nll_from_sigma(lik_name, sigma, y, F, aux, obs_weights=None):
    fam = lk.get_family(lik_name)
    ll_fn, d1_fn, d2_fn = _weighted_fns(fam, obs_weights)
    n = y.shape[0]
    b = find_mode(lik_name, sigma, y, F, aux, obs_weights)
    loc = F + b
    d1 = d1_fn(y, loc, aux)
    w = -d2_fn(y, loc, aux)
    loglik = jnp.sum(ll_fn(y, loc, aux))
    # at the mode Sigma^-1 b = d1, so b' Sigma^-1 b = b . d1
    quad = jnp.dot(b, d1)
    # logdet(I + W Sigma) via LU (W may be negative for t/beta likelihoods)
    M = jnp.eye(n, dtype=sigma.dtype) + w[:, None] * sigma
    sign, logdet = jnp.linalg.slogdet(M)
    return -(loglik - 0.5 * quad - 0.5 * logdet)


@partial(jax.jit, static_argnums=(0,))
def neg_log_marginal_likelihood(spec: ModelSpec, data: ModelData,
                                cov_pars: jnp.ndarray,
                                aux_pars: Optional[jnp.ndarray],
                                beta: Optional[jnp.ndarray] = None,
                                fixed_effects: Optional[jnp.ndarray] = None):
    """Laplace-approximate NLL (``EvalNegLogLikelihood`` non-Gaussian branch,
    ``re_model_template.h:2646`` -> ``likelihoods.h`` mode finders)."""
    _, comp_pars = split_cov_pars(spec, cov_pars)
    sigma = total_re_cov(spec, data, comp_pars)
    n = data.y.shape[0]
    F = jnp.zeros(n, dtype=sigma.dtype)
    if beta is not None and data.X is not None:
        F = F + data.X @ beta
    if fixed_effects is not None:
        F = F + fixed_effects
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), sigma.dtype)
    return _laplace_nll_from_sigma(spec.likelihood, sigma, data.y, F, aux,
                                   data.weights)


@partial(jax.jit, static_argnums=(0,))
def nll_value_and_grad(spec: ModelSpec, data: ModelData,
                       cov_pars: jnp.ndarray,
                       aux_pars: Optional[jnp.ndarray],
                       beta: Optional[jnp.ndarray],
                       fixed_effects: Optional[jnp.ndarray]):
    """(nll, (d/d cov_pars, d/d aux_pars, d/d beta)) in one compiled call —
    module-level jit so per-boosting-iteration refits hit the cache."""
    argnums = [0]
    args = [cov_pars]
    if aux_pars is not None:
        argnums.append(1)
    if beta is not None:
        argnums.append(2)

    def f(cp, ap, b):
        return neg_log_marginal_likelihood(spec, data, cp, ap, b,
                                           fixed_effects)

    v, grads = jax.value_and_grad(f, argnums=tuple(argnums))(
        cov_pars, aux_pars, beta)
    out = [None, None, None]
    for i, an in enumerate(argnums):
        out[an] = grads[i]
    return v, tuple(out)


# gradient of the NLL w.r.t. the fixed-effects vector F — the boosting
# pseudo-gradient (``CalcGradientF``, ``re_model_template.h:3021``)
@partial(jax.jit, static_argnums=(0,))
def gradient_wrt_F(spec: ModelSpec, data: ModelData, cov_pars: jnp.ndarray,
                   aux_pars: Optional[jnp.ndarray],
                   fixed_effects: jnp.ndarray):
    def f(fe):
        return neg_log_marginal_likelihood(spec, data, cov_pars, aux_pars,
                                           None, fe)
    return jax.grad(f)(fixed_effects)


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------

_GH_DEG = 30
_GH_NODES, _GH_WEIGHTS = np.polynomial.hermite_e.hermegauss(_GH_DEG)
_GH_W_NORM = _GH_WEIGHTS / math.sqrt(2.0 * math.pi)
# physicists' Hermite (weight e^{-x^2}) + adaptive weights w_j * e^{x_j^2}
_GH_PHYS_NODES, _GH_PHYS_WEIGHTS = np.polynomial.hermite.hermgauss(_GH_DEG)
_GH_LOG_ADAPT_W = np.log(_GH_PHYS_WEIGHTS) + _GH_PHYS_NODES ** 2


@partial(jax.jit, static_argnums=(0,))
def test_nll_adaptive_gh(lik_name: str, y, pred_mean, pred_var, aux):
    """Per-point predictive NLL -log p(y_i) with p(y) = ∫ p(y|b) N(b; mu_i,
    var_i) db by adaptive Gauss-Hermite quadrature
    (``TestNegLogLikelihoodAdaptiveGHQuadrature``, likelihoods.h:7931):
    Newton mode-finding of the integrand, then GH recentered at the mode with
    scale 1/sqrt(information), evaluated in log space for stability."""
    fam = lk.get_family(lik_name)
    sigma2_inv = 1.0 / pred_var

    def newton(_, m):
        d1 = fam.d_loc(y, m, aux)
        info = -fam.d2_loc(y, m, aux)
        upd = (d1 - sigma2_inv * (m - pred_mean)) / (-info - sigma2_inv)
        return m - upd

    mode = jax.lax.fori_loop(0, 100, newton, jnp.zeros_like(pred_mean))
    info_m = -fam.d2_loc(y, mode, aux)
    sqrt2_sigma_hat = jnp.sqrt(2.0 / (info_m + sigma2_inv))
    nodes = jnp.asarray(_GH_PHYS_NODES, pred_mean.dtype)
    log_w = jnp.asarray(_GH_LOG_ADAPT_W, pred_mean.dtype)
    x = mode[:, None] + sqrt2_sigma_hat[:, None] * nodes[None, :]  # [n, Q]
    ll = fam.log_lik(y[:, None], x, aux)
    z = jnp.sqrt(sigma2_inv)[:, None] * (x - pred_mean[:, None])
    log_gauss = -0.5 * z * z - 0.5 * math.log(2.0 * math.pi)
    log_lik = jax.scipy.special.logsumexp(log_w[None, :] + ll + log_gauss,
                                          axis=1)
    log_lik += jnp.log(sqrt2_sigma_hat) + 0.5 * jnp.log(sigma2_inv)
    return -log_lik


def _response_moments(lik_name, mu, var, aux):
    """E[mean(y)|latent ~ N(mu, var)] and Var via Gauss-Hermite quadrature
    (``PredictResponse``/``RespMeanAdaptiveGHQuadrature``, likelihoods.h:7526).
    Probit uses the closed form Phi(mu/sqrt(1+var)); t / beta_binomial /
    zero_inflated_gamma / zero_censored_power_transformed_normal follow the
    reference's family-specific formulas (likelihoods.h:7626-7755)."""
    fam = lk.get_family(lik_name)
    var = jnp.maximum(var, 0.0)
    if lik_name in ("bernoulli_probit", "binomial_probit"):
        from jax.scipy.special import ndtr
        p = ndtr(mu / jnp.sqrt(1.0 + var))
        return p, p * (1.0 - p)
    if lik_name in ("t", "t_fix_df"):
        # reference: add scale^2 to the latent variance — the t is treated
        # as a robust-regression tool, not the true response distribution
        # (likelihoods.h:7626-7633)
        return mu, var + aux[0] * aux[0]
    if lik_name == "beta_binomial":
        # second-order delta method, one trial (likelihoods.h:7689-7710)
        p = jax.nn.sigmoid(mu)
        s = p * (1.0 - p)
        mean = p + 0.5 * s * (1.0 - 2.0 * p) * var
        var_of_mean = s * s * var
        s_dd = s * (1.0 - 6.0 * p + 6.0 * p * p)
        mean_of_var = jnp.clip(s + 0.5 * s_dd * var, 0.0, 0.25)
        return mean, var_of_mean + mean_of_var
    if lik_name == "zero_inflated_gamma":
        # lognormal closed forms (likelihoods.h:7711-7734); aux[1] = p0
        k = aux[0]
        p0 = aux[1]
        q = 1.0 - p0
        pm = jnp.exp(mu + 0.5 * var)
        var_of_mean = (jnp.exp(var) - 1.0) * pm * pm
        mean_of_var = ((1.0 + p0 * k) / (q * k)) * jnp.exp(
            2.0 * mu + 2.0 * var)
        return pm, var_of_mean + mean_of_var
    nodes = jnp.asarray(_GH_NODES, mu.dtype)
    wts = jnp.asarray(_GH_W_NORM, mu.dtype)
    if lik_name == "zoctn":
        # Z ~ N(mu, var + sigma^2); y(Z) = censor-0/1 outside (0,1), else
        # sigmoid(a + b logit(Z)) — GH over the widened latent
        # (ZeroOneCensTransNormalMomentGH, likelihoods.h:11517-11547)
        sigma, a, b = aux[0], aux[1], aux[2]
        s = jnp.sqrt(var + sigma * sigma)
        z = mu[:, None] + s[:, None] * nodes[None, :]
        zc = jnp.clip(z, 1e-12, 1.0 - 1e-12)
        yv = jax.nn.sigmoid(a + b * (jnp.log(zc) - jnp.log1p(-zc)))
        yv = jnp.where(z <= 0.0, 0.0, jnp.where(z >= 1.0, 1.0, yv))
        ey = yv @ wts
        ey2 = (yv * yv) @ wts
        return ey, jnp.maximum(ey2 - ey * ey, 0.0)
    if lik_name == "zero_censored_power_transformed_normal":
        # Y = max(0, X)^lambda with X ~ N(mu, var + sigma^2): moments by GH
        # over the widened normal (TruncPowerNormalMomentGH,
        # likelihoods.h:7735-7755)
        sigma, lam = aux[0], aux[1]
        s = jnp.sqrt(var + sigma * sigma)
        x = mu[:, None] + s[:, None] * nodes[None, :]
        xp = jnp.maximum(x, 0.0)
        ey = jnp.power(xp, lam) @ wts
        ey2 = jnp.power(xp, 2.0 * lam) @ wts
        return ey, jnp.maximum(ey2 - ey * ey, 0.0)
    sd = jnp.sqrt(var)
    locs = mu[:, None] + sd[:, None] * nodes[None, :]
    m = fam.response_mean(locs, aux)
    mean = m @ wts
    if fam.response_var is not None:
        v_cond = fam.response_var(locs, aux)
        second = (v_cond + m * m) @ wts
        varr = jnp.maximum(second - mean * mean, 0.0)
    else:
        varr = None
    return mean, varr


@partial(jax.jit, static_argnums=(0, 6, 7, 12))
def predict(spec: ModelSpec, data: ModelData, cov_pars: jnp.ndarray,
            aux_pars: Optional[jnp.ndarray], data_pred: ModelData,
            cross_dists: Optional[jnp.ndarray],
            predict_var: bool, predict_cov_mat: bool,
            pred_dists: Optional[jnp.ndarray] = None,
            beta: Optional[jnp.ndarray] = None,
            fixed_effects: Optional[jnp.ndarray] = None,
            fixed_effects_pred: Optional[jnp.ndarray] = None,
            predict_response: bool = True):
    """Laplace-approximate posterior prediction.

    latent mean_p = Sigma_po d1(mode);  var_p = Sigma_pp -
    Sigma_po W (I + Sigma W)^-1 Sigma_op  (RW 3.27-3.29 /
    ``PredictLaplaceApproxStable``).
    """
    fam = lk.get_family(spec.likelihood)
    _, comp_pars = split_cov_pars(spec, cov_pars)
    sigma = total_re_cov(spec, data, comp_pars)
    n = data.y.shape[0]
    F = jnp.zeros(n, dtype=sigma.dtype)
    if beta is not None and data.X is not None:
        F = F + data.X @ beta
    if fixed_effects is not None:
        F = F + fixed_effects
    aux = aux_pars if aux_pars is not None else jnp.zeros((0,), sigma.dtype)
    b = find_mode(spec.likelihood, sigma, data.y, F, aux)
    loc = F + b
    d1 = fam.d_loc(y := data.y, loc, aux)
    w = -fam.d2_loc(y, loc, aux)

    cross = total_re_cov(spec, data, comp_pars, data2=data_pred,
                         cross_dists=cross_dists)
    mean_latent = cross @ d1
    F_pred = jnp.zeros(mean_latent.shape[0], dtype=sigma.dtype)
    if beta is not None and data_pred.X is not None:
        F_pred = F_pred + data_pred.X @ beta
    if fixed_effects_pred is not None:
        F_pred = F_pred + fixed_effects_pred
    mean_latent = mean_latent + F_pred

    var = None
    cov = None
    if predict_var or predict_cov_mat:
        M = jnp.eye(n, dtype=sigma.dtype) + sigma * w[None, :]
        # quad = Sigma_po W (I + Sigma W)^-1 Sigma_op
        z = jnp.linalg.solve(M, cross.T)          # [n, np]
        quad_full = cross @ (w[:, None] * z)
        from gpboost_tpu.models.gaussian import _prior_var_diag
        if predict_cov_mat:
            pred_self = ModelData(
                y=None, X=None, group_codes=data_pred.group_codes,
                slope_data=data_pred.slope_data, coords=data_pred.coords,
                dists=pred_dists, gp_rand_coef_data=data_pred.gp_rand_coef_data,
                cluster_codes=data_pred.cluster_codes)
            prior = total_re_cov(spec, pred_self, comp_pars)
            cov = prior - quad_full
            var = jnp.diagonal(cov)
        else:
            prior_diag = _prior_var_diag(spec, data_pred, comp_pars)
            var = prior_diag - jnp.diagonal(quad_full)

    if predict_response:
        if var is None:
            # response mean still needs latent variance for the expectation
            M = jnp.eye(n, dtype=sigma.dtype) + sigma * w[None, :]
            z = jnp.linalg.solve(M, cross.T)
            from gpboost_tpu.models.gaussian import _prior_var_diag
            prior_diag = _prior_var_diag(spec, data_pred, comp_pars)
            var_lat = prior_diag - jnp.sum(cross.T * (w[:, None] * z), axis=0)
        else:
            var_lat = var
        mean_resp, var_resp = _response_moments(
            spec.likelihood, mean_latent, jnp.maximum(var_lat, 0.0), aux)
        out_var = var_resp if (predict_var or predict_cov_mat) else None
        return mean_resp, out_var, cov
    return mean_latent, var, cov
