"""Likelihood families for non-Gaussian observation models.

Re-implements the response distributions of the reference's
``include/GPBoost/likelihoods.h`` (parametrizations documented at
``likelihoods.h:10-70``) as elementwise JAX log-densities. First/second/third
derivatives w.r.t. the location parameter — which the reference hand-derives in
``CalcFirstDerivLogLik`` (:8975) / ``CalcInformationLogLik`` (:9477) and the
third-derivative kernels — come from nested autodiff, which yields the same
closed forms exactly.

``location_par`` is always the sum of fixed and random effects; the response
mean is linked via exp() (count/positive families), the logistic function
(bernoulli_logit, beta, beta_binomial), the normal CDF (probit families), or
identity (gaussian, t).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, log_ndtr, ndtr
from jax.scipy.stats import norm as jnorm

LOG_2PI = math.log(2.0 * math.pi)


def _canonical(name: str) -> str:
    aliases = {
        "binary": "bernoulli_probit", "binary_probit": "bernoulli_probit",
        "binary_logit": "bernoulli_logit", "regression": "gaussian",
        # NB: "zoctn" (zero-ONE-censored transformed normal) is its own
        # family, distinct from zero_censored_power_transformed_normal
        "gamma_zero_inflated": "zero_inflated_gamma",
        "betabinomial": "beta_binomial",
        "student_t": "t", "student-t": "t",
    }
    return aliases.get(name, name)


def parse_likelihood_variants(name: str):
    """Strip approximation-type suffixes from a likelihood name
    (``ParseLikelihoodAliasApproximationType``, likelihoods.h:8052):
    returns (canonical base name, approximation_type or None)."""
    approx = None
    for suf, val in (("_fisher_laplace_combined", "laplace"),
                     ("_fisher-laplace", "fisher_laplace"),
                     ("_fisher_laplace", "fisher_laplace"),
                     ("_lls_laplace", "lss_laplace"),
                     ("_quasi-newton", "laplace"),
                     ("_quasi_newton", "laplace")):
        if name.endswith(suf):
            approx = val
            name = name[:-len(suf)]
            break
    return _canonical(name), approx


@dataclass(frozen=True)
class LikelihoodFamily:
    """One response family: elementwise log-density + metadata.

    ``log_lik(y, loc, aux) -> [n]`` where ``aux`` are the additional
    parameters on the ORIGINAL scale (e.g. gamma shape). The reference stores
    them log-transformed for optimization; the transform lives in the fit
    loop, not here.
    """
    name: str
    num_aux_pars: int
    aux_names: Tuple[str, ...]
    log_lik: Callable
    # mean of the response given the LATENT location parameter (link inverse)
    response_mean: Callable
    # variance of the response given latent location (for response predictions)
    response_var: Optional[Callable] = None
    discrete: bool = False
    default_aux: Tuple[float, ...] = ()
    # clamp negative observed information to zero (censored likelihoods:
    # reference SecondDerivNegLogLik* returns 0 when H < 0,
    # ``information_ll_can_be_exact_zero_``, likelihoods.h:311,319)
    clip_information: bool = False
    # binomial-type families: weights are the NUMBER OF TRIALS, entering
    # the density non-multiplicatively (binomial coefficient; beta-binomial
    # trials inside the beta function) — ``log_lik_weighted(y, loc, aux, w)``
    # replaces the default w * log_lik scaling (likelihoods.h:30-56)
    log_lik_weighted: Optional[Callable] = None
    # per-aux-parameter optimization transform: "log" (positive, default),
    # "identity" (real-valued, e.g. zoctn asymmetry), "logit" (in (0,1),
    # e.g. zero_inflated_gamma p0). The reference keeps transformed
    # aux_pars_ + aux_pars_original_ the same way.
    aux_transforms: Optional[Tuple[str, ...]] = None
    # FISHER-Laplace families (reference approximation_type_ =
    # "fisher_laplace", the DEFAULT for t, likelihoods.h:207): the Laplace
    # machinery uses the EXPECTED information fisher_loc(y, loc, aux)
    # instead of the observed -d2 (the t log-likelihood is not concave)
    fisher_loc: Optional[Callable] = None

    def default_aux_pars(self, additional_param=None):
        if self.num_aux_pars == 0:
            return None
        import numpy as np
        base = list(self.default_aux)
        if additional_param is not None:
            base[0] = float(additional_param)
        return np.asarray(base, dtype=float)

    # ---- derivatives w.r.t. location via nested autodiff ----------------
    def d_loc(self, y, loc, aux):
        """First derivative of sum(log_lik) w.r.t. location (elementwise)."""
        return jax.grad(lambda l: jnp.sum(self.log_lik(y, l, aux)))(loc)

    def d2_loc(self, y, loc, aux):
        """Diagonal second derivative (elementwise; negative = information).

        Fisher-Laplace families return the NEGATIVE expected information
        (constant in loc for t) so every Laplace consumer — mode finder W,
        logdet(I + Sigma W), predictive variances — runs the reference's
        fisher_laplace approximation."""
        if self.fisher_loc is not None:
            return -self.fisher_loc(y, loc, aux)
        d2 = jax.grad(lambda l: jnp.sum(self.d_loc(y, l, aux)))(loc)
        if self.clip_information:
            d2 = jnp.minimum(d2, 0.0)
        return d2

    def d3_loc(self, y, loc, aux):
        return jax.grad(lambda l: jnp.sum(self.d2_loc(y, l, aux)))(loc)


_REGISTRY: dict[str, LikelihoodFamily] = {}


def _register(fam: LikelihoodFamily):
    _REGISTRY[fam.name] = fam
    return fam


def get_family(name: str) -> LikelihoodFamily:
    name = _canonical(name)
    if name not in _REGISTRY:
        raise ValueError(
            f"Likelihood '{name}' is not supported. Available: "
            f"{sorted(_REGISTRY)}")
    return _REGISTRY[name]


def supported_likelihoods():
    return sorted(_REGISTRY)


# ---- aux-parameter optimization transforms --------------------------------
# per-family kinds ("log" / "logit" / "identity"); the optimizer works on
# the transformed scale like the reference's aux_pars_ vs aux_pars_original_

def aux_transform_kinds(fam: "LikelihoodFamily", n_aux: int):
    return (list(fam.aux_transforms) if fam.aux_transforms is not None
            else ["log"] * n_aux)[:n_aux]


def aux_to_optim_scale(fam, a):
    """User scale -> optimizer scale (numpy, host side)."""
    import numpy as np
    a = np.asarray(a, np.float64)
    out = []
    for v, t in zip(a, aux_transform_kinds(fam, len(a))):
        if t == "log":
            out.append(math.log(max(v, 1e-300)))
        elif t == "logit":
            vc = min(max(v, 1e-12), 1.0 - 1e-12)
            out.append(math.log(vc / (1.0 - vc)))
        else:
            out.append(float(v))
    return np.asarray(out)


def aux_from_optim_scale(fam, t_aux):
    """Optimizer scale -> user scale (jnp, traceable)."""
    kinds = aux_transform_kinds(fam, t_aux.shape[0])
    parts = []
    for i, t in enumerate(kinds):
        if t == "log":
            parts.append(jnp.exp(t_aux[i]))
        elif t == "logit":
            parts.append(jax.nn.sigmoid(t_aux[i]))
        else:
            parts.append(t_aux[i])
    return jnp.stack(parts)


def aux_chain_factors(fam, theta_aux):
    """d(user aux)/d(optimizer par), elementwise (numpy)."""
    import numpy as np
    theta_aux = np.asarray(theta_aux, np.float64)
    kinds = aux_transform_kinds(fam, len(theta_aux))
    out = []
    for i, t in enumerate(kinds):
        if t == "log":
            out.append(np.exp(theta_aux[i]))
        elif t == "logit":
            s = 1.0 / (1.0 + np.exp(-theta_aux[i]))
            out.append(s * (1.0 - s))
        else:
            out.append(1.0)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# families (parametrizations: likelihoods.h:10-70)
# ---------------------------------------------------------------------------

def _ll_gaussian(y, loc, aux):
    # aux[0] = error variance sigma2 (the reference treats it as cov_pars[0]
    # on the Gaussian path; the family exists for generic code paths)
    s2 = aux[0]
    return -0.5 * (LOG_2PI + jnp.log(s2) + (y - loc) ** 2 / s2)


_register(LikelihoodFamily(
    "gaussian", 1, ("error_variance",), _ll_gaussian,
    response_mean=lambda loc, aux: loc,
    response_var=lambda loc, aux: jnp.full_like(loc, aux[0]),
    default_aux=(1.0,)))


def _ll_bernoulli_probit(y, loc, aux):
    # y in {0,1}: y log Phi(loc) + (1-y) log Phi(-loc), stable via log_ndtr
    return y * log_ndtr(loc) + (1.0 - y) * log_ndtr(-loc)


_register(LikelihoodFamily(
    "bernoulli_probit", 0, (), _ll_bernoulli_probit,
    response_mean=lambda loc, aux: ndtr(loc),
    response_var=lambda loc, aux: ndtr(loc) * (1.0 - ndtr(loc)),
    discrete=True))


def _ll_bernoulli_logit(y, loc, aux):
    # y log p + (1-y) log(1-p), p = sigmoid(loc); stable:
    # = y*loc - log(1+exp(loc)) = y*loc - softplus(loc)
    return y * loc - jax.nn.softplus(loc)


_register(LikelihoodFamily(
    "bernoulli_logit", 0, (), _ll_bernoulli_logit,
    response_mean=lambda loc, aux: jax.nn.sigmoid(loc),
    response_var=lambda loc, aux: jax.nn.sigmoid(loc) * (1 - jax.nn.sigmoid(loc)),
    discrete=True))


def _lchoose(n, k):
    return gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)


def _ll_binomial_logit(y, loc, aux):
    # y = successes/trials; trials come in via weights (log_lik_weighted)
    return y * loc - jax.nn.softplus(loc)


_register(LikelihoodFamily(
    "binomial_logit", 0, (), _ll_binomial_logit,
    response_mean=lambda loc, aux: jax.nn.sigmoid(loc),
    response_var=lambda loc, aux: jax.nn.sigmoid(loc) * (1 - jax.nn.sigmoid(loc)),
    discrete=True,
    # n [y loc - softplus(loc)] + log C(n, n y): the derivative structure is
    # multiplicative in n but the NLL carries the binomial coefficient
    log_lik_weighted=lambda y, loc, aux, w:
        w * _ll_binomial_logit(y, loc, aux) + _lchoose(w, w * y)))


def _ll_binomial_probit(y, loc, aux):
    return y * log_ndtr(loc) + (1.0 - y) * log_ndtr(-loc)


_register(LikelihoodFamily(
    "binomial_probit", 0, (), _ll_binomial_probit,
    response_mean=lambda loc, aux: ndtr(loc),
    response_var=lambda loc, aux: ndtr(loc) * (1.0 - ndtr(loc)),
    discrete=True,
    log_lik_weighted=lambda y, loc, aux, w:
        w * _ll_binomial_probit(y, loc, aux) + _lchoose(w, w * y)))


def _ll_poisson(y, loc, aux):
    mu = jnp.exp(loc)
    return y * loc - mu - gammaln(y + 1.0)


_register(LikelihoodFamily(
    "poisson", 0, (), _ll_poisson,
    response_mean=lambda loc, aux: jnp.exp(loc),
    response_var=lambda loc, aux: jnp.exp(loc),
    discrete=True))


def _ll_gamma(y, loc, aux):
    # shape gamma, rate lambda = gamma/mu, mu = exp(loc)  (likelihoods.h:15-18)
    g = aux[0]
    return (g * jnp.log(g) - g * loc + (g - 1.0) * jnp.log(y)
            - g * y * jnp.exp(-loc) - gammaln(g))


_register(LikelihoodFamily(
    "gamma", 1, ("shape",), _ll_gamma,
    response_mean=lambda loc, aux: jnp.exp(loc),
    response_var=lambda loc, aux: jnp.exp(2.0 * loc) / aux[0],
    default_aux=(1.0,)))


def _ll_negative_binomial(y, loc, aux):
    # r = aux[0] shape; p = r/(mu+r), mu = exp(loc)  (likelihoods.h:41-44)
    r = aux[0]
    mu = jnp.exp(loc)
    log_p = jnp.log(r) - jnp.log(mu + r)
    log_1mp = loc - jnp.log(mu + r)
    return (gammaln(y + r) - gammaln(y + 1.0) - gammaln(r)
            + y * log_1mp + r * log_p)


_register(LikelihoodFamily(
    "negative_binomial", 1, ("shape",), _ll_negative_binomial,
    response_mean=lambda loc, aux: jnp.exp(loc),
    response_var=lambda loc, aux: jnp.exp(loc) * (jnp.exp(loc) + aux[0]) / aux[0],
    discrete=True, default_aux=(1.0,)))


def _ll_negative_binomial_1(y, loc, aux):
    # NB1: r = mu/phi, p = 1/(1+phi)  (likelihoods.h:46-49)
    phi = aux[0]
    mu = jnp.exp(loc)
    r = mu / phi
    log_p = -jnp.log1p(phi)
    log_1mp = jnp.log(phi) - jnp.log1p(phi)
    return (gammaln(y + r) - gammaln(y + 1.0) - gammaln(r)
            + y * log_1mp + r * log_p)


_register(LikelihoodFamily(
    "negative_binomial_1", 1, ("dispersion",), _ll_negative_binomial_1,
    response_mean=lambda loc, aux: jnp.exp(loc),
    response_var=lambda loc, aux: jnp.exp(loc) * (1.0 + aux[0]),
    discrete=True, default_aux=(0.5,)))


def _ll_beta(y, loc, aux):
    # Ferrari & Cribari-Neto (2004): mu = sigmoid(loc), precision phi
    phi = aux[0]
    mu = jax.nn.sigmoid(loc)
    a = mu * phi
    b = (1.0 - mu) * phi
    return (gammaln(phi) - gammaln(a) - gammaln(b)
            + (a - 1.0) * jnp.log(y) + (b - 1.0) * jnp.log1p(-y))


_register(LikelihoodFamily(
    "beta", 1, ("precision",), _ll_beta,
    response_mean=lambda loc, aux: jax.nn.sigmoid(loc),
    response_var=lambda loc, aux: (jax.nn.sigmoid(loc) * (1 - jax.nn.sigmoid(loc))
                                   / (1.0 + aux[0])),
    default_aux=(1.0,)))


def _ll_t(y, loc, aux):
    # Student t: scale sigma = aux[0], df nu = aux[1]  (likelihoods.h:26-29)
    sigma, nu = aux[0], aux[1]
    z2 = (y - loc) ** 2 / (nu * sigma * sigma)
    return (gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0)
            - 0.5 * jnp.log(nu * jnp.pi) - jnp.log(sigma)
            - (nu + 1.0) / 2.0 * jnp.log1p(z2))


_register(LikelihoodFamily(
    "t", 2, ("scale", "df"), _ll_t,
    response_mean=lambda loc, aux: loc,
    response_var=lambda loc, aux: jnp.full_like(
        loc, aux[0] ** 2 * aux[1] / jnp.maximum(aux[1] - 2.0, 1e-10)),
    default_aux=(1.0, 2.0),
    # FisherInformationT (likelihoods.h:9947): (nu+1) / ((nu+3) sigma^2)
    fisher_loc=lambda y, loc, aux: jnp.full_like(
        loc, (aux[1] + 1.0) / (aux[1] + 3.0) / (aux[0] * aux[0]))))

_register(LikelihoodFamily(
    "t_fix_df", 1, ("scale",),
    lambda y, loc, aux: _ll_t(y, loc, jnp.array([aux[0], aux[1]])
                              if hasattr(aux, "__len__") and len(aux) > 1
                              else jnp.array([aux[0], 2.0])),
    response_mean=lambda loc, aux: loc,
    default_aux=(1.0,)))


def _ll_lognormal(y, loc, aux):
    # mean(log y) = loc - sigma2/2 (mu = E[y] = exp(loc)); likelihoods.h:20-24
    s2 = aux[0]
    ly = jnp.log(y)
    return (-ly - 0.5 * jnp.log(s2) - 0.5 * LOG_2PI
            - (ly - (loc - 0.5 * s2)) ** 2 / (2.0 * s2))


_register(LikelihoodFamily(
    "lognormal", 1, ("variance_log",), _ll_lognormal,
    response_mean=lambda loc, aux: jnp.exp(loc),
    response_var=lambda loc, aux: (jnp.exp(aux[0]) - 1.0) * jnp.exp(2.0 * loc),
    default_aux=(0.5,)))


def _ll_beta_binomial(y, loc, aux, n_trials=1.0):
    # y = successes/trials; mu = sigmoid(loc), precision phi (likelihoods.h:52-56)
    phi = aux[0]
    mu = jax.nn.sigmoid(loc)
    a = mu * phi
    b = (1.0 - mu) * phi
    k = y * n_trials
    n = n_trials

    def betaln(p, q):
        return gammaln(p) + gammaln(q) - gammaln(p + q)

    return (gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
            + betaln(k + a, n - k + b) - betaln(a, b))


_register(LikelihoodFamily(
    "beta_binomial", 1, ("precision",), _ll_beta_binomial,
    response_mean=lambda loc, aux: jax.nn.sigmoid(loc),
    discrete=True, default_aux=(20.0,),
    # trials enter INSIDE the beta functions — not a multiplicative weight
    log_lik_weighted=lambda y, loc, aux, w:
        _ll_beta_binomial(y, loc, aux, n_trials=w)))


def _ll_zero_inflated_gamma(y, loc, aux):
    # f(y) = p0 1{y=0} + (1-p0) Gamma(shape, rate=(1-p0)*shape/mu) 1{y>0}
    # aux = (shape, p0) on the USER scale (the reference's
    # aux_pars_original_; estimation runs on logit(p0), likelihoods.h:285)
    g = aux[0]
    p0 = aux[1]
    mu = jnp.exp(loc)
    lam = (1.0 - p0) * g / mu
    y_safe = jnp.where(y > 0, y, 1.0)
    log_gamma_pdf = (g * jnp.log(lam) + (g - 1.0) * jnp.log(y_safe)
                     - lam * y_safe - gammaln(g))
    return jnp.where(y > 0, jnp.log1p(-p0) + log_gamma_pdf, jnp.log(p0))


_register(LikelihoodFamily(
    "zero_inflated_gamma", 2, ("shape", "p0"), _ll_zero_inflated_gamma,
    response_mean=lambda loc, aux: jnp.exp(loc),
    default_aux=(1.0, 0.5), aux_transforms=("log", "logit")))


def _ll_zctn(y, loc, aux):
    # zero_censored_power_transformed_normal: Y = max(0, X)^lambda,
    # X ~ N(loc, sigma2)  (likelihoods.h:62-67)
    sigma, lam = aux[0], aux[1]
    y_safe = jnp.where(y > 0, y, 1.0)
    yl = y_safe ** (1.0 / lam)
    log_pdf = (jnorm.logpdf((yl - loc) / sigma) - jnp.log(sigma)
               - jnp.log(lam) + (1.0 / lam - 1.0) * jnp.log(y_safe))
    log_p0 = log_ndtr(-loc / sigma)
    return jnp.where(y > 0, log_pdf, log_p0)


_register(LikelihoodFamily(
    "zero_censored_power_transformed_normal", 2, ("sigma", "lambda"), _ll_zctn,
    response_mean=lambda loc, aux: loc,
    default_aux=(1.0, 1.0)))


def _ll_zoctn(y, loc, aux):
    # zero-one-censored transformed normal ("zoctn",
    # ``LogLikZeroOneCensTransfNorm`` likelihoods.h:8877-8900):
    # y in [0,1]; interior y maps to the pseudo-latent
    # x = sigmoid((logit(y) - a)/b), x | eta ~ N(eta, sigma^2) with censoring
    # at 0 and 1. aux = (sigma, a (real-valued asymmetry), b (skewness)).
    sigma, a, b = aux[0], aux[1], aux[2]
    y_int = jnp.clip(y, 1e-12, 1.0 - 1e-12)
    logit_y = jnp.log(y_int) - jnp.log1p(-y_int)
    x = jax.nn.sigmoid((logit_y - a) / b)
    z = (x - loc) / sigma
    ll_int = (-0.5 * z * z - jnp.log(sigma) - 0.5 * LOG_2PI
              + jnp.log(x) + jnp.log1p(-x) - jnp.log(b)
              - jnp.log(y_int) - jnp.log1p(-y_int))
    ll0 = log_ndtr(-loc / sigma)
    ll1 = log_ndtr((loc - 1.0) / sigma)
    return jnp.where(y <= 0.0, ll0, jnp.where(y >= 1.0, ll1, ll_int))


_register(LikelihoodFamily(
    "zoctn", 3, ("sigma", "asymmetry", "skewness"), _ll_zoctn,
    response_mean=lambda loc, aux: loc,
    default_aux=(1.0, 1.0, 1.0),
    aux_transforms=("log", "identity", "log"),
    clip_information=True))


def _ll_zocb(y, loc, aux):
    # zero_one_censored_transformed_beta (likelihoods.h:306,
    # LogLikZeroOneCensTransfBeta): y = clip(-u + (1+2u) t, 0, 1),
    # t ~ Beta(mu phi, (1-mu) phi), mu = sigmoid(loc)
    from gpboost_tpu.likelihoods.special import (betaln_ad, log_betainc_ad,
                                                  log1m_betainc_ad)
    # upper clamp keeps the incomplete-beta quadrature in its accurate range
    # (reference init caps phi at 100; fitted values are O(10))
    phi = jnp.clip(aux[0], 1e-12, 1e3)
    u = jnp.clip(aux[1], 1e-12, 10.0)
    onep2u = 1.0 + 2.0 * u
    mu = jnp.clip(jax.nn.sigmoid(loc), 1e-12, 1.0 - 1e-12)
    # shape floor 0.05: below it the incomplete-beta quadrature loses
    # higher-order differentiability (a < 0.02 only happens at saturated
    # |loc| > 7 where the likelihood is flat anyway)
    a = jnp.clip(mu * phi, 5e-2, None)
    b = jnp.clip((1.0 - mu) * phi, 5e-2, None)
    t0 = jnp.clip(u / onep2u, 1e-15, 1.0 - 1e-15)
    t1 = jnp.clip((1.0 + u) / onep2u, 1e-15, 1.0 - 1e-15)
    t = jnp.clip((y + u) / onep2u, 1e-15, 1.0 - 1e-15)
    ll0 = log_betainc_ad(a, b, t0)
    ll1 = log1m_betainc_ad(a, b, t1)
    llmid = ((a - 1.0) * jnp.log(t) + (b - 1.0) * jnp.log1p(-t)
             - betaln_ad(a, b) - jnp.log(onep2u))
    return jnp.where(y <= 0.0, ll0, jnp.where(y >= 1.0, ll1, llmid))


def _zocb_moments(loc, aux):
    """(E[y|loc], E[y^2|loc]) — XB_FirstMoment_/XB_SecondMoment_
    (likelihoods.h:11549,11580)."""
    from gpboost_tpu.likelihoods.special import betainc_ad
    phi = jnp.clip(aux[0], 1e-12, 1e3)
    u = jnp.clip(aux[1], 1e-12, 10.0)
    onep2u = 1.0 + 2.0 * u
    mu = jnp.clip(jax.nn.sigmoid(loc), 1e-12, 1.0 - 1e-12)
    a = jnp.clip(mu * phi, 5e-2, None)
    b = jnp.clip((1.0 - mu) * phi, 5e-2, None)
    t0 = jnp.clip(u / onep2u, 1e-15, 1.0 - 1e-15)
    t1 = jnp.clip((1.0 + u) / onep2u, 1e-15, 1.0 - 1e-15)
    F0 = betainc_ad(a, b, t0)
    P1 = betainc_ad(b, a, 1.0 - t1)
    F1 = 1.0 - P1
    Pmid = F1 - F0
    Ez1 = (a / (a + b)) * (betainc_ad(a + 1.0, b, t1)
                           - betainc_ad(a + 1.0, b, t0))
    m1 = jnp.clip(onep2u * Ez1 - u * Pmid + P1, 0.0, 1.0)
    coeff2 = a * (a + 1.0) / ((a + b) * (a + b + 1.0))
    Ez2 = coeff2 * (betainc_ad(a + 2.0, b, t1) - betainc_ad(a + 2.0, b, t0))
    m2 = jnp.clip(onep2u ** 2 * Ez2 - 2.0 * u * onep2u * Ez1
                  + u * u * Pmid + P1, 0.0, 1.0)
    return m1, m2


_register(LikelihoodFamily(
    "zero_one_censored_transformed_beta", 2, ("precision", "u"), _ll_zocb,
    response_mean=lambda loc, aux: _zocb_moments(loc, aux)[0],
    response_var=lambda loc, aux: (
        _zocb_moments(loc, aux)[1] - _zocb_moments(loc, aux)[0] ** 2),
    default_aux=(20.0, 0.01), clip_information=True))


def _ll_zocg(y, loc, aux):
    # zero_one_censored_shifted_gamma (likelihoods.h:314,
    # LogLikZeroOneCensGamma): y = clip(z - xi, 0, 1), z ~ Gamma(k, mu/k)
    from gpboost_tpu.likelihoods.special import (log_gammainc_lower_ad,
                                                  log_gammainc_upper_ad)
    k = aux[0]
    xi = aux[1]
    loc = jnp.clip(loc, -500.0, 500.0)
    mu = jnp.exp(loc)
    th = mu / k
    ll0 = log_gammainc_lower_ad(k, xi / th)
    ll1 = log_gammainc_upper_ad(k, (1.0 + xi) / th)
    z = jnp.maximum(y + xi, 1e-300)
    llmid = (-k * jnp.log(th) - z / th + (k - 1.0) * jnp.log(z)
             - gammaln(k))
    return jnp.where(y <= 0.0, ll0, jnp.where(y >= 1.0, ll1, llmid))


def _zocg_moments(loc, aux):
    """ZOCG_MomentsGivenEta_ (likelihoods.h:11615)."""
    from gpboost_tpu.likelihoods.special import gammainc_ad
    k = aux[0]
    xi = aux[1]
    mu = jnp.exp(loc)
    th = mu / k
    t0 = xi / th
    t1 = (1.0 + xi) / th
    Gk0 = gammainc_ad(k, t0)
    Gk1 = gammainc_ad(k, t1)
    Pint = Gk1 - Gk0
    p1 = 1.0 - Gk1
    M1 = (k * th) * (gammainc_ad(k + 1.0, t1) - gammainc_ad(k + 1.0, t0))
    Ey = jnp.clip(p1 + M1 - xi * Pint, 0.0, 1.0)
    M2 = (k * (k + 1.0) * th * th) * (gammainc_ad(k + 2.0, t1)
                                      - gammainc_ad(k + 2.0, t0))
    Ey2 = jnp.clip(p1 + M2 - 2.0 * xi * M1 + xi * xi * Pint, 0.0, 1.0)
    return Ey, Ey2


_register(LikelihoodFamily(
    "zero_one_censored_shifted_gamma", 2, ("shape", "xi"), _ll_zocg,
    response_mean=lambda loc, aux: _zocg_moments(loc, aux)[0],
    response_var=lambda loc, aux: (
        _zocg_moments(loc, aux)[1] - _zocg_moments(loc, aux)[0] ** 2),
    default_aux=(1.0, 0.1), clip_information=True))


def _ll_het_single(y, loc, aux):
    # gaussian_heteroscedastic is a TWO-location family (mean + log-variance,
    # num_sets_re_=2); the real machinery lives in models/heteroscedastic.py.
    # This registry entry only provides metadata for generic code paths.
    raise NotImplementedError(
        "gaussian_heteroscedastic uses the two-set engine "
        "(gpboost_tpu.models.heteroscedastic), not the single-location API")


_register(LikelihoodFamily(
    "gaussian_heteroscedastic", 0, (), _ll_het_single,
    response_mean=lambda loc, aux: loc))
