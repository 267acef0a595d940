"""Two-latent-set Fisher-Laplace engine for ``gaussian_heteroscedastic``.

The model (reference ``likelihoods.h:258-268``, ``num_sets_re_ = 2``):

    y_i ~ N(mu_i, v_i),   mu_i = F1_i + b1_i,   log v_i = F2_i + b2_i,

with two independent latent random-effect sets (b1 for the mean, b2 for the
log-variance), each with its own covariance parameters. The log-likelihood is
not concave jointly in (mu, log v), so the reference forces the
``fisher_laplace`` approximation (``likelihoods.h:262``): mode finding and the
marginal-likelihood logdet use the EXPECTED information, which is
block-diagonal across the two sets —

    W1 = E[-d2 ll / d mu^2]      = exp(-log v)      (``likelihoods.h:9960``)
    W2 = E[-d2 ll / d (log v)^2] = 1/2
    cross term                   = 0,

so every Newton step decouples into two independent n x n solves; only the
score couples the sets (``FirstDerivLogLikGaussianHeteroscedastic``,
``likelihoods.h:9267``). This module works on latent *precision* matrices
(Q_k = Sigma_k^-1), the natural Vecchia parametrization.

Gradients w.r.t. (Q1, Q2, F1, F2) come from implicit differentiation of the
joint mode equation with the TRUE 2x2-per-observation Hessian
(``SecondDerivNegLogLikGaussianHeteroscedastic``, ``likelihoods.h:9951``),
composed with autodiff of the Fisher-Laplace objective.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)

MAX_NEWTON_IT = 1000
# Fisher scoring converges linearly (the information is approximate), so the
# stopping rule is part of the numerical spec: the reference stops when the
# objective changes by < delta_conv_mode_finding_ * |psi| = 1e-8 * |psi|
# (``CheckConvergenceModeFinding``, likelihoods.h:11820, :12723) and evaluates
# the logdet at that slightly under-converged mode; golden NLL values match
# only with the same rule.
NEWTON_TOL = 1e-8
MAX_HALVING = 60


def loglik(y, loc1, loc2):
    """Elementwise log N(y | loc1, exp(loc2)) (``LogLikGaussianHeteroscedastic``)."""
    r = y - loc1
    return -0.5 * (LOG_2PI + loc2 + r * r * jnp.exp(-loc2))


def score(y, loc1, loc2):
    """(d ll/d loc1, d ll/d loc2) elementwise."""
    e = jnp.exp(-loc2)
    r = y - loc1
    s1 = r * e
    return s1, 0.5 * (s1 * r - 1.0)


def fisher_w(loc2):
    """Expected information diag blocks (W1, W2); cross term is zero."""
    return jnp.exp(-loc2), jnp.full_like(loc2, 0.5)


def hessian_blocks(y, loc1, loc2):
    """True negative-Hessian blocks (h11, h12, h22) per observation."""
    e = jnp.exp(-loc2)
    r = y - loc1
    return e, r * e, 0.5 * r * r * e


# ---------------------------------------------------------------------------
# joint mode finding (Fisher-scoring Newton, custom VJP via implicit diff)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def find_mode(Q1, Q2, y, F1, F2):
    """Joint posterior mode (b1, b2) of
    sum_i ll(y_i; F1+b1, F2+b2) - 1/2 b1'Q1 b1 - 1/2 b2'Q2 b2.
    Differentiable w.r.t. (Q1, Q2, F1, F2)."""
    return _find_mode_impl(Q1, Q2, y, F1, F2)


def _find_mode_impl(Q1, Q2, y, F1, F2):
    n = y.shape[0]
    dtype = Q1.dtype

    def objective(b1, b2):
        return (jnp.sum(loglik(y, F1 + b1, F2 + b2))
                - 0.5 * jnp.dot(b1, Q1 @ b1) - 0.5 * jnp.dot(b2, Q2 @ b2))

    def newton(state):
        b1, b2, psi, it, conv = state
        loc1, loc2 = F1 + b1, F2 + b2
        s1, s2 = score(y, loc1, loc2)
        w1, w2 = fisher_w(loc2)
        # Fisher information is block-diagonal -> two decoupled solves
        d1 = jnp.linalg.solve(Q1 + jnp.diag(w1), s1 - Q1 @ b1)
        d2 = jnp.linalg.solve(Q2 + jnp.diag(w2), s2 - Q2 @ b2)

        def psi_at(t):
            return objective(b1 + t * d1, b2 + t * d2)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < MAX_HALVING)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b1n = b1 + t * d1
        b2n = b2 + t * d2
        conv = jnp.abs(psi_new - psi) < NEWTON_TOL * (jnp.abs(psi) + 1e-10)
        return b1n, b2n, psi_new, it + 1, conv

    def cond(state):
        _, _, _, it, conv = state
        return jnp.logical_and(it < MAX_NEWTON_IT, jnp.logical_not(conv))

    b0 = jnp.zeros(n, dtype)
    b1, b2, _, _, _ = jax.lax.while_loop(
        cond, newton, (b0, b0, objective(b0, b0), 0, False))
    return b1, b2


def _find_mode_fwd(Q1, Q2, y, F1, F2):
    b1, b2 = _find_mode_impl(Q1, Q2, y, F1, F2)
    return (b1, b2), (Q1, Q2, y, F1, F2, b1, b2)


def _find_mode_bwd(res, vs):
    """Adjoint through the joint mode equation
    g = [Q1 b1 - s1; Q2 b2 - s2] = 0 with the true coupled Hessian."""
    Q1, Q2, y, F1, F2, b1, b2 = res
    v1, v2 = vs
    n = b1.shape[0]
    h11, h12, h22 = hessian_blocks(y, F1 + b1, F2 + b2)
    # J = blockdiag(Q1, Q2) + [[diag(h11), diag(h12)], [diag(h12), diag(h22)]]
    J = jnp.zeros((2 * n, 2 * n), Q1.dtype)
    J = J.at[:n, :n].set(Q1 + jnp.diag(h11))
    J = J.at[n:, n:].set(Q2 + jnp.diag(h22))
    ii = jnp.arange(n)
    J = J.at[ii, n + ii].set(h12)
    J = J.at[n + ii, ii].set(h12)
    lam = jnp.linalg.solve(J, jnp.concatenate([v1, v2]))
    l1, l2 = lam[:n], lam[n:]

    def g(Q1_, Q2_, F1_, F2_):
        s1, s2 = score(y, F1_ + b1, F2_ + b2)
        return Q1_ @ b1 - s1, Q2_ @ b2 - s2

    _, vjp = jax.vjp(g, Q1, Q2, F1, F2)
    gQ1, gQ2, gF1, gF2 = vjp((-l1, -l2))
    return gQ1, gQ2, jnp.zeros_like(y), gF1, gF2


find_mode.defvjp(_find_mode_fwd, _find_mode_bwd)


# ---------------------------------------------------------------------------
# Fisher-Laplace NLL
# ---------------------------------------------------------------------------

def nll(Q1, Q2, logdet_Q1, logdet_Q2, y, F1, F2):
    """Fisher-Laplace negative log marginal likelihood.

    nll = -(ll(mode) - 1/2 sum_k b_k' Q_k b_k)
          + 1/2 sum_k [logdet(Q_k + W_k) - logdet Q_k]
    with W_k the Fisher information blocks at the mode.
    """
    b1, b2 = find_mode(Q1, Q2, y, F1, F2)
    loc1, loc2 = F1 + b1, F2 + b2
    ll = jnp.sum(loglik(y, loc1, loc2))
    quad = jnp.dot(b1, Q1 @ b1) + jnp.dot(b2, Q2 @ b2)
    w1, w2 = fisher_w(loc2)
    _, ld1 = jnp.linalg.slogdet(Q1 + jnp.diag(w1))
    _, ld2 = jnp.linalg.slogdet(Q2 + jnp.diag(w2))
    return -(ll - 0.5 * quad) + 0.5 * (ld1 - logdet_Q1 + ld2 - logdet_Q2)


def posterior_sets(Q1, Q2, y, F1, F2):
    """Mode, Fisher weights, and per-set posterior systems for prediction."""
    b1, b2 = find_mode(Q1, Q2, y, F1, F2)
    w1, w2 = fisher_w(F2 + b2)
    return (b1, w1), (b2, w2)
