"""Differentiable incomplete beta / gamma functions.

JAX's ``betainc``/``gammainc`` only define derivatives w.r.t. ``x`` — the
censored likelihoods (``zero_one_censored_transformed_beta`` /
``zero_one_censored_shifted_gamma``, reference ``likelihoods.h:306-321``,
``LogLikZeroOneCensTransfBeta`` / ``LogLikZeroOneCensGamma``) need shape
derivatives because a = mu(loc) * phi depends on the latent location.

Values come from the library implementations; shape derivatives use the
integral representations with the singularity-removing substitution
t = x s^(1/a) and fixed Gauss-Legendre quadrature:

    d/da I_x(a,b) = J_a / B(a,b) - I_x(a,b) (psi(a) - psi(a+b)),
    J_a = int_0^x t^(a-1) (1-t)^(b-1) ln t dt
        = (x^a / a) int_0^1 (1 - x s^(1/a))^(b-1) (ln x + ln s / a) ds,

and analogously for b (with ln(1-t)) and for the lower incomplete gamma.
The rules are built from differentiable primitives, so higher-order
derivatives (needed for the Laplace information) compose recursively.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc as _betainc, digamma, gammainc \
    as _gammainc, gammaln


def betaln_ad(a, b):
    """log B(a, b) via gammaln — jax.scipy.special.betaln's SECOND derivative
    silently evaluates to zero (observed on jax 0.9); the gammaln composition
    is correctly twice-differentiable."""
    return gammaln(a) + gammaln(b) - gammaln(a + b)

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(200)
# map from [-1, 1] to (0, 1)
_GL_S = (0.5 * (_GL_NODES + 1.0))
_GL_W = 0.5 * _GL_WEIGHTS


def _panel_sub(a, gb_log, gfun, c):
    """Quadrature of exp(gb_log(t)) * gfun(t) over [0, c] with the
    singularity-removing substitution t = c s^(1/a); gb_log excludes the
    t^(a-1) factor which is folded into the substitution jacobian."""
    s = jnp.asarray(_GL_S, dtype=c.dtype)
    w = jnp.asarray(_GL_W, dtype=c.dtype)
    t = c[..., None] * s ** (1.0 / a[..., None])
    log_node = (a[..., None] * jnp.log(jnp.maximum(c[..., None], 1e-300))
                - jnp.log(a)[..., None] + gb_log(t))
    return jnp.sum(w * jnp.exp(jnp.minimum(log_node, 700.0)) * gfun(t),
                   axis=-1)


def _panel_plain(a, gb_log, gfun, lo, hi):
    """Plain Gauss-Legendre of t^(a-1) exp(gb_log(t)) gfun(t) over [lo, hi].

    Empty panels (hi <= lo) contribute exactly 0 via the double-where trick —
    a bare max(width, 0) leaves derivative flow through the width==0 tie and
    produces NaN under second-order differentiation."""
    s = jnp.asarray(_GL_S, dtype=lo.dtype)
    w = jnp.asarray(_GL_W, dtype=lo.dtype)
    width_raw = hi - lo
    pos = width_raw > 0.0
    width = jnp.where(pos, width_raw, 1.0)
    t = lo[..., None] + width[..., None] * s
    t = jnp.maximum(t, 1e-300)
    log_node = ((a[..., None] - 1.0) * jnp.log(t) + gb_log(t)
                + jnp.log(width[..., None]))
    out = jnp.sum(w * jnp.exp(jnp.minimum(log_node, 700.0)) * gfun(t),
                  axis=-1)
    return jnp.where(pos, out, 0.0)


def _beta_J(a, b, x, which: str):
    """J = int_0^x t^(a-1)(1-t)^(b-1) g(t) dt, g = ln t or ln(1-t).

    Two panels: [0, c] via the substitution t = c s^(1/a) (resolves the
    t -> 0 singularity for a < 1), then [c, x] plain — the integrand peaks
    near a/(a+b) which the substitution alone misses when x is far past it.
    """
    a, b, x = jnp.asarray(a), jnp.asarray(b), jnp.asarray(x)
    # substituted head only over the (possibly singular) region below half
    # the mean; the smooth peak region is resolved by the plain panel
    c = jnp.minimum(x, 0.5 * a / (a + b))

    def gb_log(t):
        return (b[..., None] - 1.0) * jnp.log1p(-jnp.minimum(t, 1.0 - 1e-15))

    if which == "a":
        def gfun(t):
            return jnp.log(jnp.maximum(t, 1e-300))
    else:
        def gfun(t):
            return jnp.log1p(-jnp.minimum(t, 1.0 - 1e-15))

    return (_panel_sub(a, gb_log, gfun, c)
            + _panel_plain(a, gb_log, gfun, c, x))


@jax.custom_jvp
def betainc_ad(a, b, x):
    """Regularized incomplete beta I_x(a, b), differentiable in all args."""
    return _betainc(a, b, x)


@betainc_ad.defjvp
def _betainc_jvp(primals, tangents):
    a, b, x = primals
    da, db, dx = tangents
    I = betainc_ad(a, b, x)
    logB = betaln_ad(a, b)
    out = jnp.zeros_like(I)
    # d/dx: exact; the exponent is floored at -700 so the pdf never
    # underflows to exactly 0 (0 * inf tangent products NaN under
    # higher-order differentiation)
    log_pdf = (a - 1.0) * jnp.log(jnp.clip(x, 1e-300, 1.0)) \
        + (b - 1.0) * jnp.log1p(-jnp.clip(x, 0.0, 1.0 - 1e-15)) - logB
    out = out + dx * jnp.exp(jnp.clip(log_pdf, -700.0, 700.0))
    # d/da, d/db: quadrature
    Ja = _beta_J(a, b, x, "a")
    Jb = _beta_J(a, b, x, "b")
    out = out + da * (Ja * jnp.exp(-logB) - I * (digamma(a) - digamma(a + b)))
    out = out + db * (Jb * jnp.exp(-logB) - I * (digamma(b) - digamma(a + b)))
    return I, out


def _gamma_J(a, x):
    """int_0^x t^(a-1) e^(-t) ln t dt — substituted head [0, c] + plain tail
    [c, x_cap]; the integrand peaks at t = a-1, the tail past
    a + 40 sqrt(a) + 50 is < 1e-14 of the mass (and the naive prefactor
    x^a would overflow)."""
    a, x = jnp.asarray(a), jnp.asarray(x)
    x = jnp.minimum(x, a + 40.0 * jnp.sqrt(a) + 50.0)
    # substituted head only for the t -> 0 singularity (a < 1); the peak at
    # t = a - 1 is resolved by the plain panel
    c = jnp.minimum(x, 1.0)

    def gb_log(t):
        return -t

    def gfun(t):
        return jnp.log(jnp.maximum(t, 1e-300))

    return (_panel_sub(a, gb_log, gfun, c)
            + _panel_plain(a, gb_log, gfun, c, x))


@jax.custom_jvp
def gammainc_ad(a, x):
    """Regularized lower incomplete gamma P(a, x), differentiable in both."""
    return _gammainc(a, x)


@gammainc_ad.defjvp
def _gammainc_jvp(primals, tangents):
    a, x = primals
    da, dx = tangents
    P = gammainc_ad(a, x)
    lga = gammaln(a)
    out = jnp.zeros_like(P)
    log_pdf = (a - 1.0) * jnp.log(jnp.maximum(x, 1e-300)) - x - lga
    out = out + dx * jnp.exp(jnp.clip(log_pdf, -700.0, 700.0))
    J = _gamma_J(a, x)
    out = out + da * (J * jnp.exp(-lga) - P * digamma(a))
    return P, out


# ---------------------------------------------------------------------------
# stable log-tail CDFs: below ~1e-8 the quadrature-backed derivative rules
# lose all relative accuracy (d log F = dF / F amplifies absolute error), so
# the far tails switch to series / asymptotic expansions whose derivatives
# are clean closed forms.
# ---------------------------------------------------------------------------

def log_gammainc_lower_ad(a, x):
    """log P(a, x), stable into the x -> 0 tail.

    Series: P = x^a e^-x / Gamma(a+1) * sum_n x^n / ((a+1)...(a+n))."""
    P = gammainc_ad(a, x)
    use_series = P < 1e-8
    x_small = jnp.minimum(x, jnp.maximum(0.9 * a, 1e-10))
    S = jnp.ones_like(x)
    term = jnp.ones_like(x)
    for n in range(1, 9):
        term = term * x_small / (a + n)
        S = S + term
    log_series = (a * jnp.log(jnp.maximum(x_small, 1e-300)) - x_small
                  - gammaln(a + 1.0) + jnp.log(S))
    log_direct = jnp.log(jnp.maximum(jnp.where(use_series, 1.0, P), 1e-300))
    return jnp.where(use_series, log_series, log_direct)


def log_gammainc_upper_ad(a, x):
    """log Q(a, x) = log(1 - P(a, x)), stable into the x -> inf tail.

    Asymptotic: Q ~ x^(a-1) e^-x / Gamma(a) * (1 + (a-1)/x + ...)."""
    P = gammainc_ad(a, x)
    Q = 1.0 - P
    use_asym = Q < 1e-8
    x_large = jnp.maximum(x, a + 5.0)
    S = jnp.ones_like(x)
    term = jnp.ones_like(x)
    for n in range(1, 5):
        term = term * (a - n) / x_large
        S = S + term
    log_asym = ((a - 1.0) * jnp.log(x_large) - x_large - gammaln(a)
                + jnp.log(jnp.maximum(S, 1e-10)))
    log_direct = jnp.log(jnp.maximum(jnp.where(use_asym, 1.0, Q), 1e-300))
    return jnp.where(use_asym, log_asym, log_direct)


def log_betainc_ad(a, b, x):
    """log I_x(a, b), stable into the x -> 0 tail.

    Series: I_x = x^a / (a B(a,b)) * 2F1(a, 1-b; a+1; x)
                = x^a / (a B(a,b)) * sum_n [prod_k (k-b)/k] a/(a+n) x^n."""
    I = betainc_ad(a, b, x)
    use_series = I < 1e-8
    x_small = jnp.minimum(x, 0.9 * a / (a + b))
    S = jnp.ones_like(x)
    term = jnp.ones_like(x)
    for n in range(1, 9):
        term = term * (n - b) / n * x_small
        S = S + term * a / (a + n)
    log_series = (a * jnp.log(jnp.maximum(x_small, 1e-300))
                  - jnp.log(a) - betaln_ad(a, b)
                  + jnp.log(jnp.maximum(S, 1e-10)))
    log_direct = jnp.log(jnp.maximum(jnp.where(use_series, 1.0, I), 1e-300))
    return jnp.where(use_series, log_series, log_direct)


def log1m_betainc_ad(a, b, x):
    """log(1 - I_x(a, b)) via the symmetry 1 - I_x(a,b) = I_{1-x}(b,a)."""
    return log_betainc_ad(b, a, 1.0 - x)
