"""Capability-grid smoke: every likelihood x approximation combination.

The reference's surface is 19 likelihoods x {none, vecchia, fitc,
full_scale_tapering, full_scale_vecchia, tapering} (SURVEY.md section 7
"hard parts": the sheer surface). Golden tests pin numerics for the
combinations the R suite covers; this grid asserts every *supported*
combination at least evaluates a finite NLL, fits a step, and predicts —
and that the documented guards raise cleanly rather than crash.
"""
import os

import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu import likelihoods as lk

APPROXIMATIONS = ["none", "vecchia", "fitc", "full_scale_tapering",
                  "full_scale_vecchia", "tapering"]

# combinations the framework (like the reference) does not support; the
# model must raise a clear error, not crash later
GUARDED = {
    # two-latent-set heteroscedastic engine requires the Vecchia structure
    # (gp_approx="none" is SUPPORTED: exact all-neighbors Vecchia route)
    ("gaussian_heteroscedastic", "fitc"),
    ("gaussian_heteroscedastic", "full_scale_tapering"),
    ("gaussian_heteroscedastic", "full_scale_vecchia"),
    ("gaussian_heteroscedastic", "tapering"),
}


def _simulate(lik, n, rng, latent):
    mean = np.exp(latent) if lik in (
        "poisson", "gamma", "negative_binomial", "negative_binomial_1",
        "zero_inflated_gamma", "zero_one_censored_shifted_gamma",
        "lognormal") else latent
    if lik in ("bernoulli_logit", "bernoulli_probit"):
        return (rng.uniform(size=n) < 1 / (1 + np.exp(-latent))).astype(float)
    if lik in ("binomial_logit", "binomial_probit", "beta_binomial"):
        # y = successes / trials (reference convention; trials via weights)
        return rng.binomial(10, 1 / (1 + np.exp(-latent))) / 10.0
    if lik == "poisson":
        return rng.poisson(mean).astype(float)
    if lik in ("gamma", "zero_inflated_gamma",
               "zero_one_censored_shifted_gamma"):
        y = rng.gamma(2.0, mean / 2.0)
        if lik == "zero_inflated_gamma":
            y[rng.uniform(size=n) < 0.3] = 0.0
        if lik == "zero_one_censored_shifted_gamma":
            y = np.clip(y / (1 + y), 0.0, 1.0)
            y[rng.uniform(size=n) < 0.1] = 0.0
            y[rng.uniform(size=n) < 0.1] = 1.0
        return y
    if lik in ("negative_binomial", "negative_binomial_1"):
        return rng.poisson(rng.gamma(2.0, mean / 2.0)).astype(float)
    if lik == "beta":
        return np.clip(1 / (1 + np.exp(-latent))
                       + 0.05 * rng.standard_normal(n), 0.02, 0.98)
    if lik == "lognormal":
        return np.exp(latent + 0.3 * rng.standard_normal(n))
    if lik == "t" or lik == "t_fix_df":
        return latent + 0.3 * rng.standard_t(4, size=n)
    if lik == "zero_censored_power_transformed_normal":
        return np.maximum(latent + 0.3 * rng.standard_normal(n), 0.0)
    if lik in ("zero_one_censored_transformed_beta", "zoctn"):
        y = np.clip(1 / (1 + np.exp(-latent))
                    + 0.05 * rng.standard_normal(n), 0.0, 1.0)
        return y
    if lik == "gaussian_heteroscedastic":
        return latent + np.exp(0.3 * latent) * 0.2 * rng.standard_normal(n)
    return latent + 0.3 * rng.standard_normal(n)


@pytest.fixture(scope="module")
def grid_data():
    n = 64
    rng = np.random.default_rng(7)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    latent = np.linalg.cholesky(np.exp(-D / 0.2) + 1e-10 * np.eye(n)) \
        @ rng.standard_normal(n)
    return dict(n=n, rng=rng, coords=coords, latent=latent)


def _model_kwargs(approx, n):
    kw = dict(gp_approx=approx)
    if approx in ("vecchia", "full_scale_vecchia"):
        kw["num_neighbors"] = 15
    if approx in ("fitc", "full_scale_tapering", "full_scale_vecchia"):
        kw["num_ind_points"] = 20
    if approx in ("full_scale_tapering", "tapering"):
        kw["cov_fct_taper_range"] = 0.6
        kw["cov_fct_taper_shape"] = 0.0
    return kw


# routine runs cover all likelihoods under Vecchia (the production
# approximation) and a likelihood sample under every approximation; the
# full 19 x 6 grid runs with GPBOOST_ALL_TESTS=1 (the reference gates its
# long tests the same way, test_GPModel_gaussian_process.R:4)
_ALL = os.environ.get("GPBOOST_ALL_TESTS") == "1"
_SAMPLE_LIKS = ("gaussian", "bernoulli_probit", "poisson",
                "gaussian_heteroscedastic")
_GRID = [(lik, ap) for lik in lk.supported_likelihoods()
         for ap in APPROXIMATIONS
         if _ALL or ap == "vecchia" or lik in _SAMPLE_LIKS]


@pytest.mark.parametrize("lik,approx", _GRID)
def test_grid(lik, approx, grid_data):
    g = grid_data
    y = _simulate(lik, g["n"], np.random.default_rng(11), g["latent"])
    kw = _model_kwargs(approx, g["n"])
    if (lik, approx) in GUARDED:
        with pytest.raises((NotImplementedError, ValueError)):
            m = GPModel(gp_coords=g["coords"], cov_function="exponential",
                        likelihood=lik, **kw)
            m.neg_log_likelihood(
                cov_pars=[0.1, 1.0, 0.2] if lik == "gaussian"
                else ([1.0, 0.2, 0.5, 0.25]
                      if lik == "gaussian_heteroscedastic"
                      else [1.0, 0.2]),
                y=y)
        return
    m = GPModel(gp_coords=g["coords"], cov_function="exponential",
                likelihood=lik, **kw)
    if lik == "gaussian":
        cp = [0.1, 1.0, 0.2]
    elif lik == "gaussian_heteroscedastic":
        cp = [1.0, 0.2, 0.5, 0.25]
    else:
        cp = [1.0, 0.2]
    nll = m.neg_log_likelihood(cov_pars=cp, y=y)
    assert np.isfinite(nll), f"{lik} x {approx}: non-finite NLL"
    # one optimizer step must run end-to-end
    m.fit(y=y, params={"optimizer_cov": "lbfgs", "maxit": 2,
                       "init_cov_pars": cp})
    assert np.all(np.isfinite(m.get_cov_pars()))
    # prediction must produce finite means and non-negative variances
    pred = m.predict(y=y, gp_coords_pred=g["coords"][:3] + 0.01,
                     cov_pars=cp, predict_var=True)
    assert np.all(np.isfinite(pred["mu"]))
    assert np.all(np.asarray(pred["var"]) >= -1e-8)
