"""Simulation-based predictive variances for Vecchia-Laplace
(``nsim_var_pred``; reference ``Sample_Posterior_LaplaceApprox_Vecchia``,
likelihoods.h:6818-7121): posterior draws u ~ N(0, (Sigma^-1 + W)^-1) via
matrix-free PCG, latent predictive variance Dp + E[(Bpo u)^2]."""
import numpy as np
import pytest

from gpboost_tpu import GPModel


def _poisson_data(seed=0, n=300):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    Sigma = 0.8 * np.exp(-D / 0.2) + 1e-8 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b = L @ rng.standard_normal(n)
    y = rng.poisson(np.exp(b - 0.5)).astype(float)
    coords_pred = rng.uniform(size=(9, 2))
    return coords, y, coords_pred


def test_sim_variances_converge_to_exact():
    coords, y, coords_pred = _poisson_data()
    cov_pars = [0.8, 0.2]

    m_exact = GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20,
                      vecchia_ordering="none", likelihood="poisson")
    p_exact = m_exact.predict(y=y, gp_coords_pred=coords_pred,
                              cov_pars=cov_pars, predict_var=True,
                              predict_response=False)

    m_sim = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    vecchia_ordering="none", likelihood="poisson")
    m_sim.set_prediction_data(nsim_var_pred=4000)
    p_sim = m_sim.predict(y=y, gp_coords_pred=coords_pred,
                          cov_pars=cov_pars, predict_var=True,
                          predict_response=False)
    # means agree tightly (deterministic up to the mode-finder tolerance)
    np.testing.assert_allclose(p_sim["mu"], p_exact["mu"], atol=2e-3)
    # variances converge at the Monte-Carlo rate
    np.testing.assert_allclose(p_sim["var"], p_exact["var"],
                               rtol=0.1, atol=0.01)


def test_sim_response_scale():
    coords, y, coords_pred = _poisson_data(seed=1)
    cov_pars = [0.8, 0.2]
    m_exact = GPModel(gp_coords=coords, cov_function="exponential",
                      gp_approx="vecchia", num_neighbors=20,
                      vecchia_ordering="none", likelihood="poisson")
    p_exact = m_exact.predict(y=y, gp_coords_pred=coords_pred,
                              cov_pars=cov_pars, predict_var=True,
                              predict_response=True)
    m_sim = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20,
                    vecchia_ordering="none", likelihood="poisson")
    m_sim.set_prediction_data(nsim_var_pred=4000)
    p_sim = m_sim.predict(y=y, gp_coords_pred=coords_pred,
                          cov_pars=cov_pars, predict_var=True,
                          predict_response=True)
    np.testing.assert_allclose(p_sim["mu"], p_exact["mu"], rtol=0.02)
    np.testing.assert_allclose(p_sim["var"], p_exact["var"],
                               rtol=0.12, atol=0.02)


def test_different_seeds_differ_but_agree():
    coords, y, coords_pred = _poisson_data(seed=2)
    out = []
    for seed in (1, 2):
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=15,
                    vecchia_ordering="none", likelihood="poisson")
        m.set_prediction_data(nsim_var_pred=1500)
        m.set_optim_params({"seed_rand_vec_trace": seed})
        out.append(m.predict(y=y, gp_coords_pred=coords_pred,
                             cov_pars=[0.8, 0.2], predict_var=True,
                             predict_response=False)["var"])
    assert not np.array_equal(out[0], out[1])  # genuinely stochastic
    np.testing.assert_allclose(out[0], out[1], rtol=0.15, atol=0.02)


def test_large_n_no_dense_materialization():
    """At n > 20000 the simulation path engages automatically and completes
    without building [n, n] (dense would need >6 GB here)."""
    rng = np.random.default_rng(3)
    n = 20500
    coords = rng.uniform(size=(n, 2))
    y = rng.poisson(1.0, size=n).astype(float)
    coords_pred = rng.uniform(size=(5, 2))
    m = GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=10,
                vecchia_ordering="none", likelihood="poisson")
    m.set_prediction_data(nsim_var_pred=64)
    p = m.predict(y=y, gp_coords_pred=coords_pred, cov_pars=[0.5, 0.1],
                  predict_var=True, predict_response=True)
    assert np.all(np.isfinite(p["mu"])) and np.all(p["var"] > 0)
