"""Simulation-based Gaussian predictive variances for FSA / FSVA
(``nsim_var_pred``; reference stochastic FSA prediction variances,
``re_model_template.h:10839`` — ours is the Bekas-diagonal variant the
reference documents as its alternative, needing only Psi-solves)."""
import numpy as np
import pytest

import gpboost_tpu as gpb


@pytest.fixture(scope="module")
def sim():
    rng = np.random.default_rng(3)
    n = 400
    coords = rng.uniform(size=(n, 2))
    y = rng.standard_normal(n)
    coords_p = rng.uniform(size=(30, 2))
    return coords, y, coords_p


@pytest.mark.parametrize("approx,kw", [
    ("full_scale_tapering", dict(num_ind_points=50, cov_fct_taper_range=0.5)),
    ("full_scale_vecchia", dict(num_ind_points=50, num_neighbors=15)),
])
def test_sim_var_converges_to_exact(sim, approx, kw):
    coords, y, coords_p = sim
    cp = np.array([0.3, 1.0, 0.2])
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx=approx, **kw)
    pr_exact = m.predict(y=y, gp_coords_pred=coords_p, cov_pars=cp,
                         predict_var=True)
    m.set_prediction_data(nsim_var_pred=4000)
    pr_sim = m.predict(y=y, gp_coords_pred=coords_p, cov_pars=cp,
                       predict_var=True)
    # means are exact (simulation only affects the variance diagonal)
    np.testing.assert_allclose(pr_sim["mu"], pr_exact["mu"], atol=1e-6)
    rel = np.max(np.abs(pr_sim["var"] - pr_exact["var"]) / pr_exact["var"])
    assert rel < 0.25  # reference TOLERANCE_ITERATIVE regime

    # stochastic error shrinks with nsim
    m.set_prediction_data(nsim_var_pred=100)
    pr_small = m.predict(y=y, gp_coords_pred=coords_p, cov_pars=cp,
                         predict_var=True)
    err_small = np.mean(np.abs(pr_small["var"] - pr_exact["var"]))
    err_large = np.mean(np.abs(pr_sim["var"] - pr_exact["var"]))
    assert err_large < err_small


def test_sim_var_never_materializes_np_by_n(sim):
    """The chunked path accepts a prediction set larger than the chunk."""
    coords, y, _ = sim
    rng = np.random.default_rng(9)
    coords_p = rng.uniform(size=(2500, 2))  # > chunk boundary multiple
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="full_scale_vecchia", num_ind_points=50,
                    num_neighbors=15)
    m.set_prediction_data(nsim_var_pred=200)
    pr = m.predict(y=y, gp_coords_pred=coords_p,
                   cov_pars=np.array([0.3, 1.0, 0.2]), predict_var=True)
    assert pr["mu"].shape == (2500,)
    assert np.all(np.isfinite(pr["var"]))
    assert np.all(pr["var"] >= 0)
