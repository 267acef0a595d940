"""GP random coefficients (spatially varying coefficients, SVC).

Golden values from the reference R test "Gaussian process and two random
coefficients" (test_GPModel_gaussian_process.R:528-598); the fixture data
(coords, Z_SVC, eps_svc, xi) is simulated in tests/conftest.py with the
reference LCG.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel

TOLERANCE_STRICT = 1e-5


@pytest.fixture(scope="module")
def svc(gp_fixture_data):
    d = gp_fixture_data
    y = d["eps_svc"] + d["xi"]
    return dict(y=y, coords=d["coords"], Z=d["Z_SVC"], n=d["n"])


def test_svc_nll_golden(svc):
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_rand_coef_data=svc["Z"])
    nll = m.neg_log_likelihood(
        cov_pars=[0.1, 1.0, 0.1, 0.8, 0.15, 1.1, 0.08], y=svc["y"])
    assert abs(nll - 149.4422184) < 1e-5


def test_svc_prediction_golden(svc):
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_rand_coef_data=svc["Z"])
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    z_test = np.column_stack([[0.1, 0.3, 0.7], [0.5, 0.2, 0.4]])
    cov_pars = [0.1, 1.0, 0.1, 0.8, 0.15, 1.1, 0.08]
    # the R test leaves predict_response at its default (TRUE)
    pred = m.predict(y=svc["y"], gp_coords_pred=coord_test,
                     gp_rand_coef_data_pred=z_test, cov_pars=cov_pars,
                     predict_cov_mat=True, predict_response=True)
    expected_mu = np.array([-0.1669209, 1.6166381, 0.2861320])
    expected_cov = np.array(
        [9.643323e-01, 3.536846e-04, -1.783557e-04,
         3.536846e-04, 5.155009e-01, 4.554321e-07,
         -1.783557e-04, 4.554321e-07, 7.701614e-01]).reshape(3, 3)
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_STRICT
    assert np.sum(np.abs(np.asarray(pred["cov"]) - expected_cov)) \
        < TOLERANCE_STRICT
    pred_v = m.predict(y=svc["y"], gp_coords_pred=coord_test,
                       gp_rand_coef_data_pred=z_test, cov_pars=cov_pars,
                       predict_var=True, predict_response=True)
    assert np.sum(np.abs(pred_v["mu"] - expected_mu)) < TOLERANCE_STRICT
    assert np.sum(np.abs(pred_v["var"] - np.diag(expected_cov))) \
        < TOLERANCE_STRICT


def test_svc_fit_beats_golden_trajectory(svc):
    """The R golden comes from gradient descent STOPPED at maxit=10 — an
    optimizer-trajectory value that is not exactly reproducible (CLAUDE.md);
    instead require that our converged fit reaches a better NLL than the
    reference's 10-step estimates."""
    y = svc["y"]
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_rand_coef_data=svc["Z"])
    m.fit(y=y, params={"optimizer_cov": "lbfgs"})
    expected = np.array([0.25740068, 0.83503539, 0.15039055, 1.61010233,
                         0.09015444, 0.25064640, 0.08720822])
    est = np.asarray(m.get_cov_pars()).ravel()
    nll_est = m.neg_log_likelihood(cov_pars=est, y=y)
    nll_exp = m.neg_log_likelihood(cov_pars=expected, y=y)
    assert np.all(np.isfinite(est)) and est.shape == (7,)
    assert nll_est <= nll_exp + 1e-6


def test_svc_training_data_random_effects(svc):
    """Per-component training-data effects reproduce prediction differences
    (R test :545-562)."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_rand_coef_data=svc["Z"])
    m.fit(y=svc["y"], params={"optimizer_cov": "lbfgs", "maxit": 30})
    tre = m.predict_training_data_random_effects()
    n = svc["n"]
    z0 = np.zeros((n, 2))
    base = m.predict(y=svc["y"], gp_coords_pred=svc["coords"],
                     gp_rand_coef_data_pred=z0, predict_response=False)
    z1 = np.column_stack([np.ones(n), np.zeros(n)])
    p1 = m.predict(y=svc["y"], gp_coords_pred=svc["coords"],
                   gp_rand_coef_data_pred=z1, predict_response=False)
    z2 = np.column_stack([np.zeros(n), np.ones(n)])
    p2 = m.predict(y=svc["y"], gp_coords_pred=svc["coords"],
                   gp_rand_coef_data_pred=z2, predict_response=False)
    assert np.sum(np.abs(tre[:, 0] - base["mu"])) < 1e-4
    assert np.sum(np.abs(tre[:, 1] - (p1["mu"] - base["mu"]))) < 1e-4
    assert np.sum(np.abs(tre[:, 2] - (p2["mu"] - base["mu"]))) < 1e-4
