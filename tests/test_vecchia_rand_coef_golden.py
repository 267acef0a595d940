"""Vecchia approximation with GP random coefficients (SVC).

Golden values from the reference R test "Vecchia approximation for Gaussian
process and two random coefficients" (test_GPModel_gaussian_process.R:
1317-1390); fixture data simulated with the reference LCG in conftest.py.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel

TOL_STRICT = 1e-5

COV_PARS = [0.1, 1.0, 0.1, 0.8, 0.15, 1.1, 0.08]


@pytest.fixture(scope="module")
def svc(gp_fixture_data):
    d = gp_fixture_data
    return dict(y=d["eps_svc"] + d["xi"], coords=d["coords"], Z=d["Z_SVC"],
                n=d["n"])


def test_vecchia_svc_nll_all_neighbors(svc):
    """nn = n+2 -> Vecchia is exact: NLL 149.4422184 (R:1353-1355)."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=svc["n"] + 2,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    nll = m.neg_log_likelihood(cov_pars=COV_PARS, y=svc["y"])
    assert abs(nll - 149.4422184) < TOL_STRICT


def test_vecchia_svc_nll_30_neighbors(svc):
    """nn = 30 -> 149.4840466 (R:1388-1390) — validates the SVC-weighted
    conditioning-set covariances."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    nll = m.neg_log_likelihood(cov_pars=COV_PARS, y=svc["y"])
    assert abs(nll - 149.4840466) < TOL_STRICT


def test_vecchia_svc_prediction_30_neighbors(svc):
    """num_neighbors_pred = 30, cond-obs-only (R:1370-1385: the reference's
    order_obs_first_cond_all reduces to a diagonal prediction covariance
    here; mu matches to 1e-5)."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    m.set_prediction_data(num_neighbors_pred=30)
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    z_test = np.column_stack([[0.1, 0.3, 0.7], [0.5, 0.2, 0.4]])
    pred = m.predict(y=svc["y"], gp_coords_pred=coord_test,
                     gp_rand_coef_data_pred=z_test, cov_pars=COV_PARS,
                     predict_cov_mat=True, predict_response=True)
    expected_mu = np.array([-0.1688452, 1.6181756, 0.2849745])
    expected_cov_diag = np.array([0.9643376, 0.5155030, 0.7702683])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert np.sum(np.abs(np.diag(pred["cov"]) - expected_cov_diag)) \
        < TOL_STRICT
    off = pred["cov"] - np.diag(np.diag(pred["cov"]))
    assert np.max(np.abs(off)) == 0.0


def test_vecchia_svc_prediction_all_neighbors_mu(svc):
    """nn = n+2: the conditioning set is all observed points, so the
    prediction mean equals the exact-GP conditional mean (R:1337-1351)."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=svc["n"] + 2,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    z_test = np.column_stack([[0.1, 0.3, 0.7], [0.5, 0.2, 0.4]])
    pred = m.predict(y=svc["y"], gp_coords_pred=coord_test,
                     gp_rand_coef_data_pred=z_test, cov_pars=COV_PARS,
                     predict_var=True, predict_response=True)
    expected_mu = np.array([-0.1669209, 1.6166381, 0.2861320])
    expected_var = np.array([9.643323e-01, 5.155009e-01, 7.701614e-01])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_STRICT


def test_vecchia_svc_prediction_cond_all(svc):
    """order_obs_first_cond_all with nn = n+2: full predictive covariance
    incl. off-diagonals (R:1336-1351)."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=svc["n"] + 2,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_all")
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    z_test = np.column_stack([[0.1, 0.3, 0.7], [0.5, 0.2, 0.4]])
    pred = m.predict(y=svc["y"], gp_coords_pred=coord_test,
                     gp_rand_coef_data_pred=z_test, cov_pars=COV_PARS,
                     predict_cov_mat=True, predict_response=True)
    expected_mu = np.array([-0.1669209, 1.6166381, 0.2861320])
    expected_cov = np.array(
        [9.643323e-01, 3.536846e-04, -1.783557e-04, 3.536846e-04,
         5.155009e-01, 4.554321e-07, -1.783557e-04, 4.554321e-07,
         7.701614e-01]).reshape(3, 3)
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_STRICT


def test_vecchia_svc_fit_reaches_good_nll(svc):
    """The R golden parameters come from GD stopped at maxit=10 (a
    trajectory value; CLAUDE.md) — instead require the converged lbfgs fit
    to reach at least the NLL of the R 10-iteration parameters."""
    m = GPModel(gp_coords=svc["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", gp_rand_coef_data=svc["Z"])
    m.fit(y=svc["y"], params={"optimizer_cov": "lbfgs", "maxit": 200})
    r_pars = [0.34489931519, 0.79813421101, 0.15144409082, 1.14797483590,
              0.10321260903, 0.32243986621, 0.10613523300]
    nll_r = m.neg_log_likelihood(cov_pars=r_pars, y=svc["y"])
    assert m.current_nll_ <= nll_r + 1e-3
