"""Space-time GP golden-value parity: predictions, Vecchia variants,
orderings, duplicate locations, and the Gneiting covariance.

Expected numbers come from the reference R suite
(``test_GPModel_gaussian_process.R``, block "Space-time Gaussian process
model with linear regression term"); same LCG fixture data.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_STRICT = 1e-5
TOL_MEDIUM = 1e-3
TOL_LOOSE = 1e-2

# R: coord_test <- rbind(c(10000,0.2,0.9), cbind(time, coords)[c(1,10),]);
# coord_test[-1, 2:3] <- ... + 0.01 (built in the fixture below)
X_TEST = np.column_stack([np.ones(3), np.zeros(3)])
COV_PARS_PRED = [1.0, 1.0, 2.0, 0.1]
# the reference fit's coefficients (R: coef = 1.9593121521, 2.1693074509)
COEF_FIT = np.array([1.9593121521, 2.1693074509])
EXPECTED_MU = np.array([1.959312152, 1.940440108, 2.566912825])
EXPECTED_COV = np.array(
    [2.0, 0.0, 0.0,
     0.0, 1.5919472301920, 0.0001229642924,
     0.0, 0.0001229642924, 1.5650143857452]).reshape(3, 3)


@pytest.fixture(scope="module")
def st(gp_fixture_data):
    f = gp_fixture_data
    n = f["n"]
    time = np.arange(1, n + 1, dtype=float)
    us = sim_rand_unif(n, 0.6418)
    nt = 20
    for i in range(1, nt + 1):
        time[(us < i / nt) & (us >= (i - 1) / nt)] = i
    rho_time, rho = 2.0, 0.1
    scaled = np.column_stack([time / rho_time, f["coords"] / rho])
    D_ST = np.sqrt(((scaled[:, None] - scaled[None]) ** 2).sum(-1))
    Sigma = np.exp(-D_ST) + 1e-20 * np.eye(n)
    eps_ST = np.linalg.cholesky(Sigma) @ sim_rand_normal(n, 0.688)
    y = eps_ST + f["X"] @ f["beta"] + f["xi"]
    coords_st = np.column_stack([time, f["coords"]])
    coord_test = np.vstack([[10000.0, 0.2, 0.9],
                            coords_st[0], coords_st[9]])
    coord_test[1:, 1:] += 0.01
    return dict(time=time, y=y, f=f, coords_st=coords_st,
                coord_test=coord_test)


class TestSpaceTimePredictions:
    """R:2307-2321 — exact-model predictions at given cov_pars with the
    reference fit's coefficients."""

    def test_dense_predict(self, st):
        """mu = X_pred beta_hat + GP posterior on residuals y - X beta_hat
        (equivalent to R's predict-after-fit with cov_pars given)."""
        f = st["f"]
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5)
        r = st["y"] - f["X"] @ COEF_FIT
        pred = m.predict(y=r, gp_coords_pred=st["coord_test"],
                         cov_pars=COV_PARS_PRED, predict_cov_mat=True,
                         predict_response=True)
        mu = pred["mu"] + X_TEST @ COEF_FIT
        assert np.sum(np.abs(mu - EXPECTED_MU)) < TOL_STRICT
        assert np.sum(np.abs(np.asarray(pred["cov"]) - EXPECTED_COV)) \
            < TOL_STRICT


class TestSpaceTimeVecchia:
    """R:2366-2462 — Vecchia on the space-time model."""

    def test_nll_all_neighbors(self, st):
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=st["f"]["n"] - 1,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2], y=st["y"])
        assert abs(nll - 272.1497719) < TOL_STRICT

    def test_nll_50_neighbors(self, st):
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=50,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2], y=st["y"])
        assert abs(nll - 272.1376522) < TOL_STRICT

    def test_nll_time_ordering(self, st):
        """R: nll 272.1498125 at nn=50 with vecchia_ordering='time'
        (tolerance LOOSE — the within-time tie order is impl-defined)."""
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=50,
                    vecchia_ordering="time")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2], y=st["y"])
        assert abs(nll - 272.1498125) < TOL_LOOSE

    def test_nll_time_random_space_ordering(self, st):
        """R: nll 272.1498202 at nn=50 (LOOSE; random tie-break differs)."""
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=50,
                    vecchia_ordering="time_random_space")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2], y=st["y"])
        assert abs(nll - 272.1498202) < TOL_LOOSE

    def test_time_ordering_requires_space_time_kernel(self, st):
        with pytest.raises(ValueError):
            GPModel(gp_coords=st["f"]["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="time")

    def test_predict_cond_all(self, st):
        """R:2404-2414 — order_obs_first_cond_all predictions match the
        exact-model values at nn = n-1 (STRICT)."""
        f = st["f"]
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=f["n"] - 1,
                    vecchia_ordering="none")
        m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_all",
                              num_neighbors_pred=f["n"] + 2)
        r = st["y"] - f["X"] @ COEF_FIT
        pred = m.predict(y=r, gp_coords_pred=st["coord_test"],
                         cov_pars=COV_PARS_PRED, predict_cov_mat=True,
                         predict_response=True)
        mu = pred["mu"] + X_TEST @ COEF_FIT
        assert np.sum(np.abs(mu - EXPECTED_MU)) < TOL_STRICT
        assert np.sum(np.abs(np.asarray(pred["cov"]) - EXPECTED_COV)) \
            < TOL_STRICT

    def test_predict_cond_obs_only(self, st):
        """R:2415-2424 — cond-obs-only: mu STRICT, var STRICT at nn=n."""
        f = st["f"]
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="matern_space_time", cov_fct_shape=0.5,
                    gp_approx="vecchia", num_neighbors=f["n"] - 1,
                    vecchia_ordering="none")
        m.set_prediction_data(
            vecchia_pred_type="order_obs_first_cond_obs_only",
            num_neighbors_pred=f["n"])
        r = st["y"] - f["X"] @ COEF_FIT
        pred = m.predict(y=r, gp_coords_pred=st["coord_test"],
                         cov_pars=COV_PARS_PRED, predict_var=True,
                         predict_response=True)
        mu = pred["mu"] + X_TEST @ COEF_FIT
        assert np.sum(np.abs(mu - EXPECTED_MU)) < TOL_STRICT
        assert np.sum(np.abs(np.asarray(pred["var"])
                             - np.diag(EXPECTED_COV))) < TOL_STRICT


class TestSpaceTimeDuplicateLocations:
    """R:2466-2500 — first 5 rows replaced by the last 5 (duplicates)."""

    def test_nll_dense_and_vecchia(self, st):
        f = st["f"]
        coords_dup = st["coords_st"].copy()
        coords_dup[:5] = coords_dup[-5:]
        m = GPModel(gp_coords=coords_dup, cov_function="matern_space_time",
                    cov_fct_shape=0.5)
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2], y=st["y"])
        assert abs(nll - 276.47191976324) < TOL_STRICT
        mv = GPModel(gp_coords=coords_dup, cov_function="matern_space_time",
                     cov_fct_shape=0.5, gp_approx="vecchia",
                     num_neighbors=f["n"] - 1, vecchia_ordering="none")
        nll_v = mv.neg_log_likelihood(cov_pars=[0.1, 1.6, 1.0, 0.2],
                                      y=st["y"])
        assert abs(nll_v - 276.47191976324) < TOL_STRICT


class TestGneiting:
    """R:2503-2511 — Gneiting space-time covariance golden NLL."""

    def test_nll(self, st):
        m = GPModel(gp_coords=st["coords_st"],
                    cov_function="space_time_gneiting", cov_fct_shape=0.5)
        nll = m.neg_log_likelihood(
            cov_pars=[0.1, 1.0, 0.2, 2.0, 0.5, 1.5, 0.5, 2.0], y=st["y"])
        assert abs(nll - 604.779654987741) < TOL_STRICT
