"""Wendland covariance + covariance-tapering golden-value parity tests.

Expected numbers come from the reference R suite
(``R-package/tests/testthat/test_GPModel_gaussian_process.R:1391-1577``,
blocks "Wendland covariance function" and "Tapering"); data is the same
LCG-simulated fixture, so values are directly comparable. The Wendland mu
parameter follows the reference's dimension rule mu = (1+d)/2 + shape + 1/2
(``re_comp.h:842-845,1821``) — verified bit-exact against the rebuilt
reference library (/tmp/refpkg harness).
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel

TOLERANCE_STRICT = 1e-5
TOLERANCE_MEDIUM = 1e-3
TOLERANCE_LOOSE = 1e-2

COORD_TEST = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])


class TestWendland:
    """R: test_that("Wendland covariance function for Gaussian process
    model") (:1391-1463)."""

    def test_nll(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="wendland",
                    cov_fct_taper_shape=0, cov_fct_taper_range=0.1)
        nll = m.neg_log_likelihood(cov_pars=[0.02, 1.2], y=y)
        assert abs(nll - 136.9508962) < TOLERANCE_STRICT

    def test_predict_taper_shape_1(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="wendland",
                    cov_fct_taper_shape=1, cov_fct_taper_range=2)
        # R's expected cov is on the RESPONSE scale (taper test block calls
        # predict() with default predict_response, diag includes the nugget)
        pred = m.predict(y=y, gp_coords_pred=COORD_TEST,
                         cov_pars=[0.02, 1.2], predict_cov_mat=True,
                         predict_response=True)
        expected_mu = [-0.008405567, 1.493836307, 0.720565199]
        expected_cov = np.array(
            [2.933992e-02, 2.223241e-06, 1.352544e-05, 2.223241e-06,
             2.496193e-02, 1.130906e-05, 1.352544e-05, 1.130906e-05,
             2.405649e-02]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(np.asarray(pred["cov"]) - expected_cov)) \
            < TOLERANCE_STRICT
        pred_v = m.predict(y=y, gp_coords_pred=COORD_TEST,
                           cov_pars=[0.02, 1.2], predict_var=True,
                           predict_response=True)
        assert np.sum(np.abs(pred_v["mu"] - expected_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(np.asarray(pred_v["var"])
                             - np.diag(expected_cov))) < TOLERANCE_STRICT

    def test_fit_fisher_scoring(self, gp_fixture_data):
        """R's FS trajectory stops at (4.94e-9, 1.302) after 6 iterations
        with NLL 137.4235 — an early stop, not the optimum (the rebuilt
        reference harness reproduces it exactly). Our FS continues to the
        true optimum near (0, 1.216) with NLL 136.7032; per the trajectory
        policy we assert we reach at least the reference's likelihood."""
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="wendland",
                    cov_fct_taper_shape=0, cov_fct_taper_range=0.1)
        m.fit(y=y, params={"optimizer_cov": "fisher_scoring",
                           "use_nesterov_acc": False,
                           "delta_rel_conv": 1e-6})
        got = m.get_cov_pars(std_err=True)
        assert got[0, 0] < 1e-6          # nugget -> 0 (R: 4.9e-9)
        assert 1.1 < got[0, 1] < 1.45    # GP var (R early stop: 1.302)
        assert np.all(np.isfinite(got[1]) & (got[1] > 0))
        nll_ref_stop = m.neg_log_likelihood(
            cov_pars=[4.941224e-09, 1.302468], y=y)
        assert abs(nll_ref_stop - 137.4234801) < TOLERANCE_MEDIUM
        assert m.get_current_neg_log_likelihood() <= nll_ref_stop + 1e-6

    def test_predict_taper_shape_1_small_range(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="wendland",
                    cov_fct_taper_shape=1, cov_fct_taper_range=0.15)
        pred = m.predict(y=y, gp_coords_pred=COORD_TEST,
                         cov_pars=[0.02, 1.2], predict_cov_mat=True,
                         predict_response=True)
        expected_mu = [-0.007404038, 1.487424320, 0.200022114]
        expected_cov = np.array(
            [1.113020e+00, 0.0, 0.0, 0.0, 3.522739e-01, 9.018454e-10,
             0.0, 9.018454e-10, 6.092985e-01]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(np.asarray(pred["cov"]) - expected_cov)) \
            < TOLERANCE_STRICT

    def test_predict_taper_shape_2(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="wendland",
                    cov_fct_taper_shape=2, cov_fct_taper_range=0.08)
        pred = m.predict(y=y, gp_coords_pred=COORD_TEST,
                         cov_pars=[0.02, 1.2], predict_cov_mat=True,
                         predict_response=True)
        expected_mu = [-2.314198e-05, 8.967992e-01, 2.430054e-02]
        expected_cov = np.diag([1.22, 0.9024792, 1.1887157])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_STRICT
        assert np.sum(np.abs(np.asarray(pred["cov"]) - expected_cov)) \
            < TOLERANCE_STRICT


class TestTapering:
    """R: test_that("Tapering") (:1466-1577). gp_approx='tapering' applies a
    Wendland correlation taper multiplicatively to the base covariance."""

    def _params(self, f, y, div=3.0):
        iu = np.triu_indices(f["n"], 1)
        return {"optimizer_cov": "gradient_descent", "lr_cov": 0.1,
                "use_nesterov_acc": True, "acc_rate_cov": 0.5,
                "delta_rel_conv": 1e-6, "optimizer_coef": "gradient_descent",
                "lr_coef": 0.1,
                "convergence_criterion":
                    "relative_change_in_log_likelihood",
                "init_cov_pars": [np.var(y, ddof=1) / 2,
                                  np.var(y, ddof=1) / 2,
                                  np.mean(f["D"][iu]) / div]}

    def test_large_taper_range_equals_no_taper_nll(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        m_exact = GPModel(gp_coords=f["coords"], cov_function="exponential")
        m_tap = GPModel(gp_coords=f["coords"], cov_function="exponential",
                        gp_approx="tapering", cov_fct_taper_shape=0,
                        cov_fct_taper_range=1e6)
        nll_e = m_exact.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        nll_t = m_tap.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll_e - nll_t) < TOLERANCE_MEDIUM

    def test_exponential_tapering_fit(self, gp_fixture_data):
        """R: taper range 0.5 -> cov_pars (0.0259, 0.0756, 0.9944, 0.2182,
        0.1771, 0.0980), coefs (2.324, 0.206, 1.895, 0.095) (:1506-1514)."""
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="tapering", cov_fct_taper_shape=0,
                    cov_fct_taper_range=0.5)
        m.fit(y=y, X=f["X"], params=self._params(f, y))
        cov_pars = m.get_cov_pars()
        coefs = m.get_coef()
        expected_cp = np.array([0.02593993, 0.99435221, 0.17712808])
        expected_coef = np.array([2.32410488, 1.89498931])
        np.testing.assert_allclose(cov_pars, expected_cp, rtol=2e-1,
                                   atol=2e-2)
        np.testing.assert_allclose(coefs, expected_coef, rtol=5e-2)

    def test_matern_tapering_nll_and_predict(self, gp_fixture_data):
        """Matern 1.5 + taper shape 1, range 1e6 == exact matern at the R
        optimum; NLL at the R fit optimum = 121.8046544 (:1520-1560)."""
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="matern",
                    cov_fct_shape=1.5, gp_approx="tapering",
                    cov_fct_taper_shape=1, cov_fct_taper_range=1e6)
        # R optimum: cov_pars (0.17384, 0.84112, 0.08839), coef (2.3417,
        # 1.8806), nll at optimum 121.8046544
        X = f["X"]
        fe = X @ np.array([2.34174699, 1.88055706])
        nll = m.neg_log_likelihood(
            cov_pars=[0.17383685, 0.84111654, 0.08839064], y=y,
            fixed_effects=fe)
        assert abs(nll - 121.8046544) < TOLERANCE_MEDIUM
        # prediction parity with the exact matern model at the same pars
        m_exact = GPModel(gp_coords=f["coords"], cov_function="matern",
                          cov_fct_shape=1.5)
        cp = [0.17383685, 0.84111654, 0.08839064]
        r = y - fe
        p_t = m.predict(y=r, gp_coords_pred=COORD_TEST, cov_pars=cp,
                        predict_cov_mat=True, predict_response=False)
        p_e = m_exact.predict(y=r, gp_coords_pred=COORD_TEST, cov_pars=cp,
                              predict_cov_mat=True, predict_response=False)
        assert np.sum(np.abs(p_t["mu"] - p_e["mu"])) < TOLERANCE_MEDIUM
        assert np.sum(np.abs(np.asarray(p_t["cov"]) - np.asarray(p_e["cov"]))) \
            < TOLERANCE_MEDIUM

    def test_matern_general_shape_tapering_nll(self, gp_fixture_data):
        """shape = 1.5 + 1e-4 routes through the general Bessel-K matern;
        tapered NLL must stay close to the 1.5-shortcut value (:1571-1577)."""
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="matern",
                    cov_fct_shape=1.5 + 1e-4, gp_approx="tapering",
                    cov_fct_taper_shape=1, cov_fct_taper_range=1e6)
        fe = f["X"] @ np.array([2.34174699, 1.88055706])
        nll = m.neg_log_likelihood(
            cov_pars=[0.17383685, 0.84111654, 0.08839064], y=y,
            fixed_effects=fe)
        assert abs(nll - 121.8046544) < TOLERANCE_LOOSE

    def test_matern_tapering_small_range_fit(self, gp_fixture_data):
        """R: matern 1.5, taper shape 1, range 0.5 -> cov_pars (0.1897,
        0.0726, 0.8049, 0.2022, 0.1121, 0.0256) (:1561-1570)."""
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="matern",
                    cov_fct_shape=1.5, gp_approx="tapering",
                    cov_fct_taper_shape=1, cov_fct_taper_range=0.5)
        m.fit(y=y, X=f["X"], params=self._params(f, y, div=4.7))
        expected_cp = np.array([0.18970609, 0.80493104, 0.11212289])
        expected_coef = np.array([2.35889350, 1.87422223])
        np.testing.assert_allclose(m.get_cov_pars(), expected_cp,
                                   rtol=2e-1, atol=2e-2)
        np.testing.assert_allclose(m.get_coef(), expected_coef, rtol=5e-2)
