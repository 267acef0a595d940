"""Vecchia approximation golden-value tests.

References: ``test_GPModel_gaussian_process.R`` "Vecchia approximation..."
blocks (:702-780) and ``test_GPModel_non_Gaussian_data.R:1165-1340``.
"""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif

TOL_STRICT = 1e-5
TOL_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def vf(gp_fixture_data):
    return gp_fixture_data


class TestVecchiaGaussian:
    def test_nll_all_neighbors_equals_exact(self, vf):
        """nn = n-1, ordering none -> exact NLL 124.2549533 (R:711-716)."""
        y = vf["eps"] + vf["xi"]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=vf["n"] - 1,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < TOL_STRICT

    def test_nll_30_neighbors(self, vf):
        """nn = 30 -> 124.2252524 (R:744-749) — validates neighbor search."""
        y = vf["eps"] + vf["xi"]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2252524) < TOL_STRICT

    def test_fit_with_covariates(self, vf):
        """lbfgs fit w/ X (R:766-780): cov ~ (0.00899, 1.00052, 0.09468),
        coef ~ (2.30974, 1.89989)."""
        y = vf["eps"] + vf["X"] @ vf["beta"] + vf["xi"]
        iu = np.triu_indices(vf["n"], 1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(vf["D"][iu]) / 3]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=vf["n"] + 2,
                    vecchia_ordering="none")
        m.fit(y=y, X=vf["X"], params={"optimizer_cov": "lbfgs",
                                      "init_cov_pars": init})
        np.testing.assert_allclose(
            m.get_coef(), [2.309738418, 1.899886232], atol=5e-2)
        cov = m.get_cov_pars()
        assert abs(cov[1] - 1.000518636089) < 0.1
        assert abs(cov[2] - 0.094683724304) < 0.02

    def test_fit_gd_no_covariates(self, vf):
        """GD fit, nn=30, random ordering: should land near exact optimum."""
        y = vf["eps"] + vf["xi"]
        iu = np.triu_indices(vf["n"], 1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(vf["D"][iu]) / 3]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="random", seed=1)
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "init_cov_pars": init})
        cov = m.get_cov_pars()
        # exact-model optimum is (0.0328, 1.0761, 0.1135); vecchia is close
        assert abs(cov[1] - 1.076) < 0.2
        assert abs(cov[2] - 0.1135) < 0.05

    def test_prediction_close_to_exact(self, vf):
        """Vecchia prediction with many neighbors ~ exact prediction."""
        y = vf["eps"] + vf["xi"]
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=vf["n"] - 1,
                    vecchia_ordering="none")
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         cov_pars=[0.02, 1.2, 0.9], predict_var=True)
        expected_mu = np.array([0.08704577, 1.63875604, 0.48513581])
        expected_var = np.array([1.189093e-01, 7.427727e-02, 8.107455e-02])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_MEDIUM


class TestVecchiaLaplace:
    def test_probit_nll_matches_exact(self, vf):
        """Vecchia-Laplace nn=n-1 == exact Laplace NLL (67.18342059 at
        cov (1, 0.2), y from init_c=0.19341; R:1296-1297 expected_nll)."""
        probs = norm.cdf(vf["eps"])  # eps = C @ b_1 from the shared fixture
        y = (sim_rand_unif(vf["n"], 0.19341) < probs).astype(float)
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="vecchia",
                    num_neighbors=vf["n"] - 1, vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[1.0, 0.2], y=y)
        assert abs(nll - 67.18342059) < 1e-4

    def test_probit_fit(self, vf):
        """R:1270-1277: fit -> cov (0.92350821, 0.05944214), coefs
        (0.3983333, -0.2653886)."""
        probs = norm.cdf(vf["eps"])
        y = (sim_rand_unif(vf["n"], 0.19341) < probs).astype(float)
        iu = np.triu_indices(vf["n"], 1)
        init = [1.0, np.mean(vf["D"][iu]) / 3]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="vecchia",
                    num_neighbors=vf["n"] - 1, vecchia_ordering="none")
        m.fit(y=y, X=vf["X"], params={"optimizer_cov": "gradient_descent",
                                      "lr_cov": 0.1, "use_nesterov_acc": True,
                                      "acc_rate_cov": 0.5,
                                      "init_cov_pars": init})
        np.testing.assert_allclose(m.get_cov_pars(),
                                   [0.92350821208, 0.05944214192], atol=5e-2)
        np.testing.assert_allclose(m.get_coef(),
                                   [0.3983333, -0.2653886], atol=5e-2)

    def test_poisson_vecchia_runs(self, vf):
        mu = np.exp(vf["eps"])
        from scipy.stats import poisson as spois
        y = spois.ppf(sim_rand_unif(vf["n"], 0.435), mu)
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    likelihood="poisson", gp_approx="vecchia",
                    num_neighbors=20, vecchia_ordering="none")
        m.fit(y=y, params={"optimizer_cov": "lbfgs",
                           "init_cov_pars": [1.0, 0.1]})
        assert np.all(np.isfinite(m.get_cov_pars()))
        pred = m.predict(y=y, gp_coords_pred=vf["coords"][:5],
                         predict_var=True, predict_response=True)
        assert np.all(np.isfinite(pred["mu"]))


class TestVecchiaLatent:
    def test_nll_matches_exact(self, vf):
        """R:717-722: vecchia_latent nn=n-1 with aux nugget == exact NLL."""
        y = vf["eps"] + vf["xi"]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia_latent", num_neighbors=vf["n"] - 1,
                    vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[1.6, 0.2], y=y, aux_pars=[0.1])
        assert abs(nll - 124.2549533) < TOL_STRICT

    def test_fit_recovers_optimum(self, vf):
        y = vf["eps"] + vf["xi"]
        m = GPModel(gp_coords=vf["coords"], cov_function="exponential",
                    gp_approx="vecchia_latent", num_neighbors=vf["n"] - 1,
                    vecchia_ordering="none")
        m.fit(y=y, params={"optimizer_cov": "lbfgs",
                           "init_cov_pars": [np.var(y) / 2, np.var(y) / 2,
                                             0.2]})
        # exact-model optimum: var 1.0761, range 0.1135, nugget 0.0328
        np.testing.assert_allclose(m.get_cov_pars(), [1.0761, 0.1135],
                                   rtol=5e-2)
        np.testing.assert_allclose(m.get_aux_pars(), [0.0328], rtol=2e-1)
