"""Golden-value tests for the gaussian_heteroscedastic likelihood.

Expected values from
``R-package/tests/testthat/test_GPModel_non_Gaussian_data.R:3827-3983``
(GPBoost v1.6.5). Note the reference test's data simulation uses
``L2 <- t(chol(Sigma))`` — the ORIGINAL Sigma, not the Sigma2 it defines one
line earlier — so the log-variance GP is simulated with the same Cholesky
factor as the mean GP; we reproduce that exactly.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_MEDIUM = 1e-3
TOL_LOOSE = 1e-2
TOL_ITER = 1e-1


@pytest.fixture(scope="module")
def het_data():
    n, d = 100, 2
    x = sim_rand_unif(n * d, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-20 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b_1 = sim_rand_normal(n, 0.8)
    b_2 = sim_rand_normal(n, 0.834)
    eps = sim_rand_normal(n, 0.1234)
    # R: y <- L %*% b_1 + qnorm(sim_rand_unif(init_c=0.1234)) * exp(0.5*L2 %*% b_2)
    y = L @ b_1 + eps * np.exp(0.5 * (L @ b_2))
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                * 2 * np.pi / n)])
    return dict(n=n, coords=coords, D=D, y=y, X=X)


COV_PARS_EVAL = [1.0, 0.2, 0.1, 0.2]
COEFS_PRED = [0.5, 0.1, 0.5, 0.1]
X_TEST = np.array([[1.0, -0.5], [1.0, 0.2], [1.0, 1.0]])
COORD_TEST = np.array([[0.1, 0.9], [0.11, 0.91], [0.7, 0.55]])


def _model(f, num_neighbors):
    return GPModel(gp_coords=f["coords"], cov_function="exponential",
                   likelihood="gaussian_heteroscedastic", gp_approx="vecchia",
                   num_neighbors=num_neighbors, vecchia_ordering="none")


class TestHeteroscedasticVecchia:
    def test_nll_all_neighbors(self, het_data):
        """R:3845,3908-3910: nll(1,0.2,0.1,0.2) = 199.6831947 (nn = n-1)."""
        f = het_data
        m = _model(f, f["n"] - 1)
        nll = m.neg_log_likelihood(cov_pars=COV_PARS_EVAL, y=f["y"])
        assert abs(nll - 199.6831947) < 1e-4

    def test_nll_less_neighbors(self, het_data):
        """R:3949-3952: nll = 199.6932499 with 20 neighbors."""
        f = het_data
        m = _model(f, 20)
        nll = m.neg_log_likelihood(cov_pars=COV_PARS_EVAL, y=f["y"])
        assert abs(nll - 199.6932499) < 1e-4

    def test_fit(self, het_data):
        """R:3846-3849,3912-3919: BFGS estimation with covariates."""
        f = het_data
        iu = np.triu_indices(f["n"], 1)
        mean_dist = float(f["D"][iu].mean())
        m = _model(f, f["n"] - 1)
        m.fit(y=f["y"], X=f["X"], params={
            "optimizer_cov": "lbfgs", "maxit": 1000,
            "init_cov_pars": [1.0, mean_dist / 3, 0.1, mean_dist / 3]})
        cov_exp = [0.29257505689, 0.16019690150, 0.20398810623, 0.02123292904]
        coef_exp = [0.2573774906, -0.1120390282, 0.6360477105, 0.2961457581]
        assert np.sum(np.abs(m.get_cov_pars() - cov_exp)) < TOL_ITER
        assert np.sum(np.abs(m.get_coef() - coef_exp)) < TOL_ITER
        # our exact-gradient L-BFGS lands slightly BELOW the reference's
        # quasi-gradient stopping point (191.2141 < 191.2306) — assert close
        # and not worse
        nll = m.get_current_neg_log_likelihood()
        assert abs(nll - 191.2306375) < 5e-2
        assert nll < 191.2306375 + TOL_LOOSE

    def test_predict(self, het_data):
        """R:3921-3946: latent + response predictions at 3 test points."""
        f = het_data
        m = _model(f, f["n"] - 1)
        m.fit(y=f["y"], X=f["X"], params={
            "optimizer_cov": "lbfgs", "maxit": 1000,
            "init_cov_pars": COV_PARS_EVAL})
        m.set_optim_params(params={"init_coef": COEFS_PRED})
        m.set_prediction_data(
            vecchia_pred_type="latent_order_obs_first_cond_all",
            num_neighbors_pred=f["n"] + 2)
        expected_mu = [0.06126291, 0.07337373, 0.30807230]
        expected_var = [0.5994207, 0.6014515, 0.3936357]
        expected_var_resp = [2.147623, 2.268682, 2.010216]
        pred = m.predict(y=f["y"], gp_coords_pred=COORD_TEST,
                         predict_var=True, predict_response=False,
                         cov_pars=COV_PARS_EVAL, X_pred=X_TEST)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_LOOSE
        assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_MEDIUM * 10
        pred = m.predict(y=f["y"], gp_coords_pred=COORD_TEST,
                         predict_var=True, predict_response=True,
                         cov_pars=COV_PARS_EVAL, X_pred=X_TEST)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_LOOSE
        assert np.sum(np.abs(pred["var"] - expected_var_resp)) < TOL_LOOSE * 2

    def test_fit_less_neighbors(self, het_data):
        """R:3955-3962: estimation with 30 neighbors."""
        f = het_data
        m = _model(f, 30)
        m.fit(y=f["y"], X=f["X"], params={
            "optimizer_cov": "lbfgs", "maxit": 1000,
            "init_cov_pars": COV_PARS_EVAL})
        cov_exp = [0.29257505689, 0.16019690150, 0.20398810623, 0.02123292904]
        assert np.sum(np.abs(m.get_cov_pars() - cov_exp)) < TOL_ITER
        nll = m.get_current_neg_log_likelihood()
        assert abs(nll - 191.2393688) < 5e-2
        assert nll < 191.2393688 + TOL_LOOSE


class TestHeteroscedasticDense:
    def test_gp_approx_none_matches_dense_golden(self, het_data):
        """gp_approx='none' heteroscedastic (reference dense path,
        expected_nll at R:3845) — internally routed through the EXACT
        all-neighbors Vecchia factorization; user-facing gp_approx stays
        'none'."""
        f = het_data
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    likelihood="gaussian_heteroscedastic", gp_approx="none")
        assert m.gp_approx_user == "none"
        nll = m.neg_log_likelihood(cov_pars=COV_PARS_EVAL, y=f["y"])
        assert abs(nll - 199.6831947) < 1e-4
