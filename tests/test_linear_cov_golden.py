"""Golden tests for the linear covariance function (Bayesian linear
regression kernel K = sigma2 * X X'; reference ``cov_fcts.h`` "linear",
R goldens from ``test_GPModel_non_Gaussian_data.R:4409-4490``
("linear covariance")."""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif

N, D_LIN = 100, 50


@pytest.fixture(scope="module")
def lin_data():
    x = sim_rand_unif(N * D_LIN, init_c=0.1156)
    coords_lin = x.reshape(D_LIN, N).T       # R matrix(x, ncol=50)
    beta_lin = norm.ppf(sim_rand_unif(D_LIN, init_c=0.1234))
    X = np.column_stack([np.ones(N),
                         np.sin((np.arange(1, N + 1) - N / 2) ** 2
                                * 2 * np.pi / N)])
    beta = np.array([0.1, 2.0])
    y = (coords_lin @ beta_lin + X @ beta
         + norm.ppf(sim_rand_unif(N, init_c=0.2224)) * 0.1)
    coord_test = sim_rand_unif(3 * D_LIN, init_c=0.19156).reshape(D_LIN, 3).T
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])
    return dict(coords=coords_lin, X=X, y=y, coord_test=coord_test,
                X_test=X_test)


def test_nll_golden(lin_data):
    f = lin_data
    m = GPModel(gp_coords=f["coords"], cov_function="linear",
                likelihood="gaussian")
    nll = m.neg_log_likelihood(cov_pars=[0.5, 0.9], y=f["y"])
    assert abs(nll - 268.6641569) < 1e-5


def test_fit_and_predict_golden(lin_data):
    f = lin_data
    m = GPModel(gp_coords=f["coords"], cov_function="linear",
                likelihood="gaussian")
    m.fit(y=f["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
    cp = np.asarray(m.get_cov_pars(std_err=False), float).ravel()
    np.testing.assert_allclose(cp, [0.01428942126, 0.92806146725], atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.get_coef(std_err=False)).ravel(),
                               [0.08076221412, 1.97947766605], atol=1e-4)
    assert abs(m.get_current_neg_log_likelihood() - 81.26251299) < 1e-3
    pred = m.predict(y=f["y"], gp_coords_pred=f["coord_test"],
                     X_pred=f["X_test"], predict_var=True,
                     predict_response=False)
    np.testing.assert_allclose(
        pred["mu"], [4.671312214, 3.029084877, 7.400864491], atol=1e-3)
    np.testing.assert_allclose(
        pred["var"], [0.01524446, 0.01621295, 0.01564379], atol=1e-3)


def test_vecchia_all_neighbors_matches_dense(lin_data):
    """R:4477-4490: Vecchia with nn = n-1 reproduces the dense NLL."""
    f = lin_data
    m = GPModel(gp_coords=f["coords"], cov_function="linear",
                likelihood="gaussian", gp_approx="vecchia",
                num_neighbors=N - 1, vecchia_ordering="none")
    nll = m.neg_log_likelihood(cov_pars=[0.5, 0.9], y=f["y"])
    assert abs(nll - 268.6641569) < 1e-5


class TestHurstGolden:
    """R "hurst covariance" block (test_GPModel_non_Gaussian_data.R:
    4754-4830): fBm kernel K = sigma2/2 (r^H + r'^H - d^2H)."""

    @pytest.fixture(scope="class")
    def hurst_data(self):
        from scipy.linalg import cholesky as chol_upper
        n, d = 100, 2
        x = sim_rand_unif(n * d, init_c=0.1)
        coords = np.column_stack([x[:n], x[n:]])
        H, sigma2 = 0.5, 1.0
        r = np.sum(coords ** 2, axis=1)
        D2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
        K = 0.5 * sigma2 * (r[:, None] ** H + r[None, :] ** H - D2 ** H)
        K = K + 1e-8 * np.eye(n)
        U = chol_upper(K)                 # R chol() is UPPER: y = U @ z
        z = norm.ppf(sim_rand_unif(n, init_c=0.1346)) * 0.1
        b = U @ z
        X = np.column_stack([np.ones(n),
                             np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                    * 2 * np.pi / n)])
        beta = np.array([0.1, 2.0])
        y = X @ beta + b + norm.ppf(sim_rand_unif(n, init_c=0.1354)) * 0.1
        coord_test = sim_rand_unif(3 * 2, init_c=0.19156).reshape(2, 3).T
        X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 0.4]])
        return dict(coords=coords, X=X, y=y, coord_test=coord_test,
                    X_test=X_test)

    def test_nll_golden(self, hurst_data):
        f = hurst_data
        m = GPModel(gp_coords=f["coords"], cov_function="hurst",
                    likelihood="gaussian")
        nll = m.neg_log_likelihood(cov_pars=[0.01, 1.0, 0.5], y=f["y"])
        assert abs(nll - 2508.161111) < 1e-4

    def test_vecchia_all_neighbors_matches_dense(self, hurst_data):
        f = hurst_data
        m = GPModel(gp_coords=f["coords"], cov_function="hurst",
                    likelihood="gaussian", gp_approx="vecchia",
                    num_neighbors=N - 1, vecchia_ordering="none")
        nll = m.neg_log_likelihood(cov_pars=[0.01, 1.0, 0.5], y=f["y"])
        assert abs(nll - 2508.161111) < 1e-4

    def test_fit_and_predict_golden(self, hurst_data):
        f = hurst_data
        m = GPModel(gp_coords=f["coords"], cov_function="hurst",
                    likelihood="gaussian")
        m.fit(y=f["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
        cp = np.asarray(m.get_cov_pars(std_err=False), float).ravel()
        # R:4801: fitted GP variance collapses (1.4e-7) with H -> 0.957
        np.testing.assert_allclose(
            cp[0], 2.430011710e-02, atol=1e-4)
        assert cp[1] < 1e-4
        np.testing.assert_allclose(
            np.asarray(m.get_coef(std_err=False)).ravel(),
            [0.06807413795, 2.01626778203], atol=1e-3)
        assert abs(m.get_current_neg_log_likelihood() - (-43.96963741)) < 1e-2
        pred = m.predict(y=f["y"], gp_coords_pred=f["coord_test"],
                         X_pred=f["X_test"], predict_var=True,
                         predict_response=False)
        np.testing.assert_allclose(
            pred["mu"], [-0.9400622610, 0.4713289372, 0.8745803091],
            atol=1e-3)
