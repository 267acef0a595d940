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
