"""GLMM with offset at n=250,000 (``test_GPModel_non_Gaussian_data.R:608``).

Doubles as a scale test of the Woodbury grouped-Laplace path.
"""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def off():
    n = 250_000
    m = n // 500
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr = np.sqrt(0.5) * sim_rand_normal(m, 0.5455)
    offset = (2 * (sim_rand_unif(m, 0.54) - 0.5))[group - 1]
    probs = norm.cdf(b_gr[group - 1])
    u = sim_rand_unif(n, 0.23431)
    y = (u < probs).astype(float)
    probs_o = norm.cdf(b_gr[group - 1] + offset)
    y_o = (u < probs_o).astype(float)
    return dict(n=n, group=group, offset=offset, y=y, y_o=y_o)


def test_probit_glmm_250k(off):
    """No offset: cov par 0.4872681027 (5 GD iterations in the reference)."""
    m = GPModel(group_data=off["group"], likelihood="bernoulli_probit")
    m.fit(y=off["y"], params={"optimizer_cov": "gradient_descent",
                              "use_nesterov_acc": True, "lr_cov": 0.1,
                              "acc_rate_cov": 0.5, "maxit": 1000})
    np.testing.assert_allclose(m.get_cov_pars(), [0.4872681027], rtol=2e-2)
    pred = m.predict(y=off["y"], group_data_pred=[1, 3, 9999],
                     predict_cov_mat=True, predict_response=False)
    expected_mu = np.array([0.03985967082, -0.42595827038, 0.0])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < 1e-3
    # seen-group posterior variances match the reference; the unseen-group
    # entry is the prior variance = the (slightly trajectory-dependent)
    # fitted parameter itself
    np.testing.assert_allclose(np.diag(pred["cov"])[:2],
                               [0.003123267296, 0.003334889393], atol=5e-4)
    np.testing.assert_allclose(np.diag(pred["cov"])[2], m.get_cov_pars()[0],
                               rtol=1e-6)


def test_probit_glmm_250k_offset(off):
    """With offset: same cov par recovered; predictions use the stored
    offset automatically (reference behavior)."""
    m = GPModel(group_data=off["group"], likelihood="bernoulli_probit")
    m.fit(y=off["y_o"], offset=off["offset"],
          params={"optimizer_cov": "gradient_descent",
                  "use_nesterov_acc": True, "lr_cov": 0.1,
                  "acc_rate_cov": 0.5})
    np.testing.assert_allclose(m.get_cov_pars(), [0.4872681027], rtol=2e-2)
    pred = m.predict(y=off["y_o"], group_data_pred=[1, 3, 9999],
                     predict_cov_mat=True, predict_response=False)
    expected_mu = np.array([0.03985967082, -0.42595827038, 0.0])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < 0.03
