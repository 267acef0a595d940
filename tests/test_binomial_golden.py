"""Binomial / beta-binomial regression golden-value parity tests.

Expected numbers from ``test_GPModel_non_Gaussian_data.R`` blocks
"binomial regression" and "betabinomial regression"; same LCG fixture.
Convention: y = successes / trials, trials passed via ``weights``
(``likelihoods.h:30-56``).
"""
import numpy as np
import pytest
from scipy.stats import poisson as spoisson, binom as sbinom, beta as sbeta

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif

TOL_STRICT = 1e-5
TOL_MEDIUM = 1e-3

GROUP_TEST = np.array([1, 3, 3, 9999])
X_TEST = np.column_stack([np.ones(4), [-0.5, 0.2, 0.4, 1.0]])
BETA = np.array([0.1, 2.0])


@pytest.fixture(scope="module")
def bin_data(ng_shared):
    return ng_shared


@pytest.fixture(scope="module")
def ng_shared():
    n, m = 100, 10
    from gpboost_tpu.utils.rng import sim_rand_normal
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = sim_rand_normal(m, 0.565)
    Z1b = b_gr_1[group - 1]
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                * 2 * np.pi / n)])
    return dict(n=n, group=group, Z1b=Z1b, X=X)


class TestBinomialLogit:
    @pytest.fixture(scope="class")
    def data(self, ng_shared):
        f = ng_shared
        mu = f["Z1b"] + 0.5 * (f["X"] @ BETA)
        p = 1.0 / (1.0 + np.exp(-mu))
        ntrial = spoisson.ppf(sim_rand_unif(f["n"], 0.9146), 5.0)
        y_cnt = sbinom.ppf(sim_rand_unif(f["n"], 0.146), ntrial, p)
        with np.errstate(invalid="ignore"):
            y = np.where(ntrial > 0, y_cnt / np.maximum(ntrial, 1.0), 0.0)
        return dict(f=f, y=y, ntrial=ntrial)

    def test_nll(self, data):
        """R: nll(0.9) = 164.4059537."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="binomial_logit",
                    weights=data["ntrial"])
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=data["y"])
        assert abs(nll - 164.4059537) < TOL_STRICT

    def test_fit_and_predict(self, data):
        """R: cov 0.27446, coef (-0.00528, 0.79835), nll 145.3393856;
        latent + response predictions STRICT."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="binomial_logit",
                    weights=data["ntrial"])
        m.fit(y=data["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 145.3393856) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.2744642669],
                                   rtol=1e-3)
        np.testing.assert_allclose(
            m.get_coef(), [-0.005279993048, 0.798354476357], atol=1e-3)
        pred = m.predict(y=data["y"], group_data_pred=GROUP_TEST,
                         X_pred=X_TEST, predict_var=True,
                         predict_response=False)
        np.testing.assert_allclose(
            pred["mu"], [-0.05764418646, -0.10010510651, 0.05956578876,
                         0.79307448331], atol=5e-3)
        np.testing.assert_allclose(
            pred["var"], [0.06017870123, 0.08217586719, 0.08217586719,
                          0.27446426691], atol=5e-3)
        pred_r = m.predict(y=data["y"], group_data_pred=GROUP_TEST,
                           X_pred=X_TEST, predict_var=True,
                           predict_response=True)
        np.testing.assert_allclose(
            pred_r["mu"], [0.4858032665, 0.4754871830, 0.5145933378,
                           0.6784515040], atol=5e-3)
        np.testing.assert_allclose(
            pred_r["var"], [0.2497984528, 0.2493991218, 0.2497870345,
                            0.2181550607], atol=5e-3)


class TestBetaBinomial:
    @pytest.fixture(scope="class")
    def data(self, ng_shared):
        f = ng_shared
        eta = f["Z1b"] + 0.5 * (f["X"] @ BETA)
        mu = 1.0 / (1.0 + np.exp(-eta))
        phi = 2.0
        p = sbeta.ppf(sim_rand_unif(f["n"], 0.5940), mu * phi,
                      (1.0 - mu) * phi)
        ntrial = spoisson.ppf(sim_rand_unif(f["n"], 0.15468), 5.0) + 1.0
        y = sbinom.ppf(sim_rand_unif(f["n"], 0.146), ntrial, p) / ntrial
        return dict(f=f, y=y, ntrial=ntrial)

    def test_nll(self, data):
        """R: nll(0.9) = 220.9211521."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="beta_binomial",
                    weights=data["ntrial"])
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=data["y"])
        assert abs(nll - 220.9211521) < TOL_STRICT

    def test_fit_and_predict_response(self, data):
        """R: cov 0.11847, coef (0.00541, 0.69807), nll 180.6305215;
        response predictions (delta-method moments) STRICT."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="beta_binomial",
                    weights=data["ntrial"])
        m.fit(y=data["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 180.6305215) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.1184719163],
                                   rtol=1e-2)
        np.testing.assert_allclose(
            m.get_coef(), [0.005406537788, 0.698069670326], atol=1e-3)
        pred = m.predict(y=data["y"], group_data_pred=GROUP_TEST,
                         X_pred=X_TEST, predict_var=True,
                         predict_response=True)
        np.testing.assert_allclose(
            pred["mu"], [0.4109065594, 0.4323400890, 0.4662659760,
                         0.6645252609], atol=5e-3)
        np.testing.assert_allclose(
            pred["var"], [0.2420650863, 0.2454235695, 0.2488623825,
                          0.2229510881], atol=5e-3)
