"""Golden-value parity: lognormal, negative_binomial_1, zero-inflated
gamma, and zoctn (zero-one-censored transformed normal) regressions.

Expected numbers from ``test_GPModel_non_Gaussian_data.R`` blocks
"lognormal regression", "negative_binomial_1 regression",
"gamma_zero_inflated regression", "zoctn regression"; same LCG fixture.
"""
import numpy as np
import pytest
from scipy.stats import norm, nbinom, gamma as sgamma

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_STRICT = 1e-5
TOL_MEDIUM = 1e-3

GROUP_TEST = np.array([1, 3, 3, 9999])
X_TEST = np.column_stack([np.ones(4), [-0.5, 0.2, 0.4, 1.0]])
BETA = np.array([0.1, 2.0])


@pytest.fixture(scope="module")
def gr():
    n, m = 100, 10
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = sim_rand_normal(m, 0.565)
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                * 2 * np.pi / n)])
    eta = b_gr_1[group - 1] + 0.5 * (X @ BETA)
    return dict(n=n, group=group, X=X, eta=eta)


class TestLognormal:
    def test_nll_fit_predict(self, gr):
        """R: nll(0.9) = 132.6707012; fit cov 0.45291, aux 0.47372,
        coef (-0.08179, 0.89093), nll 93.36814818."""
        f = gr
        logvar = 0.5
        mq = f["eta"] - 0.5 * logvar
        y = np.exp(mq + np.sqrt(logvar)
                   * norm.ppf(sim_rand_unif(f["n"], 0.913468)))
        m = GPModel(group_data=f["group"], likelihood="lognormal")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=y)
        assert abs(nll - 132.6707012) < TOL_STRICT
        m.fit(y=y, X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 93.36814818) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.4529120267],
                                   rtol=5e-3)
        np.testing.assert_allclose(m.get_aux_pars(), [0.4737246483],
                                   rtol=5e-3)
        np.testing.assert_allclose(
            m.get_coef(), [-0.0817856977, 0.8909274795], atol=2e-3)


class TestNegativeBinomial1:
    def test_nll_fit_predict(self, gr):
        """R: nll(0.9) = 178.2504468; fit cov 0.47944, aux 0.38751,
        coef (-0.18692, 1.22158), nll 147.4626638; latent preds STRICT."""
        f = gr
        mu = np.exp(f["eta"])
        phi = 0.5
        y = nbinom.ppf(sim_rand_unif(f["n"], 0.135456), mu / phi,
                       1.0 / (1.0 + phi))
        m = GPModel(group_data=f["group"], likelihood="negative_binomial_1")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=y)
        assert abs(nll - 178.2504468) < TOL_STRICT
        m.fit(y=y, X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 147.4626638) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.479443183],
                                   rtol=5e-3)
        np.testing.assert_allclose(m.get_aux_pars(), [0.3875111886],
                                   rtol=5e-3)
        np.testing.assert_allclose(
            m.get_coef(), [-0.1869209845, 1.2215795573], atol=2e-3)
        pred = m.predict(y=y, group_data_pred=GROUP_TEST, X_pred=X_TEST,
                         predict_var=True, predict_response=False)
        np.testing.assert_allclose(
            pred["mu"], [-1.50813623680, -0.06547232544, 0.17884358603,
                         1.03465857279], atol=5e-3)
        np.testing.assert_allclose(
            pred["var"], [0.13214360292, 0.09038251055, 0.09038251055,
                          0.47944318296], atol=5e-3)


class TestZeroInflatedGamma:
    @pytest.fixture(scope="class")
    def data(self, gr):
        f = gr
        shape, p0 = 2.0, 0.4
        mu = np.exp(f["eta"])
        zeros = sim_rand_unif(f["n"], 0.237985) <= p0
        y = np.zeros(f["n"])
        nz = ~zeros
        y[nz] = sgamma.ppf(sim_rand_unif(int(nz.sum()), 0.9632), shape,
                           scale=mu[nz] / (shape * (1.0 - p0)))
        return dict(f=f, y=y)

    def test_nll(self, data):
        """R: nll(0.9, aux=(2, 0.4)) = 214.1086486 (aux on the USER scale:
        shape and p0)."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="gamma_zero_inflated")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=data["y"],
                                   aux_pars=[2.0, 0.4])
        assert abs(nll - 214.1086486) < TOL_STRICT

    def test_fit_and_predict_response(self, data):
        """R: cov 0.32003, aux (2.44836, 0.40979), coef (0.09419, 1.14114),
        nll 179.8795333; response preds (closed-form moments) STRICT."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="gamma_zero_inflated")
        m.fit(y=data["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 179.8795333) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.3200318902],
                                   rtol=1e-2)
        np.testing.assert_allclose(
            m.get_aux_pars(), [2.4483553239, 0.4097899503], rtol=1e-2)
        np.testing.assert_allclose(
            m.get_coef(), [0.09419103268, 1.14114390871], atol=5e-3)
        pred = m.predict(y=data["y"], group_data_pred=GROUP_TEST,
                         X_pred=X_TEST, predict_var=True,
                         predict_response=True)
        np.testing.assert_allclose(
            pred["mu"], [0.8268865387, 0.8119288828, 1.0200853052,
                         4.0363906391], rtol=2e-2)
        np.testing.assert_allclose(
            pred["var"], [1.052020624, 1.107172318, 1.747640980,
                          37.250886842], rtol=5e-2)

    def test_negative_label_errors(self, data):
        f = data["f"]
        yt = data["y"].copy()
        yt[-1] = -1e-10
        m = GPModel(group_data=f["group"], likelihood="gamma_zero_inflated")
        with pytest.raises(ValueError):
            m.fit(y=yt, X=f["X"], params={"optimizer_cov": "lbfgs"})


class TestZOCTN:
    @pytest.fixture(scope="class")
    def data(self, gr):
        f = gr
        sd, a, b = 0.5, -0.5, 1.2
        y = norm.ppf(sim_rand_unif(f["n"], 0.74), loc=f["eta"], scale=sd)
        y = np.clip(y, 0.0, 1.0)
        interior = (y > 0) & (y < 1)
        ly = np.log(y[interior] / (1 - y[interior]))
        y[interior] = 1.0 / (1.0 + np.exp(-(a + b * ly)))
        return dict(f=f, y=y)

    def test_nll(self, data):
        """R: nll(0.9, aux=(0.5, -0.5, 1.2)) = 116.2406869 — the
        zero-ONE-censored transformed normal is its own likelihood, with a
        real-valued asymmetry parameter."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="zoctn")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=data["y"],
                                   aux_pars=[0.5, -0.5, 1.2])
        assert abs(nll - 116.2406869) < TOL_STRICT

    def test_fit_and_predict_response(self, data):
        """R: cov 0.29168, aux (0.50462, -0.71481, 1.23869),
        coef (0.02782, 1.01646), nll 59.97448286; response preds STRICT."""
        f = data["f"]
        m = GPModel(group_data=f["group"], likelihood="zoctn")
        m.fit(y=data["y"], X=f["X"], params={"optimizer_cov": "lbfgs"})
        assert abs(m.get_current_neg_log_likelihood() - 59.97448286) \
            < TOL_MEDIUM
        np.testing.assert_allclose(m.get_cov_pars(), [0.2916780257],
                                   rtol=1e-2)
        np.testing.assert_allclose(
            m.get_aux_pars(), [0.5046217166, -0.7148127765, 1.2386879955],
            rtol=1e-2)
        np.testing.assert_allclose(
            m.get_coef(), [0.02781854661, 1.01645519976], atol=5e-3)
        pred = m.predict(y=data["y"], group_data_pred=GROUP_TEST,
                         X_pred=X_TEST, predict_var=True,
                         predict_response=True)
        np.testing.assert_allclose(
            pred["mu"], [0.09604337830, 0.08452576696, 0.14822281001,
                         0.70876044016], atol=5e-3)
        np.testing.assert_allclose(
            pred["var"], [0.04435684115, 0.03864208307, 0.06746643149,
                          0.14055331039], atol=5e-3)

    def test_out_of_range_label_errors(self, data):
        f = data["f"]
        yt = data["y"].copy()
        yt[0] = 1.0 + 1e-10
        m = GPModel(group_data=f["group"], likelihood="zoctn")
        with pytest.raises(ValueError):
            m.fit(y=yt, X=f["X"], params={"optimizer_cov": "lbfgs"})
