"""iid models (no random effects — plain (G)LM fitting) and non-Gaussian
coefficient standard errors.

Reference: R ``GPModel.R:553-560`` maps a model without ``group_data`` /
``gp_coords`` to a single-group dummy RE whose variance collapses to the
1e-20 lower bound; goldens from the R suite's "iid model" block
(``test_GPModel_non_Gaussian_data.R:5683-5766``). Coefficient std errors for
non-Gaussian models follow ``CalcStdDevCoefNonGaussian``
(``re_model_template.h:9825``): inverse Hessian of the Laplace NLL over
beta (we use exact autodiff gradients under the outer numerical Jacobian).
"""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

N = 100


@pytest.fixture(scope="module")
def iid_data():
    n = N
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                * 2 * np.pi / n)])
    beta = np.array([0.1, 2.0])
    y = X @ beta + norm.ppf(sim_rand_unif(n, init_c=0.91468)) * 0.1
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 1.0]])
    return dict(X=X, beta=beta, y=y, X_test=X_test)


def test_ctor_requires_num_data():
    with pytest.raises(ValueError, match="num_data"):
        GPModel(likelihood="gaussian")


def test_iid_gaussian_golden(iid_data):
    f = iid_data
    m = GPModel(likelihood="gaussian", num_data=N)
    m.fit(y=f["y"], X=f["X"], params={"std_dev": True})
    cp = m.get_cov_pars(std_err=False)
    # R:5691: c(7.654507e-03, 1e-20) — error var + collapsed dummy RE var
    assert abs(cp[0] - 7.654507e-03) < 1e-6
    assert cp[1] < 1e-6
    coef = m.get_coef(std_err=True)
    np.testing.assert_allclose(coef[0], [0.094720436, 1.987728662],
                               atol=1e-6)
    np.testing.assert_allclose(coef[1], [0.008837829, 0.012498577],
                               atol=1e-6)
    assert abs(m.get_current_neg_log_likelihood() - (-101.7291793)) < 1e-5
    pred = m.predict(X_pred=f["X_test"], predict_var=True,
                     predict_response=False)
    np.testing.assert_allclose(
        pred["mu"], [-0.8991438945, 0.4922661688, 2.0824490983], atol=1e-6)
    assert np.all(pred["var"] < 1e-6)


def test_iid_t_fix_df_golden(iid_data):
    f = iid_data
    m = GPModel(likelihood="t_fix_df", num_data=N)
    m.fit(y=f["y"], X=f["X"], params={"std_dev": True})
    # R:5712-5714 (optimizer-trajectory goldens -> loose tolerances)
    np.testing.assert_allclose(np.asarray(m.get_aux_pars()).ravel()[0],
                               0.0652430469, atol=2e-4)
    coef = m.get_coef(std_err=True)
    np.testing.assert_allclose(coef[0], [0.094283734360, 1.992402552983],
                               atol=1e-4)
    np.testing.assert_allclose(coef[1], [0.009319580548, 0.011695985542],
                               atol=1e-4)
    assert abs(m.get_current_neg_log_likelihood() - (-92.6701562)) < 1e-4
    pred = m.predict(X_pred=f["X_test"], predict_var=True,
                     predict_response=False)
    np.testing.assert_allclose(
        pred["mu"], [-0.9019175421, 0.4927642450, 2.0866862873], atol=1e-4)


def test_iid_binary_logit_golden(iid_data):
    f = iid_data
    y_bin = (sim_rand_unif(N, init_c=0.468)
             < 1.0 / (1.0 + np.exp(-f["X"] @ f["beta"]))).astype(float)
    m = GPModel(likelihood="binary_logit", num_data=N)
    m.fit(y=y_bin, X=f["X"], params={"std_dev": True})
    coef = m.get_coef(std_err=True)
    np.testing.assert_allclose(coef[0], [0.08910433727, 1.57411916970],
                               atol=5e-4)
    np.testing.assert_allclose(coef[1], [0.22947935529, 0.35649689071],
                               atol=5e-4)
    assert abs(m.get_current_neg_log_likelihood() - 56.6742427) < 1e-4
    pr = m.predict(X_pred=f["X_test"], predict_var=True,
                   predict_response=True)
    expected = np.array([0.3322656738, 0.5996311078, 0.8406703427])
    np.testing.assert_allclose(pr["mu"], expected, atol=1e-4)
    np.testing.assert_allclose(pr["var"], expected * (1 - expected),
                               atol=1e-3)


def test_iid_gamma_golden(iid_data):
    f = iid_data
    m = GPModel(likelihood="gamma", num_data=N)
    m.fit(y=np.exp(f["y"]), X=f["X"], params={"std_dev": True})
    np.testing.assert_allclose(np.asarray(m.get_aux_pars()).ravel()[0],
                               131.0965634, atol=0.05)
    coef = m.get_coef(std_err=True)
    np.testing.assert_allclose(coef[0], [0.098623234, 1.986899634],
                               atol=1e-4)
    np.testing.assert_allclose(coef[1], [0.008821832, 0.012429806],
                               atol=1e-4)
    assert abs(m.get_current_neg_log_likelihood() - (-72.4258)) < 1e-3


def test_ng_grouped_coef_std_errs_golden():
    """R:1906-1914 ("linear predictor and grouped REs", Standard
    deviations): bernoulli_probit with one grouped RE + X."""
    n, m_, = 100, 10
    group = np.repeat(np.arange(1, m_ + 1), n // m_)
    b_gr_1 = sim_rand_normal(m_, 0.565)
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2
                                * 2 * np.pi / n)])
    beta = np.array([0.1, 2.0])
    probs = norm.cdf(b_gr_1[group - 1] + X @ beta)
    y = (sim_rand_unif(n, init_c=0.542) < probs).astype(float)
    gp = GPModel(group_data=group, likelihood="bernoulli_probit")
    gp.fit(y=y, X=X, params={"init_cov_pars": [1.0]})
    coef = gp.get_coef(std_err=True)
    # values + SEs (our optimizer trajectory differs from the reference GD
    # run -> medium tolerance at the shared optimum)
    np.testing.assert_allclose(coef[0], [-0.1116235586, 1.5161515464],
                               atol=5e-3)
    np.testing.assert_allclose(coef[1], [0.2568338470, 0.2637361920],
                               atol=5e-3)
