"""drop_intercept_group_rand_effect: random slope without its intercept.

Golden values from the reference R test "Random coefficients with intercept
random effect dropped" (test_GPModel_grouped_random_effects.R:595-660); data
simulated with the mod-134456 LCG defined at the top of that file (:16-22).
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif_boost
from scipy.stats import norm

TOLERANCE_STRICT = 1e-6
TOLERANCE_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def r_grouped_data():
    n, m = 1000, 100
    group = np.repeat(np.arange(1, m + 1), n // m)
    n_gr = n // 20
    group2 = np.tile(np.arange(1, n_gr + 1), n // n_gr)
    i = np.arange(1, n + 1)
    x = np.cos((i - n / 2) ** 2 * 5.5 * np.pi / n)
    b2 = norm.ppf(sim_rand_unif_boost(n_gr, init_c=0.46))
    b3 = norm.ppf(sim_rand_unif_boost(m, init_c=0.69))
    xi = np.sqrt(0.5) * norm.ppf(sim_rand_unif_boost(n, init_c=0.1))
    y = b2[group2 - 1] + x * b3[group - 1] + xi
    return dict(n=n, m=m, n_gr=n_gr, group=group, group2=group2, x=x, y=y)


def _model(d, **kw):
    return GPModel(group_data=np.column_stack([d["group"], d["group2"]]),
                   group_rand_coef_data=d["x"],
                   ind_effect_group_rand_coef=[1],
                   drop_intercept_group_rand_effect=[True, False], **kw)


def test_drop_intercept_requires_slope():
    with pytest.raises(ValueError):
        GPModel(group_data=np.array([1, 1, 2, 2]),
                drop_intercept_group_rand_effect=[True])


def test_drop_intercept_nll_matches_dense(r_grouped_data):
    d = r_grouped_data
    m = _model(d)
    cov_pars = [0.1, 2.0, 1.5]
    nll = m.neg_log_likelihood(cov_pars=cov_pars, y=d["y"])
    # dense numpy: psi = s2 I + v2 Z2 Z2' + v3 Z3 Z3' (no group-1 intercept)
    n = d["n"]
    Z2 = (d["group2"][:, None] == np.arange(1, d["n_gr"] + 1)[None, :]
          ).astype(float)
    Z1 = (d["group"][:, None] == np.arange(1, d["m"] + 1)[None, :]
          ).astype(float)
    Z3 = Z1 * d["x"][:, None]
    psi = 0.1 * np.eye(n) + 2.0 * Z2 @ Z2.T + 1.5 * Z3 @ Z3.T
    L = np.linalg.cholesky(psi)
    al = np.linalg.solve(L, d["y"])
    ref = 0.5 * (al @ al + 2 * np.log(np.diag(L)).sum()
                 + n * np.log(2 * np.pi))
    assert abs(nll - ref) < 1e-6


def test_drop_intercept_fit(r_grouped_data):
    d = r_grouped_data
    m = _model(d)
    m.fit(y=d["y"], params={"optimizer_cov": "lbfgs"})
    # R golden (gradient descent stopped at iteration 7); we target the
    # optimum, so use a loose tolerance (see CLAUDE.md on trajectory goldens)
    expected = np.array([0.5017205, 1.0818474, 1.1157430])
    est = np.asarray(m.get_cov_pars(), dtype=float).ravel()
    assert est.shape == (3,)
    assert np.sum(np.abs(est - expected)) < 5e-2
    # NLL at the R golden parameters must be >= our optimum (within jitter)
    nll_golden = m.neg_log_likelihood(cov_pars=expected, y=d["y"])
    nll_est = m.neg_log_likelihood(cov_pars=est, y=d["y"])
    assert nll_est <= nll_golden + 1e-4


def test_drop_intercept_prediction_golden(r_grouped_data):
    d = r_grouped_data
    m = _model(d)
    group_data_pred = np.column_stack(
        [np.array([1, 1, d["m"] + 1]),
         np.array([2, 1, d["n_gr"] + 1])])
    x_pred = np.array([0.0, 10.0, 0.3])
    # the R test leaves predict_response at its default (TRUE, GPModel.R:1576)
    pred = m.predict(y=d["y"], group_data_pred=group_data_pred,
                     group_rand_coef_data_pred=x_pred,
                     cov_pars=[0.1, 2.0, 1.5], predict_cov_mat=True,
                     predict_response=True)
    expected_mu = np.array([0.8426751, -0.5964363, 0.0])
    expected_cov = np.array(
        [0.10558205, -0.01269261, 0.0,
         -0.01269261, 2.40180871, 0.0,
         0.0, 0.0, 2.235]).reshape(3, 3)
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOLERANCE_STRICT
    assert np.sum(np.abs(np.asarray(pred["cov"]) - expected_cov)) \
        < TOLERANCE_MEDIUM
    pred_v = m.predict(y=d["y"], group_data_pred=group_data_pred,
                       group_rand_coef_data_pred=x_pred,
                       cov_pars=[0.1, 2.0, 1.5], predict_var=True,
                       predict_response=True)
    assert np.sum(np.abs(pred_v["mu"] - expected_mu)) < TOLERANCE_STRICT
    assert np.sum(np.abs(pred_v["var"] - np.diag(expected_cov))) \
        < TOLERANCE_MEDIUM


def test_drop_intercept_training_data_random_effects(r_grouped_data):
    """Training-data random effects line up with predictions at fresh labels
    (test_GPModel_grouped_random_effects.R:609-632)."""
    d = r_grouped_data
    m = _model(d)
    m.fit(y=d["y"], params={"optimizer_cov": "lbfgs"})
    cov_pars = np.asarray(m.get_cov_pars(), dtype=float).ravel()
    all_re = m.predict_training_data_random_effects(predict_var=True)
    # columns: [group2_mean, slope_mean, group2_var, slope_var]
    first1 = np.array([np.argmax(d["group"] == g)
                       for g in np.unique(d["group"])])
    first2 = np.array([np.argmax(d["group2"] == g)
                       for g in np.unique(d["group2"])])
    pred_slopes = all_re[first1][:, [1, 3]]
    pred_crossed = all_re[first2][:, [0, 2]]
    # random slopes: predict at (group_unique, fresh group2 label), x_pred=1
    gu = np.unique(d["group"])
    gp = np.column_stack([gu, np.full(len(gu), -1)])
    preds = m.predict(group_data_pred=gp,
                      group_rand_coef_data_pred=np.ones(len(gu)),
                      predict_var=True, predict_response=False)
    assert np.sum(np.abs(pred_slopes[:, 0] - preds["mu"])) < 1e-5
    assert np.sum(np.abs(pred_slopes[:, 1]
                         - (preds["var"] - cov_pars[1]))) < 1e-5
    # crossed effects: predict at (fresh group label, group2_unique), x_pred=0
    g2u = np.unique(d["group2"])
    gp2 = np.column_stack([np.full(len(g2u), -1), g2u])
    preds2 = m.predict(group_data_pred=gp2,
                       group_rand_coef_data_pred=np.zeros(len(g2u)),
                       predict_var=True, predict_response=False)
    assert np.sum(np.abs(pred_crossed[:, 0] - preds2["mu"])) < 1e-5
    assert np.sum(np.abs(pred_crossed[:, 1] - preds2["var"])) < 1e-5


def test_drop_intercept_save_load(r_grouped_data, tmp_path):
    d = r_grouped_data
    m = _model(d)
    m.fit(y=d["y"], params={"optimizer_cov": "lbfgs"})
    f = str(tmp_path / "m.json")
    m.save_model(f)
    m2 = GPModel.load_model(f)
    gp = np.column_stack([[1], [2]])
    p1 = m.predict(y=d["y"], group_data_pred=gp,
                   group_rand_coef_data_pred=np.array([0.5]),
                   predict_var=True, predict_response=False)
    p2 = m2.predict(y=d["y"], group_data_pred=gp,
                    group_rand_coef_data_pred=np.array([0.5]),
                    predict_var=True, predict_response=False)
    np.testing.assert_allclose(p1["mu"], p2["mu"], atol=1e-8)
    np.testing.assert_allclose(p1["var"], p2["var"], atol=1e-8)


def test_get_cov_pars_std_err_golden():
    """Single-level grouped model: estimates + asymptotic std errors
    (test_GPModel_grouped_random_effects.R:51-58, golden c(0.49348532,
    0.02326312, 1.22299521, 0.17995161) as a [2, p] matrix)."""
    n, mm = 1000, 100
    group = np.repeat(np.arange(1, mm + 1), n // mm)
    b1 = norm.ppf(sim_rand_unif_boost(mm, init_c=0.546))
    xi = np.sqrt(0.5) * norm.ppf(sim_rand_unif_boost(n, init_c=0.1))
    y = b1[group - 1] + xi
    m = GPModel(group_data=group)
    m.fit(y=y, params={"optimizer_cov": "fisher_scoring", "std_dev": True,
                       "convergence_criterion":
                           "relative_change_in_parameters"})
    got = m.get_cov_pars(std_err=True)
    expected = np.array([[0.49348532, 1.22299521],
                         [0.02326312, 0.17995161]])
    assert got.shape == (2, 2)
    assert np.sum(np.abs(got - expected)) < 1e-5
