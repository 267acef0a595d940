"""Non-Gaussian (Laplace) combined GP + grouped random effects.

Golden values from "Binary classification for combined Gaussian process and
grouped random effects" (test_GPModel_non_Gaussian_data.R:1022-1092).
"""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_STRICT = 1e-6
TOL_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def cg():
    n, d, m = 100, 2, 10
    x = sim_rand_unif(n * d, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-20 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b_1 = sim_rand_normal(n, 0.8)
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = sim_rand_normal(m, 0.565)
    probs = norm.cdf(L @ b_1 + b_gr_1[group - 1])
    y = (sim_rand_unif(n, 0.67341) < probs).astype(float)
    return dict(y=y, coords=coords, group=group, D=D, n=n)


def _model(cg):
    return GPModel(gp_coords=cg["coords"], cov_function="exponential",
                   group_data=cg["group"], likelihood="bernoulli_probit")


def test_nll(cg):
    """R:1082-1083: nll(1.1, 0.9, 0.2) = 65.7219266."""
    nll = _model(cg).neg_log_likelihood(cov_pars=[1.1, 0.9, 0.2], y=cg["y"])
    assert abs(nll - 65.7219266) < 1e-5


def test_fit(cg):
    """R:1029-1039: optimum (0.3181509, 1.2788456, 0.1218680), nll
    63.74320741 (converged GD with relative_change_in_parameters)."""
    m = _model(cg)
    iu = np.triu_indices(cg["n"], 1)
    m.fit(y=cg["y"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [1.0, 1.0, np.mean(cg["D"][iu]) / 3]})
    np.testing.assert_allclose(
        m.get_cov_pars(), [0.3181509, 1.2788456, 0.1218680], atol=2e-3)
    assert abs(m.get_current_neg_log_likelihood() - 63.74320741) < TOL_MEDIUM


def test_prediction(cg):
    """Latent predictions at pinned parameters.

    The R-file numbers (R:1041-1063) are evaluated at the R fit's
    full-precision parameters; at the ROUNDED displayed parameters the
    reference v1.6.5 itself (built and run on this machine, same LCG data)
    produces the values below — that is the exact contract tested here.
    The R-file values are used as a loose (1e-2) sanity cross-check."""
    m = _model(cg)
    ref_pars = [0.3181509, 1.2788456, 0.1218680]
    coord_test = np.column_stack([[0.1, 0.21, 0.7], [0.9, 0.91, 0.55]])
    group_test = np.array([1, 3, 9999])
    pred = m.predict(y=cg["y"], gp_coords_pred=coord_test,
                     group_data_pred=group_test, predict_var=True,
                     predict_response=False, cov_pars=ref_pars)
    ref_mu = np.array([0.12096091, -0.95502831, -0.26583917])
    ref_var = np.array([1.06666659, 1.00143252, 1.03427819])
    assert np.sum(np.abs(pred["mu"] - ref_mu)) < 1e-6
    assert np.sum(np.abs(pred["var"] - ref_var)) < 1e-6
    r_file_mu = np.array([0.1217634, -0.9592585, -0.2694489])
    r_file_var = np.array([1.0745455607, 1.0089298170, 1.0449941968])
    assert np.sum(np.abs(pred["mu"] - r_file_mu)) < 1e-2
    assert np.sum(np.abs(pred["var"] - r_file_var)) < 5e-2


def test_training_data_random_effects(cg):
    """R:1066-1074: per-component training-data random effects equal
    component-wise predictions at the training points."""
    m = _model(cg)
    iu = np.triu_indices(cg["n"], 1)
    m.fit(y=cg["y"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [1.0, 1.0, np.mean(cg["D"][iu]) / 3]})
    tre = m.predict_training_data_random_effects()
    pred_gp = m.predict(y=cg["y"], gp_coords_pred=cg["coords"],
                        group_data_pred=-np.ones(cg["n"]),
                        predict_response=False)
    assert np.sum(np.abs(tre[:, 1] - pred_gp["mu"])) < 1e-4
    preds = m.predict(y=cg["y"], gp_coords_pred=cg["coords"],
                      group_data_pred=cg["group"], predict_response=False)
    pred_re = preds["mu"] - pred_gp["mu"]
    assert np.sum(np.abs(tre[:, 0] - pred_re)) < 1e-4
