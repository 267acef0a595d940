"""GP models with multiple observations at the same location.

Golden values from "Gaussian process model with multiple observations at the
same location" (test_GPModel_gaussian_process.R:643-697) and the Vecchia
variant (:1245-1315). Duplicate coordinates stress the factor builds (zero
distances) and the inducing-point selection (only 25 unique locations).
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_STRICT = 1e-5


@pytest.fixture(scope="module")
def dup():
    n, d = 100, 2
    u = sim_rand_unif(n * d // 4, init_c=0.1)
    cm = np.column_stack([u[:25], u[25:]])
    coords = np.vstack([cm, cm, cm, cm])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-10 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b = sim_rand_normal(n, 0.8)
    eps = L @ b
    xi = sim_rand_normal(n, 0.1) / 5
    return dict(n=n, coords=coords, y=eps + xi, D=D)


def test_dense_fit(dup):
    iu = np.triu_indices(dup["n"], 1)
    uD = dup["D"][dup["D"] > 0]
    v = np.var(dup["y"], ddof=1)
    m = GPModel(gp_coords=dup["coords"], cov_function="exponential")
    m.fit(y=dup["y"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [v / 2, v / 2, np.mean(uD) / 3]})
    assert m.current_nll_ <= 33.43686607 + 1e-4
    # converged optimum = the reference's Fisher-scoring estimates (R:668-671);
    # its GD block stops after 6 iterations short of the optimum
    ref = [0.037136462, 1.153630335, 0.192080613]
    assert np.sum(np.abs(m.get_cov_pars() - ref)) < 1e-4


def test_dense_prediction(dup):
    m = GPModel(gp_coords=dup["coords"], cov_function="exponential")
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    pred = m.predict(y=dup["y"], gp_coords_pred=coord_test,
                     cov_pars=[0.1, 1.0, 0.15], predict_cov_mat=True)
    expected_mu = np.array([-0.1460550, 1.0042814, 0.7840301])
    expected_cov = np.array(
        [0.6739502109, 0.0008824337, -0.0003815281, 0.0008824337,
         0.6060039551, -0.0004157361, -0.0003815281, -0.0004157361,
         0.7851787946]).reshape(3, 3)
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_STRICT
    pred_v = m.predict(y=dup["y"], gp_coords_pred=coord_test,
                       cov_pars=[0.1, 1.0, 0.15], predict_var=True)
    assert np.sum(np.abs(pred_v["var"] - np.diag(expected_cov))) < TOL_STRICT


def test_training_data_random_effects_match_predict(dup):
    """R:674-679: per-point REs equal latent predictions at the training
    coords."""
    m = GPModel(gp_coords=dup["coords"], cov_function="exponential")
    m.fit(y=dup["y"], params={"optimizer_cov": "lbfgs"})
    tre = m.predict_training_data_random_effects(predict_var=True)
    preds = m.predict(y=dup["y"], gp_coords_pred=dup["coords"],
                      predict_var=True, predict_response=False)
    assert np.sum(np.abs(tre[:, 0] - preds["mu"])) < TOL_STRICT
    assert np.sum(np.abs(tre[:, 1] - preds["var"])) < 1e-4


def test_vecchia_all_neighbors_equals_dense(dup):
    cov = [0.1, 1.0, 0.15]
    dense = GPModel(gp_coords=dup["coords"], cov_function="exponential")
    nll_d = dense.neg_log_likelihood(cov_pars=cov, y=dup["y"])
    vec = GPModel(gp_coords=dup["coords"], cov_function="exponential",
                  gp_approx="vecchia", num_neighbors=dup["n"] + 2,
                  vecchia_ordering="none")
    nll_v = vec.neg_log_likelihood(cov_pars=cov, y=dup["y"])
    assert abs(nll_v - nll_d) < 1e-5


def test_vecchia_cond_all_prediction(dup):
    """R:1300-1313: order_obs_first_cond_all with all observations in the
    conditioning set reproduces the dense prediction."""
    m = GPModel(gp_coords=dup["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=dup["n"] + 2,
                vecchia_ordering="none")
    m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_all",
                          num_neighbors_pred=dup["n"] + 2)
    coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
    pred = m.predict(y=dup["y"], gp_coords_pred=coord_test,
                     cov_pars=[0.1, 1.0, 0.15], predict_cov_mat=True)
    expected_mu = np.array([-0.1460550, 1.0042814, 0.7840301])
    expected_cov = np.array(
        [0.6739502109, 0.0008824337, -0.0003815281, 0.0008824337,
         0.6060039551, -0.0004157361, -0.0003815281, -0.0004157361,
         0.7851787946]).reshape(3, 3)
    # duplicates make the conditioning covariance nearly singular; the
    # factored solve agrees with the dense path to ~1e-5 per point
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < 5e-5
    assert np.sum(np.abs(pred["cov"] - expected_cov)) < 5e-5


def test_full_scale_tapering_with_all_unique_inducing(dup):
    """R:658-663: FSA with 25 inducing points (= all unique locations)
    reproduces the dense NLL."""
    cov = [0.1, 1.0, 0.15]
    dense = GPModel(gp_coords=dup["coords"], cov_function="exponential")
    nll_d = dense.neg_log_likelihood(cov_pars=cov, y=dup["y"])
    fsa = GPModel(gp_coords=dup["coords"], cov_function="exponential",
                  gp_approx="full_scale_tapering", num_ind_points=25)
    nll_f = fsa.neg_log_likelihood(cov_pars=cov, y=dup["y"])
    assert abs(nll_f - nll_d) < 1e-4
