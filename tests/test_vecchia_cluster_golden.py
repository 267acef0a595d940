"""Vecchia approximation with cluster_ids (independent GP realizations).

Golden values from the reference R test "Vecchia approximation for Gaussian
process model with cluster_id's not constant" (test_GPModel_gaussian_process
.R:1208-1240). Neighbor eligibility is restricted to same-cluster points
(masked search + -1 padding), replacing the reference's per-cluster maps.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel

TOL_STRICT = 1e-5
TOL_LOOSE = 1e-2


@pytest.fixture(scope="module")
def cl(gp_fixture_data):
    d = gp_fixture_data
    return dict(y=d["eps"] + d["xi"], coords=d["coords"],
                cluster_ids=d["cluster_ids"], n=d["n"])


def test_vecchia_cluster_nll_at_reference_optimum(cl):
    """NLL at the reference's fitted parameters equals its reported
    current_neg_log_likelihood 129.3761486 (R:1216-1218)."""
    m = GPModel(gp_coords=cl["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", cluster_ids=cl["cluster_ids"])
    nll = m.neg_log_likelihood(
        cov_pars=[0.05870373, 1.05572659, 0.12775754], y=cl["y"])
    assert abs(nll - 129.3761486) < 1e-4


def test_vecchia_cluster_fit(cl):
    """Converged fit reaches (at least) the reference optimum; parameters
    land near the reference GD estimates (TOLERANCE_LOOSE in R)."""
    m = GPModel(gp_coords=cl["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", cluster_ids=cl["cluster_ids"])
    m.fit(y=cl["y"], params={"optimizer_cov": "lbfgs", "maxit": 200})
    assert m.current_nll_ <= 129.3761486 + 1e-3
    ref = np.array([0.05870373, 1.05572659, 0.12775754])
    assert np.sum(np.abs(m.cov_pars_ - ref)) < 0.05


def test_vecchia_cluster_prediction_cond_all(cl):
    """order_obs_first_cond_all prediction with a new cluster id (R:1229-
    1240): mu, full covariance matrix (incl. the cross term between the two
    near-duplicate cluster-1 points), prior variance for unseen cluster 3."""
    m = GPModel(gp_coords=cl["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", cluster_ids=cl["cluster_ids"])
    m.set_prediction_data(vecchia_pred_type="order_obs_first_cond_all",
                          num_neighbors_pred=30)
    coord_test = np.column_stack([[0.1, 0.2, 0.1001], [0.9, 0.4, 0.9001]])
    pred = m.predict(y=cl["y"], gp_coords_pred=coord_test,
                     cluster_ids_pred=np.array([1, 3, 1]),
                     cov_pars=[0.1, 1.0, 0.15], predict_cov_mat=True)
    expected_mu = np.array([-0.01438585, 0.0, -0.01500132])
    expected_cov = np.array(
        [0.7430552, 0.0, 0.6423148,
         0.0, 1.1, 0.0,
         0.6423148, 0.0, 0.7434589]).reshape(3, 3)
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_STRICT


def test_vecchia_cluster_prediction_cond_obs_only(cl):
    """cond-obs-only variant: same means, diagonal covariance; the unseen
    cluster gets prior mean 0 and variance sigma2 + nugget."""
    m = GPModel(gp_coords=cl["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", cluster_ids=cl["cluster_ids"])
    m.set_prediction_data(num_neighbors_pred=30)
    coord_test = np.column_stack([[0.1, 0.2, 0.1001], [0.9, 0.4, 0.9001]])
    pred = m.predict(y=cl["y"], gp_coords_pred=coord_test,
                     cluster_ids_pred=np.array([1, 3, 1]),
                     cov_pars=[0.1, 1.0, 0.15], predict_var=True)
    expected_mu = np.array([-0.01438585, 0.0, -0.01500132])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
    assert abs(pred["var"][1] - 1.1) < TOL_STRICT


def test_vecchia_cluster_requires_cluster_ids_pred(cl):
    m = GPModel(gp_coords=cl["coords"], cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30,
                vecchia_ordering="none", cluster_ids=cl["cluster_ids"])
    with pytest.raises(ValueError):
        m.predict(y=cl["y"], gp_coords_pred=np.zeros((2, 2)),
                  cov_pars=[0.1, 1.0, 0.15])
