"""Vecchia prediction-type fidelity: the five ``vecchia_pred_type`` variants
as DISTINCT algorithms, golden-tested against the reference v1.6.5
(``Vecchia_utils.cpp:1634`` ObservedFirstOrder, ``:2018`` PredictedFirstOrder,
``:2241`` LatentObservedFirstOrder).

Goldens in tests/data/predtype_goldens.json were produced by running the
reference python package on the identical dataset (np.random.default_rng(42),
n=150, exponential kernel, cov_pars=[0.15, 1.1, 0.25], 15 neighbors).
"""
import json
import os

import numpy as np
import pytest

from gpboost_tpu import GPModel

PRED_TYPES = ["order_obs_first_cond_obs_only", "order_obs_first_cond_all",
              "order_pred_first", "latent_order_obs_first_cond_obs_only",
              "latent_order_obs_first_cond_all"]


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(os.path.dirname(__file__), "data",
                        "predtype_goldens.json")
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(42)
    n = 150
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    Sigma = 1.1 * np.exp(-D / 0.25) + 0.15 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    y = L @ rng.standard_normal(n)
    coords_pred = rng.uniform(size=(7, 2))
    return coords, y, coords_pred


@pytest.mark.parametrize("pred_type", PRED_TYPES)
@pytest.mark.parametrize("resp", [True, False])
def test_pred_type_matches_reference(dataset, golden, pred_type, resp):
    coords, y, coords_pred = dataset
    m = GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=15,
                vecchia_ordering="none", likelihood="gaussian")
    m.set_prediction_data(vecchia_pred_type=pred_type, num_neighbors_pred=15)
    p = m.predict(y=y, gp_coords_pred=coords_pred,
                  cov_pars=[0.15, 1.1, 0.25], predict_var=True,
                  predict_response=resp)
    mu_ref, var_ref = golden[f"{pred_type}|{'resp' if resp else 'lat'}"]
    np.testing.assert_allclose(p["mu"], mu_ref, atol=1e-5)
    np.testing.assert_allclose(p["var"], var_ref, atol=1e-5)


def test_pred_types_differ(dataset):
    """The variants are genuinely distinct estimators, not re-labelings."""
    coords, y, coords_pred = dataset
    mus = {}
    for pt in ["order_obs_first_cond_obs_only", "order_pred_first",
               "latent_order_obs_first_cond_obs_only"]:
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=15,
                    vecchia_ordering="none")
        m.set_prediction_data(vecchia_pred_type=pt, num_neighbors_pred=15)
        mus[pt] = m.predict(y=y, gp_coords_pred=coords_pred,
                            cov_pars=[0.15, 1.1, 0.25])["mu"]
    assert not np.allclose(mus["order_obs_first_cond_obs_only"],
                           mus["order_pred_first"], atol=1e-8)
    assert not np.allclose(mus["order_obs_first_cond_obs_only"],
                           mus["latent_order_obs_first_cond_obs_only"],
                           atol=1e-8)


def test_latent_duplicate_train_test_raises(dataset):
    coords, y, _ = dataset
    m = GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=15,
                vecchia_ordering="none")
    m.set_prediction_data(
        vecchia_pred_type="latent_order_obs_first_cond_obs_only",
        num_neighbors_pred=15)
    with pytest.raises(ValueError, match="Duplicates"):
        m.predict(y=y, gp_coords_pred=coords[:3],
                  cov_pars=[0.15, 1.1, 0.25])


def test_all_neighbors_converge_to_exact(dataset):
    """With num_neighbors_pred = n every pred type reproduces the exact GP
    predictive distribution."""
    coords, y, coords_pred = dataset
    n = len(y)
    cov_pars = np.asarray([0.15, 1.1, 0.25])
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    Dpo = np.sqrt(((coords_pred[:, None] - coords[None]) ** 2).sum(-1))
    Koo = cov_pars[1] * np.exp(-D / cov_pars[2]) + cov_pars[0] * np.eye(n)
    Kpo = cov_pars[1] * np.exp(-Dpo / cov_pars[2])
    mu_exact = Kpo @ np.linalg.solve(Koo, y)
    for pt in PRED_TYPES:
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=30,
                    vecchia_ordering="none")
        m.set_prediction_data(vecchia_pred_type=pt,
                              num_neighbors_pred=n + 7)
        p = m.predict(y=y, gp_coords_pred=coords_pred, cov_pars=cov_pars)
        np.testing.assert_allclose(p["mu"], mu_exact, atol=2e-5,
                                   err_msg=pt)
