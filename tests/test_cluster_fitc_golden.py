"""cluster_ids under fitc / full_scale_tapering / full_scale_vecchia:
NLL + prediction goldens vs the reference package (/tmp/refpkg, v1.6.5).

The reference loops clusters serially with per-cluster inducing points
(``re_model_template.h:6015``); here ``ClusteredApprox`` composes per-cluster
sub-approximations (models/clustered_approx.py). Data reproduced with
np.random.default_rng(7).
"""
import json
import os

import numpy as np
import pytest

import gpboost_tpu as gpb

GOLD = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                   "cluster_fitc_goldens.json")))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 240
    cid = np.repeat([1, 2], n // 2)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    K = 1.2 * np.exp(-D / 0.25)
    K[:n // 2, n // 2:] = 0.0
    K[n // 2:, :n // 2] = 0.0
    L = np.linalg.cholesky(K + 0.05 * np.eye(n))
    y = L @ rng.standard_normal(n)
    cpp = rng.uniform(size=(12, 2))
    return coords, cid, y, cpp


CP = np.array([0.07, 1.1, 0.22])
CID_P = np.array([1] * 6 + [2] * 6)


def make(approx, coords, cid, k):
    kw = dict(gp_coords=coords, cov_function="exponential",
              gp_approx=approx, num_ind_points=k, cluster_ids=cid,
              likelihood="gaussian")
    if approx == "full_scale_tapering":
        kw["cov_fct_taper_range"] = 0.5
    if approx == "full_scale_vecchia":
        kw["num_neighbors"] = 10
        kw["vecchia_ordering"] = "none"
    return gpb.GPModel(**kw)


# (case, nll rel tol, mu atol, var atol): with num_ind_points = cluster size
# the inducing points equal the data points (no kmeans-RNG dependence) and
# parity is tight; smaller k adds a kmeans-seeding difference between our
# np.default_rng kmeans++ and the reference's std::mt19937 one (which the
# reference also consumes SEQUENTIALLY across clusters), so those cases are
# covered by test_clustered_nll_matches_sum_of_reference_single_models
CASES = [("fitc", 1e-6, 1e-5, 1e-4), ("fsva", 5e-2, 5e-2, 5e-2)]


@pytest.mark.parametrize("name,nll_tol,mu_tol,var_tol", CASES)
def test_clustered_approx_nll_and_predict(name, nll_tol, mu_tol, var_tol,
                                          data):
    coords, cid, y, cpp = data
    g = GOLD[name]
    m = make(g["approx"], coords, cid, g["num_ind_points"])
    nll = m.neg_log_likelihood(cov_pars=CP, y=y)
    assert abs(nll - g["nll"]) < nll_tol * abs(g["nll"])
    pr = m.predict(y=y, gp_coords_pred=cpp, cluster_ids_pred=CID_P,
                   cov_pars=CP, predict_var=True)
    np.testing.assert_allclose(pr["mu"], g["mu"], atol=mu_tol)
    np.testing.assert_allclose(pr["var"], g["var"], atol=var_tol)


def test_clustered_nll_matches_sum_of_reference_single_models(data):
    """k=40 tier: compare against the SUM of the reference's per-cluster
    single-model NLLs (the semantically correct clustered value). NOTE: the
    reference's own clustered full_scale_tapering NLL is structurally
    inconsistent — it returns 118.46 while the sum of its per-cluster FSA
    values is 239.09 (verified against /tmp/refpkg); its clustered FITC
    differs from the per-cluster sum only through the shared-RNG kmeans
    stream (254.07 vs 252.30). We converge to the correct sum."""
    coords, cid, y, cpp = data
    for name, approx, kw in (
            ("fitc40_sum_ref_single", "fitc", {}),
            ("fsa40_sum_ref_single", "full_scale_tapering", {})):
        m = make(approx, coords, cid, 40)
        nll = float(m.neg_log_likelihood(cov_pars=CP, y=y))
        assert abs(nll - GOLD[name]) < 1e-2 * abs(GOLD[name]), (name, nll)


def test_clustered_matches_per_cluster_sum(data):
    """Structural check: the composite NLL equals the sum of the per-cluster
    single-model NLLs exactly (independent clusters factorize)."""
    coords, cid, y, cpp = data
    m = make("fitc", coords, cid, 40)
    total = m.neg_log_likelihood(cov_pars=CP, y=y)
    parts = 0.0
    for c in (1, 2):
        sel = cid == c
        sub = gpb.GPModel(gp_coords=coords[sel], cov_function="exponential",
                          gp_approx="fitc", num_ind_points=40,
                          likelihood="gaussian")
        parts += sub.neg_log_likelihood(cov_pars=CP, y=y[sel])
    assert abs(total - parts) < 1e-8


def test_clustered_fitc_unseen_cluster_prior(data):
    """Unseen prediction clusters get the prior (the reference errors here;
    we return prior mean/variance like the exact clustered path does)."""
    coords, cid, y, cpp = data
    m = make("fitc", coords, cid, 40)
    cid_p = np.array([1] * 6 + [9] * 6)
    pr = m.predict(y=y, gp_coords_pred=cpp, cluster_ids_pred=cid_p,
                   cov_pars=CP, predict_var=True)
    np.testing.assert_allclose(pr["mu"][6:], 0.0, atol=1e-12)
    np.testing.assert_allclose(pr["var"][6:], CP[1] + CP[0], atol=1e-10)


def test_clustered_fitc_fit_runs(data):
    coords, cid, y, cpp = data
    m = make("fitc", coords, cid, 40)
    m.fit(y=y, params={"maxit": 8, "trace": False})
    assert np.all(np.isfinite(m.cov_pars_))
    assert m.current_nll_ < m.neg_log_likelihood(
        cov_pars=np.array([1.0, 1.0, 0.5]), y=y)
