"""ARD Vecchia neighbor re-determination during optimization (VERDICT r3
item 4; reference ``UpdateNearestNeighbors``,
``src/GPBoost/Vecchia_utils.cpp:1231``, driven from
``re_model_template.h:3356,3488``): as ARD length-scales move, the kNN
search re-runs in the SCALED coordinate space where the kernel is isotropic
(``VecchiaGP.ensure_neighbors``, power-of-2 evaluation cadence).

Golden values generated from the reference build at /tmp/refpkg (v1.6.5):
matern_ard(nu=0.5) Vecchia fit, n=500, nn=15, ordering='none', on strongly
anisotropic data (true ranges 0.05 / 0.5 — 10x):

    ref vecchia cov_pars = [0.0391098, 1.8733467, 0.0536649, 0.4316028]
    ref vecchia nll(opt) = 550.7744813
"""
import numpy as np
import pytest

import gpboost_tpu as gpb

REF_COV_PARS = np.array([0.03910980157575392, 1.8733467246712538,
                         0.053664948544046326, 0.43160282231559743])
REF_NLL = 550.7744813335787


@pytest.fixture(scope="module")
def aniso_data():
    rng = np.random.default_rng(11)
    n = 500
    coords = rng.uniform(size=(n, 2))
    D1 = np.abs(coords[:, None, 0] - coords[None, :, 0]) / 0.05
    D2 = np.abs(coords[:, None, 1] - coords[None, :, 1]) / 0.5
    K = 1.5 * np.exp(-np.sqrt(D1 ** 2 + D2 ** 2))
    y = np.linalg.cholesky(K + 0.1 * np.eye(n)) @ rng.standard_normal(n)
    return coords, y


def _fit(coords, y, redetermine=True):
    gp = gpb.GPModel(gp_coords=coords, cov_function="matern_ard",
                     cov_fct_shape=0.5, gp_approx="vecchia",
                     num_neighbors=15, vecchia_ordering="none")
    if not redetermine:
        # freeze the neighbor sets at isotropic-init scaling — the
        # pre-round-3 behavior the VERDICT flagged
        gp._approx.ensure_neighbors(np.array([0.1, 1.0, 1.0, 1.0]))
        gp._approx.ensure_neighbors = lambda *a, **k: None
    gp.fit(y=y, params={"maxit": 200, "trace": False})
    return gp


def test_ard_fit_matches_reference(aniso_data):
    coords, y = aniso_data
    gp = _fit(coords, y)
    # the nugget is sharply identified; sigma2/ranges sit in a flat Vecchia
    # NLL valley (the reference's own exact fit lands 3-8% away from its
    # vecchia fit), so parameter parity is tiered
    np.testing.assert_allclose(gp.cov_pars_[0], REF_COV_PARS[0], rtol=0.05)
    np.testing.assert_allclose(gp.cov_pars_, REF_COV_PARS, rtol=0.15)
    # the recovered ANISOTROPY (range ratio — what redetermination is for)
    # matches the reference tightly
    ratio_ours = gp.cov_pars_[2] / gp.cov_pars_[3]
    ratio_ref = REF_COV_PARS[2] / REF_COV_PARS[3]
    np.testing.assert_allclose(ratio_ours, ratio_ref, rtol=0.05)
    # optimum quality: our NLL at our optimum is as good as the
    # reference's at its optimum
    nll = gp.neg_log_likelihood(cov_pars=gp.cov_pars_, y=y)
    assert nll < REF_NLL + 1.0


def test_fixed_neighbors_are_measurably_worse(aniso_data):
    """Without re-determination the isotropic-init neighbor sets misrepresent
    the anisotropic correlation structure: the same parameter point scores
    several nats worse — the VERDICT's 'fixed-neighbor result differs'."""
    coords, y = aniso_data
    gp = _fit(coords, y, redetermine=True)
    gp_fixed = _fit(coords, y, redetermine=False)
    nll_redet = gp.neg_log_likelihood(cov_pars=gp.cov_pars_, y=y)
    nll_fixed_at_same = gp_fixed.neg_log_likelihood(cov_pars=gp.cov_pars_,
                                                    y=y)
    assert nll_fixed_at_same > nll_redet + 5.0
    # and the fixed-neighbor fit lands on different parameters
    assert not np.allclose(gp_fixed.cov_pars_, gp.cov_pars_, rtol=0.02)
