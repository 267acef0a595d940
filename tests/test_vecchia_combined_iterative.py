"""Iterative (matrix-free CG) path for combined Vecchia GP + grouped REs.

The reference has NO iterative solver for this combination (it errors on
vecchia+grouped outright for every likelihood); ours extends the
``CGRandomEffectsVec`` pattern (``CG_utils.h:979``) to the Woodbury system
M = I_q + U' Lam^-1 U with the Vecchia precision as Lam^-1. Correctness is
pinned against our own Cholesky-in-q-space path (itself pinned against the
dense combined model at num_neighbors=n-1).
"""
import jax.numpy as jnp
import numpy as np

import gpboost_tpu as gpb


def _sim(n=500, n_groups=40, seed=7):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    group = rng.integers(0, n_groups, size=n)
    b = 0.8 * rng.standard_normal(n_groups)
    y = b[group] + rng.standard_normal(n) * 0.5
    return coords, group, y


def _models(coords, group):
    m_chol = gpb.GPModel(gp_coords=coords, group_data=group,
                         cov_function="exponential", gp_approx="vecchia",
                         num_neighbors=20, vecchia_ordering="none")
    m_iter = gpb.GPModel(gp_coords=coords, group_data=group,
                         cov_function="exponential", gp_approx="vecchia",
                         num_neighbors=20, vecchia_ordering="none",
                         matrix_inversion_method="iterative")
    m_iter.set_optim_params(params={"cg_delta_conv": 1e-6,
                                    "num_rand_vec_trace": 200})
    return m_chol, m_iter


def test_iterative_nll_and_grad_match_cholesky():
    coords, group, y = _sim()
    m_chol, m_iter = _models(coords, group)
    cp = np.array([0.25, 0.6, 1.0, 0.15])
    nll_c = m_chol.neg_log_likelihood(cov_pars=cp, y=y)
    nll_i = m_iter.neg_log_likelihood(cov_pars=cp, y=y)
    # stochastic Lanczos logdet: reference TOLERANCE_ITERATIVE scale
    assert abs(nll_c - nll_i) < 1e-3 * abs(nll_c)
    th = jnp.log(jnp.asarray(cp))
    _, g_c = m_chol._approx._vg_gaussian(th, jnp.asarray(y), None)
    _, g_i = m_iter._approx._vg_gaussian(th, jnp.asarray(y), None)
    np.testing.assert_allclose(np.asarray(g_i), np.asarray(g_c),
                               rtol=0.05, atol=0.1)


def test_iterative_psi_inv_matches_cholesky():
    coords, group, y = _sim(n=300)
    m_chol, m_iter = _models(coords, group)
    cp = jnp.asarray([0.25, 0.6, 1.0, 0.15])
    rng = np.random.default_rng(1)
    R = jnp.asarray(rng.standard_normal((300, 3)))
    p_c = m_chol._approx.psi_inv_mul(cp, R)
    p_i = m_iter._approx.psi_inv_mul(cp, R)
    np.testing.assert_allclose(np.asarray(p_i), np.asarray(p_c),
                               rtol=1e-4, atol=1e-5)


def test_iterative_predictions_match_cholesky():
    coords, group, y = _sim(n=300)
    m_chol, m_iter = _models(coords, group)
    cp = np.array([0.25, 0.6, 1.0, 0.15])
    rng = np.random.default_rng(2)
    coords_p = rng.uniform(size=(5, 2))
    group_p = np.array([0, 1, 2, 999, 999])  # incl. new groups
    pr_c = m_chol.predict(y=y, gp_coords_pred=coords_p, group_data_pred=group_p,
                          cov_pars=cp, predict_var=True)
    pr_i = m_iter.predict(y=y, gp_coords_pred=coords_p, group_data_pred=group_p,
                          cov_pars=cp, predict_var=True)
    np.testing.assert_allclose(pr_i["mu"], pr_c["mu"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pr_i["var"], pr_c["var"], rtol=1e-4, atol=1e-5)
