"""cg_preconditioner_type selection (VERDICT r3 item 3).

Reference surface: ``basic.py:5147-5159`` documents per-regime
preconditioners (vadu default for Vecchia non-Gaussian; pivoted_cholesky /
fitc alternatives; ssor default for grouped REs). The TPU-native mapping:
'vadu' -> Jacobi on diag(Q)+W, 'pivoted_cholesky'/'fitc'/... ->
randomized-Nystrom low-rank+diagonal (ops/cg.py nystrom_preconditioner).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpboost_tpu as gpb
from gpboost_tpu.ops import cg as cgops


def _ill_conditioned_system(n=400, seed=0):
    """SPD matrix with a heavy eigenvalue tail: A = V diag(lam) V' with
    lam spanning 6 orders of magnitude in the top 30 directions."""
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    V, _ = np.linalg.qr(M)
    lam = np.ones(n)
    lam[:30] = np.logspace(6, 1, 30)
    A = (V * lam) @ V.T
    A = 0.5 * (A + A.T)
    return jnp.asarray(A), jnp.asarray(rng.normal(size=(n, 1)))


def test_nystrom_beats_jacobi_iterations():
    A, b = _ill_conditioned_system()
    n = A.shape[0]
    mv = lambda V: A @ V  # noqa: E731
    diag = jnp.diag(A)
    x_j, it_jacobi = cgops.pcg(
        mv, b, lambda r: r / (diag[:, None] if r.ndim == 2 else diag),
        tol=1e-8, max_iter=1000)
    pre = cgops.nystrom_preconditioner(mv, n, 40, jax.random.PRNGKey(0))
    x_n, it_nystrom = cgops.pcg(mv, b, pre.solve, tol=1e-8, max_iter=1000)
    # both converge to the same solution; the deflated system needs
    # far fewer iterations (SURVEY hard-part 5 quality bar)
    np.testing.assert_allclose(np.asarray(x_n), np.asarray(x_j),
                               rtol=1e-4, atol=1e-6)
    assert int(it_nystrom) < 0.5 * int(it_jacobi), (
        f"nystrom {int(it_nystrom)} vs jacobi {int(it_jacobi)}")


def test_nystrom_preconditioner_logdet_and_probes():
    A, _ = _ill_conditioned_system(n=120)
    pre = cgops.nystrom_preconditioner(lambda V: A @ V, 120, 119,
                                       jax.random.PRNGKey(1))
    # at (almost) full rank the Nystrom approximation is essentially exact
    sign, exact = np.linalg.slogdet(np.asarray(A))
    assert sign > 0
    assert float(pre.logdet()) == pytest.approx(exact, rel=5e-2)


def _vecchia_model(seed=0, n=300, preconditioner=None,
                   matrix_inversion_method="iterative"):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    Sig = np.exp(-D / 0.3) + 1e-10 * np.eye(n)
    f = np.linalg.cholesky(Sig) @ rng.standard_normal(n)
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-f))).astype(float)
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=20,
                     likelihood="bernoulli_logit",
                     matrix_inversion_method=matrix_inversion_method)
    params = {"maxit": 2, "init_cov_pars": [1.0, 0.3]}
    if preconditioner is not None:
        params["cg_preconditioner_type"] = preconditioner
    gp.set_optim_params(params)
    gp.fit(y=y)
    return gp, y


def test_vecchia_laplace_precond_values_agree():
    gp_e, y = _vecchia_model(matrix_inversion_method="cholesky")
    nll_exact = gp_e.neg_log_likelihood(cov_pars=[1.0, 0.3], y=y)
    gp_v, _ = _vecchia_model(preconditioner="vadu")
    nll_vadu = gp_v.neg_log_likelihood(cov_pars=[1.0, 0.3], y=y)
    gp_p, _ = _vecchia_model(preconditioner="pivoted_cholesky")
    nll_piv = gp_p.neg_log_likelihood(cov_pars=[1.0, 0.3], y=y)
    # same quantity under different stochastic-logdet preconditioning,
    # both near the dense-Cholesky value (iterative-tier tolerance,
    # reference TOLERANCE_ITERATIVE pattern)
    assert nll_vadu == pytest.approx(nll_exact, rel=2e-2)
    assert nll_piv == pytest.approx(nll_exact, rel=2e-2)


def test_get_num_cg_steps_reflects_choice():
    gp, _ = _vecchia_model(preconditioner="vadu")
    it_vadu = gp.get_num_cg_steps()
    # same fitted model, switch the preconditioner: the count must change
    # (the choice is live, not cosmetic) and high-rank deflation must cut
    # iterations clearly
    gp.set_optim_params({"cg_preconditioner_type": "pivoted_cholesky",
                         "piv_chol_rank": 200})
    it_piv = gp.get_num_cg_steps()
    assert it_piv < 0.7 * it_vadu, (it_piv, it_vadu)


def test_unknown_preconditioner_raises():
    gp, y = _vecchia_model()
    gp.set_optim_params({"cg_preconditioner_type": "does_not_exist"})
    with pytest.raises(ValueError, match="cg_preconditioner_type"):
        gp.neg_log_likelihood(cov_pars=[1.0, 0.3], y=y)


def test_fsva_preconditioner_names():
    """FSVA regime accepts fitc (default) / vifdu and rejects others
    (reference basic.py:5421-5447)."""
    rng = np.random.default_rng(5)
    n = 200
    coords = rng.uniform(size=(n, 2))
    f = np.sin(4 * coords[:, 0])
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-f))).astype(float)

    def make(pre):
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="full_scale_vecchia", num_neighbors=10,
                         num_ind_points=15, likelihood="bernoulli_logit",
                         matrix_inversion_method="iterative")
        gp.set_optim_params({"maxit": 2, "init_cov_pars": [1.0, 0.3],
                             "cg_preconditioner_type": pre})
        return gp

    gp = make("fitc")
    gp.fit(y=y)
    assert gp.cov_pars_ is not None
    gp_bad = make("pivoted_cholesky")
    with pytest.raises(ValueError, match="full_scale_vecchia"):
        gp_bad.fit(y=y)


def test_grouped_unknown_preconditioner_raises():
    rng = np.random.default_rng(0)
    n = 200
    groups = rng.integers(0, 20, size=n)
    y = (rng.uniform(size=n) < 0.5).astype(float)
    gp = gpb.GPModel(group_data=groups, likelihood="bernoulli_logit",
                     matrix_inversion_method="iterative")
    gp.set_optim_params({"maxit": 1,
                         "cg_preconditioner_type": "pivoted_cholesky"})
    with pytest.raises(ValueError, match="grouped random effects"):
        gp.fit(y=y)


def test_grouped_ssor_name_accepted():
    rng = np.random.default_rng(0)
    n = 200
    groups = rng.integers(0, 20, size=n)
    y = (rng.uniform(size=n) < 0.5).astype(float)
    gp = gpb.GPModel(group_data=groups, likelihood="bernoulli_logit",
                     matrix_inversion_method="iterative")
    gp.set_optim_params({"maxit": 2, "cg_preconditioner_type": "ssor"})
    gp.fit(y=y)
    assert gp.cov_pars_ is not None
