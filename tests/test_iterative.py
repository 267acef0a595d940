"""Iterative methods: PCG, stochastic Lanczos logdet, preconditioners.

Tolerances follow the reference's TOLERANCE_ITERATIVE = 1e-1 regime
(``test_GPModel_gaussian_process.R:6``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.ops import cg as cgops
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal


@pytest.fixture(scope="module")
def spd():
    rng = np.random.default_rng(0)
    n = 200
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T / n + np.eye(n)
    return jnp.asarray(A)


def test_pcg_solves(spd):
    A = spd
    n = A.shape[0]
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.standard_normal((n, 3)))
    X, it = cgops.pcg(lambda V: A @ V, B, tol=1e-10, max_iter=500)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), atol=1e-6)


def test_pcg_preconditioned_converges_faster(spd):
    A = np.asarray(spd)
    # make it ill-conditioned
    d = np.exp(np.linspace(0, 6, A.shape[0]))
    A_ill = jnp.asarray(A * np.sqrt(np.outer(d, d)))
    n = A.shape[0]
    b = jnp.asarray(np.random.default_rng(2).standard_normal((n, 1)))
    _, it_plain = cgops.pcg(lambda V: A_ill @ V, b, tol=1e-8, max_iter=2000)
    diag = jnp.diagonal(A_ill)
    _, it_pre = cgops.pcg(lambda V: A_ill @ V, b,
                          lambda R: R / diag[:, None], tol=1e-8,
                          max_iter=2000)
    assert int(it_pre) < int(it_plain)


def test_stochastic_logdet_value_and_grad(spd):
    A_np = np.asarray(spd)
    n = A_np.shape[0]
    exact = float(np.linalg.slogdet(A_np)[1])

    diag = jnp.diagonal(spd)
    pre = cgops.JacobiPreconditioner(diag)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    Z = pre.sample_probes(k1, 500)
    Zg = cgops.rademacher_probes(k2, n, 500)

    def logdet_of_scale(s):
        return cgops.stochastic_logdet_grad(
            lambda V: s * (spd @ V), None, Z, 60, pre.solve, pre.logdet(),
            cg_tol=1e-8, probes_grad=Zg)

    v, g = jax.value_and_grad(logdet_of_scale)(1.0)
    # value: logdet(A) but the preconditioner was built for A, probes for P:
    # d/ds logdet(sA) = n / s = n
    assert abs(float(v) - exact) / abs(exact) < 0.05
    assert abs(float(g) - n) / n < 0.05


def test_lowrank_diag_preconditioner(spd):
    n = spd.shape[0]
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((n, 10)))
    d = jnp.asarray(np.abs(rng.standard_normal(n)) + 1.0)
    P = cgops.LowRankDiagPreconditioner.create(U, d)
    P_dense = np.asarray(U @ U.T) + np.diag(np.asarray(d))
    R = jnp.asarray(rng.standard_normal((n, 2)))
    np.testing.assert_allclose(np.asarray(P.solve(R)),
                               np.linalg.solve(P_dense, np.asarray(R)),
                               atol=1e-8)
    assert abs(float(P.logdet()) - np.linalg.slogdet(P_dense)[1]) < 1e-8


class TestIterativeVecchiaLaplace:
    def test_nll_close_to_exact(self, gp_fixture_data):
        f = gp_fixture_data
        y = (sim_rand_unif(f["n"], 0.2341) < norm.cdf(f["eps"])).astype(float)
        m_ex = GPModel(gp_coords=f["coords"], cov_function="exponential",
                       likelihood="bernoulli_probit", gp_approx="vecchia",
                       num_neighbors=30, vecchia_ordering="none")
        nll_ex = m_ex.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        m_it = GPModel(gp_coords=f["coords"], cov_function="exponential",
                       likelihood="bernoulli_probit", gp_approx="vecchia",
                       num_neighbors=30, vecchia_ordering="none",
                       matrix_inversion_method="iterative")
        m_it.set_optim_params({"num_rand_vec_trace": 1000})
        nll_it = m_it.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        assert abs(nll_it - nll_ex) < 0.25  # reference iterative tolerance

    def test_fit_iterative(self, gp_fixture_data):
        f = gp_fixture_data
        y = (sim_rand_unif(f["n"], 0.19341) < norm.cdf(f["eps"])).astype(float)
        iu = np.triu_indices(f["n"], 1)
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="vecchia",
                    num_neighbors=f["n"] - 1, vecchia_ordering="none",
                    matrix_inversion_method="iterative")
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "maxit": 30,
                           "init_cov_pars": [1.0, np.mean(f["D"][iu]) / 3]})
        # reference golden (no covariates): cov close to (0.6876, 0.1063)
        # within iterative tolerance
        cov = m.get_cov_pars()
        assert abs(cov[0] - 0.6875476) < 0.2
        assert abs(cov[1] - 0.1062862) < 0.05


class TestOptimalCVarianceReduction:
    """Optimal-c control-variate trace estimation (CalcOptimalC,
    CG_utils.h:399,413): unbiased split-half estimator; gradients stay close
    to the exact dense gradient."""

    def test_vr_gradient_close_to_exact(self):
        import jax
        import jax.numpy as jnp
        from gpboost_tpu.models.vecchia_model import VecchiaGP
        from gpboost_tpu.ops.cov_fns import CovFunction
        rng = np.random.default_rng(0)
        n = 150
        coords = rng.uniform(size=(n, 2))
        cf = CovFunction.create("exponential")
        vec = VecchiaGP(coords, cf, num_neighbors=12, ordering="none",
                        likelihood="poisson", nugget_in_pars=False)
        y = jnp.asarray(rng.poisson(np.ones(n)).astype(float))
        aux = jnp.zeros((0,))
        cov = jnp.asarray([0.8, 0.15])
        g_exact = np.asarray(jax.grad(
            lambda c: vec.nll_laplace(c, y, aux))(cov))
        f = jax.jit(jax.grad(lambda c, s: vec.nll_laplace_iterative(
            c, y, aux, num_rand_vec_trace=30, seed_rand_vec_trace=s,
            variance_reduction=True)), static_argnums=1)
        gs = np.array([np.asarray(f(cov, s)) for s in range(4)])
        assert np.all(np.isfinite(gs))
        rel = np.abs(gs.mean(0) - g_exact) / (np.abs(g_exact) + 1.0)
        assert np.all(rel < 0.25)
