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


class TestGroupedIterative:
    """Matrix-free CG + stochastic-logdet path for grouped random effects
    (matrix_inversion_method='iterative'; reference ``CGRandomEffectsVec``,
    CG_utils.h:979 with SSOR/ZIC preconditioning — here Jacobi, the
    TPU-friendly equivalent). Tolerances per TOLERANCE_ITERATIVE."""

    def _crossed_data(self, seed=0, n=500, q1=40, q2=25):
        rng = np.random.default_rng(seed)
        g1 = rng.integers(0, q1, size=n)
        g2 = rng.integers(0, q2, size=n)
        b1 = 0.8 * rng.standard_normal(q1)
        b2 = 0.5 * rng.standard_normal(q2)
        eps = b1[g1] + b2[g2] + 0.6 * rng.standard_normal(n)
        group = np.column_stack([g1, g2])
        return group, eps

    def test_gaussian_nll_and_grad_close_to_cholesky(self):
        from gpboost_tpu.models import grouped
        group, y = self._crossed_data()
        m = GPModel(group_data=group, likelihood="gaussian")
        data = m._with_y(np.asarray(y))
        th = jnp.log(jnp.asarray([0.9, 0.4]))  # ratio vars
        v_ex, g_ex, s2_ex = grouped.nll_profiled_value_and_grad(
            m.spec, data, th)
        v_it, g_it, s2_it = grouped.nll_profiled_iterative_value_and_grad(
            m.spec, data, th, None, None, 400, 60)
        assert abs(float(s2_it) - float(s2_ex)) < 1e-6  # CG part is exact
        assert abs(float(v_it) - float(v_ex)) < 0.5     # stochastic logdet
        np.testing.assert_allclose(np.asarray(g_it), np.asarray(g_ex),
                                   atol=0.05, rtol=0.1)

    def test_gaussian_fit_iterative_matches_cholesky(self):
        group, y = self._crossed_data(seed=1)
        m_ex = GPModel(group_data=group, likelihood="gaussian")
        m_ex.fit(y=y)
        m_it = GPModel(group_data=group, likelihood="gaussian",
                       matrix_inversion_method="iterative")
        m_it.fit(y=y, params={"num_rand_vec_trace": 500})
        np.testing.assert_allclose(m_it.get_cov_pars(), m_ex.get_cov_pars(),
                                   rtol=0.1, atol=0.02)

    def test_gaussian_fit_iterative_with_covariates(self):
        rng = np.random.default_rng(2)
        group, eps = self._crossed_data(seed=2)
        n = len(eps)
        X = np.column_stack([np.ones(n), rng.uniform(size=n)])
        y = X @ np.array([2.0, -1.5]) + eps
        m_ex = GPModel(group_data=group, likelihood="gaussian")
        m_ex.fit(y=y, X=X)
        m_it = GPModel(group_data=group, likelihood="gaussian",
                       matrix_inversion_method="iterative")
        m_it.fit(y=y, X=X, params={"num_rand_vec_trace": 500})
        np.testing.assert_allclose(m_it.get_coef(), m_ex.get_coef(),
                                   atol=0.05)
        np.testing.assert_allclose(m_it.get_cov_pars(), m_ex.get_cov_pars(),
                                   rtol=0.1, atol=0.02)

    def test_laplace_nll_close_to_cholesky(self):
        from gpboost_tpu.models import grouped
        rng = np.random.default_rng(3)
        n, q1, q2 = 400, 30, 20
        g1 = rng.integers(0, q1, size=n)
        g2 = rng.integers(0, q2, size=n)
        lam = np.exp(0.5 * rng.standard_normal(q1)[g1]
                     + 0.3 * rng.standard_normal(q2)[g2])
        y = rng.poisson(lam).astype(float)
        m = GPModel(group_data=np.column_stack([g1, g2]),
                    likelihood="poisson")
        data = m._with_y(y)
        cov = jnp.asarray([0.4, 0.2])
        aux = None
        v_ex = grouped.nll_laplace(m.spec, data, cov, aux)
        v_it = grouped.nll_laplace_iterative(m.spec, data, cov, aux,
                                             None, None, 400, 60)
        assert abs(float(v_it) - float(v_ex)) < 0.5
        g_ex = np.asarray(jax.grad(
            lambda c: grouped.nll_laplace(m.spec, data, c, aux))(cov))
        g_it = np.asarray(jax.grad(
            lambda c: grouped.nll_laplace_iterative(
                m.spec, data, c, aux, None, None, 400, 60))(cov))
        np.testing.assert_allclose(g_it, g_ex, atol=0.5, rtol=0.15)

    def test_laplace_fit_iterative(self):
        rng = np.random.default_rng(4)
        n, q = 400, 40
        g = rng.integers(0, q, size=n)
        lam = np.exp(0.6 * rng.standard_normal(q)[g] - 0.2)
        y = rng.poisson(lam).astype(float)
        m_ex = GPModel(group_data=g, likelihood="poisson")
        m_ex.fit(y=y)
        m_it = GPModel(group_data=g, likelihood="poisson",
                       matrix_inversion_method="iterative")
        m_it.fit(y=y, params={"num_rand_vec_trace": 400})
        np.testing.assert_allclose(m_it.get_cov_pars(), m_ex.get_cov_pars(),
                                   rtol=0.15, atol=0.03)


class TestGroupedIterativePrediction:
    """Iterative grouped predictions: CG posterior mean + simulation-based
    variances (Sample_Posterior_LaplaceApprox_GroupedRE, likelihoods.h:6852)
    converge to the dense Woodbury path."""

    def test_gaussian_prediction_matches_dense(self):
        rng = np.random.default_rng(10)
        n, q1, q2 = 600, 30, 20
        g1 = rng.integers(0, q1, size=n)
        g2 = rng.integers(0, q2, size=n)
        y = (0.8 * rng.standard_normal(q1)[g1]
             + 0.5 * rng.standard_normal(q2)[g2]
             + 0.6 * rng.standard_normal(n))
        gp_pred = np.column_stack([
            np.array([0, 1, 2, q1 + 5]),      # last level unseen
            np.array([0, 1, 2, 3])])
        m_d = GPModel(group_data=np.column_stack([g1, g2]))
        m_d.fit(y=y)
        p_d = m_d.predict(y=y, group_data_pred=gp_pred, predict_var=True)
        m_i = GPModel(group_data=np.column_stack([g1, g2]),
                      matrix_inversion_method="iterative")
        m_i.fit(y=y, params={"num_rand_vec_trace": 400})
        m_i.set_prediction_data(nsim_var_pred=4000)
        p_i = m_i.predict(y=y, group_data_pred=gp_pred, predict_var=True,
                          cov_pars=m_d.get_cov_pars())
        np.testing.assert_allclose(p_i["mu"], p_d["mu"], atol=1e-5)
        np.testing.assert_allclose(p_i["var"], p_d["var"], rtol=0.12,
                                   atol=0.01)

    def test_laplace_prediction_matches_dense(self):
        rng = np.random.default_rng(11)
        n, q = 500, 40
        g = rng.integers(0, q, size=n)
        lam = np.exp(0.7 * rng.standard_normal(q)[g] - 0.2)
        y = rng.poisson(lam).astype(float)
        gp_pred = np.array([0, 1, 2, q + 3])
        m_d = GPModel(group_data=g, likelihood="poisson")
        m_d.fit(y=y)
        p_d = m_d.predict(y=y, group_data_pred=gp_pred, predict_var=True,
                          predict_response=True)
        m_i = GPModel(group_data=g, likelihood="poisson",
                      matrix_inversion_method="iterative")
        m_i.set_prediction_data(nsim_var_pred=4000)
        p_i = m_i.predict(y=y, group_data_pred=gp_pred, predict_var=True,
                          predict_response=True, cov_pars=m_d.get_cov_pars())
        np.testing.assert_allclose(p_i["mu"], p_d["mu"], rtol=0.02)
        np.testing.assert_allclose(p_i["var"], p_d["var"], rtol=0.15,
                                   atol=0.02)


def test_get_num_cg_steps():
    """Conditioning diagnostic (GPB_GetNumCGSteps equivalent)."""
    rng = np.random.default_rng(12)
    n, q = 400, 30
    g = rng.integers(0, q, size=n)
    y = 0.8 * rng.standard_normal(q)[g] + 0.5 * rng.standard_normal(n)
    m = GPModel(group_data=g, matrix_inversion_method="iterative")
    with pytest.raises(ValueError):
        m.get_num_cg_steps()  # not fitted yet
    m.fit(y=y)
    steps = m.get_num_cg_steps()
    assert 1 <= steps <= 1000
    m2 = GPModel(group_data=g)
    m2.fit(y=y)
    with pytest.raises(ValueError):
        m2.get_num_cg_steps()  # cholesky model
    # vecchia-laplace variant
    coords = rng.uniform(size=(200, 2))
    yv = rng.poisson(1.0, 200).astype(float)
    mv = GPModel(gp_coords=coords, cov_function="exponential",
                 gp_approx="vecchia", num_neighbors=10,
                 likelihood="poisson", matrix_inversion_method="iterative")
    mv.fit(y=yv, params={"maxit": 5})
    assert 1 <= mv.get_num_cg_steps() <= 1000
