"""Non-Gaussian (Laplace) full-scale Vecchia (VIF) approximation.

Golden values from the reference R test "Binary classification Gaussian
process model with VIF (or Full scale Vecchia) approximation"
(test_GPModel_non_Gaussian_data.R:1640-1795). The reference compares the
VIF results against the exact-model values with TOLERANCE_ITERATIVE = 1e-1;
we use the same targets/tolerances.
"""
import numpy as np
import pytest
from scipy.stats import norm

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_ITER = 1e-1


@pytest.fixture(scope="module")
def vif():
    """Data of test_GPModel_non_Gaussian_data.R:27-60 with the VIF block's
    response draw (init_c = 0.19341, R:1656)."""
    n, d = 100, 2
    x = sim_rand_unif(n * d, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-20 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b_1 = sim_rand_normal(n, 0.8)
    X = np.column_stack([
        np.ones(n),
        np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    probs = norm.cdf(L @ b_1)
    y = (sim_rand_unif(n, 0.19341) < probs).astype(float)
    return dict(y=y, coords=coords, X=X, n=n)


def test_fsva_laplace_nll(vif):
    """NLL at (1, 0.2) ~ exact 67.18342059 within 2*TOLERANCE_ITERATIVE
    (R:1748-1749, nn = n-1, 20 inducing points)."""
    m = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                likelihood="bernoulli_probit",
                gp_approx="full_scale_vecchia",
                num_neighbors=vif["n"] - 1, num_ind_points=20,
                vecchia_ordering="none")
    nll = m.neg_log_likelihood(cov_pars=[1.0, 0.2], y=vif["y"])
    assert abs(nll - 67.18342059) < 2 * TOL_ITER


def test_fsva_laplace_fit_and_predict(vif):
    """Fit with covariates -> cov_pars ~ (0.9235, 0.0594), coefs ~
    (0.3983, -0.2654) (R:1734-1747); latent predictions at the exact-model
    values within TOLERANCE_ITERATIVE."""
    m = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                likelihood="bernoulli_probit",
                gp_approx="full_scale_vecchia",
                num_neighbors=vif["n"] - 1, num_ind_points=20,
                vecchia_ordering="none")
    iu = np.triu_indices(vif["n"], 1)
    D = np.sqrt(((vif["coords"][:, None, :]
                  - vif["coords"][None, :, :]) ** 2).sum(-1))
    m.fit(y=vif["y"], X=vif["X"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [1.0, np.mean(D[iu]) / 3]})
    assert np.sum(np.abs(m.get_cov_pars()
                         - [0.92350821208, 0.05944214192])) < TOL_ITER
    assert np.sum(np.abs(m.get_coef() - [0.3983333, -0.2653886])) < TOL_ITER

    coord_test = np.column_stack([[0.1, 0.11, 0.7], [0.9, 0.91, 0.55]])
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 1.0]])
    pred = m.predict(y=vif["y"], gp_coords_pred=coord_test,
                     predict_var=True, predict_response=False,
                     cov_pars=[1.0, 0.2], X_pred=X_test)
    expected_mu = np.array([0.3389905, 0.1512445, -0.1039307])
    expected_var = np.array([0.6193228722, 0.6159348965, 0.4291674143])
    assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_ITER
    assert np.sum(np.abs(pred["var"] - expected_var)) < TOL_ITER


def test_fsva_laplace_less_neighbors(vif):
    """nn = 10 (R:1774-1790): latent predictions near
    (0.3362, 0.1499, -0.1015), vars near (0.6037, 0.6025, 0.4220)."""
    m = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                likelihood="bernoulli_probit",
                gp_approx="full_scale_vecchia",
                num_neighbors=10, num_ind_points=20,
                vecchia_ordering="none")
    coord_test = np.column_stack([[0.1, 0.11, 0.7], [0.9, 0.91, 0.55]])
    X_test = np.column_stack([np.ones(3), [-0.5, 0.2, 1.0]])
    iu = np.triu_indices(vif["n"], 1)
    D = np.sqrt(((vif["coords"][:, None, :]
                  - vif["coords"][None, :, :]) ** 2).sum(-1))
    m.fit(y=vif["y"], X=vif["X"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [1.0, np.mean(D[iu]) / 3]})
    pred = m.predict(y=vif["y"], gp_coords_pred=coord_test,
                     predict_var=True, predict_response=False,
                     cov_pars=[1.0, 0.2], X_pred=X_test)
    assert np.sum(np.abs(
        pred["mu"] - [0.3362000, 0.1499488, -0.1014509])) < TOL_ITER
    assert np.sum(np.abs(
        pred["var"] - [0.6036511, 0.6025073, 0.4220153])) < TOL_ITER


def test_fsva_laplace_iterative_matches_dense(vif):
    """matrix_inversion_method='iterative' (matrix-free Newton-CG +
    stochastic Lanczos logdet, the CGVIF role): NLL and its cov-par
    gradients agree with the dense Cholesky path. Only the
    logdet(Sigma^-1 + W) term is stochastic (Hutchinson MC noise shrinks
    relative to the logdet as n grows; n=100 is the worst case — use
    1000 probes here)."""
    import jax
    import jax.numpy as jnp

    m = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                likelihood="bernoulli_probit",
                gp_approx="full_scale_vecchia",
                num_neighbors=15, num_ind_points=20,
                vecchia_ordering="none",
                matrix_inversion_method="iterative")
    m2 = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                 likelihood="bernoulli_probit",
                 gp_approx="full_scale_vecchia",
                 num_neighbors=15, num_ind_points=20,
                 vecchia_ordering="none")
    nll_ch = m2.neg_log_likelihood(cov_pars=[1.0, 0.2], y=vif["y"])

    vec = m._approx
    y = jnp.asarray(vif["y"])

    def f_it(lp):
        return vec.nll_laplace_iterative(jnp.exp(lp), y, None,
                                         num_rand_vec_trace=1000,
                                         lanczos_steps=60)

    def f_ch(lp):
        return vec.nll_laplace(jnp.exp(lp), y, None)

    lp = jnp.log(jnp.asarray([1.0, 0.2]))
    (v_it, g_it) = jax.value_and_grad(f_it)(lp)
    (v_ch, g_ch) = jax.value_and_grad(f_ch)(lp)
    assert abs(float(v_ch) - nll_ch) < 1e-6
    assert abs(float(v_it) - float(v_ch)) < 0.3
    assert np.all(np.abs(np.asarray(g_it) - np.asarray(g_ch))
                  < 0.1 * (np.abs(np.asarray(g_ch)) + 1.0))


def test_fsva_laplace_iterative_fit(vif):
    """End-to-end iterative fit reaches parameters close to the Cholesky
    fit (R golden values, TOLERANCE_ITERATIVE)."""
    iu = np.triu_indices(vif["n"], 1)
    D = np.sqrt(((vif["coords"][:, None, :]
                  - vif["coords"][None, :, :]) ** 2).sum(-1))
    m = GPModel(gp_coords=vif["coords"], cov_function="exponential",
                likelihood="bernoulli_probit",
                gp_approx="full_scale_vecchia",
                num_neighbors=vif["n"] - 1, num_ind_points=20,
                vecchia_ordering="none",
                matrix_inversion_method="iterative")
    m.fit(y=vif["y"], X=vif["X"], params={
        "optimizer_cov": "lbfgs",
        "init_cov_pars": [1.0, np.mean(D[iu]) / 3]})
    assert np.sum(np.abs(m.get_cov_pars()
                         - [0.92350821208, 0.05944214192])) < 2 * TOL_ITER
    assert np.sum(np.abs(m.get_coef() - [0.3983333, -0.2653886])) < TOL_ITER
