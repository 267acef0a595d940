"""FITC / full-scale-tapering parity tests.

The reference's FITC contract (``test_GPModel_gaussian_process.R:1594-1700``):
with num_ind_points = n (all unique points), FITC == exact model for NLL,
estimates, and predictions.
"""
import numpy as np
import pytest

from gpboost_tpu import GPModel

TOL_STRICT = 1e-5
TOL_LOOSE = 1e-2


class TestFITC:
    def test_nll_all_inducing_equals_exact(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=f["n"],
                    ind_points_selection="random")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < 1e-4

    def test_too_many_inducing_points_errors(self, gp_fixture_data):
        f = gp_fixture_data
        with pytest.raises(ValueError):
            GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=f["n"] + 1,
                    ind_points_selection="random")

    def test_fit_all_inducing_matches_exact(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["X"] @ f["beta"] + f["xi"]
        iu = np.triu_indices(f["n"], 1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(f["D"][iu]) / 3]
        exact = GPModel(gp_coords=f["coords"], cov_function="exponential")
        exact.fit(y=y, X=f["X"], params={"optimizer_cov": "lbfgs",
                                         "init_cov_pars": init})
        fitc = GPModel(gp_coords=f["coords"], cov_function="exponential",
                       gp_approx="fitc", num_ind_points=f["n"],
                       ind_points_selection="random")
        fitc.fit(y=y, X=f["X"], params={"optimizer_cov": "lbfgs",
                                        "init_cov_pars": init})
        np.testing.assert_allclose(fitc.get_cov_pars(), exact.get_cov_pars(),
                                   rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(fitc.get_coef(), exact.get_coef(),
                                   atol=1e-2)

    def test_predict_all_inducing_matches_exact(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        exact = GPModel(gp_coords=f["coords"], cov_function="exponential")
        pe = exact.predict(y=y, gp_coords_pred=coord_test,
                           cov_pars=[0.02, 1.2, 0.9], predict_var=True)
        fitc = GPModel(gp_coords=f["coords"], cov_function="exponential",
                       gp_approx="fitc", num_ind_points=f["n"],
                       ind_points_selection="random")
        pf = fitc.predict(y=y, gp_coords_pred=coord_test,
                          cov_pars=[0.02, 1.2, 0.9], predict_var=True)
        np.testing.assert_allclose(pf["mu"], pe["mu"], atol=1e-4)
        np.testing.assert_allclose(pf["var"], pe["var"], atol=1e-4)

    def test_fewer_inducing_points_reasonable(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="fitc", num_ind_points=50,
                    ind_points_selection="kmeans++")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        # approximation error should stay moderate
        assert abs(nll - 124.2549533) < 5.0

    def test_fitc_laplace_probit(self, gp_fixture_data):
        from scipy.stats import norm
        from gpboost_tpu.utils.rng import sim_rand_unif
        f = gp_fixture_data
        probs = norm.cdf(f["eps"])
        y = (sim_rand_unif(f["n"], 0.2341) < probs).astype(float)
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit", gp_approx="fitc",
                    num_ind_points=f["n"], ind_points_selection="random")
        nll = m.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        # exact Laplace value from test_non_gaussian_golden
        assert abs(nll - 63.6205917) < 1e-3


class TestFullScaleTapering:
    def test_fsa_nll_close_to_exact(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="full_scale_tapering", num_ind_points=40,
                    cov_fct_taper_range=0.5, cov_fct_taper_shape=0.0,
                    ind_points_selection="kmeans++")
        nll = m.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll - 124.2549533) < 2.0

    def test_fsa_fit_and_predict(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        iu = np.triu_indices(f["n"], 1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(f["D"][iu]) / 3]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    gp_approx="full_scale_tapering", num_ind_points=50,
                    cov_fct_taper_range=0.8, cov_fct_taper_shape=0.0)
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "init_cov_pars": init})
        assert np.all(np.isfinite(m.get_cov_pars()))
        pred = m.predict(y=y, gp_coords_pred=f["coords"][:4],
                         predict_var=True, predict_response=False)
        assert np.all(np.isfinite(pred["mu"]))
        assert np.all(pred["var"] >= 0)


class TestFITCLaplaceWoodbury:
    """Scalable O(n m^2) FITC-Laplace (Woodbury mode finding + logdet,
    ``FindModePostRandEffCalcMLLFITC`` likelihoods.h:3090) must agree with
    the dense-Sigma Laplace engine exactly."""

    def test_matches_dense(self):
        import jax
        import jax.numpy as jnp
        from gpboost_tpu.models.fitc_model import FITCGP
        from gpboost_tpu.models.laplace import _laplace_nll_from_sigma
        from gpboost_tpu.ops.cov_fns import CovFunction
        rng = np.random.default_rng(0)
        n = 300
        coords = rng.uniform(size=(n, 2))
        cf = CovFunction.create("exponential")
        gp = FITCGP(coords, cf, num_ind_points=40, likelihood="poisson")
        y = jnp.asarray(rng.poisson(np.ones(n)).astype(float))
        cov = jnp.asarray([1.0, 0.15])
        aux = jnp.zeros((0,))
        nll_w = float(gp.nll_laplace(cov, y, aux))
        sigma = gp._latent_sigma(cov)
        nll_d = float(_laplace_nll_from_sigma(
            "poisson", sigma, y, jnp.zeros(n), aux))
        assert abs(nll_w - nll_d) < 1e-5
        g_w = np.asarray(jax.grad(
            lambda c: gp.nll_laplace(c, y, aux))(cov))
        g_d = np.asarray(jax.grad(
            lambda c: _laplace_nll_from_sigma(
                "poisson", gp._latent_sigma(c), y, jnp.zeros(n), aux))(cov))
        np.testing.assert_allclose(g_w, g_d, rtol=1e-6)


class TestFullScaleTaperingIterative:
    """matrix_inversion_method='iterative' for full_scale_tapering: the
    taper-sparse matrix-free CG + stochastic Lanczos path (the reference's
    CGFSA machinery, ``CG_utils.h:507-900``) must agree with the Cholesky
    path (the R tests compare iterative vs no-approx at
    TOLERANCE_ITERATIVE = 1e-1)."""

    def test_fsa_iterative_nll_and_grad_match_cholesky(self, gp_fixture_data):
        import jax
        import jax.numpy as jnp
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        common = dict(gp_coords=f["coords"], cov_function="exponential",
                      gp_approx="full_scale_tapering", num_ind_points=40,
                      cov_fct_taper_range=0.5, cov_fct_taper_shape=0.0,
                      ind_points_selection="kmeans++")
        m_it = GPModel(matrix_inversion_method="iterative", **common)
        m_ch = GPModel(**common)
        m_it.set_optim_params({"num_rand_vec_trace": 500})
        nll_it = m_it.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        nll_ch = m_ch.neg_log_likelihood(cov_pars=[0.1, 1.6, 0.2], y=y)
        assert abs(nll_it - nll_ch) < 0.1

        th = jnp.log(jnp.asarray([0.1, 1.6, 0.2]))
        yj = jnp.asarray(y)
        _, g_it = m_it._approx._vg_gaussian(th, yj, None)
        _, g_ch = m_ch._approx._vg_gaussian(th, yj, None)
        assert np.all(np.abs(np.asarray(g_it) - np.asarray(g_ch))
                      < 0.05 * (np.abs(np.asarray(g_ch)) + 1.0))

    def test_fsa_iterative_fit_and_predict(self, gp_fixture_data):
        f = gp_fixture_data
        y = f["eps"] + f["xi"]
        iu = np.triu_indices(f["n"], 1)
        init = [np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                np.mean(f["D"][iu]) / 3]
        common = dict(gp_coords=f["coords"], cov_function="exponential",
                      gp_approx="full_scale_tapering", num_ind_points=50,
                      cov_fct_taper_range=0.8, cov_fct_taper_shape=0.0)
        m_it = GPModel(matrix_inversion_method="iterative", **common)
        m_it.fit(y=y, params={"optimizer_cov": "lbfgs",
                              "init_cov_pars": init,
                              "num_rand_vec_trace": 500})
        m_ch = GPModel(**common)
        m_ch.fit(y=y, params={"optimizer_cov": "lbfgs",
                              "init_cov_pars": init})
        assert np.sum(np.abs(m_it.get_cov_pars() - m_ch.get_cov_pars())) < 0.1
        p_it = m_it.predict(y=y, gp_coords_pred=f["coords"][:4] + 0.01,
                            predict_var=True, predict_response=False,
                            cov_pars=[0.1, 1.6, 0.2])
        p_ch = m_ch.predict(y=y, gp_coords_pred=f["coords"][:4] + 0.01,
                            predict_var=True, predict_response=False,
                            cov_pars=[0.1, 1.6, 0.2])
        assert np.sum(np.abs(p_it["mu"] - p_ch["mu"])) < 1e-3
        assert np.sum(np.abs(p_it["var"] - p_ch["var"])) < 1e-2
