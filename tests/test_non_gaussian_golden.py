"""Golden-value parity tests for non-Gaussian (Laplace) models.

Expected numbers from
``R-package/tests/testthat/test_GPModel_non_Gaussian_data.R`` (GPBoost v1.6.5);
data simulated with the same LCG.
"""
import numpy as np
import pytest
from scipy.stats import norm, poisson as spoisson, gamma as sgamma

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_STRICT = 1e-6
TOL_STRICT_LOWER = 1e-5
TOL_MEDIUM = 1e-3
TOL_LOOSE = 1e-2


@pytest.fixture(scope="module")
def ng():
    """Fixture data of test_GPModel_non_Gaussian_data.R:27-85."""
    n, d, m = 100, 2, 10
    x = sim_rand_unif(n * d, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    Sigma = np.exp(-D / 0.1) + 1e-20 * np.eye(n)
    L = np.linalg.cholesky(Sigma)
    b_1 = sim_rand_normal(n, 0.8)
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = sim_rand_normal(m, 0.565)
    Z1b = b_gr_1[group - 1]
    n_obs_gr = n // m
    group2 = np.tile(np.arange(1, n_obs_gr + 1), m)
    b_gr_2 = sim_rand_normal(n_obs_gr, 0.36)
    Z2b = b_gr_2[group2 - 1]
    xcov = np.cos((np.arange(1, n + 1) - n / 2) ** 2 * 5.5 * np.pi / n)
    b_gr_3 = sim_rand_normal(m, 0.5678)
    Z3b = xcov * b_gr_3[group - 1]
    X = np.column_stack([np.ones(n),
                         np.sin((np.arange(1, n + 1) - n / 2) ** 2 * 2 * np.pi / n)])
    return dict(n=n, coords=coords, D=D, L=L, b_1=b_1, group=group,
                group2=group2, xcov=xcov, Z1b=Z1b, Z2b=Z2b, Z3b=Z3b, X=X)


class TestBernoulliProbitGP:
    def _y(self, f):
        probs = norm.cdf(f["L"] @ f["b_1"])
        return (sim_rand_unif(f["n"], 0.2341) < probs).astype(float)

    def test_nll(self, ng):
        """R:184-185: nll(0.9, 0.2) = 63.6205917."""
        y = self._y(ng)
        m = GPModel(gp_coords=ng["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit")
        nll = m.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        assert abs(nll - 63.6205917) < TOL_STRICT_LOWER

    def test_fit(self, ng):
        """R:106-115: GD -> (0.9419234, 0.1866877), nll 63.61263619."""
        y = self._y(ng)
        iu = np.triu_indices(ng["n"], 1)
        m = GPModel(gp_coords=ng["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit")
        m.fit(y=y, params={
            "optimizer_cov": "gradient_descent", "lr_cov": 0.1,
            "use_nesterov_acc": False,
            "convergence_criterion": "relative_change_in_parameters",
            "init_cov_pars": [1.0, np.mean(ng["D"][iu]) / 3]})
        np.testing.assert_allclose(m.get_cov_pars(),
                                   [0.9419234, 0.1866877], rtol=2e-2)
        assert abs(m.get_current_neg_log_likelihood() - 63.61263619) < TOL_MEDIUM

    def test_fit_lbfgs(self, ng):
        y = self._y(ng)
        iu = np.triu_indices(ng["n"], 1)
        m = GPModel(gp_coords=ng["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit")
        m.fit(y=y, params={"optimizer_cov": "lbfgs",
                           "init_cov_pars": [1.0, np.mean(ng["D"][iu]) / 3]})
        np.testing.assert_allclose(m.get_cov_pars(),
                                   [0.9419234, 0.1866877], rtol=2e-2)

    def test_label_validation(self, ng):
        y = self._y(ng)
        m = GPModel(gp_coords=ng["coords"], cov_function="exponential",
                    likelihood="bernoulli_probit")
        bad = y.copy()
        bad[3] += 1e-6
        with pytest.raises(ValueError):
            m.neg_log_likelihood(cov_pars=[1.0, 0.1], y=bad)


class TestBernoulliLogitGP:
    def test_nll(self, ng):
        """R:2326-2328: nll(0.9, 0.2) = 66.299571."""
        probs = 1.0 / (1.0 + np.exp(-(ng["L"] @ ng["b_1"])))
        y = (sim_rand_unif(ng["n"], 0.2341) < probs).astype(float)
        m = GPModel(gp_coords=ng["coords"], cov_function="exponential",
                    likelihood="bernoulli_logit")
        nll = m.neg_log_likelihood(cov_pars=[0.9, 0.2], y=y)
        assert abs(nll - 66.299571) < TOL_STRICT_LOWER


class TestBernoulliProbitGrouped:
    def _y(self, f):
        probs = norm.cdf(f["Z1b"])
        return (sim_rand_unif(f["n"], 0.823431) < probs).astype(float)

    def test_nll(self, ng):
        """R:534-535: nll(0.9) = 65.8590638."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="bernoulli_probit")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=y)
        assert abs(nll - 65.8590638) < TOL_STRICT_LOWER

    def test_fit_gd(self, ng):
        """R:438-446: GD no-acc -> 0.40255."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="bernoulli_probit")
        m.fit(y=y, params={
            "optimizer_cov": "gradient_descent", "lr_cov": 0.1,
            "use_nesterov_acc": False,
            "convergence_criterion": "relative_change_in_parameters",
            "init_cov_pars": [1.0]})
        np.testing.assert_allclose(m.get_cov_pars(), [0.40255], rtol=1e-2)

    def test_fit_lbfgs(self, ng):
        """R:530-532: lbfgs -> 0.4025750768."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="bernoulli_probit")
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "init_cov_pars": [1.0]})
        np.testing.assert_allclose(m.get_cov_pars(), [0.4025750768], rtol=1e-2)


class TestPoissonGrouped:
    def _y(self, f):
        mu = np.exp(f["Z1b"])
        return spoisson.ppf(sim_rand_unif(f["n"], 0.04532), mu)

    def test_fit_and_predict(self, ng):
        """R:2332-2356."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="poisson")
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "use_nesterov_acc": True, "lr_cov": 0.1})
        np.testing.assert_allclose(m.get_cov_pars(), [0.4033406], rtol=1e-2)
        cp = [0.4033406]
        group_test = np.array([1, 3, 3, 9999])
        pred = m.predict(y=y, group_data_pred=group_test, cov_pars=cp,
                         predict_cov_mat=True, predict_response=False)
        expected_mu = np.array([0.07765297, -0.87488533, -0.87488533, 0.0])
        expected_cov = np.array(
            [0.07526284, 0, 0, 0, 0, 0.15041230, 0.15041230, 0, 0, 0.15041230,
             0.15041230, 0, 0, 0, 0, 0.40334058]).reshape(4, 4)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_MEDIUM
        # response scale (GH quadrature)
        pred_r = m.predict(y=y, group_data_pred=group_test, cov_pars=cp,
                           predict_var=True, predict_response=True)
        expected_mu_r = np.array([1.1221925, 0.4494731, 0.4494731, 1.2234446])
        expected_var_r = np.array([1.2206301, 0.4822647, 0.4822647, 1.9670879])
        assert np.sum(np.abs(pred_r["mu"] - expected_mu_r)) < TOL_MEDIUM
        assert np.sum(np.abs(pred_r["var"] - expected_var_r)) < 5 * TOL_MEDIUM

    def test_nll(self, ng):
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="poisson")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=y)
        assert abs(nll - 140.4554806) < TOL_MEDIUM


class TestPoissonMultipleRE:
    def test_fit_and_predict(self, ng):
        """R:2359-2382: two grouped REs + random slope."""
        mu = np.exp(ng["Z1b"] + ng["Z2b"] + ng["Z3b"])
        y = spoisson.ppf(sim_rand_unif(ng["n"], 0.74532), mu)
        m = GPModel(group_data=np.column_stack([ng["group"], ng["group2"]]),
                    group_rand_coef_data=ng["xcov"],
                    ind_effect_group_rand_coef=[1], likelihood="poisson")
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "use_nesterov_acc": True, "lr_cov": 0.1,
                           "init_cov_pars": [1.0, 1.0, 1.0]})
        np.testing.assert_allclose(
            m.get_cov_pars(), [0.4069344, 1.6988978, 1.3415016], rtol=2e-2)
        pred = m.predict(
            y=y, group_data_pred=np.column_stack([[1, 1, 77], [2, 1, 98]]),
            group_rand_coef_data_pred=np.array([0.0, 0.1, 0.3]),
            cov_pars=[0.9, 0.8, 1.2], predict_cov_mat=True,
            predict_response=False)
        expected_mu = np.array([0.92620057, -0.08200469, 0.0])
        expected_cov = np.array(
            [0.07730896, 0.04403442, 0, 0.04403442, 0.11600469, 0,
             0, 0, 1.808]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_MEDIUM


class TestGammaGrouped:
    def _y(self, f):
        mu = np.exp(f["Z1b"])
        return sgamma.ppf(sim_rand_unif(f["n"], 0.04532), a=1.0, scale=mu)

    def test_fit_lbfgs_fixed_shape(self, ng):
        """R:2445-2449: lbfgs, shape=1 fixed -> 0.5175032387."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="gamma")
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "init_aux_pars": 1.0,
                           "estimate_aux_pars": False})
        np.testing.assert_allclose(m.get_cov_pars(), [0.5175032387], rtol=1e-2)

    def test_predict(self, ng):
        """R:2450-2464 with cov_pars=0.6."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="gamma")
        group_test = np.array([1, 3, 3, 9999])
        pred = m.predict(y=y, group_data_pred=group_test, cov_pars=[0.6],
                         predict_cov_mat=True, predict_response=False)
        expected_mu = np.array([0.2141580841, -0.9414716643, -0.9414716643, 0.0])
        expected_cov_diag = np.array([0.08316978821, 0.09903395128,
                                      0.09903395128, 0.6])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(np.diag(pred["cov"]) - expected_cov_diag)) < TOL_MEDIUM
        pred_r = m.predict(y=y, group_data_pred=group_test, cov_pars=[0.6],
                           predict_var=True, predict_response=True)
        expected_mu_r = np.array([1.2914207620, 0.4098538326, 0.4098538326,
                                  1.3498588076])
        expected_var_r = np.array([1.9570462290, 0.2029549058, 0.2029549058,
                                   4.8181150451])
        assert np.sum(np.abs(pred_r["mu"] - expected_mu_r)) < 5 * TOL_MEDIUM
        assert np.sum(np.abs(pred_r["var"] - expected_var_r)) < 0.25

    def test_nll(self, ng):
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="gamma")
        nll = m.neg_log_likelihood(cov_pars=[0.9], y=y, aux_pars=[1.0])
        assert abs(nll - 105.676137) < TOL_MEDIUM

    def test_estimate_shape(self, ng):
        """R:2468-2476: estimate aux -> cov 0.5141632, shape 0.9719373."""
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="gamma")
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "init_aux_pars": 1.0,
                           "estimate_aux_pars": True})
        np.testing.assert_allclose(m.get_cov_pars(), [0.5141632], rtol=2e-2)
        np.testing.assert_allclose(m.get_aux_pars(), [0.9719373], rtol=2e-2)
        assert abs(m.get_current_neg_log_likelihood() - 105.1597249) < TOL_LOOSE

    def test_zero_label_error(self, ng):
        y = self._y(ng)
        y[0] = 0.0
        m = GPModel(group_data=ng["group"], likelihood="gamma")
        with pytest.raises(ValueError):
            m.fit(y=y, params={"optimizer_cov": "lbfgs"})


class TestWeights:
    """Observation weights (reference 'Use of weights' blocks,
    test_GPModel_non_Gaussian_data.R:266-312): weight k == k replicates."""

    def test_weight_one_is_noop(self, ng):
        y = (sim_rand_unif(ng["n"], 0.823431) < 0.5).astype(float)
        m1 = GPModel(group_data=ng["group"], likelihood="bernoulli_probit",
                     weights=np.ones(ng["n"]))
        m0 = GPModel(group_data=ng["group"], likelihood="bernoulli_probit")
        assert abs(m1.neg_log_likelihood(cov_pars=[0.9], y=y)
                   - m0.neg_log_likelihood(cov_pars=[0.9], y=y)) < 1e-8

    def test_probit_weight_two_equals_duplication(self, ng):
        rng = np.random.default_rng(0)
        coords = rng.uniform(size=(80, 2))
        yb = (rng.uniform(size=80) < 0.5).astype(float)
        mw = GPModel(gp_coords=coords, cov_function="exponential",
                     likelihood="bernoulli_probit", weights=2 * np.ones(80))
        md = GPModel(gp_coords=np.concatenate([coords, coords + 1e-9]),
                     cov_function="exponential",
                     likelihood="bernoulli_probit")
        v2 = mw.neg_log_likelihood(cov_pars=[0.5, 0.1], y=yb)
        vd = md.neg_log_likelihood(cov_pars=[0.5, 0.1],
                                   y=np.concatenate([yb, yb]))
        assert abs(v2 - vd) < 1e-4

    def test_gaussian_weighted_nugget(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(size=(80, 2))
        D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
        yg = rng.standard_normal(80)
        w = rng.uniform(0.5, 2.0, size=80)
        mg = GPModel(gp_coords=coords, cov_function="exponential", weights=w)
        nll = mg.neg_log_likelihood(cov_pars=[0.1, 1.0, 0.2], y=yg)
        psi = np.exp(-D / 0.2) + np.diag(0.1 / w)
        L = np.linalg.cholesky(psi)
        al = np.linalg.solve(L, yg)
        ref = 0.5 * (al @ al + 2 * np.log(np.diag(L)).sum()
                     + 80 * np.log(2 * np.pi))
        assert abs(nll - ref) < 1e-5


class TestNegativeBinomialGrouped:
    """R:2827-2875 (negative binomial regression)."""

    def _y(self, f):
        from scipy.stats import nbinom
        mu = np.exp(f["Z1b"])
        shape = 1.8
        p = shape / (shape + mu)
        return nbinom.ppf(sim_rand_unif(f["n"], 0.156), n=shape, p=p)

    def test_fit(self, ng):
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="negative_binomial")
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "use_nesterov_acc": True, "lr_cov": 0.1,
                           "estimate_aux_pars": True, "init_aux_pars": 1.0})
        np.testing.assert_allclose(m.get_cov_pars(), [0.3356339], rtol=5e-2)
        np.testing.assert_allclose(m.get_aux_pars(), [1.735066], rtol=2e-1)

    def test_predict_at_reference_pars(self, ng):
        y = self._y(ng)
        m = GPModel(group_data=ng["group"], likelihood="negative_binomial")
        m.aux_pars_ = np.array([1.735066])
        group_test = np.array([1, 3, 3, 9999])
        pred = m.predict(y=y, group_data_pred=group_test,
                         cov_pars=[0.33563392], predict_cov_mat=True,
                         predict_response=False)
        expected_mu = np.array([0.1856629, -0.4022728, -0.4022728, 0.0])
        expected_cov_diag = np.array([0.09849537, 0.13548864, 0.13548864,
                                      0.33563392])
        # NB: the reference's quoted predictions used its (unpublished)
        # GD-fit aux parameter; 1.735066 is its nelder-mead estimate, hence
        # the slightly loose tolerance here
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < 2e-2
        assert np.sum(np.abs(np.diag(pred["cov"]) - expected_cov_diag)) < 5e-3
        pred_r = m.predict(y=y, group_data_pred=group_test,
                           cov_pars=[0.33563392], predict_var=True,
                           predict_response=True)
        expected_mu_r = np.array([1.2647957, 0.7156755, 0.7156755, 1.18272011])
        expected_var_r = np.array([2.508242, 1.148106, 1.148106, 2.935353])
        assert np.sum(np.abs(pred_r["mu"] - expected_mu_r)) < 2e-2
        assert np.sum(np.abs(pred_r["var"] - expected_var_r)) < 0.25


class TestStudentT:
    def test_t_likelihood_robust_fit(self, ng):
        """t likelihood handles outliers (non-log-concave W safeguard)."""
        rng = np.random.default_rng(0)
        y = ng["Z1b"] + 0.3 * rng.standard_normal(ng["n"])
        y[::17] += 8.0  # gross outliers
        m = GPModel(group_data=ng["group"], likelihood="t")
        m.fit(y=y, params={"optimizer_cov": "lbfgs", "init_cov_pars": [1.0],
                           "init_aux_pars": [0.5, 4.0],
                           "estimate_aux_pars": False})
        assert np.all(np.isfinite(m.get_cov_pars()))
        # posterior means should track the group effects despite outliers
        pred = m.predict(y=y, group_data_pred=ng["group"][:20],
                         predict_response=False)
        b_true = ng["Z1b"][:20]
        assert np.corrcoef(pred["mu"], b_true)[0, 1] > 0.8
