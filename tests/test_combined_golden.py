"""Combined GP + grouped-random-effects golden tests
(``test_GPModel_combined_GP_random_effects.R``)."""
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal

TOL_MEDIUM = 1e-3


@pytest.fixture(scope="module")
def cb(gp_fixture_data):
    f = gp_fixture_data
    n, m = f["n"], 10
    group = np.repeat(np.arange(1, m + 1), n // m)
    b_gr_1 = sim_rand_normal(m, 0.56)
    eps = f["eps"] + b_gr_1[group - 1]
    y = eps + f["xi"]
    return dict(f=f, group=group, y=y)


class TestCombinedGaussian:
    def test_fit_fisher(self, cb):
        """R:85-93: fisher_scoring -> (0.02262645, 0.61471473, 1.02446559,
        0.11177327) in 7 iterations."""
        f = cb["f"]
        y = cb["y"]
        iu = np.triu_indices(f["n"], 1)
        v = np.var(y, ddof=1)
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cb["group"])
        m.fit(y=y, params={"optimizer_cov": "fisher_scoring",
                           "init_cov_pars": [v / 2, v / 2, v / 2,
                                             np.mean(f["D"][iu]) / 3]})
        np.testing.assert_allclose(
            m.get_cov_pars(),
            [0.02262645, 0.61471473, 1.02446559, 0.11177327], atol=5e-3)

    def test_fit_gd(self, cb):
        """R:72-78: GD nesterov -> estimates ~ (0.0292, 0.6146, 1.0219,
        0.1133); trajectory-dependent, so loose."""
        f = cb["f"]
        y = cb["y"]
        iu = np.triu_indices(f["n"], 1)
        v = np.var(y, ddof=1)
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cb["group"])
        m.fit(y=y, params={"optimizer_cov": "gradient_descent",
                           "lr_cov": 0.15, "use_nesterov_acc": True,
                           "acc_rate_cov": 0.8, "delta_rel_conv": 1e-6,
                           "init_cov_pars": [v / 2, v / 2, v / 2,
                                             np.mean(f["D"][iu]) / 3]})
        cov = m.get_cov_pars()
        np.testing.assert_allclose(
            cov, [0.02924971, 0.61463579, 1.02189002, 0.11327419],
            rtol=0.3, atol=1e-2)

    def test_predict(self, cb):
        """R:96-112: predictions with mixed GP + grouped components and an
        unseen group level (9999)."""
        f = cb["f"]
        y = cb["y"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cb["group"])
        m.fit(y=y, params={"optimizer_cov": "fisher_scoring"})
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        group_test = np.array([1, 2, 9999])
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         group_data_pred=group_test, predict_cov_mat=True)
        expected_mu = np.array([0.3769074, 0.6779193, 0.1803276])
        expected_cov = np.array(
            [0.619329940, 0.007893047, 0.001356784, 0.007893047, 0.402082274,
             -0.014950019, 0.001356784, -0.014950019,
             1.046082243]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < 5 * TOL_MEDIUM

    def test_predict_given_pars(self, cb):
        """R:127-131 with cov_pars (0.02, 1, 1.2, 0.9)."""
        f = cb["f"]
        y = cb["y"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cb["group"])
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        group_test = np.array([1, 2, 9999])
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         group_data_pred=group_test,
                         cov_pars=[0.02, 1.0, 1.2, 0.9], predict_cov_mat=True)
        expected_mu = np.array([0.3995192, 0.6775987, 0.3710522])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_MEDIUM


class TestCombinedVecchia:
    """Vecchia GP + grouped REs (models/vecchia_combined.py): with
    num_neighbors = n-1 the Woodbury/Vecchia path must reproduce the dense
    combined path exactly."""

    @pytest.fixture(scope="class")
    def cdata(self, gp_fixture_data):
        f = gp_fixture_data
        n, m = f["n"], 10
        group = np.repeat(np.arange(1, m + 1), n // m)
        b_gr = sim_rand_normal(m, 0.56)
        y = f["eps"] + b_gr[group - 1] + f["xi"]
        return dict(f=f, group=group, y=y)

    def test_nll_equals_dense(self, cdata):
        f, y = cdata["f"], cdata["y"]
        cov = [0.1, 0.5, 1.0, 0.15]
        dense = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                        cov_function="exponential")
        nll_d = dense.neg_log_likelihood(cov_pars=cov, y=y)
        vec = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                      cov_function="exponential", gp_approx="vecchia",
                      num_neighbors=f["n"] - 1, vecchia_ordering="none")
        nll_v = vec.neg_log_likelihood(cov_pars=cov, y=y)
        assert abs(nll_v - nll_d) < 1e-6

    def test_fit_and_predict_match_dense(self, cdata):
        f, y = cdata["f"], cdata["y"]
        init = [0.05, 0.5, 1.0, 0.1]
        dense = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                        cov_function="exponential")
        dense.fit(y=y, params={"optimizer_cov": "lbfgs",
                               "init_cov_pars": init})
        vec = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                      cov_function="exponential", gp_approx="vecchia",
                      num_neighbors=f["n"] - 1, vecchia_ordering="none")
        vec.fit(y=y, params={"optimizer_cov": "lbfgs",
                             "init_cov_pars": init})
        assert np.sum(np.abs(vec.get_cov_pars() - dense.get_cov_pars())) < 5e-2
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        gtest = [1, 3, 9999]
        pd = dense.predict(y=y, gp_coords_pred=coord_test,
                           group_data_pred=gtest, predict_var=True,
                           predict_response=True,
                           cov_pars=[0.1, 0.5, 1.0, 0.15])
        pv = vec.predict(y=y, gp_coords_pred=coord_test,
                         group_data_pred=gtest, predict_var=True,
                         predict_response=True,
                         cov_pars=[0.1, 0.5, 1.0, 0.15])
        assert np.sum(np.abs(pd["mu"] - pv["mu"])) < 1e-5
        assert np.sum(np.abs(pd["var"] - pv["var"])) < 1e-5

    def test_midrange_neighbors(self, cdata):
        f, y = cdata["f"], cdata["y"]
        vec = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                      cov_function="exponential", gp_approx="vecchia",
                      num_neighbors=30, vecchia_ordering="none")
        nll = vec.neg_log_likelihood(cov_pars=[0.1, 0.5, 1.0, 0.15], y=y)
        dense = GPModel(group_data=cdata["group"], gp_coords=f["coords"],
                        cov_function="exponential")
        nll_d = dense.neg_log_likelihood(cov_pars=[0.1, 0.5, 1.0, 0.15], y=y)
        assert abs(nll - nll_d) < 1.0


class TestCombinedRandomCoefs:
    """Combined GP + grouped REs with BOTH GP random coefficients and a
    grouped random slope (R:176-221). Ten covariance parameters:
    [nugget, gr1, gr2, slope(gr1), gp var, gp range, svc1 var, svc1 range,
    svc2 var, svc2 range]."""

    COV_PARS = [0.1, 0.9, 0.8, 1.2, 1.0, 0.1, 0.8, 0.15, 1.1, 0.08]

    @pytest.fixture(scope="class")
    def rc(self, gp_fixture_data):
        f = gp_fixture_data
        n, m = f["n"], 10
        group = np.repeat(np.arange(1, m + 1), n // m)
        n_obs_gr = n // m
        group2 = np.tile(np.arange(1, n_obs_gr + 1), m)
        x = np.cos((np.arange(1, n + 1) - n / 2) ** 2 * 5.5 * np.pi / n)
        b_gr_1 = sim_rand_normal(m, 0.56)
        b_gr_2 = sim_rand_normal(n_obs_gr, 0.36)
        b_gr_3 = sim_rand_normal(m, 0.5678)
        eps_svc = (f["eps_svc"] + b_gr_1[group - 1] + b_gr_2[group2 - 1]
                   + x * b_gr_3[group - 1])
        y = eps_svc + f["xi"]
        return dict(f=f, group=group, group2=group2, x=x, y=y)

    def _model(self, rc):
        f = rc["f"]
        return GPModel(gp_coords=f["coords"], cov_function="exponential",
                       gp_rand_coef_data=f["Z_SVC"],
                       group_data=np.column_stack([rc["group"], rc["group2"]]),
                       group_rand_coef_data=rc["x"],
                       ind_effect_group_rand_coef=[1])

    def test_nll(self, rc):
        """R:219-221: nll = 182.3674191 to 1e-5."""
        nll = self._model(rc).neg_log_likelihood(cov_pars=self.COV_PARS,
                                                 y=rc["y"])
        assert abs(nll - 182.3674191) < 1e-5

    def test_prediction(self, rc):
        """R:193-207: mu/cov to 1e-6 with new group levels in pred data."""
        m = self._model(rc)
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        z_svc_test = np.column_stack([[0.1, 0.3, 0.7], [0.5, 0.2, 0.4]])
        group_pred = np.column_stack([[1, 1, 7], [2, 1, 3]])
        slope_pred = np.array([0.0, 0.1, 0.3])
        pred = m.predict(y=rc["y"], gp_coords_pred=coord_test,
                         gp_rand_coef_data_pred=z_svc_test,
                         group_data_pred=group_pred,
                         group_rand_coef_data_pred=slope_pred,
                         cov_pars=self.COV_PARS, predict_cov_mat=True)
        expected_mu = np.array([0.8657964, 1.5419953, -2.5645509])
        expected_cov = np.array(
            [1.177484599, 0.073515374, 0.030303784, 0.073515374,
             0.841043737, 0.004484463, 0.030303784, 0.004484463,
             1.011570695]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < 1e-6
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < 1e-6

    def test_fit_reaches_good_nll(self, rc):
        """R GD goldens are 10-iteration trajectory values; require the
        converged fit to beat the NLL at the R 10-iteration estimates."""
        m = self._model(rc)
        m.fit(y=rc["y"], params={"optimizer_cov": "lbfgs", "maxit": 200})
        r_pars = [0.4005820, 0.4564903, 1.3819153, 1.0378165, 1.3684672,
                  0.1854759, 0.5790945, 0.2103132, 0.2639379, 0.2210313]
        nll_r = m.neg_log_likelihood(cov_pars=r_pars, y=rc["y"])
        assert m.current_nll_ <= nll_r + 1e-3


class TestCombinedClusterIds:
    """Combined GP + grouped REs with cluster_ids (R:223-249)."""

    @pytest.fixture(scope="class")
    def cc(self, gp_fixture_data):
        f = gp_fixture_data
        n, m = f["n"], 10
        group = np.repeat(np.arange(1, m + 1), n // m)
        b_gr_1 = sim_rand_normal(m, 0.56)
        y = f["eps"] + b_gr_1[group - 1] + f["xi"]
        return dict(f=f, group=group, y=y)

    def test_prediction(self, cc):
        """R:237-248: prediction with a new group level (9999) and a new
        cluster id (3): mu/cov to 1e-6."""
        f = cc["f"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cc["group"], cluster_ids=f["cluster_ids"])
        coord_test = np.column_stack([[0.1, 0.2, 0.7], [0.9, 0.4, 0.55]])
        pred = m.predict(y=cc["y"], gp_coords_pred=coord_test,
                         group_data_pred=np.array([1, 1, 9999]),
                         cluster_ids_pred=np.array([1, 3, 1]),
                         cov_pars=[0.1, 1.5, 1.0, 0.15], predict_cov_mat=True)
        expected_mu = np.array([0.1275193, 0.0, 0.5948827])
        expected_cov = np.array(
            [0.76147286, 0.0, -0.01260688, 0.0, 2.6, 0.0,
             -0.01260688, 0.0, 2.15607110]).reshape(3, 3)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < 1e-6
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < 1e-6

    def test_fit_fisher(self, cc):
        """R:226-233: fisher scoring -> (0.0053, 0.6150, 1.0430, 0.1137)
        to TOLERANCE_MEDIUM."""
        f = cc["f"]
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    group_data=cc["group"], cluster_ids=f["cluster_ids"])
        m.fit(y=cc["y"], params={"optimizer_cov": "fisher_scoring"})
        np.testing.assert_allclose(
            m.get_cov_pars(),
            [0.005306836, 0.615012714, 1.043024690, 0.113716679], atol=2e-3)
