"""cluster_ids models: golden values + batched per-cluster solves.

Reference golden values: ``test_GPModel_gaussian_process.R:600-643``
("Gaussian process model with cluster_id's not constant").
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu import GPModel
from gpboost_tpu.models import clustered

TOL_STRICT = 1e-5


@pytest.fixture(scope="module")
def cdata(gp_fixture_data):
    f = gp_fixture_data
    return f, f["eps"] + f["xi"]


class TestClusterIds:
    def test_fit_fisher_scoring_golden(self, cdata):
        """R:614-622: cov_pars (0.05414149, 1.05789166, 0.12702368)."""
        f, y = cdata
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    cluster_ids=f["cluster_ids"])
        m.fit(y=y, params={"optimizer_cov": "fisher_scoring",
                           "use_nesterov_acc": False, "delta_rel_conv": 1e-6,
                           "convergence_criterion":
                               "relative_change_in_parameters"})
        np.testing.assert_allclose(
            m.get_cov_pars(), [0.05414149, 1.05789166, 0.12702368], atol=1e-4)

    def test_fit_batched_path_matches(self, cdata):
        """The lbfgs fit runs the batched [C, m, m] path; same optimum."""
        f, y = cdata
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    cluster_ids=f["cluster_ids"])
        assert m._clustered_batched
        m.fit(y=y, params={"optimizer_cov": "lbfgs"})
        np.testing.assert_allclose(
            m.get_cov_pars(), [0.05414149, 1.05789166, 0.12702368], atol=5e-3)

    def test_predict_golden(self, cdata):
        """R:624-643: predictions incl. an unseen cluster id (prior)."""
        f, y = cdata
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    cluster_ids=f["cluster_ids"])
        coord_test = np.array([[0.1, 0.9], [0.2, 0.4], [0.7, 0.55]])
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         cluster_ids_pred=[1, 3, 1],
                         cov_pars=[0.1, 1.0, 0.15], predict_cov_mat=True)
        expected_mu = [-0.01437506, 0.0, 0.93112902]
        expected_cov = np.array([
            [0.743055189, 0.0, -0.000140644],
            [0.0, 1.1, 0.0],
            [-0.000140644, 0.0, 0.565243468]])
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["cov"] - expected_cov)) < TOL_STRICT
        pred = m.predict(y=y, gp_coords_pred=coord_test,
                         cluster_ids_pred=[1, 3, 1],
                         cov_pars=[0.1, 1.0, 0.15], predict_var=True)
        assert np.sum(np.abs(pred["mu"] - expected_mu)) < TOL_STRICT
        assert np.sum(np.abs(pred["var"] - np.diag(expected_cov))) < TOL_STRICT


class TestBatchedBlocks:
    def test_nll_matches_dense_masked(self, cdata):
        """Batched block NLL == dense block-masked NLL."""
        f, y = cdata
        m = GPModel(gp_coords=f["coords"], cov_function="exponential",
                    cluster_ids=f["cluster_ids"])
        nll_batched = m.neg_log_likelihood(cov_pars=[0.1, 1.0, 0.15], y=y)
        # dense masked path via the generic gaussian module
        from gpboost_tpu.models import gaussian
        data = m._with_y(y)
        nll_dense = float(gaussian.neg_log_likelihood(
            m.spec, data, jnp.asarray([0.1, 1.0, 0.15])))
        # same math, different factorization order -> tiny float drift
        assert abs(nll_batched - nll_dense) < 1e-5

    def test_many_clusters(self):
        """Unequal cluster sizes, many clusters."""
        rng = np.random.default_rng(5)
        sizes = rng.integers(3, 30, size=25)
        n = int(sizes.sum())
        codes = np.repeat(np.arange(25), sizes)
        coords = rng.uniform(size=(n, 2))
        y = rng.normal(size=n)
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    cluster_ids=codes)
        assert m._clustered_batched
        nll_b = m.neg_log_likelihood(cov_pars=[0.2, 1.0, 0.2], y=y)
        from gpboost_tpu.models import gaussian
        data = m._with_y(y)
        nll_d = float(gaussian.neg_log_likelihood(
            m.spec, data, jnp.asarray([0.2, 1.0, 0.2])))
        assert abs(nll_b - nll_d) < 1e-5

    def test_sharded_cluster_axis(self, cdata):
        """The [C, ...] leading axis shards over a device mesh and gives the
        same NLL (embarrassing parallelism over cluster_ids, SURVEY §2.5.8)."""
        rng = np.random.default_rng(6)
        C, sz = 16, 12
        codes = np.repeat(np.arange(C), sz)
        coords = rng.uniform(size=(C * sz, 2))
        y = rng.normal(size=C * sz)
        m = GPModel(gp_coords=coords, cov_function="exponential",
                    cluster_ids=codes)
        blocks = m._get_cluster_blocks()
        cf = m.spec.components[0].cov_fn
        r = jnp.asarray(y)
        nll_local = float(clustered.nll_gaussian(
            cf, jnp.asarray([0.2, 1.0, 0.2]), blocks, r))
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sharded = clustered.ClusterBlocks(
            idx=jax.device_put(blocks.idx, NamedSharding(mesh, P("data"))),
            valid=jax.device_put(blocks.valid, NamedSharding(mesh, P("data"))),
            coords=jax.device_put(blocks.coords,
                                  NamedSharding(mesh, P("data"))),
            num_data=blocks.num_data)
        nll_sharded = float(clustered.nll_gaussian(
            cf, jnp.asarray([0.2, 1.0, 0.2]), sharded, r))
        assert abs(nll_local - nll_sharded) < 1e-10
