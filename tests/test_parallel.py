"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction
from gpboost_tpu.parallel.mesh import (make_mesh, sharded_histogram_fn,
                                       sharded_vecchia_nll_fn)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module", autouse=True)
def _fresh_xla_client():
    """Re-initialize the XLA CPU client before this module's big SPMD
    compiles. After hundreds of prior tests the long-lived client can
    segfault inside backend_compile_and_load on the large mesh programs
    (observed twice in full-suite runs; the same tests pass standalone
    every time — accumulated compiler/client state, not our graphs).
    A fresh client reproduces the standalone conditions."""
    import jax._src.xla_bridge as xb
    jax.clear_caches()
    xb._clear_backends()
    yield


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_vecchia_nll_matches_single(mesh):
    n, m = 128, 8
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(rng.standard_normal(n))
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    cp = jnp.asarray([0.1, 1.0, 0.2])
    a, d = vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)
    ref = vops.vecchia_nll(a, d, nb, y)
    nll_sh = sharded_vecchia_nll_fn(cov_fn, mesh)
    got = nll_sh(cp, coords, nb, y)
    assert abs(float(got) - float(ref)) < 1e-8


def test_sharded_gradient_matches(mesh):
    n, m = 64, 6
    rng = np.random.default_rng(1)
    coords = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(rng.standard_normal(n))
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    nll_sh = sharded_vecchia_nll_fn(cov_fn, mesh)
    lp = jnp.log(jnp.asarray([0.1, 1.0, 0.2]))

    def f_sh(lp):
        return nll_sh(jnp.exp(lp), coords, nb, y)

    def f_ref(lp):
        cp = jnp.exp(lp)
        a, d = vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)
        return vops.vecchia_nll(a, d, nb, y)

    g_sh = jax.grad(f_sh)(lp)
    g_ref = jax.grad(f_ref)(lp)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8)


def test_sharded_histogram_matches(mesh):
    n, F, B = 256, 4, 16
    rng = np.random.default_rng(2)
    binned = jnp.asarray(rng.integers(0, B, size=(n, F)), dtype=jnp.int32)
    grad = jnp.asarray(rng.standard_normal(n))
    hess = jnp.abs(jnp.asarray(rng.standard_normal(n)))
    mask = jnp.asarray(rng.random(n) < 0.8)
    hist_sh = sharded_histogram_fn(mesh, B)
    hg, hh, hc = hist_sh(binned, grad, hess, mask)
    from gpboost_tpu.boosting.tree import build_histogram
    rg, rh, rc = build_histogram(binned, grad, hess, mask, B)
    np.testing.assert_allclose(np.asarray(hg), np.asarray(rg), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(rh), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(rc), atol=1e-10)


@pytest.mark.slow  # the driver runs dryrun_multichip separately every round
def test_dryrun_multichip_product_paths(mesh):
    """The driver dry run: real GPModel.fit + 3 gpb.train rounds under the
    mesh, asserted equal to single-device inside."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_mesh_vecchia_fit_matches_single_device(mesh):
    """`GPModel(gp_approx='vecchia').fit()` under `use_mesh` runs the WHOLE
    optimizer loop on sharded rows and reproduces the single-device fit
    (VERDICT round-1 item 1)."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(7)
    n = 131  # not divisible by 8: uneven shards must work
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(1.2 * np.exp(-D / 0.3) + 0.1 * np.eye(n))
    y = L @ rng.standard_normal(n)

    def run():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="vecchia", num_neighbors=8,
                         vecchia_ordering="none")
        gp.fit(y=y, params={"maxit": 15, "trace": False})
        return gp

    gp1 = run()
    with gpb.use_mesh(mesh):
        gp2 = run()
        devs = {s.device for s in gp2._approx._shard_nb.addressable_shards}
        assert len(devs) == 8
        assert gp2._approx._shard_nb.shape[0] == 136  # padded to 8-multiple
    np.testing.assert_allclose(gp2.cov_pars_, gp1.cov_pars_, rtol=1e-10)
    assert abs(gp2.current_nll_ - gp1.current_nll_) < 1e-8
    # post-fit prediction from the sharded model matches too
    cp = rng.uniform(size=(9, 2))
    p1 = gp1.predict(y=y, gp_coords_pred=cp, predict_var=True)
    p2 = gp2.predict(y=y, gp_coords_pred=cp, predict_var=True)
    np.testing.assert_allclose(np.asarray(p2["mu"]), np.asarray(p1["mu"]),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p2["var"]), np.asarray(p1["var"]),
                               rtol=1e-9)


def test_mesh_vecchia_laplace_fit_predict_matches_single_device(mesh):
    """Non-Gaussian (bernoulli_logit) Vecchia-Laplace fit + predictions under
    the mesh: the matrix-free Newton-CG mode finder, stochastic logdet and
    simulation-based predictive variances all run SPMD over the padded
    row-sharded layout and reproduce the single-device values (VERDICT
    round-2 item 1; ``FindModePostRandEffCalcMLLVecchia`` likelihoods.h:2765,
    ``PredictVecchia`` Vecchia_utils.cpp:1634)."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(21)
    n = 131
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(1.0 * np.exp(-D / 0.3) + 1e-10 * np.eye(n))
    b = L @ rng.standard_normal(n)
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-b))).astype(np.float64)
    cp = rng.uniform(size=(37, 2))

    def run():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="vecchia", num_neighbors=8,
                         vecchia_ordering="none",
                         likelihood="bernoulli_logit",
                         matrix_inversion_method="iterative")
        gp.fit(y=y, params={"maxit": 5, "trace": False})
        gp.set_prediction_data(nsim_var_pred=100)
        pr = gp.predict(gp_coords_pred=cp, predict_var=True,
                        predict_response=True)
        return gp, pr

    gp1, pr1 = run()
    with gpb.use_mesh(mesh):
        gp2, pr2 = run()
        devs = {s.device for s in gp2._approx._shard_nb.addressable_shards}
        assert len(devs) == 8
    np.testing.assert_allclose(gp2.cov_pars_, gp1.cov_pars_, rtol=1e-8)
    assert abs(gp2.current_nll_ - gp1.current_nll_) < 1e-8
    np.testing.assert_allclose(pr2["mu"], pr1["mu"], atol=1e-8)
    np.testing.assert_allclose(pr2["var"], pr1["var"], atol=1e-8)


def test_mesh_gaussian_predict_row_sharded(mesh):
    """Gaussian Vecchia predictions under the mesh run row-sharded over the
    prediction points (shard_map kriging) and match single-device exactly."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(22)
    n = 131
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(0.9 * np.exp(-D / 0.25) + 0.05 * np.eye(n))
    y = L @ rng.standard_normal(n)
    cp = rng.uniform(size=(29, 2))  # not divisible by 8

    def run():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="vecchia", num_neighbors=8,
                         vecchia_ordering="none")
        gp.fit(y=y, params={"maxit": 8, "trace": False})
        return gp.predict(gp_coords_pred=cp, predict_var=True)

    p1 = run()
    with gpb.use_mesh(mesh):
        p2 = run()
    np.testing.assert_allclose(p2["mu"], p1["mu"], atol=1e-9)
    np.testing.assert_allclose(p2["var"], p1["var"], atol=1e-9)


def test_mesh_gpboost_train_matches_single_device(mesh):
    """3 rounds of the GPBoost algorithm (trees + per-iteration cov refits)
    under the mesh match single-device scores to 1e-10."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(8)
    n = 200
    coords = rng.uniform(size=(n, 2))
    X = rng.uniform(size=(n, 3))
    f = 2.0 * np.sin(5.0 * X[:, 0]) + X[:, 1]
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(0.8 * np.exp(-D / 0.3) + 0.05 * np.eye(n))
    y = f + L @ rng.standard_normal(n)
    params = {"objective": "regression", "num_leaves": 8,
              "learning_rate": 0.2, "min_data_in_leaf": 5, "verbose": -1}

    def run():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="vecchia", num_neighbors=8,
                         vecchia_ordering="none")
        ds = gpb.Dataset(X, label=y)
        return gpb.train(params, ds, gp_model=gp, num_boost_round=3), gp

    b1, g1 = run()
    with gpb.use_mesh(mesh):
        b2, g2 = run()
        devs = {s.device for s in b2.train_set.binned.addressable_shards}
        assert len(devs) == 8
    np.testing.assert_allclose(np.asarray(b2._score), np.asarray(b1._score),
                               atol=1e-10)
    np.testing.assert_allclose(g2.cov_pars_, g1.cov_pars_, rtol=1e-9)


def test_mesh_unsupported_family_raises(mesh):
    """use_mesh on an unsupported model family raises rather than silently
    running single-device; grouped-RE models (supported since round 3)
    accept the mesh."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(9)
    # dense exact GP: no sharded path
    coords = rng.uniform(size=(64, 2))
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="none")
    with pytest.raises(NotImplementedError):
        gp.use_mesh(mesh)
    # grouped REs shard (round-3 addition: padded row-sharded layout)
    group = np.arange(64) % 8
    gp2 = gpb.GPModel(group_data=group, likelihood="gaussian")
    assert gp2.use_mesh(mesh) is gp2
    assert gp2._mesh is mesh


def test_sharded_cluster_nll_matches_batched(mesh):
    """Cluster-axis sharding (SURVEY §2.5 item 8) reproduces the batched
    per-cluster NLL, including gradients, with C not divisible by 8."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gpboost_tpu.models import clustered
    from gpboost_tpu.parallel.mesh import (pad_cluster_blocks,
                                           sharded_cluster_nll_fn)
    rng = np.random.default_rng(3)
    C_real, m_max = 13, 12
    codes = np.repeat(np.arange(C_real), rng.integers(4, m_max, size=C_real))
    n = len(codes)
    coords = rng.uniform(size=(n, 2))
    r = rng.standard_normal(n)
    cov_fn = CovFunction.create("exponential")
    blocks = clustered.prepare_blocks(codes, coords)
    cov_pars = jnp.asarray([0.1, 1.0, 0.2])
    ref = clustered.nll_gaussian(cov_fn, cov_pars, blocks, jnp.asarray(r))

    coords_p, valid_p, rb_p = pad_cluster_blocks(blocks, jnp.asarray(r), 8)
    sharding = NamedSharding(mesh, P("data"))
    coords_p = jax.device_put(coords_p, sharding)
    valid_p = jax.device_put(valid_p, sharding)
    rb_p = jax.device_put(rb_p, sharding)
    nll_fn = sharded_cluster_nll_fn(cov_fn, mesh)
    got = nll_fn(cov_pars, coords_p, valid_p, rb_p, blocks.num_data)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)

    # gradients agree too
    g_ref = jax.grad(lambda cp: clustered.nll_gaussian(
        cov_fn, cp, blocks, jnp.asarray(r)))(cov_pars)
    g_sh = jax.grad(lambda cp: nll_fn(cp, coords_p, valid_p, rb_p,
                                      blocks.num_data))(cov_pars)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-10)


def test_mesh_feature_parallel_matches_single_device(mesh):
    """tree_learner='feature': binned shards on the FEATURE axis (the
    FeatureParallelTreeLearner layout) and training matches single-device."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(11)
    n, F = 300, 6  # F not divisible by 8: feature padding must work
    X = rng.uniform(size=(n, F))
    y = 2 * X[:, 0] - X[:, 1] + 0.2 * rng.normal(size=n)
    params = {"objective": "regression", "num_leaves": 8, "verbose": -1,
              "min_data_in_leaf": 5, "tree_learner": "feature"}

    def run():
        ds = gpb.Dataset(X, label=y, params=params)
        return gpb.train(params, ds, num_boost_round=3)

    b1 = run()
    with gpb.use_mesh(mesh):
        b2 = run()
        assert b2.train_set.binned.shape[1] == 8  # padded to mesh multiple
        devs = {s.device for s in b2.train_set.binned.addressable_shards}
        assert len(devs) == 8
    np.testing.assert_allclose(np.asarray(b2._score), np.asarray(b1._score),
                               atol=1e-10)


def test_voting_context_aggregates_selected_features(mesh):
    """make_voting_context with top_k covering all features psums exact
    histograms and exact leaf totals."""
    from gpboost_tpu.boosting.tree import build_histogram
    from gpboost_tpu.parallel.mesh import make_voting_context
    rng = np.random.default_rng(5)
    n, F, B = 160, 4, 16
    binned = jnp.asarray(rng.integers(0, B, size=(n, F)), dtype=jnp.int32)
    grad = jnp.asarray(rng.standard_normal(n))
    hess = jnp.ones(n)
    mask = jnp.asarray(rng.random(n) < 0.8)
    nb = np.full(F, B, np.int32)
    ctx = make_voting_context(mesh, B, top_k=F, num_bins_per_feat=nb,
                              lambda_l1=0.0, lambda_l2=0.0,
                              min_data_in_leaf=1.0, min_sum_hessian=1e-3)
    (hg, hh, hc), sel_mask, (g_tot, h_tot, c_tot) = ctx(
        binned, grad, hess, mask)
    rg, rh, rc = build_histogram(binned, grad, hess, mask, B)
    # every feature selected -> exact aggregation everywhere
    assert sel_mask.all()
    np.testing.assert_allclose(np.asarray(hg), np.asarray(rg), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(rh), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(rc), atol=1e-10)
    assert abs(g_tot - float(jnp.sum(rg)) / F) < 1e-10
    assert abs(c_tot - float(jnp.sum(mask))) < 1e-10


def test_mesh_voting_matches_serial_when_topk_covers_all(mesh):
    """PV-Tree with top_k >= num_features selects every feature, so the
    aggregated histograms — and the trees — match serial training exactly."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(12)
    n, F = 400, 4
    X = rng.uniform(size=(n, F))
    y = 2 * X[:, 0] - X[:, 1] + 0.2 * rng.normal(size=n)
    params = {"objective": "regression", "num_leaves": 4, "verbose": -1,
              "min_data_in_leaf": 2, "tree_learner": "voting", "top_k": F}

    def run():
        ds = gpb.Dataset(X, label=y, params=params)
        return gpb.train(params, ds, num_boost_round=3)

    b1 = run()
    with gpb.use_mesh(mesh):
        b2 = run()
    np.testing.assert_allclose(np.asarray(b2._score)[:n],
                               np.asarray(b1._score), atol=1e-10)


def test_mesh_voting_small_topk_restricts_and_trains(mesh):
    """With top_k << F the vote restricts split search to 2*top_k features
    per leaf; training still reduces the loss."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(13)
    n, F = 320, 24
    X = rng.uniform(size=(n, F))
    y = 3 * X[:, 5] - 2 * X[:, 17] + 0.1 * rng.normal(size=n)
    params = {"objective": "regression", "num_leaves": 8, "verbose": -1,
              "min_data_in_leaf": 2, "tree_learner": "voting", "top_k": 3}
    with gpb.use_mesh(mesh):
        ds = gpb.Dataset(X, label=y, params=params)
        b = gpb.train(params, ds, num_boost_round=5)
    pred = b.predict(X)
    assert np.all(np.isfinite(pred))
    mse0 = float(np.mean((y - y.mean()) ** 2))
    mse = float(np.mean((y - pred) ** 2))
    assert mse < 0.5 * mse0
    # the informative features must win the vote
    used = {int(f) for t in b.trees
            for f in t.split_feature[t.internal_nodes()]}
    assert 5 in used and 17 in used


def test_mesh_grouped_fit_matches_single_device(mesh):
    """Grouped-RE fits under `use_mesh` (VERDICT round-2 item 3): the
    segment-sum Z products partition over padded row shards with the pads
    masked out (`ModelData.row_weight`), psum'd into the q-dim dense work —
    Gaussian (Woodbury), Laplace (b-space Newton) and the iterative CG path
    all reproduce single-device values (reference Z'WZ loops,
    re_model_template.h:5020-5394)."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(31)
    n, ngr = 133, 25
    group = rng.integers(0, ngr, size=n)
    b = 0.7 * rng.standard_normal(ngr)
    X = rng.uniform(size=(n, 2))
    y = X @ np.array([1.0, -2.0]) + b[group] + 0.3 * rng.standard_normal(n)
    p = 1.0 / (1.0 + np.exp(-(X @ np.array([0.7, -0.5]) + b[group])))
    yb = (rng.uniform(size=n) < p).astype(np.float64)

    def run(lik, yy, mim="cholesky"):
        gp = gpb.GPModel(group_data=group, likelihood=lik,
                         matrix_inversion_method=mim)
        gp.fit(y=yy, X=X, params={"maxit": 25, "trace": False})
        return gp

    cases = [("gaussian", y, "cholesky"), ("bernoulli_logit", yb, "cholesky"),
             ("gaussian", y, "iterative")]
    singles = [run(*c) for c in cases]
    with gpb.use_mesh(mesh):
        meshed = [run(*c) for c in cases]
        assert meshed[0]._mesh is not None
    for s, m_ in zip(singles, meshed):
        np.testing.assert_allclose(m_.cov_pars_, s.cov_pars_, rtol=1e-7)
        np.testing.assert_allclose(m_.coefs_, s.coefs_, rtol=1e-6)
        assert abs(m_.current_nll_ - s.current_nll_) < 1e-6


def test_mesh_fitc_fit_matches_single_device(mesh):
    """FITC fits under `use_mesh`: the [n, k] cross-covariance panels and
    Lambda diagonal shard over padded rows (pads' cross-cov zeroed,
    lambda -> 1), Woodbury [k, k] work replicates (VERDICT round-2 item 3)."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(32)
    n = 133
    coords = rng.uniform(size=(n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    L = np.linalg.cholesky(1.1 * np.exp(-D / 0.3) + 0.1 * np.eye(n))
    y = L @ rng.standard_normal(n)
    cp = rng.uniform(size=(9, 2))

    def run():
        gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                         gp_approx="fitc", num_ind_points=30)
        gp.fit(y=y, params={"maxit": 15, "trace": False})
        return gp, gp.predict(gp_coords_pred=cp, predict_var=True)

    g1, p1 = run()
    with gpb.use_mesh(mesh):
        g2, p2 = run()
        devs = {s.device
                for s in g2._approx._shard_coords.addressable_shards}
        assert len(devs) == 8
    np.testing.assert_allclose(g2.cov_pars_, g1.cov_pars_, rtol=1e-9)
    assert abs(g2.current_nll_ - g1.current_nll_) < 1e-8
    np.testing.assert_allclose(p2["mu"], p1["mu"], atol=1e-9)
    np.testing.assert_allclose(p2["var"], p1["var"], atol=1e-9)


def test_mesh_clustered_approx_fit_matches_single_device(mesh):
    """cluster_ids + fitc / full_scale_tapering under `use_mesh`: the
    independent clusters shard over the CLUSTER axis as one vmapped padded
    batch (VERDICT round-3 item 9 — the reference loops its per-cluster
    maps serially, re_model_template.h:5020-5144)."""
    import gpboost_tpu as gpb
    rng = np.random.default_rng(41)
    n_c, C = 40, 5                      # 5 clusters -> uneven over 8 devices
    sizes = [40, 37, 40, 33, 40]
    coords_list, y_list, cid_list = [], [], []
    for c, m in enumerate(sizes):
        cc = rng.uniform(size=(m, 2))
        D = np.sqrt(((cc[:, None] - cc[None]) ** 2).sum(-1))
        L = np.linalg.cholesky(1.2 * np.exp(-D / 0.25) + 0.07 * np.eye(m))
        coords_list.append(cc)
        y_list.append(L @ rng.standard_normal(m))
        cid_list.append(np.full(m, c))
    coords = np.concatenate(coords_list)
    y = np.concatenate(y_list)
    cid = np.concatenate(cid_list)

    def run(approx):
        kw = dict(gp_coords=coords, cov_function="exponential",
                  gp_approx=approx, num_ind_points=12, cluster_ids=cid)
        if approx == "full_scale_tapering":
            kw["cov_fct_taper_range"] = 0.6
        gp = gpb.GPModel(**kw)
        gp.fit(y=y, params={"maxit": 10, "trace": False})
        return gp

    for approx in ("fitc", "full_scale_tapering"):
        g1 = run(approx)
        with gpb.use_mesh(mesh):
            g2 = run(approx)
            assert g2._approx._batched, approx
            devs = {s.device
                    for s in g2._approx._b_coords.addressable_shards}
            assert len(devs) == 8
        np.testing.assert_allclose(g2.cov_pars_, g1.cov_pars_, rtol=1e-9,
                                   err_msg=approx)
        assert abs(g2.current_nll_ - g1.current_nll_) < 1e-8, approx
