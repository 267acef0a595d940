"""Round-5: the jitted grower covers monotone constraints, forced splits,
and CEGB (VERDICT round-4 #3) — the last features that used to evict the
fast path and the device-resident loop. Held to the host grower, which is
golden-tested against the reference (``monotone_constraints.hpp``,
``serial_tree_learner.cpp ForceSplits``,
``cost_effective_gradient_boosting.hpp``)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gpboost_tpu.boosting.tree import (CEGBState, GrowerParams, grow_tree,
                                       grow_tree_fast,
                                       flatten_forced_splits)

N, F, B = 3000, 8, 32
BASE = dict(num_leaves=15, max_depth=5, min_data_in_leaf=20,
            min_sum_hessian_in_leaf=1e-3, lambda_l2=0.1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(1)
    binned = jnp.asarray(rng.integers(0, B, size=(N, F)), jnp.int32)
    nb = jnp.full(F, B, jnp.int32)
    # gradient correlated with features so monotone constraints bind
    bn = np.asarray(binned)
    grad = jnp.asarray(-0.1 * bn[:, 0] + 0.08 * bn[:, 2]
                       + rng.standard_normal(N))
    hess = jnp.ones(N)
    return binned, nb, grad, hess


MONO = np.array([1, 0, -1, 0, 0, 1, 0, 0])

MONO_CASES = {
    "basic": GrowerParams(monotone_constraints_method="basic", **BASE),
    "intermediate": GrowerParams(
        monotone_constraints_method="intermediate", **BASE),
    "advanced": GrowerParams(
        monotone_constraints_method="advanced", **BASE),
    "basic_penalty": GrowerParams(
        monotone_constraints_method="basic", monotone_penalty=1.5, **BASE),
    "intermediate_mds": GrowerParams(
        monotone_constraints_method="intermediate", max_delta_step=0.08,
        **BASE),
    "basic_smooth": GrowerParams(
        monotone_constraints_method="basic", path_smooth=3.0, **BASE),
}


def _assert_tree_equal(t1, rl1, t2, rl2):
    assert t1.num_leaves == t2.num_leaves
    np.testing.assert_array_equal(t1.split_feature, t2.split_feature)
    np.testing.assert_array_equal(t1.threshold_bin, t2.threshold_bin)
    np.testing.assert_allclose(t1.leaf_value, t2.leaf_value, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(rl1), np.asarray(rl2))


@pytest.mark.parametrize("case", sorted(MONO_CASES))
def test_monotone_parity_with_host_grower(data, case):
    binned, nb, grad, hess = data
    params = MONO_CASES[case]
    t1, rl1 = grow_tree(binned, nb, grad, hess, B, params,
                        monotone_constraints=MONO)
    t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params,
                             monotone_constraints=MONO)
    _assert_tree_equal(t1, rl1, t2, rl2)


def test_monotone_constraint_actually_holds(data):
    """On every +1 split the left subtree's leaf outputs stay <= the right
    subtree's (basic midpoint bounds guarantee this ordering)."""
    binned, nb, grad, hess = data
    params = MONO_CASES["basic"]
    t, rl = grow_tree_fast(binned, nb, grad, hess, B, params,
                           monotone_constraints=MONO)

    def leaves_under(node):
        if t.is_leaf[node]:
            return [float(t.leaf_value[node])]
        return (leaves_under(int(t.left[node]))
                + leaves_under(int(t.right[node])))

    checked = 0
    for node in t.internal_nodes():
        mc = MONO[int(t.split_feature[node])]
        if mc == 0:
            continue
        lmax = max(leaves_under(int(t.left[node])))
        rmin = min(leaves_under(int(t.right[node])))
        if mc > 0:
            assert lmax <= rmin + 1e-12
        else:
            assert min(leaves_under(int(t.left[node]))) + 1e-12 >= \
                max(leaves_under(int(t.right[node])))
        checked += 1
    assert checked > 0     # constraints actually bound on this data


def _forced():
    return {"feature": 3, "threshold_bin": 15,
            "left": {"feature": 6, "threshold_bin": 10},
            "right": {"feature": 1, "threshold_bin": 20}}


def test_forced_splits_parity(data):
    binned, nb, grad, hess = data
    params = GrowerParams(**BASE)
    t1, rl1 = grow_tree(binned, nb, grad, hess, B, params,
                        forced_splits=_forced())
    t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params,
                             forced_splits=_forced())
    _assert_tree_equal(t1, rl1, t2, rl2)
    # the forced prefix is really in the tree
    assert t2.split_feature[0] == 3 and t2.threshold_bin[0] == 15
    assert t2.split_feature[1] == 6 and t2.split_feature[2] == 1


def test_flatten_forced_splits_leaf_ids():
    ops = flatten_forced_splits(_forced(), 15)
    assert ops == ((0, 3, 15), (1, 6, 10), (2, 1, 20))
    assert flatten_forced_splits(None, 15) == ()
    # num_leaves budget truncates the prefix
    assert len(flatten_forced_splits(_forced(), 2)) == 1


def test_forced_with_monotone_parity(data):
    binned, nb, grad, hess = data
    params = MONO_CASES["intermediate"]
    t1, rl1 = grow_tree(binned, nb, grad, hess, B, params,
                        monotone_constraints=MONO, forced_splits=_forced())
    t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params,
                             monotone_constraints=MONO,
                             forced_splits=_forced())
    _assert_tree_equal(t1, rl1, t2, rl2)


CEGB_CASES = {
    "split_pen": dict(tradeoff=2.0, penalty_split=1e-4),
    "coupled": dict(tradeoff=1.5,
                    penalty_feature_coupled=np.full(F, 5.0)),
    "lazy": dict(tradeoff=1.5,
                 penalty_feature_lazy=np.full(F, 0.01)),
    "coupled_lazy": dict(tradeoff=1.2,
                         penalty_feature_coupled=np.full(F, 3.0),
                         penalty_feature_lazy=np.full(F, 0.005)),
}


@pytest.mark.parametrize("case", sorted(CEGB_CASES))
def test_cegb_parity_with_host_grower(data, case):
    binned, nb, grad, hess = data
    params = GrowerParams(**BASE)
    kw = CEGB_CASES[case]
    c1 = CEGBState(F, N, **kw)
    c2 = CEGBState(F, N, **kw)
    # TWO consecutive trees: usage state must persist identically
    for _ in range(2):
        t1, rl1 = grow_tree(binned, nb, grad, hess, B, params, cegb=c1)
        t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params,
                                 cegb=c2)
        _assert_tree_equal(t1, rl1, t2, rl2)
        np.testing.assert_array_equal(c1.feature_used_in_split,
                                      c2.feature_used_in_split)
        if c1.lazy is not None:
            np.testing.assert_array_equal(
                np.asarray(c1.feature_used_in_data),
                np.asarray(c2.feature_used_in_data))


def test_booster_end_to_end_fast_path(monkeypatch):
    """Through gpb.train with GPBOOST_TPU_FORCE_FAST_GROWER=1: monotone +
    forced + cegb configs produce the same model as the host path."""
    import gpboost_tpu as gpb

    rng = np.random.default_rng(42)
    n = 1500
    X = rng.uniform(size=(n, 4))
    y = (2.0 * X[:, 0] - 1.0 * X[:, 1] + np.sin(5 * X[:, 2])
         + 0.1 * rng.standard_normal(n))
    for extra in (
            {"monotone_constraints": [1, -1, 0, 0],
             "monotone_constraints_method": "intermediate"},
            {"cegb_tradeoff": 1.5,
             "cegb_penalty_feature_coupled": [2.0] * 4},
            {"forced_splits": {"feature": 0, "threshold": 0.5}},
    ):
        params = dict(objective="regression", num_leaves=15,
                      learning_rate=0.2, min_data_in_leaf=20, verbose=-1,
                      **extra)
        monkeypatch.setenv("GPBOOST_TPU_FORCE_FAST_GROWER", "0")
        b1 = gpb.train(dict(params), gpb.Dataset(X, label=y),
                       num_boost_round=5)
        monkeypatch.setenv("GPBOOST_TPU_FORCE_FAST_GROWER", "1")
        b2 = gpb.train(dict(params), gpb.Dataset(X, label=y),
                       num_boost_round=5)
        # the booster feeds the fast path f32 gradients (LightGBM's
        # histogram precision); the host grower accumulates f64 -> ~1e-7
        np.testing.assert_allclose(b1.predict(X), b2.predict(X),
                                   atol=1e-5, err_msg=str(extra))


def test_device_loop_accepts_monotone_and_forced(monkeypatch):
    """The fused device loop no longer excludes monotone/forced configs."""
    import gpboost_tpu as gpb
    from gpboost_tpu.boosting import device_loop

    rng = np.random.default_rng(3)
    n = 400
    coords = rng.uniform(size=(n, 2))
    X = rng.uniform(size=(n, 3))
    y = (np.sin(3 * coords[:, 0]) + X[:, 0]
         + 0.1 * rng.standard_normal(n))
    monkeypatch.setenv("GPBOOST_TPU_FORCE_DEVICE_LOOP", "1")
    calls = {"n": 0}
    orig = device_loop.train_device

    def spy(b, r):
        calls["n"] += 1
        return orig(b, r)

    monkeypatch.setattr(device_loop, "train_device", spy)
    gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                     gp_approx="vecchia", num_neighbors=8,
                     vecchia_ordering="none")
    gp.set_optim_params({"optimizer_cov": "lbfgs", "maxit": 5,
                         "init_cov_pars": [0.25, 1.0, 0.1]})
    bst = gpb.train({"objective": "regression", "num_leaves": 8,
                     "verbose": -1,
                     "monotone_constraints": [1, 0, 0],
                     "forced_splits": {"feature": 0, "threshold": 0.5}},
                    gpb.Dataset(X, label=y), gp_model=gp,
                    num_boost_round=2)
    assert calls["n"] == 1
    assert len(bst.trees) == 2
    assert bst.trees[0].split_feature[0] == 0   # forced root split
