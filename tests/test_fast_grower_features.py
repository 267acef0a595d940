"""Round-4 coverage of the single-dispatch jitted grower.

The jitted fast path (``tree.py _grow_tree_jit``) now covers the feature set
the round-3 gate pushed to the host grower: categorical sorted-subset splits,
``path_smooth``, ``max_delta_step``, ``extra_trees``,
``feature_fraction_bynode``, and interaction constraints (reference roles:
``feature_histogram.hpp`` FindBestThresholdCategoricalInner / GetSplitGains
USE_SMOOTHING / USE_MAX_OUTPUT / USE_RAND, ``serial_tree_learner.cpp``
GetAllowedFeatures). These tests hold it to the host grower, which is itself
golden-tested against the reference.

Categorical comparisons are prediction-level: the forward/reverse sorted
scans can describe the SAME partition from either side (complementary left
sets, identical gain), so node labels may swap while row predictions agree to
float64 round-off.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpboost_tpu.boosting.tree import GrowerParams, grow_tree, grow_tree_fast

N, F, B = 3000, 8, 32
BASE = dict(num_leaves=15, max_depth=5, min_data_in_leaf=20,
            min_sum_hessian_in_leaf=1e-3, lambda_l2=0.1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    binned = jnp.asarray(rng.integers(0, B, size=(N, F)), jnp.int32)
    nb = jnp.full(F, B, jnp.int32)
    grad = jnp.asarray(rng.standard_normal(N))
    hess = jnp.ones(N)
    return binned, nb, grad, hess


CAT_MASK = np.zeros(F, bool)
CAT_MASK[[1, 4]] = True
IC = [[0, 1, 2], [2, 3, 4, 5], [6, 7]]

CASES = {
    "path_smooth": (GrowerParams(path_smooth=5.0, **BASE), False, {}),
    "max_delta_step": (GrowerParams(max_delta_step=0.05, **BASE), False, {}),
    "smooth_plus_mds": (GrowerParams(max_delta_step=0.05, path_smooth=3.0,
                                     **BASE), False, {}),
    "categorical": (GrowerParams(**BASE), True,
                    dict(categorical_mask=CAT_MASK)),
    "categorical_onehot": (GrowerParams(max_cat_to_onehot=40, **BASE), True,
                           dict(categorical_mask=CAT_MASK)),
    "categorical_smooth": (GrowerParams(path_smooth=2.0, **BASE), True,
                           dict(categorical_mask=CAT_MASK)),
    "interaction": (GrowerParams(**BASE), False,
                    dict(interaction_constraints=IC)),
    "interaction_cat": (GrowerParams(**BASE), True,
                        dict(interaction_constraints=IC,
                             categorical_mask=CAT_MASK)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fast_grower_feature_parity(data, case):
    binned, nb, grad, hess = data
    params, pred_only, kw = CASES[case]
    t1, rl1 = grow_tree(binned, nb, grad, hess, B, params, **kw)
    t2, rl2 = grow_tree_fast(binned, nb, grad, hess, B, params, **kw)
    assert t1.num_leaves == t2.num_leaves
    v1 = t1.leaf_value[np.asarray(rl1)]
    v2 = t2.leaf_value[np.asarray(rl2)]
    np.testing.assert_allclose(v1, v2, atol=1e-12)
    if not pred_only:
        np.testing.assert_array_equal(t1.split_feature, t2.split_feature)
        np.testing.assert_array_equal(t1.threshold_bin, t2.threshold_bin)
        np.testing.assert_allclose(t1.leaf_value, t2.leaf_value, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(rl1), np.asarray(rl2))


def test_fast_grower_nan_with_categoricals(data):
    """NA default-direction learning coexists with categorical splits."""
    binned, nb, grad, hess = data
    rng = np.random.default_rng(5)
    # feature 0 gets an exclusive NA bin at 0 on ~10% of rows
    b = np.asarray(binned).copy()
    b[:, 0] = np.where(rng.uniform(size=N) < 0.1, 0, b[:, 0] % (B - 1) + 1)
    nan_mask = np.zeros(F, bool)
    nan_mask[0] = True
    bj = jnp.asarray(b, jnp.int32)
    params = GrowerParams(**BASE)
    t1, rl1 = grow_tree(bj, nb, grad, hess, B, params,
                        categorical_mask=CAT_MASK, nan_mask=nan_mask)
    t2, rl2 = grow_tree_fast(bj, nb, grad, hess, B, params,
                             categorical_mask=CAT_MASK, nan_mask=nan_mask)
    assert t1.num_leaves == t2.num_leaves
    np.testing.assert_allclose(t1.leaf_value[np.asarray(rl1)],
                               t2.leaf_value[np.asarray(rl2)], atol=1e-12)


def test_fast_grower_extra_trees_deterministic(data):
    """extra_trees draws come from a seeded key: same seed -> same tree,
    different seed -> (almost surely) different thresholds."""
    binned, nb, grad, hess = data
    p = GrowerParams(extra_trees=True, **BASE)
    t_a, _ = grow_tree_fast(binned, nb, grad, hess, B, p,
                            rng=np.random.default_rng(7))
    t_b, _ = grow_tree_fast(binned, nb, grad, hess, B, p,
                            rng=np.random.default_rng(7))
    t_c, _ = grow_tree_fast(binned, nb, grad, hess, B, p,
                            rng=np.random.default_rng(8))
    np.testing.assert_array_equal(t_a.threshold_bin, t_b.threshold_bin)
    np.testing.assert_array_equal(t_a.split_feature, t_b.split_feature)
    assert t_a.num_leaves > 1
    assert not np.array_equal(t_a.threshold_bin, t_c.threshold_bin)


def test_fast_grower_feature_fraction_bynode(data):
    binned, nb, grad, hess = data
    p = GrowerParams(feature_fraction_bynode=0.5, **BASE)
    t, rl = grow_tree_fast(binned, nb, grad, hess, B, p,
                           rng=np.random.default_rng(3))
    assert t.num_leaves > 1
    # per-node sampling still produces a valid partition
    leaves = np.flatnonzero(t.is_leaf)
    assert set(np.unique(np.asarray(rl))) <= set(leaves.tolist())


def test_booster_uses_fast_grower_with_categoricals(monkeypatch):
    """End-to-end: forcing the fast grower on CPU reproduces the host
    grower's fit quality on a dataset with a real categorical feature."""
    import gpboost_tpu as gpb

    rng = np.random.default_rng(42)
    n = 1200
    xc = rng.integers(0, 6, size=n)
    x1 = rng.uniform(size=n)
    y = np.array([0.0, 1.5, -0.7, 0.3, 2.0, -1.2])[xc] + 2 * x1 \
        + 0.1 * rng.standard_normal(n)
    X = np.column_stack([xc.astype(float), x1])
    params = dict(objective="regression", num_leaves=15, learning_rate=0.2,
                  min_data_in_leaf=20, verbose=-1)

    def fit_predict():
        ds = gpb.Dataset(X, label=y, categorical_feature=[0])
        bst = gpb.train(params, ds, num_boost_round=20)
        return bst.predict(X)

    p_host = fit_predict()
    monkeypatch.setenv("GPBOOST_TPU_FORCE_FAST_GROWER", "1")
    p_fast = fit_predict()
    rmse_host = float(np.sqrt(np.mean((p_host - y) ** 2)))
    rmse_fast = float(np.sqrt(np.mean((p_fast - y) ** 2)))
    # f32 histogram accumulation on the fast path -> compare fit quality,
    # not bitwise trajectories
    assert rmse_fast < 0.2
    assert abs(rmse_fast - rmse_host) < 0.05 * max(rmse_host, 1e-3)
    # the categorical feature must actually be split categorically
    ds = gpb.Dataset(X, label=y, categorical_feature=[0])
    monkeypatch.setenv("GPBOOST_TPU_FORCE_FAST_GROWER", "1")
    bst = gpb.train(params, ds, num_boost_round=3)
    assert any(t.is_categorical is not None and bool(np.any(t.is_categorical))
               for t in bst.trees)
