"""Exclusive Feature Bundling (EFB; reference ``dataset.cpp:53-297``
``GetConflictCount``/``FindGroups``). The TPU variant is LOSSLESS-only:
bundles contain only features that are never simultaneously non-default, and
per-feature histograms are reconstructed exactly from bundle histograms, so
trained models are identical with bundling on or off."""
import numpy as np

import gpboost_tpu as gpb
from gpboost_tpu.boosting.dataset import Dataset, build_efb
from gpboost_tpu.boosting.tree import build_histogram, expand_bundle_hist


def _onehot_data(n=800, seed=0):
    rng = np.random.default_rng(seed)
    Xd = rng.uniform(size=(n, 3))
    lv = rng.integers(0, 12, size=n)
    Xoh = np.zeros((n, 12))
    Xoh[np.arange(n), lv] = rng.uniform(1, 2, size=n)
    X = np.hstack([Xd, Xoh])
    y = 2 * Xd[:, 0] + 0.7 * (lv % 3) + 0.1 * rng.normal(size=n)
    return X, y


def test_efb_engages_on_sparse_and_not_on_dense():
    X, y = _onehot_data()
    ds = Dataset(X, label=y)
    assert ds.efb is not None and ds.efb.n_multi_bundles >= 1
    assert ds.efb.binned_hist.shape[1] < X.shape[1]
    rng = np.random.default_rng(1)
    ds_dense = Dataset(rng.uniform(size=(500, 6)),
                       label=rng.standard_normal(500))
    assert ds_dense.efb is None  # dense features conflict -> no saving
    ds_off = Dataset(X, label=y, params={"enable_bundle": False})
    assert ds_off.efb is None


def test_histogram_reconstruction_is_exact():
    X, y = _onehot_data()
    ds = Dataset(X, label=y)
    efb = ds.efb
    rng = np.random.default_rng(2)
    import jax.numpy as jnp
    grad = jnp.asarray(rng.standard_normal(ds.num_data))
    hess = jnp.asarray(rng.uniform(0.5, 1.5, size=ds.num_data))
    mask = jnp.asarray(rng.random(ds.num_data) < 0.7)
    ref = build_histogram(ds.binned, grad, hess, mask, ds.max_num_bins)
    bh = build_histogram(efb.binned_hist, grad, hess, mask,
                         efb.max_bins_hist)
    got = expand_bundle_hist(bh[0], bh[1], bh[2], efb.src_col, efb.src_bin,
                             efb.default_bin, efb.fix_mask)
    for r, g in zip(ref, got):
        g = np.asarray(g)[:, :ds.max_num_bins]
        np.testing.assert_allclose(g, np.asarray(r), atol=1e-10)


def test_training_identical_with_and_without_bundling():
    X, y = _onehot_data()
    params = {"objective": "regression", "num_leaves": 16, "verbose": -1,
              "min_data_in_leaf": 5}
    b_off = gpb.train(dict(params, enable_bundle=False),
                      Dataset(X, label=y,
                              params={"enable_bundle": False}),
                      num_boost_round=10)
    b_on = gpb.train(params, Dataset(X, label=y), num_boost_round=10)
    np.testing.assert_allclose(b_on.predict(X), b_off.predict(X), atol=1e-12)


def test_bundler_rejects_conflicting_features():
    # two features active on overlapping rows must not bundle
    rng = np.random.default_rng(3)
    n = 400
    a = np.zeros(n)
    b = np.zeros(n)
    idx = rng.choice(n, 100, replace=False)
    a[idx] = rng.uniform(1, 2, 100)
    b[idx[:50]] = rng.uniform(1, 2, 50)   # 50 conflicting rows
    binned = Dataset(np.column_stack([a, b]),
                     label=rng.standard_normal(n))
    efb = binned.efb
    if efb is not None:
        # if a layout was built, the conflicting pair must be in
        # different columns
        assert efb.src_col[0] != efb.src_col[1]


def test_efb_survives_binary_roundtrip(tmp_path):
    X, y = _onehot_data()
    ds = Dataset(X, label=y)
    f = str(tmp_path / "ds.bin")
    ds.save_binary(f)
    ds2 = Dataset(f)
    assert ds2.efb is not None
    assert ds2.efb.binned_hist.shape == ds.efb.binned_hist.shape
