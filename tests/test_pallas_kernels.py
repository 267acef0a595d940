"""Pallas kernel parity tests (run in interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpboost_tpu.boosting.tree import build_histogram
from gpboost_tpu.ops.kernels.histogram import histogram_pallas


def test_histogram_pallas_matches_scatter():
    rng = np.random.default_rng(0)
    n, F, B = 3000, 10, 64
    binned = jnp.asarray(rng.integers(0, B, size=(n, F)), dtype=jnp.int32)
    g = jnp.asarray(rng.standard_normal(n))
    h = jnp.abs(jnp.asarray(rng.standard_normal(n)))
    mask = jnp.asarray(rng.random(n) < 0.8)
    hg, hh, hc = histogram_pallas(binned, g, h, mask, B)
    rg, rh, rc = build_histogram(binned, g, h, mask, B)
    np.testing.assert_allclose(np.asarray(hg), np.asarray(rg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hh), np.asarray(rh), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(rc), atol=1e-6)


def test_vecchia_factors_pallas_interpret():
    from gpboost_tpu.ops import vecchia as vops
    from gpboost_tpu.ops.cov_fns import CovFunction
    from gpboost_tpu.ops.kernels.vecchia_factors import vecchia_factors_pallas
    rng = np.random.default_rng(0)
    n, m = 1024, 10
    coords = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    cp = jnp.asarray([1.0, 0.1], jnp.float32)
    a1, d1 = vops.build_factors(cov_fn, cp, coords, nb,
                                jnp.float32(0.25), True)
    a2, d2 = vecchia_factors_pallas(cp, coords, nb, jnp.float32(0.25), True,
                                    0.5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5)


def test_vecchia_nll_grad_pallas_interpret():
    from gpboost_tpu.ops import vecchia as vops
    from gpboost_tpu.ops.cov_fns import CovFunction
    from gpboost_tpu.ops.kernels.vecchia_factors import vecchia_nll_grad_pallas
    rng = np.random.default_rng(1)
    n, m = 1500, 12
    coords = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    y = jnp.asarray(np.sin(4 * np.asarray(coords)[:, 0])
                    + 0.4 * rng.standard_normal(n), jnp.float32)
    nb = vops.find_neighbors(coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    lp = jnp.log(jnp.asarray([0.2, 1.1, 0.13], jnp.float32))
    with jax.enable_x64(False):
        def nll_ref(t):
            c = jnp.exp(t)
            a, d = vops.build_factors.__wrapped__(
                cov_fn, c[1:], coords, nb, c[0], True)
            return vops.vecchia_nll(a, d, nb, y)
        v_ref, g_ref = jax.value_and_grad(nll_ref)(lp)
        v_k, g_k = vecchia_nll_grad_pallas(lp, coords, nb, y, 0.5)
    assert abs(float(v_ref) - float(v_k)) < 1e-2
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-2)


def test_vecchia_nll_grad_pallas_ard_interpret():
    """ARD extension of the fused kernel: per-dimension ranges, gradients
    for all 2 + d log-parameters."""
    from gpboost_tpu.ops import vecchia as vops
    from gpboost_tpu.ops.cov_fns import CovFunction
    from gpboost_tpu.ops.kernels.vecchia_factors import (
        vecchia_factors_pallas, vecchia_nll_grad_pallas)
    rng = np.random.default_rng(2)
    n, m = 1500, 12
    coords = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    y = jnp.asarray(np.sin(4 * np.asarray(coords)[:, 0])
                    + 0.4 * rng.standard_normal(n), jnp.float32)
    cov_fn = CovFunction.create("matern_ard", shape=1.5)
    cp = jnp.asarray([0.2, 1.1, 0.13, 0.21], jnp.float32)  # nug, var, r1, r2
    scaled = cov_fn.scale_coords(coords, cp[1:])
    nb = vops.find_neighbors(scaled, m, method="exact")
    lp = jnp.log(cp)
    with jax.enable_x64(False):
        def nll_ref(t):
            c = jnp.exp(t)
            a, d = vops.build_factors.__wrapped__(
                cov_fn, c[1:], coords, nb, c[0], True)
            return vops.vecchia_nll(a, d, nb, y)
        v_ref, g_ref = jax.value_and_grad(nll_ref)(lp)
        v_k, g_k = vecchia_nll_grad_pallas(lp, coords, nb, y, 1.5, ard=True)
        a1, d1 = vops.build_factors.__wrapped__(
            cov_fn, cp[1:], coords, nb, cp[0], True)
        a2, d2 = vecchia_factors_pallas(cp[1:], coords, nb, cp[0], True,
                                        1.5, ard=True)
    assert abs(float(v_ref) - float(v_k)) < 1e-2
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5)


def test_vecchia_factors_pallas_row_coords_interpret():
    """Prediction factor build: row_coords = prediction points with the
    observed gather table matches the jnp build."""
    from gpboost_tpu.ops import vecchia as vops
    from gpboost_tpu.ops.cov_fns import CovFunction
    from gpboost_tpu.ops.kernels.vecchia_factors import vecchia_factors_pallas
    rng = np.random.default_rng(1)
    n_o, n_p, m = 600, 1100, 8
    coords = jnp.asarray(rng.uniform(size=(n_o, 2)), dtype=jnp.float32)
    coords_pred = jnp.asarray(rng.uniform(size=(n_p, 2)), dtype=jnp.float32)
    nb = vops.find_neighbors_cross(coords_pred, coords, m, method="exact")
    cov_fn = CovFunction.create("exponential")
    cp = jnp.asarray([1.0, 0.15], jnp.float32)
    a1, d1 = vops.build_factors(cov_fn, cp, coords, nb, jnp.float32(0.2),
                                True, row_coords=coords_pred)
    a2, d2 = vecchia_factors_pallas(cp, coords, nb, jnp.float32(0.2), True,
                                    0.5, row_coords=coords_pred)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5)


def test_vecchia_nll_grad_pallas_shard_map_mesh():
    """shard_map'd fused kernel over the 8-device mesh: each device runs the
    Pallas kernel on its row shard (padded mesh layout, zero-weight pads) and
    psums the scalar outputs — must match the single-device kernel."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import gpboost_tpu as gpb
    from gpboost_tpu.models.vecchia_model import VecchiaGP
    from gpboost_tpu.ops.cov_fns import CovFunction
    from gpboost_tpu.ops.kernels.vecchia_factors import (
        vecchia_nll_grad_pallas)
    rng = np.random.default_rng(5)
    n, m = 1003, 10  # not a device multiple: exercises mesh padding rows
    coords = rng.uniform(size=(n, 2))
    r = np.sin(4 * coords[:, 0]) + 0.4 * rng.standard_normal(n)
    with gpb.use_mesh(gpb.make_mesh(8)):
        vg = VecchiaGP(coords, CovFunction.create("exponential"),
                       num_neighbors=m, ordering="none",
                       dtype=jnp.float32)
    assert getattr(vg, "_vg_pallas_mesh_jit", None) is not None
    assert vg._shard_nb.shape[0] == 1008
    lp = jnp.log(jnp.asarray([0.2, 1.1, 0.13], jnp.float32))
    r32 = jnp.asarray(r, jnp.float32)
    with jax.enable_x64(False):
        v_mesh, g_mesh = vg._vg_pallas_mesh_jit(
            lp, r32, vg._shard_nb, vg._shard_row_coords, vg._shard_w,
            vg._perm_pad)
        v_one, g_one = vecchia_nll_grad_pallas(
            lp, vg.coords_perm, vg.neighbors, r32, 0.5)
    assert abs(float(v_mesh) - float(v_one)) < 1e-2 * abs(float(v_one))
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_one),
                               rtol=1e-3, atol=1e-2)
