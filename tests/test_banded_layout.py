"""Block-banded (Hilbert-ordered) Vecchia-factor compute layout.

``vops.BandedB`` + ``banded_q_mv`` re-express the precision matvec
(B' D^-1 B) v as batched dense block matmuls under a space-filling-curve
relabeling — a pure permutation similarity, so the results must equal the
scatter-path ``precision_matvec`` to roundoff.  ``build_incoming`` /
``apply_Bt_gather`` are the gather-only transpose apply used by the same
machinery.  Reference role: the sparse-matrix B'D^-1B products inside the
mode finder, re_model_template.h / likelihoods.h (Vecchia-Laplace CG).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpboost_tpu.ops import vecchia as vops


def _random_structure(n=1500, m=12, d_coords=2, seed=0, spatial=True):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, d_coords))
    nb = np.full((n, m), -1, np.int64)
    if spatial:
        # nearest previous points: the realistic (band-friendly) structure
        order = np.argsort(coords[:, 0] + 1e-9 * coords[:, -1])
        coords = coords[order]
        for i in range(1, n):
            k = min(i, m)
            d2 = np.sum((coords[:i] - coords[i]) ** 2, axis=1)
            nb[i, :k] = np.argsort(d2)[:k]
    else:
        for i in range(1, n):
            k = min(i, m)
            nb[i, :k] = rng.choice(i, size=k, replace=False)
    a = rng.standard_normal((n, m)) * (nb >= 0)
    d = rng.uniform(0.5, 2.0, size=n)
    return coords, nb, a, d


@pytest.mark.parametrize("spatial", [True, False])
def test_banded_q_mv_matches_scatter(spatial):
    coords, nb, a, d = _random_structure(spatial=spatial)
    n = nb.shape[0]
    rng = np.random.default_rng(1)
    v = rng.standard_normal(n)
    V = rng.standard_normal((n, 3))
    aj, dj, vj, nbj = map(jnp.asarray, (a, d, v, nb))
    band = vops.BandedB(nb, coords)
    mv = vops.banded_q_mv(aj, dj, band)
    ref1 = vops.precision_matvec(aj, nbj, dj, vj)
    np.testing.assert_allclose(np.asarray(mv(vj)), np.asarray(ref1),
                               rtol=0, atol=1e-11)
    refV = jax.vmap(lambda c: vops.precision_matvec(aj, nbj, dj, c),
                    in_axes=1, out_axes=1)(jnp.asarray(V))
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(V))),
                               np.asarray(refV), rtol=0, atol=1e-11)


def test_banded_spatial_structure_is_mostly_in_band():
    coords, nb, a, d = _random_structure(spatial=True)
    band = vops.BandedB(nb, coords)
    # nearest-neighbor structures under the Hilbert relabeling must keep
    # the overwhelming majority of edges inside the block band — that is
    # the whole point of the layout
    assert band.outlier_frac < 0.05


def test_banded_q_mv_gradients_match_on_valid_slots():
    coords, nb, a, d = _random_structure()
    n = nb.shape[0]
    v = np.random.default_rng(2).standard_normal(n)
    aj, dj, vj, nbj = map(jnp.asarray, (a, d, v, nb))
    band = vops.BandedB(nb, coords)

    def f(a_, d_):
        return jnp.sum(vops.banded_q_mv(a_, d_, band)(vj) ** 2)

    def f_ref(a_, d_):
        return jnp.sum(vops.precision_matvec(a_, nbj, d_, vj) ** 2)

    g1a, g1d = jax.grad(f, argnums=(0, 1))(aj, dj)
    g2a, g2d = jax.grad(f_ref, argnums=(0, 1))(aj, dj)
    valid = np.asarray(nb) >= 0
    # cotangents at INVALID slots differ by design (the scatter path
    # leaves the -v[clip(nb)] term, the banded layout masks it); a(theta)
    # is identically 0 there so final cov-par gradients are unaffected
    np.testing.assert_allclose(np.asarray(g1a)[valid],
                               np.asarray(g2a)[valid], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1d), np.asarray(g2d), rtol=1e-9)


def test_apply_bt_gather_matches_scatter():
    _, nb, a, d = _random_structure()
    n = nb.shape[0]
    v = np.random.default_rng(3).standard_normal(n)
    aj, vj, nbj = map(jnp.asarray, (a, v, nb))
    inc_row, inc_slot = vops.build_incoming(nb)
    assert isinstance(inc_row, np.ndarray)  # trace-safety contract
    got = vops.apply_Bt_gather(aj, jnp.asarray(inc_row),
                               jnp.asarray(inc_slot), vj)
    ref = vops.apply_Bt(aj, nbj, vj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-12)
    pg = vops.precision_matvec_gather(aj, nbj, jnp.asarray(inc_row),
                                      jnp.asarray(inc_slot),
                                      jnp.asarray(d), vj)
    ref_pm = vops.precision_matvec(aj, nbj, jnp.asarray(d), vj)
    np.testing.assert_allclose(np.asarray(pg), np.asarray(ref_pm),
                               rtol=0, atol=1e-11)


def test_banded_none_for_high_dim():
    rng = np.random.default_rng(4)
    coords = rng.uniform(size=(200, 5))
    nb = np.full((200, 4), -1, np.int64)
    for i in range(1, 200):
        k = min(i, 4)
        nb[i, :k] = rng.choice(i, size=k, replace=False)
    with pytest.raises(ValueError):
        vops.BandedB(nb, coords)


def test_ng_iterative_nll_banded_on_off_agree():
    """End-to-end: the iterative Laplace NLL with the banded mode-finder
    layout engaged (default) equals the scatter-path value
    (GPBOOST_TPU_NO_BANDED=1) — the layout is a permutation similarity of
    the same linear systems, so values agree to solver tolerance."""
    import os
    from gpboost_tpu import GPModel
    from gpboost_tpu.utils.rng import sim_rand_unif

    n = 600
    x = sim_rand_unif(n * 2, init_c=0.3)
    coords = np.column_stack([x[:n], x[n:]])
    rng = np.random.default_rng(11)
    y = (rng.uniform(size=n) < 0.5).astype(np.float64)
    kw = dict(num_rand_vec_trace=50, lanczos_steps=30, cg_tol=1e-10,
              cg_max_iter=400, seed_rand_vec_trace=7)

    def one(disable):
        if disable:
            os.environ["GPBOOST_TPU_NO_BANDED"] = "1"
        else:
            os.environ.pop("GPBOOST_TPU_NO_BANDED", None)
        try:
            m = GPModel(gp_coords=coords, cov_function="exponential",
                        gp_approx="vecchia", num_neighbors=15,
                        likelihood="bernoulli_logit")
            vec = m._approx
            if disable:
                assert vec._banded(vec.neighbors) is None
            else:
                band = vec._banded(vec.neighbors)
                assert band is not None and band.n == n
            cp = jnp.asarray([1.2, 0.15])
            return float(vec.nll_laplace_iterative(
                cp, jnp.asarray(y), None, None, **kw))
        finally:
            os.environ.pop("GPBOOST_TPU_NO_BANDED", None)

    v_band = one(False)
    v_scat = one(True)
    assert abs(v_band - v_scat) < 1e-6, (v_band, v_scat)
