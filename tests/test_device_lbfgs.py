"""Whole-loop-on-device L-BFGS driver (optimizers.lbfgs_device).

On tunneled/remote accelerators each host-driven objective evaluation is a
blocking round trip; the compiled lax.while_loop runs the entire fit in one
dispatch. These tests exercise the driver itself on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gpboost_tpu.models import optimizers
from gpboost_tpu.models.optimizers import OptimConfig


def _quad_vg(t, A, b):
    r = A @ t - b
    return 0.5 * jnp.dot(r, r), A.T @ r


def test_device_lbfgs_converges_and_matches_scipy():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((6, 4)))
    b = jnp.asarray(rng.standard_normal(6))
    cfg = OptimConfig(maxit=200, delta_rel_conv=1e-12)
    res = optimizers.lbfgs_device(_quad_vg, np.zeros(4), cfg, None, A, b)
    x_ls = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.log(res.params), x_ls, atol=1e-6)
    assert res.converged
    assert 0 < res.num_it <= 200


def test_device_lbfgs_runner_cached():
    cfg = OptimConfig(maxit=50, delta_rel_conv=1e-10)
    r1 = optimizers._device_lbfgs_runner(_quad_vg, 50, 1e-10, jnp.float64)
    r2 = optimizers._device_lbfgs_runner(_quad_vg, 50, 1e-10, jnp.float64)
    assert r1 is r2


def test_device_lbfgs_with_kernel_style_vg():
    """A vg_fn WITHOUT an AD rule (mimicking the Pallas kernel): the driver
    must never differentiate through it — only consume its returned grad."""

    @jax.custom_jvp
    def opaque(t):
        return jnp.sum((t - 2.0) ** 2), 2.0 * (t - 2.0)

    @opaque.defjvp
    def _jvp(p, tg):
        raise AssertionError("driver must not differentiate vg_fn")

    def vg(t):
        # jax.pure_callback-like opacity is overkill; the assert in the jvp
        # guards against accidental AD through vg_fn
        return jnp.sum((t - 2.0) ** 2), 2.0 * (t - 2.0)

    cfg = OptimConfig(maxit=100, delta_rel_conv=1e-12)
    res = optimizers.lbfgs_device(vg, np.zeros(3), cfg)
    np.testing.assert_allclose(np.log(res.params), 2.0 * np.ones(3),
                               atol=1e-6)


def test_device_gd_matches_host_gd():
    """gd_device mirrors the host GD loop (LR capping/halving, Nesterov,
    Armijo, halved-step streak) on a real Vecchia NLL."""
    from gpboost_tpu import GPModel
    from gpboost_tpu.utils.rng import sim_rand_unif, sim_rand_normal
    n = 100
    x = sim_rand_unif(n * 2, init_c=0.1)
    coords = np.column_stack([x[:n], x[n:]])
    D = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    C = np.linalg.cholesky(np.exp(-D / 0.1) + np.eye(n) * 1e-20)
    y = C @ sim_rand_normal(n, init_c=0.8) \
        + sim_rand_normal(n, init_c=0.1) / 5.0
    m = GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=30)
    vec = m._approx
    yj = jnp.asarray(y)

    def vg(th, yv, nb):
        return vec._vg_gaussian_jit(th, yv, None, nb)

    iu = np.triu_indices(n, 1)
    init = np.log([np.var(y, ddof=1) / 2, np.var(y, ddof=1) / 2,
                   np.mean(D[iu]) / 3])
    cfg = optimizers.OptimConfig(maxit=1000, delta_rel_conv=1e-6,
                                 lr_cov=0.1, use_nesterov_acc=True,
                                 acc_rate_cov=0.5)
    res_dev = optimizers.gd_device(vg, init, cfg, jnp.float64, yj,
                                   vec.neighbors)
    res_host = optimizers.gradient_descent(
        lambda t: float(vg(jnp.asarray(t), yj, vec.neighbors)[0]),
        lambda t: np.asarray(vg(jnp.asarray(t), yj, vec.neighbors)[1]),
        init, cfg)
    assert abs(res_dev.nll - res_host.nll) < 1e-6
    np.testing.assert_allclose(res_dev.params, res_host.params, rtol=1e-5)
    assert res_dev.num_it == res_host.num_it


def test_device_lbfgs_final_fn_fused_output():
    """final_fn output is evaluated at the FINAL parameters inside the same
    compiled program (the fused GPBoost pseudo-gradient solve)."""
    from gpboost_tpu.models.optimizers import OptimConfig, lbfgs_device
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((6, 4)))
    b = jnp.asarray(rng.standard_normal(6))

    def final(t, A_, b_):
        return A_ @ t - b_          # residual at the optimum

    cfg = OptimConfig(maxit=200, delta_rel_conv=1e-14)
    res = lbfgs_device(_quad_vg, np.zeros(4), cfg, jnp.float64, A, b,
                       final_fn=final)
    assert res.aux is not None and res.aux.shape == (6,)
    t_fin = jnp.log(jnp.asarray(res.params))
    np.testing.assert_allclose(res.aux, np.asarray(A @ t_fin - b),
                               rtol=1e-8, atol=1e-10)
    # without final_fn, aux stays None
    res2 = lbfgs_device(_quad_vg, np.zeros(4), cfg, jnp.float64, A, b)
    assert res2.aux is None


def test_device_lbfgs_chunked_matches_single_dispatch():
    """The chunked driver (a few iterations per dispatch, host-side
    convergence replica) runs the SAME while_loop machinery as the
    one-dispatch driver — identical iterates, so identical optimum,
    iteration count, and final_fn output, for any chunk size."""
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.standard_normal((8, 5)))
    b = jnp.asarray(rng.standard_normal(8))

    def final(t, A_, b_):
        return A_ @ t - b_

    cfg = OptimConfig(maxit=200, delta_rel_conv=1e-12)
    ref = optimizers.lbfgs_device(_quad_vg, np.zeros(5), cfg, jnp.float64,
                                  A, b, final_fn=final)
    for steps in (1, 3, 64):
        res = optimizers.lbfgs_device_chunked(
            _quad_vg, np.zeros(5), cfg, jnp.float64, A, b,
            chunk_iters=steps, final_fn=final)
        np.testing.assert_allclose(res.params, ref.params, rtol=0,
                                   atol=1e-14)
        assert res.num_it == ref.num_it
        assert abs(res.nll - ref.nll) < 1e-14
        np.testing.assert_allclose(res.aux, ref.aux, rtol=0, atol=1e-12)
        assert res.converged
