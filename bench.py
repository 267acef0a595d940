"""Benchmark: 100k-point Vecchia GP marginal-likelihood throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The driver metric (BASELINE.json) is marginal-likelihood evals/s on a
100k-point Vecchia GP. ``vs_baseline`` compares against the reference's
multicore-CPU OpenMP implementation measured on this machine (see
``bench_baseline.py`` to re-measure; falls back to a recorded value).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    m = int(os.environ.get("BENCH_NEIGHBORS", 20))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")

    import jax
    import jax.numpy as jnp
    import gpboost_tpu  # noqa: F401  (enables x64 + full-precision matmuls)
    # Persistent compilation cache: the big whole-fit-on-device / Pallas
    # programs compile in minutes cold but deserialize in ms; production
    # deployments keep this on, so the bench measures the warm-process
    # behavior after the first-ever run (cold: ~250 s of the 30-round loop
    # was XLA compiles; warm: the loop itself).
    cache_dir = os.environ.get(
        "GPBOOST_TPU_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    gpboost_tpu.enable_compilation_cache(cache_dir)
    from gpboost_tpu.ops import vecchia as vops
    from gpboost_tpu.ops.cov_fns import CovFunction

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64

    rng = np.random.default_rng(0)
    coords = rng.uniform(size=(n, 2)).astype(np.float64)
    # simulate a rough GP draw cheaply (exact simulation not needed for bench)
    y = np.sin(6 * coords[:, 0]) + np.cos(4 * coords[:, 1]) \
        + 0.5 * rng.standard_normal(n)

    cov_fn = CovFunction.create("exponential")
    coords_j = jnp.asarray(coords, dtype=dtype)
    y_j = jnp.asarray(y, dtype=dtype)

    t0 = time.time()
    neighbors = vops.find_neighbors(coords_j, m, chunk=1024)
    neighbors.block_until_ready()
    t_nn = time.time() - t0

    def nll_raw(cov_pars):
        a, d = vops.build_factors(cov_fn, cov_pars[1:], coords_j, neighbors,
                                  cov_pars[0], True)
        return vops.vecchia_nll(a, d, neighbors, y_j)

    # the library's NLL kernels (VecchiaGP.nll_gaussian_value):
    # - value-only evals use the fused Pallas factor kernel (distance ->
    #   covariance -> Cholesky -> solves per 1024-point block in VMEM)
    # - gradients use the joint value+grad XLA graph (the VJP residuals stop
    #   XLA from rematerializing the covariance transcendentals into every
    #   Cholesky-sweep consumer — 2.2x faster than the forward-only graph)
    vg = jax.jit(jax.value_and_grad(lambda lp: nll_raw(jnp.exp(lp))))

    if jax.default_backend() == "tpu" and dtype_name == "float32":
        from gpboost_tpu.ops.kernels.vecchia_factors import (
            vecchia_factors_pallas, vecchia_nll_grad_pallas)

        @jax.jit
        def nll(cov_pars):
            a, d = vecchia_factors_pallas(cov_pars[1:], coords_j, neighbors,
                                          cov_pars[0], True, 0.5)
            return vops.vecchia_nll(a, d, neighbors, y_j)

        vg_pallas = jax.jit(
            lambda lp: vecchia_nll_grad_pallas(lp, coords_j, neighbors,
                                               y_j, 0.5))

        def grad_nll(lp):
            return vg_pallas(lp)[1]
    else:
        def nll(cov_pars):
            return vg(jnp.log(cov_pars))[0]

        def grad_nll(lp):
            return vg(lp)[1]

    cp = jnp.asarray([0.25, 1.0, 0.1], dtype=dtype)
    lp = jnp.log(cp)
    # compile
    nll(cp).block_until_ready()
    grad_nll(lp).block_until_ready()

    def timeloop(f, x, reps=15):
        t0 = time.time()
        for _ in range(reps):
            v = f(x)
        jax.tree_util.tree_leaves(v)[0].block_until_ready()
        return reps / (time.time() - t0), v

    # device-resident loops: the production fit path
    # (optimizers.lbfgs_device) evaluates NLL/gradients back-to-back INSIDE
    # one dispatched program, so kernel throughput is measured the same way
    # — a lax.fori_loop with a real data dependence between iterations (the
    # per-call host->TPU tunnel enqueue otherwise caps the measurement: 452
    # evals/s host-dispatched vs 1864 evals/s in-loop at n=1e5, m=20)
    LOOP_K = 100

    @jax.jit
    def nll_loop(cp0):
        def body(_, carry):
            acc, c = carry
            v = nll(c)
            return acc + v, c + 1e-38 * v   # data dependence, no hoisting
        acc, _ = jax.lax.fori_loop(0, LOOP_K, body,
                                   (jnp.zeros((), dtype), cp0))
        return acc

    @jax.jit
    def grad_loop(lp0):
        def body(_, carry):
            acc, c = carry
            g = grad_nll_inner(c)
            return acc + g[0], c + 1e-38 * g
        acc, _ = jax.lax.fori_loop(0, LOOP_K, body,
                                   (jnp.zeros((), dtype), lp0))
        return acc

    grad_nll_inner = grad_nll
    nll_loop(cp).block_until_ready()
    grad_loop(lp).block_until_ready()

    def timeloop_device(f, x):
        t0 = time.time()
        f(x).block_until_ready()
        return LOOP_K / (time.time() - t0)

    # best-of-3 windows: the TPU tunnel has sporadic multi-second stalls that
    # would otherwise dominate a single window
    evals_per_s = 0.0
    grads_per_s = 0.0
    host_evals_per_s = 0.0
    for _ in range(3):
        evals_per_s = max(evals_per_s, timeloop_device(nll_loop, cp))
        grads_per_s = max(grads_per_s, timeloop_device(grad_loop, lp))
        r, v = timeloop(nll, cp)
        host_evals_per_s = max(host_evals_per_s, r)

    # end-to-end fit wall-clock (warm): the whole-loop-on-device L-BFGS
    # (optimizers.lbfgs_device) runs the full covariance-parameter fit in
    # ONE device dispatch — measured 0.58 s at n=1e5 vs 36 s for the
    # host-driven scipy loop over the tunnel (dispatch-latency bound)
    fit_warm_s = None
    if (jax.default_backend() == "tpu" and dtype_name == "float32"
            and os.environ.get("BENCH_FIT", "1") != "0"):
        import gpboost_tpu as gpb
        model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                            gp_approx="vecchia", num_neighbors=m,
                            dtype=jnp.float32)
        fit_params = {"optimizer_cov": "lbfgs",
                      "init_cov_pars": [0.25, 1.0, 0.1]}
        model.fit(y=y, params=fit_params)  # compile
        t0 = time.time()
        model.fit(y=y, params=fit_params)
        fit_warm_s = time.time() - t0

    # numeric sanity gate: the accelerator f32 NLL must agree with a CPU
    # float64 evaluation of the SAME model (same neighbors) — fail loudly on
    # drift so a silently wrong fast path can never post a bench number
    nll_err_vs_f64 = None
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        nb_cpu = jax.device_put(np.asarray(neighbors), cpu)
        coords_cpu = jax.device_put(coords, cpu)
        y_cpu = jax.device_put(y, cpu)
        cp64 = jax.device_put(np.asarray([0.25, 1.0, 0.1]), cpu)

        @jax.jit
        def nll_f64(cov_pars, coords64, nb, y64):
            a, d = vops.build_factors(cov_fn, cov_pars[1:], coords64, nb,
                                      cov_pars[0], True)
            return vops.vecchia_nll(a, d, nb, y64)

        with jax.default_device(cpu):
            v64 = float(nll_f64(cp64, coords_cpu, nb_cpu, y_cpu))
        nll_err_vs_f64 = abs(float(v) - v64) / max(abs(v64), 1e-30)
        if nll_err_vs_f64 > 1e-4:
            raise AssertionError(
                f"accelerator NLL {float(v)} deviates from CPU float64 "
                f"reference {v64} by {nll_err_vs_f64:.2e} relative "
                "(> 1e-4): numeric drift in the fast path")

    # ---- north-star extras (BASELINE.json): 1M-point NLL/grad throughput
    # and a GPBoost boosting loop (trees + per-iteration GP refits) ----
    northstar = {}
    if (jax.default_backend() == "tpu" and dtype_name == "float32"
            and os.environ.get("BENCH_NORTHSTAR", "1") != "0"):
        from gpboost_tpu.ops.kernels.vecchia_factors import (
            vecchia_nll_grad_pallas)
        n1 = 1_000_000
        rng1 = np.random.default_rng(0)
        coords1 = rng1.uniform(size=(n1, 2)).astype(np.float64)
        y1 = (np.sin(6 * coords1[:, 0]) + np.cos(4 * coords1[:, 1])
              + 0.5 * rng1.standard_normal(n1))
        c1 = jnp.asarray(coords1, dtype)
        yj1 = jnp.asarray(y1, dtype)
        t0 = time.time()
        nb1 = vops.find_neighbors(c1, m, chunk=1024)
        nb1.block_until_ready()
        northstar["n1m_neighbor_search_s"] = round(time.time() - t0, 3)

        @jax.jit
        def vg1(lp):
            return vecchia_nll_grad_pallas(lp, c1, nb1, yj1, 0.5)

        K1 = 20

        @jax.jit
        def nll1_loop(lp0):
            def body(_, carry):
                acc, c = carry
                v, g = vg1(c)
                return acc + v, c + 1e-38 * g
            acc, _ = jax.lax.fori_loop(0, K1, body,
                                       (jnp.zeros((), dtype), lp0))
            return acc

        nll1_loop(lp).block_until_ready()
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            nll1_loop(lp).block_until_ready()
            best = max(best, K1 / (time.time() - t0))
        northstar["n1m_nll_grad_evals_per_s"] = round(best, 3)
        northstar["n1m_nll_value"] = float(vg1(lp)[0])
        del c1, yj1, nb1

        # GPBoost loop: 30 rounds @ 100k rows, trees + per-iteration GP
        # covariance refits (the reference's headline combined algorithm)
        if os.environ.get("BENCH_BOOST", "1") != "0":
            import gpboost_tpu as gpb
            rngb = np.random.default_rng(1)
            X = rngb.uniform(size=(n, 5))
            f = 2.0 * np.sin(5 * X[:, 0]) + X[:, 1] ** 2 + X[:, 2]
            yb = f + y
            gp = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                             gp_approx="vecchia", num_neighbors=m,
                             dtype=jnp.float32)
            gp.set_optim_params({"optimizer_cov": "lbfgs",
                                 "init_cov_pars": [0.25, 1.0, 0.1]})
            params = {"objective": "regression", "num_leaves": 31,
                      "learning_rate": 0.1, "min_data_in_leaf": 20,
                      "verbose": -1}
            ds = gpb.Dataset(X, label=yb)
            t0 = time.time()
            bst = gpb.train(params, ds, gp_model=gp, num_boost_round=30)
            northstar["gpboost_30r_100k_s"] = round(time.time() - t0, 3)
            northstar["gpboost_cov_pars"] = [
                round(float(x), 4) for x in np.asarray(gp.cov_pars_)]
            # whole-training-loop-on-device (boosting/device_loop.py,
            # device_resident_boosting=true): first call pays the one-time
            # trace+compile (cached on disk AND in-process), the steady
            # state is the pure fused-program time — the serving /
            # retraining / CV pattern. The headline 30r number above stays
            # the product's auto behavior at 30 rounds (host loop).
            params_dev = dict(params, device_resident_boosting="true")
            t0 = time.time()
            gpb.train(params_dev, ds, gp_model=gp, num_boost_round=30)
            northstar["gpboost_30r_100k_device_first_s"] = round(
                time.time() - t0, 3)
            t0 = time.time()
            gpb.train(params_dev, ds, gp_model=gp, num_boost_round=30)
            northstar["gpboost_30r_100k_steady_s"] = round(
                time.time() - t0, 3)

            # histogram-build throughput: the Pallas one-hot-matmul kernel
            # vs the XLA scatter-add (the product path routes to the kernel
            # on TPU; ops/kernels/histogram.py)
            from gpboost_tpu.boosting.tree import (_build_histogram_xla,
                                                   build_histogram)
            hb = jnp.asarray(ds.binned)
            hg_ = jnp.asarray(np.asarray(yb), jnp.float32)
            hh_ = jnp.ones(n, jnp.float32)
            hmask = jnp.ones(n, bool)
            HB = int(ds.max_num_bins)

            def hist_loop(fn):
                @jax.jit
                def run(g0):
                    def body(i, acc):
                        hg2, _, _ = fn(hb, g0 + 1e-38 * acc[0, 0], hh_,
                                       hmask, HB)
                        return acc + hg2
                    return jax.lax.fori_loop(
                        0, 50, body,
                        jnp.zeros((hb.shape[1], HB), jnp.float32))
                run(hg_).block_until_ready()
                best = 0.0
                for _ in range(2):
                    t1 = time.time()
                    run(hg_).block_until_ready()
                    best = max(best, 50 / (time.time() - t1))
                return best

            northstar["hist_builds_per_s_pallas"] = round(
                hist_loop(build_histogram), 1)
            northstar["hist_builds_per_s_xla"] = round(
                hist_loop(_build_histogram_xla), 1)

        # ---- non-Gaussian (LaGaBoost) + prediction benches: the second
        # flagship algorithm (Laplace mode finding, likelihoods.h:1843,
        # driven from regression_objective.hpp:173-186) and the 100k
        # mean+var prediction path. Data streams replicate
        # /tmp/ref_ng_baseline.py exactly (bench_baseline.json north_star
        # source) so the comparison is apples-to-apples. ----
        if os.environ.get("BENCH_NG", "1") != "0":
            import gpboost_tpu as gpb
            rng_ng = np.random.default_rng(0)
            coords_ng = rng_ng.uniform(size=(n, 2)).astype(np.float64)
            f_lat = np.sin(6 * coords_ng[:, 0]) + np.cos(4 * coords_ng[:, 1])
            p_ng = 1.0 / (1.0 + np.exp(-f_lat))
            yb_ng = rng_ng.binomial(1, p_ng).astype(np.float64)

            mdl_ng = gpb.GPModel(
                gp_coords=coords_ng, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=m,
                likelihood="bernoulli_logit",
                matrix_inversion_method="iterative", dtype=jnp.float32)
            cp_ng = np.array([1.0, 0.1])
            mdl_ng.neg_log_likelihood(cov_pars=cp_ng, y=yb_ng)  # compile
            t0 = time.time()
            v_ng = mdl_ng.neg_log_likelihood(cov_pars=cp_ng, y=yb_ng)
            northstar["ng_nll_eval_s"] = round(time.time() - t0, 4)
            northstar["ng_nll_value"] = float(v_ng)

            mdl_ng.set_optim_params({"optimizer_cov": "lbfgs", "maxit": 50,
                                     "init_cov_pars": cp_ng})
            t0 = time.time()
            mdl_ng.fit(y=yb_ng)
            northstar["ng_fit_100k_first_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            mdl_ng.fit(y=yb_ng)
            northstar["ng_fit_100k_s"] = round(time.time() - t0, 3)
            northstar["ng_fit_cov_pars"] = [
                round(float(x), 4) for x in np.asarray(mdl_ng.cov_pars_)]

            # 30-round LaGaBoost @ 100k (binary response + latent GP)
            rngb2 = np.random.default_rng(1)
            Xn = rngb2.uniform(size=(n, 5))
            Fb = 2.0 * np.sin(5 * Xn[:, 0]) + Xn[:, 1] ** 2 + Xn[:, 2]
            Fb = Fb - Fb.mean()
            pb = 1.0 / (1.0 + np.exp(-(Fb + f_lat)))
            ybb = rng_ng.binomial(1, pb).astype(np.float64)
            gp_ng = gpb.GPModel(
                gp_coords=coords_ng, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=m,
                likelihood="bernoulli_logit",
                matrix_inversion_method="iterative", dtype=jnp.float32)
            gp_ng.set_optim_params({"optimizer_cov": "lbfgs",
                                    "init_cov_pars": cp_ng})
            params_ng = {"objective": "binary", "num_leaves": 31,
                         "learning_rate": 0.1, "min_data_in_leaf": 20,
                         "verbose": -1}
            ds_ng = gpb.Dataset(Xn, label=ybb)
            t0 = time.time()
            gpb.train(params_ng, ds_ng, gp_model=gp_ng, num_boost_round=30)
            northstar["lagaboost_30r_100k_s"] = round(time.time() - t0, 3)
            params_ng_dev = dict(params_ng, device_resident_boosting="true")
            t0 = time.time()
            gpb.train(params_ng_dev, ds_ng, gp_model=gp_ng,
                      num_boost_round=30)
            northstar["lagaboost_30r_100k_device_first_s"] = round(
                time.time() - t0, 3)
            t0 = time.time()
            gpb.train(params_ng_dev, ds_ng, gp_model=gp_ng,
                      num_boost_round=30)
            northstar["lagaboost_30r_100k_steady_s"] = round(
                time.time() - t0, 3)

            # gaussian Vecchia 100k -> 100k prediction (mean + var, warm)
            y_g = f_lat + 0.5 * rng_ng.standard_normal(n)
            rngp = np.random.default_rng(2)
            coords_p = rngp.uniform(size=(n, 2)).astype(np.float64)
            mg = gpb.GPModel(gp_coords=coords_ng,
                             cov_function="exponential",
                             gp_approx="vecchia", num_neighbors=m,
                             dtype=jnp.float32)
            cp_g = np.array([0.25, 1.0, 0.1])
            mg.predict(y=y_g, gp_coords_pred=coords_p, cov_pars=cp_g,
                       predict_var=True, predict_response=False)  # compile
            t0 = time.time()
            pr = mg.predict(y=y_g, gp_coords_pred=coords_p, cov_pars=cp_g,
                            predict_var=True, predict_response=False)
            northstar["pred_100k_mean_var_s"] = round(time.time() - t0, 3)

    # baseline: reference GPBoost multicore-CPU Vecchia NLL evals/s at the
    # same n, m. Measured via the reference python package if available, else
    # the recorded value from a prior measurement on this machine class.
    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    baseline = None
    b = {}
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            b = json.load(f)
            if b.get("n") == n and b.get("m") == m:
                baseline = b.get("evals_per_s")
    vs_baseline = (evals_per_s / baseline) if baseline else None
    # north-star ratios vs the reference C++ measured at the same configs
    ns_base = b.get("north_star", {})
    if northstar.get("n1m_nll_grad_evals_per_s") and ns_base.get(
            "n1m_evals_per_s"):
        northstar["n1m_vs_baseline"] = round(
            northstar["n1m_nll_grad_evals_per_s"]
            / ns_base["n1m_evals_per_s"], 3)
    if fit_warm_s and ns_base.get("fit_100k_s"):
        northstar["fit_100k_speedup_vs_baseline"] = round(
            ns_base["fit_100k_s"] / fit_warm_s, 3)
    if northstar.get("gpboost_30r_100k_s") and ns_base.get(
            "gpboost_30r_100k_s"):
        northstar["gpboost_30r_speedup_vs_baseline"] = round(
            ns_base["gpboost_30r_100k_s"]
            / northstar["gpboost_30r_100k_s"], 3)
    if northstar.get("gpboost_30r_100k_steady_s") and ns_base.get(
            "gpboost_30r_100k_s"):
        northstar["gpboost_30r_steady_speedup_vs_baseline"] = round(
            ns_base["gpboost_30r_100k_s"]
            / northstar["gpboost_30r_100k_steady_s"], 3)
    # non-Gaussian + prediction ratios (ref measured via /tmp/ref_ng_baseline)
    for ours, base in (("ng_nll_eval_s", "ng_nll_eval_s"),
                       ("ng_fit_100k_s", "ng_fit_100k_s"),
                       ("lagaboost_30r_100k_s", "lagaboost_30r_100k_s"),
                       ("pred_100k_mean_var_s", "pred_100k_mean_var_s")):
        if northstar.get(ours) and ns_base.get(base):
            northstar[ours.replace("_s", "") + "_speedup_vs_baseline"] = \
                round(ns_base[base] / northstar[ours], 3)
    if (northstar.get("lagaboost_30r_100k_steady_s")
            and ns_base.get("lagaboost_30r_100k_s")):
        northstar["lagaboost_30r_steady_speedup_vs_baseline"] = round(
            ns_base["lagaboost_30r_100k_s"]
            / northstar["lagaboost_30r_100k_steady_s"], 3)

    print(json.dumps({
        "metric": f"vecchia_gp_nll_evals_per_s_n{n}_m{m}",
        "value": round(evals_per_s, 3),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "extra": {
            "grad_evals_per_s": round(grads_per_s, 3),
            "host_dispatched_evals_per_s": round(host_evals_per_s, 3),
            "neighbor_search_s": round(t_nn, 3),
            "fit_warm_s": (round(fit_warm_s, 3)
                           if fit_warm_s is not None else None),
            "backend": jax.default_backend(),
            "dtype": dtype_name,
            "nll_value": float(v),
            "nll_err_vs_f64": (None if nll_err_vs_f64 is None
                               else float(nll_err_vs_f64)),
            **northstar,
        },
    }))


if __name__ == "__main__":
    main()
