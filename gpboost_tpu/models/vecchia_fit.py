"""Fit driver for Vecchia-approximated models (Gaussian + Laplace)."""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu import likelihoods as lk
from gpboost_tpu.models import optimizers


def ng_iter_kwargs(cfg, n: int) -> dict:
    """Iterative Vecchia-Laplace settings derived from the optimizer config
    (single source for the host fit, the whole-fit-on-device driver, and the
    fused LaGaBoost loop)."""
    return dict(
        num_rand_vec_trace=max(cfg.num_rand_vec_trace,
                               int(os.environ.get(
                                   "GPBOOST_TPU_NG_MIN_PROBES", "200"))),
        lanczos_steps=min(int(cfg.cg_max_num_it_tridiag), 100, n),
        cg_tol=cfg.cg_delta_conv, cg_max_iter=cfg.cg_max_num_it,
        seed_rand_vec_trace=cfg.seed_rand_vec_trace,
        preconditioner=cfg.cg_preconditioner_type,
        piv_chol_rank=cfg.piv_chol_rank)


def ng_device_vg(model, n_cov: int, n_aux: int, aux_fixed, fam):
    """Operand-parameterized non-Gaussian Vecchia-Laplace objective for the
    whole-fit-on-device drivers.

    Returns ``(vg, grad_F)`` with ``vg(theta, y, fp) -> (nll, d nll/d theta)``
    and ``grad_F(theta, y, fp) -> d nll/d F`` — the LaGaBoost pseudo
    gradients (``regression_objective.hpp:173-186``). ``y`` and the fixed
    effects are TRACED operands, so ONE compiled L-BFGS driver serves every
    per-boosting-iteration refit, and the fused device training loop
    (``boosting/device_loop.py``) can call the same functions inside its
    round loop. Cached on the VecchiaGP instance (stable ids key the
    compiled-runner caches)."""
    vec = model._approx
    cfg = model.optim_cfg
    kw = ng_iter_kwargs(cfg, vec.n)
    key = (n_cov, n_aux,
           None if aux_fixed is None
           else tuple(np.asarray(aux_fixed, np.float64).tolist()),
           tuple(sorted((k, str(v)) for k, v in kw.items())),
           str(model.dtype))
    cache = getattr(vec, "_ng_vg_cache", None)
    if cache is not None and cache[0] == key:
        return cache[1], cache[2]
    aux_j = (None if aux_fixed is None
             else jnp.asarray(np.asarray(aux_fixed, np.float64), vec.dtype))

    def _nll(theta, y_op, fp_op):
        cov = jnp.exp(theta[:n_cov])
        aux = (lk.aux_from_optim_scale(fam, theta[n_cov:n_cov + n_aux])
               if n_aux else aux_j)
        return vec.nll_laplace_iterative(cov, y_op, aux, fp_op, **kw)

    vg = jax.jit(jax.value_and_grad(_nll))
    grad_F = jax.jit(jax.grad(_nll, argnums=2))
    vec._ng_vg_cache = (key, vg, grad_F)
    return vg, grad_F


def ng_device_fit_eligible(model, cfg, is_het: bool, has_coef: bool,
                           use_iterative: bool) -> bool:
    """Whole-fit-on-device eligibility for the NG Vecchia-Laplace fit: the
    matrix-free iterative objective with no host-interactive pieces (no
    coefficient alternation, no ARD neighbor redetermination, no mesh
    padding, no heteroscedastic stacking)."""
    vec = model._approx
    return (not is_het and not has_coef and use_iterative
            and getattr(vec, "z", None) is None
            and getattr(vec, "_shard_nb", None) is None
            and getattr(model, "_mesh", None) is None
            and vec.cov_fn.is_isotropic
            and hasattr(vec, "nll_laplace_iterative")
            and cfg.optimizer_cov in ("lbfgs",
                                      "lbfgs_linesearch_nocedal_wright")
            and cfg.estimate_cov_par_index is None and not cfg.std_dev
            and (jax.default_backend() == "tpu"
                 or os.environ.get("GPBOOST_TPU_FORCE_DEVICE_LOOP") == "1"))


def fit(model, data, fixed_effects: Optional[jnp.ndarray] = None):
    cfg = model.optim_cfg
    vec = model._approx
    if hasattr(vec, "sync_iter_cfg"):
        vec.sync_iter_cfg(cfg)
    y = data.y
    y_np = np.asarray(y)
    has_coef = data.X is not None

    latent_gaussian = (model.spec.is_gaussian
                       and model.gp_approx == "vecchia_latent")
    init_cov = (cfg.init_cov_pars if cfg.init_cov_pars is not None
                else model._default_init_cov_pars(y_np))
    if latent_gaussian and len(init_cov) == model.spec.num_cov_par:
        # latent parametrization: nugget moves to the aux slot
        model.aux_pars_ = np.atleast_1d(np.asarray(init_cov[0]))
        init_cov = np.asarray(init_cov[1:])
    n_cov = len(init_cov)

    if model.spec.is_gaussian and not latent_gaussian:
        beta_holder = {"beta": None}
        if has_coef:
            Xn = np.asarray(data.X)
            beta_holder["beta"] = jnp.asarray(
                cfg.init_coef if cfg.init_coef is not None
                else np.linalg.lstsq(Xn, y_np, rcond=None)[0],
                dtype=model.dtype)

        vgrad = lambda th, fp: vec._vg_gaussian(th, y, fp)  # noqa: E731

        def fixed_part():
            fp = fixed_effects
            if beta_holder["beta"] is not None:
                xb = data.X @ beta_holder["beta"]
                fp = xb if fp is None else fp + xb
            return fp

        eval_count = {"n": 0}

        def vg(theta):
            if hasattr(vec, "ensure_neighbors"):
                # correlation-based neighbor redetermination at power-of-2
                # evaluations (re_model_template.h:4630-4656)
                c = eval_count["n"]
                if ((c + 1) & c) == 0:
                    vec.ensure_neighbors(np.exp(np.asarray(theta)))
                eval_count["n"] += 1
            v, g = vgrad(jnp.asarray(theta, dtype=model.dtype), fixed_part())
            return float(v), np.asarray(g, dtype=np.float64)

        def coef_update(theta):
            if not has_coef:
                return
            cp = jnp.exp(jnp.asarray(theta, dtype=model.dtype))
            beta_holder["beta"] = vec.wls_coef(cp, y, data.X, fixed_effects)

        theta0 = np.log(np.maximum(np.asarray(init_cov, np.float64), 1e-300))
        if has_coef:
            coef_update(theta0)
        # whole-loop-on-device optimizers: eligible when the fused Pallas
        # value+grad kernel serves this model (TPU, f32, isotropic — no
        # neighbor redetermination mid-fit). Each host-driven objective
        # evaluation is a blocking host<->device round trip; the compiled
        # lax.while_loop runs the entire fit in ONE dispatch
        # (measured 36 s -> 0.58 s warm at n=1e5).
        def device_loop_eligible(c):
            return (jax.default_backend() == "tpu"
                    and getattr(vec, "_vg_pallas_jit", None) is not None
                    and getattr(vec, "mesh", None) is None
                    and vec.cov_fn.is_isotropic
                    and c.optimizer_cov in (
                        "gradient_descent", "lbfgs",
                        "lbfgs_linesearch_nocedal_wright"))

        device_loop = (device_loop_eligible(cfg)
                       and cfg.optimizer_cov in (
                           "lbfgs", "lbfgs_linesearch_nocedal_wright"))
        if device_loop:
            # no coefficients: fuse the GPBoost pseudo-gradient solve
            # Psi^-1 r (at the final parameters) into the SAME dispatch
            final_fn = (None if has_coef
                        else getattr(vec, "_fit_psi_inv", None))

            def run_device(theta):
                fp = fixed_part()
                r = y if fp is None else y - fp
                # data flows through traced operands (r, neighbors) so the
                # compiled whole-fit driver is reused across coef rounds
                # and across per-boosting-iteration refits
                return optimizers.lbfgs_device(
                    vec._vg_pallas_jit, theta, cfg, jnp.float32,
                    jnp.asarray(r, jnp.float32), vec.neighbors,
                    final_fn=final_fn)

            if has_coef:
                theta = theta0
                for _ in range(3):
                    result = run_device(theta)
                    theta = np.log(result.params)
                    coef_update(theta)
            else:
                result = run_device(theta0)
        elif cfg.optimizer_cov in ("lbfgs", "lbfgs_linesearch_nocedal_wright"):
            if has_coef:
                theta = theta0
                for _ in range(3):
                    result = optimizers.lbfgs(vg, theta, cfg)
                    theta = np.log(result.params)
                    coef_update(theta)
            else:
                result = optimizers.lbfgs(vg, theta0, cfg)
        elif cfg.optimizer_cov == "nelder_mead":
            result = optimizers.nelder_mead(lambda t: vg(t)[0], theta0, cfg)
            coef_update(np.log(result.params))
        elif (device_loop_eligible(cfg) and not cfg.trace
              and cfg.convergence_criterion
              == "relative_change_in_log_likelihood"):
            # default GD optimizer, whole loop on device (one dispatch)
            def run_gd(theta):
                fp = fixed_part()
                r = y if fp is None else y - fp
                return optimizers.gd_device(
                    vec._vg_pallas_jit, theta, cfg, jnp.float32,
                    jnp.asarray(r, jnp.float32), vec.neighbors)

            if has_coef:
                theta = theta0
                for _ in range(3):
                    result = run_gd(theta)
                    theta = np.log(result.params)
                    coef_update(theta)
            else:
                result = run_gd(theta0)
        else:  # gradient_descent / fisher_scoring fallback -> GD
            def cb(it, theta, nll):
                coef_update(theta)
            result = optimizers.gradient_descent(
                lambda t: vg(t)[0], lambda t: vg(t)[1], theta0, cfg,
                callback=cb if has_coef else None)
        model.cov_pars_ = result.params
        model.coefs_ = (None if beta_holder["beta"] is None
                        else np.asarray(beta_holder["beta"]))
        model.num_it_ = result.num_it
        model.current_nll_ = float(result.nll)
        model._fit_result = result
        return model

    # non-Gaussian Vecchia-Laplace
    fam = lk.get_family(model.likelihood)
    is_het = model.likelihood == "gaussian_heteroscedastic"
    if getattr(model, "aux_pars_", None) is not None:
        init_aux = np.atleast_1d(np.asarray(model.aux_pars_))
    else:
        init_aux = fam.default_aux_pars(model.likelihood_additional_param)
    estimate_aux = cfg.estimate_aux_pars and init_aux is not None
    n_aux = len(init_aux) if (init_aux is not None and estimate_aux) else 0
    aux_fixed = (None if init_aux is None
                 else jnp.asarray(init_aux, dtype=jnp.float64))
    num_sets = getattr(model, "num_sets_re", 1)
    n_coef = (data.X.shape[1] if has_coef else 0) * num_sets
    if has_coef and cfg.init_coef is not None:
        init_beta = cfg.init_coef
    elif is_het and has_coef:
        # per-set intercept inits (FindInitialIntercept, likelihoods.h:818-867):
        # set 0 = mean(y); set 1 = log(var(y) - set-0 RE variance)
        p = data.X.shape[1]
        init_beta = np.zeros(n_coef)
        init_beta[0] = float(np.mean(y_np))
        sample_var = float(np.var(y_np, ddof=1))
        init_beta[p] = np.log(max(sample_var - float(init_cov[0]), 1e-6))
    else:
        init_beta = np.zeros(n_coef)

    theta0 = np.concatenate([
        np.log(np.maximum(np.asarray(init_cov, np.float64), 1e-300)),
        lk.aux_to_optim_scale(fam, np.asarray(init_aux)[:n_aux]) if n_aux
        else np.zeros(0),
        np.asarray(init_beta, np.float64)])

    def unpack(theta):
        cov = jnp.exp(theta[:n_cov])
        # per-family transform kinds (log / logit / identity), the
        # reference's aux_pars_ vs aux_pars_original_ split
        aux = (lk.aux_from_optim_scale(fam, theta[n_cov:n_cov + n_aux])
               if n_aux else aux_fixed)
        beta = theta[n_cov + n_aux:] if has_coef else None
        return cov, aux, beta

    use_iterative = (getattr(model, "matrix_inversion_method", "cholesky")
                     == "iterative"
                     # under a mesh the matrix-free iterative path is the
                     # sharded (SPMD) Vecchia-Laplace fit; the dense path
                     # would run replicated with [n, n] matrices
                     or (getattr(vec, "_shard_nb", None) is not None
                         and not is_het)
                     # large n: the dense Laplace path materializes [n, n];
                     # the matrix-free CG + SLQ path plays the role of the
                     # reference's SPARSE Cholesky at scale
                     # (re_model_template.h matrix_inversion_method; ours
                     # auto-routes where the reference's sparse factors do)
                     or (not is_het and y_np.shape[0] > 8192
                         and hasattr(vec, "nll_laplace_iterative")
                         and getattr(vec, "z", None) is None))
    if hasattr(vec, "ensure_neighbors"):
        # ARD kernels: determine neighbors in the scaled space of the inits
        vec.ensure_neighbors(np.exp(theta0[:n_cov]))

    @jax.jit
    def nll_fn(theta):
        cov, aux, beta = unpack(theta)
        fp = fixed_effects
        if is_het:
            # stacked [2n] fixed part: set-0 then set-1 linear predictors
            if beta is not None:
                p = data.X.shape[1]
                fp_s = jnp.concatenate([data.X @ beta[:p], data.X @ beta[p:]])
            else:
                fp_s = jnp.zeros(2 * y.shape[0], y.dtype)
            if fp is not None:
                fp_s = (fp_s + fp if fp.shape[0] == fp_s.shape[0]
                        else fp_s.at[:y.shape[0]].add(fp))
            return vec.nll_laplace(cov, y, aux, fp_s)
        if beta is not None:
            xb = data.X @ beta
            fp = xb if fp is None else fp + xb
        if use_iterative:
            kw = dict(preconditioner=cfg.cg_preconditioner_type,
                      piv_chol_rank=cfg.piv_chol_rank)
            return vec.nll_laplace_iterative(
                cov, y, aux, fp,
                num_rand_vec_trace=max(cfg.num_rand_vec_trace, 200),
                lanczos_steps=min(int(cfg.cg_max_num_it_tridiag), 100,
                                  int(np.asarray(y).shape[0])),
                cg_tol=cfg.cg_delta_conv, cg_max_iter=cfg.cg_max_num_it,
                seed_rand_vec_trace=cfg.seed_rand_vec_trace, **kw)
        return vec.nll_laplace(cov, y, aux, fp)

    vgrad = jax.jit(jax.value_and_grad(nll_fn))

    def vg(theta):
        v, g = vgrad(jnp.asarray(theta, dtype=jnp.float64))
        return float(v), np.asarray(g, dtype=np.float64)

    if ng_device_fit_eligible(model, cfg, is_het, has_coef, use_iterative):
        # whole-fit-on-device NG Vecchia-Laplace: mode finding (custom-VJP
        # Newton-CG) + SLQ logdet + L-BFGS all inside ONE lax.while_loop
        # dispatch — the host-driven loop pays a blocking tunnel round trip
        # per objective evaluation (reference flow being replaced:
        # OptimLinRegrCoefCovPar driving FindModePostRandEffCalcMLLVecchia,
        # likelihoods.h:2765)
        vg_dev, _ = ng_device_vg(model, n_cov, n_aux, aux_fixed, fam)
        fp_j = (jnp.zeros(vec.n, model.dtype) if fixed_effects is None
                else jnp.asarray(fixed_effects, model.dtype))
        # one vg of the 100k-point iterative Laplace costs 10s of seconds
        # of device time, and a compiled L-BFGS ITERATION contains up to
        # 31 of them (init + Armijo halvings inside the linesearch
        # while_loop) — both the whole-fit single dispatch AND a
        # 1-iteration chunk ran the TPU worker into its execution
        # watchdog at n=1e5 (observed crashes). Past the auto threshold
        # the linesearch moves to the HOST (scipy L-BFGS-B over the same
        # jitted device objective): each dispatch is bounded by exactly
        # ONE vg evaluation, and the ~0.7 s tunnel round trip per eval is
        # noise against the eval itself at that scale.
        # GPBOOST_TPU_NG_DEVICE_CHUNK: "auto" (default), "host", an
        # iteration count for the chunked driver, or 0 = single dispatch.
        chunk_env = os.environ.get("GPBOOST_TPU_NG_DEVICE_CHUNK", "auto")
        host_n = int(os.environ.get("GPBOOST_TPU_NG_HOST_LS_N", "20000"))
        host_ls = (chunk_env == "host"
                   or (chunk_env == "auto" and int(y_np.shape[0]) > host_n))
        chunk = 1 if chunk_env in ("auto", "host") else int(chunk_env)
        if host_ls:
            vg_jit = jax.jit(vg_dev)
            y_j = jnp.asarray(y, model.dtype)

            def vg_host(theta):
                v, g = vg_jit(jnp.asarray(theta, model.dtype), y_j, fp_j)
                return float(v), np.asarray(g, np.float64)

            result = optimizers.lbfgs(vg_host, theta0, cfg)
        elif chunk > 0:
            result = optimizers.lbfgs_device_chunked(
                vg_dev, theta0, cfg, model.dtype,
                jnp.asarray(y, model.dtype), fp_j, chunk_iters=chunk)
        else:
            result = optimizers.lbfgs_device(
                vg_dev, theta0, cfg, model.dtype,
                jnp.asarray(y, model.dtype), fp_j)
    elif cfg.optimizer_cov in ("lbfgs", "lbfgs_linesearch_nocedal_wright"):
        result = optimizers.lbfgs(vg, theta0, cfg)
    elif cfg.optimizer_cov == "nelder_mead":
        result = optimizers.nelder_mead(lambda t: vg(t)[0], theta0, cfg)
    else:
        result = optimizers.gradient_descent(
            lambda t: vg(t)[0], lambda t: vg(t)[1], theta0, cfg)
    theta_fin = np.log(result.params)
    cov_fin, aux_fin, beta_fin = unpack(jnp.asarray(theta_fin))
    model.cov_pars_ = np.asarray(cov_fin)
    model.aux_pars_ = None if aux_fin is None else np.asarray(aux_fin)
    model.coefs_ = None if beta_fin is None else np.asarray(beta_fin)
    model.num_it_ = result.num_it
    model.current_nll_ = float(result.nll)
    model._fit_result = result
    return model
