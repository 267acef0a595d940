"""Covariance-parameter optimizers for the random-effects engine.

Host-driven loops around jitted value/gradient kernels — the TPU-native
equivalent of ``REModelTemplate::OptimLinRegrCoefCovPar``
(``re_model_template.h:846``, internal loop :1290-1330) and the external
optimizer bridge (``optim_utils.h:562``). Semantics matched to the reference:

- updates on the log parameter scale (``UpdateCovAuxPars``, exp/log step)
- Nesterov acceleration version 0 with momentum offset 2
  (``ApplyMomentumStep``, ``NesterovSchedule``)
- learning-rate halving (factor 0.5, max 30 steps) when the NLL does not
  decrease, with the Armijo condition c=1e-4 (``re_model_template.h:5253-5313``)
- learning-rate capping so one log-scale update changes parameters by at most
  a factor 100 (``AvoidTooLargeLearningRatesCovAuxPars``, :7539)
- nugget variance profiled out for gradient_descent / lbfgs / nelder_mead /
  adam under a Gaussian likelihood (:946)
- convergence via relative change in NLL or parameters (:1708-1730)

L-BFGS and Nelder-Mead use scipy's implementations driven by jitted
value-and-grad (the reference links LBFGSpp / OptimLib — external optimizers
driven by its NLL evals, same architecture).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

MAX_GRADIENT_UPDATE_LOG_SCALE = math.log(100.0)
LR_SHRINKAGE_FACTOR = 0.5
MAX_LR_SHRINKAGE_STEPS = 30
C_ARMIJO = 1e-4


@dataclass
class OptimConfig:
    """Optimization settings (subset of ``GPB_SetOptimConfig`` /
    ``gpboost.GPModel.set_optim_params``, ``basic.py:5347-5544``)."""
    optimizer_cov: str = "gradient_descent"
    optimizer_coef: str = "wls"
    maxit: int = 1000
    lr_cov: float = 0.1
    lr_coef: float = 0.1
    use_nesterov_acc: bool = True
    acc_rate_cov: float = 0.5
    momentum_offset: int = 2
    delta_rel_conv: float = 1e-6
    convergence_criterion: str = "relative_change_in_log_likelihood"
    armijo_condition: bool = True
    estimate_aux_pars: bool = True
    trace: bool = False
    # iterative-method settings (used by CG-based models)
    cg_max_num_it: int = 1000
    cg_max_num_it_tridiag: int = 1000
    cg_delta_conv: float = 1e-2
    num_rand_vec_trace: int = 50
    reuse_rand_vec_trace: bool = True
    seed_rand_vec_trace: int = 1
    cg_preconditioner_type: str = ""
    piv_chol_rank: int = 50
    init_cov_pars: Optional[np.ndarray] = None
    init_coef: Optional[np.ndarray] = None
    std_dev: bool = False
    estimate_cov_par_index: Optional[np.ndarray] = None
    # GPBoost per-iteration refits (reuse_learning_rates_gp_model): keep the
    # L-BFGS curvature memory across calls (re_model_template.h:880)
    lbfgs_reuse_mem: bool = False


@dataclass
class OptimResult:
    params: np.ndarray          # final parameters on the original scale
    nll: float
    num_it: int
    converged: bool
    history: list = field(default_factory=list)
    final_lr: Optional[float] = None  # GD learning rate at exit (lr reuse)
    lr_after_first: Optional[float] = None  # GD lr after the 1st iteration
    aux: Optional[np.ndarray] = None  # extra output of the device fit
    #   (lbfgs_device final_fn — e.g. Psi^-1 r fused into the fit dispatch)


def nesterov_mu(it: int, acc_rate: float, offset: int) -> float:
    return 0.0 if it < offset else acc_rate


def gradient_descent(value_fn: Callable, grad_fn: Callable,
                     theta0: np.ndarray, cfg: OptimConfig,
                     callback: Optional[Callable] = None) -> OptimResult:
    """Nesterov-accelerated GD on log-scale parameters.

    ``value_fn(theta) -> nll`` and ``grad_fn(theta) -> dnll/dtheta`` take
    *log-scale* parameters. Mirrors the reference's internal loop with
    LR halving and Armijo checks.
    """
    theta = np.asarray(theta0, dtype=np.float64)
    theta_after_grad = theta.copy()
    theta_after_grad_lag1 = theta.copy()
    # GPBoost reuse mode (InitializeOptimSettings, re_model_template.h:7475):
    # start at the learning rate reached after the FIRST refit's first
    # iteration, Armijo constant 0, halved shrinkage budget, and the
    # doubling logic that recovers from too-small carried-over rates
    # (PotentiallyIncreaseLearningRatesForGPBoostAlgorithm, :7666)
    reuse_lr = getattr(cfg, "_reuse_lr_start", None)
    lr_init = cfg.lr_cov
    lr = lr_init if reuse_lr is None else reuse_lr
    use_armijo = cfg.armijo_condition and reuse_lr is None
    max_shrink = (MAX_LR_SHRINKAGE_STEPS if reuse_lr is None
                  else MAX_LR_SHRINKAGE_STEPS // 2)
    doubled_first = False
    lr_after_first = None
    acc_rate = cfg.acc_rate_cov
    nll = float(value_fn(theta))
    history = [nll]
    converged = False
    it = 0
    small_change_streak = 0
    for it in range(cfg.maxit):
        g = np.asarray(grad_fn(theta), dtype=np.float64)
        if not np.all(np.isfinite(g)):
            break
        # permanent LR capping (AvoidTooLargeLearningRatesCovAuxPars)
        gmax = np.max(np.abs(g))
        if gmax > 0 and lr > MAX_GRADIENT_UPDATE_LOG_SCALE / gmax:
            lr = MAX_GRADIENT_UPDATE_LOG_SCALE / gmax
        dir_deriv = -float(np.dot(g, g))  # directional derivative along -g
        if reuse_lr is not None:
            if it == 0:
                if ((-dir_deriv * lr)
                        <= cfg.delta_rel_conv * max(abs(nll), 1.0)
                        and (-dir_deriv * lr_init) > max(abs(nll), 1.0)):
                    if 2.0 * lr <= lr_init:
                        lr *= 2.0
                        doubled_first = True
            elif it == 1 and not doubled_first:
                if 2.0 * lr <= lr_init:
                    lr *= 2.0
        lr_try = lr
        acc_try = acc_rate
        accepted = False
        halved = False
        nll_new = nll
        for k in range(max_shrink):
            cand_after_grad = theta - lr_try * g
            mu = nesterov_mu(it, acc_try, cfg.momentum_offset) if cfg.use_nesterov_acc else 0.0
            # after two momentum rejections, drop acceleration entirely: near
            # an optimum the momentum term can oppose the gradient, and a
            # micro-step fallback would fake convergence
            if k >= 2:
                mu = 0.0
            cand = (1.0 + mu) * cand_after_grad - mu * theta_after_grad_lag1
            nll_new = float(value_fn(cand))
            if use_armijo:
                ok = np.isfinite(nll_new) and (
                    nll_new <= nll + C_ARMIJO * lr_try * dir_deriv)
            else:
                ok = np.isfinite(nll_new) and nll_new <= nll
            if ok:
                accepted = True
                break
            halved = True
            lr_try *= LR_SHRINKAGE_FACTOR
            acc_try *= 0.5
        if not accepted:
            # could not decrease: keep previous parameters and stop
            break
        lr = lr_try
        if it == 0:
            lr_after_first = lr
        theta_after_grad_lag1 = theta_after_grad
        theta_after_grad = cand_after_grad
        theta = cand
        history.append(nll_new)
        if cfg.trace:
            from gpboost_tpu.utils.log import log_info
            log_info(f"GPModel trace: iter {it + 1}, nll = {nll_new:.6f}, "
                  f"pars = {np.round(np.exp(theta), 6)}")
        if callback is not None:
            callback(it, theta, nll_new)
        if cfg.convergence_criterion == "relative_change_in_log_likelihood":
            small = abs(nll_new - nll) / max(abs(nll), 1e-300) < cfg.delta_rel_conv
        else:  # relative_change_in_parameters (on original scale)
            rel = np.linalg.norm(np.exp(cand) - np.exp(theta_after_grad_lag1))
            small = rel < cfg.delta_rel_conv * max(
                np.linalg.norm(np.exp(theta)), 1e-300)
        # a halved (shrunken) step distorts the change-based criteria; demand
        # either a clean full-step small change or two consecutive small ones
        small_change_streak = small_change_streak + 1 if small else 0
        if small and (not halved or small_change_streak >= 2):
            nll = nll_new
            converged = True
            break
        nll = nll_new
    return OptimResult(params=np.exp(theta), nll=nll, num_it=it + 1,
                       converged=converged, history=history, final_lr=lr,
                       lr_after_first=lr_after_first)


def fisher_scoring(value_fn: Callable, grad_fn: Callable, fisher_fn: Callable,
                   theta0: np.ndarray, cfg: OptimConfig,
                   callback: Optional[Callable] = None) -> OptimResult:
    """Fisher scoring with log-scale step capping and NLL-decrease halving.

    step = FI^-1 grad, clipped elementwise to log(100)
    (``UpdateCovAuxPars``, ``re_model_template.h:7584-7600``).
    """
    theta = np.asarray(theta0, dtype=np.float64)
    nll = float(value_fn(theta))
    history = [nll]
    converged = False
    it = 0
    for it in range(cfg.maxit):
        g = np.asarray(grad_fn(theta), dtype=np.float64)
        fi = np.asarray(fisher_fn(theta), dtype=np.float64)
        try:
            step = np.linalg.solve(fi, g)
        except np.linalg.LinAlgError:
            step = g
        step = np.clip(step, -MAX_GRADIENT_UPDATE_LOG_SCALE,
                       MAX_GRADIENT_UPDATE_LOG_SCALE)
        lr_try = 1.0
        accepted = False
        for _ in range(MAX_LR_SHRINKAGE_STEPS):
            cand = theta - lr_try * step
            nll_new = float(value_fn(cand))
            if np.isfinite(nll_new) and nll_new <= nll:
                accepted = True
                break
            lr_try *= LR_SHRINKAGE_FACTOR
        if not accepted:
            break
        theta = cand
        history.append(nll_new)
        if cfg.trace:
            from gpboost_tpu.utils.log import log_info
            log_info(f"GPModel trace (fisher_scoring): iter {it + 1}, "
                  f"nll = {nll_new:.6f}, pars = {np.round(np.exp(theta), 6)}")
        if callback is not None:
            callback(it, theta, nll_new)
        if cfg.convergence_criterion == "relative_change_in_log_likelihood":
            if abs(nll_new - nll) / max(abs(nll), 1e-300) < cfg.delta_rel_conv:
                nll = nll_new
                converged = True
                break
        nll = nll_new
    return OptimResult(params=np.exp(theta), nll=nll, num_it=it + 1,
                       converged=converged, history=history)


def lbfgs_host(value_and_grad_fn: Callable, theta0: np.ndarray,
               cfg: OptimConfig, mem=None):
    """Hand-rolled L-BFGS (two-loop recursion + Armijo backtracking) with
    PERSISTENT curvature memory: ``mem`` is the (s, y) correction history of
    a previous call, reused to warm-start the inverse-Hessian approximation
    — the reference's ``reuse_m_bfgs_from_previous_call`` for the GPBoost
    algorithm's per-iteration covariance refits
    (``re_model_template.h:880``, LBFGSpp ``BFGSMat`` kept across calls).
    Returns (OptimResult, mem)."""
    m_corr = 6
    theta = np.asarray(theta0, dtype=np.float64)
    v, g = value_and_grad_fn(theta)
    v = float(v)
    g = np.asarray(g, dtype=np.float64)
    mem = list(mem) if mem else []
    history = [v]
    converged = False
    it = 0
    for it in range(cfg.maxit):
        # two-loop recursion for d = -H g
        q = g.copy()
        alphas = []
        for s_i, y_i, rho_i in reversed(mem):
            a_i = rho_i * np.dot(s_i, q)
            alphas.append(a_i)
            q = q - a_i * y_i
        if mem:
            s_l, y_l, _ = mem[-1]
            gamma = np.dot(s_l, y_l) / max(np.dot(y_l, y_l), 1e-300)
            q = gamma * q
        for (s_i, y_i, rho_i), a_i in zip(mem, reversed(alphas)):
            b_i = rho_i * np.dot(y_i, q)
            q = q + (a_i - b_i) * s_i
        d = -q
        dg = float(np.dot(d, g))
        if dg >= 0:  # not a descent direction: reset to steepest descent
            d = -g
            dg = -float(np.dot(g, g))
            mem = []
        # first-iteration step scaling (LBFGSpp: 1/||d||)
        t = (1.0 / max(np.linalg.norm(d), 1e-300)) if not mem and it == 0             else 1.0
        accepted = False
        for _ in range(MAX_LR_SHRINKAGE_STEPS):
            cand = theta + t * d
            v_new, g_new = value_and_grad_fn(cand)
            v_new = float(v_new)
            if np.isfinite(v_new) and v_new <= v + C_ARMIJO * t * dg:
                accepted = True
                break
            t *= LR_SHRINKAGE_FACTOR
        if not accepted:
            break
        g_new = np.asarray(g_new, dtype=np.float64)
        s_vec = cand - theta
        y_vec = g_new - g
        sy = float(np.dot(s_vec, y_vec))
        if sy > 1e-10 * np.linalg.norm(s_vec) * np.linalg.norm(y_vec):
            mem.append((s_vec, y_vec, 1.0 / sy))
            if len(mem) > m_corr:
                mem.pop(0)
        rel = abs(v_new - v) / max(abs(v), 1e-300)
        theta, g = cand, g_new
        history.append(v_new)
        done = rel < cfg.delta_rel_conv
        v = v_new
        if done:
            converged = True
            break
    return (OptimResult(params=np.exp(theta), nll=v, num_it=it + 1,
                        converged=converged, history=history), mem)


def lbfgs(value_and_grad_fn: Callable, theta0: np.ndarray,
          cfg: OptimConfig) -> OptimResult:
    """L-BFGS on log-scale parameters via scipy (reference: LBFGSpp,
    ``optim_utils.h:642-676``). When ``cfg.lbfgs_reuse_mem`` is enabled
    (GPBoost per-iteration refits with ``reuse_learning_rates_gp_model``),
    the hand-rolled persistent-memory solver runs instead and the curvature
    history carries across calls."""
    if getattr(cfg, "lbfgs_reuse_mem", False):
        result, cfg._lbfgs_mem = lbfgs_host(
            value_and_grad_fn, theta0, cfg,
            getattr(cfg, "_lbfgs_mem", None))
        return result
    from scipy.optimize import minimize

    def f(theta):
        v, g = value_and_grad_fn(theta)
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            return 1e300, np.zeros_like(g)
        return v, g

    res = minimize(f, np.asarray(theta0, dtype=np.float64), jac=True,
                   method="L-BFGS-B",
                   options={"maxiter": cfg.maxit, "ftol": cfg.delta_rel_conv,
                            "gtol": 1e-10})
    return OptimResult(params=np.exp(res.x), nll=float(res.fun),
                       num_it=int(res.nit), converged=bool(res.success),
                       history=[float(res.fun)])


def lbfgs_device(vg_fn: Callable, theta0: np.ndarray,
                 cfg: OptimConfig, dtype=None, *op_args,
                 final_fn: Optional[Callable] = None) -> OptimResult:
    """L-BFGS with the ENTIRE optimization loop compiled on device.

    ``vg_fn(theta, *op_args) -> (value, grad)`` must be a pure jax function
    of the log-scale parameters (``op_args`` are traced operands — pass
    data through them, not through closures, so the compiled driver is
    reusable). The loop is an ``optax.lbfgs`` (zoom linesearch)
    update inside ``lax.while_loop`` — ONE device dispatch for the whole
    fit instead of one blocking host round trip per objective evaluation.
    The host-driven scipy path (``lbfgs``) pays the full dispatch latency
    per evaluation, which dominates fit wall-clock on remote/tunneled
    accelerators (measured 36 s -> <1 s warm for a 100k-point Vecchia fit
    over the TPU tunnel). Stops on the reference's
    relative-change-in-log-likelihood criterion.
    """
    import jax.numpy as jnp

    dt = dtype or jnp.float64
    maxit = int(cfg.maxit)
    ftol = float(cfg.delta_rel_conv)
    run = _device_lbfgs_runner(vg_fn, maxit, ftol, dt, final_fn)
    t0 = jnp.asarray(np.asarray(theta0, np.float64), dt)
    t_fin, v_fin, n_it, extra = run(t0, *op_args)
    return OptimResult(params=np.exp(np.asarray(t_fin, np.float64)),
                       nll=float(v_fin), num_it=int(n_it),
                       converged=bool(int(n_it) < maxit),
                       history=[float(v_fin)],
                       aux=None if final_fn is None else np.asarray(extra))


_DEVICE_LBFGS_RUNNERS: dict = {}


def lbfgs_loop(vg_fn, maxit: int, ftol: float, dt, final_fn, t0, *ops):
    """TRACEABLE whole-fit L-BFGS loop (the body of the compiled driver).

    Pure function of ``(t0, *ops)`` — call it inside a larger jitted
    program to fuse covariance refits into an outer loop (the
    device-resident GPBoost trainer, ``boosting/device_loop.py``), or via
    :func:`_device_lbfgs_runner` for the standalone one-dispatch fit.
    Returns ``(theta, value, iters, extra)`` with ``extra = final_fn(theta,
    *ops)`` (0.0 when final_fn is None).
    """
    import jax
    import jax.numpy as jnp

    body, cond = _lbfgs_machinery(vg_fn, maxit, ftol, dt, ops)
    init = _lbfgs_init(vg_fn, dt, t0, ops)
    t, v, *_rest = jax.lax.while_loop(cond, body, init)
    k = _rest[4]
    extra = (jnp.zeros((), dt) if final_fn is None
             else final_fn(t, *ops))
    return t, v, k, extra


_LBFGS_MEM = 8


def _lbfgs_init(vg_fn, dt, t0, ops):
    """Initial while_loop carry for the hand-rolled L-BFGS: one objective
    evaluation + empty curvature memory."""
    import jax.numpy as jnp
    MEM = _LBFGS_MEM
    p = t0.shape[0]
    v0, g0 = vg_fn(t0, *ops)
    v0 = jnp.asarray(v0, dt)
    g0 = jnp.asarray(g0, dt)
    S = jnp.zeros((MEM, p), dt)
    Y = jnp.zeros((MEM, p), dt)
    rho = jnp.zeros((MEM,), dt)
    return (t0, v0, g0, S, Y, rho, jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, dt), jnp.asarray(False))


def _lbfgs_machinery(vg_fn, maxit: int, ftol: float, dt, ops):
    """(body, cond) of the L-BFGS ``lax.while_loop`` over the carry
    ``(t, v, g, S, Y, rho, k, prev_v, stalled)`` — shared by the
    one-dispatch driver (:func:`lbfgs_loop`) and the CHUNKED driver
    (:func:`_device_lbfgs_chunk_runner`), which re-dispatches the same
    carry a few iterations at a time so one program never outruns the
    TPU runtime's execution watchdog on expensive objectives."""
    import jax
    import jax.numpy as jnp

    # Hand-rolled L-BFGS (two-loop recursion) + Armijo backtracking, written
    # so the objective kernel is instantiated exactly TWICE in the compiled
    # graph (outer step + linesearch body). The off-the-shelf optax zoom
    # linesearch inlines the kernel ~10x across cond branches, which blew
    # the cold XLA compile up to ~20 min over the TPU tunnel for the fused
    # Pallas Vecchia kernel; this loop compiles in minutes and runs the same
    # ~0.5 s steady-state.
    MEM = _LBFGS_MEM
    C1 = 1e-4
    MAX_HALVINGS = 30

    if True:
        def two_loop(g, S, Y, rho, k):
            # standard two-loop recursion over the valid window
            def bwd(i, carry):
                q, alphas = carry
                idx = (k - 1 - i) % MEM
                valid = i < jnp.minimum(k, MEM)
                a = jnp.where(valid, rho[idx] * jnp.dot(S[idx], q), 0.0)
                q = q - a * Y[idx]
                return q, alphas.at[idx].set(a)

            q, alphas = jax.lax.fori_loop(
                0, MEM, bwd, (g, jnp.zeros((MEM,), dt)))
            last = (k - 1) % MEM
            ys = jnp.dot(Y[last], S[last])
            yy = jnp.dot(Y[last], Y[last])
            gamma = jnp.where((k > 0) & (ys > 0) & (yy > 0),
                              ys / jnp.maximum(yy, 1e-30), 1.0)
            r = gamma * q

            def fwd(i, r):
                idx = (k - jnp.minimum(k, MEM) + i) % MEM
                valid = i < jnp.minimum(k, MEM)
                b = jnp.where(valid, rho[idx] * jnp.dot(Y[idx], r), 0.0)
                return r + (alphas[idx] - b) * S[idx]

            return jax.lax.fori_loop(0, MEM, fwd, r)

        def linesearch(t, v, g, d):
            gd = jnp.dot(g, d)

            def ls_cond(c):
                a, v_new, _g_new, _t_new, j = c
                bad = (~jnp.isfinite(v_new)) | (v_new > v + C1 * a * gd)
                return bad & (j < MAX_HALVINGS)

            def ls_body(c):
                a, _v, _g, _t, j = c
                a = jnp.where(j == 0, a, a * 0.5)
                t_new = t + a * d
                v_new, g_new = vg_fn(t_new, *ops)
                return (a, jnp.asarray(v_new, dt), jnp.asarray(g_new, dt),
                        t_new, j + 1)

            init = (jnp.asarray(1.0, dt), jnp.asarray(jnp.inf, dt),
                    jnp.zeros_like(g), t, jnp.asarray(0, jnp.int32))
            a, v_new, g_new, t_new, j = jax.lax.while_loop(
                ls_cond, ls_body, init)
            ok = jnp.isfinite(v_new) & (v_new <= v + C1 * a * gd)
            return t_new, v_new, g_new, ok

        def body(carry):
            t, v, g, S, Y, rho, k, _prev_v, _stalled = carry
            d = -two_loop(g, S, Y, rho, k)
            # fall back to steepest descent if d is not a descent direction
            descent = jnp.dot(g, d) < 0
            d = jnp.where(descent, d, -g)
            t_new, v_new, g_new, ok = linesearch(t, v, g, d)
            s = t_new - t
            yv = g_new - g
            ys = jnp.dot(yv, s)
            idx = k % MEM
            upd = ok & (ys > 1e-10)
            S = jnp.where(upd, S.at[idx].set(s), S)
            Y = jnp.where(upd, Y.at[idx].set(yv), Y)
            rho = jnp.where(upd, rho.at[idx].set(1.0 / ys), rho)
            k = k + jnp.asarray(upd, k.dtype)
            t = jnp.where(ok, t_new, t)
            g = jnp.where(ok, g_new, g)
            v_out = jnp.where(ok, v_new, v)
            return (t, v_out, g, S, Y, rho, k, v, ~ok)

        def cond(carry):
            _t, v, _g, _S, _Y, _rho, k, prev_v, stalled = carry
            rel = jnp.abs(v - prev_v) / jnp.maximum(
                jnp.maximum(jnp.abs(v), jnp.abs(prev_v)), 1.0)
            return ((k == 0) | (rel >= ftol)) & (k < maxit) \
                & jnp.isfinite(v) & (~stalled)

        return body, cond


def _device_lbfgs_runner(vg_fn, maxit: int, ftol: float, dt,
                         final_fn=None):
    """Compiled whole-fit L-BFGS driver, cached per (objective, settings) so
    repeated fits (per-boosting-iteration covariance refits) reuse the
    executable instead of recompiling. ``final_fn(theta, *ops)`` is an
    optional extra output evaluated at the FINAL parameters inside the same
    compiled program (one dispatch carries the fit AND e.g. the GPBoost
    pseudo-gradient solve Psi^-1 r — saves a tunnel round trip per
    boosting iteration). The loop itself is :func:`lbfgs_loop`."""
    key = (id(vg_fn), maxit, ftol, dt, id(final_fn))
    hit = _DEVICE_LBFGS_RUNNERS.get(key)
    if hit is not None:
        return hit[-1]

    import jax

    @jax.jit
    def run(t0, *ops):
        return lbfgs_loop(vg_fn, maxit, ftol, dt, final_fn, t0, *ops)

    # hold strong references so the id() keys stay valid
    _DEVICE_LBFGS_RUNNERS[key] = (vg_fn, final_fn, run)
    return run


def _device_lbfgs_chunk_runner(vg_fn, maxit: int, ftol: float, dt,
                               steps: int):
    """Compiled (init, chunk) pair for the CHUNKED device L-BFGS: ``init``
    evaluates the objective once and builds the loop carry; ``chunk`` runs
    AT MOST ``steps`` L-BFGS iterations of the same while_loop and returns
    ``(carry, trips)``. The host re-dispatches until the convergence
    condition (checked host-side on the fetched carry scalars) fails —
    bounding single-program runtime on objectives whose one evaluation
    costs tens of seconds (the 100k-point iterative Vecchia-Laplace vg ran
    the TPU worker into its execution watchdog as ONE dispatch)."""
    key = ("chunk", id(vg_fn), maxit, ftol, dt, steps)
    hit = _DEVICE_LBFGS_RUNNERS.get(key)
    if hit is not None:
        return hit[-2], hit[-1]

    import jax
    import jax.numpy as jnp

    @jax.jit
    def init(t0, *ops):
        return _lbfgs_init(vg_fn, dt, t0, ops)

    @jax.jit
    def chunk(carry, *ops):
        body, cond = _lbfgs_machinery(vg_fn, maxit, ftol, dt, ops)

        def body2(c):
            inner, j = c
            return body(inner), j + 1

        def cond2(c):
            inner, j = c
            return cond(inner) & (j < steps)

        inner, j = jax.lax.while_loop(
            cond2, body2, (carry, jnp.asarray(0, jnp.int32)))
        return inner, j

    _DEVICE_LBFGS_RUNNERS[key] = (vg_fn, init, chunk)
    return init, chunk


def lbfgs_device_chunked(vg_fn: Callable, theta0: np.ndarray,
                         cfg: OptimConfig, dtype=None, *op_args,
                         chunk_iters: int = 1,
                         final_fn: Optional[Callable] = None) -> OptimResult:
    """Device L-BFGS dispatched ``chunk_iters`` iterations at a time.

    Same math and stopping rule as :func:`lbfgs_device` (the carry round
    trip is device-resident; only four scalars are fetched per chunk for
    the host-side convergence check), at ~one tunnel round trip per chunk
    of iterations. Use for objectives expensive enough that a whole-fit
    program would exceed the accelerator's execution watchdog."""
    import jax.numpy as jnp

    dt = dtype or jnp.float64
    maxit = int(cfg.maxit)
    ftol = float(cfg.delta_rel_conv)
    steps = max(int(chunk_iters), 1)
    init, chunk = _device_lbfgs_chunk_runner(vg_fn, maxit, ftol, dt, steps)
    t0 = jnp.asarray(np.asarray(theta0, np.float64), dt)
    carry = init(t0, *op_args)
    while True:
        carry, _trips = chunk(carry, *op_args)
        # host-side replica of the loop condition (fetches scalars only)
        v = float(carry[1])
        k = int(carry[6])
        prev_v = float(carry[7])
        stalled = bool(carry[8])
        rel = abs(v - prev_v) / max(max(abs(v), abs(prev_v)), 1.0)
        if (not (k == 0 or rel >= ftol) or k >= maxit
                or not np.isfinite(v) or stalled):
            break
    t_fin, v_fin = carry[0], carry[1]
    extra = None
    if final_fn is not None:
        import jax
        extra = np.asarray(jax.jit(final_fn)(t_fin, *op_args))
    return OptimResult(params=np.exp(np.asarray(t_fin, np.float64)),
                       nll=float(v_fin), num_it=k,
                       converged=bool(k < maxit),
                       history=[float(v_fin)], aux=extra)


def gd_device(vg_fn: Callable, theta0: np.ndarray, cfg: OptimConfig,
              dtype=None, *op_args) -> OptimResult:
    """Nesterov-accelerated GD with the ENTIRE loop compiled on device.

    Mirrors the host ``gradient_descent`` semantics (permanent LR capping,
    LR/acc halving with Armijo, momentum dropped after two rejections,
    halved-step convergence streak) as one ``lax.while_loop`` — a single
    dispatch per fit instead of two blocking round trips per iteration.
    Supports the default relative-change-in-log-likelihood criterion; other
    criteria / trace / callbacks stay on the host path."""
    import jax.numpy as jnp

    dt = dtype or jnp.float64
    run = _device_gd_runner(
        vg_fn, int(cfg.maxit), float(cfg.delta_rel_conv),
        float(cfg.lr_cov), float(cfg.acc_rate_cov),
        bool(cfg.use_nesterov_acc), int(cfg.momentum_offset),
        bool(cfg.armijo_condition), dt)
    t0 = jnp.asarray(np.asarray(theta0, np.float64), dt)
    t_fin, v_fin, n_it, conv = run(t0, *op_args)
    return OptimResult(params=np.exp(np.asarray(t_fin, np.float64)),
                       nll=float(v_fin), num_it=int(n_it),
                       converged=bool(conv), history=[float(v_fin)])


_DEVICE_GD_RUNNERS: dict = {}


def _device_gd_runner(vg_fn, maxit: int, ftol: float, lr0: float,
                      acc_rate: float, use_acc: bool, offset: int,
                      armijo: bool, dt):
    key = (id(vg_fn), maxit, ftol, lr0, acc_rate, use_acc, offset, armijo,
           dt)
    hit = _DEVICE_GD_RUNNERS.get(key)
    if hit is not None:
        return hit[1]

    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(t0, *ops):
        v0, _g0 = vg_fn(t0, *ops)
        v0 = jnp.asarray(v0, dt)

        def linesearch(t, t_ag1, g, nll, lr, it):
            dir_deriv = -jnp.dot(g, g)

            def ls_cond(c):
                j, _lr_t, _acc_t, ok, _v, _cand, _cag = c
                return (~ok) & (j < MAX_LR_SHRINKAGE_STEPS)

            def ls_body(c):
                j, lr_t, acc_t, _ok, _v, _cand, _cag = c
                lr_t = jnp.where(j == 0, lr_t, lr_t * LR_SHRINKAGE_FACTOR)
                acc_t = jnp.where(j == 0, acc_t, acc_t * 0.5)
                mu = jnp.where(
                    use_acc & (it >= offset) & (j < 2), acc_t, 0.0)
                cag = t - lr_t * g
                cand = (1.0 + mu) * cag - mu * t_ag1
                v, _ = vg_fn(cand, *ops)
                v = jnp.asarray(v, dt)
                bound = (nll + C_ARMIJO * lr_t * dir_deriv if armijo
                         else nll)
                ok = jnp.isfinite(v) & (v <= bound)
                return (j + 1, lr_t, acc_t, ok, v, cand, cag)

            init = (jnp.asarray(0, jnp.int32), lr,
                    jnp.asarray(acc_rate, dt), jnp.asarray(False),
                    jnp.asarray(jnp.inf, dt), t, t)
            j, lr_t, _acc, ok, v, cand, cag = jax.lax.while_loop(
                ls_cond, ls_body, init)
            return ok, v, cand, cag, lr_t, j > 1

        def body(carry):
            (t, t_ag, t_ag1, lr, nll, it, streak, _stop, conv) = carry
            _v, g = vg_fn(t, *ops)
            g = jnp.asarray(g, dt)
            g_ok = jnp.all(jnp.isfinite(g))
            gmax = jnp.max(jnp.abs(g))
            lr = jnp.minimum(lr, MAX_GRADIENT_UPDATE_LOG_SCALE
                             / jnp.maximum(gmax, 1e-300))
            ok, v_new, cand, cag, lr_new, halved = linesearch(
                t, t_ag1, g, nll, lr, it)
            accept = ok & g_ok
            rel = jnp.abs(v_new - nll) / jnp.maximum(jnp.abs(nll), 1e-300)
            small = rel < ftol
            streak = jnp.where(small, streak + 1, 0)
            done = accept & small & ((~halved) | (streak >= 2))
            return (jnp.where(accept, cand, t),
                    jnp.where(accept, cag, t_ag),
                    jnp.where(accept, t_ag, t_ag1),
                    jnp.where(accept, lr_new, lr),
                    jnp.where(accept, v_new, nll),
                    it + jnp.asarray(accept, it.dtype),
                    streak, (~accept) | done, conv | done)

        def cond(carry):
            *_rest, it, _streak, stop, _conv = carry
            return (~stop) & (it < maxit)

        init = (t0, t0, t0, jnp.asarray(lr0, dt), v0,
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                jnp.asarray(False), jnp.asarray(False))
        t, _tag, _tag1, _lr, v, it, _s, _stop, conv = jax.lax.while_loop(
            cond, body, init)
        return t, v, it, conv

    _DEVICE_GD_RUNNERS[key] = (vg_fn, run)
    return run


def nelder_mead(value_fn: Callable, theta0: np.ndarray,
                cfg: OptimConfig) -> OptimResult:
    """Nelder-Mead on log-scale parameters (reference: OptimLib)."""
    from scipy.optimize import minimize

    def f(theta):
        v = float(value_fn(theta))
        return v if np.isfinite(v) else 1e300

    res = minimize(f, np.asarray(theta0, dtype=np.float64),
                   method="Nelder-Mead",
                   options={"maxiter": max(cfg.maxit, 1000), "xatol": 1e-8,
                            "fatol": cfg.delta_rel_conv})
    return OptimResult(params=np.exp(res.x), nll=float(res.fun),
                       num_it=int(res.nit), converged=bool(res.success),
                       history=[float(res.fun)])


def adam(value_and_grad_fn: Callable, theta0: np.ndarray,
         cfg: OptimConfig) -> OptimResult:
    """Adam on log-scale parameters (reference: OptimLib adam)."""
    import optax

    opt = optax.adam(learning_rate=max(cfg.lr_cov, 1e-3))
    theta = jnp.asarray(theta0, dtype=jnp.float64)
    state = opt.init(theta)
    nll_prev = np.inf
    history = []
    converged = False
    it = 0
    for it in range(cfg.maxit):
        v, g = value_and_grad_fn(np.asarray(theta))
        v = float(v)
        history.append(v)
        updates, state = opt.update(jnp.asarray(g), state, theta)
        theta = optax.apply_updates(theta, updates)
        if abs(v - nll_prev) / max(abs(nll_prev), 1e-300) < cfg.delta_rel_conv:
            converged = True
            break
        nll_prev = v
    theta = np.asarray(theta)
    return OptimResult(params=np.exp(theta), nll=float(value_and_grad_fn(theta)[0]),
                       num_it=it + 1, converged=converged, history=history)
