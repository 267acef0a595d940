"""Fit driver for non-Gaussian (Laplace-approximated) models.

Equivalent of the non-Gaussian branches of
``REModelTemplate::OptimLinRegrCoefCovPar`` (``re_model_template.h:846``):
optimizes log covariance parameters, log auxiliary likelihood parameters
(``estimate_aux_pars``), and regression coefficients jointly. Default
optimizer is L-BFGS (the reference's default for most non-Gaussian models);
``gradient_descent`` with Nesterov is also supported.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu import likelihoods as lk
from gpboost_tpu.models import laplace, optimizers
from gpboost_tpu.models.spec import ModelData


def fit(model, data: ModelData, fixed_effects: Optional[jnp.ndarray] = None):
    """Fit a non-Gaussian GPModel. Mutates ``model`` like the Gaussian path."""
    cfg = model.optim_cfg
    spec = model.spec
    fam = lk.get_family(spec.likelihood)
    y_np = np.asarray(data.y)

    init_cov = (cfg.init_cov_pars if cfg.init_cov_pars is not None
                else model._default_init_cov_pars(y_np))
    n_cov = len(init_cov)
    if getattr(model, "aux_pars_", None) is not None:
        init_aux = np.atleast_1d(np.asarray(model.aux_pars_))
    else:
        init_aux = fam.default_aux_pars(model.likelihood_additional_param)
    estimate_aux = cfg.estimate_aux_pars and init_aux is not None
    n_aux = len(init_aux) if (init_aux is not None and estimate_aux) else 0
    aux_fixed = (None if init_aux is None
                 else jnp.asarray(init_aux, dtype=jnp.float64))
    has_coef = data.X is not None
    n_coef = data.X.shape[1] if has_coef else 0

    if has_coef:
        init_beta = (cfg.init_coef if cfg.init_coef is not None
                     else np.zeros(n_coef))
    else:
        init_beta = np.zeros(0)

    theta0 = np.concatenate([
        np.log(np.maximum(np.asarray(init_cov, dtype=np.float64), 1e-300)),
        lk.aux_to_optim_scale(fam, init_aux[:n_aux]) if n_aux
        else np.zeros(0),
        np.asarray(init_beta, dtype=np.float64),
    ])

    def unpack(theta):
        cov = jnp.exp(theta[:n_cov])
        aux = (lk.aux_from_optim_scale(fam, theta[n_cov:n_cov + n_aux])
               if n_aux else aux_fixed)
        beta = theta[n_cov + n_aux:] if has_coef else None
        return cov, aux, beta

    def vg(theta):
        """Value+grad via the module-level cached jit; theta packing/unpacking
        and chain rule for the log transform happen host-side."""
        theta = np.asarray(theta, dtype=np.float64)
        cov, aux, beta = unpack(jnp.asarray(theta))
        if getattr(model, "_grouped_only", False):
            from gpboost_tpu.models import grouped
            if getattr(model, "matrix_inversion_method",
                       "cholesky") == "iterative":
                # grouped-RE regime accepts the reference's names
                # (ssor default / incomplete_cholesky, basic.py:5416);
                # both sequential sweeps map to the TPU-native Jacobi
                # diagonal of (SigmaI + Z'WZ); unknown names raise
                pn = str(cfg.cg_preconditioner_type or "").lower()
                if pn not in ("", "default", "ssor", "jacobi",
                              "incomplete_cholesky"):
                    raise ValueError(
                        f"unsupported cg_preconditioner_type {pn!r} for "
                        "grouped random effects; options: ssor (default) "
                        "or incomplete_cholesky (both served by the "
                        "TPU-native Jacobi diagonal)")
                # Newton-CG mode finding + stochastic logdet (CG_utils.h:979)
                v, (g_cov, g_aux, g_beta) = \
                    grouped.nll_laplace_iterative_value_and_grad(
                        spec, data, cov, aux, beta, fixed_effects,
                        max(cfg.num_rand_vec_trace, 50), 50,
                        cg_tol=min(cfg.cg_delta_conv, 1e-6),
                        cg_max_iter=cfg.cg_max_num_it,
                        seed=cfg.seed_rand_vec_trace)
            else:
                v, (g_cov, g_aux, g_beta) = \
                    grouped.nll_laplace_value_and_grad(
                        spec, data, cov, aux, beta, fixed_effects)
        else:
            v, (g_cov, g_aux, g_beta) = laplace.nll_value_and_grad(
                spec, data, cov, aux, beta, fixed_effects)
        g = np.asarray(g_cov) * np.exp(theta[:n_cov])
        parts = [g]
        if n_aux:
            parts.append(np.asarray(g_aux)
                         * lk.aux_chain_factors(fam,
                                                theta[n_cov:n_cov + n_aux]))
        if has_coef:
            parts.append(np.asarray(g_beta))
        return float(v), np.concatenate(parts)

    if cfg.optimizer_cov in ("lbfgs", "lbfgs_linesearch_nocedal_wright"):
        result = optimizers.lbfgs(vg, theta0, cfg)
        theta_fin = np.log(result.params)  # lbfgs returns exp(theta)
    elif cfg.optimizer_cov == "nelder_mead":
        result = optimizers.nelder_mead(lambda t: vg(t)[0], theta0, cfg)
        theta_fin = np.log(result.params)
    elif cfg.optimizer_cov == "adam":
        result = optimizers.adam(vg, theta0, cfg)
        theta_fin = np.log(result.params)
    else:  # gradient_descent
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
