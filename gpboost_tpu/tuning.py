"""Hyperparameter tuning: grid / random search over CV
(reference ``engine.py:868`` ``grid_search_tune_parameters`` and the TPE
tuner at ``engine.py:1193``; TPE is provided via optuna when available).
"""
from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import numpy as np

from gpboost_tpu.boosting.engine import cv


def grid_search_tune_parameters(
        param_grid: Dict[str, list], train_set, params: Optional[dict] = None,
        num_try_random: Optional[int] = None, nfold: int = 5,
        gp_model=None, use_gp_model_for_validation: bool = True,
        train_gp_model_cov_pars: bool = True, folds=None, metric=None,
        num_boost_round: int = 100, early_stopping_rounds: Optional[int] = None,
        seed: int = 0, verbose_eval: int = 1, **kwargs):
    """Exhaustive or random grid search via cross-validation.

    Returns {'best_params', 'best_iter', 'best_score'} like the reference.
    """
    keys = list(param_grid.keys())
    combos = list(itertools.product(*[param_grid[k] for k in keys]))
    rng = np.random.default_rng(seed)
    if num_try_random is not None and num_try_random < len(combos):
        idx = rng.choice(len(combos), size=num_try_random, replace=False)
        combos = [combos[i] for i in idx]
    base = dict(params or {})
    if metric is not None:
        base["metric"] = metric
    best = None
    for combo in combos:
        trial = dict(base)
        trial.update(dict(zip(keys, combo)))
        res = cv(trial, train_set, num_boost_round=num_boost_round,
                 gp_model=gp_model, nfold=nfold, folds=folds, seed=seed,
                 early_stopping_rounds=early_stopping_rounds,
                 use_gp_model_for_validation=use_gp_model_for_validation,
                 train_gp_model_cov_pars=train_gp_model_cov_pars)
        mean_keys = [k for k in res if k.endswith("-mean")]
        if not mean_keys:
            continue
        curve = res[mean_keys[0]]
        higher_better = mean_keys[0].startswith("auc")
        best_iter = (int(np.argmax(curve)) if higher_better
                     else int(np.argmin(curve)))
        score = curve[best_iter]
        is_better = (best is None or
                     (score > best["best_score"] if higher_better
                      else score < best["best_score"]))
        if verbose_eval and verbose_eval > 0:
            from gpboost_tpu.utils.log import log_info
            log_info(f"params {dict(zip(keys, combo))}: {mean_keys[0]}="
                  f"{score:g} @ iter {best_iter + 1}")
        if is_better:
            best = {"best_params": dict(zip(keys, combo)),
                    "best_iter": best_iter + 1,
                    "best_score": score}
    return best


def tune_pars_TPE_algorithm_optuna(search_space, train_set, params=None,
                                   n_trials=100, **kwargs):
    """Optuna TPE tuning (``engine.py:1193``). Requires optuna."""
    try:
        import optuna
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tune_pars_TPE_algorithm_optuna requires optuna") from e

    def objective(trial):
        trial_params = dict(params or {})
        for name, spec in search_space.items():
            if isinstance(spec, tuple) and len(spec) == 2:
                lo, hi = spec
                if isinstance(lo, int) and isinstance(hi, int):
                    trial_params[name] = trial.suggest_int(name, lo, hi)
                else:
                    trial_params[name] = trial.suggest_float(name, lo, hi,
                                                             log=True)
            else:
                trial_params[name] = trial.suggest_categorical(name, list(spec))
        res = cv(trial_params, train_set, **kwargs)
        mean_keys = [k for k in res if k.endswith("-mean")]
        return min(res[mean_keys[0]])

    study = optuna.create_study(direction="minimize")
    study.optimize(objective, n_trials=n_trials)
    return {"best_params": study.best_params, "best_score": study.best_value}
