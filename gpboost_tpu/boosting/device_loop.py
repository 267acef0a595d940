"""Whole-training-loop-on-device GPBoost.

The regular ``gpb.train`` loop pays several blocking host<->device round
trips per boosting iteration — covariance-refit dispatch, tree-grower
dispatch + fetch, score bookkeeping — ~1 s/round over a tunneled TPU where
the actual device compute is tens of milliseconds. This driver compiles the
ENTIRE GPBoost iteration into one ``lax.fori_loop`` over boosting rounds:

    resid = y - F
    theta, nll, aux = L-BFGS covariance refit (optimizers.lbfgs_loop)
                      with the pseudo-gradient solve Psi^-1 resid fused
    tree = whole-tree jitted grower (tree._grow_tree_jit) on g = -aux
    F    = F + lr * leaf_value[row_leaf]

— a SINGLE dispatch for the whole training run, with one device->host fetch
of all per-round tree arrays at the end. Reference flow being replaced:
``gbdt.cpp:404`` TrainOneIter + the per-iteration
``REModel::OptimLinRegrCoefCovPar`` refits (``regression_objective.hpp:153``).

The round sequence matches the host loop exactly: the host runs fit@F0,
tree0, fit@F1 (end-of-iteration refit, reused as round 1's gradient), ...,
fit@FR — this loop runs fits at F0..F_{R-1} in-device and the trailing
fit@FR through the normal ``objective.get_gradients`` host path so all
GPModel state (data, NLL, fit result) is materialized exactly as the host
loop leaves it.

Engages automatically from ``engine.train`` when the configuration matches
the common GPBoost case (``eligible``); the host loop serves everything
else. ``GPBOOST_TPU_NO_DEVICE_LOOP=1`` disables it;
``GPBOOST_TPU_FORCE_DEVICE_LOOP=1`` enables it on CPU (tests), where a
generic ``build_factors`` objective replaces the Pallas kernels.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.utils.log import log_info


def _vg_psi_for(vec, dtype):
    """(value+grad fn, Psi^-1-solve fn, kernel dtype) for a VecchiaGP —
    the fused Pallas pair when present (TPU), else generic builders over
    the permuted layout (any backend; used by the CPU tests)."""
    vg = getattr(vec, "_vg_pallas_jit", None)
    psi = getattr(vec, "_fit_psi_inv", None)
    if vg is not None and psi is not None:
        return vg, psi, jnp.float32
    cached = getattr(vec, "_device_loop_vg_psi", None)
    if cached is not None:
        return cached
    from gpboost_tpu.ops import vecchia as vops
    perm = jnp.asarray(vec.perm)
    inv_perm = jnp.asarray(vec.inv_perm)
    coords = vec.coords_perm
    cov_fn = vec.cov_fn

    def _factors(th, nb):
        cp = jnp.exp(th)
        return vops.build_factors(cov_fn, cp[1:], coords, nb, cp[0], True)

    def _nll(th, rp, nb):
        a, d = _factors(th, nb)
        return vops.vecchia_nll(a, d, nb, rp)

    def vg_fn(th, r, nb):
        rp = jnp.asarray(r, dtype)[perm]
        return jax.value_and_grad(_nll)(th, rp, nb)

    def psi_fn(th, r, nb):
        a, d = _factors(th, nb)
        return vops.precision_matvec(
            a, nb, d, jnp.asarray(r, dtype)[perm])[inv_perm]

    vec._device_loop_vg_psi = (vg_fn, psi_fn, dtype)  # stable ids for the
    # runner cache (repeated train calls reuse the compiled program)
    return vg_fn, psi_fn, dtype


def _ng_fused_ok(gp, ds) -> bool:
    """Extra constraints for the fused NON-GAUSSIAN (LaGaBoost) loop: the
    Laplace refit must be servable by the matrix-free iterative objective
    (``vecchia_fit.ng_device_vg``) with the whole theta = log cov_pars —
    no estimated aux parameters, no heteroscedastic stacking."""
    if gp.likelihood == "gaussian_heteroscedastic":
        return False
    from gpboost_tpu import likelihoods as lk
    fam = lk.get_family(gp.likelihood)
    ia = fam.default_aux_pars(getattr(gp, "likelihood_additional_param",
                                      None))
    cfg = gp.optim_cfg
    if ia is not None and len(ia) and cfg.estimate_aux_pars:
        return False
    use_iter = (getattr(gp, "matrix_inversion_method", "cholesky")
                == "iterative" or ds.num_data > 8192)
    if not use_iter:
        return False
    from gpboost_tpu.models import vecchia_fit
    return vecchia_fit.ng_device_fit_eligible(
        gp, cfg, is_het=False, has_coef=False, use_iterative=True)


def eligible(booster, num_boost_round=0, fobj=None, callbacks=None) -> bool:
    """True when the whole training loop can run as one device program.

    Conservative: anything host-interactive (bagging RNG, per-iteration
    callbacks/metrics, Newton leaf re-solve, line search, Nesterov lag
    bookkeeping, voting/feature-parallel learners, mesh-padded data) keeps
    the host loop.

    Engagement policy (``device_resident_boosting`` param, a gpboost-tpu
    extension): ``false`` never; ``true`` whenever the hard constraints
    allow; ``auto`` (default) when the compiled runner is already cached in
    this process (retraining/CV/tuning — the fused program then runs in
    ~2 s for 30 rounds @ 100k vs ~1 s/round on the host loop) or when the
    round count is large enough (>= 100 rounds at >= 10k rows) that the
    one-time trace+compile amortizes within a single call.
    """
    if os.environ.get("GPBOOST_TPU_NO_DEVICE_LOOP") == "1":
        return False
    force = os.environ.get("GPBOOST_TPU_FORCE_DEVICE_LOOP") == "1"
    if jax.default_backend() == "cpu" and not force:
        return False
    mode = booster.params.get("device_resident_boosting", "auto")
    mode = str(mode).lower()
    if mode not in ("auto", "true", "false"):
        raise ValueError(
            "device_resident_boosting must be 'auto', 'true' or 'false', "
            f"got {booster.params.get('device_resident_boosting')!r}")
    if mode == "false":
        return False
    from gpboost_tpu.boosting.objectives import GPBoostObjective
    obj = booster.objective
    if fobj is not None or callbacks:
        return False
    if booster.valid_sets:
        return False
    if not isinstance(obj, GPBoostObjective):
        return False
    gp = booster.gp_model
    if gp is None:
        return False
    if not obj.train_gp_model_cov_pars:
        return False
    is_gaussian = gp.spec.is_gaussian
    if not is_gaussian and not _ng_fused_ok(gp, booster.train_set):
        return False
    if booster.num_models != 1 or booster.trees:
        return False
    if booster.boosting_type != "gbdt" or booster.use_nesterov_acc:
        return False
    if (booster.linear_tree or booster.leaves_newton_update
            or booster.line_search_step_length):
        return False
    if booster._cegb is not None:
        return False      # CEGB usage state crosses tree boundaries; the
        # fused loop does not thread it through the round carry
    g = booster.grower
    if (g.extra_trees or g.feature_fraction_bynode < 1.0):
        return False        # per-leaf host-RNG draws
    if booster.feature_fraction < 1.0:
        return False        # per-tree host-RNG feature sampling
    if booster.bagging_freq > 0 and (
            booster.bagging_fraction < 1.0
            or booster.pos_bagging_fraction < 1.0
            or booster.neg_bagging_fraction < 1.0):
        return False
    ds = booster.train_set
    if int(ds.binned.shape[0]) != ds.num_data:
        return False        # mesh-padded layout
    if getattr(ds, "_shard_mesh", None) is not None:
        return False
    if getattr(ds, "tree_learner", "serial") in ("voting", "feature"):
        return False
    # GP side: plain Gaussian Vecchia, isotropic kernel (no mid-fit
    # neighbor re-determination), whole-fit-on-device-capable optimizer
    vec = gp._approx
    if vec is None or not hasattr(vec, "neighbors"):
        return False
    if type(vec).__name__ != "VecchiaGP":
        return False
    if getattr(vec, "z", None) is not None:
        return False
    if getattr(vec, "mesh", None) is not None or gp._mesh is not None:
        return False
    if not vec.cov_fn.is_isotropic:
        return False
    cfg = gp.optim_cfg
    if cfg.optimizer_cov not in ("lbfgs", "lbfgs_linesearch_nocedal_wright"):
        return False
    if cfg.estimate_cov_par_index is not None or cfg.std_dev:
        return False
    if (is_gaussian and jax.default_backend() == "tpu"
            and getattr(vec, "_vg_pallas_jit", None) is None):
        return False
    if mode == "true" or force:
        return True
    # auto: engage when the one-time trace+compile is already paid (a
    # cached runner exists for this model/data/settings) or amortizes
    # within this call
    if _runner_key(booster, int(num_boost_round)) in _FUSED_RUNNERS:
        return True
    return int(num_boost_round) >= 100 and ds.num_data >= 10_000


# compiled fused runners, keyed by (objective identities, data identity,
# round count, grower statics): repeated trainings on the same model/data
# in one process reuse the executable — the serving/retraining pattern.
# First use per process pays trace + compile(-cache-load); steady state is
# the pure device time (~1.8 s for 30 rounds @ 100k on a v5 chip).
# Bounded LRU: each entry pins the Dataset's [n, F] binned matrix and the
# VecchiaGP closures, so a CV/tuning sweep over many folds must not retain
# them all for the process lifetime.
from collections import OrderedDict

_FUSED_RUNNERS: "OrderedDict" = OrderedDict()
_FUSED_RUNNERS_MAX = 8


def _fns_for(booster):
    """(vg_fn, aux_fn, kernel dtype) for the fused loop's per-round refit:
    Gaussian = (Pallas/XLA value+grad, Psi^-1-solve); non-Gaussian =
    (iterative Laplace value+grad, dNLL/dF) from ``vecchia_fit.ng_device_vg``
    — both cached on the VecchiaGP so ids are stable for the runner cache."""
    gp = booster.gp_model
    if gp.spec.is_gaussian:
        return _vg_psi_for(gp._approx, gp.dtype)
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.models import vecchia_fit
    fam = lk.get_family(gp.likelihood)
    init_cov = (gp.cov_pars_ if gp.cov_pars_ is not None
                else gp.optim_cfg.init_cov_pars)
    if init_cov is None:
        init_cov = gp._default_init_cov_pars(
            np.asarray(booster.train_set.label, np.float64))
    n_cov = len(init_cov)
    aux_fixed = getattr(gp, "aux_pars_", None)
    if aux_fixed is None:
        aux_fixed = fam.default_aux_pars(
            getattr(gp, "likelihood_additional_param", None))
    vg, grad_F = vecchia_fit.ng_device_vg(gp, n_cov, 0, aux_fixed, fam)
    return vg, grad_F, gp.dtype


def _runner_key(booster, R: int):
    ds = booster.train_set
    gp = booster.gp_model
    grower = booster.grower
    cfg = gp.optim_cfg
    vg_fn, psi_fn, kdt = _fns_for(booster)
    efb = getattr(ds, "efb", None)
    return (id(vg_fn), id(psi_fn), id(ds.binned), R,
            2 * grower.num_leaves - 1, int(ds.max_num_bins), ds.num_data,
            float(booster.learning_rate), int(cfg.maxit),
            float(cfg.delta_rel_conv), str(kdt), grower.num_leaves,
            grower.max_depth, grower.lambda_l1, grower.lambda_l2,
            grower.min_data_in_leaf, grower.min_sum_hessian_in_leaf,
            grower.min_gain_to_split, grower.path_smooth,
            grower.max_delta_step, bool(ds.categorical_feature),
            efb is not None, bool(np.any(ds.has_nan)),
            grower.cat_l2, grower.cat_smooth, grower.min_data_per_group,
            grower.max_cat_to_onehot,
            int(booster.params.get("max_cat_threshold", 32)),
            None if grower.feature_contri is None
            else tuple(np.asarray(grower.feature_contri).tolist()),
            None if booster._monotone is None
            else tuple(np.asarray(booster._monotone).tolist()),
            grower.monotone_constraints_method, grower.monotone_penalty,
            str(getattr(booster, "_forced_splits", None)),
            str(booster._interaction_constraints))


def train_device(booster, num_boost_round: int) -> None:
    """Run ``num_boost_round`` GPBoost iterations as ONE device program and
    materialize the resulting trees / scores / GP state on the booster.

    Only mutates the booster after the fused program and its single fetch
    complete, so a failure leaves the booster untrainable-state-free (the
    caller can fall back to the host loop).
    """
    from gpboost_tpu.boosting.tree import Tree, _grow_tree_jit
    from gpboost_tpu.models.optimizers import lbfgs_loop

    ds = booster.train_set
    gp = booster.gp_model
    vec = gp._approx
    obj = booster.objective
    grower = booster.grower
    n = ds.num_data
    R = int(num_boost_round)
    lr = float(booster.learning_rate)
    M = 2 * grower.num_leaves - 1
    B = int(ds.max_num_bins)

    is_gaussian = gp.spec.is_gaussian
    vg_fn, aux_fn, kdt = _fns_for(booster)
    cfg = gp.optim_cfg
    y64 = np.asarray(ds.label, np.float64)
    resid0 = y64 - booster._score[:n]
    if gp.cov_pars_ is not None:
        init = np.asarray(gp.cov_pars_, np.float64)
    elif cfg.init_cov_pars is not None:
        init = np.asarray(cfg.init_cov_pars, np.float64)
    else:
        init = np.asarray(gp._default_init_cov_pars(
            resid0 if is_gaussian else y64), np.float64)
    theta0 = jnp.asarray(np.log(np.maximum(init, 1e-300)), kdt)
    maxit, ftol = int(cfg.maxit), float(cfg.delta_rel_conv)

    binned = ds.binned
    neighbors = vec.neighbors
    num_bins_np = np.asarray(getattr(ds, "num_bins_grower", ds.num_bins))
    num_bins = jnp.asarray(num_bins_np)
    efb = getattr(ds, "efb", None)
    efb_maps = (None if efb is None else
                (efb.src_col, efb.src_bin, efb.default_bin, efb.fix_mask))
    hist_B = 0 if efb is None else int(efb.max_bins_hist)
    hist_binned = None if efb is None else efb.binned_hist
    nan_mask = ds.has_nan if bool(np.any(ds.has_nan)) else None
    nan_mask_j = None if nan_mask is None else jnp.asarray(nan_mask)
    has_cat = bool(ds.categorical_feature)
    cat_mask_j = None
    if has_cat:
        cm = np.zeros(int(binned.shape[1]), bool)
        cm[list(ds.categorical_feature)] = True
        cat_mask_j = jnp.asarray(cm)
    gain_mult = (None if grower.feature_contri is None
                 else jnp.asarray(grower.feature_contri))
    row_mask = jnp.ones(n, bool)
    ones_h = jnp.ones(n, jnp.float32)
    from gpboost_tpu.boosting.tree import flatten_forced_splits
    ic = booster._interaction_constraints
    ic_groups = None
    if ic:
        F_feat = int(binned.shape[1])
        ic_np = np.zeros((len(ic), F_feat), bool)
        for gi, grp in enumerate(ic):
            for f in grp:
                if int(f) < F_feat:
                    ic_np[gi, int(f)] = True
        ic_groups = jnp.asarray(ic_np)
    mono = booster._monotone
    mono_kwargs = {}
    if mono is not None and bool(np.any(np.asarray(mono) != 0)):
        mono_kwargs = dict(
            mono_vec=jnp.asarray(mono, jnp.int32),
            mono_intermediate=(grower.monotone_constraints_method
                               in ("intermediate", "advanced")),
            mono_penalty=float(grower.monotone_penalty))
    grow_kwargs = dict(
        ic_groups=ic_groups,
        forced_ops=flatten_forced_splits(
            getattr(booster, "_forced_splits", None), grower.num_leaves),
        **mono_kwargs,
        nan_mask=nan_mask_j, efb_maps=efb_maps, hist_B=hist_B,
        hist_binned=hist_binned, gain_mult=gain_mult,
        path_smooth=grower.path_smooth,
        use_smoothing=grower.path_smooth > 0.0,
        mds=float(grower.max_delta_step),
        use_bounds=grower.max_delta_step > 0.0,
        cat_feature_mask=cat_mask_j,
        max_cat_threshold=int(booster.params.get("max_cat_threshold", 32)),
        cat_l2=float(grower.cat_l2), cat_smooth=float(grower.cat_smooth),
        min_data_per_group=float(grower.min_data_per_group),
        max_cat_to_onehot=int(grower.max_cat_to_onehot))

    def refit(th, y, F):
        """One covariance refit at the current score + the tree gradient.

        Gaussian: L-BFGS over the Vecchia NLL of the residual, with the
        pseudo-gradient solve Psi^-1 r fused as the loop's final_fn; the
        objective gradient is -Psi^-1 (y - F).
        Non-Gaussian (LaGaBoost): L-BFGS over the iterative Laplace NLL at
        fixed effects F (mode finding inside, custom-VJP Newton-CG), with
        dNLL/dF fused as final_fn — the reference's mode-Newton +
        Laplace-gradient flow (likelihoods.h:1843,
        regression_objective.hpp:173-186) in ONE traced program.

        NOTE: each per-round refit restarts L-BFGS curvature memory,
        matching the TPU product path (lbfgs_device is also memory-less).
        The host CPU loop with reuse_learning_rates_gp_model keeps (s, y)
        memory across refits (lbfgs_host + cfg.lbfgs_reuse_mem), so a
        CPU-forced fused run follows a slightly different refit trajectory
        than the host loop — a documented divergence (ADVICE r4 #3); both
        converge to the same optima and the parity tests compare the fused
        loop against stepwise execution of the same primitives.
        """
        if is_gaussian:
            resid = (y - F).astype(kdt)
            th, v, k, aux = lbfgs_loop(vg_fn, maxit, ftol, kdt, aux_fn,
                                       th, resid, neighbors)
            return th, v, k, (-aux).astype(jnp.float32)
        th, v, k, gF = lbfgs_loop(vg_fn, maxit, ftol, kdt, aux_fn,
                                  th, y.astype(kdt), F.astype(kdt))
        return th, v, k, gF.astype(jnp.float32)

    def one_round(i, carry):
        F, th, y, st = carry
        th, v, k, g = refit(th, y, F)
        out = _grow_tree_jit(
            binned, num_bins, g, ones_h, B, int(grower.num_leaves),
            int(grower.max_depth), row_mask, grower.lambda_l1,
            grower.lambda_l2, float(grower.min_data_in_leaf),
            grower.min_sum_hessian_in_leaf, grower.min_gain_to_split,
            **grow_kwargs)
        (feature, thresh, left, right, leaf_value, is_leaf, cnt, depth,
         num_leaves, dleft, sgain, iscat, catmask, row_leaf) = out
        F = F + (lr * leaf_value)[row_leaf].astype(F.dtype)
        st = dict(
            feature=st["feature"].at[i].set(feature),
            thresh=st["thresh"].at[i].set(thresh),
            left=st["left"].at[i].set(left),
            right=st["right"].at[i].set(right),
            leaf=st["leaf"].at[i].set(leaf_value),
            is_leaf=st["is_leaf"].at[i].set(is_leaf),
            cnt=st["cnt"].at[i].set(cnt),
            dleft=st["dleft"].at[i].set(dleft),
            sgain=st["sgain"].at[i].set(sgain),
            nl=st["nl"].at[i].set(num_leaves),
            md=st["md"].at[i].set(jnp.max(depth)),
            iscat=st["iscat"].at[i].set(iscat),
            catmask=st["catmask"].at[i].set(catmask),
            nll=st["nll"].at[i].set(v.astype(jnp.float64)),
            its=st["its"].at[i].set(k))
        return F, th, y, st

    # compiled-runner reuse across train calls on the same model + data
    # (id(vg_fn) pins the VecchiaGP instance, id(binned) the Dataset)
    key = _runner_key(booster, R)
    hit = _FUSED_RUNNERS.get(key)
    if hit is not None:
        run = hit[-1]
        _FUSED_RUNNERS.move_to_end(key)
    else:
        @jax.jit
        def run(F0, th0, y):
            zi = jnp.zeros((R, M), jnp.int32)
            zf = jnp.zeros((R, M), jnp.float32)
            st = dict(feature=zi, thresh=zi, left=zi, right=zi,
                      leaf=zf, sgain=zf, cnt=zf,
                      is_leaf=jnp.zeros((R, M), bool),
                      dleft=jnp.zeros((R, M), bool),
                      nl=jnp.zeros(R, jnp.int32), md=jnp.zeros(R, jnp.int32),
                      iscat=jnp.zeros((R, M), bool),
                      catmask=jnp.zeros((R, M, B), bool),
                      nll=jnp.zeros(R, jnp.float64),
                      its=jnp.zeros(R, jnp.int32))
            F, th, y, st = jax.lax.fori_loop(0, R, one_round,
                                             (F0, th0, y, st))
            return F, th, st

        # strong refs keep the id() keys valid
        _FUSED_RUNNERS[key] = (vg_fn, aux_fn, binned, run)
        while len(_FUSED_RUNNERS) > _FUSED_RUNNERS_MAX:
            _FUSED_RUNNERS.popitem(last=False)

    import time as _time
    F0 = jnp.asarray(booster._score[:n], jnp.float64)
    t0 = _time.time()
    F_dev, th_dev, st_dev = run(F0, theta0, jnp.asarray(y64))
    jax.block_until_ready(F_dev)
    t_run = _time.time() - t0
    # a cache-missed first call spends most of t_run on trace + compile
    # (-cache-load), not device execution — label it so observability
    # doesn't claim compile time as device time
    includes_compile = hit is None
    # ONE fetch for the whole training run
    F, theta, st = jax.device_get((F_dev, th_dev, st_dev))

    trees = []
    for r in range(R):
        tree = Tree(
            split_feature=np.asarray(st["feature"][r]),
            threshold=np.zeros(M),
            threshold_bin=np.asarray(st["thresh"][r]),
            left=np.asarray(st["left"][r]),
            right=np.asarray(st["right"][r]),
            leaf_value=np.asarray(st["leaf"][r], np.float64),
            is_leaf=np.asarray(st["is_leaf"][r]),
            node_count=np.asarray(st["cnt"][r], np.float64),
            is_categorical=np.asarray(st["iscat"][r]),
            cat_mask=np.asarray(st["catmask"][r]),
            split_gain=np.asarray(st["sgain"][r], np.float64),
            default_left=np.asarray(st["dleft"][r]),
            num_leaves=int(st["nl"][r]),
            max_depth_used=int(max(st["md"][r], 1)))
        for node in tree.internal_nodes():
            if tree.is_categorical[node]:
                continue
            tree.threshold[node] = ds.threshold_value(
                int(tree.split_feature[node]),
                int(tree.threshold_bin[node]))
        tree.add_shrinkage(lr)
        trees.append(tree)

    booster.trees = trees
    booster._score[:n] = F
    # trailing end-of-iteration refit at the final score through the normal
    # host path (gbdt.cpp:536-542): materializes gp.data / current_nll_ /
    # _fit_result and primes the objective's gradient cache, exactly as the
    # host loop leaves them
    gp.cov_pars_ = np.exp(np.asarray(theta, np.float64))
    obj.get_gradients(booster._score)
    # per-round observability (the host loop's per-iteration logs/metrics
    # don't exist inside the fused program): covariance NLL after each
    # round's refit + the L-BFGS iteration counts
    booster.device_training_info_ = {
        "cov_nll": np.asarray(st["nll"], np.float64),
        "refit_iterations": np.asarray(st["its"], np.int64),
        "device_seconds": float(t_run),
        "includes_compile": includes_compile}
    timing = (f"{t_run:.2f}s incl. trace+compile" if includes_compile
              else f"{t_run:.2f}s on device")
    log_info(f"[device_loop] {R} GPBoost rounds in one device dispatch "
             f"({timing}, {int(np.sum(st['its']))} refit iterations)")
