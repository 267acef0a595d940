"""Booster: the gradient-boosting driver (GBDT core).

TPU-native equivalent of the reference's ``GBDT`` engine
(``src/LightGBM/boosting/gbdt.cpp``): ``TrainOneIter`` (:404) becomes
``update()`` — gradients from the objective (including the GPBoost coupling),
optional bagging, leaf-wise tree growth on device kernels, optional GPBoost
Newton leaf re-solve (:463-473), shrinkage, score update — and the ``Booster``
public class mirrors ``gpboost.Booster`` (``basic.py:2323``): train/eval/
predict/save, ``gp_model`` attachment and combined prediction
(``basic.py:3560-3650``).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.boosting import metrics as metrics_mod
from gpboost_tpu.boosting.dataset import Dataset
from gpboost_tpu.boosting.objectives import GPBoostObjective, create_objective
from gpboost_tpu.boosting.tree import (CEGBState, GrowerParams, Tree,
                                       fit_linear_leaves,
                                       grow_tree, predict_tree_binned,
                                       predict_tree_binned_mixed,
                                       predict_tree_linear,
                                       predict_tree_mixed, predict_tree_raw)


def nesterov_schedule(it: int, version: int, rate: float, offset: int):
    """Momentum schedule for Nesterov-accelerated boosting
    (``REModelTemplate::NesterovSchedule``, re_model_template.h:5643)."""
    if it < offset:
        return 0.0
    if version == 0:
        return rate
    if version == 1:
        return 1.0 - 3.0 / (6.0 + it)
    raise ValueError(
        f"momentum_schedule_version = {version} is not supported")


def _parse_params(params: dict):
    """Canonicalize + validate via the central registry
    (``gpboost_tpu.config``, the reference's ``Config::KeyAliasTransform``
    + ``parameter_generator.py`` schema)."""
    from gpboost_tpu import config as cfg_mod
    return cfg_mod.resolve_params(params)


class Booster:
    """Gradient-boosting model, optionally combined with a GPModel."""

    def __init__(self, params: Optional[dict] = None,
                 train_set: Optional[Dataset] = None,
                 model_file: Optional[str] = None, model_str: Optional[str] = None,
                 gp_model=None):
        if model_file is not None:
            with open(model_file) as f:
                content = f.read()
            self._load_model_content(content)
            return
        if model_str is not None:
            self._load_model_content(model_str)
            return
        assert train_set is not None
        self.params = _parse_params(params)
        self.train_set = train_set
        self.gp_model = gp_model
        p = self.params
        self.objective_name = p.get("objective", "regression")
        self.num_class = int(p.get("num_class", 1))
        self.objective = create_objective(
            self.objective_name, p, gp_model=gp_model)
        self.objective.init(train_set.label, train_set.weight,
                    group=train_set.group)
        self.learning_rate = float(p.get("learning_rate", 0.1))
        self.grower = GrowerParams(
            num_leaves=int(p.get("num_leaves", 31)),
            max_depth=int(p.get("max_depth", -1)),
            min_data_in_leaf=int(p.get("min_data_in_leaf", 20)),
            min_sum_hessian_in_leaf=float(p.get("min_sum_hessian_in_leaf", 1e-3)),
            lambda_l1=float(p.get("lambda_l1", 0.0)),
            lambda_l2=float(p.get("lambda_l2", 0.0)),
            min_gain_to_split=float(p.get("min_gain_to_split", 0.0)),
            path_smooth=float(p.get("path_smooth", 0.0)),
            extra_trees=bool(p.get("extra_trees", False)),
            feature_fraction_bynode=float(
                p.get("feature_fraction_bynode", 1.0)),
            monotone_constraints_method=str(
                p.get("monotone_constraints_method", "basic")),
            monotone_penalty=float(p.get("monotone_penalty", 0.0)),
            cat_l2=float(p.get("cat_l2", 10.0)),
            cat_smooth=float(p.get("cat_smooth", 10.0)),
            min_data_per_group=float(p.get("min_data_per_group", 100)),
            max_cat_to_onehot=int(p.get("max_cat_to_onehot", 4)),
            max_delta_step=float(p.get("max_delta_step", 0.0)),
            feature_contri=(None if p.get("feature_contri") is None else
                            np.asarray(p["feature_contri"], np.float64)))
        ic = p.get("interaction_constraints", None)
        if isinstance(ic, str) and ic:
            import ast
            ic = ast.literal_eval(ic)
        self._interaction_constraints = ic if ic else None
        self.boosting_type = p.get("boosting", p.get("boosting_type", "gbdt"))
        # DART settings (reference src/LightGBM/boosting/dart.hpp)
        self.drop_rate = float(p.get("drop_rate", 0.1))
        self.max_drop = int(p.get("max_drop", 50))
        self.skip_drop = float(p.get("skip_drop", 0.5))
        self.uniform_drop = bool(p.get("uniform_drop", False))
        self.xgboost_dart_mode = bool(p.get("xgboost_dart_mode", False))
        self._dart_rng = np.random.default_rng(int(p.get("drop_seed", 4)))
        self._tree_weights: List[float] = []
        # voting-parallel learner (PV-Tree): local top-k feature vote
        # (voting_parallel_tree_learner.cpp, config.h ``top_k``)
        self.top_k = int(p.get("top_k", p.get("topk", 20)))
        # GOSS settings (goss.hpp)
        self.top_rate = float(p.get("top_rate", 0.2))
        self.other_rate = float(p.get("other_rate", 0.1))
        self.bagging_fraction = float(p.get("bagging_fraction", 1.0))
        self.bagging_freq = int(p.get("bagging_freq", 0))
        self.pos_bagging_fraction = float(p.get("pos_bagging_fraction", 1.0))
        self.neg_bagging_fraction = float(p.get("neg_bagging_fraction", 1.0))
        self._bag_mask = None  # reused between re-bagging iterations
        self.feature_fraction = float(p.get("feature_fraction", 1.0))
        # Nesterov-accelerated boosting (nesterov_boosting.h:20, gbdt.cpp:414)
        self.use_nesterov_acc = bool(p.get("use_nesterov_acc", False))
        self.nesterov_acc_rate = float(p.get("nesterov_acc_rate", 0.5))
        self.momentum_offset = int(p.get("momentum_offset", 0))
        self.momentum_schedule_version = int(
            p.get("momentum_schedule_version", 1))
        self._score_lag1 = None
        self._valid_lag1: List[np.ndarray] = []
        if self.boosting_type == "rf":
            if not (self.bagging_freq > 0 and self.bagging_fraction < 1.0):
                self.bagging_freq = 1
                self.bagging_fraction = min(self.bagging_fraction, 0.632)
        fsp = p.get("forced_splits", None)
        fname = p.get("forcedsplits_filename", "")
        if fsp is None and fname:
            with open(fname) as fh:
                fsp = json.load(fh)
        self._forced_splits = self._resolve_forced(fsp) if fsp else None
        mono = p.get("monotone_constraints", None)
        if mono is not None:
            if isinstance(mono, str):
                mono = [int(v) for v in mono.strip("()[] ").split(",")]
            self._monotone = np.asarray(mono, dtype=np.int32)
        else:
            self._monotone = None
        self.use_gp_model_for_validation = bool(
            p.get("use_gp_model_for_validation", True))
        self.leaves_newton_update = bool(p.get("leaves_newton_update", False))
        self.line_search_step_length = bool(
            p.get("line_search_step_length", False))
        self.linear_tree = bool(p.get("linear_tree", False))
        self.linear_lambda = float(p.get("linear_lambda", 0.0))
        self._cegb = CEGBState.from_params(
            p, train_set.num_features, train_set.num_data)
        self._rng = np.random.default_rng(int(p.get("seed", 0)))
        # dedicated RNG streams when their seeds are given explicitly
        # (config.h bagging_seed / feature_fraction_seed; the single 'seed'
        # stream remains the default so existing runs are unchanged)
        self._bag_rng = (np.random.default_rng(int(p["bagging_seed"]))
                         if "bagging_seed" in p else self._rng)
        self._ff_rng = (np.random.default_rng(int(p["feature_fraction_seed"]))
                        if "feature_fraction_seed" in p else self._rng)
        self._extra_rng = (np.random.default_rng(int(p["extra_seed"]))
                           if "extra_seed" in p else self._rng)

        self.trees: List[Tree] = []
        n = train_set.num_data
        self.num_models = max(
            1, getattr(self.objective, "num_model_per_iteration", 1))
        self.init_score = np.zeros(self.num_models)
        if train_set.init_score is not None:
            self._score = np.tile(train_set.init_score, self.num_models).astype(np.float64)
            self._has_init_score = True
        else:
            self._score = np.zeros(n * self.num_models)
            self._has_init_score = False
            if bool(p.get("boost_from_average", True)):
                self.init_score = np.asarray(self.objective.init_scores(),
                                             dtype=np.float64)
                for m in range(self.num_models):
                    self._score[m * n:(m + 1) * n] += self.init_score[m]
        self.best_iteration = -1
        self.valid_sets: List[Dataset] = []
        self.valid_names: List[str] = []
        self._valid_scores: List[np.ndarray] = []
        metric = p.get("metric", None)
        if metric in (None, "", "auto"):
            metric = metrics_mod.default_metric_for(self.objective_name)
        self.metric_names = ([metric] if isinstance(metric, str)
                             else list(metric))

    def _resolve_forced(self, node):
        """Resolve raw thresholds of a forced-splits JSON tree to bins
        (``forcedsplits_filename``, config.h:512)."""
        out = {"feature": int(node["feature"]),
               "threshold_bin": self.train_set.bin_for_threshold(
                   int(node["feature"]), float(node["threshold"]))}
        if isinstance(node.get("left"), dict):
            out["left"] = self._resolve_forced(node["left"])
        if isinstance(node.get("right"), dict):
            out["right"] = self._resolve_forced(node["right"])
        return out

    # ------------------------------------------------------------------
    def add_valid(self, data: Dataset, name: str):
        self.valid_sets.append(data)
        self.valid_names.append(name)
        score = np.zeros(data.num_data * self.num_models)
        for m in range(self.num_models):
            score[m * data.num_data:(m + 1) * data.num_data] += self.init_score[m]
        for k, tree in enumerate(self.trees):
            vals, _ = self._tree_raw_pred(
                tree, jnp.asarray(data.raw_data),
                jnp.asarray(self._cat_bins_matrix(data.raw_data)))
            mslice = k % self.num_models
            score[mslice * data.num_data:(mslice + 1) * data.num_data] += np.asarray(vals)
        self._valid_scores.append(score)
        return self

    @property
    def num_trees_per_iter(self):
        return self.num_models

    def current_iteration(self):
        return len(self.trees) // self.num_models

    # ------------------------------------------------------------------
    @staticmethod
    def _tree_has_cat(tree: Tree) -> bool:
        return (tree.is_categorical is not None
                and bool(np.any(tree.is_categorical)))

    def _tree_train_pred(self, tree: Tree) -> np.ndarray:
        if tree.lin_features is not None:
            vals, _ = self._tree_raw_pred(
                tree, jnp.asarray(self.train_set.raw_data),
                jnp.asarray(self._cat_bins_matrix(self.train_set.raw_data)))
            return np.asarray(vals)
        # FIXED static depth bound: per-tree max_depth_used varies and a
        # static argnum would recompile for every new depth (each compile
        # costs seconds over a TPU tunnel); leaf nodes self-loop so extra
        # traversal steps are no-ops
        depth_bound = self._depth_bound()
        dl = (None if tree.default_left is None
              else jnp.asarray(tree.default_left))
        if self._tree_has_cat(tree):
            vals, _ = predict_tree_binned_mixed(
                self.train_set.binned, jnp.asarray(tree.split_feature),
                jnp.asarray(tree.threshold_bin),
                jnp.asarray(tree.is_categorical), jnp.asarray(tree.cat_mask),
                jnp.asarray(tree.left), jnp.asarray(tree.right),
                depth_bound, jnp.asarray(tree.leaf_value), default_left=dl)
        else:
            dev = getattr(tree, "_dev", None)
            if dev is not None:
                # structure arrays still device-resident from the grower
                vals, _ = predict_tree_binned(
                    self.train_set.binned, dev["feature"], dev["thresh"],
                    dev["left"], dev["right"], depth_bound,
                    jnp.asarray(tree.leaf_value),
                    default_left=dev.get("dleft"))
            else:
                vals, _ = predict_tree_binned(
                    self.train_set.binned, jnp.asarray(tree.split_feature),
                    jnp.asarray(tree.threshold_bin), jnp.asarray(tree.left),
                    jnp.asarray(tree.right), depth_bound,
                    jnp.asarray(tree.leaf_value), default_left=dl)
        # [:num_data] drops mesh-padding rows (no-op otherwise)
        return np.asarray(vals)[:self.train_set.num_data]

    def _depth_bound(self) -> int:
        """Static traversal depth for jitted per-tree prediction: a single
        value per booster so every tree shares one compiled program."""
        grower = getattr(self, "grower", None)
        if grower is not None:
            if grower.max_depth and grower.max_depth > 0:
                return int(grower.max_depth) + 1
            return int(grower.num_leaves) + 1
        # loaded model: one bound over all trees
        return max((int(t.max_depth_used) for t in self.trees),
                   default=1) + 1

    def _cat_bins_matrix(self, data: np.ndarray) -> np.ndarray:
        """[n, F] category-bin matrix for raw prediction data (0 for
        non-categorical columns)."""
        n, F = data.shape
        out = np.zeros((n, F), dtype=np.int32)
        cat_maps = getattr(self, "_cat_maps", None)
        if cat_maps is None and self.train_set is not None:
            cat_maps = self.train_set.cat_maps
        for f, lookup in (cat_maps or {}).items():
            f = int(f)
            out[:, f] = np.asarray(
                [lookup.get(v, 0) for v in data[:, f]], dtype=np.int32)
        return out

    def _tree_raw_pred(self, tree: Tree, Xj, cat_bins_j):
        dl = (None if tree.default_left is None
              else jnp.asarray(tree.default_left))
        if tree.lin_features is not None:
            M = len(tree.is_leaf)
            B = (tree.cat_mask.shape[1] if tree.cat_mask is not None else 1)
            return predict_tree_linear(
                Xj, cat_bins_j, jnp.asarray(tree.split_feature),
                jnp.asarray(tree.threshold),
                jnp.asarray(tree.is_categorical if tree.is_categorical
                            is not None else np.zeros(M, bool)),
                jnp.asarray(tree.cat_mask if tree.cat_mask is not None
                            else np.zeros((M, 1), bool)),
                jnp.asarray(tree.left), jnp.asarray(tree.right),
                self._depth_bound(), jnp.asarray(tree.leaf_value),
                jnp.asarray(tree.lin_features), jnp.asarray(tree.lin_coefs),
                default_left=dl)
        if self._tree_has_cat(tree):
            return predict_tree_mixed(
                Xj, cat_bins_j, jnp.asarray(tree.split_feature),
                jnp.asarray(tree.threshold), jnp.asarray(tree.is_categorical),
                jnp.asarray(tree.cat_mask), jnp.asarray(tree.left),
                jnp.asarray(tree.right), self._depth_bound(),
                jnp.asarray(tree.leaf_value), default_left=dl)
        return predict_tree_raw(
            Xj, jnp.asarray(tree.split_feature), jnp.asarray(tree.threshold),
            jnp.asarray(tree.left), jnp.asarray(tree.right),
            jnp.asarray(tree.leaf_value), self._depth_bound(),
            default_left=dl)

    def _dart_drop(self):
        """Select and temporarily remove dropped trees from the train score
        (``DART::DroppingTrees``, dart.hpp:97-147). Returns drop indices."""
        it = self.current_iteration()
        drop = []
        if it > 0 and self._dart_rng.random() >= self.skip_drop:
            drop_rate = self.drop_rate
            if self.uniform_drop:
                if self.max_drop > 0:
                    drop_rate = min(drop_rate, self.max_drop / max(it, 1))
                for i in range(it):
                    if self._dart_rng.random() < drop_rate:
                        drop.append(i)
                        if len(drop) >= self.max_drop:
                            break
            else:
                sum_w = sum(self._tree_weights) or 1.0
                inv_avg = len(self._tree_weights) / sum_w
                if self.max_drop > 0:
                    drop_rate = min(drop_rate,
                                    self.max_drop * inv_avg / sum_w)
                for i in range(it):
                    if self._dart_rng.random() < (
                            drop_rate * self._tree_weights[i] * inv_avg):
                        drop.append(i)
                        if len(drop) >= self.max_drop:
                            break
        n = self.train_set.num_data
        for i in drop:
            self._score[:n] -= self._tree_train_pred(self.trees[i])
        return drop

    def _dart_normalize(self, drop):
        """Scale dropped trees by k/(k+1) and restore scores
        (``DART::Normalize``, dart.hpp:158-200, non-xgboost mode)."""
        k = float(len(drop))
        n = self.train_set.num_data
        for i in drop:
            tree = self.trees[i]
            factor = k / (k + 1.0)
            # valid scores see the delta (factor - 1) * old_pred
            for vi, vset in enumerate(self.valid_sets):
                vvals, _ = self._tree_raw_pred(
                    tree, jnp.asarray(vset.raw_data),
                    jnp.asarray(self._cat_bins_matrix(vset.raw_data)))
                self._valid_scores[vi] += (factor - 1.0) * np.asarray(vvals)
            tree.leaf_value = tree.leaf_value * factor
            tree.shrinkage *= factor
            # train score: add back the rescaled tree
            self._score[:n] += self._tree_train_pred(tree)
            self._tree_weights[i] *= factor

    def update(self, train_set=None, fobj=None):
        """One boosting iteration (``GBDT::TrainOneIter``, gbdt.cpp:404)."""
        ds = self.train_set
        n = ds.num_data
        dart_drop = None
        if self.boosting_type == "dart":
            dart_drop = self._dart_drop()
        if self.use_nesterov_acc and self.boosting_type == "gbdt":
            # momentum step BEFORE the gradient computation so gradients are
            # taken at the momentum-shifted score (gbdt.cpp:414-419)
            if self._score_lag1 is None:
                self._score_lag1 = self._score.copy()
            while len(self._valid_lag1) < len(self._valid_scores):
                self._valid_lag1.append(
                    self._valid_scores[len(self._valid_lag1)].copy())
            mu = nesterov_schedule(
                self.current_iteration(), self.momentum_schedule_version,
                self.nesterov_acc_rate, self.momentum_offset)
            for arr, lag in ([(self._score, self._score_lag1)]
                             + list(zip(self._valid_scores,
                                        self._valid_lag1))):
                momentum = (mu + 1.0) * arr - mu * lag
                lag[:] = arr
                arr[:] = momentum
        if self.boosting_type == "rf":
            # RF: gradients always at the constant init score (rf.hpp)
            base = np.repeat(self.init_score, n)
            score_for_grad = base
        else:
            score_for_grad = self._score
        if fobj is not None:
            grad, hess = fobj(score_for_grad, ds)
            grad = np.asarray(grad, dtype=np.float64)
            hess = np.asarray(hess, dtype=np.float64)
        else:
            grad, hess = self.objective.get_gradients(score_for_grad)
            grad = np.asarray(grad, dtype=np.float64)
            hess = np.asarray(hess, dtype=np.float64)

        it = self.current_iteration()
        # bagging (gbdt.cpp:255)
        row_mask = None
        if self.boosting_type == "goss":
            # gradient one-side sampling (goss.hpp:108-150)
            if it >= int(1.0 / max(self.learning_rate, 1e-10)):
                g_abs = np.abs(grad[:n]) * np.sqrt(np.maximum(hess[:n], 0))
                top_k = max(1, int(self.top_rate * n))
                other_k = max(1, int(self.other_rate * n))
                order = np.argsort(-g_abs)
                top_idx = order[:top_k]
                rest = order[top_k:]
                sampled = self._rng.choice(rest, size=min(other_k, len(rest)),
                                           replace=False)
                keep = np.zeros(n, dtype=bool)
                keep[top_idx] = True
                keep[sampled] = True
                mult = (n - top_k) / max(other_k, 1)
                grad = grad.copy()
                hess = hess.copy()
                grad[sampled] *= mult
                hess[sampled] *= mult
                row_mask = jnp.asarray(keep)
        elif self.bagging_freq > 0 and (
                self.bagging_fraction < 1.0
                or self.pos_bagging_fraction < 1.0
                or self.neg_bagging_fraction < 1.0):
            # re-bag every bagging_freq iterations, REUSE the bag in between
            # (GBDT::Bagging, gbdt.cpp:255); pos/neg_bagging_fraction sample
            # the classes separately (BalancedBaggingHelper, gbdt.cpp:225)
            if self._bag_mask is None or it % self.bagging_freq == 0:
                if (self.pos_bagging_fraction < 1.0
                        or self.neg_bagging_fraction < 1.0):
                    u = self._bag_rng.random(n)
                    is_pos = np.asarray(self.train_set.label) > 0
                    keep = np.where(is_pos, u < self.pos_bagging_fraction,
                                    u < self.neg_bagging_fraction)
                else:
                    keep = self._bag_rng.random(n) < self.bagging_fraction
                self._bag_mask = jnp.asarray(keep)
            row_mask = self._bag_mask
        # padded mesh-sharded binned layout: rows beyond num_data are
        # padding — mask them out of every histogram
        n_rows = int(ds.binned.shape[0])
        if n_rows != n:
            if self._cegb is not None:
                raise NotImplementedError(
                    "CEGB is not supported with a mesh-sharded dataset")
            if row_mask is None:
                row_mask = jnp.ones(n, dtype=bool)
            row_mask = jnp.concatenate(
                [row_mask, jnp.zeros(n_rows - n, dtype=bool)])
        # feature subsampling per tree (num_bins_grower is feature-padded
        # under a feature-parallel mesh layout; pads have 0 bins)
        num_bins = np.asarray(getattr(ds, "num_bins_grower", ds.num_bins))
        n_feat_grower = int(ds.binned.shape[1])
        if self.feature_fraction < 1.0:
            F = ds.num_features
            k = max(1, int(np.ceil(self.feature_fraction * F)))
            chosen = self._ff_rng.choice(F, size=k, replace=False)
            mask = np.zeros(len(num_bins), dtype=bool)
            mask[chosen] = True
            num_bins = np.where(mask, num_bins, 0)

        for m in range(self.num_models):
            g = grad[m * n:(m + 1) * n]
            h = hess[m * n:(m + 1) * n]
            if n_rows != n:
                g = np.concatenate([g, np.zeros(n_rows - n)])
                h = np.concatenate([h, np.zeros(n_rows - n)])
            cat_mask_arr = None
            if ds.categorical_feature:
                cat_mask_arr = np.zeros(n_feat_grower, dtype=bool)
                cat_mask_arr[list(ds.categorical_feature)] = True
            # voting-parallel learner (PV-Tree, tree_learner='voting'): only
            # meaningful under an active mesh — the vote decides which
            # features' histograms cross ICI (parallel/mesh.py
            # make_voting_context); single-device it degenerates to serial
            voting_ctx = None
            mesh_v = getattr(ds, "_shard_mesh", None)
            if ds.tree_learner == "voting" and mesh_v is not None:
                if cat_mask_arr is not None:
                    raise NotImplementedError(
                        "tree_learner='voting' does not support categorical "
                        "features")
                key = num_bins.tobytes()
                if getattr(self, "_voting_key", None) != key:
                    from gpboost_tpu.parallel.mesh import make_voting_context
                    self._voting_ctx = make_voting_context(
                        mesh_v, ds.max_num_bins, self.top_k, num_bins,
                        self.grower.lambda_l1, self.grower.lambda_l2,
                        float(self.grower.min_data_in_leaf),
                        self.grower.min_sum_hessian_in_leaf,
                        axis=ds._shard_axis)
                    self._voting_key = key
                voting_ctx = self._voting_ctx
            # single-dispatch jitted grower on accelerators (covers
            # categoricals, extra_trees, path_smooth, max_delta_step,
            # feature_fraction_bynode, interaction constraints, monotone
            # constraints, forced splits, CEGB); the host-driven grower
            # handles voting and the CEGB x extra_trees/ffb combination
            # (and stays the CPU default)
            force_fast = os.environ.get(
                "GPBOOST_TPU_FORCE_FAST_GROWER") == "1"
            use_fast = ((jax.default_backend() != "cpu" or force_fast)
                        and voting_ctx is None
                        and not (self._cegb is not None
                                 and (self.grower.extra_trees
                                      or self.grower.feature_fraction_bynode
                                      < 1.0)))
            nan_mask = ds.has_nan if bool(np.any(ds.has_nan)) else None
            if nan_mask is not None and len(nan_mask) != n_feat_grower:
                nan_mask = np.concatenate(
                    [nan_mask,
                     np.zeros(n_feat_grower - len(nan_mask), bool)])
            if use_fast:
                from gpboost_tpu.boosting.tree import grow_tree_fast
                # f32 histograms on accelerators (LightGBM's default hist
                # precision); f64 on TPU is emulated and dispatch-heavy
                tree, row_leaf = grow_tree_fast(
                    ds.binned, jnp.asarray(num_bins),
                    jnp.asarray(g, dtype=jnp.float32),
                    jnp.asarray(h, dtype=jnp.float32), ds.max_num_bins,
                    self.grower, row_mask=row_mask, nan_mask=nan_mask,
                    efb=getattr(ds, "efb", None),
                    categorical_mask=cat_mask_arr,
                    max_cat_threshold=int(
                        self.params.get("max_cat_threshold", 32)),
                    interaction_constraints=self._interaction_constraints,
                    rng=(self._extra_rng if self.grower.extra_trees
                         else self._rng),
                    monotone_constraints=self._monotone,
                    forced_splits=getattr(self, "_forced_splits", None),
                    cegb=self._cegb)
            else:
                tree, row_leaf = grow_tree(
                    ds.binned, jnp.asarray(num_bins), jnp.asarray(g),
                    jnp.asarray(h), ds.max_num_bins, self.grower,
                    row_mask=row_mask, categorical_mask=cat_mask_arr,
                    max_cat_threshold=int(
                        self.params.get("max_cat_threshold", 32)),
                    monotone_constraints=self._monotone,
                    forced_splits=getattr(self, "_forced_splits", None),
                    cegb=self._cegb, nan_mask=nan_mask,
                    voting_ctx=voting_ctx, efb=getattr(ds, "efb", None),
                    interaction_constraints=self._interaction_constraints,
                    rng=(self._extra_rng if self.grower.extra_trees
                         else self._rng))
            # real-valued thresholds for raw prediction
            for node in tree.internal_nodes():
                if tree.is_categorical is not None and tree.is_categorical[node]:
                    continue
                tree.threshold[node] = ds.threshold_value(
                    int(tree.split_feature[node]), int(tree.threshold_bin[node]))
            if self.linear_tree:
                fit_linear_leaves(tree, ds.raw_data,
                                  np.asarray(row_leaf)[:n], g[:n], h[:n],
                                  self.linear_lambda)
            # GPBoost Newton leaf re-solve (gbdt.cpp:463-473)
            if (self.leaves_newton_update
                    and isinstance(self.objective, GPBoostObjective)
                    and self.gp_model.spec.is_gaussian):
                self._newton_update_leaves(tree, row_leaf)
            if self.line_search_step_length and self.num_models == 1:
                self._line_search_scale(tree)
            if self.boosting_type == "dart":
                k = len(dart_drop)
                shrink = (self.learning_rate / (1.0 + k)
                          if not self.xgboost_dart_mode else
                          (self.learning_rate if k == 0 else
                           self.learning_rate / (self.learning_rate + k)))
                tree.add_shrinkage(shrink)
                self._tree_weights.append(shrink)
            elif self.boosting_type == "rf":
                pass  # no shrinkage; trees are averaged
            else:
                tree.add_shrinkage(self.learning_rate)
            self.trees.append(tree)
            if (row_mask is None and not self.linear_tree
                    and row_leaf is not None):
                # the grower's final row->leaf assignment IS the training
                # prediction (shrinkage/Newton updates edit leaf_value in
                # place before this point): a host gather replaces a full
                # device tree-traversal dispatch per tree
                vals = tree.leaf_value[np.asarray(row_leaf)[:n]]
            else:
                vals = self._tree_train_pred(tree)
            if self.boosting_type == "rf":
                t = self.current_iteration()
                if not hasattr(self, "_rf_tree_sum"):
                    self._rf_tree_sum = np.zeros_like(self._score)
                    self._rf_valid_sums = [np.zeros_like(s)
                                           for s in self._valid_scores]
                self._rf_tree_sum[m * n:(m + 1) * n] += vals
                base = self.init_score[0] if self.num_models == 1 else 0.0
                self._score = base + self._rf_tree_sum / t
            else:
                self._score[m * n:(m + 1) * n] += vals
            # update validation scores incrementally
            for vi, vset in enumerate(self.valid_sets):
                vvals, _ = self._tree_raw_pred(
                    tree, jnp.asarray(vset.raw_data),
                    jnp.asarray(self._cat_bins_matrix(vset.raw_data)))
                nv = vset.num_data
                if self.boosting_type == "rf":
                    t = self.current_iteration()
                    self._rf_valid_sums[vi][m * nv:(m + 1) * nv] += np.asarray(vvals)
                    base = self.init_score[0] if self.num_models == 1 else 0.0
                    self._valid_scores[vi] = base + self._rf_valid_sums[vi] / t
                else:
                    self._valid_scores[vi][m * nv:(m + 1) * nv] += np.asarray(vvals)
        if self.boosting_type == "dart" and dart_drop is not None:
            self._dart_normalize(dart_drop)
            # weight bookkeeping for the new tree happened at shrinkage time
        if (isinstance(self.objective, GPBoostObjective)
                and not (self.use_gp_model_for_validation
                         and self.use_nesterov_acc)):
            # end-of-iteration covariance refit at the UPDATED score
            # (gbdt.cpp:536-542 calls Boosting() again after UpdateScore):
            # get_cov_pars() / validation metrics reflect the post-iteration
            # residual, and the next iteration's refit warm-starts from an
            # already-converged point (cheap)
            self.objective.get_gradients(self._score)
        return False

    def _line_search_scale(self, tree: Tree):
        """Optimal step length for the new tree (``LineSearchLearningRate``,
        gbdt.cpp:475-485): scale leaf values by argmin_a loss(F + a * t(x)).

        Gaussian GP objective: the loss is an exact QUADRATIC in the step
        length (logdet does not depend on a), so the minimizer has the
        closed form a* = v'Psi^-1 r / v'Psi^-1 v — two matrix-free products
        instead of the reference's 20 golden-section NLL evaluations (each
        a blocking dispatch over the TPU tunnel). Other objectives keep the
        golden-section search."""
        import math
        vals = self._tree_train_pred(tree)
        n = self.train_set.num_data
        base = self._score[:n]

        if (isinstance(self.objective, GPBoostObjective)
                and self.gp_model.spec.is_gaussian):
            gp = self.gp_model
            cov_pars = jnp.asarray(gp.cov_pars_, dtype=gp.dtype)
            r0 = jnp.asarray(self.train_set.label - base, dtype=gp.dtype)
            v = jnp.asarray(vals, dtype=gp.dtype)
            u = gp._psi_solve(cov_pars, v)
            denom = float(jnp.dot(u, v))
            alpha = float(jnp.dot(u, r0)) / max(denom, 1e-300)
            alpha = min(max(alpha, 0.0), 10.0)  # the reference's [0, 10]
            tree.leaf_value = tree.leaf_value * alpha
            tree.shrinkage *= alpha
            return

        def loss(alpha):
            score = base + alpha * vals
            if isinstance(self.objective, GPBoostObjective):
                gp = self.gp_model
                if gp.spec.is_gaussian:
                    resid = self.train_set.label - score
                    return gp.neg_log_likelihood(
                        cov_pars=gp.cov_pars_, y=resid)
                return gp.neg_log_likelihood(
                    cov_pars=gp.cov_pars_, y=self.train_set.label,
                    fixed_effects=score)
            g, h = self.objective.get_gradients(score)
            # quadratic surrogate not available generically; use L2-type loss
            return float(np.sum(g * g))

        lo, hi = 0.0, 10.0
        invphi = (math.sqrt(5.0) - 1) / 2
        c = hi - invphi * (hi - lo)
        d = lo + invphi * (hi - lo)
        fc, fd = loss(c), loss(d)
        for _ in range(20):
            if fc < fd:
                hi, d, fd = d, c, fc
                c = hi - invphi * (hi - lo)
                fc = loss(c)
            else:
                lo, c, fc = c, d, fd
                d = lo + invphi * (hi - lo)
                fd = loss(d)
        alpha = 0.5 * (lo + hi)
        tree.leaf_value = tree.leaf_value * alpha
        tree.shrinkage *= alpha

    def _newton_update_leaves(self, tree: Tree, row_leaf):
        """Leaf re-solve a = (H' Psi^-1 H)^-1 H' Psi^-1 r
        (``REModelTemplate::NewtonUpdateLeafValues``, re_model_template.h:4518).
        """
        gp = self.gp_model
        resid = self.train_set.label - self._score[:self.train_set.num_data]
        cov_pars = jnp.asarray(gp.cov_pars_, dtype=gp.dtype)
        leaf_nodes = tree.leaf_index_order()
        rl = np.asarray(row_leaf)[:self.train_set.num_data]
        H = (rl[:, None] == leaf_nodes[None, :]).astype(np.float64)
        Hj = jnp.asarray(H, dtype=gp.dtype)
        # matrix-free Psi^-1 through the active approximation (no dense Psi)
        PiH = gp._psi_solve(cov_pars, Hj)
        rj = jnp.asarray(resid, dtype=gp.dtype)
        A = Hj.T @ PiH
        b = PiH.T @ rj
        a = np.linalg.solve(np.asarray(A) + 1e-10 * np.eye(len(leaf_nodes)),
                            np.asarray(b))
        tree.leaf_value[leaf_nodes] = a

    # ------------------------------------------------------------------
    # convenience surface (reference ``Booster``, basic.py:2323)
    def num_trees(self):
        return len(self.trees)

    def num_model_per_iteration(self):
        return self.num_models

    def feature_name(self):
        if self.train_set is not None:
            return list(self.train_set.feature_name)
        return [f"Column_{i}" for i in range(self.num_feature())]

    def attr(self, key):
        """Get a model attribute string (``Booster.attr``)."""
        return getattr(self, "_attrs", {}).get(key)

    def set_attr(self, **kwargs):
        """Set model attribute strings (``Booster.set_attr``)."""
        attrs = getattr(self, "_attrs", {})
        for k, v in kwargs.items():
            if v is None:
                attrs.pop(k, None)
            else:
                attrs[k] = str(v)
        self._attrs = attrs
        return self

    def set_train_data_name(self, name):
        self._train_data_name = name
        return self

    def dump_model(self, num_iteration=None, start_iteration=0):
        """Model as a python dict (``Booster.dump_model``)."""
        return self._to_dict()

    @classmethod
    def model_from_string(cls, model_str):
        return cls(model_str=model_str)

    def free_dataset(self):
        """Drop the reference to the training Dataset (frees the binned
        matrix; the booster can still predict on raw data)."""
        self.train_set = None
        return self

    def free_network(self):
        """No-op: the mesh replaces the reference's network (the SPMD
        programs tear down with the process)."""
        return self

    def set_network(self, *args, **kwargs):
        raise NotImplementedError(
            "set_network is replaced by mesh sharding: construct the "
            "Dataset/Booster inside gpboost_tpu.use_mesh(mesh) (multi-host "
            "via gpboost_tpu.distributed.initialize)")

    def reset_parameter(self, params):
        """Update training parameters between iterations
        (``Booster.reset_parameter``)."""
        from gpboost_tpu import config as cfg_mod
        params = cfg_mod.resolve_params(params)
        for k, v in params.items():
            if k == "learning_rate":
                self.learning_rate = float(v)
            else:
                self.params[k] = v
        return self

    def rollback_one_iter(self):
        """Undo the last boosting iteration (``Booster.rollback_one_iter``)."""
        if not self.trees:
            return self
        n = self.train_set.num_data if self.train_set is not None else None
        for _ in range(self.num_models):
            if not self.trees:
                break
            tree = self.trees.pop()
            m = len(self.trees) % self.num_models
            if n is not None:
                vals = self._tree_train_pred(tree)
                self._score[m * n:(m + 1) * n] -= vals
            for vi, vset in enumerate(self.valid_sets):
                vvals, _ = self._tree_raw_pred(
                    tree, jnp.asarray(vset.raw_data),
                    jnp.asarray(self._cat_bins_matrix(vset.raw_data)))
                nv = vset.num_data
                self._valid_scores[vi][m * nv:(m + 1) * nv] -= \
                    np.asarray(vvals)
        return self

    def shuffle_models(self, start_iteration=0, end_iteration=-1):
        """Randomly permute the tree order in [start, end)
        (``Booster.shuffle_models``)."""
        lo = start_iteration * self.num_models
        hi = (len(self.trees) if end_iteration < 0
              else end_iteration * self.num_models)
        rng = np.random.default_rng(int(self.params.get("seed", 0)))
        idx = np.arange(lo, hi)
        rng.shuffle(idx)
        block = [self.trees[i] for i in idx]
        self.trees[lo:hi] = block
        return self

    def get_leaf_output(self, tree_id, leaf_id):
        tree = self.trees[tree_id]
        return float(tree.leaf_value[tree.leaf_index_order()[leaf_id]])

    def get_split_value_histogram(self, feature, bins=None):
        """Histogram of the split thresholds used for ``feature``
        (``Booster.get_split_value_histogram``)."""
        if isinstance(feature, str):
            feature = self.feature_name().index(feature)
        thresholds = []
        for tree in self.trees:
            for node in tree.internal_nodes():
                if (int(tree.split_feature[node]) == feature
                        and (tree.is_categorical is None
                             or not tree.is_categorical[node])):
                    thresholds.append(float(tree.threshold[node]))
        thresholds = np.asarray(thresholds)
        if bins is None:
            bins = max(1, min(32, len(thresholds)))
        return np.histogram(thresholds[np.isfinite(thresholds)], bins=bins)

    def _pred_bound(self, reduce_fn):
        total = 0.0
        for k, tree in enumerate(self.trees):
            leaves = tree.leaf_value[tree.is_leaf]
            total += float(reduce_fn(leaves)) if len(leaves) else 0.0
        return total + float(reduce_fn(np.atleast_1d(self.init_score)))

    def lower_bound(self):
        """Lower bound of raw predictions (sum of per-tree minima)."""
        return self._pred_bound(np.min)

    def upper_bound(self):
        """Upper bound of raw predictions (sum of per-tree maxima)."""
        return self._pred_bound(np.max)

    def eval(self, data, name, feval=None):
        """Evaluate on an added validation Dataset (or the train set)."""
        if data is self.train_set:
            return self.eval_train()
        for vset, vname, score in zip(self.valid_sets, self.valid_names,
                                      self._valid_scores):
            if data is vset or name == vname:
                return self._eval(vset, name, score)
        raise ValueError("data must be the train set or an added valid set")

    def trees_to_dataframe(self):
        """Tree structure as a pandas DataFrame
        (``Booster.trees_to_dataframe``)."""
        import pandas as pd
        rows = []
        names = self.feature_name()
        for k, tree in enumerate(self.trees):
            for node in range(len(tree.is_leaf)):
                internal = tree.internal_nodes()
                reachable = (node == 0 or node in set(tree.left[internal])
                             or node in set(tree.right[internal]))
                if not reachable:
                    continue
                if tree.is_leaf[node]:
                    rows.append(dict(
                        tree_index=k, node_index=node, split_feature=None,
                        threshold=None, decision_type=None,
                        left_child=None, right_child=None,
                        value=float(tree.leaf_value[node]),
                        count=(None if tree.node_count is None
                               else float(tree.node_count[node]))))
                else:
                    f = int(tree.split_feature[node])
                    rows.append(dict(
                        tree_index=k, node_index=node,
                        split_feature=names[f] if f < len(names) else f,
                        threshold=float(tree.threshold[node]),
                        decision_type="<=", left_child=int(tree.left[node]),
                        right_child=int(tree.right[node]), value=0.0,
                        count=(None if tree.node_count is None
                               else float(tree.node_count[node]))))
        return pd.DataFrame(rows)

    # ------------------------------------------------------------------
    def eval_train(self):
        return self._eval(self.train_set, "training", self._score)

    def eval_valid(self):
        out = []
        for vset, name, score in zip(self.valid_sets, self.valid_names,
                                     self._valid_scores):
            out.extend(self._eval(vset, name, score))
        return out

    def _default_eval_at(self):
        """``eval_at`` positions (config.h:968; DCGCalculator::DefaultEvalAt
        = 1..5)."""
        at = self.params.get("eval_at", None)
        if at is None:
            return [1, 2, 3, 4, 5]
        return list(at) if isinstance(at, (list, tuple)) else [int(at)]

    def _eval(self, dset: Dataset, name: str, score: np.ndarray):
        res = []
        pred = None
        for metric in self.metric_names:
            if metric in metrics_mod.GP_METRICS:
                val = self._eval_gp_metric(metric, dset, score)
                res.append((name, metric, val, False))
                continue
            base, ks = metrics_mod.resolve_metric_name(metric)
            spec = metrics_mod.METRICS[base]
            if spec.kind == "raw":
                # e.g. auc_mu: RAW scores (linear discriminants, not softmax)
                kwargs = {}
                if base == "auc_mu":
                    kwargs = dict(num_class=self.num_class,
                                  class_weights=self.params.get(
                                      "auc_mu_weights"))
                val = spec.fn(dset.label, score, dset.weight, **kwargs)
                res.append((name, base, val, spec.higher_better))
                continue
            if spec.kind == "rank":
                if ks is None:
                    ks = self._default_eval_at()
                kwargs = {}
                if base == "ndcg":
                    kwargs["label_gain"] = self.params.get("label_gain")
                vals = spec.fn(dset.label, score[:dset.num_data],
                               dset.group, ks, **kwargs)
                for k, v in zip(ks, vals):
                    res.append((name, f"{base}@{k}", v, spec.higher_better))
                continue
            if pred is None:
                pred = self._convert_for_metric(dset, score)
            kwargs = {}
            if base in ("multi_logloss", "multi_error"):
                kwargs["num_class"] = self.num_class
            if base == "multi_error":
                kwargs["top_k"] = int(
                    self.params.get("multi_error_top_k", 1))
            val = spec.fn(dset.label, pred, dset.weight, **kwargs)
            res.append((name, base, val, spec.higher_better))
        return res

    def _residual_variance(self) -> float:
        """Training residual variance for Gaussian predictive metrics
        without a gp_model (reference regression objective's
        ``residual_variance_``)."""
        n = self.train_set.num_data
        resid = self.train_set.label - self._score[:n]
        return float(np.var(resid))

    def _eval_gp_metric(self, metric: str, dset: Dataset, score: np.ndarray):
        """GP-aware metrics (``random_effects_metric.hpp:25,69``,
        ``regression_metric.hpp:373`` TestNegLogLikelihood, ``:499``
        CRPSGaussian)."""
        import math
        gp = self.gp_model
        is_train = dset is self.train_set
        LOG2PI = math.log(2.0 * math.pi)
        if metric in ("neg_log_likelihood",
                      "approx_neg_marginal_log_likelihood"):
            # training-data-only: the (approximate) negative marginal
            # log-likelihood at the current covariance parameters
            if not is_train:
                raise ValueError(f"The metric '{metric}' cannot be used for "
                                 "validation data, only for training data")
            if gp is None:
                raise ValueError(f"The metric '{metric}' requires an "
                                 "attached gp_model")
            n = self.train_set.num_data
            if gp.spec.is_gaussian:
                resid = dset.label - self._score[:n]
                return float(gp.neg_log_likelihood(cov_pars=gp.cov_pars_,
                                                   y=resid))
            ns = getattr(gp, "num_sets_re", 1)
            return float(gp.neg_log_likelihood(
                cov_pars=gp.cov_pars_, y=dset.label,
                fixed_effects=self._score[:n * ns]))
        # validation-only metrics
        if is_train:
            raise ValueError(f"Cannot use the metric '{metric}' on the "
                             "training data")
        label = dset.label
        nv = dset.num_data
        raw = score[:nv]
        if gp is not None and self.use_gp_model_for_validation:
            pd = getattr(gp, "_valid_pred_data", None)
            if pd is None:
                raise ValueError(
                    "gp_model.set_prediction_data(...) must be called before "
                    f"using the metric '{metric}' with "
                    "use_gp_model_for_validation=True")
            n = self.train_set.num_data
            ns = getattr(gp, "num_sets_re", 1)
            if gp.spec.is_gaussian:
                resid = self.train_set.label - self._score[:n]
                pred = gp.predict(y=resid, predict_var=True,
                                  predict_response=True, **pd)
                mu = raw + np.asarray(pred["mu"])
                var = np.asarray(pred["var"]).ravel()
            else:
                pred = gp.predict(
                    y=self.train_set.label,
                    fixed_effects=self._score[:n * ns],
                    fixed_effects_pred=score[:nv * ns], predict_var=True,
                    predict_response=(metric == "crps_gaussian"), **pd)
                mu = np.asarray(pred["mu"])
                var = np.asarray(pred["var"]).ravel()
                if metric == "test_neg_log_likelihood":
                    # adaptive-GH integral of the response likelihood over
                    # the latent predictive Gaussian (likelihoods.h:7931)
                    from gpboost_tpu.models import laplace
                    nlls = laplace.test_nll_adaptive_gh(
                        gp.spec.likelihood,
                        jnp.asarray(label, dtype=gp.dtype),
                        jnp.asarray(mu, dtype=gp.dtype),
                        jnp.asarray(np.maximum(var, 1e-12), dtype=gp.dtype),
                        gp._aux_pars_array())
                    return float(np.mean(np.asarray(nlls)))
            if metric == "test_neg_log_likelihood":
                return float(np.mean(
                    0.5 * ((label - mu) ** 2 / var + np.log(var) + LOG2PI)))
            return metrics_mod.crps_gaussian(label, mu, var)
        # no gp_model (or not used for validation): Gaussian with the
        # training residual variance / mean_scale two-parameter score
        if self.objective_name == "mean_scale_regression":
            if metric == "crps_gaussian":
                return metrics_mod.crps_gaussian(label, raw,
                                                 np.exp(score[nv:2 * nv]))
            raise ValueError(f"The metric '{metric}' cannot be used for the "
                             "objective 'mean_scale_regression'")
        if self.objective_name not in ("regression", "regression_gp"):
            raise ValueError(
                f"The metric '{metric}' can only be used with a gp_model or "
                "the 'regression' objective")
        rv = max(self._residual_variance(), 1e-300)
        if metric == "test_neg_log_likelihood":
            return float(np.mean(
                0.5 * ((raw - label) ** 2 / rv + math.log(rv) + LOG2PI)))
        return metrics_mod.crps_gaussian(label, raw, np.full(nv, rv))

    def _convert_for_metric(self, dset: Dataset, score: np.ndarray):
        """Convert raw scores for metric eval; with an attached gp_model and
        use_gp_model_for_validation, add predicted random effects
        (``regression_metric.hpp:86-129``)."""
        if (self.gp_model is not None and self.use_gp_model_for_validation
                and dset is not self.train_set):
            pred = self._predict_combined(dset.raw_data, dset)
            return pred
        return self.objective.convert_output(score)

    # ------------------------------------------------------------------
    def predict(self, data, num_iteration: Optional[int] = None,
                start_iteration: int = 0,
                raw_score: bool = False, pred_leaf: bool = False,
                pred_contrib: bool = False, group_data_pred=None,
                group_rand_coef_data_pred=None, gp_coords_pred=None,
                gp_rand_coef_data_pred=None, cluster_ids_pred=None,
                predict_var=False, pred_latent=False, **kwargs):
        """Predict on raw features. With an attached gp_model, returns the
        combined tree + random-effects prediction (``basic.py:3560-3650``).
        ``num_iteration=None`` uses ``best_iteration`` when early stopping
        set one (reference ``basic.py`` predict default)."""
        if num_iteration is None and getattr(self, "best_iteration", -1) > 0:
            num_iteration = self.best_iteration
        data = self._marshal_pred(data)
        if data.ndim == 1:
            data = data[:, None]
        raw = self._predict_raw(data, num_iteration,
                                start_iteration=start_iteration)
        if pred_leaf:
            return self._predict_leaf(data, num_iteration)
        if pred_contrib:
            from gpboost_tpu.boosting.shap import predict_contrib
            limit = (len(self.trees) if num_iteration in (None, -1, 0)
                     else min(num_iteration * self.num_models,
                              len(self.trees)))
            base = self.init_score[0] if self.num_models == 1 else 0.0
            return predict_contrib(self.trees[:limit], data, base)
        if self.gp_model is not None and gp_coords_pred is not None or (
                self.gp_model is not None and group_data_pred is not None):
            return self._predict_with_gp(
                data, raw, group_data_pred, group_rand_coef_data_pred,
                gp_coords_pred, gp_rand_coef_data_pred, cluster_ids_pred,
                predict_var, pred_latent, num_iteration)
        if raw_score:
            return raw
        if self.objective_name == "mean_scale_regression":
            # (pred_mean, pred_var) dict (reference basic.py:3674-3680)
            n = data.shape[0]
            return {"pred_mean": raw[:n], "pred_var": np.exp(raw[n:])}
        return self.objective.convert_output(raw)

    def _pandas_categorical_levels(self):
        """JSON-safe training-time category levels (reference stores
        ``pandas_categorical`` in the model file, basic.py:3321)."""
        pc = (getattr(self.train_set, "pandas_categorical", None)
              if self.train_set is not None
              else getattr(self, "_pandas_categorical", None))
        if not pc:
            return None
        def conv(v):
            if isinstance(v, (bool, int, float, str)):
                return v
            if isinstance(v, (np.integer,)):
                return int(v)
            if isinstance(v, (np.floating,)):
                return float(v)
            return str(v)
        return [[conv(v) for v in levels] for levels in pc]

    def _marshal_pred(self, data):
        """Prediction-input marshalling: DataFrames re-mapped with the
        training-time category levels, sparse matrices densified
        (reference ``_InnerPredictor.predict`` pandas path, basic.py:788)."""
        from gpboost_tpu.boosting.compat_data import marshal_matrix
        pc = (getattr(self.train_set, "pandas_categorical", None)
              if self.train_set is not None
              else getattr(self, "_pandas_categorical", None))
        arr, _, _, _ = marshal_matrix(data, "auto", "auto",
                                      pandas_categorical=pc)
        # training-time missing-value policy (use_missing / zero_as_missing)
        if not bool(self.params.get("use_missing", True)):
            arr = np.where(np.isfinite(arr), arr, 0.0)
        elif bool(self.params.get("zero_as_missing", False)):
            arr = np.where(arr == 0.0, np.nan, arr)
        return arr

    def _predict_raw(self, data, num_iteration=None, start_iteration=0):
        n = data.shape[0]
        limit = (len(self.trees) if num_iteration in (None, -1, 0)
                 else min(num_iteration * self.num_models, len(self.trees)))
        # start_iteration (config.h:647): predict from a tree-range suffix;
        # the boost-from-average base belongs to iteration 0
        start = max(0, int(start_iteration or 0)) * self.num_models
        score = np.zeros(n * self.num_models)
        if start == 0:
            for m in range(self.num_models):
                score[m * n:(m + 1) * n] += self.init_score[m]
        Xj = jnp.asarray(data)
        cat_bins_j = jnp.asarray(self._cat_bins_matrix(data))
        # row-wise prediction early stopping (prediction_early_stop.cpp:54,25;
        # margins: binary 2|score|, multiclass top1-top2, checked every
        # pred_early_stop_freq iterations; confident rows stop accumulating)
        early_type = None
        if bool(self.params.get("pred_early_stop", False)):
            if self.num_models == 1 and self.objective_name == "binary":
                early_type = "binary"
            elif self.num_models > 1:
                early_type = "multiclass"
        if early_type is not None and start == 0:
            freq = int(self.params.get("pred_early_stop_freq", 10))
            thresh = float(self.params.get("pred_early_stop_margin", 10.0))
            active = np.ones(n, dtype=bool)
            smat = score.reshape(self.num_models, n)
            for k in range(limit):
                if not active.any():
                    break
                vals = np.asarray(
                    self._tree_raw_pred(self.trees[k], Xj, cat_bins_j)[0])
                m = k % self.num_models
                smat[m, active] += vals[active]
                if m == self.num_models - 1 and (
                        (k // self.num_models) + 1) % freq == 0:
                    if early_type == "binary":
                        margin = 2.0 * np.abs(smat[0])
                    else:
                        top2 = np.sort(smat, axis=0)[-2:]
                        margin = top2[1] - top2[0]
                    active &= margin <= thresh
            return smat.reshape(-1)
        if (getattr(self, "use_nesterov_acc", False) and start == 0
                and getattr(self, "boosting_type", "gbdt") == "gbdt"):
            # replay the momentum steps between iterations exactly as the
            # reference prediction path does (gbdt_prediction.cpp:20-35)
            smat = score.reshape(self.num_models, n)
            lag = None
            n_iters = limit // self.num_models
            for i in range(n_iters):
                if i == 1:
                    lag = smat.copy()
                elif i > 1:
                    mu = nesterov_schedule(
                        i, self.momentum_schedule_version,
                        self.nesterov_acc_rate, self.momentum_offset)
                    momentum = (mu + 1.0) * smat - mu * lag
                    lag = smat.copy()
                    smat = momentum
                for m in range(self.num_models):
                    tree = self.trees[i * self.num_models + m]
                    vals, _ = self._tree_raw_pred(tree, Xj, cat_bins_j)
                    smat[m] += np.asarray(vals)
            return smat.reshape(-1)
        for k in range(start, limit):
            tree = self.trees[k]
            vals, _ = self._tree_raw_pred(tree, Xj, cat_bins_j)
            m = k % self.num_models
            score[m * n:(m + 1) * n] += np.asarray(vals)
        if getattr(self, "boosting_type", "gbdt") == "rf" and limit > 0:
            base = self.init_score[0] if self.num_models == 1 else 0.0
            score = base + (score - base) / (limit // self.num_models)
        return score

    def _predict_leaf(self, data, num_iteration=None):
        n = data.shape[0]
        limit = (len(self.trees) if num_iteration in (None, -1, 0)
                 else min(num_iteration * self.num_models, len(self.trees)))
        out = np.zeros((n, limit), dtype=np.int32)
        Xj = jnp.asarray(data)
        cat_bins_j = jnp.asarray(self._cat_bins_matrix(data))
        for k in range(limit):
            tree = self.trees[k]
            _, nodes = self._tree_raw_pred(tree, Xj, cat_bins_j)
            # map node id -> leaf ordinal
            leaf_nodes = tree.leaf_index_order()
            remap = np.zeros(len(tree.is_leaf), dtype=np.int32)
            remap[leaf_nodes] = np.arange(len(leaf_nodes))
            out[:, k] = remap[np.asarray(nodes)]
        return out

    def _predict_combined(self, data_raw, dset: Dataset):
        """Tree + GP prediction on a validation set that shares the GPModel's
        prediction data (set via gp_model.set_prediction_data)."""
        raw = self._predict_raw(data_raw)
        gp = self.gp_model
        pd = getattr(gp, "_valid_pred_data", None)
        if pd is None:
            return self.objective.convert_output(raw)
        if gp.spec.is_gaussian:
            resid = self.train_set.label - self._score[:self.train_set.num_data]
            gp_pred = gp.predict(y=resid, predict_response=True, **pd)
            return raw + gp_pred["mu"]
        ns = getattr(gp, "num_sets_re", 1)
        gp_pred = gp.predict(
            y=self.train_set.label,
            fixed_effects=self._score[:self.train_set.num_data * ns],
            predict_response=True, **pd)
        return gp_pred["mu"]

    def _predict_with_gp(self, data, raw, group_data_pred,
                         group_rand_coef_data_pred, gp_coords_pred,
                         gp_rand_coef_data_pred, cluster_ids_pred,
                         predict_var, pred_latent, num_iteration):
        gp = self.gp_model
        pred_kwargs = dict(
            group_data_pred=group_data_pred,
            group_rand_coef_data_pred=group_rand_coef_data_pred,
            gp_coords_pred=gp_coords_pred,
            gp_rand_coef_data_pred=gp_rand_coef_data_pred,
            cluster_ids_pred=cluster_ids_pred, predict_var=predict_var)
        ns = getattr(gp, "num_sets_re", 1)
        if self.train_set is not None:
            train_score = self._score[:self.train_set.num_data * ns]
            train_label = self.train_set.label
        else:  # loaded model: embedded training label/score
            train_score = self._loaded_train_score
            train_label = self._loaded_train_label
        if gp.spec.is_gaussian:
            resid = train_label - train_score
            gp_pred = gp.predict(y=resid, predict_response=not pred_latent,
                                 **pred_kwargs)
            out = {"response_mean": raw + gp_pred["mu"],
                   "response_var": gp_pred["var"],
                   "fixed_effect": raw,
                   "random_effect_mean": gp_pred["mu"],
                   # reference: with predict_var=TRUE random_effect_cov
                   # carries the predictive VARIANCES (basic.py:3560-3650)
                   "random_effect_cov": (gp_pred.get("cov")
                                         if gp_pred.get("cov") is not None
                                         else gp_pred.get("var"))}
        else:
            if pred_latent:
                gp_pred = gp.predict(y=train_label,
                                     fixed_effects=train_score,
                                     predict_response=False, **pred_kwargs)
                out = {"fixed_effect": raw,
                       "random_effect_mean": gp_pred["mu"],
                       "random_effect_cov": (gp_pred.get("cov")
                                             if gp_pred.get("cov") is not None
                                             else gp_pred.get("var")),
                       "response_mean": None, "response_var": None}
            else:
                gp_pred = gp.predict(y=train_label,
                                     fixed_effects=train_score,
                                     fixed_effects_pred=raw,
                                     predict_response=True, **pred_kwargs)
                out = {"response_mean": gp_pred["mu"],
                       "response_var": gp_pred["var"],
                       "fixed_effect": raw,
                       "random_effect_mean": None, "random_effect_cov": None}
        return out

    # ------------------------------------------------------------------
    def refit(self, data, label, decay_rate: float = 0.9, **kwargs):
        """Refit leaf values on new data, keeping tree structures
        (``Booster.refit``, ``basic.py:3686``): new_leaf = decay * old +
        (1 - decay) * estimate-from-new-data."""
        data = np.asarray(data, dtype=np.float64)
        if data.ndim == 1:
            data = data[:, None]
        label = np.asarray(label, dtype=np.float64).ravel()
        obj = create_objective(self.objective_name, self.params)
        obj.init(label, None)
        n = data.shape[0]
        score = np.zeros(n * self.num_models)
        for m in range(self.num_models):
            score[m * n:(m + 1) * n] += self.init_score[m]
        Xj = jnp.asarray(data)
        for k, tree in enumerate(self.trees):
            grad, hess = obj.get_gradients(score)
            m = k % self.num_models
            g = grad[m * n:(m + 1) * n]
            h = hess[m * n:(m + 1) * n]
            _, nodes = self._tree_raw_pred(
                tree, Xj, jnp.asarray(self._cat_bins_matrix(data)))
            nodes = np.asarray(nodes)
            leaf_nodes = tree.leaf_index_order()
            for ln in leaf_nodes:
                mask = nodes == ln
                if mask.sum() > 0:
                    new_val = (-g[mask].sum()
                               / (h[mask].sum() + 1e-15)) * tree.shrinkage
                    tree.leaf_value[ln] = (decay_rate * tree.leaf_value[ln]
                                           + (1 - decay_rate) * new_val)
            vals, _ = self._tree_raw_pred(
                tree, Xj, jnp.asarray(self._cat_bins_matrix(data)))
            score[m * n:(m + 1) * n] += np.asarray(vals)
        return self

    def feature_importance(self, importance_type: str = "split",
                           iteration: Optional[int] = None):
        F = self.train_set.num_features if self.train_set is not None else (
            int(max(max(t.split_feature) for t in self.trees)) + 1)
        imp = np.zeros(F)
        limit = (len(self.trees) if iteration in (None, -1, 0)
                 else min(iteration * self.num_models, len(self.trees)))
        for tree in self.trees[:limit]:
            for node in tree.internal_nodes():
                if importance_type == "gain":
                    if tree.split_gain is None:
                        raise ValueError(
                            "gain importance unavailable: model has no "
                            "recorded split gains (legacy save file)")
                    imp[tree.split_feature[node]] += tree.split_gain[node]
                else:
                    imp[tree.split_feature[node]] += 1
        return imp

    def num_feature(self):
        if self.train_set is not None:
            return self.train_set.num_features
        return int(max(int(np.max(t.split_feature[t.internal_nodes()],
                               initial=0)) for t in self.trees)) + 1

    # ------------------------------------------------------------------
    def model_to_string(self, num_iteration=None, format: str = "json"):
        """Serialize the model: ``format='json'`` (our native format) or
        ``format='text'`` (the reference's ``.txt`` model format —
        round-trips with reference GPBoost/LightGBM)."""
        if format == "text":
            from gpboost_tpu.boosting.model_text import booster_to_text
            return booster_to_text(self, num_iteration)
        return json.dumps(self._to_dict())

    def model_to_c(self, num_iteration=None):
        """Standalone C source for this model (``task=convert_model``,
        reference ``Tree::ToIfElse`` io/tree.cpp:527)."""
        from gpboost_tpu.boosting.convert import booster_to_c
        return booster_to_c(self, num_iteration)

    def save_model(self, filename, num_iteration=None, start_iteration=0,
                   format: Optional[str] = None):
        """Save the model. ``format=None`` chooses by extension: ``.txt``
        writes the reference's text model format (loadable by reference
        GPBoost/LightGBM), anything else our JSON format."""
        if format is None:
            format = "text" if str(filename).endswith(".txt") else "json"
        with open(filename, "w") as f:
            if format == "text":
                f.write(self.model_to_string(num_iteration, format="text"))
            else:
                json.dump(self._to_dict(), f)
        return self

    def _to_dict(self):
        d = {
            "version": "gpboost_tpu_v1",
            "params": {k: v for k, v in self.params.items()
                       if isinstance(v, (int, float, str, bool, list))},
            "objective": self.objective_name,
            "boosting_type": getattr(self, "boosting_type", "gbdt"),
            "num_class": self.num_class,
            "num_models": self.num_models,
            "init_score": self.init_score.tolist(),
            "trees": [t.to_dict() for t in self.trees],
            "best_iteration": self.best_iteration,
            "cat_maps": (None if self.train_set is None
                         or not self.train_set.cat_maps else
                         {str(f): {str(k): int(v) for k, v in mp.items()}
                          for f, mp in self.train_set.cat_maps.items()}),
            "attrs": getattr(self, "_attrs", {}),
            "feature_names": (list(self.train_set.feature_name)
                              if self.train_set is not None else
                              getattr(self, "_feature_names", None)),
            "pandas_categorical": self._pandas_categorical_levels(),
        }
        if self.gp_model is not None:
            d["gp_model"] = self.gp_model.model_to_dict()
            # combined prediction needs the training label and raw score
            d["train_label"] = self.train_set.label.tolist()
            d["train_score"] = np.asarray(
                self._score[:self.train_set.num_data]).tolist()
        return d

    def _load_model_content(self, content: str):
        """Load either our JSON model format or the reference's text model
        format (``gbdt_model_text.cpp`` SaveModelToString), auto-detected."""
        from gpboost_tpu.boosting import model_text
        if model_text.looks_like_model_text(content):
            self._load_dict(model_text.parse_model_text(content))
        else:
            self._load_dict(json.loads(content))

    def _load_dict(self, d):
        self.params = d.get("params", {})
        self.objective_name = d["objective"]
        self.boosting_type = d.get("boosting_type", "gbdt")
        p = self.params
        self.use_nesterov_acc = bool(p.get("use_nesterov_acc", False))
        self.nesterov_acc_rate = float(p.get("nesterov_acc_rate", 0.5))
        self.momentum_offset = int(p.get("momentum_offset", 0))
        self.momentum_schedule_version = int(
            p.get("momentum_schedule_version", 1))
        cm = d.get("cat_maps")
        self._cat_maps = (None if not cm else
                          {int(f): {float(k): int(v) for k, v in mp.items()}
                           for f, mp in cm.items()})
        self.num_class = d.get("num_class", 1)
        self.num_models = d.get("num_models", 1)
        self._attrs = d.get("attrs", {})
        self._feature_names = d.get("feature_names")
        self._pandas_categorical = d.get("pandas_categorical")
        self.init_score = np.asarray(d["init_score"], dtype=np.float64)
        self.trees = [Tree.from_dict(td) for td in d["trees"]]
        self.best_iteration = d.get("best_iteration", -1)
        self.train_set = None
        self.gp_model = None
        if d.get("gp_model") is not None:
            from gpboost_tpu.models.gp_model import GPModel
            self.gp_model = GPModel.from_dict(d["gp_model"])
            self._loaded_train_label = np.asarray(d.get("train_label"),
                                                  dtype=np.float64)
            self._loaded_train_score = np.asarray(d.get("train_score"),
                                                  dtype=np.float64)
        self.valid_sets = []
        self.valid_names = []
        self._valid_scores = []
        self.objective = create_objective(self.objective_name, self.params)
        self.metric_names = [metrics_mod.default_metric_for(self.objective_name)]
