"""scikit-learn estimator API (reference ``python-package/gpboost/sklearn.py``).

``GPBoostModel`` / ``GPBoostRegressor`` / ``GPBoostClassifier`` /
``GPBoostRanker`` with ``gp_model`` pass-through (``sklearn.py:185,834,864``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from gpboost_tpu.boosting.booster import Booster
from gpboost_tpu.boosting.dataset import Dataset
from gpboost_tpu.boosting.engine import train


class GPBoostModel:
    """Base sklearn-style estimator."""

    def __init__(self, boosting_type="gbdt", num_leaves=31, max_depth=-1,
                 learning_rate=0.1, n_estimators=100, objective=None,
                 min_child_samples=20, min_child_weight=1e-3,
                 min_split_gain=0.0, subsample=1.0, subsample_freq=0,
                 colsample_bytree=1.0, reg_alpha=0.0, reg_lambda=0.0,
                 random_state=0, n_jobs=-1, importance_type="split",
                 max_bin=255, **kwargs):
        self.boosting_type = boosting_type
        self.num_leaves = num_leaves
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_estimators = n_estimators
        self.objective = objective
        self.min_child_samples = min_child_samples
        self.min_child_weight = min_child_weight
        self.min_split_gain = min_split_gain
        self.subsample = subsample
        self.subsample_freq = subsample_freq
        self.colsample_bytree = colsample_bytree
        self.reg_alpha = reg_alpha
        self.reg_lambda = reg_lambda
        self.random_state = random_state
        self.n_jobs = n_jobs
        self.importance_type = importance_type
        self.max_bin = max_bin
        self._other_params = dict(kwargs)
        self._Booster: Optional[Booster] = None

    # -- sklearn protocol ------------------------------------------------
    def get_params(self, deep=True):
        params = {k: v for k, v in self.__dict__.items()
                  if not k.startswith("_")}
        params.update(self._other_params)
        return params

    def set_params(self, **params):
        for k, v in params.items():
            if hasattr(self, k):
                setattr(self, k, v)
            else:
                self._other_params[k] = v
        return self

    def _make_params(self):
        p = {
            "objective": self.objective or self._default_objective(),
            "num_leaves": self.num_leaves, "max_depth": self.max_depth,
            "learning_rate": self.learning_rate,
            "min_data_in_leaf": self.min_child_samples,
            "min_sum_hessian_in_leaf": self.min_child_weight,
            "min_gain_to_split": self.min_split_gain,
            "bagging_fraction": self.subsample,
            "bagging_freq": self.subsample_freq,
            "feature_fraction": self.colsample_bytree,
            "lambda_l1": self.reg_alpha, "lambda_l2": self.reg_lambda,
            "seed": self.random_state, "max_bin": self.max_bin,
            "verbose": -1,
        }
        p.update(self._other_params)
        return p

    def _default_objective(self):
        return "regression"

    def fit(self, X, y, gp_model=None, sample_weight=None, init_score=None,
            eval_set=None, eval_names=None, early_stopping_rounds=None,
            verbose=False, feature_name="auto", categorical_feature="auto",
            callbacks=None):
        y_proc = self._process_label(np.asarray(y))
        ds = Dataset(X, label=y_proc, weight=sample_weight,
                     init_score=init_score, max_bin=self.max_bin,
                     group=getattr(self, "_group", None))
        valid_sets = None
        valid_names = None
        if eval_set:
            valid_sets = [ds.create_valid(ex, label=self._process_label(
                np.asarray(ey))) for ex, ey in eval_set]
            valid_names = eval_names
        self._Booster = train(
            self._make_params(), ds, num_boost_round=self.n_estimators,
            gp_model=gp_model, valid_sets=valid_sets, valid_names=valid_names,
            early_stopping_rounds=early_stopping_rounds,
            verbose_eval=verbose, callbacks=callbacks)
        self._gp_model = gp_model
        self._n_features = ds.num_features
        return self

    def _process_label(self, y):
        return y.astype(np.float64)

    def predict(self, X, raw_score=False, num_iteration=None,
                pred_leaf=False, pred_contrib=False, group_data_pred=None,
                gp_coords_pred=None, group_rand_coef_data_pred=None,
                gp_rand_coef_data_pred=None, cluster_ids_pred=None,
                predict_var=False, pred_latent=False, **kwargs):
        if self._Booster is None:
            raise ValueError("Estimator not fitted")
        return self._Booster.predict(
            X, raw_score=raw_score, num_iteration=num_iteration,
            pred_leaf=pred_leaf, pred_contrib=pred_contrib,
            group_data_pred=group_data_pred, gp_coords_pred=gp_coords_pred,
            group_rand_coef_data_pred=group_rand_coef_data_pred,
            gp_rand_coef_data_pred=gp_rand_coef_data_pred,
            cluster_ids_pred=cluster_ids_pred, predict_var=predict_var,
            pred_latent=pred_latent)

    @property
    def booster_(self):
        return self._Booster

    @property
    def feature_importances_(self):
        return self._Booster.feature_importance(self.importance_type)

    @property
    def n_features_(self):
        return self._n_features


class GPBoostRegressor(GPBoostModel):
    """Regression estimator (``sklearn.py:834``)."""

    def _default_objective(self):
        return "regression"


class GPBoostClassifier(GPBoostModel):
    """Binary/multiclass classifier (``sklearn.py:864``)."""

    def _default_objective(self):
        if getattr(self, "_n_classes", 2) > 2:
            return "multiclass"
        return "binary"

    def fit(self, X, y, **kwargs):
        y = np.asarray(y)
        self._classes = np.unique(y)
        self._n_classes = len(self._classes)
        if self._n_classes > 2 and self.objective is None:
            self._other_params.setdefault("num_class", self._n_classes)
        self._label_map = {c: i for i, c in enumerate(self._classes)}
        return super().fit(X, y, **kwargs)

    def _process_label(self, y):
        return np.asarray([self._label_map[v] for v in y], dtype=np.float64)

    def predict_proba(self, X, **kwargs):
        p = super().predict(X, **kwargs)
        if isinstance(p, dict):
            p = p["response_mean"]
        if self._n_classes == 2:
            return np.column_stack([1 - p, p])
        n = np.asarray(X).shape[0]
        return p.reshape(self._n_classes, n).T

    def predict(self, X, raw_score=False, **kwargs):
        if raw_score:
            return super().predict(X, raw_score=True, **kwargs)
        proba = self.predict_proba(X, **kwargs)
        return self._classes[np.argmax(proba, axis=1)]

    @property
    def classes_(self):
        return self._classes


class GPBoostRanker(GPBoostModel):
    """LambdaRank-style ranker (``sklearn.py:1069``) — objective pending the
    ranking objective implementation; exposed for API parity."""

    def _default_objective(self):
        return "lambdarank"

    def fit(self, X, y, group=None, **kwargs):
        if group is None:
            raise ValueError("Ranker requires 'group'")
        self._group = group
        return super().fit(X, y, **kwargs)
