"""Central parameter registry: schema, aliases, validation, doc generation.

TPU-framework equivalent of the reference's config system
(``include/LightGBM/config.h`` + the codegen in
``helpers/parameter_generator.py:252`` that keeps docs and code in sync):
every public training parameter is declared ONCE here with its canonical
name, default, type, aliases, constraint, and description.
``resolve_params`` canonicalizes user dicts (alias resolution + validation)
and is the single entry point used by ``Booster`` and ``GPModel``;
``generate_markdown`` emits ``docs/PARAMETERS.md`` (regenerate with
``python -m gpboost_tpu.config``), and a test asserts the docs equal the
schema so they can never drift.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple


@dataclass(frozen=True)
class Param:
    name: str
    default: Any
    ptype: str                      # int | float | bool | str | list | any
    section: str
    desc: str
    aliases: Tuple[str, ...] = ()
    check: Optional[Callable[[Any], bool]] = None
    check_desc: str = ""


def _pos(v):
    return v > 0


def _nonneg(v):
    return v >= 0


def _frac(v):
    return 0.0 < v <= 1.0


B = "Boosting"
D = "DART"
G = "GOSS"
C = "CEGB"
O = "Objective"  # noqa: E741
P = "Prediction"
GP = "GPBoost coupling"
F = "GP model fitting (set_optim_params / fit params)"
IO = "CLI / IO"

PARAMS: Tuple[Param, ...] = (
    # ---- core boosting -------------------------------------------------
    Param("objective", "regression", "str", B,
          "regression, regression_l1, huber, fair, poisson, gamma, tweedie, "
          "quantile, mape, binary, cross_entropy, cross_entropy_lambda, "
          "multiclass, multiclassova, tobit, mean_scale_regression, "
          "lambdarank, rank_xendcg", ("application", "loss")),
    Param("boosting", "gbdt", "str", B, "gbdt, dart, goss, rf",
          ("boosting_type",)),
    Param("num_iterations", 100, "int", B, "boosting rounds",
          ("num_iteration", "n_iter", "num_tree", "num_trees", "num_round",
           "num_rounds", "n_estimators"), _pos, "> 0"),
    Param("learning_rate", 0.1, "float", B, "shrinkage per tree",
          ("shrinkage_rate", "eta"), _pos, "> 0"),
    Param("num_leaves", 31, "int", B, "max leaves per tree",
          ("num_leaf", "max_leaves"), lambda v: v > 1, "> 1"),
    Param("max_depth", -1, "int", B, "depth cap (-1 = none)"),
    Param("min_data_in_leaf", 20, "int", B, "min rows per leaf",
          ("min_data_per_leaf", "min_data", "min_child_samples"),
          _nonneg, ">= 0"),
    Param("min_sum_hessian_in_leaf", 1e-3, "float", B,
          "min hessian sum per leaf",
          ("min_sum_hessian_per_leaf", "min_child_weight"), _nonneg, ">= 0"),
    Param("lambda_l1", 0.0, "float", B, "L1 leaf-value regularization",
          ("reg_alpha",), _nonneg, ">= 0"),
    Param("lambda_l2", 0.0, "float", B, "L2 leaf-value regularization",
          ("reg_lambda",), _nonneg, ">= 0"),
    Param("min_gain_to_split", 0.0, "float", B, "min split gain",
          (), _nonneg, ">= 0"),
    Param("bagging_fraction", 1.0, "float", B, "row subsample fraction",
          ("sub_row", "subsample"), _frac, "(0, 1]"),
    Param("bagging_freq", 0, "int", B,
          "re-bag every k iterations (0 = off); the bag is reused between",
          ("subsample_freq",), _nonneg, ">= 0"),
    Param("feature_fraction", 1.0, "float", B,
          "column subsample fraction per tree",
          ("sub_feature", "colsample_bytree"), _frac, "(0, 1]"),
    Param("max_bin", 255, "int", B, "histogram bins per feature", (),
          _pos, "> 0"),
    Param("max_cat_threshold", 32, "int", B,
          "max left-set size for categorical splits", (), _pos, "> 0"),
    Param("monotone_constraints", None, "list", B,
          "per-feature -1/0/+1 monotonicity"),
    Param("monotone_constraints_method", "basic", "str", B,
          "basic (midpoint bounds) / intermediate or advanced "
          "(actual-output bounds + constrained gains)"),
    Param("monotone_penalty", 0.0, "float", B,
          "depth-dependent gain penalty for monotone splits "
          "(monotone_constraints.hpp:355)", (), _nonneg, ">= 0"),
    Param("extra_trees", False, "bool", B,
          "extremely randomized trees: one random candidate bin per "
          "feature per node (config.h:368)"),
    Param("feature_fraction_bynode", 1.0, "float", B,
          "column subsample fraction per tree NODE (config.h:359)",
          ("sub_feature_bynode", "colsample_bynode"), _frac, "(0, 1]"),
    Param("path_smooth", 0.0, "float", B,
          "leaf-value smoothing toward the parent with weight "
          "n/(n + path_smooth) (config.h:550)", (), _nonneg, ">= 0"),
    Param("interaction_constraints", None, "list", B,
          "list of feature-index groups; branches may only combine "
          "features from a common group"),
    Param("cat_l2", 10.0, "float", B,
          "extra L2 for many-vs-many categorical splits", (),
          _nonneg, ">= 0"),
    Param("cat_smooth", 10.0, "float", B,
          "categorical smoothing: sort key G/(H + cat_smooth); categories "
          "with fewer data are ineligible", (), _nonneg, ">= 0"),
    Param("max_cat_to_onehot", 4, "int", B,
          "features with <= this many categories use one-hot splits", (),
          _pos, "> 0"),
    Param("min_data_in_bin", 3, "int", B,
          "minimum samples per histogram bin (adjacent bins merge)", (),
          _pos, "> 0"),
    Param("min_data_per_group", 100, "int", B,
          "minimum data per categorical group boundary", (), _pos, "> 0"),
    Param("pos_bagging_fraction", 1.0, "float", B,
          "bagging fraction for positive-class rows (binary)",
          (), _frac, "(0, 1]"),
    Param("neg_bagging_fraction", 1.0, "float", B,
          "bagging fraction for negative-class rows (binary)",
          (), _frac, "(0, 1]"),
    Param("metric", None, "any", B,
          "l2, rmse, l1, mape, quantile, huber, poisson, gamma, "
          "gamma_deviance, tweedie, binary_logloss, binary_error, auc, "
          "auc_mu, multi_logloss, multi_error, ndcg, map, cross_entropy, "
          "cross_entropy_lambda, kullback_leibler, neg_log_likelihood, "
          "approx_neg_marginal_log_likelihood, test_neg_log_likelihood, "
          "crps_gaussian", ("metrics", "metric_types")),
    Param("num_class", 1, "int", B, "number of classes (multiclass)", (),
          _pos, "> 0"),
    Param("seed", 0, "int", B, "bagging / feature sampling seed"),
    Param("boost_from_average", True, "bool", B,
          "initialize the score at the objective's optimal constant"),
    Param("forced_splits", None, "any", B,
          "JSON tree of forced top splits"),
    Param("forcedsplits_filename", "", "str", B,
          "file with forced-splits JSON"),
    Param("forcedbins_filename", "", "str", B,
          "JSON file with forced bin upper bounds per feature "
          "(config.h:596)"),
    Param("linear_tree", False, "bool", B,
          "ridge linear models in the leaves"),
    Param("linear_lambda", 0.0, "float", B, "linear-leaf ridge penalty",
          (), _nonneg, ">= 0"),
    Param("use_nesterov_acc", False, "bool", B,
          "Nesterov-accelerated boosting (momentum step before each "
          "gradient computation)"),
    Param("nesterov_acc_rate", 0.5, "float", B,
          "momentum rate (schedule version 0)", (), _frac, "(0, 1]"),
    Param("momentum_offset", 0, "int", B,
          "momentum is zero before this iteration", (), _nonneg, ">= 0"),
    Param("momentum_schedule_version", 1, "int", B,
          "0 = constant rate, 1 = 1 - 3/(6 + iter)", (),
          lambda v: v in (0, 1), "in {0, 1}"),
    Param("eval_at", None, "any", B,
          "ndcg / map truncation level(s); default 1,2,3,4,5 "
          "(config.h:968, DCGCalculator::DefaultEvalAt)",
          ("ndcg_eval_at", "ndcg_at", "map_eval_at", "map_at")),
    Param("auc_mu_weights", None, "list", B,
          "flat C x C loss-weight matrix for auc_mu"),
    Param("snapshot_freq", -1, "int", B,
          "save the model every k iterations during training (<= 0 = off)"),
    Param("device_resident_boosting", "auto", "str", B,
          "gpboost-tpu extension: compile the whole GPBoost training loop "
          "into one device program (auto / true / false; auto engages when "
          "the compiled runner is cached or >= 100 rounds at >= 10k rows)",
          (), lambda v: str(v).lower() in ("auto", "true", "false"),
          "auto / true / false"),
    Param("output_model", "gpboost_tpu_model.json", "str", B,
          "filename stem for snapshots / CLI model output",
          ("model_output", "model_out")),
    Param("objective_seed", None, "int", B,
          "seed for stochastic objectives (rank_xendcg)"),
    Param("tree_learner", "data", "str", B,
          "mesh partition of the tree learner: serial, data (row-sharded "
          "histograms), feature (feature-sharded histograms), voting "
          "(PV-Tree: per-device top_k feature vote, only the globally "
          "selected 2*top_k features' histograms cross ICI)",
          ("tree", "tree_type", "tree_learner_type")),
    Param("top_k", 20, "int", B,
          "voting-parallel learner: number of features each device "
          "nominates per leaf (voting_parallel_tree_learner.cpp)",
          ("topk",)),
    Param("enable_bundle", True, "bool", B,
          "Exclusive Feature Bundling (lossless: bundles only mutually "
          "exclusive sparse features; dataset.cpp FindGroups)",
          ("is_enable_bundle", "bundle")),
    Param("verbose", 1, "int", B, "verbosity (<0 silences warnings)",
          ("verbosity",)),
    Param("early_stopping_round", 0, "int", B,
          "stop when no validation-metric improvement in this many rounds "
          "(0 = off; config.h:375)",
          ("early_stopping_rounds", "early_stopping", "n_iter_no_change"),
          _nonneg, ">= 0"),
    Param("first_metric_only", False, "bool", B,
          "early stopping considers only the first metric (config.h:380)"),
    Param("metric_freq", 1, "int", B,
          "evaluate metrics every k iterations (config.h:977)",
          ("output_freq",), _pos, "> 0"),
    Param("is_provide_training_metric", False, "bool", B,
          "also evaluate metrics on the training data (config.h:981)",
          ("training_metric", "is_training_metric", "train_metric")),
    Param("max_delta_step", 0.0, "float", B,
          "cap on absolute leaf output, <= 0 = unlimited (config.h:389)",
          ("max_tree_output", "max_leaf_output")),
    Param("bagging_seed", 3, "int", B, "bagging RNG seed (config.h:319)",
          ("bagging_fraction_seed",)),
    Param("feature_fraction_seed", 2, "int", B,
          "feature-sampling RNG seed (config.h:355)"),
    Param("extra_seed", 6, "int", B,
          "extra_trees candidate-bin RNG seed (config.h:372)"),
    Param("feature_contri", None, "list", B,
          "per-feature split-gain multipliers (config.h:505)",
          ("feature_contrib", "fc", "fp", "feature_penalty")),
    Param("max_bin_by_feature", None, "list", B,
          "per-feature max_bin override, 0/absent = global max_bin "
          "(config.h:591)"),
    Param("use_missing", True, "bool", B,
          "disable to skip NaN handling: missing maps to the lowest bin "
          "(config.h:611)"),
    Param("zero_as_missing", False, "bool", B,
          "treat zeros (and unshown sparse entries) as missing "
          "(config.h:615)"),
    Param("refit_decay_rate", 0.9, "float", B,
          "old-leaf-value weight in task=refit / Booster.refit "
          "(config.h:520)", (), lambda v: 0.0 <= v <= 1.0, "[0, 1]"),
    Param("categorical_feature", None, "any", B,
          "categorical feature indices or name:<names> (Dataset param "
          "form; config.h:631)",
          ("cat_feature", "categorical_column", "cat_column")),
    Param("multi_error_top_k", 1, "int", B,
          "multi_error counts a row correct if the true class is within "
          "the top k scores (config.h:1002)", (), _pos, "> 0"),
    Param("saved_feature_importance_type", 0, "int", B,
          "importance type written to saved model files: 0 split counts, "
          "1 gains (config.h:533)", (),
          lambda v: v in (0, 1), "in {0, 1}"),
    # ---- DART ----------------------------------------------------------
    Param("drop_rate", 0.1, "float", D, "tree drop probability", (),
          _frac, "(0, 1]"),
    Param("max_drop", 50, "int", D, "max trees dropped per iteration"),
    Param("skip_drop", 0.5, "float", D,
          "probability of skipping the drop", (),
          lambda v: 0.0 <= v <= 1.0, "[0, 1]"),
    Param("uniform_drop", False, "bool", D, "uniform instead of weighted"),
    Param("xgboost_dart_mode", False, "bool", D, "xgboost normalization"),
    Param("drop_seed", 4, "int", D, "drop RNG seed"),
    # ---- GOSS ----------------------------------------------------------
    Param("top_rate", 0.2, "float", G, "large-gradient keep fraction", (),
          _frac, "(0, 1]"),
    Param("other_rate", 0.1, "float", G, "small-gradient sample fraction",
          (), _frac, "(0, 1]"),
    # ---- CEGB ----------------------------------------------------------
    Param("cegb_tradeoff", 1.0, "float", C,
          "multiplier on all CEGB penalties", (), _nonneg, ">= 0"),
    Param("cegb_penalty_split", 0.0, "float", C,
          "per-split penalty x data in leaf", (), _nonneg, ">= 0"),
    Param("cegb_penalty_feature_coupled", None, "list", C,
          "per-feature cost on first use in the model"),
    Param("cegb_penalty_feature_lazy", None, "list", C,
          "per-feature per-data-point on-demand cost"),
    # ---- objective extras ----------------------------------------------
    Param("alpha", 0.9, "float", O, "quantile level / huber slope", (),
          _pos, "> 0"),
    Param("fair_c", 1.0, "float", O, "fair-loss scale", (), _pos, "> 0"),
    Param("tweedie_variance_power", 1.5, "float", O,
          "tweedie power rho in (1, 2)", (),
          lambda v: 1.0 < v < 2.0, "(1, 2)"),
    Param("sigma", 1.0, "float", O, "tobit noise std dev", (), _pos, "> 0"),
    Param("yl", 0.0, "float", O, "tobit lower censoring bound"),
    Param("yu", 1.0, "float", O, "tobit upper censoring bound"),
    Param("sigmoid", 1.0, "float", O, "binary/lambdarank sigmoid scale",
          (), _pos, "> 0"),
    Param("is_unbalance", False, "bool", O,
          "weight the positive class by cnt_neg/cnt_pos (binary)",
          ("unbalance", "unbalanced_sets")),
    Param("scale_pos_weight", 1.0, "float", O,
          "explicit positive-class weight (binary; exclusive with "
          "is_unbalance)", (), _pos, "> 0"),
    Param("lambdarank_truncation_level", 30, "int", O,
          "lambdarank DCG truncation", (), _pos, "> 0"),
    Param("lambdarank_norm", True, "bool", O,
          "normalize lambdas for unbiased treatment of queries with "
          "different sizes (config.h:891)"),
    Param("label_gain", None, "list", O,
          "relevance gain per integer label level; default 2^i - 1 "
          "(config.h:895)"),
    Param("reg_sqrt", False, "bool", O,
          "fit on sqrt(label) and square predictions (regression; "
          "config.h:849)"),
    Param("poisson_max_delta_step", 0.7, "float", O,
          "poisson hessian safeguard: hess = exp(score + this) "
          "(config.h:868)", (), _pos, "> 0"),
    # ---- prediction ----------------------------------------------------
    Param("pred_early_stop", False, "bool", P,
          "row-wise prediction early stopping (binary/multiclass)"),
    Param("pred_early_stop_freq", 10, "int", P,
          "check margins every k iterations", (), _pos, "> 0"),
    Param("pred_early_stop_margin", 10.0, "float", P,
          "margin threshold (binary 2|raw|, multiclass top1-top2)", (),
          _pos, "> 0"),
    Param("start_iteration_predict", 0, "int", P,
          "CLI: first iteration used for prediction (config.h:647)", (),
          _nonneg, ">= 0"),
    Param("num_iteration_predict", -1, "int", P,
          "CLI: number of iterations used for prediction, <= 0 = all "
          "(config.h:651)"),
    Param("predict_raw_score", False, "bool", P,
          "CLI: output raw scores (config.h:656)",
          ("is_predict_raw_score", "predict_rawscore", "raw_score")),
    Param("predict_leaf_index", False, "bool", P,
          "CLI: output leaf indices (config.h:661)",
          ("is_predict_leaf_index", "leaf_index")),
    Param("predict_contrib", False, "bool", P,
          "CLI: output SHAP feature contributions (config.h:666)",
          ("is_predict_contrib", "contrib")),
    Param("predict_disable_shape_check", False, "bool", P,
          "skip the feature-count check at prediction (config.h:675)"),
    # ---- CLI / IO ------------------------------------------------------
    Param("task", "train", "str", IO,
          "CLI task: train, predict, refit, convert_model (config.h:98)",
          ("task_type",)),
    Param("config", "", "str", IO, "CLI config file path (config.h:93)",
          ("config_file",)),
    Param("data", "", "str", IO, "training data file (config.h:117)",
          ("train", "train_data", "train_data_file", "data_filename")),
    Param("valid", "", "str", IO,
          "validation data file(s), comma separated (config.h:122)",
          ("test", "valid_data", "valid_data_file", "test_data",
           "test_data_file", "valid_filenames")),
    Param("input_model", "", "str", IO,
          "model file to load (predict / refit / continue training; "
          "config.h:526)", ("model_input", "model_in")),
    Param("output_result", "GPBoost_predict_result.txt", "str", IO,
          "CLI prediction output file (config.h:601)",
          ("predict_result", "prediction_result", "predict_name",
           "pred_name", "name_pred")),
    Param("convert_model", "gpboost_prediction.c", "str", IO,
          "output file for task=convert_model (config.h:612)",
          ("convert_model_file",)),
    Param("convert_model_language", "cpp", "str", IO,
          "convert_model target language (only cpp; config.h:607)"),
    Param("header", False, "bool", IO,
          "data files have a header line (config.h:631)",
          ("has_header",)),
    Param("label_column", "", "str", IO,
          "label column index or name:<name> (config.h:640)", ("label",)),
    Param("weight_column", "", "str", IO,
          "weight column index or name:<name> (config.h:649)",
          ("weight",)),
    Param("group_column", "", "str", IO,
          "query/group column index or name:<name> (config.h:658)",
          ("group", "group_id", "query_column", "query", "query_id")),
    Param("ignore_column", "", "str", IO,
          "columns to drop at load: comma-separated indices or "
          "name:<names> (config.h:667)",
          ("ignore_feature", "blacklist")),
    Param("save_binary", False, "bool", IO,
          "save the Dataset to a binary file after loading "
          "(config.h:686)", ("is_save_binary", "is_save_binary_file")),
    # ---- GPBoost coupling ----------------------------------------------
    Param("train_gp_model_cov_pars", True, "bool", GP,
          "re-optimize covariance parameters each boosting iteration"),
    Param("reuse_learning_rates_gp_model", True, "bool", GP,
          "carry GD learning rates / L-BFGS curvature memory across the "
          "per-iteration covariance refits (config.h:181)"),
    Param("use_gp_model_for_validation", True, "bool", GP,
          "validation metrics include predicted random effects"),
    Param("leaves_newton_update", False, "bool", GP,
          "Newton leaf re-solve (H'Psi^-1 H)^-1 H'Psi^-1 r"),
    Param("line_search_step_length", False, "bool", GP,
          "optimal step length per tree"),
    # ---- GP model fitting ----------------------------------------------
    Param("optimizer_cov", None, "str", F,
          "gradient_descent, lbfgs, fisher_scoring, newton, nelder_mead, "
          "adam"),
    Param("optimizer_coef", None, "str", F, "wls or gradient_descent"),
    Param("maxit", 1000, "int", F, "max optimizer iterations", (),
          _pos, "> 0"),
    Param("lr_cov", None, "float", F, "covariance-parameter learning rate"),
    Param("lr_coef", 0.1, "float", F, "coefficient learning rate"),
    Param("acc_rate_cov", 0.5, "float", F, "Nesterov acceleration rate"),
    Param("delta_rel_conv", None, "float", F, "relative convergence "
          "tolerance"),
    Param("convergence_criterion", "relative_change_in_log_likelihood",
          "str", F, "relative_change_in_log_likelihood or "
          "relative_change_in_parameters"),
    Param("init_cov_pars", None, "list", F,
          "initial covariance parameters"),
    Param("init_coef", None, "list", F, "initial regression coefficients"),
    Param("init_aux_pars", None, "list", F,
          "initial auxiliary (likelihood) parameters"),
    Param("estimate_aux_pars", True, "bool", F,
          "estimate auxiliary likelihood parameters"),
    Param("estimate_cov_par_index", None, "list", F,
          "0/1 mask of covariance parameters to estimate"),
    Param("std_dev", False, "bool", F,
          "compute standard deviations of the estimates"),
    Param("trace", False, "bool", F, "print optimizer trajectory"),
    Param("cg_max_num_it", 1000, "int", F, "max CG iterations", (),
          _pos, "> 0"),
    Param("cg_max_num_it_tridiag", 1000, "int", F,
          "max CG iterations for Lanczos tridiagonalization", (),
          _pos, "> 0"),
    Param("cg_delta_conv", 1e-2, "float", F, "CG convergence tolerance",
          (), _pos, "> 0"),
    Param("num_rand_vec_trace", 50, "int", F,
          "stochastic-trace probe vectors", (), _pos, "> 0"),
    Param("reuse_rand_vec_trace", True, "bool", F,
          "reuse probe vectors across iterations"),
    Param("seed_rand_vec_trace", 1, "int", F, "probe-vector seed"),
    Param("cg_preconditioner_type", None, "str", F,
          "CG preconditioner: vadu / Sigma_inv_plus_BtWB (default; "
          "TPU-native diagonal of the same matrix) or pivoted_cholesky / "
          "fitc / predictive_process_plus_diagonal / nystrom (randomized-"
          "Nystrom low-rank+diagonal); unknown names raise"),
    Param("piv_chol_rank", 50, "int", F,
          "rank of the low-rank CG preconditioner (reference "
          "piv_chol_rank)", (), _pos, "> 0"),
)

# ---------------------------------------------------------------------------
# Reference parameters that are deliberately NOT applicable on TPU.
# Every key documented in the reference's ``include/LightGBM/config.h`` must
# be either registered above or listed here with the reason (the audit test
# ``test_config_registry.py::test_reference_config_key_closure`` enforces
# closure); passing one of these keys logs an informational no-op notice
# instead of an unknown-parameter warning.
NA_ON_TPU = {
    "num_threads": "XLA manages host and device threading; there is no "
                   "per-op thread-count knob",
    "device_type": "the JAX backend (cpu/tpu) is selected via JAX_PLATFORMS"
                   " / jax.config, not a training parameter",
    "gpu_platform_id": "OpenCL platform selection; TPU devices are "
                       "addressed via jax.devices() and the mesh",
    "gpu_device_id": "OpenCL device selection; see gpu_platform_id",
    "gpu_use_dp": "numeric precision is a global policy (x64 + "
                  "float32-matmul set at import), not a per-run flag",
    "num_gpu": "device counts come from the JAX mesh, not a parameter",
    "num_machines": "the socket/MPI linker layer is replaced by "
                    "jax.distributed.initialize + mesh collectives",
    "machines": "see num_machines",
    "machine_list_filename": "see num_machines",
    "local_listen_port": "see num_machines",
    "time_out": "see num_machines (socket handshake timeout)",
    "force_col_wise": "host histogram memory-layout heuristic; the TPU "
                      "histogram kernel layout is fixed at compile time",
    "force_row_wise": "see force_col_wise",
    "histogram_pool_size": "histograms are statically allocated on device; "
                           "no host-side histogram pool exists",
    "is_enable_sparse": "the dataset layout is dense-blocked (SURVEY §7); "
                        "sparse bin containers do not exist",
    "feature_pre_filter": "features are never pre-filtered at bin time; "
                          "min_data_in_leaf is enforced exactly by the "
                          "split finder",
    "deterministic": "training is always deterministic: pure-functional "
                     "JAX + explicitly seeded RNG",
    "bin_construct_sample_cnt": "bin boundaries are computed on the full "
                                "data, not a sample",
    "data_random_seed": "no sampling happens during bin construction "
                        "(see bin_construct_sample_cnt)",
    "two_round": "file loading is one native parse; the two-round "
                 "memory-saving strategy is not needed",
    "pre_partition": "distributed rows are sharded by the mesh layout, "
                     "not by pre-partitioned input files",
    "objective_before_parse": "internal artifact of the reference's "
                              "config parser",
}

_BY_NAME = {p.name: p for p in PARAMS}
ALIAS_TABLE = {}
for _p in PARAMS:
    for _a in _p.aliases:
        if _a in ALIAS_TABLE or _a in _BY_NAME:
            raise RuntimeError(f"duplicate parameter alias: {_a}")
        ALIAS_TABLE[_a] = _p.name


def get_param(name: str) -> Optional[Param]:
    return _BY_NAME.get(ALIAS_TABLE.get(name, name))


def canonical_name(name: str) -> str:
    return ALIAS_TABLE.get(name, name)


def _type_ok(p: Param, v) -> bool:
    import numbers
    if v is None:
        return True
    if p.ptype == "int":
        return (isinstance(v, numbers.Number)
                and not isinstance(v, complex) and float(v) == int(v))
    if p.ptype == "float":
        return isinstance(v, numbers.Number) and not isinstance(v, complex)
    if p.ptype == "bool":
        import numpy as _np
        return isinstance(v, (bool, _np.bool_, numbers.Integral))
    if p.ptype == "str":
        return isinstance(v, str)
    return True


def resolve_params(params: Optional[dict], validate: bool = True) -> dict:
    """Canonicalize a user parameter dict: resolve aliases to canonical
    names (canonical wins when both are present, like the reference's
    ``Config::KeyAliasTransform``) and validate types/ranges.

    Keys that are neither registered nor in :data:`NA_ON_TPU` trigger an
    'Unknown parameter' warning; NA-on-TPU keys log a documented no-op
    notice — nothing is ever silently dropped."""
    out = {}
    verbose = 1
    for key in ("verbose", "verbosity"):
        if params and key in params:
            try:
                verbose = int(params[key])
            except (TypeError, ValueError):
                pass
    for k, v in (params or {}).items():
        canon = ALIAS_TABLE.get(k, k)
        if canon not in _BY_NAME and verbose >= 0:
            from gpboost_tpu.utils.log import log_info, log_warning
            if canon in NA_ON_TPU:
                log_info(f"[gpboost_tpu] parameter '{k}' is not applicable "
                         f"on TPU and is ignored: {NA_ON_TPU[canon]}")
            else:
                log_warning(f"Unknown parameter: {k}")
        if canon in out and canon != k:
            continue  # canonical name already present
        if canon != k and canon in (params or {}):
            continue  # canonical key exists in the input; it wins
        out[canon] = v
    if validate:
        for k, v in out.items():
            p = _BY_NAME.get(k)
            if p is None or v is None:
                continue
            if not _type_ok(p, v):
                raise ValueError(
                    f"parameter '{k}' expects type {p.ptype}, got "
                    f"{type(v).__name__} ({v!r})")
            if p.check is not None and p.ptype in ("int", "float"):
                if not p.check(v):
                    raise ValueError(
                        f"parameter '{k}' = {v!r} violates constraint "
                        f"{p.check_desc}")
    return out


def generate_markdown() -> str:
    """Emit docs/PARAMETERS.md from the schema (the reference's
    ``parameter_generator.py`` docs-from-code pattern)."""
    lines = [
        "# Parameters",
        "",
        "Parameter surface of gpboost-tpu, mirroring the reference's",
        "`docs/Parameters.rst` (boosting) and `docs/Main_parameters.rst`",
        "(GP/RE engine). GENERATED from `gpboost_tpu/config.py` — edit the",
        "schema and run `python -m gpboost_tpu.config` to regenerate.",
        "",
    ]
    sections = []
    for p in PARAMS:
        if p.section not in sections:
            sections.append(p.section)
    for sec in sections:
        lines.append(f"## {sec}")
        lines.append("")
        lines.append("| parameter | default | type | aliases | constraint |"
                     " description |")
        lines.append("|---|---|---|---|---|---|")
        for p in PARAMS:
            if p.section != sec:
                continue
            default = "" if p.default is None else repr(p.default)
            aliases = ", ".join(p.aliases)
            lines.append(f"| `{p.name}` | {default} | {p.ptype} | {aliases}"
                         f" | {p.check_desc} | {p.desc} |")
        lines.append("")
    lines += [
        "## Reference parameters not applicable on TPU",
        "",
        "Every parameter documented in the reference's",
        "`include/LightGBM/config.h` is either registered above or listed",
        "here with the reason it does not exist in the TPU design. Passing",
        "one of these keys logs an informational no-op notice.",
        "",
        "| parameter | why it is n/a |",
        "|---|---|",
    ]
    for k in sorted(NA_ON_TPU):
        lines.append(f"| `{k}` | {NA_ON_TPU[k]} |")
    lines += [
        "",
        "## GPModel constructor",
        "",
        "Model-structure arguments (not dict parameters): `group_data`,",
        "`group_rand_coef_data` + `ind_effect_group_rand_coef`,",
        "`drop_intercept_group_rand_effect`, `gp_coords`,",
        "`gp_rand_coef_data`, `cov_function`, `cov_fct_shape`,",
        "`cov_fct_taper_range`, `cov_fct_taper_shape`, `gp_approx`,",
        "`num_neighbors`, `vecchia_ordering`, `num_ind_points`,",
        "`cover_tree_radius`, `ind_points_selection`,",
        "`matrix_inversion_method`, `seed`, `cluster_ids`, `likelihood`,",
        "`likelihood_additional_param`, `weights`, `offset`, `dtype`.",
        "See the GPModel docstring for details.",
        "",
    ]
    return "\n".join(lines)


def write_docs(path: Optional[str] = None) -> str:
    import os
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "PARAMETERS.md")
    md = generate_markdown()
    with open(path, "w") as f:
        f.write(md)
    return path


if __name__ == "__main__":
    print(write_docs())
