# R interface to gpboost_tpu via reticulate.
#
# Mirrors the reference GPBoost R API (R-package/R/GPModel.R, gpb.train.R,
# gpb.Dataset.R, gpb.cv.R in TimGyger/GPBoost) as thin S3 wrappers around the
# Python package: the numerical engine is the TPU-native JAX implementation.

.gpb_env <- new.env(parent = emptyenv())

.gpb <- function() {
  if (is.null(.gpb_env$mod)) {
    .gpb_env$mod <- reticulate::import("gpboost_tpu", delay_load = FALSE)
    .gpb_env$np <- reticulate::import("numpy")
  }
  .gpb_env$mod
}

.np <- function() {
  .gpb()
  .gpb_env$np
}

.as_matrix <- function(x) {
  if (is.null(x)) return(NULL)
  if (is.data.frame(x)) x <- as.matrix(x)
  if (is.vector(x) && !is.list(x)) x <- as.matrix(x)
  x
}

.as_np <- function(x, dtype = NULL) {
  if (is.null(x)) return(NULL)
  if (is.factor(x)) x <- as.character(x)
  reticulate::np_array(.as_matrix_keep_vec(x), dtype = dtype)
}

.as_matrix_keep_vec <- function(x) {
  if (is.data.frame(x)) as.matrix(x) else x
}

.params_py <- function(params) {
  if (is.null(params)) return(reticulate::dict())
  reticulate::r_to_py(params)
}

# ---------------------------------------------------------------------------
# GPModel

#' Create a GPModel (Gaussian process and/or grouped random effects)
#'
#' Mirrors \code{GPModel} in the reference R package
#' (R-package/R/GPModel.R:2610).
GPModel <- function(likelihood = "gaussian", group_data = NULL,
                    group_rand_coef_data = NULL,
                    ind_effect_group_rand_coef = NULL,
                    drop_intercept_group_rand_effect = NULL,
                    gp_coords = NULL, gp_rand_coef_data = NULL,
                    cov_function = "matern", cov_fct_shape = 1.5,
                    gp_approx = "none", cov_fct_taper_range = 1,
                    cov_fct_taper_shape = 1, num_neighbors = NULL,
                    vecchia_ordering = "random",
                    ind_points_selection = "kmeans++",
                    num_ind_points = 500L, cover_tree_radius = 1,
                    matrix_inversion_method = "cholesky", seed = 0L,
                    cluster_ids = NULL,
                    likelihood_additional_param = NULL, weights = NULL,
                    free_raw_data = FALSE, num_data = NULL) {
  py <- .gpb()$GPModel(
    group_data = .as_np(group_data),
    group_rand_coef_data = .as_np(group_rand_coef_data),
    ind_effect_group_rand_coef = ind_effect_group_rand_coef,
    drop_intercept_group_rand_effect = drop_intercept_group_rand_effect,
    gp_coords = .as_np(gp_coords),
    gp_rand_coef_data = .as_np(gp_rand_coef_data),
    cov_function = cov_function, cov_fct_shape = cov_fct_shape,
    gp_approx = gp_approx, cov_fct_taper_range = cov_fct_taper_range,
    cov_fct_taper_shape = cov_fct_taper_shape,
    num_neighbors = if (is.null(num_neighbors)) NULL else
      as.integer(num_neighbors),
    vecchia_ordering = vecchia_ordering,
    ind_points_selection = ind_points_selection,
    num_ind_points = as.integer(num_ind_points),
    cover_tree_radius = cover_tree_radius,
    matrix_inversion_method = matrix_inversion_method,
    seed = as.integer(seed),
    cluster_ids = .as_np(cluster_ids),
    likelihood = likelihood,
    likelihood_additional_param = likelihood_additional_param,
    weights = .as_np(weights),
    num_data = if (is.null(num_data)) NULL else as.integer(num_data))
  structure(list(py = py), class = "GPModel")
}

#' Fit a GPModel (generic, matching the reference's \code{fit})
fit <- function(gp_model, ...) UseMethod("fit")

fit.GPModel <- function(gp_model, y, X = NULL, params = list(),
                        offset = NULL, fixed_effects = NULL, ...) {
  if (!is.null(fixed_effects)) offset <- fixed_effects
  gp_model$py$fit(y = .as_np(y), X = .as_np(X), params = .params_py(params),
                  offset = .as_np(offset))
  invisible(gp_model)
}

#' Create and fit a GPModel in one call (GPModel.R:2826)
fitGPModel <- function(likelihood = "gaussian", group_data = NULL,
                       group_rand_coef_data = NULL,
                       ind_effect_group_rand_coef = NULL,
                       drop_intercept_group_rand_effect = NULL,
                       gp_coords = NULL, gp_rand_coef_data = NULL,
                       cov_function = "matern", cov_fct_shape = 1.5,
                       gp_approx = "none", cov_fct_taper_range = 1,
                       cov_fct_taper_shape = 1, num_neighbors = NULL,
                       vecchia_ordering = "random",
                       ind_points_selection = "kmeans++",
                       num_ind_points = 500L, cover_tree_radius = 1,
                       matrix_inversion_method = "cholesky", seed = 0L,
                       cluster_ids = NULL,
                       likelihood_additional_param = NULL, weights = NULL,
                       y = NULL, X = NULL, params = list(), offset = NULL) {
  m <- GPModel(likelihood = likelihood, group_data = group_data,
               group_rand_coef_data = group_rand_coef_data,
               ind_effect_group_rand_coef = ind_effect_group_rand_coef,
               drop_intercept_group_rand_effect =
                 drop_intercept_group_rand_effect,
               gp_coords = gp_coords, gp_rand_coef_data = gp_rand_coef_data,
               cov_function = cov_function, cov_fct_shape = cov_fct_shape,
               gp_approx = gp_approx,
               cov_fct_taper_range = cov_fct_taper_range,
               cov_fct_taper_shape = cov_fct_taper_shape,
               num_neighbors = num_neighbors,
               vecchia_ordering = vecchia_ordering,
               ind_points_selection = ind_points_selection,
               num_ind_points = num_ind_points,
               cover_tree_radius = cover_tree_radius,
               matrix_inversion_method = matrix_inversion_method,
               seed = seed, cluster_ids = cluster_ids,
               likelihood_additional_param = likelihood_additional_param,
               weights = weights)
  fit(m, y = y, X = X, params = params, offset = offset)
}

predict.GPModel <- function(object, y = NULL, group_data_pred = NULL,
                            group_rand_coef_data_pred = NULL,
                            gp_coords_pred = NULL,
                            gp_rand_coef_data_pred = NULL,
                            cluster_ids_pred = NULL, X_pred = NULL,
                            predict_cov_mat = FALSE, predict_var = FALSE,
                            cov_pars = NULL, predict_response = TRUE,
                            offset = NULL, offset_pred = NULL,
                            fixed_effects = NULL,
                            fixed_effects_pred = NULL, ...) {
  if (is.null(fixed_effects)) fixed_effects <- offset
  if (is.null(fixed_effects_pred)) fixed_effects_pred <- offset_pred
  res <- object$py$predict(
    y = .as_np(y), group_data_pred = .as_np(group_data_pred),
    group_rand_coef_data_pred = .as_np(group_rand_coef_data_pred),
    gp_coords_pred = .as_np(gp_coords_pred),
    gp_rand_coef_data_pred = .as_np(gp_rand_coef_data_pred),
    cluster_ids_pred = .as_np(cluster_ids_pred),
    X_pred = .as_np(X_pred), predict_cov_mat = predict_cov_mat,
    predict_var = predict_var, cov_pars = cov_pars,
    predict_response = predict_response,
    fixed_effects = .as_np(fixed_effects),
    fixed_effects_pred = .as_np(fixed_effects_pred))
  lapply(reticulate::py_to_r(res), function(v) v)
}

neg_log_likelihood <- function(gp_model, ...) UseMethod("neg_log_likelihood")

neg_log_likelihood.GPModel <- function(gp_model, cov_pars, y, aux_pars = NULL,
                               fixed_effects = NULL) {
  gp_model$py$neg_log_likelihood(cov_pars = cov_pars, y = .as_np(y),
                                 aux_pars = aux_pars,
                                 fixed_effects = .as_np(fixed_effects))
}

get_cov_pars <- function(gp_model, ...) UseMethod("get_cov_pars")

get_cov_pars.GPModel <- function(gp_model, std_err = FALSE) {
  out <- reticulate::py_to_r(gp_model$py$get_cov_pars(std_err = std_err))
  out
}

get_coef <- function(gp_model, ...) UseMethod("get_coef")

get_coef.GPModel <- function(gp_model, std_err = FALSE) {
  reticulate::py_to_r(gp_model$py$get_coef(std_err = std_err))
}

get_aux_pars <- function(gp_model, ...) UseMethod("get_aux_pars")

get_aux_pars.GPModel <- function(gp_model) {
  reticulate::py_to_r(gp_model$py$get_aux_pars())
}

get_num_optim_iter <- function(gp_model) {
  as.integer(gp_model$py$get_num_optim_iter())
}

set_optim_params <- function(gp_model, ...) UseMethod("set_optim_params")

set_optim_params.GPModel <- function(gp_model, params = list()) {
  gp_model$py$set_optim_params(params = .params_py(params))
  invisible(gp_model)
}

set_prediction_data <- function(gp_model, ...) UseMethod("set_prediction_data")

set_prediction_data.GPModel <- function(gp_model, vecchia_pred_type = NULL,
                                num_neighbors_pred = NULL,
                                nsim_var_pred = NULL,
                                cg_delta_conv_pred = NULL,
                                group_data_pred = NULL,
                                group_rand_coef_data_pred = NULL,
                                gp_coords_pred = NULL,
                                gp_rand_coef_data_pred = NULL,
                                cluster_ids_pred = NULL, X_pred = NULL) {
  gp_model$py$set_prediction_data(
    vecchia_pred_type = vecchia_pred_type,
    num_neighbors_pred = if (is.null(num_neighbors_pred)) NULL else
      as.integer(num_neighbors_pred),
    nsim_var_pred = if (is.null(nsim_var_pred)) NULL else
      as.integer(nsim_var_pred),
    cg_delta_conv_pred = cg_delta_conv_pred,
    group_data_pred = .as_np(group_data_pred),
    group_rand_coef_data_pred = .as_np(group_rand_coef_data_pred),
    gp_coords_pred = .as_np(gp_coords_pred),
    gp_rand_coef_data_pred = .as_np(gp_rand_coef_data_pred),
    cluster_ids_pred = .as_np(cluster_ids_pred), X_pred = .as_np(X_pred))
  invisible(gp_model)
}

predict_training_data_random_effects <- function(gp_model, ...) UseMethod("predict_training_data_random_effects")

predict_training_data_random_effects.GPModel <- function(gp_model,
                                                 predict_var = FALSE) {
  reticulate::py_to_r(
    gp_model$py$predict_training_data_random_effects(
      predict_var = predict_var))
}

summary.GPModel <- function(object, ...) {
  object$py$summary()
  invisible(object)
}

print.GPModel <- function(x, ...) {
  cat("GPModel (gpboost_tpu)\n")
  invisible(x)
}

saveGPModel <- function(gp_model, filename) {
  gp_model$py$save_model(filename)
  invisible(gp_model)
}

loadGPModel <- function(filename) {
  py <- .gpb()$GPModel$load_model(filename)
  structure(list(py = py), class = "GPModel")
}

# ---------------------------------------------------------------------------
# Dataset / boosting

gpb.Dataset <- function(data, params = list(), reference = NULL,
                        colnames = NULL, categorical_feature = NULL,
                        label = NULL, weight = NULL, group = NULL,
                        init_score = NULL, free_raw_data = FALSE) {
  cf <- categorical_feature
  if (!is.null(cf) && is.numeric(cf)) cf <- as.integer(cf - 1L)  # 1- to 0-based
  py <- .gpb()$Dataset(
    data = .as_np(.as_matrix(data)), label = .as_np(label),
    weight = .as_np(weight), group = .as_np(group),
    init_score = .as_np(init_score),
    categorical_feature = cf,
    feature_name = colnames,
    reference = if (is.null(reference)) NULL else reference$py,
    params = .params_py(params))
  structure(list(py = py), class = "gpb.Dataset")
}

gpb.Dataset.construct <- function(dataset) {
  dataset$py$construct()
  invisible(dataset)
}

gpb.Dataset.create.valid <- function(dataset, data, label = NULL, ...) {
  gpb.Dataset(data = data, label = label, reference = dataset, ...)
}

gpb.train <- function(params = list(), data, nrounds = 100L,
                      gp_model = NULL, valids = list(), obj = NULL,
                      eval = NULL, verbose = 1L, record = TRUE,
                      eval_freq = 1L, early_stopping_rounds = NULL,
                      init_model = NULL, verbose_eval = NULL,
                      use_gp_model_for_validation = TRUE,
                      train_gp_model_cov_pars = TRUE, ...) {
  valid_sets <- NULL
  valid_names <- NULL
  if (length(valids) > 0) {
    valid_sets <- lapply(valids, function(v) v$py)
    valid_names <- names(valids)
  }
  if (is.null(verbose_eval)) verbose_eval <- verbose > 0
  evals <- reticulate::dict()
  py <- .gpb()$train(
    params = .params_py(params), train_set = data$py,
    num_boost_round = as.integer(nrounds),
    gp_model = if (is.null(gp_model)) NULL else gp_model$py,
    valid_sets = valid_sets, valid_names = valid_names,
    early_stopping_rounds = if (is.null(early_stopping_rounds)) NULL else
      as.integer(early_stopping_rounds),
    evals_result = if (record) evals else NULL,
    verbose_eval = verbose_eval,
    use_gp_model_for_validation = use_gp_model_for_validation,
    train_gp_model_cov_pars = train_gp_model_cov_pars)
  bst <- list(py = py, gp_model = gp_model,
              best_iteration = as.integer(py$best_iteration))
  out <- structure(bst, class = "gpb.Booster")
  if (record) attr(out, "evals_result") <- reticulate::py_to_r(evals)
  out
}

#' Convenience one-call interface (reference gpboost.R)
gpboost <- function(data, label = NULL, params = list(), nrounds = 100L,
                    gp_model = NULL, verbose = 1L, ...) {
  if (!inherits(data, "gpb.Dataset")) {
    data <- gpb.Dataset(data = data, label = label)
  }
  gpb.train(params = params, data = data, nrounds = nrounds,
            gp_model = gp_model, verbose = verbose, ...)
}

predict.gpb.Booster <- function(object, data, start_iteration = NULL,
                                num_iteration = NULL, rawscore = FALSE,
                                predleaf = FALSE, predcontrib = FALSE,
                                group_data_pred = NULL,
                                group_rand_coef_data_pred = NULL,
                                gp_coords_pred = NULL,
                                gp_rand_coef_data_pred = NULL,
                                cluster_ids_pred = NULL,
                                predict_var = FALSE, pred_latent = FALSE,
                                ...) {
  res <- object$py$predict(
    data = .as_np(.as_matrix(data)),
    num_iteration = if (is.null(num_iteration)) NULL else
      as.integer(num_iteration),
    raw_score = rawscore, pred_leaf = predleaf, pred_contrib = predcontrib,
    group_data_pred = .as_np(group_data_pred),
    group_rand_coef_data_pred = .as_np(group_rand_coef_data_pred),
    gp_coords_pred = .as_np(gp_coords_pred),
    gp_rand_coef_data_pred = .as_np(gp_rand_coef_data_pred),
    cluster_ids_pred = .as_np(cluster_ids_pred),
    predict_var = predict_var, pred_latent = pred_latent)
  reticulate::py_to_r(res)
}

gpb.save <- function(booster, filename, ...) {
  booster$py$save_model(filename)
  invisible(booster)
}

gpb.load <- function(filename) {
  py <- .gpb()$Booster(model_file = filename)
  structure(list(py = py), class = "gpb.Booster")
}

gpb.importance <- function(model, importance_type = "split", ...) {
  imp <- reticulate::py_to_r(
    model$py$feature_importance(importance_type = importance_type))
  imp
}

gpb.get.eval.result <- function(booster, data_name, eval_name, ...) {
  er <- attr(booster, "evals_result")
  if (is.null(er)) stop("no evaluation results recorded")
  er[[data_name]][[eval_name]]
}

gpb.cv <- function(params = list(), data, nrounds = 100L, nfold = 4L,
                   gp_model = NULL, verbose = 1L,
                   early_stopping_rounds = NULL,
                   use_gp_model_for_validation = TRUE, ...) {
  res <- .gpb()$cv(
    params = .params_py(params), train_set = data$py,
    num_boost_round = as.integer(nrounds), nfold = as.integer(nfold),
    gp_model = if (is.null(gp_model)) NULL else gp_model$py,
    early_stopping_rounds = if (is.null(early_stopping_rounds)) NULL else
      as.integer(early_stopping_rounds),
    verbose_eval = verbose > 0,
    use_gp_model_for_validation = use_gp_model_for_validation)
  reticulate::py_to_r(res)
}

gpb.grid.search.tune.parameters <- function(param_grid, data,
                                            params = list(),
                                            nrounds = 100L, gp_model = NULL,
                                            nfold = 4L, verbose_eval = 1L,
                                            ...) {
  res <- .gpb()$grid_search_tune_parameters(
    param_grid = reticulate::r_to_py(param_grid),
    params = .params_py(params), train_set = data$py,
    num_try_random = NULL,
    nfold = as.integer(nfold),
    gp_model = if (is.null(gp_model)) NULL else gp_model$py,
    num_boost_round = as.integer(nrounds))
  reticulate::py_to_r(res)
}

# ---------------------------------------------------------------------------
# Interpretation / plotting / serialization surface
# (reference R-package/R: gpb.interprete.R, gpb.plot.importance.R,
#  gpb.plot.interpretation.R, gpb.plot.partial.dependence.R,
#  gpb.model.dt.tree.R, saveRDS.gpb.Booster.R / readRDS.gpb.Booster.R,
#  gpb.convert_with_rules.R)

#' Per-prediction feature contributions (gpb.interprete.R): one data.frame
#' per requested row with (Feature, Contribution) sorted by |Contribution|,
#' computed from exact TreeSHAP values (pred_contrib).
gpb.interprete <- function(model, data, idxset, num_iteration = NULL) {
  data <- .as_matrix(data)
  contrib <- predict.gpb.Booster(model, data[idxset, , drop = FALSE],
                                 num_iteration = num_iteration,
                                 pred_contrib = TRUE)
  contrib <- .as_matrix(contrib)
  fn <- reticulate::py_to_r(model$py$feature_name())
  lapply(seq_len(nrow(contrib)), function(i) {
    vals <- contrib[i, seq_along(fn)]
    df <- data.frame(Feature = fn, Contribution = vals,
                     stringsAsFactors = FALSE)
    df[order(-abs(df$Contribution)), , drop = FALSE]
  })
}

#' Barplot of feature importances (gpb.plot.importance.R).
gpb.plot.importance <- function(tree_imp = NULL, model = NULL, top_n = 10L,
                                measure = "Gain", left_margin = 10L,
                                cex = NULL, ...) {
  if (is.null(tree_imp)) {
    itype <- if (tolower(measure) == "gain") "gain" else "split"
    imp <- gpb.importance(model, importance_type = itype)
    fn <- reticulate::py_to_r(model$py$feature_name())
    tree_imp <- data.frame(Feature = fn, Value = as.numeric(imp),
                           stringsAsFactors = FALSE)
  }
  tree_imp <- tree_imp[order(-tree_imp[[2L]]), , drop = FALSE]
  tree_imp <- utils::head(tree_imp, n = top_n)
  op <- graphics::par(mar = c(4, left_margin, 2, 1))
  on.exit(graphics::par(op))
  graphics::barplot(rev(tree_imp[[2L]]), names.arg = rev(tree_imp$Feature),
                    horiz = TRUE, las = 1, cex.names = cex, ...)
  invisible(tree_imp)
}

#' Barplot of one gpb.interprete() result (gpb.plot.interpretation.R).
gpb.plot.interpretation <- function(tree_interpretation_dt, top_n = 10L,
                                    cols = 1L, left_margin = 10L,
                                    cex = NULL, ...) {
  dt <- utils::head(tree_interpretation_dt, n = top_n)
  op <- graphics::par(mar = c(4, left_margin, 2, 1))
  on.exit(graphics::par(op))
  graphics::barplot(rev(dt$Contribution), names.arg = rev(dt$Feature),
                    horiz = TRUE, las = 1, cex.names = cex, ...)
  invisible(dt)
}

#' Partial dependence plot (gpb.plot.partial.dependence.R): average
#' prediction over a grid of one feature, all other columns at their
#' observed values.
gpb.plot.partial.dependence <- function(model, data, variable,
                                        n_pts = 100L,
                                        subsample = pmin(1, n_pts * 100 /
                                                         nrow(data)),
                                        discrete_x = FALSE,
                                        which_class = NULL,
                                        xlab = variable, ylab = "",
                                        type = if (discrete_x) "p" else "b",
                                        main = "", return_plot_data = FALSE,
                                        ...) {
  data <- .as_matrix(data)
  if (is.character(variable)) {
    variable <- match(variable, colnames(data))
  }
  if (subsample < 1) {
    keep <- sample.int(nrow(data), size = max(1L, floor(subsample *
                                                        nrow(data))))
    data <- data[keep, , drop = FALSE]
  }
  xs <- if (discrete_x) sort(unique(data[, variable])) else
    seq(min(data[, variable]), max(data[, variable]), length.out = n_pts)
  ys <- vapply(xs, function(v) {
    d <- data
    d[, variable] <- v
    mean(predict.gpb.Booster(model, d))
  }, numeric(1))
  graphics::plot(xs, ys, type = type, xlab = xlab, ylab = ylab,
                 main = main, ...)
  if (return_plot_data) {
    return(invisible(data.frame(x = xs, y = ys)))
  }
  invisible(NULL)
}

#' Tree structure as a data.frame (gpb.model.dt.tree.R / the python
#' Booster.trees_to_dataframe).
gpb.model.dt.tree <- function(model, num_iteration = NULL) {
  df <- reticulate::py_to_r(model$py$trees_to_dataframe())
  if (!is.null(num_iteration)) {
    df <- df[df$tree_index < num_iteration, , drop = FALSE]
  }
  df
}

#' RDS round-trip for boosters (saveRDS.gpb.Booster.R / readRDS.gpb.Booster.R):
#' the handle serializes through the text model format.
saveRDS.gpb.Booster <- function(object, file, ascii = FALSE, version = NULL,
                                compress = TRUE, refhook = NULL,
                                raw = TRUE) {
  object$raw_model <- object$py$model_to_string()
  payload <- object[names(object) != "py"]
  class(payload) <- "gpb.Booster.saved"
  saveRDS(payload, file = file, ascii = ascii, version = version,
          compress = compress, refhook = refhook)
  invisible(object)
}

readRDS.gpb.Booster <- function(file, refhook = NULL) {
  payload <- readRDS(file = file, refhook = refhook)
  py <- .gpb()$Booster(model_str = payload$raw_model)
  out <- structure(list(py = py), class = "gpb.Booster")
  for (nm in setdiff(names(payload), c("py", "raw_model"))) {
    out[[nm]] <- payload[[nm]]
  }
  out
}

#' Convert factor/character columns to numeric codes with reusable rules
#' (gpb.convert_with_rules.R) — pure R, no python round trip.
gpb.convert_with_rules <- function(data, rules = NULL) {
  data <- as.data.frame(data)
  if (is.null(rules)) rules <- list()
  for (cn in colnames(data)) {
    col <- data[[cn]]
    if (is.character(col)) col <- factor(col)
    if (is.factor(col)) {
      if (is.null(rules[[cn]])) {
        lv <- levels(col)
        rules[[cn]] <- stats::setNames(seq_along(lv), lv)
      }
      data[[cn]] <- as.numeric(rules[[cn]][as.character(col)])
    } else if (is.logical(col)) {
      data[[cn]] <- as.numeric(col)
    }
  }
  list(data = data, rules = rules)
}

# ---------------------------------------------------------------------------
# Dataset surface completion (reference gpb.Dataset.R): save / categorical /
# reference setters, getinfo/setinfo/slice S3 generics, dim/dimnames

#' Save a gpb.Dataset to a binary file (reference gpb.Dataset.save)
gpb.Dataset.save <- function(dataset, fname) {
  dataset$py$save_binary(fname)
  invisible(dataset)
}

#' Set categorical features (reference gpb.Dataset.set.categorical;
#' 1-based R indices convert to 0-based)
gpb.Dataset.set.categorical <- function(dataset, categorical_feature) {
  cf <- categorical_feature
  if (is.numeric(cf)) cf <- as.integer(cf - 1L)
  dataset$py$set_categorical_feature(cf)
  invisible(dataset)
}

#' Align a validation Dataset's binning with its training Dataset
#' (reference gpb.Dataset.set.reference)
gpb.Dataset.set.reference <- function(dataset, reference) {
  dataset$py$set_reference(reference$py)
  invisible(dataset)
}

getinfo <- function(dataset, ...) UseMethod("getinfo")

#' Get a Dataset information field: label / weight / group / init_score
getinfo.gpb.Dataset <- function(dataset, name, ...) {
  out <- dataset$py$get_field(name)
  if (is.null(out)) NULL else as.numeric(out)
}

setinfo <- function(dataset, ...) UseMethod("setinfo")

#' Set a Dataset information field
setinfo.gpb.Dataset <- function(dataset, name, info, ...) {
  dataset$py$set_field(name, .as_np(info))
  invisible(dataset)
}

slice <- function(dataset, ...) UseMethod("slice")

#' Row subset of a Dataset (reference slice.gpb.Dataset; 1-based indices)
slice.gpb.Dataset <- function(dataset, idxset, ...) {
  py <- dataset$py$subset(as.integer(idxset - 1L))
  structure(list(py = py), class = "gpb.Dataset")
}

dim.gpb.Dataset <- function(x) {
  c(as.integer(x$py$num_data), as.integer(x$py$num_features))
}

dimnames.gpb.Dataset <- function(x) {
  list(NULL, as.character(x$py$feature_name))
}

`dimnames<-.gpb.Dataset` <- function(x, value) {
  x$py$set_feature_name(as.list(as.character(value[[2L]])))
  x
}

#' Dump a Booster to a JSON string (reference gpb.dump)
gpb.dump <- function(booster, num_iteration = NULL) {
  booster$py$model_to_string()
}

#' Nested grouping levels helper (reference get_nested_categories)
get_nested_categories <- function(outer_var, inner_var) {
  .gpb()$get_nested_categories(.as_np(outer_var), .as_np(inner_var))
}

#' 2-D interaction partial dependence plot
#' (reference gpb.plot.part.dep.interact)
gpb.plot.part.dep.interact <- function(model, data, variables,
                                       n.pt.per.var = 20L, ...) {
  vars <- variables
  if (is.numeric(vars)) vars <- as.integer(vars - 1L)
  .gpb()$plotting$partial_dependence_plot_2d(
    model$py, .as_np(.as_matrix(data)), as.list(vars),
    num_points = as.integer(n.pt.per.var))
}
