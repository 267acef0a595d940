context("GPBoost algorithm: gpb.train / gpb.cv (reticulate bindings)")

make_boost_fixture <- function() {
  n <- 400
  m <- 40
  group <- rep(1:m, each = n / m)
  b <- 0.8 * qnorm(sim_rand_unif(n = m, init_c = 0.52))
  X <- matrix(sim_rand_unif(n = n * 2, init_c = 0.3), ncol = 2)
  f_x <- 2 * sin(4 * X[, 1]) + X[, 2]
  y <- f_x + b[group] + 0.3 * qnorm(sim_rand_unif(n = n, init_c = 0.77))
  list(n = n, group = group, X = X, y = y, f_x = f_x)
}

test_that("gpb.train with a GPModel learns the fixed effects", {
  fx <- make_boost_fixture()
  gp_model <- GPModel(group_data = fx$group, likelihood = "gaussian")
  dtrain <- gpb.Dataset(data = fx$X, label = fx$y)
  bst <- gpb.train(params = list(learning_rate = 0.1,
                                 min_data_in_leaf = 10, verbose = -1),
                   data = dtrain, gp_model = gp_model, nrounds = 30)
  pred <- predict(bst, data = fx$X, group_data_pred = fx$group,
                  predict_var = TRUE)
  rmse <- sqrt(mean((pred$response_mean - fx$y)^2))
  expect_lt(rmse, 0.5)
  expect_true(all(pred$response_var > 0))
  # covariance parameters were estimated alongside the trees
  expect_true(all(is.finite(get_cov_pars(gp_model))))
})

test_that("early stopping on test_neg_log_likelihood works end-to-end", {
  fx <- make_boost_fixture()
  itr <- seq_len(fx$n) %% 4 != 0
  gp_model <- GPModel(group_data = fx$group[itr], likelihood = "gaussian")
  set_prediction_data(gp_model, group_data_pred = fx$group[!itr])
  dtrain <- gpb.Dataset(data = fx$X[itr, ], label = fx$y[itr])
  dvalid <- gpb.Dataset.create.valid(dtrain, data = fx$X[!itr, ],
                                     label = fx$y[!itr])
  bst <- gpb.train(params = list(learning_rate = 0.15,
                                 metric = "test_neg_log_likelihood",
                                 min_data_in_leaf = 10, verbose = -1),
                   data = dtrain, gp_model = gp_model, nrounds = 50,
                   valids = list(valid = dvalid),
                   early_stopping_rounds = 5, verbose_eval = FALSE)
  expect_gt(bst$best_iteration, 0)
  curve <- gpb.get.eval.result(bst, "valid", "test_neg_log_likelihood")
  expect_lt(min(curve), curve[1])
})

test_that("gpb.cv aggregates per-fold curves", {
  fx <- make_boost_fixture()
  gp_model <- GPModel(group_data = fx$group, likelihood = "gaussian")
  dtrain <- gpb.Dataset(data = fx$X, label = fx$y)
  cvb <- gpb.cv(params = list(learning_rate = 0.1, min_data_in_leaf = 10,
                              verbose = -1),
                data = dtrain, gp_model = gp_model, nrounds = 10,
                nfold = 4, verbose_eval = FALSE)
  key <- grep("mean$", names(cvb), value = TRUE)[1]
  expect_equal(length(cvb[[key]]), 10)
})

test_that("booster save/load round-trips combined predictions", {
  fx <- make_boost_fixture()
  gp_model <- GPModel(group_data = fx$group, likelihood = "gaussian")
  dtrain <- gpb.Dataset(data = fx$X, label = fx$y)
  bst <- gpb.train(params = list(verbose = -1, min_data_in_leaf = 10),
                   data = dtrain, gp_model = gp_model, nrounds = 10)
  fn <- tempfile(fileext = ".json")
  gpb.save(bst, filename = fn)
  bst2 <- gpb.load(filename = fn)
  p1 <- predict(bst, data = fx$X, group_data_pred = fx$group)
  p2 <- predict(bst2, data = fx$X, group_data_pred = fx$group)
  expect_lt(sum(abs(p1$response_mean - p2$response_mean)), 1e-8)
})

test_that("feature importance is available in both flavors", {
  fx <- make_boost_fixture()
  dtrain <- gpb.Dataset(data = fx$X, label = fx$y)
  bst <- gpb.train(params = list(verbose = -1, min_data_in_leaf = 10),
                   data = dtrain, nrounds = 10)
  imp_split <- gpb.importance(bst, importance_type = "split")
  imp_gain <- gpb.importance(bst, importance_type = "gain")
  expect_equal(length(imp_split), 2)
  expect_true(sum(imp_gain) > 0)
})
