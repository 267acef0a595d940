context("GPModel_gaussian_process (reticulate bindings)")

f <- make_gp_fixture()
coord_test <- matrix(c(0.1, 0.9, 0.2, 0.4, 0.7, 0.55), ncol = 2,
                     byrow = TRUE)

test_that("exponential GP negative log-likelihood matches the golden value", {
  gp_model <- GPModel(gp_coords = f$coords, cov_function = "exponential")
  nll <- neg_log_likelihood(gp_model, cov_pars = c(0.1, 1.6, 0.2), y = f$y)
  expect_lt(abs(nll - 124.2549533), TOLERANCE_STRICT)
})

test_that("matern 1.5 / 2.5 NLL match the golden values", {
  m15 <- GPModel(gp_coords = f$coords, cov_function = "matern",
                 cov_fct_shape = 1.5)
  expect_lt(abs(neg_log_likelihood(m15, cov_pars = c(0.1, 1.6, 0.2),
                                   y = f$y) - 141.3502172),
            TOLERANCE_STRICT)
  m25 <- GPModel(gp_coords = f$coords, cov_function = "matern",
                 cov_fct_shape = 2.5)
  expect_lt(abs(neg_log_likelihood(m25, cov_pars = c(0.1, 1.6, 0.2),
                                   y = f$y) - 158.1111626),
            TOLERANCE_STRICT)
})

test_that("fisher-scoring fit reaches the reference optimum", {
  iu <- upper.tri(f$D)
  init <- c(var(f$y) / 2, var(f$y) / 2, mean(f$D[iu]) / 3)
  gp_model <- fitGPModel(gp_coords = f$coords, cov_function = "exponential",
                         y = f$y,
                         params = list(optimizer_cov = "fisher_scoring",
                                       delta_rel_conv = 1e-6,
                                       init_cov_pars = init))
  cov_pars <- get_cov_pars(gp_model)
  expected <- c(0.03294841, 1.07591929, 0.11355958)
  expect_lt(max(abs(cov_pars - expected) / (abs(expected) + 1e-2)), 0.06)
})

test_that("prediction with given parameters matches the reference goldens", {
  gp_model <- GPModel(gp_coords = f$coords, cov_function = "exponential")
  pred <- predict(gp_model, y = f$y, gp_coords_pred = coord_test,
                  cov_pars = c(0.02, 1.2, 0.9), predict_cov_mat = TRUE)
  expected_mu <- c(0.08704577, 1.63875604, 0.48513581)
  expected_cov <- matrix(c(1.189093e-01, 1.171632e-05, -4.172444e-07,
                           1.171632e-05, 7.427727e-02, 1.492859e-06,
                           -4.172444e-07, 1.492859e-06, 8.107455e-02),
                         ncol = 3, byrow = TRUE)
  expect_lt(sum(abs(pred$mu - expected_mu)), TOLERANCE_STRICT)
  expect_lt(sum(abs(pred$cov - expected_cov)), TOLERANCE_STRICT)
})

test_that("Vecchia with all neighbors reproduces the exact likelihood", {
  gp_exact <- GPModel(gp_coords = f$coords, cov_function = "exponential")
  gp_vecc <- GPModel(gp_coords = f$coords, cov_function = "exponential",
                     gp_approx = "vecchia", num_neighbors = f$n - 1,
                     vecchia_ordering = "none")
  nll_e <- neg_log_likelihood(gp_exact, cov_pars = c(0.1, 1.6, 0.2), y = f$y)
  nll_v <- neg_log_likelihood(gp_vecc, cov_pars = c(0.1, 1.6, 0.2), y = f$y)
  expect_lt(abs(nll_e - nll_v), TOLERANCE_MEDIUM)
})

test_that("save/load round-trips a fitted model", {
  gp_model <- fitGPModel(gp_coords = f$coords, cov_function = "exponential",
                         y = f$y, params = list(optimizer_cov = "lbfgs"))
  fn <- tempfile(fileext = ".json")
  saveGPModel(gp_model, filename = fn)
  loaded <- loadGPModel(filename = fn)
  p1 <- predict(gp_model, y = f$y, gp_coords_pred = coord_test,
                predict_var = TRUE)
  p2 <- predict(loaded, y = f$y, gp_coords_pred = coord_test,
                predict_var = TRUE)
  expect_lt(sum(abs(p1$mu - p2$mu)), TOLERANCE_STRICT)
})
