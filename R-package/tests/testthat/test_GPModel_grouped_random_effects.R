context("GPModel_grouped_random_effects (reticulate bindings)")

test_that("poisson grouped-RE Laplace NLL matches the golden value", {
  n <- 100
  m <- 10
  group <- rep(1:m, each = n / m)
  b_gr_1 <- qnorm(sim_rand_unif(n = m, init_c = 0.565))
  mu <- exp(b_gr_1[group])
  y <- qpois(sim_rand_unif(n = n, init_c = 0.04532), lambda = mu)
  gp_model <- GPModel(group_data = group, likelihood = "poisson")
  nll <- neg_log_likelihood(gp_model, cov_pars = c(0.9), y = y)
  expect_lt(abs(nll - 140.4554806), TOLERANCE_MEDIUM)
})

test_that("gaussian grouped fit recovers the simulated variances", {
  n <- 1000
  m <- 100
  group <- rep(1:m, each = n / m)
  b <- 0.8 * qnorm(sim_rand_unif(n = m, init_c = 0.3))
  eps <- 0.5 * qnorm(sim_rand_unif(n = n, init_c = 0.7))
  y <- b[group] + eps
  gp_model <- fitGPModel(group_data = group, likelihood = "gaussian", y = y)
  cov_pars <- get_cov_pars(gp_model)
  expect_lt(abs(cov_pars[1] - 0.25), 0.1)   # error variance
  expect_lt(abs(cov_pars[2] - 0.64), 0.25)  # group variance
  # prediction at seen + unseen levels
  pred <- predict(gp_model, y = y, group_data_pred = c(1, 2, 9999),
                  predict_var = TRUE)
  expect_equal(length(pred$mu), 3)
  expect_true(pred$var[3] > pred$var[1])  # unseen level has prior variance
  expect_lt(abs(pred$mu[3]), 1e-10)
})

test_that("iterative matrix inversion matches cholesky for grouped REs", {
  n <- 500
  m <- 40
  group <- rep(1:m, length.out = n)
  b <- 0.8 * qnorm(sim_rand_unif(n = m, init_c = 0.2))
  y <- b[group] + 0.6 * qnorm(sim_rand_unif(n = n, init_c = 0.9))
  m_chol <- fitGPModel(group_data = group, y = y)
  m_iter <- fitGPModel(group_data = group, y = y,
                       matrix_inversion_method = "iterative",
                       params = list(num_rand_vec_trace = 500))
  expect_lt(max(abs(get_cov_pars(m_iter) - get_cov_pars(m_chol))), 0.05)
})

test_that("predict_training_data_random_effects returns one row per obs", {
  n <- 200
  group <- rep(1:20, each = 10)
  b <- qnorm(sim_rand_unif(n = 20, init_c = 0.44))
  y <- b[group] + 0.4 * qnorm(sim_rand_unif(n = n, init_c = 0.12))
  gp_model <- fitGPModel(group_data = group, y = y)
  re <- predict_training_data_random_effects(gp_model)
  expect_equal(nrow(as.matrix(re)), n)
})
