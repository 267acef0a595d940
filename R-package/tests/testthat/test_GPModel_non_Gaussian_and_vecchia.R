context("Non-Gaussian + Vecchia flows (reticulate bindings)")

f <- make_gp_fixture()

test_that("Vecchia NLL matches the reference golden values", {
  m_all <- GPModel(gp_coords = f$coords, cov_function = "exponential",
                   gp_approx = "vecchia", num_neighbors = f$n - 1L,
                   vecchia_ordering = "none")
  expect_lt(abs(neg_log_likelihood(m_all, cov_pars = c(0.1, 1.6, 0.2),
                                   y = f$y) - 124.2549533),
            TOLERANCE_STRICT)
  m_30 <- GPModel(gp_coords = f$coords, cov_function = "exponential",
                  gp_approx = "vecchia", num_neighbors = 30L,
                  vecchia_ordering = "none")
  expect_lt(abs(neg_log_likelihood(m_30, cov_pars = c(0.1, 1.6, 0.2),
                                   y = f$y) - 124.2252524),
            TOLERANCE_STRICT)
})

test_that("bernoulli_probit Vecchia-Laplace NLL matches the golden value", {
  probs <- pnorm(f$eps)
  y <- as.numeric(sim_rand_unif(n = f$n, init_c = 0.19341) < probs)
  m <- GPModel(gp_coords = f$coords, cov_function = "exponential",
               likelihood = "bernoulli_probit", gp_approx = "vecchia",
               num_neighbors = f$n - 1L, vecchia_ordering = "none")
  nll <- neg_log_likelihood(m, cov_pars = c(1.0, 0.2), y = y)
  expect_lt(abs(nll - 67.18342059), 1e-4)
})

test_that("bernoulli_probit Vecchia fit reaches the reference optimum", {
  probs <- pnorm(f$eps)
  y <- as.numeric(sim_rand_unif(n = f$n, init_c = 0.19341) < probs)
  iu <- upper.tri(f$D)
  m <- fitGPModel(gp_coords = f$coords, cov_function = "exponential",
                  likelihood = "bernoulli_probit", gp_approx = "vecchia",
                  num_neighbors = f$n - 1L, vecchia_ordering = "none",
                  y = y, X = f$X,
                  params = list(init_cov_pars = c(1, mean(f$D[iu]) / 3)))
  cov_pars <- get_cov_pars(m)
  expected <- c(0.92350821, 0.05944214)
  expect_lt(max(abs(cov_pars - expected) / (abs(expected) + 1e-2)), 0.1)
})
