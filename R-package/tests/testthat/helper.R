# Shared fixtures: the reference R suite's LCG simulator (the recurrence IS
# the data spec — reference test_GPModel_gaussian_process.R:29-35); golden
# values below were verified against reference GPBoost v1.6.5.
TOLERANCE_STRICT <- 1e-5
TOLERANCE_MEDIUM <- 1e-3
TOLERANCE_LOOSE <- 1e-2

sim_rand_unif <- function(n, init_c = 0.1) {
  mod_lcg <- 2^32
  sim <- rep(NA, n)
  sim[1] <- floor(init_c * mod_lcg)
  for (i in seq_len(n)[-1]) sim[i] <- (22695477 * sim[i - 1] + 1) %% mod_lcg
  sim / mod_lcg
}

make_gp_fixture <- function() {
  n <- 100
  d <- 2
  coords <- matrix(sim_rand_unif(n = n * d, init_c = 0.1), ncol = d)
  D <- as.matrix(dist(coords))
  Sigma <- 1 * exp(-D / 0.1) + diag(1e-20, n)
  C <- t(chol(Sigma))
  b_1 <- qnorm(sim_rand_unif(n = n, init_c = 0.8))
  eps <- as.vector(C %*% b_1)
  xi <- qnorm(sim_rand_unif(n = n, init_c = 0.1)) / 5
  X <- cbind(rep(1, n), sin((1:n - n / 2)^2 * 2 * pi / n))
  list(n = n, coords = coords, D = D, eps = eps, xi = xi, X = X,
       y = eps + xi)
}
