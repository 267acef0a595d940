context("cv / interpretation / serialization surface")

test_that("gpb.cv returns per-fold metrics", {
  set.seed(2)
  X <- matrix(runif(600), ncol = 3)
  y <- 2 * X[, 1] - X[, 2] + 0.2 * rnorm(200)
  ds <- gpb.Dataset(X, label = y)
  res <- gpb.cv(params = list(objective = "regression", num_leaves = 4L,
                              verbose = -1L),
                data = ds, nrounds = 5L, nfold = 3L, verbose = 0L)
  expect_true(length(res) >= 1)
})

test_that("gpb.interprete decomposes predictions into contributions", {
  set.seed(3)
  X <- matrix(runif(600), ncol = 3)
  y <- 2 * X[, 1] - X[, 2] + 0.2 * rnorm(200)
  bst <- gpboost(X, label = y,
                 params = list(objective = "regression", num_leaves = 4L,
                               verbose = -1L), nrounds = 5L)
  contribs <- gpb.interprete(bst, X, idxset = 1:3)
  expect_equal(length(contribs), 3L)
  # contributions + bias reconstruct the prediction
  pred <- predict(bst, X[1:3, , drop = FALSE])
  raw <- predict(bst, X[1:3, , drop = FALSE], pred_contrib = TRUE)
  expect_lt(max(abs(rowSums(raw) - pred)), 1e-8)
})

test_that("gpb.model.dt.tree lists every split", {
  set.seed(4)
  X <- matrix(runif(400), ncol = 2)
  y <- X[, 1] + 0.1 * rnorm(200)
  bst <- gpboost(X, label = y,
                 params = list(objective = "regression", num_leaves = 4L,
                               verbose = -1L), nrounds = 3L)
  df <- gpb.model.dt.tree(bst)
  expect_true(nrow(df) > 0)
})

test_that("saveRDS/readRDS round-trips a booster", {
  set.seed(5)
  X <- matrix(runif(400), ncol = 2)
  y <- X[, 1] + 0.1 * rnorm(200)
  bst <- gpboost(X, label = y,
                 params = list(objective = "regression", num_leaves = 4L,
                               verbose = -1L), nrounds = 3L)
  tf <- tempfile(fileext = ".rds")
  saveRDS.gpb.Booster(bst, file = tf)
  bst2 <- readRDS.gpb.Booster(tf)
  expect_lt(max(abs(predict(bst2, X) - predict(bst, X))), 1e-10)
})

test_that("gpb.convert_with_rules encodes factors reusably", {
  df <- data.frame(a = c("x", "y", "x"), b = c(1.0, 2.0, 3.0),
                   stringsAsFactors = FALSE)
  conv <- gpb.convert_with_rules(df)
  expect_true(is.numeric(conv$data$a))
  df2 <- data.frame(a = c("y", "x"), b = c(9.0, 8.0),
                    stringsAsFactors = FALSE)
  conv2 <- gpb.convert_with_rules(df2, rules = conv$rules)
  expect_equal(conv2$data$a, c(2, 1))
})
