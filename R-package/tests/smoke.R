# End-to-end smoke test for the gpboostTPU R bindings.
# Run:  Rscript R-package/tests/smoke.R   (needs reticulate + gpboost_tpu)
library(gpboostTPU)

set.seed(1)
n <- 500
m <- 20
group <- rep(1:m, each = n / m)
b <- 0.8 * rnorm(m)
X <- cbind(rep(1, n), runif(n))
y <- X %*% c(2, 2) + b[group] + 0.3 * rnorm(n)

# GPModel fit / summary / predict
gp_model <- fitGPModel(group_data = group, y = y, X = X,
                       params = list(optimizer_cov = "fisher_scoring",
                                     std_dev = TRUE))
summary(gp_model)
stopifnot(get_num_optim_iter(gp_model) > 0)
cp <- get_cov_pars(gp_model, std_err = TRUE)
stopifnot(nrow(cp) == 2)
pred <- predict(gp_model, group_data_pred = c(1, 2, 999),
                X_pred = cbind(rep(1, 3), c(0.1, 0.5, 0.9)),
                predict_var = TRUE)
stopifnot(length(pred$mu) == 3, all(pred$var > 0))
nll <- neg_log_likelihood(gp_model, cov_pars = c(0.1, 0.5), y = y)
stopifnot(is.finite(nll))

# save / load round trip
f <- tempfile(fileext = ".json")
saveGPModel(gp_model, f)
gp2 <- loadGPModel(f)
pred2 <- predict(gp2, y = y, group_data_pred = c(1, 2, 999),
                 X_pred = cbind(rep(1, 3), c(0.1, 0.5, 0.9)),
                 predict_var = TRUE)
stopifnot(max(abs(pred$mu - pred2$mu)) < 1e-6)

# boosting + GPBoost algorithm
Xb <- matrix(runif(n * 4), n, 4)
yb <- 2 * Xb[, 1] + b[group] + 0.2 * rnorm(n)
gp3 <- GPModel(group_data = group, likelihood = "gaussian")
dtrain <- gpb.Dataset(data = Xb, label = yb)
bst <- gpb.train(params = list(learning_rate = 0.1, num_leaves = 15,
                               verbose = -1),
                 data = dtrain, nrounds = 20, gp_model = gp3, verbose = 0)
p <- predict(bst, data = Xb[1:5, ], group_data_pred = group[1:5])
stopifnot(length(p$response_mean) == 5)

cat("gpboostTPU smoke test OK\n")
