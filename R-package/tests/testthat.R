# Runner for the testthat suite of the gpboostTPU reticulate bindings.
# Requires: R packages `testthat`, `reticulate`, and a Python environment
# with `gpboost_tpu` importable (force CPU for deterministic f64 numerics:
# Sys.setenv(JAX_PLATFORMS = "cpu") before the first import).
library(testthat)
Sys.setenv(JAX_PLATFORMS = "cpu")
source(file.path("..", "R", "gpboostTPU.R"))
test_dir("testthat")
