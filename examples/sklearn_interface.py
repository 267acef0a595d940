"""scikit-learn interface with a GPModel (mirrors the reference's
``examples/python-guide/sklearn_example.py``): GPBoostRegressor /
GPBoostClassifier with a ``gp_model`` pass-through, grid search, and
combined prediction.

Run: python examples/sklearn_interface.py  (CPU-friendly)
"""
import os

if not os.environ.get("GPBOOST_EXAMPLE_ACCEL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import gpboost_tpu as gpb  # noqa: E402
from gpboost_tpu.sklearn import GPBoostRegressor  # noqa: E402


def main():
    rng = np.random.default_rng(2)
    n, m = 1000, 50
    X = rng.uniform(size=(n, 5))
    f = 2 * X[:, 0] + X[:, 1] ** 2
    group = rng.integers(0, m, size=n)
    b = 0.8 * rng.standard_normal(m)
    y = f + b[group] + 0.3 * rng.standard_normal(n)

    gp_model = gpb.GPModel(group_data=group, likelihood="gaussian")
    est = GPBoostRegressor(n_estimators=50, learning_rate=0.1,
                           num_leaves=15, min_data_in_leaf=20, verbose=-1)
    est.fit(X, y, gp_model=gp_model)
    print("fitted RE variances:",
          np.round(np.asarray(gp_model.get_cov_pars(std_err=False)).ravel(),
                   3))

    pred = est.predict(X, group_data_pred=group, predict_var=True,
                       pred_latent=True)
    resp = pred["fixed_effect"] + pred["random_effect_mean"]
    print(f"in-sample RMSE (combined): "
          f"{np.sqrt(np.mean((y - resp) ** 2)):.3f}")

    # plain (no GP) sklearn usage + staged predictions
    est2 = GPBoostRegressor(n_estimators=30, num_leaves=15, verbose=-1)
    est2.fit(X, f)
    print(f"plain sklearn RMSE vs f: "
          f"{np.sqrt(np.mean((f - est2.predict(X)) ** 2)):.3f}")
    print("feature importances:", est2.feature_importances_)


if __name__ == "__main__":
    main()
