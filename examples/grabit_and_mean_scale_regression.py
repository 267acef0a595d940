"""Grabit (tobit boosting) and mean-scale (heteroscedastic) regression.

Mirrors the reference's ``examples/python-guide/Grabit_and_mean-scale_
regression.py``: the Grabit objective (Sigrist & Hirnschall 2019,
``regression_objective.hpp:872``) boosts a censored Gaussian likelihood;
``mean_scale_regression`` (``regression_objective.hpp:986``) trains two
ensembles — one for the mean, one for log-variance.

Run: python examples/grabit_and_mean_scale_regression.py  (CPU-friendly)
"""
import os

# run on CPU unless the user opts into the accelerator (the machine-level
# JAX_PLATFORMS export wins over setdefault, so set it explicitly)
if not os.environ.get("GPBOOST_EXAMPLE_ACCEL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import gpboost_tpu as gpb  # noqa: E402


def sim_friedman3(n, rng):
    X = rng.uniform(size=(n, 4))
    X[:, 0] *= 100
    X[:, 1] = X[:, 1] * np.pi * (560 - 40) + 40 * np.pi
    X[:, 3] = X[:, 3] * 10 + 1
    f = np.sqrt(10) * np.arctan(
        (X[:, 1] * X[:, 2] - 1 / (X[:, 1] * X[:, 3])) / X[:, 0])
    return X, f


def main():
    rng = np.random.default_rng(1)
    n = 1000
    X, f = sim_friedman3(n, rng)
    y_latent = f + 0.2 * rng.standard_normal(n)

    # ---- Grabit: censor the response into [yl, yu] -------------------
    yl, yu = np.quantile(y_latent, [0.2, 0.8])
    y = np.clip(y_latent, yl, yu)
    bst = gpb.train({"objective": "tobit", "yl": yl, "yu": yu,
                     "sigma": 0.2, "learning_rate": 0.1, "num_leaves": 15,
                     "min_data_in_leaf": 20, "verbose": -1},
                    gpb.Dataset(X, label=y), num_boost_round=50)
    pred = bst.predict(X)
    print(f"Grabit: corr(pred, latent) = "
          f"{np.corrcoef(pred, y_latent)[0, 1]:.3f}")

    # ---- mean-scale regression: heteroscedastic noise ----------------
    y_ms = f + np.exp(0.5 * (X[:, 2] - 0.5)) * rng.standard_normal(n)
    bst = gpb.train({"objective": "mean_scale_regression",
                     "learning_rate": 0.1, "num_leaves": 15,
                     "min_data_in_leaf": 20, "verbose": -1},
                    gpb.Dataset(X, label=y_ms), num_boost_round=50)
    out = bst.predict(X)           # {"pred_mean", "pred_var"}
    print(f"mean-scale: mean RMSE = "
          f"{np.sqrt(np.mean((out['pred_mean'] - f) ** 2)):.3f}, "
          f"corr(pred sd, true sd) = "
          f"{np.corrcoef(np.sqrt(out['pred_var']), np.exp(0.5 * (X[:, 2] - 0.5)))[0, 1]:.3f}")


if __name__ == "__main__":
    main()
