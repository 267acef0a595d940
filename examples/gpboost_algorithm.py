"""GPBoost algorithm example: trees + grouped random effects / Gaussian process.

Port of the reference's ``examples/python-guide/GPBoost_algorithm.py`` to
gpboost_tpu — the code is intentionally near-identical to the reference's so
users can switch by changing the import.
"""
import numpy as np

import gpboost_tpu as gpb


def f1d(x):
    """Non-linear fixed-effects function."""
    return 1.7 * (1 / (1 + np.exp(-(x - 0.5) * 20)) + 0.75 * x)


def simulate_grouped(n=1000, m=25, sigma2=0.29, seed=1):
    rng = np.random.default_rng(seed)
    X = rng.random((n, 2))
    F = f1d(X[:, 0])
    group = np.arange(n) % m
    b = np.sqrt(0.3527) * rng.standard_normal(m)
    xi = np.sqrt(sigma2 / 2) * rng.standard_normal(n)
    y = F + b[group] + xi
    return X, y, group


def main():
    # --------------------------------------------------------------------
    # Combining tree-boosting and grouped random effects
    # --------------------------------------------------------------------
    X, y, group = simulate_grouped()
    gp_model = gpb.GPModel(group_data=group, likelihood="gaussian")
    data_train = gpb.Dataset(X, label=y)
    params = {"objective": "regression", "learning_rate": 0.01,
              "max_depth": 3, "min_data_in_leaf": 10, "verbose": 0}
    bst = gpb.train(params=params, train_set=data_train, gp_model=gp_model,
                    num_boost_round=250)
    print("Estimated variance parameters [error, group]:")
    print(np.round(gp_model.get_cov_pars(), 4))

    # prediction
    group_test = np.arange(5) % 25
    Xtest = np.column_stack([np.linspace(0, 1, 5), 0.5 * np.ones(5)])
    pred = bst.predict(data=Xtest, group_data_pred=group_test,
                       predict_var=True, pred_latent=True)
    print("fixed effect:", np.round(pred["fixed_effect"], 3))
    print("random effect mean:", np.round(pred["random_effect_mean"], 3))

    # --------------------------------------------------------------------
    # Parameter tuning with cross-validation
    # --------------------------------------------------------------------
    gp_model = gpb.GPModel(group_data=group, likelihood="gaussian")
    opt = gpb.grid_search_tune_parameters(
        param_grid={"learning_rate": [0.1, 0.01], "max_depth": [3, 6]},
        params={"objective": "regression", "verbose": 0},
        train_set=gpb.Dataset(X, label=y), gp_model=gp_model,
        num_boost_round=50, nfold=4, verbose_eval=0, seed=1)
    print("best params:", opt["best_params"], "best iter:", opt["best_iter"])

    # --------------------------------------------------------------------
    # Combining tree-boosting and a spatial Gaussian process
    # --------------------------------------------------------------------
    rng = np.random.default_rng(2)
    n = 600
    coords = rng.random((n, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    C = np.linalg.cholesky(0.25 * np.exp(-D / 0.1) + 1e-10 * np.eye(n))
    b = C @ rng.standard_normal(n)
    X = rng.random((n, 2))
    y = f1d(X[:, 0]) + b + 0.1 * rng.standard_normal(n)
    gp_model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                           likelihood="gaussian")
    bst = gpb.train(params={"objective": "regression", "learning_rate": 0.05,
                            "max_depth": 3, "verbose": 0},
                    train_set=gpb.Dataset(X, label=y), gp_model=gp_model,
                    num_boost_round=60)
    print("GP cov pars [error, var, range]:",
          np.round(gp_model.get_cov_pars(), 4))


if __name__ == "__main__":
    main()
