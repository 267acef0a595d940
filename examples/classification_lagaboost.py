"""LaGaBoost: boosting with non-Gaussian likelihoods and random effects.

Port of the classification parts of the reference's python-guide examples.
"""
import numpy as np

import gpboost_tpu as gpb


def main():
    rng = np.random.default_rng(3)
    n, m = 2000, 40
    group = np.arange(n) % m
    b = 0.8 * rng.standard_normal(m)
    X = rng.random((n, 4))
    f = 2.5 * (X[:, 0] > 0.5) + 2 * np.sin(4 * X[:, 1]) - 1
    probs = 1 / (1 + np.exp(-(f + b[group])))
    y = (rng.random(n) < probs).astype(float)

    gp_model = gpb.GPModel(group_data=group, likelihood="bernoulli_logit")
    bst = gpb.train(params={"objective": "binary", "learning_rate": 0.1,
                            "max_depth": 4, "verbose": 0},
                    train_set=gpb.Dataset(X, label=y), gp_model=gp_model,
                    num_boost_round=30)
    print("group variance:", np.round(gp_model.get_cov_pars(), 4))
    pred = bst.predict(X[:6], group_data_pred=group[:6], pred_latent=False)
    print("predicted probs:", np.round(pred["response_mean"], 3))
    print("labels         :", y[:6])


if __name__ == "__main__":
    main()
