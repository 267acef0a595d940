"""Panel data example: longitudinal data with individual random effects.

Port of the reference's ``examples/python-guide/panel_data_example.py``.
"""
import numpy as np

import gpboost_tpu as gpb


def main():
    rng = np.random.default_rng(20)
    n_subjects, n_times = 200, 8
    n = n_subjects * n_times
    subject = np.repeat(np.arange(n_subjects), n_times)
    t = np.tile(np.arange(n_times, dtype=float) / n_times, n_subjects)
    X = np.column_stack([t, rng.random(n)])
    b = 0.8 * rng.standard_normal(n_subjects)          # random intercepts
    slope = 0.5 * rng.standard_normal(n_subjects)      # random slopes in time
    f = 1.5 * np.sin(4 * X[:, 1])
    y = f + b[subject] + slope[subject] * t + 0.3 * rng.standard_normal(n)

    # random intercept + random slope model combined with boosting
    gp_model = gpb.GPModel(group_data=subject, group_rand_coef_data=t,
                           ind_effect_group_rand_coef=[1])
    bst = gpb.train({"objective": "regression", "learning_rate": 0.05,
                     "max_depth": 3, "verbose": 0},
                    gpb.Dataset(X, label=y), gp_model=gp_model,
                    num_boost_round=60)
    print("variance parameters [error, intercept, slope]:")
    print(np.round(gp_model.get_cov_pars(), 4),
          " (true ~ [0.09, 0.64, 0.25])")
    pred = bst.predict(X[:n_times], group_data_pred=subject[:n_times],
                       group_rand_coef_data_pred=t[:n_times],
                       pred_latent=True)
    print("subject-0 random-effect trajectory:",
          np.round(pred["random_effect_mean"], 3))


if __name__ == "__main__":
    main()
