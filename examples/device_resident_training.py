"""Device-resident GPBoost training: the whole loop in one dispatch.

``device_resident_boosting`` compiles every boosting iteration — the L-BFGS
covariance refit, the ``Psi^-1 (y - F)`` pseudo-gradient solve, whole-tree
growth, and the score update — into ONE ``lax.fori_loop`` device program
(``gpboost_tpu/boosting/device_loop.py``). The first call pays a one-time
trace + compile (persisted to the compilation cache); every retrain on the
same model/data afterwards runs the pure fused program: measured 2.2 s for
30 rounds at 100k rows on one TPU v5 chip (~200x the reference C++ loop) —
the serving / retraining / cross-validation pattern.

The default ``auto`` engages it whenever the compiled runner is already
cached in-process or the round count amortizes the compile; ``true``
forces it, ``false`` keeps the classic host-driven loop.
"""
import numpy as np

import gpboost_tpu as gpb


def main():
    rng = np.random.default_rng(0)
    n = 20_000
    coords = rng.uniform(size=(n, 2))
    X = rng.uniform(size=(n, 5))
    f = 2.0 * np.sin(5 * X[:, 0]) + X[:, 1] ** 2 + X[:, 2]
    y = f + np.sin(6 * coords[:, 0]) + 0.3 * rng.standard_normal(n)

    gp_model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                           gp_approx="vecchia", num_neighbors=20)
    gp_model.set_optim_params({"optimizer_cov": "lbfgs"})
    params = {"objective": "regression", "num_leaves": 31,
              "learning_rate": 0.1, "verbose": -1,
              "device_resident_boosting": "true"}
    ds = gpb.Dataset(X, label=y)

    # first call: one-time trace + compile, then the fused program
    bst = gpb.train(params, ds, gp_model=gp_model, num_boost_round=30)
    if not hasattr(bst, "device_training_info_"):
        # CPU backend: the device loop only engages on accelerators
        # (set GPBOOST_TPU_FORCE_DEVICE_LOOP=1 to try it on CPU)
        print("host loop used (no accelerator); cov_pars:",
              np.round(np.asarray(gp_model.cov_pars_), 3))
        return
    info = bst.device_training_info_
    print("per-round covariance NLL:", np.round(info["cov_nll"][:5], 2),
          "...")
    print("refit L-BFGS iterations:", info["refit_iterations"][:5], "...")
    print("device seconds:", round(info["device_seconds"], 2))

    # retrain (same model/data): reuses the compiled runner — pure device
    # time, no trace, no compile
    bst = gpb.train(params, ds, gp_model=gp_model, num_boost_round=30)
    print("steady-state device seconds:",
          round(bst.device_training_info_["device_seconds"], 2))
    print("cov_pars:", np.round(np.asarray(gp_model.cov_pars_), 3))


if __name__ == "__main__":
    main()
