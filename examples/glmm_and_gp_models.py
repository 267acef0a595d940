"""Generalized linear mixed effects and Gaussian process models (standalone).

Port of the reference's
``examples/python-guide/generalized_linear_Gaussian_process_mixed_effects_models.py``.
"""
import numpy as np

import gpboost_tpu as gpb


def main():
    rng = np.random.default_rng(10)

    # ---- grouped random effects (LMM) ---------------------------------
    n, m = 1000, 100
    group = np.arange(n) % m
    b = 0.7 * rng.standard_normal(m)
    X = np.column_stack([np.ones(n), rng.random(n)])
    beta = np.array([1.0, 2.0])
    y = X @ beta + b[group] + 0.5 * rng.standard_normal(n)

    gp_model = gpb.GPModel(group_data=group, likelihood="gaussian")
    gp_model.fit(y=y, X=X, params={"std_dev": True})
    gp_model.summary()

    # predictions incl. random effects for new & existing groups
    pred = gp_model.predict(group_data_pred=[1, 2, -1],
                            X_pred=np.column_stack([np.ones(3), 0.5 * np.ones(3)]),
                            predict_var=True)
    print("pred mu:", np.round(pred["mu"], 3), "var:", np.round(pred["var"], 3))

    # ---- Poisson GLMM --------------------------------------------------
    yp = rng.poisson(np.exp(0.5 * b[group]))
    glmm = gpb.GPModel(group_data=group, likelihood="poisson")
    glmm.fit(y=yp.astype(float))
    print("poisson GLMM var:", np.round(glmm.get_cov_pars(), 4))

    # ---- exact Gaussian process ---------------------------------------
    ngp = 400
    coords = rng.random((ngp, 2))
    D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    C = np.linalg.cholesky(np.exp(-D / 0.15) + 1e-10 * np.eye(ngp))
    y_gp = C @ rng.standard_normal(ngp) + 0.3 * rng.standard_normal(ngp)
    gp = gpb.GPModel(gp_coords=coords, cov_function="matern",
                     cov_fct_shape=1.5)
    gp.fit(y=y_gp)
    print("GP cov pars:", np.round(gp.get_cov_pars(), 4))

    # ---- Vecchia approximation at scale -------------------------------
    nv = 20_000
    coords_v = rng.random((nv, 2))
    y_v = (np.sin(8 * coords_v[:, 0]) + np.cos(5 * coords_v[:, 1])
           + 0.5 * rng.standard_normal(nv))
    gp_v = gpb.GPModel(gp_coords=coords_v, cov_function="exponential",
                       gp_approx="vecchia", num_neighbors=20)
    gp_v.fit(y=y_v, params={"optimizer_cov": "lbfgs"})
    print("Vecchia cov pars:", np.round(gp_v.get_cov_pars(), 4))


if __name__ == "__main__":
    main()
