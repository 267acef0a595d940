"""Large-scale workflows: iterative solvers + simulation-based variances.

Round-2 surface:
1. Grouped random effects with matrix_inversion_method="iterative":
   matrix-free CG fits + simulation-based predictive variances — no [q, q]
   matrix is ever formed (scales to many crossed groups).
2. Vecchia prediction types (all five reference algorithms).
3. Non-Gaussian Vecchia predictions with nsim_var_pred (posterior-draw
   variances; no dense matrices).
"""
import numpy as np

import gpboost_tpu as gpb

rng = np.random.default_rng(0)

# --- 1. crossed grouped REs, iterative -------------------------------------
n, q1, q2 = 20000, 1500, 1000
g1 = rng.integers(0, q1, size=n)
g2 = rng.integers(0, q2, size=n)
y = (0.9 * rng.standard_normal(q1)[g1] + 0.6 * rng.standard_normal(q2)[g2]
     + 0.7 * rng.standard_normal(n))
gp_model = gpb.GPModel(group_data=np.column_stack([g1, g2]),
                       matrix_inversion_method="iterative")
gp_model.fit(y=y, params={"num_rand_vec_trace": 100})
print("variance components:", np.round(gp_model.get_cov_pars(), 3))
print("CG steps for one solve:", gp_model.get_num_cg_steps())
gp_model.set_prediction_data(nsim_var_pred=500)
pred = gp_model.predict(y=y, group_data_pred=np.column_stack(
    [[0, 1, q1 + 7], [0, 1, 2]]), predict_var=True)
print("pred mean:", np.round(pred["mu"], 3), "var:", np.round(pred["var"], 3))

# --- 2. Vecchia prediction types -------------------------------------------
n = 2000
coords = rng.uniform(size=(n, 2))
D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
L = np.linalg.cholesky(np.exp(-D / 0.2) + 0.1 * np.eye(n))
y = L @ rng.standard_normal(n)
coords_pred = rng.uniform(size=(5, 2))
for pt in ["order_obs_first_cond_obs_only", "order_obs_first_cond_all",
           "order_pred_first", "latent_order_obs_first_cond_obs_only"]:
    m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                    gp_approx="vecchia", num_neighbors=20)
    m.set_prediction_data(vecchia_pred_type=pt, num_neighbors_pred=20)
    p = m.predict(y=y, gp_coords_pred=coords_pred,
                  cov_pars=[0.1, 1.0, 0.2], predict_var=True)
    print(f"{pt:42s} mu[0]={p['mu'][0]:+.4f} var[0]={p['var'][0]:.4f}")

# --- 3. non-Gaussian Vecchia with simulated predictive variances -----------
lam = np.exp(L @ rng.standard_normal(n) * 0.5)
y_pois = rng.poisson(lam).astype(float)
m = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                gp_approx="vecchia", num_neighbors=20, likelihood="poisson")
m.fit(y=y_pois, params={"maxit": 20})
m.set_prediction_data(nsim_var_pred=500)
p = m.predict(y=y_pois, gp_coords_pred=coords_pred, predict_var=True)
print("poisson pred mean:", np.round(p["mu"], 3))
