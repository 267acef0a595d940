"""Data-parallel and multi-host training with gpboost-tpu.

Demonstrates the round-2 distributed surface:

1. `use_mesh(mesh)`: the regular `GPModel.fit()` / `gpb.train()` programs
   compile as SPMD over a device mesh (row-sharded Vecchia factor builds,
   data-parallel histograms). Results are identical to single-device.
2. `tree_learner="feature"`: feature-axis sharding for wide datasets.
3. Multi-host: `gpboost_tpu.distributed.initialize()` + `global_mesh()`
   (run the same script on every host of a pod slice).

Run single-host with virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/distributed_mesh_training.py
"""
import numpy as np

import gpboost_tpu as gpb

# --- simulate spatial data with a fixed-effects signal ---------------------
rng = np.random.default_rng(0)
n = 2000
coords = rng.uniform(size=(n, 2))
X = rng.uniform(size=(n, 4))
f = 2.0 * np.sin(5.0 * X[:, 0]) + X[:, 1]
D = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
L = np.linalg.cholesky(0.8 * np.exp(-D / 0.2) + 0.05 * np.eye(n))
y = f + L @ rng.standard_normal(n)

# --- multi-host bootstrap (no-op on a single host) -------------------------
# On a pod slice, run this same script on every host:
#   gpb.distributed.initialize()                 # auto-detected on TPU pods
#   mesh = gpb.distributed.global_mesh()         # all hosts' chips
import jax  # noqa: E402

mesh = gpb.make_mesh(len(jax.devices()))
print(f"mesh over {len(jax.devices())} devices")

# --- everything constructed inside use_mesh trains sharded -----------------
with gpb.use_mesh(mesh):
    gp_model = gpb.GPModel(gp_coords=coords, cov_function="exponential",
                           gp_approx="vecchia", num_neighbors=20)
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "learning_rate": 0.1,
                     "min_data_in_leaf": 20, "verbose": -1},
                    ds, gp_model=gp_model, num_boost_round=20)

print("cov pars:", gp_model.get_cov_pars())
pred = bst.predict(X[:5], gp_coords_pred=coords[:5], predict_var=True)
print("pred mean:", np.round(pred["response_mean"], 3))

# --- feature-parallel layout for wide data ---------------------------------
with gpb.use_mesh(mesh):
    params = {"tree_learner": "feature", "verbose": -1}
    ds_f = gpb.Dataset(X, label=y, params=params)
    bst_f = gpb.train(params, ds_f, num_boost_round=10)
print("feature-parallel rmse:",
      round(float(np.sqrt(np.mean((bst_f.predict(X) - y) ** 2))), 4))
