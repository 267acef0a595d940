"""Fused Pallas TPU kernel for the Vecchia factor build (EXPERIMENTAL).

Status: numerically verified in interpreter mode; Mosaic compilation of the
unrolled m=20 factorization is currently impractically slow on this toolchain,
so the production Vecchia path uses the jnp unrolled-Cholesky implementation
(ops/vecchia.py). Revisit with a scan-based kernel or newer Mosaic.

The jnp path materializes [n, m, m] covariance/Cholesky intermediates in HBM
(~160 MB at n=1e5, m=20) and is bandwidth-bound. This kernel fuses distance ->
covariance -> unrolled Cholesky -> triangular solves per row block entirely in
VMEM: HBM traffic drops to the inputs ([n, m, d] neighbor coords) and outputs
([n, m] weights + [n] conditional variances).

Supports isotropic Matern shape 0.5/1.5/2.5 and gaussian covariances (the
families used by the Vecchia paths); other families fall back to the jnp
implementation in ``ops/vecchia.py``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)

_SUPPORTED_SHAPES = {0.5, 1.5, 2.5}


def _corr(dist, inv_range, shape: float):
    x = dist * inv_range
    if shape == 0.5:
        return jnp.exp(-x)
    if shape == 1.5:
        x = x * SQRT3
        return (1.0 + x) * jnp.exp(-x)
    if shape == 2.5:
        x = x * SQRT5
        return (1.0 + x + x * x / 3.0) * jnp.exp(-x)
    # gaussian
    return jnp.exp(-x * x)


def _factors_kernel(pars_ref, *refs, m, dim, shape, include_nugget):
    """pars_ref [4] SMEM (gp_var, inv_range, nugget, _); per-dimension
    neighbor/row coordinate planes nb_k [C, m], row_k [C, 1]; then mask
    [C, m]; outputs a [C, m], d [C, 1]."""
    nb_refs = refs[:dim]
    row_refs = refs[dim:2 * dim]
    mask_ref = refs[2 * dim]
    a_ref, d_ref = refs[2 * dim + 1], refs[2 * dim + 2]
    gp_var = pars_ref[0]
    inv_range = pars_ref[1]
    nugget = pars_ref[2]
    mask = mask_ref[...]

    d2_nn = 0.0
    d2_in = 0.0
    for k in range(dim):
        nbk = nb_refs[k][...]           # [C, m]
        rowk = row_refs[k][...]         # [C, 1]
        dk = nbk[:, :, None] - nbk[:, None, :]
        d2_nn = d2_nn + dk * dk
        dik = rowk - nbk                # [C, m]
        d2_in = d2_in + dik * dik
    safe = jnp.where(d2_nn > 0.0, d2_nn, 1.0)
    d_nn = jnp.where(d2_nn > 0.0, jnp.sqrt(safe), 0.0)
    safe_i = jnp.where(d2_in > 0.0, d2_in, 1.0)
    d_in = jnp.where(d2_in > 0.0, jnp.sqrt(safe_i), 0.0)

    c_nn = gp_var * _corr(d_nn, inv_range, shape)
    c_in = gp_var * _corr(d_in, inv_range, shape)
    var_ii = gp_var
    eye = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1))
    eye_f = jnp.where(eye, 1.0, 0.0)[None, :, :]
    if include_nugget:
        c_nn = c_nn + nugget * eye_f
        var_ii = var_ii + nugget
    pair_mask = mask[:, :, None] * mask[:, None, :]
    c_nn = c_nn * pair_mask + (1.0 - pair_mask) * eye_f
    c_in = c_in * mask

    # unrolled Cholesky + solves, all in VMEM values; no .at updates (Mosaic
    # has no scatter) — columns are kept as a Python list of [C, m] arrays
    B = c_nn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    cols = []
    diags = []
    for j in range(m):
        dj = jnp.sqrt(jnp.maximum(B[:, j, j], 1e-30))
        col = B[:, :, j] / dj[:, None]
        col = jnp.where(col_ids >= j, col, 0.0)
        cols.append(col)          # L[:, :, j]
        diags.append(dj)          # L[:, j, j]
        B = B - col[:, :, None] * col[:, None, :]
    # forward: L x = c_in
    x = c_in
    for j in range(m):
        xj = x[:, j] / diags[j]
        mask_j = (col_ids == j)
        x = jnp.where(mask_j, xj[:, None],
                      x - jnp.where(col_ids > j, cols[j] * xj[:, None], 0.0))
    # backward: L' a = x;  L'[i, j] = L[j, i] -> row j of L is cols[*][:, j]:
    # L[j, i] for i fixed is cols[i][:, j]; we need sum over j>i of L[j, i] aj
    # handled column-by-column like the jnp version: rows of L' are cols[j]
    for j in reversed(range(m)):
        xj = x[:, j] / diags[j]
        mask_j = (col_ids == j)
        # L'[:, j] entries used to update components i < j are
        # L[j, i] = cols[i][:, j]... equivalently subtract xj * L[j, :]
        # where L[j, :] is row j of L = [cols[i][:, j]]_i; build it:
        row_j = jnp.concatenate([cols[i][:, j:j + 1] for i in range(m)],
                                axis=1)  # [C, m] = L[j, :]
        x = jnp.where(mask_j, xj[:, None],
                      x - jnp.where(col_ids < j, row_j * xj[:, None], 0.0))
    a = x * mask
    a_ref[...] = a
    d_ref[...] = (var_ii - jnp.sum(c_in * a, axis=1))[:, None]


def vecchia_factors_pallas(cov_pars, coords, neighbors, nugget,
                           include_nugget: bool, shape: float,
                           chunk: int = 1024):
    """Fused (A, D) Vecchia factor build. cov_pars = [gp_var, range]."""
    n, m = neighbors.shape
    dim = coords.shape[1]
    idx = jnp.maximum(neighbors, 0)
    nb_coords = coords[idx].astype(jnp.float32)        # [n, m, d] (XLA gather)
    mask = (neighbors >= 0).astype(jnp.float32)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    nb_planes = [jnp.pad(nb_coords[:, :, k], ((0, n_pad - n), (0, 0)))
                 for k in range(dim)]
    row_planes = [jnp.pad(coords[:, k:k + 1].astype(jnp.float32),
                          ((0, n_pad - n), (0, 0))) for k in range(dim)]
    mask_p = jnp.pad(mask, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    if shape not in _SUPPORTED_SHAPES and shape != -1.0:
        raise ValueError(f"unsupported shape {shape}")
    c = {0.5: 1.0, 1.5: 1.0, 2.5: 1.0}.get(shape, 1.0)
    inv_range = 1.0 / cov_pars[1]
    pars = jnp.stack([cov_pars[0], inv_range,
                      (nugget if nugget is not None else 0.0) * jnp.ones(()),
                      jnp.zeros(())]).astype(jnp.float32)

    def kernel(pars_ref, *refs):
        _factors_kernel(pars_ref, *refs, m=m, dim=dim, shape=shape,
                        include_nugget=include_nugget)

    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        a, d = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(n_pad // chunk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((chunk, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM) for _ in range(dim)]
            + [pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM) for _ in range(dim)]
            + [pl.BlockSpec((chunk, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((chunk, m), lambda i: (i, 0)),
                pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad, m), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            ),
        )(pars, *nb_planes, *row_planes, mask_p)
    return a[:n], d[:n, 0]
