"""Fused Pallas TPU kernel for the Vecchia factor build.

The jnp transposed path (ops/vecchia.py `_build_factors_transposed`) already
avoids the [n, m, m] tile-padding tax, but XLA still materializes / re-reads
the m(m+1)/2 covariance vectors between fusions (and rematerializes the
covariance exp() in the forward-only graph — see CLAUDE.md). This kernel
fuses distance -> covariance -> unrolled Cholesky -> triangular solves per
1024-point block entirely in VMEM.

Layout is the key difference from the first (abandoned) attempt: instead of
[C, m, m] blocks whose tiny trailing dims Mosaic pads onto (8, 128) tiles,
every per-pair covariance entry lives as ONE [8, 128] tile over a block of
1024 points (n reshaped to [G, 8, 128]) — all m^3/6 sweep operations are
single-vreg VPU ops with full lane/sublane utilization.

Supports isotropic exponential / Matern 1.5, 2.5 / gaussian covariances (the
families the Vecchia paths use); other families use the jnp implementation.
Reference role: ``CalcCovFactorGradientVecchia`` (Vecchia_utils.cpp:1307).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)

_SUPPORTED_SHAPES = (0.5, 1.5, 2.5, -1.0)  # -1.0 = gaussian (sq-exp)
BLOCK = 1024  # points per grid step, viewed as [8, 128]


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
    return jnp.exp(-x * x)  # gaussian


def _tri_pairs(m: int):
    return [(i, k) for i in range(m) for k in range(i + 1)]


def _factors_kernel(pars_ref, nb_ref, row_ref, mask_ref, a_ref, d_ref,
                    *, m, dim, shape, include_nugget):
    """Blocks: nb [m, d, 8, 128], row [d, 8, 128], mask [m, 8, 128] (f32);
    outputs a [m, 8, 128], d [1, 8, 128]. pars [4] SMEM:
    (gp_var, inv_range, nugget, _)."""
    gp_var = pars_ref[0]
    inv_range = pars_ref[1]
    nugget = pars_ref[2]

    nb = [[nb_ref[i, k] for k in range(dim)] for i in range(m)]
    row = [row_ref[k] for k in range(dim)]
    mask = [mask_ref[i] for i in range(m)]

    var_ii = gp_var + (nugget if include_nugget else 0.0)

    def cov_between(p, q):
        d2 = None
        for k in range(dim):
            dk = p[k] - q[k]
            d2 = dk * dk if d2 is None else d2 + dk * dk
        safe = jnp.where(d2 > 0.0, d2, 1.0)
        dist = jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)
        return gp_var * _corr(dist, inv_range, shape)

    # covariance entries (masked: identity rows/cols for padding slots)
    B = {}
    for i in range(m):
        for k in range(i + 1):
            valid = mask[i] * mask[k]
            if i == k:
                B[(i, k)] = jnp.where(valid > 0.5, var_ii, 1.0)
            else:
                B[(i, k)] = cov_between(nb[i], nb[k]) * valid
    c_in = [cov_between(row, nb[i]) * mask[i] for i in range(m)]
    c_in_orig = list(c_in)

    # unrolled Cholesky column sweep on the pair dict (all [8,128] vreg ops)
    L = {}
    for j in range(m):
        dj = jnp.sqrt(jnp.maximum(B[(j, j)], 1e-30))
        inv = 1.0 / dj
        for i in range(j, m):
            L[(i, j)] = B[(i, j)] * inv
        for i in range(j + 1, m):
            for k in range(j + 1, i + 1):
                B[(i, k)] = B[(i, k)] - L[(i, j)] * L[(k, j)]
    # forward solve L x = c_in
    x = c_in
    for j in range(m):
        xj = x[j] / L[(j, j)]
        x[j] = xj
        for i in range(j + 1, m):
            x[i] = x[i] - L[(i, j)] * xj
    # backward solve L' a = x
    for j in reversed(range(m)):
        aj = x[j] / L[(j, j)]
        x[j] = aj
        for i in range(j):
            x[i] = x[i] - L[(j, i)] * aj

    d_cond = var_ii
    for i in range(m):
        a_i = x[i] * mask[i]
        a_ref[i] = a_i
        d_cond = d_cond - c_in_orig[i] * a_i
    d_ref[0] = d_cond


def vecchia_factors_pallas(cov_pars, coords, neighbors, nugget,
                           include_nugget: bool, shape: float):
    """Fused (A [n, m], D [n]) Vecchia factor build; cov_pars = [var, range].

    f32 in/out. Forward only — wrap with a custom VJP at the call site for
    gradients (the jnp transposed path supplies the backward).
    """
    n, m = neighbors.shape
    dim = coords.shape[1]
    if shape not in _SUPPORTED_SHAPES:
        raise ValueError(f"unsupported shape {shape}")
    idx = jnp.maximum(neighbors, 0)
    nb_coords = coords[idx].astype(jnp.float32)            # [n, m, d]
    mask = (neighbors >= 0).astype(jnp.int32).astype(jnp.float32)
    g = (n + BLOCK - 1) // BLOCK
    n_pad = g * BLOCK
    # [m, d, G, 8, 128]: every (pair, block) is one full (8, 128) tile
    nbT = jnp.pad(jnp.transpose(nb_coords, (1, 2, 0)),
                  ((0, 0), (0, 0), (0, n_pad - n))).reshape(m, dim, g, 8, 128)
    rowT = jnp.pad(coords.T.astype(jnp.float32),
                   ((0, 0), (0, n_pad - n))).reshape(dim, g, 8, 128)
    maskT = jnp.pad(mask.T, ((0, 0), (0, n_pad - n)),
                    constant_values=1.0).reshape(m, g, 8, 128)
    pars = jnp.stack([
        jnp.asarray(cov_pars[0], jnp.float32),
        jnp.asarray(1.0, jnp.float32) / jnp.asarray(cov_pars[1], jnp.float32),
        (jnp.asarray(nugget, jnp.float32) if nugget is not None
         else jnp.zeros((), jnp.float32)),
        jnp.zeros((), jnp.float32)])

    def kernel(pars_ref, nb_ref, row_ref, mask_ref, a_ref, d_ref):
        _factors_kernel(pars_ref, nb_ref, row_ref, mask_ref, a_ref, d_ref,
                        m=m, dim=dim, shape=shape,
                        include_nugget=include_nugget)

    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        a, d = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((m, dim, 1, 8, 128),
                             lambda i: (0, 0, i, 0, 0)),
                pl.BlockSpec((dim, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((m, 1, 8, 128), lambda i: (0, i, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((m, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((1, 1, 8, 128), lambda i: (0, i, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((m, g, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, g, 8, 128), jnp.float32),
            ),
        )(pars, nbT, rowT, maskT)
    a_out = a.reshape(m, n_pad).T[:n]
    d_out = d.reshape(n_pad)[:n]
    return a_out, d_out
