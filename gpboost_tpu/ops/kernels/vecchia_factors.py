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


def _corr_x(x, shape: float):
    """Correlation at SCALED distance x (range/ARD scales and the matern
    sqrt(3)/sqrt(5) multipliers are folded into the coordinate scaling)."""
    if shape == 0.5:
        return jnp.exp(-x)
    if shape == 1.5:
        return (1.0 + x) * jnp.exp(-x)
    if shape == 2.5:
        return (1.0 + x + x * x / 3.0) * jnp.exp(-x)
    return jnp.exp(-x * x)  # gaussian


def _mult_const(shape: float) -> float:
    """Distance multiplier folded into the scale (matern shortcuts)."""
    if shape == 1.5:
        return SQRT3
    if shape == 2.5:
        return SQRT5
    return 1.0


def _tri_pairs(m: int):
    return [(i, k) for i in range(m) for k in range(i + 1)]


def _factors_kernel(pars_ref, nb_ref, row_ref, mask_ref, a_ref, d_ref,
                    *, m, dim, shape, include_nugget):
    """Blocks: nb [m, d, 8, 128], row [d, 8, 128], mask [m, 8, 128] (f32);
    outputs a [m, 8, 128], d [1, 8, 128]. pars SMEM [2 + d]:
    (gp_var, nugget, scale_1..scale_d) — per-dim coordinate scales
    (isotropic: all equal to mult_const/range; ARD: mult_const/rho_k)."""
    nb = [[nb_ref[i, k] for k in range(dim)] for i in range(m)]
    row = [row_ref[k] for k in range(dim)]
    mask = [mask_ref[i] for i in range(m)]
    scales = [pars_ref[2 + k] for k in range(dim)]
    a, d_cond = _block_factors(
        (pars_ref[0], scales, pars_ref[1]), nb, row, mask,
        m=m, dim=dim, shape=shape, include_nugget=include_nugget)
    for i in range(m):
        a_ref[i] = a[i]
    d_ref[0] = d_cond


def _block_factors(pars, nb, row, mask, *, m, dim, shape, include_nugget):
    """Factor computation on [1, 8, 128] tile values (shared by the factor
    kernel and the fused NLL+grad kernel). pars = (gp_var, scales [d],
    nugget) as traced scalars."""
    gp_var, scales, nugget = pars
    var_ii = gp_var + (nugget if include_nugget else 0.0)

    def cov_between(p, q):
        d2 = None
        for k in range(dim):
            dk = (p[k] - q[k]) * scales[k]
            d2 = dk * dk if d2 is None else d2 + dk * dk
        safe = jnp.where(d2 > 0.0, d2, 1.0)
        dist = jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)
        return gp_var * _corr_x(dist, shape)

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

    L = {}
    for j in range(m):
        dj = jnp.sqrt(jnp.maximum(B[(j, j)], 1e-30))
        inv = 1.0 / dj
        for i in range(j, m):
            L[(i, j)] = B[(i, j)] * inv
        for i in range(j + 1, m):
            for k in range(j + 1, i + 1):
                B[(i, k)] = B[(i, k)] - L[(i, j)] * L[(k, j)]
    x = c_in
    for j in range(m):
        xj = x[j] / L[(j, j)]
        x[j] = xj
        for i in range(j + 1, m):
            x[i] = x[i] - L[(i, j)] * xj
    for j in reversed(range(m)):
        aj = x[j] / L[(j, j)]
        x[j] = aj
        for i in range(j):
            x[i] = x[i] - L[(j, i)] * aj

    a = [x[i] * mask[i] for i in range(m)]
    d_cond = var_ii
    for i in range(m):
        d_cond = d_cond - c_in_orig[i] * a[i]
    return a, d_cond


def _nll_grad_kernel(pars_ref, nb_ref, row_ref, mask_ref, rnb_ref, rrow_ref,
                     rv_ref, out_ref, *, m, dim, shape, ard):
    """Per-block Gaussian Vecchia NLL contribution and its gradient w.r.t.
    log(p) for p = [nugget, gp_var, range(s)...]: reverse-mode AD traced
    INSIDE the kernel body (all elementwise ops -> Mosaic-compatible).
    out [1, 8, 128] = (nll, d/dlog nugget, d/dlog var, d/dlog range_k...)
    in lanes 0..(2 + n_ranges) of sublane 0. ARD: one range per coordinate
    dimension (per-dim scaled distances). ``rv_ref``: 0/1 per-row validity
    (covers both the 1024-block tail padding and mesh-shard padding rows)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row_valid = rv_ref[0]

    nb = [[nb_ref[i, k] for k in range(dim)] for i in range(m)]
    row = [row_ref[k] for k in range(dim)]
    mask = [mask_ref[i] for i in range(m)]
    rnb = [rnb_ref[i] for i in range(m)]
    rrow = rrow_ref[0]
    n_ranges = dim if ard else 1
    mc = _mult_const(shape)

    def block_nll(l_nugget, l_var, *l_ranges):
        if ard:
            scales = [mc * jnp.exp(-l_ranges[k]) for k in range(dim)]
        else:
            scales = [mc * jnp.exp(-l_ranges[0])] * dim
        pars = (jnp.exp(l_var), scales, jnp.exp(l_nugget))
        a, d_cond = _block_factors(pars, nb, row, mask, m=m, dim=dim,
                                   shape=shape, include_nugget=True)
        br = rrow
        for i in range(m):
            br = br - a[i] * rnb[i]
        contrib = (jnp.log(d_cond) + br * br / d_cond) * row_valid
        return 0.5 * jnp.sum(contrib)

    args = [pars_ref[t] for t in range(2 + n_ranges)]
    val, g = jax.value_and_grad(
        block_nll, argnums=tuple(range(2 + n_ranges)))(*args)
    # scatter-free placement: value in lane 0, grads in lanes 1.. (sublane 0)
    tile = jnp.zeros((1, 8, 128), jnp.float32)
    on0 = jnp.where((sub == 0) & (lane == 0), 1.0, 0.0)
    tile = tile + val * on0
    for t in range(2 + n_ranges):
        tile = tile + g[t] * jnp.where((sub == 0) & (lane == t + 1), 1.0, 0.0)
    out_ref[0] = tile[0]


def vecchia_nll_grad_pallas(log_cov_pars, coords, neighbors, r,
                            shape: float, ard: bool = False,
                            row_r=None, row_valid=None, row_coords=None,
                            include_const: bool = True):
    """Fused Gaussian Vecchia (NLL, dNLL/dlog cov_pars) in one kernel pass.

    log_cov_pars = log([nugget, gp_var, range]) (isotropic) or
    log([nugget, gp_var, rho_1..rho_d]) (``ard=True``); r = centered
    residual [n] (original order of ``coords``/``neighbors``). Returns
    (nll, grad [2 + n_ranges]).

    shard_map support: ``neighbors`` may be a LOCAL row shard whose indices
    point into the replicated ``coords``/``r`` tables; pass the local rows'
    coordinates as ``row_coords`` [n_rows, d], their residual as ``row_r``
    [n_rows], their 0/1 validity as ``row_valid`` (mesh padding rows), and
    ``include_const=False`` so the caller adds the 0.5 * n_total * log(2 pi)
    constant once after the psum."""
    n, m = neighbors.shape
    dim = coords.shape[1]
    if row_coords is None:
        row_coords = coords
    if shape not in _SUPPORTED_SHAPES:
        raise ValueError(f"unsupported shape {shape}")
    idx = jnp.maximum(neighbors, 0)
    nb_coords = coords[idx].astype(jnp.float32)
    mask = (neighbors >= 0).astype(jnp.int32).astype(jnp.float32)
    g = (n + BLOCK - 1) // BLOCK
    n_pad = g * BLOCK
    nbT = jnp.pad(jnp.transpose(nb_coords, (1, 2, 0)),
                  ((0, 0), (0, 0), (0, n_pad - n))).reshape(m, dim, g, 8, 128)
    rowT = jnp.pad(row_coords.T.astype(jnp.float32),
                   ((0, 0), (0, n_pad - n))).reshape(dim, g, 8, 128)
    maskT = jnp.pad(mask.T, ((0, 0), (0, n_pad - n)),
                    constant_values=1.0).reshape(m, g, 8, 128)
    r32 = r.astype(jnp.float32)
    rrow = r32 if row_r is None else row_r.astype(jnp.float32)
    rnbT = jnp.pad((r32[idx] * mask).T,
                   ((0, 0), (0, n_pad - n))).reshape(m, g, 8, 128)
    rrowT = jnp.pad(rrow[None, :], ((0, 0), (0, n_pad - n))).reshape(
        1, g, 8, 128)
    rv = (jnp.ones(n, jnp.float32) if row_valid is None
          else row_valid.astype(jnp.float32))
    rvT = jnp.pad(rv[None, :], ((0, 0), (0, n_pad - n))).reshape(
        1, g, 8, 128)
    logp = jnp.asarray(log_cov_pars, jnp.float32)

    def kernel(pars_ref, nb_ref, row_ref, mask_ref, rnb_ref, rrow_ref,
               rv_ref, out_ref):
        _nll_grad_kernel(pars_ref, nb_ref, row_ref, mask_ref, rnb_ref,
                         rrow_ref, rv_ref, out_ref, m=m, dim=dim,
                         shape=shape, ard=ard)

    interpret = jax.default_backend() != "tpu"
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((m, dim, 1, 8, 128),
                             lambda i: (0, 0, i, 0, 0)),
                pl.BlockSpec((dim, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((m, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((m, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((1, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((1, 1, 8, 128), lambda i: (0, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
        )(logp, nbT, rowT, maskT, rnbT, rrowT, rvT)
    tot = jnp.sum(out, axis=0)[0]
    nll = tot[0]
    if include_const:
        nll = nll + 0.5 * n * math.log(2.0 * math.pi)
    n_ranges = dim if ard else 1
    return nll, tot[1:3 + n_ranges]


def vecchia_factors_pallas(cov_pars, coords, neighbors, nugget,
                           include_nugget: bool, shape: float,
                           ard: bool = False, row_coords=None):
    """Fused (A [n, m], D [n]) Vecchia factor build; cov_pars = [var, range]
    (isotropic) or [var, rho_1..rho_d] (``ard=True``).

    ``row_coords`` (default = ``coords``): coordinates of the rows the
    ``neighbors`` matrix refers to — pass the PREDICTION points with the
    observed-coordinate gather table for prediction factor builds.

    f32 in/out. Forward only — wrap with a custom VJP at the call site for
    gradients (the jnp transposed path supplies the backward).
    """
    if row_coords is None:
        row_coords = coords
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
    rowT = jnp.pad(row_coords.T.astype(jnp.float32),
                   ((0, 0), (0, n_pad - n))).reshape(dim, g, 8, 128)
    maskT = jnp.pad(mask.T, ((0, 0), (0, n_pad - n)),
                    constant_values=1.0).reshape(m, g, 8, 128)
    mc = jnp.asarray(_mult_const(shape), jnp.float32)
    if ard:
        scales = [mc / jnp.asarray(cov_pars[1 + k], jnp.float32)
                  for k in range(dim)]
    else:
        scales = [mc / jnp.asarray(cov_pars[1], jnp.float32)] * dim
    pars = jnp.stack([
        jnp.asarray(cov_pars[0], jnp.float32),
        (jnp.asarray(nugget, jnp.float32) if nugget is not None
         else jnp.zeros((), jnp.float32))] + scales)

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
