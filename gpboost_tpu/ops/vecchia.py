"""Vecchia approximation: neighbor search + sparse factor construction.

TPU-native redesign of the reference's Vecchia machinery
(``src/GPBoost/Vecchia_utils.cpp``): instead of CoverTrees and per-row Eigen
solves, everything is dense-blocked and batched —

- neighbor search (:697 ``find_nearest_neighbors_Vecchia``) becomes a blocked
  brute-force distance + top-k sweep on the MXU; the [n, m] neighbor-index
  matrix IS the sparsity structure (SURVEY §7 design stance).
- factor construction ``B = I - A``, ``D`` (:1307
  ``CalcCovFactorGradientVecchia``) becomes one batched [n, m, m] Cholesky
  solve; covariance-parameter gradients come from autodiff through the whole
  build, replacing the hand-derived gradient code.
- predictions (:1634 ``CalcPredVecchiaObservedFirstOrder`` with
  ``order_obs_first_cond_obs_only``) become batched local kriging on the
  prediction points' observed neighbors.

For Gaussian likelihood the approximation is applied to the *response*
covariance (nugget on the diagonal) — with num_neighbors = n-1 it reproduces
the exact NLL (R test ``test_GPModel_gaussian_process.R:702-716``).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops.cov_fns import CovFunction

LOG_2PI = math.log(2.0 * math.pi)



def _safe_dist(sq: jnp.ndarray) -> jnp.ndarray:
    """sqrt with zero (not inf) gradient at 0 — required when distances are
    differentiated through parameter-scaled coordinates (ARD kernels) and
    i == j entries are exactly 0 (double-where trick)."""
    sq = jnp.maximum(sq, 0.0)
    pos = sq > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)

def apply_ordering(n: int, ordering: str, seed: int = 0,
                   time_col: Optional[np.ndarray] = None) -> np.ndarray:
    """Permutation used before neighbor search (``docs/Main_parameters.rst:184``:
    none / random / time / time_random_space). ``time`` stable-sorts by the
    first (time) coordinate; ``time_random_space`` shuffles first so spatial
    points at equal times land in random order (``Vecchia_utils.cpp:1094-1120``:
    shuffle then stable sort by coordinate 0)."""
    if ordering in ("none", None):
        return np.arange(n)
    if ordering == "random":
        rng = np.random.default_rng(seed)
        return rng.permutation(n)
    if ordering == "time":
        assert time_col is not None
        return np.argsort(time_col, kind="stable")
    if ordering == "time_random_space":
        assert time_col is not None
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        return perm[np.argsort(np.asarray(time_col)[perm], kind="stable")]
    raise ValueError(f"vecchia_ordering '{ordering}' not supported")


def find_neighbors(coords: jnp.ndarray, num_neighbors: int,
                   chunk: int = 1024, method: str = "auto",
                   codes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Nearest ``m`` *previous* points for each row (data order = ordering).

    Returns [n, m] int32; entry -1 marks padding (i < m has only i neighbors).
    Blocked brute force: distances for a row chunk against all points, mask
    j >= i, top-k. O(n^2 d) flops on the MXU — the TPU answer to CoverTree kNN
    (``Vecchia_utils.cpp:93-168``).

    ``method``: 'exact' uses lax.top_k (sort-based — slow on TPU for wide
    rows); 'approx' uses the TPU-optimized ``lax.approx_max_k`` (recall 0.99;
    measured ~1000x faster at n=1e5). 'auto' = approx on TPU when n > 4096.

    ``codes``: optional [n] int cluster codes — rows only take neighbors with
    the SAME code (independent GP realizations per ``cluster_ids``; rows with
    fewer than m same-cluster predecessors get -1 padding).
    """
    n, d = coords.shape
    m = num_neighbors
    if method == "auto":
        method = ("approx" if jax.default_backend() == "tpu" and n > 4096
                  else "exact")
    if method == "approx" and coords.dtype == jnp.float64:
        # approx_max_k has no f64 lowering on TPU (X64-rewrite unsupported
        # for PartialReduce); f32 distances are ample for neighbor SELECTION
        coords = coords.astype(jnp.float32)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    coords_pad = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    codes_pad = (None if codes is None
                 else jnp.pad(jnp.asarray(codes, jnp.int32),
                              (0, n_pad - n), constant_values=-7))
    out = _nn_scan(coords_pad, codes_pad, n, chunk, m, method)
    return out.reshape(n_pad, -1)[:n]


# module-level cached jit: a closure re-jitted per call would recompile on
# EVERY search (~3 s over the TPU tunnel — was 15x the actual compute)
@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _nn_scan(coords_pad, codes_pad, n: int, chunk: int, m: int, method: str):
    """All previous-point neighbor chunks in ONE device dispatch
    (lax.scan over chunk starts)."""
    n_pad, d = coords_pad.shape
    sq = jnp.sum(coords_pad * coords_pad, axis=1)

    def one_chunk(start):
        rows = jax.lax.dynamic_slice(coords_pad, (start, 0), (chunk, d))
        sq_rows = jnp.sum(rows * rows, axis=1)
        cross = jnp.matmul(rows, coords_pad.T,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = sq_rows[:, None] + sq[None, :] - 2.0 * cross
        row_ids = start + jnp.arange(chunk)[:, None]
        col_ids = jnp.arange(n_pad)[None, :]
        valid = col_ids < jnp.minimum(row_ids, n)
        if codes_pad is not None:
            row_codes = jax.lax.dynamic_slice(codes_pad, (start,), (chunk,))
            valid = valid & (codes_pad[None, :] == row_codes[:, None])
        d2 = jnp.where(valid, d2, jnp.inf)
        if method == "approx":
            neg_d, idx = jax.lax.approx_max_k(-d2, m, recall_target=0.99)
        else:
            neg_d, idx = jax.lax.top_k(-d2, m)
        idx = jnp.where(jnp.isfinite(neg_d), idx, -1)
        return idx.astype(jnp.int32)

    starts = jnp.arange(0, n_pad, chunk)
    _, out = jax.lax.scan(lambda _, s: (None, one_chunk(s)), None, starts)
    return out


# ---------------------------------------------------------------------------
# batched small-SPD solves: XLA's batched Cholesky is ~10x slower than an
# unrolled elementwise factorization for m ~ 20 on TPU (measured 239ms vs
# 25ms at [1e5, 20, 20] f32) — so roll our own, with a custom VJP so the
# backward pass is one extra solve instead of unrolled-loop autodiff.
# ---------------------------------------------------------------------------

_UNROLL_MAX_M = 64


def _chol_unrolled(C: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of [B, m, m] via an unrolled column sweep (VPU ops)."""
    m = C.shape[-1]
    B = C
    L = jnp.zeros_like(C)
    for j in range(m):
        dj = jnp.sqrt(jnp.maximum(B[:, j, j], 1e-30))
        col = B[:, :, j] / dj[:, None]
        col = jnp.where((jnp.arange(m) >= j)[None, :], col, 0.0)
        L = L.at[:, :, j].set(col)
        B = B - col[:, :, None] * col[:, None, :]
    return L


def _solve_lower_unrolled(L, b):
    m = L.shape[-1]
    x = b
    for j in range(m):
        xj = x[:, j] / L[:, j, j]
        x = x.at[:, j].set(xj)
        upd = L[:, :, j] * xj[:, None]
        x = x - jnp.where((jnp.arange(m) > j)[None, :], upd, 0.0)
    return x


def _solve_upper_t_unrolled(L, b):
    m = L.shape[-1]
    x = b
    for j in reversed(range(m)):
        xj = x[:, j] / L[:, j, j]
        x = x.at[:, j].set(xj)
        upd = L[:, j, :] * xj[:, None]
        x = x - jnp.where((jnp.arange(m) < j)[None, :], upd, 0.0)
    return x


def _posdef_solve_impl(C, b):
    m = C.shape[-1]
    if m <= _UNROLL_MAX_M:
        L = _chol_unrolled(C)
        a = _solve_upper_t_unrolled(L, _solve_lower_unrolled(L, b))
    else:
        L = jnp.linalg.cholesky(C)
        a = jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]
    return a, L


@jax.custom_vjp
def posdef_solve(C: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve a = C^-1 b for C [B, m, m], b [B, m].

    Custom VJP: dC = -u a^T, db = u with u = C^-1 v — one extra solve in the
    backward pass instead of differentiating through the factorization.
    """
    return _posdef_solve_impl(C, b)[0]


def _posdef_solve_fwd(C, b):
    a, L = _posdef_solve_impl(C, b)
    return a, (L, a)


def _posdef_solve_bwd(res, v):
    L, a = res
    m = L.shape[-1]
    if m <= _UNROLL_MAX_M:
        u = _solve_upper_t_unrolled(L, _solve_lower_unrolled(L, v))
    else:
        u = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
    dC = -u[:, :, None] * a[:, None, :]
    return dC, u


posdef_solve.defvjp(_posdef_solve_fwd, _posdef_solve_bwd)


# ---------------------------------------------------------------------------
# Transposed ("structure-of-arrays") factor build.
#
# TPU memory tiles are (8 sublanes, 128 lanes) over the last two axes, so a
# [n, m, m] batch with m ~ 20 physically occupies (24, 128) tiles — ~29x the
# true data — and the column-sweep Cholesky above re-reads/writes that padded
# buffer m times (measured 28.6 ms per NLL eval at n=1e5, m=20: 100% of the
# eval cost). Storing the SAME problem as an [m(m+1)/2] collection of [n]
# vectors removes all padding and lets XLA fuse the sweep into long
# elementwise chains: only entries (i,k <= j) are touched at step j, i.e.
# m^3/6 vector FMAs instead of m full [n, 24, 128] passes.
# ---------------------------------------------------------------------------


def _tri_pairs(m: int):
    """Lower-triangle (i, k) pairs, k <= i, in stack order."""
    return [(i, k) for i in range(m) for k in range(i + 1)]


def _chol_solve_lists(C, b):
    """Cholesky + solve on list-of-[n]-vector representation.

    ``C``: dict {(i, k): [n]} lower entries (k <= i); ``b``: list of m [n]
    vectors. Returns (a list, L dict) with a = C^-1 b.
    """
    m = len(b)
    B = {ik: C[ik] for ik in C}
    L = {}
    for j in range(m):
        dj = jnp.sqrt(jnp.maximum(B[(j, j)], 1e-30))
        inv = 1.0 / dj
        for i in range(j, m):
            L[(i, j)] = B[(i, j)] * inv
        for i in range(j + 1, m):
            for k in range(j + 1, i + 1):
                B[(i, k)] = B[(i, k)] - L[(i, j)] * L[(k, j)]
    x = list(b)
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
    return x, L


def _lists_from_stacks(c_low, c_in):
    m = c_in.shape[0]
    pairs = _tri_pairs(m)
    C = {ik: c_low[t] for t, ik in enumerate(pairs)}
    b = [c_in[i] for i in range(m)]
    return C, b


@jax.custom_vjp
def posdef_solve_t(c_low: jnp.ndarray, c_in: jnp.ndarray) -> jnp.ndarray:
    """a = C^-1 b in transposed layout: c_low [m(m+1)/2, n] lower entries,
    c_in [m, n] rhs; returns a [m, n]. Custom VJP = one extra solve
    (symmetric-lower gradient), like :func:`posdef_solve`."""
    C, b = _lists_from_stacks(c_low, c_in)
    a, _ = _chol_solve_lists(C, b)
    return jnp.stack(a)


def _posdef_solve_t_fwd(c_low, c_in):
    C, b = _lists_from_stacks(c_low, c_in)
    a, L = _chol_solve_lists(C, b)
    m = c_in.shape[0]
    l_stack = jnp.stack([L[ik] for ik in _tri_pairs(m)])
    return jnp.stack(a), (l_stack, jnp.stack(a))


def _posdef_solve_t_bwd(res, v):
    l_stack, a = res
    m = a.shape[0]
    pairs = _tri_pairs(m)
    L = {ik: l_stack[t] for t, ik in enumerate(pairs)}
    # solve C u = v re-using the factor
    u = [v[i] for i in range(m)]
    for j in range(m):
        uj = u[j] / L[(j, j)]
        u[j] = uj
        for i in range(j + 1, m):
            u[i] = u[i] - L[(i, j)] * uj
    for j in reversed(range(m)):
        uj = u[j] / L[(j, j)]
        u[j] = uj
        for i in range(j):
            u[i] = u[i] - L[(j, i)] * uj
    # dC = -u a' (+ symmetric mirror for off-diagonal lower entries)
    dC = []
    for (i, k) in pairs:
        if i == k:
            dC.append(-u[i] * a[i])
        else:
            dC.append(-(u[i] * a[k] + u[k] * a[i]))
    return jnp.stack(dC), jnp.stack(u)


posdef_solve_t.defvjp(_posdef_solve_t_fwd, _posdef_solve_t_bwd)


def _build_factors_transposed(cov_fn, cov_pars, coords, neighbors, nugget,
                              include_nugget, row_coords, scaled):
    """Transposed-layout implementation of :func:`build_factors` (same
    contract); used for large n where the [n, m, m] tile padding dominates."""
    n, m = neighbors.shape
    mask = neighbors >= 0
    idx = jnp.maximum(neighbors, 0)
    nbT = jnp.transpose(coords[idx], (1, 2, 0))          # [m, d, n]
    rowT = row_coords.T                                  # [d, n]
    maskT = mask.T                                       # [m, n]
    dtype = coords.dtype

    def corr(dist):
        if scaled:
            return cov_pars[0] * cov_fn.corr_from_scaled_dist(dist, cov_pars)
        return cov_fn.cov_matrix(cov_pars, dist=dist)

    pairs = _tri_pairs(m)
    var_ii = corr(jnp.zeros((), dtype))
    if include_nugget and nugget is not None:
        var_ii = var_ii + nugget
    c_low = []
    for (i, k) in pairs:
        valid = maskT[i] & maskT[k]
        if i == k:
            c = jnp.where(valid, var_ii, 1.0)
        else:
            d2 = jnp.sum((nbT[i] - nbT[k]) ** 2, axis=0)
            c = corr(_safe_dist(d2))
            c = jnp.where(valid, c, 0.0)
        c_low.append(c)
    c_in = []
    for i in range(m):
        d2 = jnp.sum((rowT - nbT[i]) ** 2, axis=0)
        c = corr(_safe_dist(d2))
        c_in.append(jnp.where(maskT[i], c, 0.0))
    c_in = jnp.stack(c_in)                                # [m, n]
    a = posdef_solve_t(jnp.stack(c_low), c_in)            # [m, n]
    a = jnp.where(maskT, a, 0.0)
    d_cond = var_ii - jnp.sum(c_in * a, axis=0)
    return a.T, d_cond


# transposed build pays a bigger trace/compile (m^3/6 HLO ops) but removes
# the tile-padding HBM tax; worth it once the batch is large
_TRANSPOSED_MIN_ROWS = 20_000


@partial(jax.jit, static_argnums=(0, 5))
def build_factors(cov_fn: CovFunction, cov_pars: jnp.ndarray,
                  coords: jnp.ndarray, neighbors: jnp.ndarray,
                  nugget: Optional[jnp.ndarray], include_nugget: bool,
                  row_coords: Optional[jnp.ndarray] = None,
                  nb_coords: Optional[jnp.ndarray] = None):
    """Batched Vecchia factors.

    A [n, m]: conditioning weights; D [n]: conditional variances, for the
    covariance ``pars[0]*corr(dist) (+ nugget I if include_nugget)``.
    B = I - scatter(A); Sigma^-1 ~ B' D^-1 B.

    ``row_coords`` (default = coords) are the coordinates of the rows the
    ``neighbors`` matrix refers to — pass a shard of rows with the full
    replicated ``coords`` for mesh-sharded builds (neighbor gathers need the
    global coordinate table).

    ``nb_coords`` [n, m, d]: PRE-GATHERED neighbor coordinates (the halo
    layout). When given, ``coords`` is never indexed (may be None) — every
    input is row-local, so shards need no replicated global table (see
    ``parallel/mesh.py sharded_vecchia_nll_halo_fn``).
    """
    if row_coords is None:
        row_coords = coords
    scaled = not cov_fn.is_isotropic and cov_fn.has_coord_scaling
    if scaled:
        # ARD / space-time: isotropic with unit range in scaled coordinates
        if coords is not None:
            coords = cov_fn.scale_coords(coords, cov_pars)
        row_coords = cov_fn.scale_coords(row_coords, cov_pars)
        if nb_coords is not None:
            nm, mm, dd = nb_coords.shape
            nb_coords = cov_fn.scale_coords(
                nb_coords.reshape(nm * mm, dd), cov_pars).reshape(nm, mm, -1)
    n, m = neighbors.shape
    nonstat = cov_fn.cov_fct_type in ("linear", "hurst")
    if (nb_coords is None and n >= _TRANSPOSED_MIN_ROWS and m <= 64
            and not nonstat):
        return _build_factors_transposed(cov_fn, cov_pars, coords, neighbors,
                                         nugget, include_nugget, row_coords,
                                         scaled)
    mask = neighbors >= 0
    idx = jnp.maximum(neighbors, 0)
    if nb_coords is None:
        nb_coords = coords[idx]                 # [n, m, d]
    if cov_fn.cov_fct_type == "linear":
        # inner-product kernel sigma2 * x x' (non-stationary: the variance
        # is per-point, cov_fcts.h "linear")
        c_nn = cov_pars[0] * jnp.einsum('nmd,nkd->nmk', nb_coords, nb_coords)
        c_in = cov_pars[0] * jnp.sum(row_coords[:, None, :] * nb_coords, -1)
        var_ii = cov_pars[0] * jnp.sum(row_coords * row_coords, axis=1)
    elif cov_fn.cov_fct_type == "hurst":
        # fractional Brownian motion sigma2/2 (r^H + r'^H - d^2H)
        # (cov_fcts.h HurstCovariance; non-stationary)
        H = cov_pars[1]
        s2h = cov_pars[0] / 2.0
        r_nb = jnp.power(jnp.maximum(
            jnp.sum(nb_coords * nb_coords, -1), 1e-300), H)   # [n, m]
        r_row = jnp.power(jnp.maximum(
            jnp.sum(row_coords * row_coords, -1), 1e-300), H)  # [n]
        diffs = nb_coords[:, :, None, :] - nb_coords[:, None, :, :]
        d2_nn = jnp.power(jnp.maximum(
            jnp.sum(diffs * diffs, -1), 1e-300), H)
        di = row_coords[:, None, :] - nb_coords
        d2_in = jnp.power(jnp.maximum(jnp.sum(di * di, -1), 1e-300), H)
        c_nn = s2h * (r_nb[:, :, None] + r_nb[:, None, :] - d2_nn)
        c_in = s2h * (r_row[:, None] + r_nb - d2_in)
        var_ii = cov_pars[0] * r_row
    else:
        diffs = nb_coords[:, :, None, :] - nb_coords[:, None, :, :]
        d_nn = _safe_dist(jnp.sum(diffs * diffs, -1))              # [n,m,m]
        di = row_coords[:, None, :] - nb_coords
        d_in = _safe_dist(jnp.sum(di * di, -1))                    # [n, m]

        if scaled:
            c_nn = cov_pars[0] * cov_fn.corr_from_scaled_dist(d_nn, cov_pars)
            c_in = cov_pars[0] * cov_fn.corr_from_scaled_dist(d_in, cov_pars)
        else:
            c_nn = cov_fn.cov_matrix(cov_pars, dist=d_nn)
            c_in = cov_fn.cov_matrix(cov_pars, dist=d_in[:, None, :])[:, 0, :]
        var_ii = cov_pars[0] * jnp.ones(n, dtype=row_coords.dtype)
    if include_nugget and nugget is not None:
        eye = jnp.eye(m, dtype=row_coords.dtype)
        c_nn = c_nn + nugget * eye[None]
        var_ii = var_ii + nugget
    # mask padding: identity rows/cols so the solve yields 0 weights there
    pair_mask = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(m, dtype=row_coords.dtype)
    c_nn = jnp.where(pair_mask, c_nn, eye[None])
    c_in = jnp.where(mask, c_in, 0.0)

    a = posdef_solve(c_nn, c_in)
    a = jnp.where(mask, a, 0.0)
    d_cond = var_ii - jnp.sum(c_in * a, axis=1)
    return a, d_cond


@partial(jax.jit, static_argnums=(0, 6))
def build_factors_residual(cov_fn: CovFunction, cov_pars: jnp.ndarray,
                           coords: jnp.ndarray, neighbors: jnp.ndarray,
                           lr_cols: jnp.ndarray,
                           nugget: Optional[jnp.ndarray],
                           include_nugget: bool):
    """Vecchia factors of the RESIDUAL process of a full-scale (VIF)
    approximation (``gp_approx='full_scale_vecchia'``).

    The residual covariance is r(s_i, s_j) = k(s_i, s_j) - p_i . p_j where
    p_i = ``lr_cols[:, i]`` = L_mm^-1 K_m,i (chol_ip_cross_cov in the
    reference, ``re_model_template.h:4667-4771``). Returns (A, D) with
    B = I - scatter(A), Lambda^-1 ~ B' D^-1 B, Lambda = Vecchia(residual
    (+ nugget I when include_nugget)).
    """
    scaled = not cov_fn.is_isotropic and cov_fn.has_coord_scaling
    if scaled:
        coords = cov_fn.scale_coords(coords, cov_pars)
    n, m = neighbors.shape
    mask = neighbors >= 0
    idx = jnp.maximum(neighbors, 0)
    nb_coords = coords[idx]
    diffs = nb_coords[:, :, None, :] - nb_coords[:, None, :, :]
    d_nn = _safe_dist(jnp.sum(diffs * diffs, -1))
    di = coords[:, None, :] - nb_coords
    d_in = _safe_dist(jnp.sum(di * di, -1))
    if scaled:
        c_nn = cov_pars[0] * cov_fn.corr_from_scaled_dist(d_nn, cov_pars)
        c_in = cov_pars[0] * cov_fn.corr_from_scaled_dist(d_in, cov_pars)
    else:
        c_nn = cov_fn.cov_matrix(cov_pars, dist=d_nn)
        c_in = cov_fn.cov_matrix(cov_pars, dist=d_in[:, None, :])[:, 0, :]
    # subtract the low-rank (inducing-point) part
    lr_t = lr_cols.T                              # [n, k]
    V = lr_t[idx]                                 # [n, m, k]
    c_nn = c_nn - jnp.einsum('nik,njk->nij', V, V)
    c_in = c_in - jnp.einsum('nk,nmk->nm', lr_t, V)
    var_ii = cov_pars[0] - jnp.sum(lr_t * lr_t, axis=1)
    if include_nugget and nugget is not None:
        eye = jnp.eye(m, dtype=coords.dtype)
        c_nn = c_nn + nugget * eye[None]
        var_ii = var_ii + nugget
    pair_mask = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(m, dtype=coords.dtype)
    c_nn = jnp.where(pair_mask, c_nn, eye[None])
    c_in = jnp.where(mask, c_in, 0.0)
    a = posdef_solve(c_nn, c_in)
    a = jnp.where(mask, a, 0.0)
    d_cond = var_ii - jnp.sum(c_in * a, axis=1)
    return a, jnp.maximum(d_cond, 1e-12)


@partial(jax.jit, static_argnums=(0, 6))
def build_factors_svc(cov_fn: CovFunction, pars_stack: jnp.ndarray,
                      coords: jnp.ndarray, neighbors: jnp.ndarray,
                      z: jnp.ndarray, nugget: Optional[jnp.ndarray],
                      include_nugget: bool,
                      row_coords: Optional[jnp.ndarray] = None,
                      row_z: Optional[jnp.ndarray] = None):
    """Multi-component Vecchia factors for GP random coefficients (SVC).

    Total latent process u(s_i) = sum_c z[i, c] b_c(s_i) with z[:, 0] = 1
    for the base GP; covariance K_ij = sum_c z_ci z_cj k_c(d_ij)
    (reference: random-coefficient components in ``CreateREComponentsVecchia``
    ``Vecchia_utils.cpp:1060`` and their factor/gradient handling in
    ``CalcCovFactorGradientVecchia`` :1307 — here gradients come from
    autodiff through this build).

    ``pars_stack``: [C, p] per-component covariance parameters;
    ``z``: [n, C] covariate columns. ``row_coords``/``row_z`` (default =
    coords/z) are the rows the ``neighbors`` matrix refers to — pass the
    prediction points with the combined obs+pred tables for the cond-all
    prediction build. Returns (A [n, m], D [n]).
    """
    if row_coords is None:
        row_coords = coords
    if row_z is None:
        row_z = z
    n, m = neighbors.shape
    C = z.shape[1]
    mask = neighbors >= 0
    idx = jnp.maximum(neighbors, 0)
    nb_coords = coords[idx]                                 # [n, m, d]
    diffs = nb_coords[:, :, None, :] - nb_coords[:, None, :, :]
    d_nn = _safe_dist(jnp.sum(diffs * diffs, -1))           # [n, m, m]
    di = row_coords[:, None, :] - nb_coords
    d_in = _safe_dist(jnp.sum(di * di, -1))                 # [n, m]
    z_nb = z[idx]                                           # [n, m, C]
    c_nn = jnp.zeros((n, m, m), coords.dtype)
    c_in = jnp.zeros((n, m), coords.dtype)
    var_ii = jnp.zeros(n, coords.dtype)
    for c in range(C):
        pc = pars_stack[c]
        k_nn = cov_fn.cov_matrix(pc, dist=d_nn)
        k_in = cov_fn.cov_matrix(pc, dist=d_in[:, None, :])[:, 0, :]
        zc = z_nb[:, :, c]
        c_nn = c_nn + (zc[:, :, None] * zc[:, None, :]) * k_nn
        c_in = c_in + (row_z[:, c][:, None] * zc) * k_in
        var_ii = var_ii + row_z[:, c] * row_z[:, c] * pc[0]
    if include_nugget and nugget is not None:
        eye = jnp.eye(m, dtype=coords.dtype)
        c_nn = c_nn + nugget * eye[None]
        var_ii = var_ii + nugget
    pair_mask = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(m, dtype=coords.dtype)
    c_nn = jnp.where(pair_mask, c_nn, eye[None])
    c_in = jnp.where(mask, c_in, 0.0)
    a = posdef_solve(c_nn, c_in)
    a = jnp.where(mask, a, 0.0)
    d_cond = var_ii - jnp.sum(c_in * a, axis=1)
    return a, d_cond


def predict_vecchia_cond_all(cov_fn: CovFunction, cov_pars: jnp.ndarray,
                             nugget, coords_obs, coords_pred, r_obs,
                             num_neighbors: int,
                             codes_obs: Optional[jnp.ndarray] = None,
                             codes_pred: Optional[jnp.ndarray] = None,
                             predict_response: bool = True):
    """``order_obs_first_cond_all`` Vecchia prediction
    (``CalcPredVecchiaObservedFirstOrder`` with CondObsOnly=false,
    ``Vecchia_utils.cpp:1634``): prediction points are appended after the
    observations and each conditions on its nearest ``m`` points among all
    observations AND previously-ordered prediction points.

    With obs-first ordering B = [[B_oo, 0], [B_po, B_pp]], the predictive
    distribution is mean = -B_pp^-1 B_po r and cov = B_pp^-1 D_p B_pp^-T —
    B_pp is unit lower triangular over the (small) prediction set, so this
    is one dense triangular solve. Returns (mean [n_p], cov [n_p, n_p]).
    """
    n_o = coords_obs.shape[0]
    n_p = coords_pred.shape[0]
    m = min(num_neighbors, n_o + n_p - 1)
    dtype = coords_obs.dtype
    combined = jnp.concatenate([coords_obs, coords_pred], axis=0)
    # masked search: rows = pred points, columns = obs + pred-before
    search = combined
    if not cov_fn.is_isotropic and cov_fn.has_coord_scaling:
        search = cov_fn.scale_coords(combined, cov_pars)
    sq = jnp.sum(search * search, axis=1)
    rows = search[n_o:]
    d2 = (jnp.sum(rows * rows, axis=1)[:, None] + sq[None, :]
          - 2.0 * jnp.matmul(rows, search.T,
                             precision=jax.lax.Precision.HIGHEST))
    col_ids = jnp.arange(n_o + n_p)[None, :]
    row_ids = n_o + jnp.arange(n_p)[:, None]
    valid = col_ids < row_ids
    if codes_obs is not None:
        codes_comb = jnp.concatenate(
            [jnp.asarray(codes_obs, jnp.int32),
             jnp.asarray(codes_pred, jnp.int32)])
        valid = valid & (codes_comb[None, :]
                         == codes_comb[n_o:][:, None])
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_d, nb = jax.lax.top_k(-d2, m)
    nb = jnp.where(jnp.isfinite(neg_d), nb, -1).astype(jnp.int32)

    a, d = build_factors(cov_fn, cov_pars, combined, nb, nugget, True,
                         row_coords=coords_pred)
    return _cond_all_assemble(a, d, nb, n_o, n_p, r_obs, nugget,
                              predict_response, dtype)


def _cond_all_assemble(a, d, nb, n_o, n_p, r_obs, nugget, predict_response,
                       dtype):
    """Mean/cov from obs-first cond-all factors: with B = [[B_oo, 0],
    [B_po, B_pp]], mean = -B_pp^-1 B_po r and cov = B_pp^-1 D_p B_pp^-T."""
    m = nb.shape[1]
    is_obs = (nb >= 0) & (nb < n_o)
    is_prd = nb >= n_o
    rhs = jnp.sum(jnp.where(is_obs, a, 0.0)
                  * r_obs[jnp.where(is_obs, nb, 0)], axis=1)
    M = jnp.eye(n_p, dtype=dtype)
    rows_idx = jnp.repeat(jnp.arange(n_p), m)
    cols_idx = jnp.where(is_prd, nb - n_o, n_p).reshape(-1)  # n_p = dropped
    M = M.at[rows_idx, cols_idx].add(
        jnp.where(is_prd, -a, 0.0).reshape(-1), mode="drop")
    mean = jax.scipy.linalg.solve_triangular(M, rhs, lower=True)
    V = jax.scipy.linalg.solve_triangular(M, jnp.eye(n_p, dtype=dtype),
                                          lower=True)
    cov = (V * d[None, :]) @ V.T
    if not predict_response:
        cov = cov - nugget * jnp.eye(n_p, dtype=dtype)
    return mean, cov


def predict_vecchia_pred_first(cov_fn: CovFunction, cov_pars: jnp.ndarray,
                               nugget, coords_obs, coords_pred, r_obs,
                               num_neighbors: int,
                               predict_response: bool = True):
    """``order_pred_first`` Vecchia prediction
    (``CalcPredVecchiaPredictedFirstOrder``, Vecchia_utils.cpp:2018):
    prediction points are ordered FIRST, a joint sequential Vecchia
    approximation is built over [pred; obs], and the predictive distribution
    comes from the conditional precision

      P = Bp' Dp^-1 Bp + Bop' Do^-1 Bop,   mean = -P^-1 Bop' Do^-1 Bo r,
      cov = P^-1.

    Returns (mean [n_p], cov [n_p, n_p])."""
    n_o = coords_obs.shape[0]
    n_p = coords_pred.shape[0]
    m = min(num_neighbors, n_o + n_p - 1)
    dtype = coords_obs.dtype
    combined = jnp.concatenate([coords_pred, coords_obs], axis=0)
    search = combined
    if not cov_fn.is_isotropic and cov_fn.has_coord_scaling:
        search = cov_fn.scale_coords(combined, cov_pars)
    nb = find_neighbors(search, m, method="exact")
    a, d = build_factors(cov_fn, cov_pars, combined, nb, nugget, True)
    a_p, nb_p = a[:n_p], nb[:n_p]          # pred rows: neighbors all < n_p
    a_o, nb_o = a[n_p:], nb[n_p:]
    dp_inv = 1.0 / d[:n_p]
    do_inv = 1.0 / d[n_p:]
    Bp = jnp.eye(n_p, dtype=dtype)
    rows_p = jnp.repeat(jnp.arange(n_p), m)
    cols_p = jnp.where(nb_p >= 0, nb_p, n_p).reshape(-1)
    Bp = Bp.at[rows_p, cols_p].add(
        jnp.where(nb_p >= 0, -a_p, 0.0).reshape(-1), mode="drop")
    is_pred_nb = (nb_o >= 0) & (nb_o < n_p)
    rows_o = jnp.repeat(jnp.arange(n_o), m)
    cols_o = jnp.where(is_pred_nb, nb_o, n_p).reshape(-1)
    Bop = jnp.zeros((n_o, n_p), dtype).at[rows_o, cols_o].add(
        jnp.where(is_pred_nb, -a_o, 0.0).reshape(-1), mode="drop")
    is_obs_nb = nb_o >= n_p
    Bo_r = r_obs - jnp.sum(
        jnp.where(is_obs_nb, a_o, 0.0)
        * r_obs[jnp.where(is_obs_nb, nb_o - n_p, 0)], axis=1)
    cond_prec = ((Bp.T * dp_inv[None, :]) @ Bp
                 + (Bop.T * do_inv[None, :]) @ Bop)
    y_aux = Bop.T @ (do_inv * Bo_r)
    Lc = jnp.linalg.cholesky(cond_prec)
    mean = -jax.scipy.linalg.cho_solve((Lc, True), y_aux)
    cov = jax.scipy.linalg.cho_solve((Lc, True), jnp.eye(n_p, dtype=dtype))
    if not predict_response:
        cov = cov - nugget * jnp.eye(n_p, dtype=dtype)
    return mean, cov


def _latent_precision_diag(a, neighbors, d):
    """diag(B' D^-1 B) for the latent factors."""
    n = d.shape[0]
    idx = jnp.maximum(neighbors, 0)
    contrib = jnp.where(neighbors >= 0, a * a / d[:, None], 0.0)
    return (1.0 / d) + jnp.zeros(n, d.dtype).at[idx.reshape(-1)].add(
        contrib.reshape(-1))


def predict_vecchia_latent(cov_fn: CovFunction, gp_pars: jnp.ndarray,
                           nugget, coords_obs, coords_pred, y_obs,
                           num_neighbors: int, cond_obs_only: bool,
                           predict_response: bool = True,
                           cg_tol: float = 1e-10, cg_max_iter: int = 10000):
    """``latent_order_obs_first_cond_obs_only`` / ``..._cond_all``
    (``CalcPredVecchiaLatentObservedFirstOrder``, Vecchia_utils.cpp:2241):
    Vecchia on the LATENT process over the unique coordinates (duplicate
    locations handled via incidence gathers), then exact Gaussian noise:

      mean = Zp S Zo' (Zo S Zo' + s0 I)^-1 y,
      cov  = Zp S Zp' - Zp S Zo' (Zo S Zo' + s0 I)^-1 Zo S Zp'  (+ s0 I).

    The reference factors a sparse n_u x n_u system with a sparse Cholesky;
    here every solve is matrix-free Jacobi-PCG on the latent precision
    Q = B'D^-1 B (and on W = s0 Q + Zo'Zo via Woodbury) — O(n m) per
    matvec, no sparse triangular solves, tight tolerance so results match
    the direct factorization. Returns (mean [n_p], var [n_p],
    cov [n_p, n_p])."""
    from gpboost_tpu.ops import cg as cgops
    co = np.asarray(coords_obs, np.float64)
    cp = np.asarray(coords_pred, np.float64)
    n_o, n_p = co.shape[0], cp.shape[0]
    dtype = (coords_obs.dtype if hasattr(coords_obs, "dtype")
             else jnp.result_type(float))
    all_np = np.concatenate([co, cp], axis=0)
    # unique coordinates in first-occurrence order (the reference's
    # DetermineUniqueDuplicateCoordsFast semantics, exact equality)
    _, first_idx, inv = np.unique(all_np, axis=0, return_index=True,
                                  return_inverse=True)
    order = np.argsort(first_idx)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    u_idx = rank[np.asarray(inv).ravel()]
    coords_u = all_np[np.sort(first_idx)]
    n_u = coords_u.shape[0]
    zo_idx = u_idx[:n_o]
    zp_idx = u_idx[n_o:]
    n_uo = int(zo_idx.max()) + 1 if n_o else 0
    if np.any(zp_idx < n_uo):
        raise ValueError(
            "Duplicates found among training and test coordinates. This is "
            "not supported for predictions with a Vecchia approximation for "
            "the latent process ('latent_')")
    m = min(num_neighbors, n_u - 1)
    cu = jnp.asarray(coords_u, dtype)
    search = cu
    if not cov_fn.is_isotropic and cov_fn.has_coord_scaling:
        search = cov_fn.scale_coords(cu, gp_pars)
    nb_obs = find_neighbors(search[:n_uo], min(m, n_uo - 1), method="exact")
    if cond_obs_only:
        nb_pred = find_neighbors_cross(search[n_uo:], search[:n_uo],
                                       min(m, n_uo))
    else:
        # neighbors among obs uniques + previously-ordered pred uniques
        sq = jnp.sum(search * search, axis=1)
        rows = search[n_uo:]
        d2 = (jnp.sum(rows * rows, axis=1)[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(rows, search.T,
                                 precision=jax.lax.Precision.HIGHEST))
        col_ids = jnp.arange(n_u)[None, :]
        row_ids = n_uo + jnp.arange(n_u - n_uo)[:, None]
        d2 = jnp.where(col_ids < row_ids, d2, jnp.inf)
        neg_d, nb_pred = jax.lax.top_k(-d2, m)
        nb_pred = jnp.where(jnp.isfinite(neg_d), nb_pred, -1)
    # unify neighbor widths to m with -1 padding
    def pad_to_m(x):
        k = x.shape[1]
        return (x if k == m else
                jnp.concatenate([x, jnp.full((x.shape[0], m - k), -1,
                                             x.dtype)], axis=1))
    nb = jnp.concatenate([pad_to_m(nb_obs.astype(jnp.int32)),
                          pad_to_m(nb_pred.astype(jnp.int32))], axis=0)
    a, du = build_factors(cov_fn, gp_pars, cu, nb, None, False)

    def q_mv(V):
        if V.ndim == 1:
            return precision_matvec(a, nb, du, V)
        return jax.vmap(lambda col: precision_matvec(a, nb, du, col),
                        in_axes=1, out_axes=1)(V)

    counts = jnp.zeros(n_u, dtype).at[zo_idx].add(1.0)  # Zo'Zo is diagonal
    diag_q = _latent_precision_diag(a, nb, du)

    def w_mv(V):  # W = nugget * Q + Zo'Zo
        return nugget * q_mv(V) + (counts[:, None] * V if V.ndim == 2
                                   else counts * V)

    pre_q = jnp.maximum(diag_q, 1e-300)
    pre_w = jnp.maximum(nugget * diag_q + counts, 1e-300)

    def solve_q(B):
        X, _ = cgops.pcg(q_mv, B,
                         lambda R: R / (pre_q[:, None] if R.ndim == 2
                                        else pre_q),
                         tol=cg_tol, max_iter=cg_max_iter)
        return X

    def solve_w(B):
        X, _ = cgops.pcg(w_mv, B,
                         lambda R: R / (pre_w[:, None] if R.ndim == 2
                                        else pre_w),
                         tol=cg_tol, max_iter=cg_max_iter)
        return X

    y_obs = jnp.asarray(y_obs, dtype)
    zo_j = jnp.asarray(zo_idx)
    zp_j = jnp.asarray(zp_idx)
    # mean = Zp Q^-1 Zo' t with t = (y - Zo W^-1 Zo'y) / nugget
    zty = jnp.zeros(n_u, dtype).at[zo_j].add(y_obs)
    t = (y_obs - solve_w(zty)[zo_j]) / nugget
    u1 = solve_q(jnp.zeros(n_u, dtype).at[zo_j].add(t))
    mean = u1[zp_j]
    # C = Q^-1 Zp'  [n_u, n_p]
    E = jnp.zeros((n_u, n_p), dtype).at[zp_j, jnp.arange(n_p)].set(1.0)
    C = solve_q(E)
    Kpp = C[zp_j]                           # Zp Q^-1 Zp'  [n_p, n_p]
    KopC = C[zo_j]                          # Zo Q^-1 Zp'  [n_o, n_p]
    S2 = solve_w(jnp.zeros((n_u, n_p), dtype).at[zo_j].add(KopC))
    A_KopC = (KopC - S2[zo_j]) / nugget     # (K_oo + s0 I)^-1 K_op
    cov = Kpp - KopC.T @ A_KopC
    if predict_response:
        cov = cov + nugget * jnp.eye(n_p, dtype=dtype)
    return mean, jnp.diagonal(cov), cov


def predict_vecchia_cond_all_svc(cov_fn: CovFunction, pars_stack: jnp.ndarray,
                                 nugget, coords_obs, coords_pred,
                                 z_obs, z_pred, r_obs, num_neighbors: int,
                                 predict_response: bool = True):
    """``order_obs_first_cond_all`` prediction for multi-component (SVC)
    Vecchia models (``CalcPredVecchiaObservedFirstOrder`` with random
    coefficients and CondObsOnly=false, ``Vecchia_utils.cpp:1634``).

    Neighbor search runs on coordinates only (SVC requires an isotropic
    kernel); covariances are the z-weighted component sums. Returns
    (mean [n_p], cov [n_p, n_p])."""
    n_o = coords_obs.shape[0]
    n_p = coords_pred.shape[0]
    m = min(num_neighbors, n_o + n_p - 1)
    dtype = coords_obs.dtype
    combined = jnp.concatenate([coords_obs, coords_pred], axis=0)
    z_comb = jnp.concatenate([z_obs, z_pred], axis=0)
    sq = jnp.sum(combined * combined, axis=1)
    rows = combined[n_o:]
    d2 = (jnp.sum(rows * rows, axis=1)[:, None] + sq[None, :]
          - 2.0 * jnp.matmul(rows, combined.T,
                             precision=jax.lax.Precision.HIGHEST))
    col_ids = jnp.arange(n_o + n_p)[None, :]
    row_ids = n_o + jnp.arange(n_p)[:, None]
    d2 = jnp.where(col_ids < row_ids, d2, jnp.inf)
    neg_d, nb = jax.lax.top_k(-d2, m)
    nb = jnp.where(jnp.isfinite(neg_d), nb, -1).astype(jnp.int32)

    a, d = build_factors_svc(cov_fn, pars_stack, combined, nb, z_comb,
                             nugget, True, row_coords=coords_pred,
                             row_z=z_pred)
    return _cond_all_assemble(a, d, nb, n_o, n_p, r_obs, nugget,
                              predict_response, dtype)


@partial(jax.jit, static_argnums=(0, 9))
def predict_vecchia_response_svc(cov_fn: CovFunction, pars_stack: jnp.ndarray,
                                 nugget, coords_obs, coords_pred, nb_pred,
                                 z_obs, z_pred, r_obs,
                                 predict_response: bool):
    """Batched local kriging for multi-component (SVC) Vecchia: prediction
    point conditions on observed neighbors; covariances weighted by the
    per-point random-coefficient covariates (reference
    ``CalcPredVecchiaObservedFirstOrder`` with random coefs,
    ``Vecchia_utils.cpp:1634``)."""
    n_p, m = nb_pred.shape
    C = z_obs.shape[1]
    mask = nb_pred >= 0
    idx = jnp.maximum(nb_pred, 0)
    nb_coords = coords_obs[idx]
    diffs = nb_coords[:, :, None, :] - nb_coords[:, None, :, :]
    d_nn = _safe_dist(jnp.sum(diffs * diffs, -1))
    di = coords_pred[:, None, :] - nb_coords
    d_in = _safe_dist(jnp.sum(di * di, -1))
    z_nb = z_obs[idx]                                       # [n_p, m, C]
    c_nn = jnp.zeros((n_p, m, m), coords_obs.dtype)
    c_in = jnp.zeros((n_p, m), coords_obs.dtype)
    var_pp = jnp.zeros(n_p, coords_obs.dtype)
    for c in range(C):
        pc = pars_stack[c]
        k_nn = cov_fn.cov_matrix(pc, dist=d_nn)
        k_in = cov_fn.cov_matrix(pc, dist=d_in[:, None, :])[:, 0, :]
        zc = z_nb[:, :, c]
        c_nn = c_nn + (zc[:, :, None] * zc[:, None, :]) * k_nn
        c_in = c_in + (z_pred[:, c][:, None] * zc) * k_in
        var_pp = var_pp + z_pred[:, c] * z_pred[:, c] * pc[0]
    eye = jnp.eye(m, dtype=coords_obs.dtype)
    c_nn = c_nn + nugget * eye[None]
    pair_mask = mask[:, :, None] & mask[:, None, :]
    c_nn = jnp.where(pair_mask, c_nn, eye[None])
    c_in = jnp.where(mask, c_in, 0.0)
    a = posdef_solve(c_nn, c_in)
    a = jnp.where(mask, a, 0.0)
    mean = jnp.sum(a * r_obs[idx], axis=1)
    var = var_pp - jnp.sum(c_in * a, axis=1)
    if predict_response:
        var = var + nugget
    return mean, jnp.maximum(var, 0.0)


@jax.jit
def apply_B(a: jnp.ndarray, neighbors: jnp.ndarray, v: jnp.ndarray):
    """(B v)_i = v_i - sum_k A[i,k] v[nb[i,k]]."""
    idx = jnp.maximum(neighbors, 0)
    gathered = v[idx]
    return v - jnp.sum(a * gathered, axis=1)


@jax.jit
def apply_Bt(a: jnp.ndarray, neighbors: jnp.ndarray, v: jnp.ndarray):
    """(B' v)_i = v_i - sum_{j: i in nb(j)} A[j, pos] v_j (scatter-add)."""
    idx = jnp.maximum(neighbors, 0)
    contrib = a * v[:, None]
    out = v - jnp.zeros_like(v).at[idx.reshape(-1)].add(
        jnp.where(neighbors.reshape(-1) >= 0, contrib.reshape(-1), 0.0))
    return out


class BandedB:
    """Block-banded spatial-layout representation of the Vecchia factor
    B = I - A for FAST matvecs (the Laplace mode finder's CG loops).

    TPU reality (measured, v5e): ANY XLA gather/scatter streams ~8 ns per
    index — a 2M-edge B or B' apply costs ~16 ms regardless of formulation
    (scatter-add, 2-index gather, sorted segment_sum all the same), so a
    Newton-CG mode finder at n=1e5 spent ~30 ms PER CG ITERATION on index
    traffic. The fix is structural: relabel the linear system by a HILBERT
    (space-filling) order — a pure permutation similarity, numerically
    identical CG iterates — under which almost every edge connects rows
    within a narrow index band. A is then stored BLOCK-BANDED DENSE
    ([n/Bk, nbk, Bk, Bk] blocks) and applied with batched MXU matmuls —
    no index streams in the iteration; the few out-of-band edges go
    through a small exact scatter. Block VALUES are rebuilt from ``a``
    once per evaluation (one static-index scatter), amortized over
    hundreds of CG iterations.

    The model/approximation is untouched: ``neighbors`` stay defined by
    the Vecchia ordering; this is only the compute layout.
    """

    BK = 128          # layout block size (MXU tile)

    def __init__(self, neighbors, coords, coverage=0.995, max_halo=4):
        import numpy as np
        nb = np.asarray(neighbors)
        n, m = nb.shape
        self.n, self.m = n, m
        c = np.asarray(coords)
        pos = (_hilbert_positions_2d(c) if c.shape[1] == 2
               else _morton_positions(c))
        self.pos = pos.astype(np.int32)                 # model row -> layout
        rows_model = np.argsort(pos)
        self.rows_model = rows_model.astype(np.int32)   # layout -> model row
        BK = self.BK
        nblocks = -(-n // BK)
        self.n_pad = nblocks * BK
        self.nblocks = nblocks
        rj, kk = np.nonzero(nb >= 0)
        ci = nb[rj, kk]
        r_l = pos[rj]
        c_l = pos[ci]
        br, bc = r_l // BK, c_l // BK
        db = bc - br
        absb = np.abs(db)
        halo = int(np.quantile(absb, coverage)) if len(absb) else 1
        halo = int(min(max(halo, 1), max_halo))
        self.halo = halo
        self.nbk = 2 * halo + 1
        if nblocks * self.nbk * BK * BK >= 2 ** 31:
            raise OverflowError("block-banded index space exceeds int32")
        in_band = absb <= halo
        self.blk_flat = (((br[in_band] * self.nbk + (db[in_band] + halo))
                          * BK + (r_l[in_band] % BK)) * BK
                         + (c_l[in_band] % BK)).astype(np.int32)
        self.blk_slot = (rj[in_band] * m + kk[in_band]).astype(np.int32)
        out = ~in_band
        self.out_tgt = r_l[out].astype(np.int32)
        self.out_src = c_l[out].astype(np.int32)
        self.out_slot = (rj[out] * m + kk[out]).astype(np.int32)
        self.outlier_frac = float(out.sum()) / max(len(absb), 1)


def _hilbert_positions_2d(coords, bits=16):
    """Hilbert-curve layout positions for 2-D coordinates (vectorized
    xy2d): pos[model_row] = position along the curve. Much better index
    locality than Morton (no quadrant-boundary jumps)."""
    import numpy as np
    c = np.asarray(coords, np.float64)
    n = c.shape[0]
    span = np.maximum(c.max(axis=0) - c.min(axis=0), 1e-300)
    q = np.floor((c - c.min(axis=0)) / span * ((1 << bits) - 1)).astype(
        np.int64)
    x, y = q[:, 0].copy(), q[:, 1].copy()
    d = np.zeros(n, np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    order = np.argsort(d, kind="stable")
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    return pos


def _morton_positions(coords):
    """Morton (Z-curve) layout positions for up to 3-D coordinates:
    pos[model_row] = position in the space-filling order."""
    import numpy as np
    c = np.asarray(coords, np.float64)
    n, d = c.shape
    if d > 3:
        raise ValueError("morton layout supports up to 3 dimensions")
    span = np.maximum(c.max(axis=0) - c.min(axis=0), 1e-300)
    q = np.floor((c - c.min(axis=0)) / span * ((1 << 16) - 1)).astype(
        np.uint64)
    code = np.zeros(n, np.uint64)
    for bit in range(16):
        for dim in range(d):
            code |= ((q[:, dim] >> np.uint64(bit)) & np.uint64(1)) \
                << np.uint64(bit * d + dim)
    order = np.argsort(code, kind="stable")
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    return pos


def banded_q_mv(a, d_cond, banded: "BandedB"):
    """``(B' D^-1 B) v`` with the block-banded layout ([n] or [n, k] v).

    Returns ``mv(v)`` operating in MODEL order (layout transforms inside).
    Block values are built from ``a`` once here — call per evaluation,
    reuse across CG iterations. Differentiable w.r.t. (a, d_cond)."""
    n, BK = banded.n, banded.BK
    nblocks, nbk, halo = banded.nblocks, banded.nbk, banded.halo
    n_pad = banded.n_pad
    Ablk = jnp.zeros(nblocks * nbk * BK * BK, a.dtype).at[
        banded.blk_flat].set(a.reshape(-1)[banded.blk_slot]).reshape(
            nblocks, nbk, BK, BK)
    out_vals = a.reshape(-1)[banded.out_slot]
    rows_model = banded.rows_model
    pos = banded.pos
    d_l = jnp.concatenate(
        [d_cond[rows_model],
         jnp.ones(n_pad - n, d_cond.dtype)]) if n_pad != n \
        else d_cond[rows_model]
    has_out = len(banded.out_tgt) > 0

    def a_apply(vl):                       # vl [n_pad, k]
        k = vl.shape[1]
        Vb = vl.reshape(nblocks, BK, k)
        Vp = jnp.pad(Vb, ((halo, halo), (0, 0), (0, 0)))
        Vnb = jnp.stack([Vp[o:o + nblocks] for o in range(nbk)], axis=1)
        out = jnp.einsum('boij,bojk->bik', Ablk, Vnb,
                         precision=jax.lax.Precision.HIGHEST)
        out = out.reshape(n_pad, k)
        if has_out:
            out = out.at[banded.out_tgt].add(
                out_vals[:, None] * vl[banded.out_src])
        return out

    def at_apply(u):                       # u [n_pad, k]
        k = u.shape[1]
        Ub = u.reshape(nblocks, BK, k)
        contrib = jnp.einsum('boij,bik->bojk', Ablk, Ub,
                             precision=jax.lax.Precision.HIGHEST)
        outp = jnp.zeros((nblocks + 2 * halo, BK, k), u.dtype)
        for o in range(nbk):
            outp = outp.at[o:o + nblocks].add(contrib[:, o])
        out = outp[halo:halo + nblocks].reshape(n_pad, k)
        if has_out:
            out = out.at[banded.out_src].add(
                out_vals[:, None] * u[banded.out_tgt])
        return out

    def mv(v):
        single = v.ndim == 1
        v2 = v[:, None] if single else v
        vl = v2[rows_model]
        if n_pad != n:
            vl = jnp.pad(vl, ((0, n_pad - n), (0, 0)))
        bv = vl - a_apply(vl)
        u = bv / d_l[:, None]
        btu = u - at_apply(u)
        out = btu[pos]
        return out[:, 0] if single else out

    return mv


def build_incoming(neighbors) -> tuple:
    """Transpose the neighbor structure: for each row i, the (source row j,
    slot k) pairs with ``neighbors[j, k] == i``, padded to the max
    in-degree with -1. Host-side, once per neighbor set.

    TPU rationale: ``apply_Bt``'s scatter-add is near-serialized on the
    VPU (~20 ms per matvec at n=1e5 — it dominated every CG iteration of
    the Laplace mode finder); with the incoming arrays the transpose apply
    becomes pure GATHERS, the same trick as the one-hot-matmul histogram.
    Returns (inc_row [n, K], inc_slot [n, K]) int32.
    """
    import numpy as np
    nb = np.asarray(neighbors)
    n, m = nb.shape
    rows, slots = np.nonzero(nb >= 0)
    targets = nb[rows, slots]
    order = np.argsort(targets, kind="stable")
    targets, rows, slots = targets[order], rows[order], slots[order]
    counts = np.bincount(targets, minlength=n)
    K = max(int(counts.max(initial=0)), 1)
    inc_row = np.full((n, K), -1, np.int32)
    inc_slot = np.zeros((n, K), np.int32)
    # position within each target's group
    pos = np.arange(len(targets)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    inc_row[targets, pos] = rows
    inc_slot[targets, pos] = slots
    # NUMPY outputs on purpose: this may run at trace time (cached on the
    # model), and jnp constants created inside one trace must not leak
    # into another
    return inc_row, inc_slot


def apply_Bt_gather(a: jnp.ndarray, inc_row: jnp.ndarray,
                    inc_slot: jnp.ndarray, v: jnp.ndarray):
    """(B' v) via the pre-transposed incoming structure — gathers only
    (see :func:`build_incoming`)."""
    src = jnp.maximum(inc_row, 0)
    coef = a[src, inc_slot]
    vals = jnp.where(inc_row >= 0, coef * v[src], 0.0)
    return v - jnp.sum(vals, axis=1)


def precision_matvec_gather(a, neighbors, inc_row, inc_slot, d_cond, v):
    """(B' D^-1 B) v with the gather-based transpose apply — the TPU fast
    path for the iterative Laplace / CG machinery (same math as
    :func:`precision_matvec`)."""
    bv = apply_B(a, neighbors, v)
    return apply_Bt_gather(a, inc_row, inc_slot, bv / d_cond)


@jax.jit
def precision_matvec(a, neighbors, d_cond, v):
    """(B' D^-1 B) v — matrix-free Vecchia precision product, O(n m)."""
    bv = apply_B(a, neighbors, v)
    return apply_Bt(a, neighbors, bv / d_cond)


def vecchia_nll(a, d_cond, neighbors, r, row_weight=None, r_nb=None):
    """Gaussian Vecchia NLL for centered residual r.

    nll = 0.5 [ sum log D_i + sum (B r)_i^2 / D_i + n log 2pi ].

    ``row_weight`` (0/1) excludes padding rows — mesh-sharded layouts pad the
    row count to a device multiple and weight the pads out of the reduction.

    ``r_nb`` [n, m]: PRE-GATHERED neighbor residuals (the halo layout, see
    ``build_factors`` nb_coords): the B-apply then reads only row-local
    arrays — no replicated global residual in the compiled program.
    """
    if r_nb is not None:
        br = r - jnp.sum(a * jnp.where(neighbors >= 0, r_nb, 0.0), axis=1)
    else:
        br = apply_B(a, neighbors, r)
    per_row = jnp.log(d_cond) + br * br / d_cond + LOG_2PI
    if row_weight is not None:
        per_row = per_row * row_weight
    return 0.5 * jnp.sum(per_row)


def find_neighbors_cross(coords_pred: jnp.ndarray, coords_obs: jnp.ndarray,
                         num_neighbors: int, chunk: int = 256,
                         codes_pred: Optional[jnp.ndarray] = None,
                         codes_obs: Optional[jnp.ndarray] = None,
                         method: str = "auto") -> jnp.ndarray:
    """Nearest observed points for each prediction point. [n_p, m] int32.

    With ``codes_pred``/``codes_obs``, only same-code observed points are
    eligible (per-``cluster_ids`` independence); missing slots are -1.

    ``method`` as in :func:`find_neighbors`: 'approx' = TPU-optimized
    ``lax.approx_max_k`` (recall 0.99 — wide-row ``top_k`` is ~1000x slower
    on TPU); 'auto' = approx on TPU when the observed table is large."""
    n_p = coords_pred.shape[0]
    n_o = coords_obs.shape[0]
    m = min(num_neighbors, n_o)
    if method == "auto":
        method = ("approx" if jax.default_backend() == "tpu" and n_o > 4096
                  else "exact")
    if method == "approx" and coords_obs.dtype == jnp.float64:
        # see find_neighbors: no f64 approx_max_k lowering on TPU
        coords_obs = coords_obs.astype(jnp.float32)
        coords_pred = coords_pred.astype(jnp.float32)
    n_pad = ((n_p + chunk - 1) // chunk) * chunk
    cp = jnp.pad(coords_pred, ((0, n_pad - n_p), (0, 0)))
    cpc = (None if codes_pred is None
           else jnp.pad(jnp.asarray(codes_pred, jnp.int32), (0, n_pad - n_p),
                        constant_values=-7))
    co = (None if codes_obs is None
          else jnp.asarray(codes_obs, jnp.int32))
    out = _nn_cross_scan(cp, coords_obs, cpc, co, chunk, m, method)
    return out.reshape(n_pad, -1)[:n_p]


@partial(jax.jit, static_argnums=(4, 5, 6))
def _nn_cross_scan(cp, coords_obs, codes_pred_pad, codes_obs,
                   chunk: int, m: int, method: str = "exact"):
    """All cross-neighbor chunks in one dispatch (module-level cached jit)."""
    n_pad = cp.shape[0]
    sq_o = jnp.sum(coords_obs * coords_obs, axis=1)

    def one_chunk(start):
        rows = jax.lax.dynamic_slice(cp, (start, 0), (chunk, cp.shape[1]))
        sq_r = jnp.sum(rows * rows, axis=1)
        cross = jnp.matmul(rows, coords_obs.T,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = sq_r[:, None] + sq_o[None, :] - 2.0 * cross
        if codes_pred_pad is not None:
            row_codes = jax.lax.dynamic_slice(codes_pred_pad, (start,),
                                              (chunk,))
            d2 = jnp.where(codes_obs[None, :] == row_codes[:, None],
                           d2, jnp.inf)
        if method == "approx":
            neg_d, idx = jax.lax.approx_max_k(-d2, m)
        else:
            neg_d, idx = jax.lax.top_k(-d2, m)
        idx = jnp.where(jnp.isfinite(neg_d), idx, -1)
        return idx.astype(jnp.int32)

    starts = jnp.arange(0, n_pad, chunk)
    _, out = jax.lax.scan(lambda _, s: (None, one_chunk(s)), None, starts)
    return out


@partial(jax.jit, static_argnums=(0, 7))
def predict_vecchia_response(cov_fn: CovFunction, cov_pars: jnp.ndarray,
                             nugget, coords_obs, coords_pred, nb_pred,
                             r_obs, predict_response: bool):
    """Batched local kriging: pred point conditions on its observed neighbors
    (``CalcPredVecchiaObservedFirstOrder`` cond_obs_only, Vecchia_utils.cpp:1634).

    Returns (mean, var); var includes the nugget iff predict_response.
    """
    mask = nb_pred >= 0
    idx = jnp.maximum(nb_pred, 0)
    # the training factor build serves prediction too (row_coords = the
    # prediction points): large prediction sets get the transposed layout
    # (no [n_p, m, m] tile-padding HBM tax) exactly like training
    a, d_cond = build_factors(cov_fn, cov_pars, coords_obs, nb_pred, nugget,
                              True, row_coords=coords_pred)
    mean = jnp.sum(jnp.where(mask, a, 0.0) * r_obs[idx], axis=1)
    var = d_cond  # = prior + nugget - c_in' C_nn^-1 c_in (response scale)
    if not predict_response:
        var = var - nugget
    return mean, jnp.maximum(var, 0.0)
