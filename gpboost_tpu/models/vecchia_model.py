"""Vecchia-approximated GP model paths (Gaussian response + Vecchia-Laplace).

Dispatch target of ``GPModel`` for ``gp_approx="vecchia"``. Mirrors the
reference's ``CreateREComponentsVecchia`` (``Vecchia_utils.cpp:1060``) +
Gaussian/Laplace Vecchia branches of ``REModelTemplate``.

Cost structure: factor build O(n m^3) batched Cholesky on the MXU, solves
O(n m); gradients by autodiff through the factor build (replacing
``CalcCovFactorGradientVecchiaLaplace`` and friends).
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction

LOG_2PI = math.log(2.0 * math.pi)

# cg_preconditioner_type resolution (reference names, basic.py:5147-5159):
# each maps to one of the two TPU-native preconditioner families
_PRECOND_DIAG = ("", "default", "vadu", "sigma_inv_plus_btwb", "jacobi",
                 "vecchia_approximation_with_diagonal_update")
_PRECOND_LOW_RANK = ("pivoted_cholesky", "fitc", "nystrom",
                     "predictive_process_plus_diagonal")


def _resolve_precond_name(name) -> str:
    """'diag' (the vadu-analog Jacobi on diag(Q)+W) or 'low_rank' (the
    randomized-Nystrom replacement for pivoted-Cholesky/FITC). Unknown
    names raise — a requested preconditioner is never silently ignored
    (reference validates per regime, basic.py:5416-5447)."""
    s = str(name or "").lower()
    if s in _PRECOND_DIAG:
        return "diag"
    if s in _PRECOND_LOW_RANK:
        return "low_rank"
    raise ValueError(
        f"unsupported cg_preconditioner_type {name!r} for the Vecchia "
        f"approximation; TPU-native options: {_PRECOND_DIAG[2]} (default, "
        f"diagonal of the vadu matrix) or one of {_PRECOND_LOW_RANK} "
        "(randomized-Nystrom low-rank+diagonal)")


@jax.jit
def _precision_diag(a, neighbors, d):
    """diag(B' D^-1 B): 1/d_i + sum_{j: i in nb(j)} a_{j,.}^2 / d_j."""
    n = d.shape[0]
    idx = jnp.maximum(neighbors, 0)
    contrib = jnp.where(neighbors >= 0, a * a / d[:, None], 0.0)
    return (1.0 / d) + jnp.zeros(n, d.dtype).at[idx.reshape(-1)].add(
        contrib.reshape(-1))


def _mode_cg_tols(dtype):
    """(cg tol, max_iter) for the mode-finder solves: f32 CG stalls below
    ~1e-5 relative residual (the 1e-6 target then burns the full iteration
    budget every Newton step — at n=1e5 that single program outran the TPU
    watchdog); f64 keeps the tight tolerance."""
    if dtype == jnp.float32:
        return 1e-5, 400
    return 1e-6, 1000


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _find_mode_cg(lik_name, banded, a, d, neighbors, y, F, aux, row_w):
    """Matrix-free posterior mode: solve Q b = d1(y, F+b) with Newton-CG.
    Implicit differentiation w.r.t. (a, d, F, aux) via one adjoint CG solve.

    ``row_w`` (0/1 per row) masks likelihood terms of padding rows — the
    mesh-sharded layout pads rows to a device multiple; padded rows have no
    neighbors (decoupled in Q) and zero weight, so their mode stays 0 and
    the real-row solution is bit-identical to the unpadded one.

    ``banded``: a ``vops.BandedB`` spatial compute layout (nondiff static;
    hashed by identity — cache it per model) for index-stream-free CG
    matvecs; None keeps the scatter path (mesh layouts)."""
    return _find_mode_cg_impl(lik_name, banded, a, d, neighbors, y, F, aux,
                              row_w)


def _mode_q_mv(a, neighbors, d, banded):
    """Q-matvec for [n] or [n, k] operands: block-banded spatial layout
    when available (``vops.BandedB`` — scatter/gather index streams cost
    ~16 ms per 2M-edge apply on TPU; the block layout runs batched MXU
    matmuls instead), else the scatter path."""
    if banded is None:
        def mv(v):
            if v.ndim == 1:
                return vops.precision_matvec(a, neighbors, d, v)
            return jax.vmap(
                lambda col: vops.precision_matvec(a, neighbors, d, col),
                in_axes=1, out_axes=1)(v)
        return mv
    return vops.banded_q_mv(a, d, banded)


def _find_mode_cg_impl(lik_name, banded, a, d, neighbors, y, F, aux,
                       row_w):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    n = y.shape[0]
    cg_tol, cg_maxit = _mode_cg_tols(d.dtype)

    q_mv = _mode_q_mv(a, neighbors, d, banded)

    def obj(b):
        return (jnp.sum(fam.log_lik(y, F + b, aux) * row_w)
                - 0.5 * jnp.dot(b, q_mv(b)))

    diag_q = _precision_diag(a, neighbors, d)

    def newton(state):
        b, psi, it, conv = state
        loc = F + b
        d1 = fam.d_loc(y, loc, aux) * row_w
        w = jnp.maximum(-fam.d2_loc(y, loc, aux), 1e-10) * row_w
        g = d1 - q_mv(b)
        pre_d = jnp.maximum(diag_q + w, 1e-10)

        def amv(V):  # [n, k]
            return q_mv(V) + w[:, None] * V

        delta, _ = cgops.pcg(amv, g, lambda r: r / pre_d[:, None],
                             tol=cg_tol, max_iter=cg_maxit)

        def psi_at(t):
            return obj(b + t * delta)

        def halve(hs):
            t, _, k = hs
            return (0.5 * t, psi_at(0.5 * t), k + 1)

        def cond_h(hs):
            t, val, k = hs
            return jnp.logical_and(
                jnp.logical_or(val < psi, jnp.isnan(val)), k < 60)

        t, psi_new, _ = jax.lax.while_loop(cond_h, halve,
                                           (1.0, psi_at(1.0), 0))
        b_new = b + t * delta
        conv = jnp.abs(psi_new - psi) < 1e-9 * (jnp.abs(psi) + 1e-10)
        return b_new, psi_new, it + 1, conv

    def cond(state):
        _, _, it, conv = state
        return jnp.logical_and(it < 100, jnp.logical_not(conv))

    b0 = jnp.zeros(n, d.dtype)
    b, _, _, _ = jax.lax.while_loop(cond, newton, (b0, obj(b0), 0, False))
    return b


def _find_mode_cg_fwd(lik_name, banded, a, d, neighbors, y, F, aux, row_w):
    b = _find_mode_cg_impl(lik_name, banded, a, d, neighbors, y, F, aux,
                           row_w)
    return b, (a, d, neighbors, y, F, aux, row_w, b)


def _find_mode_cg_bwd(lik_name, banded, res, v):
    from gpboost_tpu import likelihoods as lk
    from gpboost_tpu.ops import cg as cgops
    fam = lk.get_family(lik_name)
    a, d, neighbors, y, F, aux, row_w, b = res
    loc = F + b
    w = -fam.d2_loc(y, loc, aux) * row_w
    diag_q = _precision_diag(a, neighbors, d)
    pre_d = jnp.maximum(diag_q + w, 1e-10)
    q_mv = _mode_q_mv(a, neighbors, d, banded)
    cg_tol, cg_maxit = _mode_cg_tols(d.dtype)
    adj_tol = cg_tol * (1e-2 if d.dtype != jnp.float32 else 1.0)

    def amv(V):  # [n, k]
        return q_mv(V) + w[:, None] * V

    lam, _ = cgops.pcg(amv, v, lambda r: r / pre_d[:, None],
                       tol=adj_tol, max_iter=cg_maxit)

    def g(a_, d_, F_, aux_):
        d1 = fam.d_loc(y, F_ + b, aux_) * row_w
        mv = _mode_q_mv(a_, neighbors, d_, banded)
        return mv(b) - d1

    _, vjp = jax.vjp(g, a, d, F, aux)
    ga, gd, gF, gaux = vjp(-lam)
    return (ga, gd, None, jnp.zeros_like(y), gF, gaux,
            jnp.zeros_like(row_w))


_find_mode_cg.defvjp(_find_mode_cg_fwd, _find_mode_cg_bwd)


class VecchiaGP:
    """State holder for a Vecchia-approximated GP component.

    Static structure (ordering permutation + neighbor indices) is computed
    once at construction — like the reference, neighbors stay fixed during
    optimization (redetermination for ARD kernels comes later).
    """

    def __init__(self, coords: np.ndarray, cov_fn: CovFunction,
                 num_neighbors: int = 20, ordering: str = "random",
                 seed: int = 0, likelihood: str = "gaussian",
                 num_neighbors_pred: Optional[int] = None,
                 nugget_in_pars: bool = True,
                 rand_coef_data: Optional[np.ndarray] = None,
                 cluster_codes: Optional[np.ndarray] = None,
                 dtype=jnp.float64):
        n = coords.shape[0]
        self.n = n
        self.cov_fn = cov_fn
        self.likelihood = likelihood
        self.num_neighbors = min(num_neighbors, n - 1)
        # prediction-side count is NOT capped at n-1: cond-all conditioning
        # sets include previously-ordered prediction points (the ops clamp
        # to the actually-available candidates)
        # reference default: num_neighbors_pred = 2 * num_neighbors
        # (re_model_template.h:299; NOT capped at n — search pads short
        # candidate sets with -1, and cond_all conditioning sets may
        # exceed n)
        self.num_neighbors_pred = num_neighbors_pred or 2 * num_neighbors
        self.nugget_in_pars = nugget_in_pars
        if ordering in ("time", "time_random_space"):
            # reference errors when the kernel is not space-time
            # (Vecchia_utils.cpp:1133-1135); time = coordinate 0
            if not (cov_fn.cov_fct_type in ("matern_space_time",
                                            "exponential_space_time",
                                            "space_time_gneiting")):
                raise ValueError(
                    f"'vecchia_ordering' is '{ordering}' but the "
                    "'cov_function' is not a space-time covariance function")
            time_col = np.asarray(coords)[:, 0]
        else:
            time_col = None
        self.perm = vops.apply_ordering(n, ordering, seed, time_col)
        self.inv_perm = np.argsort(self.perm)
        self.coords = jnp.asarray(coords, dtype=dtype)
        self.coords_perm = jnp.asarray(coords[self.perm], dtype=dtype)
        # independent GP realizations per cluster_id: neighbor eligibility is
        # restricted to same-cluster points (the per-cluster std::map blocks
        # of the reference become a masked search + -1 padding)
        self.codes = (None if cluster_codes is None
                      else jnp.asarray(np.asarray(cluster_codes, np.int32)))
        self.codes_perm = (None if self.codes is None
                           else jnp.asarray(
                               np.asarray(cluster_codes,
                                          np.int32)[self.perm]))
        self.neighbors = vops.find_neighbors(self.coords_perm,
                                             self.num_neighbors,
                                             codes=self.codes_perm)
        self.dtype = dtype
        self.mesh = None
        self._shard_nb = None
        self._shard_nb_coords = None
        self._halo = False
        self._halo_vg = None
        # GP random coefficients (SVC): z[:, 0] = 1 is the base GP, further
        # columns multiply coefficient GPs with their own [var, range] pars
        self.z = None
        self.z_orig = None
        if rand_coef_data is not None:
            zr = np.asarray(rand_coef_data, np.float64).reshape(n, -1)
            if not cov_fn.is_isotropic:
                raise NotImplementedError(
                    "GP random coefficients under Vecchia require an "
                    "isotropic covariance function")
            zfull = np.concatenate([np.ones((n, 1)), zr], axis=1)
            self.z_orig = jnp.asarray(zfull, dtype=dtype)
            self.z = jnp.asarray(zfull[self.perm], dtype=dtype)
        self._ard_neighbors_pars = None
        # persistent jitted value+grad kernels (reused across fit() calls,
        # e.g. per-boosting-iteration refits); neighbors are a traced
        # argument so ARD redetermination does not stale the jit cache
        self._vg_gaussian_jit = jax.jit(
            lambda th, y, fp, nb: jax.value_and_grad(
                lambda t: self.nll_gaussian(jnp.exp(t), y, fp, nb))(th))
        # fused Pallas factor kernel (TPU, f32, supported isotropic family,
        # single component): serves value-only NLL evaluations
        self._pallas_shape = self._pallas_shape_code()
        self._nll_pallas_jit = None
        self._vg_pallas_jit = None
        if self._pallas_shape is not None:
            from gpboost_tpu.ops.kernels.vecchia_factors import (
                vecchia_factors_pallas, vecchia_nll_grad_pallas)
            shape_code, is_ard = self._pallas_shape
            perm = jnp.asarray(self.perm)

            def _nll_pallas(cp, r, nb):
                a, d_c = vecchia_factors_pallas(cp[1:], self.coords_perm, nb,
                                                cp[0], True, shape_code,
                                                ard=is_ard)
                return vops.vecchia_nll(a, d_c, nb, r[perm])

            self._nll_pallas_jit = jax.jit(_nll_pallas)

            def _vg_pallas(th, r, nb):
                return vecchia_nll_grad_pallas(
                    jnp.asarray(th, jnp.float32), self.coords_perm, nb,
                    jnp.asarray(r, jnp.float32)[perm], shape_code,
                    ard=is_ard)

            self._vg_pallas_jit = jax.jit(_vg_pallas)

            inv_perm = jnp.asarray(self.inv_perm)

            def _fit_psi_inv(th, r, nb):
                # GPBoost pseudo-gradient solve Psi^-1 r at the FINAL fit
                # parameters, fused into the whole-fit-on-device dispatch
                # (optimizers.lbfgs_device final_fn): the boosting
                # objective's gradient then costs no extra tunnel round
                # trip (regression_objective.hpp:153-171 role)
                cp = jnp.exp(jnp.asarray(th, jnp.float32))
                a, d_c = vecchia_factors_pallas(cp[1:], self.coords_perm,
                                                nb, cp[0], True, shape_code,
                                                ard=is_ard)
                out = vops.precision_matvec(
                    a, nb, d_c, jnp.asarray(r, jnp.float32)[perm])
                return out[inv_perm]

            self._fit_psi_inv = _fit_psi_inv

        from gpboost_tpu import parallel as par
        if par.active_mesh() is not None:
            self.shard_over(par.active_mesh())

    def _banded(self, nb):
        """Cached banded spatial compute layout (``vops.BandedB``) for
        index-stream-free mode-finder matvecs; keyed by the neighbor
        array's identity so ARD redetermination invalidates it. None when
        the layout doesn't apply (dims > 3)."""
        import os
        if os.environ.get("GPBOOST_TPU_NO_BANDED", "") == "1":
            return None
        cached = getattr(self, "_banded_cache", None)
        # hold the neighbor array itself (identity via `is`, not id()):
        # a replaced array can recycle the freed object's id, and a stale
        # layout silently mis-routes matvec values
        if cached is not None and cached[0] is nb:
            return cached[1]
        try:
            banded = vops.BandedB(np.asarray(nb),
                                  np.asarray(self.coords_perm))
        except (ValueError, OverflowError):
            banded = None
        self._banded_cache = (nb, banded)
        return banded

    def _halo_auto(self, halo: Optional[bool]) -> bool:
        """Decide the mesh layout: replicated gather tables (default) vs the
        no-replication halo. Auto rule: replicating coords + y costs
        n*(d+1)*8 B per chip; past ``GPBOOST_TPU_MESH_REPL_LIMIT_MB``
        (default 2048) the halo layout drops the replicated tables from the
        fit program (O(n/D) per chip). ``GPBOOST_TPU_MESH_HALO=1/0``
        forces either layout."""
        env = os.environ.get("GPBOOST_TPU_MESH_HALO")
        if env is not None:
            return env == "1"
        if halo is not None:
            return bool(halo)
        limit_mb = float(os.environ.get("GPBOOST_TPU_MESH_REPL_LIMIT_MB",
                                        2048))
        d = int(self.coords_perm.shape[1])
        return self.n * (d + 1) * 8 > limit_mb * 1e6

    def shard_over(self, mesh, axis: Optional[str] = None,
                   halo: Optional[bool] = None):
        """Shard the Gaussian-fit row structure over a device mesh.

        A padded copy of (neighbors, row coords, ordering permutation) with
        the row count rounded up to a device multiple is placed row-sharded;
        coordinate tables replicate (neighbor gathers need the global table —
        at the typical m=20 replication beats a ragged halo exchange). Every
        jitted NLL/gradient program consuming the sharded arrays compiles as
        SPMD: XLA partitions the batched factor build over rows and inserts
        the psum for the log-det/quadratic-form reductions (the collectives
        the reference drives by hand via ``Network::Allreduce``). Padding
        rows have no neighbors and weight 0, so they contribute nothing.
        The padded layout also serves the Laplace (non-Gaussian) fit via
        ``nll_laplace_iterative`` (matrix-free Newton-CG mode finder +
        stochastic logdet, all SPMD) and the simulation-based Laplace
        prediction; Gaussian predictions run row-sharded over prediction
        points (``_predict_kriging_mesh``). Only the SVC (random-coefficient)
        builds keep the unpadded replicated structure.
        """
        from gpboost_tpu import parallel as par
        self.mesh = mesh
        self._mesh_axis = axis
        self._halo = (self._halo_auto(halo) if self.z is None
                      and self.codes is None else False)
        self.coords = par.replicate(self.coords, mesh)
        self.coords_perm = par.replicate(self.coords_perm, mesh)
        if self.codes is not None:
            self.codes = par.replicate(self.codes, mesh)
            self.codes_perm = par.replicate(self.codes_perm, mesh)
        if self.z is not None:
            # SVC builds index the covariate rows jointly with the factor
            # rows; they run replicated under the mesh for now
            self.z = par.replicate(self.z, mesh)
            self.z_orig = par.replicate(self.z_orig, mesh)
            return self
        self._build_shard_arrays(mesh, axis)
        if self._halo:
            self._build_halo_vg()
        elif self._pallas_shape is not None:
            self._build_pallas_mesh_jit()
        return self

    def _build_halo_vg(self):
        """Jitted pair for the PRODUCT-path halo fit (VERDICT r4 #2):

        - ``_halo_prep(r)``: one residual-halo gather — the only program
          that reads a replicated [n] vector; outputs are row-sharded
          (r_row [n'], r_nb [n', m]).
        - ``_halo_vg(th, r_row, r_nb)``: the per-evaluation value+grad —
          consumes ONLY row-sharded arrays (neighbors, row coords, neighbor
          coords, residual halos). No replicated [n, d] coordinate table or
          [n] residual appears in this compiled program; XLA partitions the
          factor build over rows and inserts the psum for the reductions.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        nb = self._shard_nb
        row_coords = self._shard_row_coords
        nbc = self._shard_nb_coords
        w = self._shard_w
        perm_pad = self._perm_pad
        cov_fn = self.cov_fn
        nugget_in = self.nugget_in_pars
        ax = self._mesh_axis or "data"
        row_sh = NamedSharding(self.mesh, P(ax))
        halo_sh = NamedSharding(self.mesh, P(ax, None))

        @partial(jax.jit, out_shardings=(row_sh, halo_sh))
        def prep(r):
            rp = jnp.asarray(r, self.dtype)[perm_pad]
            return rp * w, jnp.where(nb >= 0, rp[jnp.maximum(nb, 0)], 0.0)

        def _nll(t, r_row, r_nb):
            cp = jnp.exp(t)
            a, d = vops.build_factors(
                cov_fn, cp[1:] if nugget_in else cp, None, nb,
                cp[0] if nugget_in else None, nugget_in,
                row_coords=row_coords, nb_coords=nbc)
            return vops.vecchia_nll(a, d, nb, r_row, row_weight=w,
                                    r_nb=r_nb)

        self._halo_prep = prep
        self._halo_vg = jax.jit(jax.value_and_grad(_nll))

    def _build_pallas_mesh_jit(self):
        """shard_map wrapper around the fused Pallas NLL+grad kernel: each
        device runs the kernel on its row shard (local rows' neighbors /
        coords / residual against the replicated gather tables) and the
        scalar outputs psum over ICI — multi-chip keeps the single-chip
        kernel throughput instead of regressing to the XLA path."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from gpboost_tpu.ops.kernels.vecchia_factors import (
            vecchia_nll_grad_pallas)
        shape_code, is_ard = self._pallas_shape
        mesh = self.mesh
        ax = self._mesh_axis or "data"
        const = 0.5 * self.n * math.log(2.0 * math.pi)

        def local(th, coords, r_perm, nb_loc, row_coords_loc, rrow_loc,
                  rv_loc):
            nll, g = vecchia_nll_grad_pallas(
                th, coords, nb_loc, r_perm, shape_code, ard=is_ard,
                row_r=rrow_loc, row_valid=rv_loc,
                row_coords=row_coords_loc, include_const=False)
            return jax.lax.psum(nll, ax), jax.lax.psum(g, ax)

        smapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(ax, None), P(ax, None), P(ax), P(ax)),
            out_specs=(P(), P()),
            check_vma=False)  # pallas_call out_shape carries no vma

        def vg(th, r, nb_sh, row_coords_sh, rv_sh, perm_pad):
            r32 = jnp.asarray(r, jnp.float32)
            r_perm = r32[jnp.asarray(self.perm)]
            rrow_pad = r32[perm_pad]
            nll, g = smapped(jnp.asarray(th, jnp.float32),
                             self.coords_perm.astype(jnp.float32),
                             r_perm, nb_sh,
                             row_coords_sh.astype(jnp.float32),
                             rrow_pad, rv_sh.astype(jnp.float32))
            return nll + const, g

        self._vg_pallas_mesh_jit = jax.jit(vg)

    def _build_shard_arrays(self, mesh, axis: Optional[str] = None):
        from gpboost_tpu import parallel as par
        ndev = int(np.prod(mesh.devices.shape))
        pad = (-self.n) % ndev
        nb = np.asarray(self.neighbors)
        cp = np.asarray(self.coords_perm)
        perm = np.asarray(self.perm)
        if pad:
            nb = np.concatenate(
                [nb, np.full((pad, nb.shape[1]), -1, nb.dtype)])
            cp = np.concatenate([cp, np.repeat(cp[:1], pad, axis=0)])
            perm = np.concatenate([perm, np.zeros(pad, perm.dtype)])
        w = np.concatenate([np.ones(self.n), np.zeros(pad)])
        self._shard_nb = par.shard_rows(jnp.asarray(nb), mesh, axis)
        self._shard_row_coords = par.shard_rows(
            jnp.asarray(cp, self.dtype), mesh, axis)
        self._shard_w = par.shard_rows(jnp.asarray(w, self.dtype), mesh,
                                       axis)
        self._perm_pad = par.replicate(jnp.asarray(perm), mesh)
        if getattr(self, "_halo", False):
            # no-replication layout: pre-gather each row's neighbor
            # coordinates ONCE into a row-sharded [n', m, d] halo, so the
            # fit program never touches a replicated [n, d] table
            # (parallel/mesh.py module docstring, "past the envelope")
            nbc = cp[np.maximum(nb, 0)]
            self._shard_nb_coords = par.shard_rows(
                jnp.asarray(nbc, self.dtype), mesh, axis)
        else:
            self._shard_nb_coords = None

    def _pallas_shape_code(self):
        """(matern-shape code, is_ard) for the fused factor kernel, or None
        if the model/kernel combination is not eligible."""
        cf = self.cov_fn
        if self.z is not None or self.dtype != jnp.float32 \
                or not self.nugget_in_pars:
            return None
        if cf.cov_fct_type == "exponential":
            return (0.5, False)
        if cf.cov_fct_type in ("matern", "matern_ard"):
            for s in (0.5, 1.5, 2.5):
                if abs(cf.shape - s) < 1e-10:
                    return (s, cf.cov_fct_type == "matern_ard")
        if cf.cov_fct_type == "gaussian":
            return (-1.0, False)
        if cf.cov_fct_type == "gaussian_ard":
            return (-1.0, True)
        return None

    def _vg_gaussian(self, th, y, fp):
        if (self._vg_pallas_jit is not None
                and jax.default_backend() == "tpu"
                and self.mesh is None):
            # fused Pallas NLL+grad: reverse-mode AD traced inside the
            # kernel body (1.39 ms vs 5.3 ms for the XLA joint graph at
            # n=1e5, m=20)
            r = y if fp is None else y - fp
            return self._vg_pallas_jit(th, r, self.neighbors)
        if getattr(self, "_halo_vg", None) is not None and self.mesh is not None:
            # PRODUCT halo path: the evaluation program reads only
            # row-sharded arrays; the residual halo gather runs as a
            # separate small program per evaluation
            r = y if fp is None else y - fp
            r_row, r_nb = self._halo_prep(r)
            return self._halo_vg(th, r_row, r_nb)
        if (getattr(self, "_vg_pallas_mesh_jit", None) is not None
                and jax.default_backend() == "tpu"):
            # shard_map'd kernel: per-chip Pallas throughput + psum
            r = y if fp is None else y - fp
            return self._vg_pallas_mesh_jit(
                th, r, self._shard_nb, self._shard_row_coords,
                self._shard_w, self._perm_pad)
        nb = self._shard_nb if self._shard_nb is not None else self.neighbors
        return self._vg_gaussian_jit(th, y, fp, nb)

    def nll_gaussian_value(self, cov_pars, y, fixed_part=None):
        """NLL value without gradients, fastest available path.

        1. Fused Pallas factor kernel when eligible (TPU backend, f32,
           exponential/matern/gaussian, single component): distance ->
           covariance -> Cholesky -> solves per 1024-point block in VMEM
           (1.16 ms at n=1e5, m=20 vs 4.9/10.7 ms for the XLA graphs).
        2. Otherwise the joint value+grad kernel with the gradient
           discarded — counter-intuitive but measured on TPU: the
           forward-only graph compiles to 4.9 GFLOP / 329M transcendentals
           (10.7 ms) because XLA rematerializes the covariance exp() into
           every consumer of the Cholesky sweep, while the joint graph
           keeps those entries alive as VJP residuals (1.4 GFLOP / 105M
           transcendentals, 4.9 ms)."""
        if (self._nll_pallas_jit is not None
                and jax.default_backend() == "tpu"
                and self.mesh is None):
            r = y if fixed_part is None else y - fixed_part
            return self._nll_pallas_jit(
                jnp.asarray(cov_pars, jnp.float32),
                jnp.asarray(r, jnp.float32), self.neighbors)
        # under a mesh _vg_gaussian routes to the shard_map'd Pallas kernel
        # on TPU (value+grad; the discarded grad costs ~2x, still far below
        # the XLA forward-only graph's rematerialization tax)
        v, _ = self._vg_gaussian(
            jnp.log(jnp.maximum(jnp.asarray(cov_pars, self.dtype), 1e-300)),
            y, fixed_part)
        return v

    def ensure_neighbors(self, cov_pars_full: np.ndarray):
        """Redetermine neighbors in the SCALED coordinate space for
        ARD/space-time kernels (``RedetermineNearestNeighborsVecchia...``,
        ``re_model_template.h:4630-4656``: neighbor search happens in the
        transformed space where the kernel is isotropic, re-run when the
        range parameters change). No-op for isotropic kernels."""
        if self.cov_fn.is_isotropic or not self.cov_fn.has_coord_scaling:
            return
        pars = np.asarray(cov_pars_full, dtype=np.float64)
        gp_pars = pars[1:] if self.nugget_in_pars else pars
        if (self._ard_neighbors_pars is not None
                and np.allclose(gp_pars, self._ard_neighbors_pars)):
            return
        scaled = self.cov_fn.scale_coords(
            self.coords_perm, jnp.asarray(gp_pars, self.dtype))
        self.neighbors = vops.find_neighbors(scaled, self.num_neighbors,
                                             codes=self.codes_perm)
        if self.mesh is not None and self._shard_nb is not None:
            self._build_shard_arrays(self.mesh, self._mesh_axis)
            if self._halo:
                self._build_halo_vg()  # closures hold the old shard arrays
        self._ard_neighbors_pars = gp_pars

    def _pred_neighbors(self, gp_pars, coords_pred, codes_pred=None):
        """Observed neighbors of prediction points; ARD kernels search in
        the scaled coordinate space."""
        cp = jnp.asarray(coords_pred, self.dtype)
        if not self.cov_fn.is_isotropic and self.cov_fn.has_coord_scaling:
            g = jnp.asarray(gp_pars, self.dtype)
            return vops.find_neighbors_cross(
                self.cov_fn.scale_coords(cp, g),
                self.cov_fn.scale_coords(self.coords, g),
                self.num_neighbors_pred,
                codes_pred=codes_pred, codes_obs=self.codes)
        return vops.find_neighbors_cross(cp, self.coords,
                                         self.num_neighbors_pred,
                                         codes_pred=codes_pred,
                                         codes_obs=self.codes)

    # ---- Gaussian response-scale Vecchia ------------------------------
    def _pars_stack(self, gp_pars):
        """[C, p] per-component parameter stack for the SVC build."""
        return jnp.reshape(gp_pars, (self.z.shape[1], self.cov_fn.num_cov_par))

    def _response_factors(self, cov_pars, nb):
        """(A, D) of the response covariance; cov_pars = [nugget, comps...]."""
        if self.z is not None:
            return vops.build_factors_svc(
                self.cov_fn, self._pars_stack(cov_pars[1:]), self.coords_perm,
                nb, self.z, cov_pars[0], True)
        return vops.build_factors(self.cov_fn, cov_pars[1:], self.coords_perm,
                                  nb, cov_pars[0], True)

    def nll_gaussian(self, cov_pars: jnp.ndarray, y: jnp.ndarray,
                     fixed_part: Optional[jnp.ndarray] = None,
                     neighbors=None) -> jnp.ndarray:
        """cov_pars = [nugget, var, range, ...]; Vecchia on Sigma + nugget I."""
        nb = self.neighbors if neighbors is None else neighbors
        r = y if fixed_part is None else y - fixed_part
        if nb.shape[0] != self.n:
            # padded mesh-sharded layout: rows rounded up to a device
            # multiple, padding rows weighted out of the reduction
            r = r[self._perm_pad]
            a, d = vops.build_factors(
                self.cov_fn, cov_pars[1:], self.coords_perm, nb, cov_pars[0],
                True, row_coords=self._shard_row_coords)
            return vops.vecchia_nll(a, d, nb, r, row_weight=self._shard_w)
        r = r[self.perm]
        a, d = self._response_factors(cov_pars, nb)
        return vops.vecchia_nll(a, d, nb, r)

    def psi_inv_resid(self, cov_pars, r):
        """Psi^-1 r via the response-scale Vecchia precision (matrix-free,
        original row order; r [n] or [n, k]) — the GPBoost pseudo-gradient
        and Newton-leaf solves (``regression_objective.hpp:153-171``)."""
        if self._shard_nb is not None:
            # sharded padded layout: padding rows have no neighbors, so they
            # never contaminate real rows; inv_perm gathers only real rows
            nb = self._shard_nb
            a, d = vops.build_factors(
                self.cov_fn, cov_pars[1:], self.coords_perm, nb, cov_pars[0],
                True, row_coords=self._shard_row_coords)
            rp = r[self._perm_pad]
        else:
            nb = self.neighbors
            a, d = self._response_factors(cov_pars, nb)
            rp = r[self.perm]
        if r.ndim == 1:
            out = vops.precision_matvec(a, nb, d, rp)
        else:
            out = jax.vmap(
                lambda col: vops.precision_matvec(a, nb, d, col),
                in_axes=1, out_axes=1)(rp)
        return out[self.inv_perm]

    def wls_coef(self, cov_pars, y, X, fixed_effects=None):
        """GLS coefficients with the Vecchia precision: solve
        (X'B'D^-1BX) beta = X'B'D^-1B y — all matrix-free O(n m p)."""
        yv = y if fixed_effects is None else y - fixed_effects
        if self._shard_nb is not None:
            nb = self._shard_nb
            a, d = vops.build_factors(
                self.cov_fn, cov_pars[1:], self.coords_perm, nb, cov_pars[0],
                True, row_coords=self._shard_row_coords)
            yp = yv[self._perm_pad]
            Xp = X[self._perm_pad]
            w = self._shard_w
        else:
            nb = self.neighbors
            a, d = self._response_factors(cov_pars, nb)
            yp = yv[self.perm]
            Xp = X[self.perm]
            w = None
        BX = jax.vmap(lambda col: vops.apply_B(a, nb, col),
                      in_axes=1, out_axes=1)(Xp)
        By = vops.apply_B(a, nb, yp)
        Xw = BX / d[:, None]
        if w is not None:
            Xw = Xw * w[:, None]  # padding rows drop out of the normal eqs
        A = BX.T @ Xw
        b = Xw.T @ By
        return jnp.linalg.solve(A, b)

    def predict_gaussian_cond_all(self, cov_pars, y, coords_pred,
                                  fixed_part=None, predict_response=True,
                                  codes_pred=None, z_pred=None):
        """``order_obs_first_cond_all`` prediction: returns (mean, cov)
        with the full [n_p, n_p] predictive covariance. Supports GP random
        coefficients via ``z_pred``."""
        r = y if fixed_part is None else y - fixed_part
        cp = jnp.asarray(coords_pred, self.dtype)
        if self.z is not None:
            zp = self._zp_full(z_pred, cp.shape[0])
            return vops.predict_vecchia_cond_all_svc(
                self.cov_fn, self._pars_stack(cov_pars[1:]), cov_pars[0],
                self.coords, cp, self.z_orig, zp, r,
                self.num_neighbors_pred,
                predict_response=bool(predict_response))
        cdp = (None if codes_pred is None
               else jnp.asarray(np.asarray(codes_pred, np.int32)))
        return vops.predict_vecchia_cond_all(
            self.cov_fn, cov_pars[1:], cov_pars[0], self.coords, cp, r,
            self.num_neighbors_pred, codes_obs=self.codes, codes_pred=cdp,
            predict_response=bool(predict_response))

    def predict_gaussian_pred_first(self, cov_pars, y, coords_pred,
                                    fixed_part=None, predict_response=True):
        """``order_pred_first``: joint Vecchia with prediction points ordered
        first (``CalcPredVecchiaPredictedFirstOrder``). Returns (mean, cov)."""
        if self.z is not None:
            raise NotImplementedError(
                "vecchia_pred_type='order_pred_first' is not implemented "
                "with GP random coefficients")
        if self.codes is not None:
            raise NotImplementedError(
                "vecchia_pred_type='order_pred_first' is not implemented "
                "with cluster_ids")
        r = y if fixed_part is None else y - fixed_part
        return vops.predict_vecchia_pred_first(
            self.cov_fn, cov_pars[1:], cov_pars[0], self.coords,
            jnp.asarray(coords_pred, self.dtype), r, self.num_neighbors_pred,
            predict_response=bool(predict_response))

    def predict_gaussian_latent_vecchia(self, cov_pars, y, coords_pred,
                                        fixed_part=None,
                                        cond_obs_only=True,
                                        predict_response=True):
        """``latent_order_obs_first_cond_obs_only`` / ``..._cond_all``:
        Vecchia on the latent process over unique coordinates
        (``CalcPredVecchiaLatentObservedFirstOrder``). Returns
        (mean, var, cov)."""
        if self.z is not None:
            raise NotImplementedError(
                "The Vecchia approximation for latent process(es) is "
                "currently not implemented when having random coefficients")
        if self.codes is not None:
            raise NotImplementedError(
                "latent Vecchia prediction types are not implemented "
                "with cluster_ids")
        r = y if fixed_part is None else y - fixed_part
        return vops.predict_vecchia_latent(
            self.cov_fn, cov_pars[1:], cov_pars[0], self.coords,
            jnp.asarray(coords_pred, self.dtype), r, self.num_neighbors_pred,
            bool(cond_obs_only), predict_response=bool(predict_response))

    def _predict_kriging_mesh(self, gp_pars, nugget, r_orig, coords_pred,
                              predict_response: bool):
        """Row-sharded local-kriging prediction over the mesh.

        Prediction is embarrassingly row-parallel: pad the prediction points
        to a device multiple, shard their rows, and let each device run the
        neighbor search + factor build + kriging gather against the
        replicated observed tables (``PredictVecchia``
        ``Vecchia_utils.cpp:1634-2241`` parallelized over prediction points).
        Per-row results are independent, so the sharded output equals the
        single-device one exactly. Returns (mean [n_p], var [n_p]).
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from gpboost_tpu import parallel as par
        mesh = self.mesh
        ax = self._mesh_axis or par.data_axis()
        ndev = int(np.prod(mesh.devices.shape))
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        pad = (-n_p) % ndev
        cp_pad = (jnp.concatenate([cp, jnp.repeat(cp[:1], pad, axis=0)])
                  if pad else cp)
        coords_obs = self.coords
        scaled_search = (not self.cov_fn.is_isotropic
                         and self.cov_fn.has_coord_scaling)
        m = self.num_neighbors_pred
        cov_fn = self.cov_fn

        def local(cp_loc, coords_o, r_o, gp, ng):
            if scaled_search:
                nb_pred = vops.find_neighbors_cross(
                    cov_fn.scale_coords(cp_loc, gp),
                    cov_fn.scale_coords(coords_o, gp), m)
            else:
                nb_pred = vops.find_neighbors_cross(cp_loc, coords_o, m)
            return vops.predict_vecchia_response(
                cov_fn, gp, ng, coords_o, cp_loc, nb_pred, r_o,
                predict_response)

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(ax, None), P(), P(), P(), P()),
            out_specs=(P(ax), P(ax))))
        mean, var = fn(par.shard_rows(cp_pad, mesh, ax), coords_obs,
                       jnp.asarray(r_orig, self.dtype),
                       jnp.asarray(gp_pars, self.dtype),
                       jnp.asarray(nugget, self.dtype))
        return mean[:n_p], var[:n_p]

    def predict_gaussian(self, cov_pars, y, coords_pred,
                         fixed_part=None, predict_response=True,
                         predict_var=False, z_pred=None, codes_pred=None):
        """Local-kriging prediction conditioning on observed neighbors."""
        r = y if fixed_part is None else y - fixed_part
        if (self.mesh is not None and self.z is None and self.codes is None
                and codes_pred is None):
            mean, var = self._predict_kriging_mesh(
                cov_pars[1:], cov_pars[0], r, coords_pred,
                bool(predict_response))
            return mean, (var if predict_var else None)
        nb_pred = self._pred_neighbors(cov_pars[1:], coords_pred,
                                       codes_pred=codes_pred)
        if self.z is not None:
            n_p = np.asarray(coords_pred).shape[0]
            if z_pred is None:
                zp = jnp.concatenate(
                    [jnp.ones((n_p, 1), self.dtype),
                     jnp.zeros((n_p, self.z.shape[1] - 1), self.dtype)], 1)
            else:
                zp = jnp.concatenate(
                    [jnp.ones((n_p, 1), self.dtype),
                     jnp.asarray(np.asarray(z_pred, np.float64).reshape(
                         n_p, -1), self.dtype)], 1)
            mean, var = vops.predict_vecchia_response_svc(
                self.cov_fn, self._pars_stack(cov_pars[1:]), cov_pars[0],
                self.coords, jnp.asarray(coords_pred, self.dtype), nb_pred,
                self.z_orig, zp, r, bool(predict_response))
            return mean, (var if predict_var else None)
        if (self._pallas_shape is not None
                and jax.default_backend() == "tpu" and self.mesh is None):
            # fused Pallas factor kernel serves the PREDICTION build too
            # (row_coords = the prediction points)
            shape_code, is_ard = self._pallas_shape
            from gpboost_tpu.ops.kernels.vecchia_factors import (
                vecchia_factors_pallas)
            cp32 = jnp.asarray(cov_pars, jnp.float32)
            a, d = vecchia_factors_pallas(
                cp32[1:], self.coords, nb_pred, cp32[0], True, shape_code,
                ard=is_ard,
                row_coords=jnp.asarray(coords_pred, jnp.float32))
            mask = nb_pred >= 0
            idx = jnp.maximum(nb_pred, 0)
            mean = jnp.sum(jnp.where(mask, a, 0.0)
                           * jnp.asarray(r, jnp.float32)[idx], axis=1)
            var = d if predict_response else d - cp32[0]
            return mean, (jnp.maximum(var, 0.0) if predict_var else None)
        mean, var = vops.predict_vecchia_response(
            self.cov_fn, cov_pars[1:], cov_pars[0], self.coords,
            jnp.asarray(coords_pred, self.dtype), nb_pred, r,
            bool(predict_response))
        return mean, (var if predict_var else None)

    # ---- Vecchia-Laplace (non-Gaussian) -------------------------------
    def _latent_factors(self, cov_pars):
        """Latent-process factors (no nugget): Sigma^-1 ~ B' D^-1 B."""
        if self.z is not None:
            return vops.build_factors_svc(
                self.cov_fn,
                jnp.reshape(cov_pars,
                            (self.z.shape[1], self.cov_fn.num_cov_par)),
                self.coords_perm, self.neighbors, self.z, None, False)
        return vops.build_factors(self.cov_fn, cov_pars, self.coords_perm,
                                  self.neighbors, None, False)

    def _cross_cov(self, gp_pars, coords1, coords2):
        """Cross-covariance handling isotropic and coordinate-scaled kernels."""
        if self.cov_fn.is_isotropic:
            d = jnp.sqrt(jnp.maximum(jnp.sum(
                (coords1[:, None, :] - coords2[None, :, :]) ** 2, -1), 0.0))
            return self.cov_fn.cov_matrix(gp_pars, dist=d)
        return self.cov_fn.cov_matrix(gp_pars, coords1=coords1,
                                      coords2=coords2)

    def _split_het(self, cov_pars):
        """Split a two-set parameter vector (``gaussian_heteroscedastic``:
        cov_pars = [set-0 pars..., set-1 pars...], reference num_sets_re_=2)."""
        k = self.cov_fn.num_cov_par
        return cov_pars[:k], cov_pars[k:]

    def _het_fixed_parts(self, fixed_part):
        """Stacked [2n] fixed effects -> per-set permuted (F1, F2)."""
        if fixed_part is None:
            z = jnp.zeros(self.n, self.dtype)
            return z, z
        return fixed_part[:self.n][self.perm], fixed_part[self.n:][self.perm]

    def nll_het(self, cov_pars, y, fixed_part=None):
        """Fisher-Laplace NLL for ``gaussian_heteroscedastic`` (two latent
        sets with independent Vecchia-approximated priors)."""
        from gpboost_tpu.models import heteroscedastic as het
        p1, p2 = self._split_het(cov_pars)
        Q1, d1 = self._dense_precision(p1)
        Q2, d2 = self._dense_precision(p2)
        yp = y[self.perm]
        F1, F2 = self._het_fixed_parts(fixed_part)
        return het.nll(Q1, Q2, -jnp.sum(jnp.log(d1)), -jnp.sum(jnp.log(d2)),
                       yp, F1, F2)

    def predict_het(self, cov_pars, y, coords_pred, fixed_part=None,
                    fixed_part_pred=None, predict_response=True,
                    predict_var=False):
        """Prediction for ``gaussian_heteroscedastic``.

        Latent outputs are the set-0 (mean) GP; response variance adds the
        expected noise variance E[exp(loc2)] = exp(mu2 + var2/2)
        (reference ``likelihoods.h:7660-7667``).
        """
        from gpboost_tpu.models import heteroscedastic as het
        p1, p2 = self._split_het(cov_pars)
        Q1, _ = self._dense_precision(p1)
        Q2, _ = self._dense_precision(p2)
        yp = y[self.perm]
        F1, F2 = self._het_fixed_parts(fixed_part)
        (b1, w1), (b2, w2) = het.posterior_sets(Q1, Q2, yp, F1, F2)
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        F1p = (jnp.zeros(n_p, self.dtype) if fixed_part_pred is None
               else fixed_part_pred[:n_p])
        F2p = (jnp.zeros(n_p, self.dtype) if fixed_part_pred is None
               else fixed_part_pred[n_p:])
        mu1, var1 = self._posterior_set_pred(p1, Q1, b1, w1, cp)
        mu2, var2 = self._posterior_set_pred(p2, Q2, b2, w2, cp)
        mu1 = mu1 + F1p
        mu2 = mu2 + F2p
        if predict_response:
            var_resp = var1 + jnp.exp(mu2 + 0.5 * var2)
            return mu1, (var_resp if predict_var else None)
        return mu1, (var1 if predict_var else None)

    def _posterior_set_pred(self, cov_pars_k, Q, b_perm, w_perm, coords_pred):
        """Posterior latent mean/var of one set at prediction points:
        mean = local kriging on the mode; var = prior - c_po (Sigma+W^-1)^-1
        c_op with (Sigma+W^-1)^-1 = W (Q+W)^-1 Q."""
        b_orig = b_perm[self.inv_perm]
        nb_pred = self._pred_neighbors(cov_pars_k, coords_pred)
        mean, _ = vops.predict_vecchia_response(
            self.cov_fn, cov_pars_k, 0.0, self.coords, coords_pred, nb_pred,
            b_orig, False)
        M = Q + jnp.diag(w_perm)
        c_po = self._cross_cov(cov_pars_k, coords_pred, self.coords_perm)
        z = jnp.linalg.solve(M, Q @ c_po.T)
        quad = jnp.einsum('pn,n,np->p', c_po, w_perm, z)
        prior_var = cov_pars_k[0] * jnp.ones(coords_pred.shape[0], self.dtype)
        var = jnp.maximum(prior_var - quad, 1e-12)
        return mean, var

    def nll_laplace(self, cov_pars: jnp.ndarray, y: jnp.ndarray,
                    aux_pars, fixed_part=None) -> jnp.ndarray:
        """Laplace-approximate NLL with the Vecchia latent precision
        (``FindModePostRandEffCalcMLLVecchia``, likelihoods.h:2765).

        cov_pars = [var, range, ...] (no nugget for non-Gaussian).
        Dense logdet/solve path (exact); the CG + stochastic-trace path is the
        iterative upgrade (matrix_inversion_method='iterative').
        """
        if self.likelihood == "gaussian_heteroscedastic":
            return self.nll_het(cov_pars, y, fixed_part)
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import find_mode_prec
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        Q, d = self._dense_precision(cov_pars)
        b = find_mode_prec(self.likelihood, Q, yp, Fp, aux)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux)
        loglik = jnp.sum(fam.log_lik(yp, loc, aux))
        quad = jnp.dot(b, Q @ b)
        # logdet(Sigma^-1 + W) - logdet(Sigma^-1); logdet(Sigma^-1) = -sum log d
        sign, ld1 = jnp.linalg.slogdet(Q + jnp.diag(w))
        ld0 = -jnp.sum(jnp.log(d))
        return -(loglik - 0.5 * quad - 0.5 * (ld1 - ld0))

    def _dense_precision(self, cov_pars):
        """Dense Sigma^-1 = B' D^-1 B (exact small-n path). Returns (Q, d)."""
        a, d = self._latent_factors(cov_pars)
        n = self.n
        Bmat = (jnp.eye(n, dtype=self.dtype)
                - jnp.zeros((n, n), self.dtype)
                .at[jnp.arange(n)[:, None], jnp.maximum(self.neighbors, 0)]
                .add(jnp.where(self.neighbors >= 0, a, 0.0)))
        Q = Bmat.T @ (Bmat / d[:, None])
        return Q, d

    # ---- iterative Vecchia-Laplace (matrix-free Newton-CG + stochastic
    # logdet; matrix_inversion_method='iterative') ----------------------
    def nll_laplace_iterative(self, cov_pars, y, aux_pars, fixed_part=None,
                              num_rand_vec_trace: int = 50,
                              lanczos_steps: int = 50,
                              cg_tol: float = 1e-3, cg_max_iter: int = 1000,
                              seed_rand_vec_trace: int = 1,
                              variance_reduction: bool = False,
                              preconditioner: str = "",
                              piv_chol_rank: int = 50):
        """Laplace NLL with preconditioned CG + stochastic Lanczos logdet —
        the fork's iterative method (arXiv:2310.12000), O(n m) per matvec,
        no dense [n, n] matrices.

        Under an active mesh the padded row-sharded layout serves the whole
        computation SPMD (the multi-chip Vecchia-Laplace fit,
        ``FindModePostRandEffCalcMLLVecchia`` likelihoods.h:2765): padding
        rows are decoupled in Q, carry zero likelihood weight, and the
        stochastic probes are drawn on the REAL rows only (zero-padded), so
        the value matches the unpadded single-device result exactly.
        """
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.ops import cg as cgops
        fam = lk.get_family(self.likelihood)
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        use_shard = (self._shard_nb is not None and self.z is None
                     and not variance_reduction)
        if use_shard:
            nb = self._shard_nb
            # halo layout: the factor build reads pre-gathered neighbor
            # coords instead of the replicated table (mode-finder / logdet
            # matvecs still gather globally — CG vectors change per
            # iteration, so a per-iteration halo exchange would trade the
            # replication for latency; coords are the dominant table)
            a, d = vops.build_factors(
                self.cov_fn, cov_pars,
                None if self._shard_nb_coords is not None
                else self.coords_perm,
                nb, None, False, row_coords=self._shard_row_coords,
                nb_coords=self._shard_nb_coords)
            yp = y[self._perm_pad]
            Fp = (jnp.zeros(nb.shape[0], self.dtype) if fixed_part is None
                  else fixed_part[self._perm_pad])
            row_w = self._shard_w
        else:
            nb = self.neighbors
            a, d = self._latent_factors(cov_pars)
            yp = y[self.perm]
            Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
                  else fixed_part[self.perm])
            row_w = jnp.ones(self.n, self.dtype)
        n_tot = nb.shape[0]
        # banded spatial layout for the SINGLE-RHS mode-finder/quad
        # matvecs (index streams cost ~16 ms per 2M-edge apply on TPU);
        # multi-RHS (SLQ probes) keeps the scatter path whose index cost
        # amortizes across the RHS lanes. Mesh layouts stay scatter.
        band = None if use_shard else self._banded(nb)
        q_mv = _mode_q_mv(a, nb, d, band)

        b = _find_mode_cg(self.likelihood, band, a, d, nb, yp, Fp, aux,
                          row_w)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux) * row_w
        loglik = jnp.sum(fam.log_lik(yp, loc, aux) * row_w)
        quad = jnp.dot(b, q_mv(b))
        # A = Q + W matvec (differentiable through a, d, w)
        def a_mv(V):
            if V.ndim == 1:
                return q_mv(V) + w * V
            return q_mv(V) + w[:, None] * V

        # preconditioner selection (cg_preconditioner_type,
        # reference basic.py:5147-5159): 'vadu'/'Sigma_inv_plus_BtWB' maps
        # to the TPU-native diagonal of the same matrix (diag(Q) + W — the
        # reference's B'(D^-1+W)B apply needs sequential sparse-triangular
        # solves); 'pivoted_cholesky'/'fitc'/
        # 'predictive_process_plus_diagonal' map to the randomized-Nystrom
        # low-rank+diagonal (ops/cg.py nystrom_preconditioner)
        pname = _resolve_precond_name(preconditioner)
        if pname == "low_rank" and variance_reduction:
            raise NotImplementedError(
                "optimal-c variance reduction is implemented for the "
                "'vadu' (diagonal) preconditioner only")
        diag_q = _precision_diag(a, nb, d)
        pre_diag = jax.lax.stop_gradient(jnp.maximum(diag_q + w, 1e-10))
        key = jax.random.PRNGKey(seed_rand_vec_trace)
        k1, k2, k3 = jax.random.split(key, 3)
        if pname == "low_rank":
            if use_shard:
                raise NotImplementedError(
                    "low-rank cg_preconditioner_type is not supported "
                    "under a mesh; use 'vadu'")
            a_sg = jax.lax.stop_gradient(a)
            d_sg = jax.lax.stop_gradient(d)
            w_sg = jax.lax.stop_gradient(w)

            def a_mv_sg(V):
                qv = jax.vmap(
                    lambda col: vops.precision_matvec(a_sg, nb, d_sg, col),
                    in_axes=1, out_axes=1)(V)
                return qv + w_sg[:, None] * V

            pre = cgops.nystrom_preconditioner(
                a_mv_sg, n_tot, min(int(piv_chol_rank), self.n), k3,
                self.dtype)
            Z = pre.sample_probes(k1, num_rand_vec_trace)
        else:
            pre = cgops.JacobiPreconditioner(pre_diag)
            # probes live on the REAL rows only (zero-padded below): the pad
            # block of A is decoupled and cancels exactly in the logdet
            # ratio, and the draw shape [n, k] keeps the sharded value
            # identical to the unpadded single-device one
            e = jax.random.normal(k1, (self.n, num_rand_vec_trace),
                                  self.dtype)
            Z = jnp.sqrt(pre_diag[:self.n])[:, None] * e
            if n_tot != self.n:
                Z = jnp.concatenate(
                    [Z, jnp.zeros((n_tot - self.n, num_rand_vec_trace),
                                  self.dtype)])
        if variance_reduction:
            # optimal-c control variate on the Jacobi preconditioner
            # (CalcOptimalCVectorized, CG_utils.h:413): P(theta) tracks
            # A(theta), its trace derivative is exact, and the c-scaled
            # control error is subtracted per parameter entry
            def mv_A(th, V):
                a_, d_, w_ = th
                if V.ndim == 1:
                    return vops.precision_matvec(a_, nb, d_, V) + w_ * V
                qv = jax.vmap(
                    lambda col: vops.precision_matvec(a_, nb, d_, col),
                    in_axes=1, out_axes=1)(V)
                return qv + w_[:, None] * V

            def p_diag(th):
                a_, d_, w_ = th
                return jnp.maximum(_precision_diag(a_, nb, d_) + w_, 1e-10)

            def mv_P(th, V):
                pd = p_diag(th)
                return pd[:, None] * V if V.ndim == 2 else pd * V

            logdet_A = cgops.stochastic_logdet_grad_vr(
                mv_A, mv_P, lambda th: jnp.sum(jnp.log(p_diag(th))),
                (a, d, w), Z, lanczos_steps, pre.solve, cg_tol, cg_max_iter)
        else:
            Zg = cgops.rademacher_probes(k2, self.n, num_rand_vec_trace,
                                         self.dtype)
            if n_tot != self.n:
                Zg = jnp.concatenate(
                    [Zg, jnp.zeros((n_tot - self.n, num_rand_vec_trace),
                                   self.dtype)])
            # preconditioner logdet over real rows only (pads cancel in the
            # ratio below)
            pre_logdet = (pre.logdet() if pname == "low_rank"
                          else jnp.sum(jnp.log(pre_diag) * row_w))
            logdet_A = cgops.stochastic_logdet_grad(
                a_mv, None, Z, lanczos_steps, pre.solve, pre_logdet,
                cg_tol, cg_max_iter, probes_grad=Zg)
        # logdet(Sigma^-1) = -sum log d  (exact; real rows only — the pad
        # block's -log d_pad cancels against its +log d_pad in logdet_A)
        logdet_ratio = logdet_A + jnp.sum(jnp.log(d) * row_w)
        return -(loglik - 0.5 * quad - 0.5 * logdet_ratio)

    def _zp_full(self, z_pred, n_p):
        """[n_p, C] prediction covariates with the leading ones column."""
        if z_pred is None:
            return jnp.concatenate(
                [jnp.ones((n_p, 1), self.dtype),
                 jnp.zeros((n_p, self.z.shape[1] - 1), self.dtype)], 1)
        return jnp.concatenate(
            [jnp.ones((n_p, 1), self.dtype),
             jnp.asarray(np.asarray(z_pred, np.float64).reshape(n_p, -1),
                         self.dtype)], 1)

    def predict_laplace(self, cov_pars, y, aux_pars, coords_pred,
                        fixed_part=None, fixed_part_pred=None,
                        predict_response=True, predict_var=False,
                        z_pred=None, codes_pred=None):
        """Vecchia-Laplace prediction: find mode, then local kriging on the
        latent mode values with latent covariance. Supports GP random
        coefficients (``z_pred``) and cluster_ids (``codes_pred``)."""
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import _response_moments
        fam = lk.get_family(self.likelihood)
        aux = aux_pars if aux_pars is not None else jnp.zeros((0,), self.dtype)
        b_perm, w_perm, Q = self._find_mode_dense(cov_pars, y, aux, fixed_part)
        # latent mean at pred points: local kriging on the mode
        b_orig = b_perm[self.inv_perm]
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        cdp = (None if codes_pred is None
               else jnp.asarray(np.asarray(codes_pred, np.int32)))
        nb_pred = self._pred_neighbors(cov_pars, coords_pred, codes_pred=cdp)
        if self.z is not None:
            pars_stack = jnp.reshape(
                cov_pars, (self.z.shape[1], self.cov_fn.num_cov_par))
            zp = self._zp_full(z_pred, n_p)
            mean_lat, _ = vops.predict_vecchia_response_svc(
                self.cov_fn, pars_stack, 0.0, self.coords, cp, nb_pred,
                self.z_orig, zp, b_orig, False)
        else:
            mean_lat, _ = vops.predict_vecchia_response(
                self.cov_fn, cov_pars, 0.0, self.coords, cp, nb_pred,
                b_orig, False)
        if fixed_part_pred is not None:
            mean_lat = mean_lat + fixed_part_pred
        var = None
        if predict_var or predict_response:
            # posterior var ~ prior kriging var + propagate mode uncertainty:
            # full formula Sigma_pp - Sigma_po (Sigma + W^-1)^-1 Sigma_op;
            # dense fallback via the observed-point posterior covariance
            M = Q + jnp.diag(w_perm)
            # cross-cov pred->obs (permuted order for obs)
            if self.z is not None:
                d_po = jnp.sqrt(jnp.maximum(jnp.sum(
                    (cp[:, None, :] - self.coords_perm[None, :, :]) ** 2,
                    -1), 0.0))
                c_po = jnp.zeros((n_p, self.n), self.dtype)
                prior_var = jnp.zeros(n_p, self.dtype)
                z_perm = self.z
                for c in range(self.z.shape[1]):
                    k_c = self.cov_fn.cov_matrix(pars_stack[c], dist=d_po)
                    c_po = c_po + (zp[:, c][:, None]
                                   * z_perm[:, c][None, :]) * k_c
                    prior_var = prior_var + zp[:, c] ** 2 * pars_stack[c, 0]
            else:
                c_po = self._cross_cov(cov_pars, cp, self.coords_perm)
                prior_var = cov_pars[0] * jnp.ones(n_p, self.dtype)
            if cdp is not None and self.codes_perm is not None:
                c_po = c_po * (cdp[:, None]
                               == self.codes_perm[None, :]).astype(c_po.dtype)
            # (Sigma + W^-1)^-1 = W (I + Sigma W)^-1 = W M^-1 Q  (M = Q + W)
            z = jnp.linalg.solve(M, Q @ c_po.T)
            quad = jnp.einsum('pn,n,np->p', c_po, w_perm, z)
            var = jnp.maximum(prior_var - quad, 1e-12)
        if predict_response:
            mean_resp, var_resp = _response_moments(
                self.likelihood, mean_lat, var, aux)
            return mean_resp, (var_resp if predict_var else None)
        return mean_lat, (var if predict_var else None)

    def predict_laplace_sim(self, cov_pars, y, aux_pars, coords_pred,
                            fixed_part=None, fixed_part_pred=None,
                            predict_response=True, predict_var=False,
                            nsim: int = 1000, seed: int = 1,
                            cg_tol: float = 1e-6, cg_max_iter: int = 1000):
        """Scalable Vecchia-Laplace prediction with SIMULATED predictive
        variances (``nsim_var_pred``; reference
        ``Sample_Posterior_LaplaceApprox_Vecchia``, likelihoods.h:6818-7121,
        used by ``PredictLaplaceApproxVecchia``).

        Everything is matrix-free: Newton-CG mode finding, posterior draws
        u^k = H^-1 (B' D^-1/2 z1 + W^1/2 z2) ~ N(0, H^-1) with H = Q + W
        solved by Jacobi-PCG, and the latent predictive variance

          var_p = Dp_p + mean_k (Bpo_p u^k)^2

        where (Bpo, Dp) are the latent conditioning weights of each
        prediction point on its observed neighbors. No [n, n] or [n_p, n]
        matrix is ever materialized — O(n (m + nsim)) memory.
        """
        from gpboost_tpu import likelihoods as lk
        from gpboost_tpu.models.laplace import _response_moments
        from gpboost_tpu.ops import cg as cgops
        fam = lk.get_family(self.likelihood)
        aux = (aux_pars if aux_pars is not None
               else jnp.zeros((0,), self.dtype))
        use_shard = self._shard_nb is not None and self.z is None
        if use_shard:
            nb = self._shard_nb
            # halo layout: the factor build reads pre-gathered neighbor
            # coords instead of the replicated table (mode-finder / logdet
            # matvecs still gather globally — CG vectors change per
            # iteration, so a per-iteration halo exchange would trade the
            # replication for latency; coords are the dominant table)
            a, d = vops.build_factors(
                self.cov_fn, cov_pars,
                None if self._shard_nb_coords is not None
                else self.coords_perm,
                nb, None, False, row_coords=self._shard_row_coords,
                nb_coords=self._shard_nb_coords)
            yp = y[self._perm_pad]
            Fp = (jnp.zeros(nb.shape[0], self.dtype) if fixed_part is None
                  else fixed_part[self._perm_pad])
            row_w = self._shard_w
        else:
            nb = self.neighbors
            a, d = self._latent_factors(cov_pars)
            yp = y[self.perm]
            Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
                  else fixed_part[self.perm])
            row_w = jnp.ones(self.n, self.dtype)
        n_tot = nb.shape[0]
        band = None if use_shard else self._banded(nb)
        b = _find_mode_cg(self.likelihood, band, a, d, nb, yp, Fp, aux,
                          row_w)
        w = jnp.maximum(-fam.d2_loc(yp, Fp + b, aux), 1e-10) * row_w
        b_orig = b[:self.n][self.inv_perm]
        cp = jnp.asarray(coords_pred, self.dtype)
        n_p = cp.shape[0]
        # latent conditioning of each pred point on its observed neighbors
        nb_pred = self._pred_neighbors(cov_pars, cp)
        a_pred, d_pred = vops.build_factors(
            self.cov_fn, cov_pars, self.coords, nb_pred, None, False,
            row_coords=cp)
        idx_p = jnp.maximum(nb_pred, 0)
        mask_p = (nb_pred >= 0).astype(self.dtype)
        mean_lat = jnp.sum(a_pred * mask_p * b_orig[idx_p], axis=1)
        if fixed_part_pred is not None:
            mean_lat = mean_lat + fixed_part_pred
        var = None
        if predict_var or predict_response:
            diag_q = _precision_diag(a, nb, d)
            pre_d = jnp.maximum(diag_q + w, 1e-10)
            sqrt_dinv = 1.0 / jnp.sqrt(d)
            sqrt_w = jnp.sqrt(w)
            inv_perm_j = jnp.asarray(self.inv_perm)

            def h_mv(V):
                qv = jax.vmap(
                    lambda col: vops.precision_matvec(a, nb, d, col),
                    in_axes=1, out_axes=1)(V)
                return qv + w[:, None] * V

            key = jax.random.PRNGKey(seed)
            chunk = min(nsim, 128)
            n_chunks = (nsim + chunk - 1) // chunk
            s2_sum = jnp.zeros(n_p, self.dtype)
            for c in range(n_chunks):
                k1, k2, key = jax.random.split(
                    jax.random.fold_in(key, c), 3)
                z1 = jax.random.normal(k1, (self.n, chunk), self.dtype)
                z2 = jax.random.normal(k2, (self.n, chunk), self.dtype)
                if n_tot != self.n:
                    # sharded padded layout: pad draws with zeros — the pad
                    # rows are decoupled, so they stay 0 through the solve
                    pad0 = jnp.zeros((n_tot - self.n, chunk), self.dtype)
                    z1 = jnp.concatenate([z1, pad0])
                    z2 = jnp.concatenate([z2, pad0])
                # z ~ N(0, H): B' D^-1/2 z1 + W^1/2 z2
                z = jax.vmap(
                    lambda col: vops.apply_Bt(a, nb, col),
                    in_axes=1, out_axes=1)(sqrt_dinv[:, None] * z1) \
                    + sqrt_w[:, None] * z2
                u, _ = cgops.pcg(h_mv, z, lambda R: R / pre_d[:, None],
                                 tol=cg_tol, max_iter=cg_max_iter)
                u_orig = u[:self.n][inv_perm_j]      # [n, chunk]
                s = jnp.einsum("pm,pmk->pk", a_pred * mask_p,
                               u_orig[idx_p])        # Bpo u
                s2_sum = s2_sum + jnp.sum(s * s, axis=1)
            var = d_pred + s2_sum / (n_chunks * chunk)
        if predict_response:
            mean_resp, var_resp = _response_moments(
                self.likelihood, mean_lat, var, aux)
            return mean_resp, (var_resp if predict_var else None)
        return mean_lat, (var if predict_var else None)

    def _find_mode_dense(self, cov_pars, y, aux, fixed_part):
        from gpboost_tpu import likelihoods as lk
        fam = lk.get_family(self.likelihood)
        yp = y[self.perm]
        Fp = (jnp.zeros(self.n, self.dtype) if fixed_part is None
              else fixed_part[self.perm])
        a, d = self._latent_factors(cov_pars)
        n = self.n
        Bmat = (jnp.eye(n, dtype=self.dtype)
                - jnp.zeros((n, n), self.dtype)
                .at[jnp.arange(n)[:, None], jnp.maximum(self.neighbors, 0)]
                .add(jnp.where(self.neighbors >= 0, a, 0.0)))
        Q = Bmat.T @ (Bmat / d[:, None])
        b = jnp.zeros(n, self.dtype)
        for _ in range(50):
            loc = Fp + b
            d1 = fam.d_loc(yp, loc, aux)
            w = jnp.maximum(-fam.d2_loc(yp, loc, aux), 1e-10)
            M = Q + jnp.diag(w)
            b = b + jnp.linalg.solve(M, d1 - Q @ b)
        loc = Fp + b
        w = -fam.d2_loc(yp, loc, aux)
        return b, w, Q

    def grad_F_laplace(self, cov_pars, y, aux_pars, fixed_part,
                       iterative: Optional[bool] = None, **iter_kwargs):
        """d NLL / dF for LaGaBoost with Vecchia (autodiff;
        ``regression_objective.hpp:173-186``). Routes through the dense
        Laplace NLL at small n and the matrix-free iterative one past the
        dense-feasibility envelope (same rule as the fit driver)."""
        if iterative is None:
            iterative = self.n > 8192 and self.z is None
        if iterative:
            def f(fe):
                return self.nll_laplace_iterative(cov_pars, y, aux_pars, fe,
                                                  **iter_kwargs)
            return jax.grad(f)(fixed_part)

        def f(fe):
            return self.nll_laplace(cov_pars, y, aux_pars, fe)
        return jax.grad(f)(fixed_part)
