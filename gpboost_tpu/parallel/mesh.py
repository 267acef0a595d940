"""Multi-chip sharding: data-parallel Vecchia NLL/gradients + histogram
reductions over a ``jax.sharding.Mesh``.

TPU-native replacement for the reference's distributed layer
(``src/LightGBM/network/``: socket/MPI linkers with Bruck /
recursive-halving / ring collectives, ``network.h:88-302``) — deleted
entirely per SURVEY §5: a mesh + ``shard_map`` with ``psum`` /
``reduce_scatter`` provides the same collectives compiler-scheduled over ICI.

Sharding layout (SURVEY §2.5 "TPU-native equivalents"):
- Vecchia rows (observations) are sharded across the ``data`` axis; coords
  and y are replicated (the neighbor gather needs a global halo — at the
  typical m=20, replication beats a ragged halo exchange).
- CG / NLL inner products and histogram accumulations reduce with ``psum``
  over ICI (the reference's ``Network::Allreduce`` of histograms,
  ``data_parallel_tree_learner.cpp:131-175``).

Memory envelope of the replicated tables (deliberate design choice): the
sharded per-row structure dominates — each chip holds n/D rows of
[m] neighbor indices + [m, d] gathered neighbor coordinates (the halo,
pre-gathered at shard build) ≈ n/D * m * (d+1) * 4 B — while the
replicated global tables cost n * (d + 1) * 4 B per chip (coords + y):
at n = 10^8, d = 2, that is 1.2 GB per chip against ~100 GB HBM on a v5p
part, so replication is not the binding constraint below ~10^9 rows.
Past that envelope :func:`sharded_vecchia_nll_halo_fn` drops the
replicated tables entirely: neighbor coordinates AND neighbor y values are
pre-gathered once into row-sharded halo arrays, so per-chip memory is
n/D * m * (d+1) — smaller than replication whenever the mesh is wider
than ~m+1 devices, and O(1/D) in every input.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpboost_tpu.ops import vecchia as vops
from gpboost_tpu.ops.cov_fns import CovFunction


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sharded_vecchia_nll_fn(cov_fn: CovFunction, mesh: Mesh,
                           axis: str = "data"):
    """Build a jitted, mesh-sharded Vecchia NLL.

    Inputs: cov_pars [p] (replicated), coords [n, d] (replicated),
    neighbors [n, m] (sharded on rows), y [n] (replicated; the B-apply needs
    neighbor values outside the local shard).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis, None), P(), P(axis, None), P(axis)),
             out_specs=P())
    def _nll(cov_pars, coords, neighbors, y, row_coords, y_shard):
        # per-shard factor rows; gathers read the replicated coords/y
        a, d = vops.build_factors(cov_fn, cov_pars[1:], coords, neighbors,
                                  cov_pars[0], True, row_coords=row_coords)
        idx = jnp.maximum(neighbors, 0)
        br = y_shard - jnp.sum(a * y[idx], axis=1)
        local = 0.5 * (jnp.sum(jnp.log(d)) + jnp.sum(br * br / d))
        total = jax.lax.psum(local, axis)
        n = y.shape[0]
        return total + 0.5 * n * jnp.log(2.0 * jnp.pi)

    def nll(cov_pars, coords, neighbors, y):
        return _nll(cov_pars, coords, neighbors, y, coords, y)

    return nll


def gather_vecchia_halo(coords, neighbors, y):
    """Pre-gather the per-row neighbor halo for the no-replication layout:
    returns (nb_coords [n, m, d], y_nb [n, m]) — everything a row's factor
    build and B-apply need, row-local. Run ONCE at shard build (host or
    device), then shard all arrays on the row axis."""
    idx = jnp.maximum(neighbors, 0)
    return coords[idx], y[idx]


def sharded_vecchia_nll_halo_fn(cov_fn: CovFunction, mesh: Mesh,
                                axis: str = "data"):
    """No-replication ("halo") variant of :func:`sharded_vecchia_nll_fn`.

    Every input is sharded on the row axis — there is NO replicated global
    coordinate or y table, so per-chip memory is O(n/D): the fallback past
    the replication envelope documented in the module docstring (the
    reference's distributed scope has no analog; its Vecchia path is
    single-process, ``Vecchia_utils.cpp``).

    Inputs: cov_pars [p] (replicated); neighbors [n, m], nb_coords
    [n, m, d], y_nb [n, m] (from :func:`gather_vecchia_halo`), row_coords
    [n, d], y [n] — all row-sharded. Matches the replicated builder to
    float round-off (same factor math, no gathers).
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis, None), P(axis, None, None),
                       P(axis, None), P(axis, None), P(axis)),
             out_specs=P())
    def _nll(cov_pars, neighbors, nb_coords, y_nb, row_coords, y_shard):
        a, d = vops.build_factors(cov_fn, cov_pars[1:], None, neighbors,
                                  cov_pars[0], True, row_coords=row_coords,
                                  nb_coords=nb_coords)
        mask = neighbors >= 0
        br = y_shard - jnp.sum(a * jnp.where(mask, y_nb, 0.0), axis=1)
        local = 0.5 * (jnp.sum(jnp.log(d)) + jnp.sum(br * br / d))
        return jax.lax.psum(local, axis)

    def nll(cov_pars, neighbors, nb_coords, y_nb, row_coords, y):
        n = y.shape[0]
        return (_nll(cov_pars, neighbors, nb_coords, y_nb, row_coords, y)
                + 0.5 * n * jnp.log(2.0 * jnp.pi))

    return nll


def sharded_histogram_fn(mesh: Mesh, num_bins: int, axis: str = "data"):
    """Data-parallel histogram build: local scatter-add + psum — the
    ``DataParallelTreeLearner`` ReduceScatter/Allreduce pattern compiled into
    collectives."""

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
             out_specs=(P(), P(), P()))
    def _hist(binned, grad, hess, mask):
        gm = jnp.where(mask, grad, 0.0)
        hm = jnp.where(mask, hess, 0.0)
        cm = mask.astype(grad.dtype)

        def one_feature(bins_f):
            return (jnp.zeros(num_bins, grad.dtype).at[bins_f].add(gm),
                    jnp.zeros(num_bins, grad.dtype).at[bins_f].add(hm),
                    jnp.zeros(num_bins, grad.dtype).at[bins_f].add(cm))

        hg, hh, hc = jax.vmap(one_feature)(binned.T)
        return (jax.lax.psum(hg, axis), jax.lax.psum(hh, axis),
                jax.lax.psum(hc, axis))

    return _hist


def pad_cluster_blocks(blocks, r, n_shards: int):
    """Pad a ``ClusterBlocks`` batch along the cluster axis to a multiple of
    ``n_shards`` and gather the residual into [C, m] blocks.

    Padding blocks are all-invalid (identity Psi, zero residual), so they
    contribute nothing to the reduction. Returns (coords [C', m, d],
    valid [C', m], rb [C', m]).
    """
    from gpboost_tpu.models.clustered import _gather_blocks
    rb = _gather_blocks(blocks, r)
    C = blocks.coords.shape[0]
    pad = (-C) % n_shards
    if pad:
        coords = jnp.concatenate(
            [blocks.coords,
             jnp.zeros((pad,) + blocks.coords.shape[1:],
                       blocks.coords.dtype)])
        valid = jnp.concatenate(
            [blocks.valid, jnp.zeros((pad,) + blocks.valid.shape[1:], bool)])
        rb = jnp.concatenate([rb, jnp.zeros((pad,) + rb.shape[1:],
                                            rb.dtype)])
    else:
        coords, valid = blocks.coords, blocks.valid
    return coords, valid, rb


def sharded_cluster_nll_fn(cov_fn: CovFunction, mesh: Mesh,
                           axis: str = "data"):
    """Mesh-sharded exact-GP NLL over independent ``cluster_ids`` blocks.

    SURVEY §2.5 item 8: the reference loops clusters SERIALLY
    (``re_model_template.h:5020-5144``); here the [C, m, m] batched-Cholesky
    path (``models/clustered.py``) shards its leading cluster axis across the
    mesh — embarrassing parallelism with one final psum of (quad, logdet).

    Inputs: cov_pars [p] (replicated), coords [C, m, d] / valid [C, m] /
    rb [C, m] (sharded on the cluster axis; pad C to a multiple of the mesh
    size with :func:`pad_cluster_blocks`), num_data (static python int).
    """
    from jax import shard_map
    from gpboost_tpu.models.clustered import LOG_2PI, block_quad_logdet

    def _local(cov_pars, coords, valid, rb):
        quad, logdet = block_quad_logdet(cov_fn, cov_pars, coords, valid, rb)
        return (jax.lax.psum(quad, axis),
                jax.lax.psum(logdet, axis))

    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()))

    @partial(jax.jit, static_argnums=(4,))
    def nll(cov_pars, coords, valid, rb, num_data: int):
        quad, logdet = sharded(cov_pars, coords, valid, rb)
        return 0.5 * (quad + logdet + num_data * LOG_2PI)

    return nll


# NOTE: the round-1 demo `sharded_training_step_fn` (toy GD step + residual
# histogram) was retired: the PRODUCT paths now run sharded. Constructing a
# GPModel / Dataset inside `gpboost_tpu.use_mesh(mesh)` places the row
# structure sharded (parallel/__init__.py) and the regular
# `GPModel.fit()` / `gpb.train()` programs compile as SPMD — exercised by
# `__graft_entry__.dryrun_multichip` and tests/test_parallel.py.


def make_voting_context(mesh: Mesh, max_num_bins: int, top_k: int,
                        num_bins_per_feat, lambda_l1: float, lambda_l2: float,
                        min_data_in_leaf: float, min_sum_hessian: float,
                        axis: str = "data"):
    """Voting-parallel (PV-Tree) per-leaf histogram aggregation.

    TPU redesign of ``VotingParallelTreeLearner``
    (``src/LightGBM/treelearner/voting_parallel_tree_learner.cpp:151,322``):

    1. each device builds shard-local histograms and scores its per-feature
       best local split gain,
    2. keeps its local top-``top_k`` features,
    3. weights the gain by ``local_leaf_count / mean_leaf_count``
       (``GlobalVoting``'s weighted gain) and takes the element-wise max
       over devices — the vote (the reference Allgathers top-k LightSplitInfo
       per machine; the pmax of masked weighted gains selects the same
       winners without the gather),
    4. selects the global top-``2*top_k`` features and psums ONLY those
       features' histograms over ICI (the comm saving that defines PV-Tree),
    5. returns full-width [F, B] histograms — exact for selected features,
       zero elsewhere — plus the selected-feature mask and exact global leaf
       totals.

    The host grower restricts split search to the selected features via a
    per-leaf ``num_bins`` override; histogram subtraction is disabled in
    voting mode (parent/child feature selections differ, so parent-minus-
    child is undefined — the reference handles this with global/local split
    copies; recomputing the child leaf is the simpler SPMD equivalent).
    """
    from jax import shard_map

    ndev = int(np.prod(mesh.devices.shape))
    nb = jnp.asarray(np.asarray(num_bins_per_feat))
    F = int(len(np.asarray(num_bins_per_feat)))
    k_loc = min(int(top_k), F)
    k_glob = min(2 * int(top_k), F)

    def _local(binned, grad, hess, mask):
        gm = jnp.where(mask, grad, 0.0)
        hm = jnp.where(mask, hess, 0.0)
        cm = mask.astype(grad.dtype)

        def one_feature(bins_f):
            hg = jnp.zeros(max_num_bins, grad.dtype).at[bins_f].add(gm)
            hh = jnp.zeros(max_num_bins, grad.dtype).at[bins_f].add(hm)
            hc = jnp.zeros(max_num_bins, grad.dtype).at[bins_f].add(cm)
            return hg, hh, hc

        hg, hh, hc = jax.vmap(one_feature)(binned.T)

        # shard-local per-feature best gain (FeatureHistogram gain math on
        # the LOCAL histograms, as each reference worker does)
        GL = jnp.cumsum(hg, axis=1)
        HL = jnp.cumsum(hh, axis=1)
        CL = jnp.cumsum(hc, axis=1)
        G, H, C = GL[:, -1:], HL[:, -1:], CL[:, -1:]

        def score(g, h):
            t = jnp.sign(g) * jnp.maximum(jnp.abs(g) - lambda_l1, 0.0)
            return t * t / (h + lambda_l2 + 1e-15)

        bin_ids = jnp.arange(max_num_bins)[None, :]
        GR, HR, CR = G - GL, H - HL, C - CL
        gain = score(GL, HL) + score(GR, HR) - score(G, H)
        valid = bin_ids < (nb[:, None] - 1)
        valid &= (CL >= min_data_in_leaf) & (CR >= min_data_in_leaf)
        valid &= (HL >= min_sum_hessian) & (HR >= min_sum_hessian)
        local_best = jnp.max(jnp.where(valid, gain, -jnp.inf), axis=1)  # [F]

        # local top-k vote
        top_idx = jax.lax.top_k(local_best, k_loc)[1]
        in_top = jnp.zeros(F, bool).at[top_idx].set(True)

        # GlobalVoting weighted gain: local leaf count / mean leaf count
        cnt_local = jnp.sum(hc) / F
        cnt_total = jax.lax.psum(cnt_local, axis)
        w = cnt_local / jnp.maximum(cnt_total / ndev, 1e-10)
        voted = jnp.where(in_top & jnp.isfinite(local_best),
                          local_best * w, -jnp.inf)
        global_gain = jax.lax.pmax(voted, axis)        # identical on all devs
        sel = jax.lax.top_k(global_gain, k_glob)[1]    # global top-2k feats

        # aggregate ONLY the selected features' histograms (2k rows, not F)
        hg_sel = jax.lax.psum(hg[sel], axis)
        hh_sel = jax.lax.psum(hh[sel], axis)
        hc_sel = jax.lax.psum(hc[sel], axis)
        full_hg = jnp.zeros_like(hg).at[sel].set(hg_sel)
        full_hh = jnp.zeros_like(hh).at[sel].set(hh_sel)
        full_hc = jnp.zeros_like(hc).at[sel].set(hc_sel)
        # every selected feature's histogram is exactly aggregated, so the
        # grower's GLOBAL validity checks decide — do not drop features whose
        # local splits were all invalid (small shards fail min_data_in_leaf
        # locally even when the global split is valid)
        sel_mask = jnp.zeros(F, bool).at[sel].set(True)

        # exact global leaf totals (independent of the feature selection)
        g_tot = jax.lax.psum(jnp.sum(hg) / F, axis)
        h_tot = jax.lax.psum(jnp.sum(hh) / F, axis)
        return (full_hg, full_hh, full_hc, sel_mask,
                g_tot, h_tot, cnt_total)

    sharded = jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=(P(None, None), P(None, None), P(None, None), P(None),
                   P(), P(), P()),
        check_vma=False))

    def leaf_hist(binned, grad, hess, mask):
        out = sharded(binned, grad, hess, mask)
        hg, hh, hc, sel_mask, g_tot, h_tot, c_tot = out
        return ((hg, hh, hc), np.asarray(sel_mask),
                (float(g_tot), float(h_tot), float(c_tot)))

    return leaf_hist
