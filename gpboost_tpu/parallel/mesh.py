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
