"""Distributed configuration: the active device mesh.

TPU-native replacement for the reference's distributed runtime
(``include/LightGBM/network.h:88-302`` socket/MPI linkers + config's
``num_machines``/``machines`` options): one global switch —
``gpboost_tpu.set_mesh(mesh)`` or ``with gpboost_tpu.use_mesh(mesh):`` —
under which every model/dataset constructed places its per-row arrays
row-sharded over the mesh. The jitted NLL/gradient/histogram programs then
compile as SPMD: XLA partitions the row-parallel work and inserts the
psum/all-gather collectives the reference implements by hand
(``data_parallel_tree_learner.cpp:131-175``).

Layout (SURVEY §2.5): observations (Vecchia rows, histogram rows) shard
across the ``data`` axis; coordinate tables and parameters replicate —
neighbor gathers need the global coordinate table, and at the typical m=20
replication beats a ragged halo exchange.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpboost_tpu.parallel.mesh import make_mesh  # noqa: F401

_ACTIVE_MESH: Optional[Mesh] = None
_DATA_AXIS: str = "data"


def set_mesh(mesh: Optional[Mesh], axis: str = "data") -> None:
    """Set (or clear, with ``None``) the process-wide device mesh. Models and
    datasets constructed while a mesh is active shard their row-parallel
    arrays over it."""
    global _ACTIVE_MESH, _DATA_AXIS
    _ACTIVE_MESH = mesh
    _DATA_AXIS = axis


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def data_axis() -> str:
    return _DATA_AXIS


@contextlib.contextmanager
def use_mesh(mesh: Mesh, axis: str = "data"):
    """Context manager form of :func:`set_mesh`."""
    prev, prev_axis = _ACTIVE_MESH, _DATA_AXIS
    set_mesh(mesh, axis)
    try:
        yield mesh
    finally:
        set_mesh(prev, prev_axis)


def shard_rows(x, mesh: Optional[Mesh] = None, axis: Optional[str] = None):
    """Place ``x`` with its leading (row) dimension sharded over the mesh."""
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return x
    axis = axis or _DATA_AXIS
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Optional[Mesh] = None):
    """Place ``x`` fully replicated over the mesh."""
    mesh = mesh or _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P()))
