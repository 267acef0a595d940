"""Multi-host entry point: ``jax.distributed`` + a global device mesh.

TPU-native replacement for the reference's network bootstrap
(``Network::Init``, ``include/LightGBM/network.h:99``; config keys
``num_machines`` / ``machines`` / ``local_listen_port``): instead of wiring
socket/MPI linkers, each host calls :func:`initialize` once, after which
``jax.devices()`` spans every host and :func:`global_mesh` builds a mesh over
all of them. Passing that mesh to ``gpboost_tpu.use_mesh`` makes
``GPModel.fit`` / ``gpb.train`` compile as multi-host SPMD programs whose
collectives ride ICI/DCN — no explicit message passing in the framework.

Typical v5p-16 (2 hosts) launch, same script on both hosts::

    import gpboost_tpu as gpb
    gpb.distributed.initialize()          # TPU pods: auto-detected
    with gpb.use_mesh(gpb.distributed.global_mesh()):
        gp = gpb.GPModel(gp_coords=coords, gp_approx="vecchia", ...)
        gp.fit(y=y)

On CPU/GPU clusters pass ``coordinator_address`` / ``num_processes`` /
``process_id`` explicitly (mirrors the reference's machine-list config).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Join the multi-host job (``jax.distributed.initialize`` wrapper).

    On TPU pods all arguments are auto-detected from the environment; on
    other platforms pass the coordinator address ``"host:port"``, the total
    process count, and this host's rank — the information the reference
    encodes in its ``machines``/``num_machines`` config
    (``include/LightGBM/network.h:99``, ``config.h`` network section).
    Safe to call once per process, before any other JAX API touches the
    backend.
    """
    global _initialized
    if _initialized:
        return
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def shutdown() -> None:
    """Leave the multi-host job (idempotent)."""
    global _initialized
    if not _initialized:
        return
    import jax
    jax.distributed.shutdown()
    _initialized = False


def is_initialized() -> bool:
    return _initialized


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def global_mesh(axis: str = "data"):
    """1-D mesh over ALL global devices (every host's chips). Use with
    ``gpboost_tpu.use_mesh`` to run fits data-parallel across hosts."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))
