"""Multi-host process-group setup and hybrid meshes.

The reference has no distributed layer at all (one process, SURVEY.md §2.2);
this is the TPU-native stack mandated by BASELINE.json:5: a jax.distributed
process group, a hybrid DCN(hosts) x ICI(chips) mesh, and helpers to lay the
frame's row sharding so gradient/psum collectives ride ICI within a host
slice and only framebuffer gathers cross DCN.

Single-process usage degrades gracefully: initialize() is a no-op when no
coordinator is configured, and meshes fall back to all local devices.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-host process group.

    Arguments default from the standard env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  Returns True when running
    multi-host, False for the single-process fallback.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count() > 1


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def make_render_mesh(rows_per_host: Optional[int] = None) -> Mesh:
    """1D 'rows' mesh over all global devices, host-major so each host's
    slab of rows is contiguous (the host gather then moves exactly one
    contiguous block per host across DCN)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), axis_names=("rows",))


def make_hybrid_mesh(ici_axis: str = "chip", dcn_axis: str = "host") -> Mesh:
    """2D (host, chip) mesh: DCN-connected axis first, ICI axis second.

    Use for layouts that want collectives constrained to ICI: shard rows over
    'chip' and replicate (or outer-shard) over 'host'."""
    n_proc = jax.process_count()
    if n_proc == 1:
        devs = np.asarray(jax.devices()).reshape(1, -1)
        return Mesh(devs, axis_names=(dcn_axis, ici_axis))
    try:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh

        per_host = jax.local_device_count()
        devs = create_hybrid_device_mesh(
            mesh_shape=(1, per_host),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices())
        return Mesh(devs, axis_names=(dcn_axis, ici_axis))
    except Exception:
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        arr = np.asarray(devs).reshape(n_proc, -1)
        return Mesh(arr, axis_names=(dcn_axis, ici_axis))


def host_gather_image(img) -> "np.ndarray":
    """Fully-replicated host copy of a sharded frame (multihost_utils when
    multi-host, plain device_get single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(img, tiled=True))
    return np.asarray(jax.device_get(img))
