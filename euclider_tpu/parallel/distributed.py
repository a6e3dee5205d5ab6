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


def make_render_mesh() -> Mesh:
    """1D 'rows' mesh over all global devices, host-major so each host's
    slab of rows is contiguous (the host gather then moves exactly one
    contiguous block per host across DCN)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), axis_names=("rows",))


def replicate_to_global(tree, mesh: Mesh):
    """Host-local pytree -> globally-replicated jax.Arrays on ``mesh``.

    Multi-process jit requires explicit global arrays; every process must
    pass identical data (the scene tables/camera, replicated by design)."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())

    def conv(a):
        if not hasattr(a, "dtype") and not isinstance(a, (int, float)):
            return a
        return jax.make_array_from_process_local_data(rep, np.asarray(a))

    return jax.tree.map(conv, tree)


def make_hybrid_mesh(ici_axis: str = "chip", dcn_axis: str = "host") -> Mesh:
    """2D (host, chip) mesh: DCN-connected axis first, ICI axis second.

    Use for layouts that want collectives constrained to ICI: shard rows over
    'chip' and replicate (or outer-shard) over 'host'.  The returned mesh is
    validated host-major — row h holds exactly the devices of process h — so
    '{ici_axis}' collectives never cross DCN; a topology this cannot
    represent raises instead of silently degrading."""
    n_proc = jax.process_count()
    if n_proc == 1:
        devs = np.asarray(jax.devices()).reshape(1, -1)
        return Mesh(devs, axis_names=(dcn_axis, ici_axis))

    per_host = jax.local_device_count()
    if len(jax.devices()) != n_proc * per_host:
        raise RuntimeError(
            f"hybrid mesh needs a uniform device count per host: "
            f"{len(jax.devices())} global devices != {n_proc} processes x "
            f"{per_host} local devices")
    try:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh

        devs = create_hybrid_device_mesh(
            mesh_shape=(1, per_host),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices())
        devs = np.asarray(devs).reshape(n_proc, per_host)
    except (ImportError, AssertionError, ValueError):
        # mesh_utils refuses degenerate topologies (e.g. CPU device farms
        # with no ICI coordinates); host-major order is the correct layout
        # for a (host, chip) mesh there and is validated just below
        devs = np.asarray(sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )).reshape(n_proc, per_host)
    for h in range(n_proc):
        procs = {d.process_index for d in devs[h]}
        if procs != {devs[h][0].process_index}:
            raise RuntimeError(
                f"hybrid mesh row {h} mixes processes {sorted(procs)}: "
                f"the {ici_axis} axis would cross DCN")
    return Mesh(devs, axis_names=(dcn_axis, ici_axis))


def host_gather_image(img) -> "np.ndarray":
    """Fully-replicated host copy of a sharded frame (multihost_utils when
    multi-host, plain device_get single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(img, tiled=True))
    return np.asarray(jax.device_get(img))
