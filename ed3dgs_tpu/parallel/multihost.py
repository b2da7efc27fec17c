"""Multi-host (DCN) scaling helpers.

The scaling recipe for this workload across hosts (SURVEY.md section 2.11):
cameras are embarrassingly parallel — each host stages and renders its own
camera shard, and the only cross-host traffic is the per-step gradient psum,
which GSPMD already emits for the replicated deformation parameters and the
"gauss"-sharded cloud. So multi-host = jax.distributed.initialize + a global
mesh whose "data" axis spans hosts + per-host camera lists.

Single-host runs are unaffected (initialize_multihost is a no-op without a
coordinator); the CPU test suite emulates the mesh with
--xla_force_host_platform_device_count.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax

from .mesh import make_mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns this host's process index (0 when single-host)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", 0)))
    return jax.process_index()


def global_mesh(data: Optional[int] = None, gauss: Optional[int] = None):
    """Mesh over ALL devices of all hosts. Defaults: "data" spans hosts
    (camera parallelism over DCN), "gauss" spans the chips within a host
    (splat parallelism over ICI)."""
    n = len(jax.devices())
    per_host = len(jax.local_devices())
    data = data or max(n // per_host, 1)
    gauss = gauss or (n // data)
    return make_mesh(data=data, gauss=gauss)


def host_camera_shard(cameras: List, round_robin: bool = True) -> List:
    """This host's slice of the camera list (each host decodes only its own
    images; the assembled global batch is sharded along "data")."""
    i, n = jax.process_index(), jax.process_count()
    if n == 1:
        return list(cameras)
    return list(cameras[i::n]) if round_robin else list(
        cameras[i * len(cameras) // n:(i + 1) * len(cameras) // n])


def parse_mesh_spec(spec: Optional[str]):
    """Parse the trainer's --mesh flag into a Mesh (None -> no mesh).

    Accepted forms:
      "auto"            — "data" spans hosts, "gauss" spans local chips
      "data=2,gauss=4"  — explicit axis sizes (a size of 0 means "the rest")
    """
    if not spec:
        return None
    if spec == "auto":
        return global_mesh()
    sizes = {"data": 1, "gauss": 1}
    for item in spec.split(","):
        k, _, v = item.partition("=")
        k = k.strip()
        if k not in sizes:
            raise ValueError(f"unknown mesh axis {k!r} (want data/gauss)")
        sizes[k] = int(v)
    n = len(jax.devices())
    if sizes["data"] == 0:
        sizes["data"] = n // max(sizes["gauss"], 1)
    if sizes["gauss"] == 0:
        sizes["gauss"] = n // max(sizes["data"], 1)
    return make_mesh(data=sizes["data"], gauss=sizes["gauss"])


def host_batch_slice(n_items: int) -> slice:
    """This host's contiguous slice of a global batch axis of length n_items
    (matches the device order of global_mesh's "data" axis: process-major)."""
    i, n = jax.process_index(), jax.process_count()
    per = n_items // n
    return slice(i * per, (i + 1) * per)


def to_host(tree):
    """Fetch a (possibly sharded, possibly multi-host) pytree to host numpy.

    Single-process: plain device_get. Multi-process: allgather so every host
    holds the full value (checkpoint writes are then done by process 0)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        tree = multihost_utils.process_allgather(tree, tiled=True)
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)
