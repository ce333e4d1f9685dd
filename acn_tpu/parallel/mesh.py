"""Device mesh construction and expert-axis sharding.

The reference is single-GPU (``P.data_parallel = False`` hard-coded,
reference nerf_runner.py:47-57; NCCL appears only in the preprocessing
script). The TPU build scales the K spatial experts across chips: a 2D mesh
``(expert, data)``, expert-stacked pytrees sharded on their leading K axis,
the shared background MLP replicated. The train step itself is an ordinary
jitted function — XLA's SPMD partitioner inserts the only needed collective
(all-reduce of the bg gradient) automatically.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(P_args=None) -> bool:
    """Multi-host initialization (SURVEY §5: ``jax.distributed.initialize``).

    Call once at process start on every host of a pod/slice. Reads the
    standard coordination env vars (``COORDINATOR_ADDRESS``/
    ``JAX_COORDINATOR_ADDRESS``, ``PROCESS_ID``/``JAX_PROCESS_ID``,
    ``NUM_PROCESSES``/``JAX_NUM_PROCESSES``) or the corresponding P flags;
    on TPU pods with no explicit config, ``jax.distributed.initialize()``
    auto-discovers from the TPU metadata. Returns True when a multi-process
    runtime was initialized. Single-host runs are untouched.

    After init, ``jax.devices()`` spans all hosts and ``make_mesh`` lays the
    (expert, data) mesh over the global device set — expert shards ride ICI
    within a slice; only checkpoint writes and logging cross DCN.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    pid = os.environ.get("PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")
    nproc = os.environ.get("NUM_PROCESSES") or os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    if P_args is not None:
        coord = getattr(P_args, "coordinator_address", None) or coord
        pid = getattr(P_args, "process_id", None) if getattr(
            P_args, "process_id", None
        ) is not None else pid
        nproc = getattr(P_args, "num_processes", None) or nproc
    if coord is None and nproc is None:
        return False  # single-process
    if coord is not None and (pid is None or nproc is None):
        raise ValueError(
            "Multi-host init needs all three of coordinator_address, "
            f"process_id, num_processes — got coordinator_address={coord!r}, "
            f"process_id={pid!r}, num_processes={nproc!r}"
        )
    try:
        kwargs = {}
        if coord is not None:
            kwargs = dict(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError:
        return jax.process_count() > 1  # already initialized


def make_mesh(
    num_experts: int,
    mesh_experts: Optional[int] = None,
    mesh_data: int = 1,
    devices=None,
) -> Optional[Mesh]:
    """Build an (expert, data) mesh over the available devices.

    ``mesh_experts`` defaults to gcd(num_experts, n_devices/mesh_data) so the
    expert axis always divides K. Returns None on a single device (no
    sharding needed)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n == 1:
        return None
    if mesh_experts is None:
        avail = max(n // max(mesh_data, 1), 1)
        mesh_experts = math.gcd(num_experts, avail)
    mesh_data = n // mesh_experts
    dev_grid = np.asarray(devices[: mesh_experts * mesh_data]).reshape(
        mesh_experts, mesh_data
    )
    return Mesh(dev_grid, axis_names=("expert", "data"))


def make_render_mesh(devices=None) -> Optional[Mesh]:
    """1D mesh for frame-parallel serving: row blocks of a frame shard over
    every available device (Renderer._frame_chunk_mesh_fn). Parameters are
    replicated and blocks are disjoint — no collectives, so the axis order
    does not matter and ALL devices (expert × data in training) flatten into
    one ``px`` axis. Returns None on a single device."""
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) <= 1:
        return None
    return Mesh(np.asarray(devices), axis_names=("px",))


def shard_by_expert_axis(tree: Any, mesh: Optional[Mesh], num_experts: int) -> Any:
    """Place a pytree on the mesh: leaves whose leading dim equals K are
    sharded along the ``expert`` axis, everything else replicated.

    Sharding is layout, not semantics — a stray K-sized leading dim on a
    non-expert leaf only costs an extra partition, never correctness."""
    if mesh is None:
        return jax.device_put(tree)

    replicated = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if x.ndim >= 1 and x.shape[0] == num_experts:
            spec = P("expert", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated)

    return jax.tree.map(place, tree)
