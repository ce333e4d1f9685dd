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
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
