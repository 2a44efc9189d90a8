"""Device mesh + sharding: the framework's distributed-communication layer.

The reference has no distributed code (single device, batch 1 —
SURVEY.md §5 'Distributed communication backend: absent').  The TPU-native
replacement is GSPMD data parallelism over a 1-D ``data`` mesh: batches are
sharded on their leading axis, parameters/optimizer state are replicated,
and XLA inserts the gradient all-reduce (psum over ICI) automatically
because every loss is a mean over the sharded batch axis.  No collective is
hand-written; scaling to a multi-host pod slice only changes the mesh.

Works identically on real TPU meshes and on the CPU test fixture
(--xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("data",))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every array leaf on its leading (batch) axis."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate parameters / optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
