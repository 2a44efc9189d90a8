"""Device mesh + sharding: the framework's distributed-communication layer.

The reference has no distributed code (single device, batch 1 —
SURVEY.md §5 'Distributed communication backend: absent').  The TPU-native
replacement is GSPMD over a 2-D ``(data, spatial)`` mesh:

- **data**: batches sharded on their leading axis, parameters/optimizer
  state replicated; XLA inserts the gradient all-reduce (psum over ICI)
  automatically because every loss is a mean over the sharded batch axis.
- **spatial**: the image H axis sharded across devices (``shard_images``).
  This is the model family's sequence-parallel analogue (SURVEY.md §5:
  no sequence axis exists; resolution is the scaling axis).  GSPMD
  partitions every convolution with halo exchanges over ICI and inserts
  the cross-shard all-reduce for instance/batch-norm spatial statistics —
  no collective is hand-written.

Scaling to a multi-host pod slice only changes the mesh.  Works
identically on real TPU meshes and on the CPU test fixture
(--xla_force_host_platform_device_count).

"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    spatial: int = 1,
) -> Mesh:
    """(data, spatial) mesh over the first ``num_devices`` devices.

    ``spatial`` devices per spatial group (must divide the device count);
    the default 1 is pure data parallelism.  The mesh is always 2-D so
    PartitionSpecs naming either axis work unconditionally."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, have {len(devs)}")
        devs = devs[:num_devices]
    if spatial < 1 or len(devs) % spatial:
        raise ValueError(f"spatial={spatial} must divide the {len(devs)}-device mesh")
    return Mesh(np.array(devs).reshape(-1, spatial), ("data", "spatial"))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every array leaf on its leading (batch) axis."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(put, tree)


def image_spec(ndim: int) -> P:
    """The framework's one batch-sharding rule: NHWC images shard
    (batch → data, H → spatial); everything else batch-only.  Single
    source of truth for shard_images and the multi-host loader."""
    if ndim == 4:
        return P("data", "spatial", None, None)
    return P("data")


def shard_images(tree: Any, mesh: Mesh) -> Any:
    """Shard NHWC image batches over (batch → data, H → spatial).

    Non-4-D leaves fall back to batch-only sharding.  With a size-1
    spatial axis this is identical to ``shard_batch``."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, image_spec(x.ndim)))
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate parameters / optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
