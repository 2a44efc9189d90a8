"""Multi-host sharded data loading for pod-slice meshes.

On a multi-host TPU slice each process sees only its local devices, and a
globally-sharded batch must be assembled from per-process pieces.  The
reference is single-device (SURVEY.md §5) so it has nothing here; the
TPU-native recipe is:

1. every process computes the SAME deterministic epoch plan (the shuffle
   is seeded by epoch number exactly like the single-host loader, so no
   coordination traffic is needed);
2. each process decodes only the stripe of every global batch whose
   target devices are local to it (decode cost scales down with hosts);
3. ``jax.make_array_from_process_local_data`` assembles the global jax
   Array with the mesh's (data, spatial) sharding — XLA's collectives
   see one logical batch.

Single-host (process_count == 1) degenerates to exactly the single-host
loader semantics, which is how the logic is tested on the CPU fixture.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from floodgan_tpu.data.pipeline import BatchLoader


def process_stripe(
    global_batch: int, process_index: int, process_count: int
) -> tuple:
    """Half-open [start, stop) sample range of ``process_index`` within a
    global batch, under contiguous batch-axis striping.

    Matches GSPMD's device-order convention: with the data axis laid out
    process-major (the default ``jax.devices()`` order), the samples a
    process must feed are a contiguous stripe of the global batch.  The
    batch must divide evenly (multi-host training requires static shapes;
    the Model API already forces drop_remainder on meshes).
    """
    if global_batch % process_count:
        raise ValueError(
            f"global batch {global_batch} must divide over {process_count} processes"
        )
    per = global_batch // process_count
    return process_index * per, (process_index + 1) * per


class MultiHostBatchLoader:
    """Wraps a dataset so each process decodes only its stripe of every
    global batch, yielding globally-sharded jax Arrays over ``mesh``.

    Drop-in for ``BatchLoader`` in the training loop: yields
    {"input", "output", "names"} where input/output are global arrays
    carrying NamedSharding(mesh, ('data', 'spatial', None, None)) and
    ``names`` covers the LOCAL stripe only (names are host metadata).
    """

    def __init__(
        self,
        dataset,
        mesh: Mesh,
        batch_size: int,
        shuffle: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.mesh = mesh
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        # the local loader decodes/transforms the stripe on worker threads
        self._local = BatchLoader(
            dataset,
            batch_size=batch_size // self.process_count,
            shuffle=False,
            transform=True,
            drop_remainder=False,
            num_workers=num_workers,
            prefetch=prefetch,
        )
        self.drop_remainder = True  # global batches must tile the mesh
        self._auto_epoch = 0  # advanced by __iter__; see its docstring

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _sharding(self, ndim: int) -> NamedSharding:
        from floodgan_tpu.parallel.mesh import image_spec

        return NamedSharding(self.mesh, image_spec(ndim))

    def epoch_iter(self, epoch: int = 0) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # Same seed rule as BatchLoader.epoch_iter: every process
            # derives the identical global permutation with zero traffic.
            order = np.random.default_rng(epoch).permutation(n)
        usable = (n // self.batch_size) * self.batch_size
        lo, hi = process_stripe(self.batch_size, self.process_index, self.process_count)

        local_indices = []
        for start in range(0, usable, self.batch_size):
            local_indices.extend(order[start + lo : start + hi])

        for batch in self._local.iter_indices(local_indices):
            yield {
                "input": self._globalize(batch["input"]),
                "output": self._globalize(batch["output"]),
                "names": batch["names"],
            }

    def _globalize(self, local) -> jax.Array:
        global_shape = (self.batch_size,) + tuple(local.shape[1:])
        sharding = self._sharding(local.ndim)
        if isinstance(local, jax.Array):
            # The wrapped loader's device transform already put the stripe
            # on device — build the global array by device-to-device
            # placement of each addressable shard instead of bouncing the
            # batch through host memory (a synchronous D2H on the consumer
            # thread would serialize with the train step).
            lo, hi = process_stripe(
                self.batch_size, self.process_index, self.process_count
            )
            shards = []
            for dev, idx in sharding.addressable_devices_indices_map(global_shape).items():
                b = idx[0]
                start = (b.start or 0) - lo
                stop = (global_shape[0] if b.stop is None else b.stop) - lo
                if not (0 <= start < stop <= hi - lo):
                    raise ValueError(
                        f"device {dev} owns global batch rows {idx[0]} outside "
                        f"this process's stripe [{lo}, {hi}) — the mesh is not "
                        "process-major on the data axis"
                    )
                shards.append(jax.device_put(local[(slice(start, stop),) + idx[1:]], dev))
            return jax.make_array_from_single_device_arrays(global_shape, sharding, shards)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(local), global_shape
        )

    def __iter__(self) -> Iterator[dict]:
        # Plain iteration advances the shuffle epoch each pass so a
        # training loop using ``for batch in loader`` repeatedly gets a
        # fresh (but still globally-consistent) order per epoch; every
        # process increments in lockstep since they all call __iter__ once
        # per epoch.  Loops that need explicit control (resume at epoch k)
        # call ``epoch_iter(k)`` directly, which does not touch the counter.
        epoch = self._auto_epoch
        self._auto_epoch += 1
        return self.epoch_iter(epoch)
